"""Incremental connected components over the maintained match graph.

Per micro-batch the match-edge delta is tiny next to the accumulated graph,
so recomputing the full closure (operators/clustering.connected_components)
every batch — the O(corpus) step VERDICT r4 #3 names — is wasted work. This
module maintains a ``components`` table (id, label; label = min member id,
the exact invariant assign_entities produces) and reconciles only the
components an edge delta touches:

* the AFFECTED set is the components containing any endpoint of an added or
  removed edge (edge adds can merge two components; edge removals can split
  one — both stay inside that set, since edges never leave their component);
* the affected subgraph (its members + its current match edges) is re-closed
  with the SAME proven large-star/small-star operator — on a subgraph sized
  by the delta's neighborhoods, not the corpus;
* untouched components keep their rows byte-for-byte (hard-linked buckets,
  see state_store).

The components table is bucketed by LABEL so an affected component's members
are one pruned read; endpoint-label lookups scan the table with a broadcast
id filter (two-long columnar scan — the cheapest per-batch corpus touch; an
Iceberg id-sorted layout would prune even that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.clustering import connected_components
from .state_store import VersionedState, bucket_of

SCH_COMPONENTS = "id long, label long, bucket int"


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def update_components(
    state: VersionedState,
    new_ids: DataFrame,
    edge_adds: DataFrame,
    edge_dels: DataFrame,
    current_match_edges: DataFrame,
    removed_ids: DataFrame | None = None,
) -> None:
    """Fold one batch's node/edge delta into the ``components`` table.

    ``new_ids``: single-column (id) offers first seen this batch.
    ``edge_adds`` / ``edge_dels``: (id_l, id_r) match edges entering/leaving
    the graph this batch. ``current_match_edges``: the POST-delta match=true
    edge set (id_l, id_r) — consulted only for affected components.
    ``removed_ids``: single-column (id) offers RETRACTED this batch — their
    components are affected (members re-close without them, which can split
    an entity) and their own rows leave the table.
    """
    nb = state.n_buckets
    comp = state.read("components", SCH_COMPONENTS)
    new_ids = _ckpt(new_ids.select("id").distinct())

    delta_ids = (
        edge_adds.select(F.col("id_l").alias("id"))
        .unionByName(edge_adds.select(F.col("id_r").alias("id")))
        .unionByName(edge_dels.select(F.col("id_l").alias("id")))
        .unionByName(edge_dels.select(F.col("id_r").alias("id")))
    )
    if removed_ids is not None:
        removed_ids = _ckpt(removed_ids.select("id").distinct())
        delta_ids = delta_ids.unionByName(removed_ids)
    delta_ids = _ckpt(delta_ids.distinct())
    if delta_ids.isEmpty():
        # no graph change: only append the new singletons
        rows = new_ids.select(
            "id",
            F.col("id").alias("label"),
            bucket_of(F.col("id"), nb).alias("bucket"),
        )
        state.append("components", rows)
        return

    # labels of every delta endpoint: stored ids via broadcast-filtered scan,
    # ids first seen this batch default to label=id
    looked = comp.join(F.broadcast(delta_ids), "id", "left_semi").select(
        "id", "label"
    )
    endpoint_labels = delta_ids.join(looked, "id", "left").select(
        "id", F.coalesce("label", F.col("id")).alias("label")
    )
    affected_labels = _ckpt(endpoint_labels.select("label").distinct())

    # members of affected components: bucket-pruned read by label, plus the
    # batch's new ids (their singleton rows may not exist in the store yet)
    stored_members = state.lookup(
        "components", SCH_COMPONENTS, "label", affected_labels
    ).select("id", "label")
    new_singletons = new_ids.join(
        stored_members.select("id"), "id", "left_anti"
    ).select("id", F.col("id").alias("label"))
    # no eager cut: `members` feeds only sub_nodes below, whose own
    # checkpoint materializes this whole subplan in the same driver job
    members = stored_members.unionByName(
        new_singletons.join(affected_labels, "label", "left_semi")
    )

    # the affected subgraph: its members (incl. delta endpoints first seen
    # this batch) and the current match edges with an endpoint among them
    # (both endpoints are, by the component-closure argument). Retracted
    # ids leave the node set — the re-closure below is over survivors only,
    # so a bridge node's removal splits its entity exactly as a from-scratch
    # run would
    sub_nodes = members.select("id").unionByName(delta_ids).distinct()
    if removed_ids is not None:
        sub_nodes = sub_nodes.join(
            F.broadcast(removed_ids), "id", "left_anti"
        )
    sub_nodes = _ckpt(sub_nodes)
    sub_edges = current_match_edges.join(
        F.broadcast(sub_nodes.withColumnRenamed("id", "id_l")), "id_l",
        "left_semi",
    )
    closed = connected_components(sub_edges)
    sub_assign = _ckpt(
        sub_nodes.join(closed, "id", "left").select(
            "id", F.coalesce("entity_id", F.col("id")).alias("label")
        )
    )

    # rewrite only the buckets holding old affected labels or new labels;
    # kept rows are those whose label was not affected
    touched = sorted(
        {
            r["b"]
            for r in affected_labels.select(
                bucket_of(F.col("label"), nb).alias("b")
            )
            .unionByName(
                sub_assign.select(bucket_of(F.col("label"), nb).alias("b"))
            )
            .distinct()
            .collect()
        }
    )
    keep = (
        comp.where(F.col("bucket").isin(touched))
        .join(affected_labels, "label", "left_anti")
        .select("id", "label")
    )
    rows = keep.unionByName(sub_assign).select(
        "id", "label", bucket_of(F.col("label"), nb).alias("bucket")
    )
    state.rewrite_buckets("components", SCH_COMPONENTS, rows, touched)

    # plain new singletons (no delta edge) land as appended files — appends
    # never remove rows, so no extra bucket rewrite for them
    plain_singletons = new_singletons.join(sub_nodes, "id", "left_anti")
    state.append_rows_next(
        "components",
        plain_singletons.select(
            "id", "label", bucket_of(F.col("label"), nb).alias("bucket")
        ),
    )


def read_entities(state: VersionedState) -> DataFrame:
    """The maintained (id, entity_id) table — the batch-equivalent output."""
    return state.read("components", SCH_COMPONENTS).select(
        "id", F.col("label").alias("entity_id")
    )
