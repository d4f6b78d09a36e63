"""Entity changelog: two resolved snapshots → the per-entity delta.

At the north rule's 10^12-document scale no consumer re-reads the full
entity table after every resolution pass — they consume CHANGES. The
reference has no counterpart (single-shot scripts emit one final labeled
set, /root/reference/README.md:25-38); this operator is the delta feed any
production consumer of a continuously-resolved corpus needs: given the
previous and current (id, entity_id) assignments — stable ids, so equality
of an entity_id MEANS the same entity (operators/entity_ids.py) — it emits
one row per entity whose membership changed, classified.

Classification per entity_id over the union of both snapshots:

* ``created``   — no members previously, some now;
* ``dissolved`` — had members, has none (its records left or re-keyed);
* ``grew``      — gained members, lost none;
* ``shrank``    — lost members, gained none;
* ``reshaped``  — both gained and lost.

Unchanged entities emit NOTHING — that is the point: the changelog's size
is bounded by the delta, not the corpus, so a consumer applying it per
micro-batch does O(changes) work. Member-level moves are available from
:func:`member_moves` when a consumer needs row routing, not just entity
lifecycle.

Scale shape: one full-outer equi-join on id (the member universe), then a
single partial-aggregable groupBy per side of the entity key — map-side
combine collapses members before the shuffle, so the stage moves one row
per (entity, change-status), never the members. No windows, no driver
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_ORDER = ("created", "dissolved", "grew", "shrank", "reshaped")


def member_moves(prev: DataFrame, new: DataFrame) -> DataFrame:
    """(prev: id, entity_id) × (new: id, entity_id) → (id, prev_entity_id,
    new_entity_id) for every id whose assignment differs between the two
    snapshots, including ids present in only one (NULL on the absent side).
    """
    p = prev.select("id", F.col("entity_id").alias("prev_entity_id"))
    n = new.select("id", F.col("entity_id").alias("new_entity_id"))
    both = p.join(n, "id", "full_outer")
    # null-safe inequality: a move, an arrival, or a departure
    return both.where(
        ~F.col("prev_entity_id").eqNullSafe(F.col("new_entity_id"))
    ).select("id", "prev_entity_id", "new_entity_id")


def apply_member_moves(prev: DataFrame, moves: DataFrame) -> DataFrame:
    """Consumer side of the feed: ``prev`` snapshot + :func:`member_moves`
    output → the EXACT next snapshot (id, entity_id).

    A move row's ``new_entity_id`` is the id's next assignment; NULL means
    the id left the corpus. Every id absent from the feed keeps its prev
    assignment. Round-trip invariant (tests/test_entity_diff.py):
    ``apply_member_moves(prev, member_moves(prev, new)) == new`` row-exactly.

    Scale shape: the feed is delta-sized, so the anti-join's build side is
    small (broadcastable by AQE) and the stage does O(corpus) scan +
    O(delta) work — the whole point of consuming moves instead of
    re-reading the resolved table.
    """
    m = moves.select("id", "prev_entity_id", "new_entity_id")
    kept = prev.select("id", "entity_id").join(
        m.select("id"), "id", "left_anti"
    )
    arrived = m.where(F.col("new_entity_id").isNotNull()).select(
        "id", F.col("new_entity_id").alias("entity_id")
    )
    return kept.unionByName(arrived)


def entity_changelog(prev: DataFrame, new: DataFrame) -> DataFrame:
    """Per-entity delta between two stable-id snapshots.

    Output (one row per entity whose membership changed):
    ``entity_id, change, n_prev, n_new, added, removed`` where ``added`` /
    ``removed`` count members entering/leaving the entity and ``n_prev`` /
    ``n_new`` are its total sizes in each snapshot (0 when absent).
    """
    p = prev.select("id", F.col("entity_id").alias("prev_entity_id"))
    n = new.select("id", F.col("entity_id").alias("new_entity_id"))
    both = p.join(n, "id", "full_outer")

    same = F.col("prev_entity_id").eqNullSafe(F.col("new_entity_id"))
    # each member row contributes to its prev entity's ledger and its new
    # entity's ledger; a stayed member contributes (kept) to both sides of
    # the SAME entity — union the two perspectives, then one groupBy
    prev_side = both.select(
        F.col("prev_entity_id").alias("entity_id"),
        F.lit(1).alias("n_prev"),
        F.lit(0).alias("n_new"),
        F.lit(0).alias("added"),
        F.when(same, F.lit(0)).otherwise(F.lit(1)).alias("removed"),
    ).where(F.col("entity_id").isNotNull())
    new_side = both.select(
        F.col("new_entity_id").alias("entity_id"),
        F.lit(0).alias("n_prev"),
        F.lit(1).alias("n_new"),
        F.when(same, F.lit(0)).otherwise(F.lit(1)).alias("added"),
        F.lit(0).alias("removed"),
    ).where(F.col("entity_id").isNotNull())

    ledger = (
        prev_side.unionByName(new_side)
        .groupBy("entity_id")
        .agg(
            F.sum("n_prev").alias("n_prev"),
            F.sum("n_new").alias("n_new"),
            F.sum("added").alias("added"),
            F.sum("removed").alias("removed"),
        )
    )
    change = (
        F.when(F.col("n_prev") == 0, F.lit("created"))
        .when(F.col("n_new") == 0, F.lit("dissolved"))
        .when((F.col("added") > 0) & (F.col("removed") > 0), F.lit("reshaped"))
        .when(F.col("added") > 0, F.lit("grew"))
        .otherwise(F.lit("shrank"))
    )
    return (
        ledger.where((F.col("added") > 0) | (F.col("removed") > 0))
        .select(
            "entity_id",
            change.alias("change"),
            F.col("n_prev").cast("long").alias("n_prev"),
            F.col("n_new").cast("long").alias("n_new"),
            F.col("added").cast("long").alias("added"),
            F.col("removed").cast("long").alias("removed"),
        )
    )
