"""Entity consolidation (survivorship): entities + member rows → one golden
record per entity.

The reference stops at pairwise match decisions (its output is labeled
pairs, /root/reference/src/productbert/test.py:82-93); any consumer of an
ER system still has to CONSOLIDATE matched records into one canonical row
per entity. This operator is that missing tail — the standard survivorship
rules, each picked for determinism at any parallelism:

* ``longest_cols`` — keep the longest non-NULL value (richest variant of a
  free-text attribute); ties break to the lexicographically largest value,
  so the pick is a pure function of the value set, independent of row
  order, partitioning, or which member id carried it.
* ``modal_cols`` — keep the most frequent non-NULL value (consensus for
  categorical attributes); ties break to the smallest value.
* ``min_cols`` — keep the minimum (e.g. best price, earliest timestamp).

Scale shape: one equi-join (members → entity ids), then every pick is a
partial-aggregable ``max(struct(...))`` / ``min`` over entity_id — map-side
combine collapses each entity's members before the shuffle, so the stage
moves one row per (entity × attribute), never the member rows themselves.
A single groupBy produces all longest/min picks: no per-attribute window,
no per-attribute shuffle, no row_number sort. Each modal pick adds one
(entity_id, value) pre-count branch — still partial-aggregable at both
levels, but the branch re-evaluates the member join (column-pruned to just
its attribute). With many modal attributes, checkpoint the joined members
once (StageCatalog) and pass that in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _longest_pick(c: str):
    """max over (length, value) structs == longest, tie → largest value.

    NULL values map to a NULL struct, which max() skips; an entity whose
    members are all NULL for the attribute gets NULL.
    """
    v = F.col(c)
    return F.max(
        F.when(v.isNotNull(), F.struct(F.length(v).alias("l"), v.alias("v")))
    )["v"].alias(c)


def golden_records(
    members: DataFrame,
    entities: DataFrame,
    longest_cols: tuple[str, ...] = (),
    modal_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    id_col: str = "id",
) -> DataFrame:
    """(member rows, (id, entity_id)) → one row per entity_id.

    Output: entity_id, n_members, then one column per requested attribute,
    named as in ``members``. Deterministic by construction (see module
    docstring) — safe to hash-compare across runs and engines.
    """
    # explicit aliases: entities usually DERIVES from members
    # (assign_entities over the same offers), so unqualified column refs
    # would be ambiguous self-join attributes
    m = members.alias("_gr_m")
    e = entities.select(id_col, "entity_id").alias("_gr_e")
    attr_cols = dict.fromkeys(longest_cols + tuple(min_cols) + tuple(modal_cols))
    base = m.join(
        e, F.col(f"_gr_m.{id_col}") == F.col(f"_gr_e.{id_col}")
    ).select(
        F.col("_gr_e.entity_id").alias("entity_id"),
        *[F.col(f"_gr_m.{c}").alias(c) for c in attr_cols],
    )
    aggs = [F.count("*").alias("n_members")]
    aggs += [_longest_pick(c) for c in longest_cols]
    aggs += [F.min(c).alias(c) for c in min_cols]
    out = base.groupBy("entity_id").agg(*aggs)

    for c in modal_cols:
        # most frequent non-NULL value; tie → smallest value. Two stacked
        # partial aggregations: count per (entity, value), then argmax via
        # max(struct(cnt, negated-order proxy)). To get "tie → SMALLEST
        # value" out of a max(), order by value DESCENDING inside the
        # struct is impossible for arbitrary strings — instead pick
        # min(struct(-cnt, value)): smallest -cnt = highest count, then
        # smallest value.
        modal = (
            base.where(F.col(c).isNotNull())
            .groupBy("entity_id", c)
            .agg(F.count("*").alias("_cnt"))
            .groupBy("entity_id")
            .agg(
                F.min(F.struct((-F.col("_cnt")).alias("n"), F.col(c).alias("v")))[
                    "v"
                ].alias(c)
            )
        )
        out = out.join(modal, "entity_id", "left")
    return out
