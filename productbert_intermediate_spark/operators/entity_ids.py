"""Stable entity ids across ER runs.

Connected-components labels (min member id) are an artifact of the current
run: adding one crawl can relabel an entity even though its membership
barely changed, breaking every downstream key that joined on entity_id.
The reference never faces this (single-shot scripts), but any system that
re-resolves a growing corpus — including this repo's incremental ER
(plans/incremental.py) — needs the resolved ids to SURVIVE re-runs.

``stabilize_entity_ids(prev, new)`` re-keys a fresh clustering against the
previous run's assignment with the standard overlap rule, every tie broken
deterministically so the output is a pure function of the two inputs:

* each new cluster's candidate is the previous entity sharing the most
  members (ties → smallest prev entity id);
* a previous entity claimed by several new clusters (a split) is awarded
  to the claimant with the largest overlap (ties → smallest new label) —
  losers are treated as new;
* unmatched new clusters get fresh ids ABOVE every previous id:
  max_prev_id + 1 + dense-rank(new label), via the scale-safe dense_ids
  (no global row_number over data-sized input).

Scale shape: overlaps are one (id)-equi-join + one partial-aggregable
count; the award/tie logic runs per (new_cluster, prev_entity) PAIR —
bounded by the overlap table, which is no larger than the record count —
through two ordinary windows over cluster-sized groups. Nothing funnels
through the driver except one max() scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ids import dense_ids


def stabilize_entity_ids(prev: DataFrame, new: DataFrame) -> DataFrame:
    """(prev: id, entity_id) × (new: id, entity_id) → (id, entity_id,
    inherited) over the NEW universe, with entity ids carried over from
    prev wherever membership overlap supports it."""
    p = prev.select(F.col("id").alias("_pid"), F.col("entity_id").alias("_prev"))
    n = new.select("id", F.col("entity_id").alias("_new"))

    overlap = (
        n.join(p, n["id"] == p["_pid"])
        .groupBy("_new", "_prev")
        .agg(F.count("*").alias("_n"))
    )
    # candidate prev entity per new cluster
    w_new = Window.partitionBy("_new").orderBy(
        F.col("_n").desc(), F.col("_prev").asc()
    )
    cand = (
        overlap.withColumn("_rk", F.row_number().over(w_new))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
    # resolve splits: a prev entity goes to its strongest claimant only
    w_prev = Window.partitionBy("_prev").orderBy(
        F.col("_n").desc(), F.col("_new").asc()
    )
    awarded = (
        cand.withColumn("_rk", F.row_number().over(w_prev))
        .where(F.col("_rk") == 1)
        .select("_new", "_prev")
    )

    mapped = n.select("_new").distinct().join(awarded, "_new", "left")
    fresh = mapped.where(F.col("_prev").isNull()).select("_new")
    # one scalar to the driver; empty prev → start fresh ids at 0
    max_prev = (prev.agg(F.max("entity_id")).collect()[0][0])
    base = (max_prev + 1) if max_prev is not None else 0
    fresh_ids = dense_ids(fresh, "_new", out_col="_rank").select(
        "_new", (F.lit(base) + F.col("_rank")).alias("_fresh")
    )
    final = (
        mapped.join(fresh_ids, "_new", "left")
        .select(
            "_new",
            F.coalesce("_prev", "_fresh").alias("_stable"),
            F.col("_prev").isNotNull().alias("inherited"),
        )
    )
    return n.join(final, "_new").select(
        "id", F.col("_stable").alias("entity_id"), "inherited"
    )
