"""Skew handling for the candidate-pair stage: salting + deterministic re-level.

The north rule asks for blocking keys "materialized as a salted, skew-aware
repartitioned candidate-pair DataFrame". Blocking itself already bounds
block sizes (the reference's 2..80 cluster cap), but two skew surfaces
remain at 10^12-doc scale and are handled here:

1. **Hot ids in the hydration join.** A single offer id can appear in
   millions of candidate pairs (a popular product crossed with every
   near-duplicate listing). The hydration equi-join hash-partitions pairs
   on that id, so one shuffle partition receives the whole hot key. AQE's
   skew-join split helps only when it runs (sort-merge joins, post-shuffle),
   and splits by partition bytes, not by downstream Python cost.
   ``salted_skew_join`` is the explicit fix — *differential* salting:
   only ids hotter than a threshold are salted (the fact row's salt is a
   deterministic hash of its other columns; the dim row is replicated once
   per salt), everything else joins untouched. Replicating the whole dim
   ``n_salts``× — the naive salting recipe — would be catastrophic on a
   100 TB offers table; the hot set is at most |fact| / hot_threshold keys,
   so its replicated slice is broadcast-sized by construction.

2. **Uneven pair layout into the Arrow scoring stage.** Pairs read back
   from a checkpoint (or filtered hard after a shuffle) carry whatever
   partition layout the file scan gives; the scoring stage's cost is
   per-ROW (Python featurization), so byte-based AQE coalescing cannot
   level it. ``salted_repartition_pairs`` re-levels by an explicit salt
   column — a deterministic hash of the pair — rather than round-robin
   ``repartition(n)``, which inserts a retry-safety local sort and is
   input-order-dependent. Hash-of-pair is deterministic under retry and
   spreads any hot id across all partitions.

No reference counterpart (the reference is single-process,
/root/reference/src/processing/sample-training-sets/...py keeps a whole
category in RAM); this is the distributed-execution capability the north
rule adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_N_SALTS = 8


def hot_keys(fact: DataFrame, key: str, hot_threshold: int) -> DataFrame:
    """Distinct ``key`` values appearing more than ``hot_threshold`` times.

    One partial-aggregable count pass; the result has at most
    |fact| / hot_threshold rows, which is what makes it safe to broadcast.
    """
    return (
        fact.groupBy(F.col(key).alias("_hot_id"))
        .agg(F.count("*").alias("_cnt"))
        .where(F.col("_cnt") > hot_threshold)
        .select("_hot_id")
    )


def salt_dim(dim: DataFrame, dim_key: str, hot: DataFrame, n_salts: int) -> DataFrame:
    """Replicate ONLY hot dim rows across ``n_salts`` salts; cold rows get 0.

    ``hot`` must be the (broadcastable) output of :func:`hot_keys`. Both the
    semi and anti probes are broadcast joins — map-only over the dim scan,
    no shuffle — and the union preserves the dim's column set + ``_salt``.
    """
    hot_b = F.broadcast(hot)
    replicated = dim.join(
        hot_b, dim[dim_key] == hot_b["_hot_id"], "left_semi"
    ).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cold = dim.join(
        hot_b, dim[dim_key] == hot_b["_hot_id"], "left_anti"
    ).withColumn("_salt", F.lit(0))
    return cold.unionByName(replicated)


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame | None,
    fact_key: str,
    dim_key: str = "id",
    n_salts: int = DEFAULT_N_SALTS,
    hot_threshold: int = 100_000,
    spread_cols: tuple[str, ...] | None = None,
    salted_dim: DataFrame | None = None,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Inner-join ``fact`` to ``dim`` with hot ``fact_key`` values salted.

    Row-for-row equivalent to ``fact.join(dim, fact[fact_key] == dim[dim_key])``
    (asserted against the plain join in tests/test_skew.py), but a fact key
    hotter than ``hot_threshold`` is spread over ``n_salts`` shuffle
    partitions instead of landing in one.

    ``spread_cols`` picks the fact columns hashed into the salt (default:
    every fact column except the key — for candidate pairs joined on id_l,
    that is id_r, which is exactly the axis a hot id varies over).

    Callers joining the same dim twice (pair hydration) pass a shared
    ``salted_dim``/``hot`` pair built once via :func:`hot_keys` +
    :func:`salt_dim`, so the two join sides stay plan-identical and Spark's
    ReuseExchange materializes the salted dim once.
    """
    if hot is None:
        # The hot set is consumed by THREE subplans (dim semi probe, dim
        # anti probe, fact tagging); without a lineage cut each one re-runs
        # the full fact count. It is ≤ |fact| / hot_threshold rows — tiny by
        # construction — so one eager local materialization is the cheapest
        # possible fix (same move as blocking's multi-consumer checkpoint).
        hot = hot_keys(fact, fact_key, hot_threshold).localCheckpoint(eager=True)
    if salted_dim is None:
        if dim is None:
            raise ValueError("pass either dim or a prebuilt salted_dim")
        salted_dim = salt_dim(dim, dim_key, hot, n_salts)
    spread = spread_cols or tuple(c for c in fact.columns if c != fact_key)
    if not spread:
        raise ValueError(
            "salted_skew_join needs at least one non-key fact column to "
            "derive a salt from; a keys-only fact frame cannot be spread"
        )
    hot_b = F.broadcast(hot.withColumn("_is_hot", F.lit(True)))
    tagged = (
        fact.join(hot_b, fact[fact_key] == hot_b["_hot_id"], "left")
        .withColumn(
            "_fact_salt",
            F.when(
                F.col("_is_hot"),
                F.pmod(F.xxhash64(*[F.col(c) for c in spread]), F.lit(n_salts)),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot_id", "_is_hot")
    )
    joined = tagged.join(
        salted_dim,
        (tagged[fact_key] == salted_dim[dim_key])
        & (tagged["_fact_salt"] == salted_dim["_salt"]),
    )
    return joined.drop("_fact_salt", "_salt")


def salted_repartition_pairs(
    pairs: DataFrame,
    num_partitions: int | None = None,
    id_cols: tuple[str, str] = ("id_l", "id_r"),
) -> DataFrame:
    """Re-level a candidate-pair DataFrame by a deterministic pair salt.

    Hash-partitions on ``xxhash64(id_l, id_r)`` so (a) a hot id never
    concentrates (its pairs differ in the other id → different salts),
    (b) the layout is identical under task retry and at any input order —
    unlike round-robin ``repartition(n)`` — keeping byte-identity gates
    intact, and (c) per-partition row counts concentrate tightly around
    uniform (n_pairs ≫ partitions). Use before a per-row-cost Arrow stage
    when the incoming layout is file- or block-determined.
    """
    salt = F.xxhash64(*[F.col(c) for c in id_cols]).alias("_pair_salt")
    salted = pairs.select("*", salt)
    out = (
        salted.repartition(num_partitions, "_pair_salt")
        if num_partitions
        else salted.repartition("_pair_salt")
    )
    return out.drop("_pair_salt")
