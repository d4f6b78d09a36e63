"""Deterministic dense surrogate-id assignment without a global window.

The reference assigns dense ids to a deduplicated key column with a pandas
``reset_index`` over the sorted frame (process_to_magellan.py:42-58 builds
`mag_id` this way before the FK merge-assert). The naive Spark translation is
``row_number() OVER (ORDER BY key)`` — a no-partition window that funnels
every key through one task. Fine for a 20-entry label dictionary, fatal for
a distinct-key dim with 10^8 rows at the 100 TB design point.

``dense_ids`` produces the identical mapping (0-based rank in ascending key
order) with no single-partition stage:

1. ``repartitionByRange(key)`` — the range partitioner places key ranges on
   partitions in ascending partition-id order, so partition id is itself a
   coarse rank.
2. ``row_number`` within each partition (parallel, bounded by partition size).
3. A per-partition ``count`` (one tiny row per partition) turned into a
   cumulative offset with a window over that tiny frame, broadcast-joined
   back.

The assigned id equals the global sorted rank wherever the (sampled) range
bounds happen to fall, so the output is deterministic even though
repartitionByRange's bound sampling is not. Ties are impossible because the
caller supplies distinct keys (asserted nowhere — duplicate keys would get
distinct ids in nondeterministic relative order; dedupe first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dense_ids"]


def dense_ids(
    distinct_keys: DataFrame,
    key_col: str,
    out_col: str = "dense_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Map a distinct-key DataFrame to ``key, out_col`` with out_col equal to
    the 0-based ascending rank of the key — scale-safe equivalent of
    ``row_number() OVER (ORDER BY key) - 1`` on distinct keys.

    NULL keys are not supported (Spark ranks nulls first, DuckDB last; the
    reference dropna()s before assigning ids, so callers must too).
    """
    if num_partitions is None:
        num_partitions = distinct_keys.sparkSession.sparkContext.defaultParallelism
    ranged = (
        distinct_keys.select(key_col)
        .repartitionByRange(num_partitions, F.col(key_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("_pid").orderBy(F.col(key_col))
    ranked = ranged.withColumn("_rn", F.row_number().over(w_in))
    # One row per partition — the cumulative window below runs over at most
    # `num_partitions` rows, so its single-partition sort is O(partitions),
    # not O(keys).
    counts = ranked.groupBy("_pid").count()
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("count").over(w_off), F.lit(0))
    ).select("_pid", "_offset")
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .select(
            key_col,
            (F.col("_offset") + F.col("_rn") - 1).cast("long").alias(out_col),
        )
    )
