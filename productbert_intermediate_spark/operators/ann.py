"""Approximate nearest neighbors over embedding columns (array<float>).

Two strategies:
* ``brute_force_topk`` — exact cosine top-k per query: broadcast the query
  set, JVM-side sequential-fold dot products, window top-k. The baseline,
  and the right answer whenever |queries|·|corpus| is joinable.
* ``lsh_topk`` — random-hyperplane LSH buckets (sign bits of projections
  onto deterministic seeded hyperplanes) with multi-probe (flip each bit):
  candidates share a (possibly probed) bucket; exact cosine re-rank inside.
  The 100TB path: the corpus is bucketed once (shuffle on bucket), each
  query touches B+1 buckets instead of the whole corpus.

Projections run in an Arrow-batched pandas UDF (numpy matmul — deterministic
across runs/processes for fixed seed); everything else is JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ..functions.similarity import array_cosine


def _dot_with(qcol: str, ecol: str):
    return F.aggregate(
        F.zip_with(ecol, qcol, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, rank). Ties broken by id."""
    joined = corpus.crossJoin(F.broadcast(queries))
    cos = array_cosine(F.col(vec_col), F.col(query_vec_col)).alias("_cos")
    w = Window.partitionBy(query_id_col).orderBy(F.desc("_cos"), F.asc(id_col))
    return (
        joined.select(query_id_col, id_col, cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank")
    )


def _make_buckets_udf(dim: int, n_bits: int, n_tables: int, seed: int):
    planes = np.random.RandomState(seed).normal(size=(dim, n_bits * n_tables))
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
        mat = np.vstack(vecs.to_numpy())
        bits = (mat @ planes) > 0
        per_table = [
            (bits[:, t * n_bits : (t + 1) * n_bits] @ weights)
            + (np.int64(t) << 32)
            for t in range(n_tables)
        ]
        vals = np.stack(per_table, axis=1).astype(np.int64)
        return pd.Series(list(vals))

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bits: int = 5,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """LSH-bucketed approximate top-k with exact re-rank inside buckets.

    Recall levers: ``n_tables`` independent hash tables (bucket keys carry
    the table id in the high bits) and ``multiprobe`` (each query also
    probes every 1-bit-flipped neighbor bucket per table).
    """
    buckets_udf = _make_buckets_udf(dim, n_bits, n_tables, seed)
    c = corpus.withColumn(
        "_bucket", F.explode(buckets_udf(F.col(vec_col)))
    )
    q = queries.withColumn("_qbucket", F.explode(buckets_udf(F.col(query_vec_col))))
    if multiprobe:
        flips = F.array(
            F.col("_qbucket"),
            *[
                F.col("_qbucket").bitwiseXOR(F.lit(1 << b))
                for b in range(n_bits)
            ],
        )
        q = q.withColumn("_bucket", F.explode(flips))
    else:
        q = q.withColumn("_bucket", F.col("_qbucket"))
    joined = c.join(F.broadcast(q.drop("_qbucket")), "_bucket")
    cos = array_cosine(F.col(vec_col), F.col(query_vec_col)).alias("_cos")
    w = Window.partitionBy(query_id_col).orderBy(F.desc("_cos"), F.asc(id_col))
    return (
        joined.select(query_id_col, id_col, cos)
        .dropDuplicates([query_id_col, id_col])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank")
    )
