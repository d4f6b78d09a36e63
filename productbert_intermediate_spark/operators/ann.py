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


def _make_bucket_udf(dim: int, n_bits: int, seed: int):
    planes = np.random.RandomState(seed).normal(size=(dim, n_bits))

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
        mat = np.vstack(vecs.to_numpy())
        bits = (mat @ planes) > 0
        vals = bits @ (1 << np.arange(n_bits, dtype=np.int64))
        return pd.Series(vals.astype(np.int64))

    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bits: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """LSH-bucketed approximate top-k with exact re-rank inside buckets.

    multiprobe=True probes every 1-bit-flipped neighbor bucket of the query
    (n_bits+1 probes) — the standard recall lever without a second index.
    """
    bucket_udf = _make_bucket_udf(dim, n_bits, seed)
    c = corpus.withColumn("_bucket", bucket_udf(F.col(vec_col)))
    q = queries.withColumn("_qbucket", bucket_udf(F.col(query_vec_col)))
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
