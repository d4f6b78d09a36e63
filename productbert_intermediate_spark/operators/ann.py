"""Approximate nearest neighbors over embedding columns (array<float>).

Three strategies:
* ``brute_force_topk`` — exact cosine top-k per query: broadcast the query
  set, JVM-side sequential-fold dot products, window top-k. The baseline,
  and the right answer whenever |queries|·|corpus| is joinable.
* ``lsh_topk`` — random-hyperplane LSH buckets (sign bits of projections
  onto deterministic seeded hyperplanes) with multi-probe (flip each bit):
  candidates share a (possibly probed) bucket; exact cosine re-rank inside.
  The 100TB path: the corpus is bucketed once (shuffle on bucket), each
  query touches B+1 buckets instead of the whole corpus.
* ``ivf_topk`` — inverted-file index: deterministic spherical k-means
  partitions the corpus into coarse cells; each query probes its n_probe
  nearest cells and exact-re-ranks inside. Data-adaptive (cells follow the
  embedding distribution, unlike data-oblivious hyperplanes), at the cost
  of a training scan per Lloyd iteration.

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
    return _exact_rerank(joined, k, id_col, vec_col, query_id_col, query_vec_col)


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
    return _exact_rerank(
        joined, k, id_col, vec_col, query_id_col, query_vec_col, dedup=True
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index: deterministic spherical k-means + cell probing


_IVF_SIM_QUANT = 100_000_000  # 1e8: 64 dims × (1e8)^2 = 6.4e17 < int64 max


def _assign_cells_udf(centroids: np.ndarray, n_probe: int):
    """pandas UDF: vector → its n_probe nearest centroid ids (cosine,
    ties broken by centroid id via stable argsort).

    The similarity matmul runs in FIXED-POINT int64 (normalized components
    quantized to 1e-8), not float64: float BLAS picks gemv- or gemm-shaped
    kernels by batch shape, whose reduction orders differ by ULPs — enough
    to flip a near-tie assignment between parallelism levels. Integer
    matmul is exact and kernel-independent, so assignments are identical
    for any Arrow batch shape. (Per-row normalization is float but reduces
    over the row alone, so it is batch-shape independent.)"""
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    c_q = np.round(c * _IVF_SIM_QUANT).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def assign(vecs: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        mat_q = np.round(mat * _IVF_SIM_QUANT).astype(np.int64)
        sims = mat_q @ c_q.T  # integer matmul: exact, no BLAS kernel variance
        # stable argsort on -sims → ascending centroid id on ties
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int64)))

    return assign


def _exact_rerank(
    joined: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    dedup: bool = False,
) -> DataFrame:
    """Shared exact-cosine re-rank tail: (query_id, vec_id, rank), ties by id."""
    cos = array_cosine(F.col(vec_col), F.col(query_vec_col)).alias("_cos")
    w = Window.partitionBy(query_id_col).orderBy(F.desc("_cos"), F.asc(id_col))
    out = joined.select(query_id_col, id_col, cos)
    if dedup:
        out = out.dropDuplicates([query_id_col, id_col])
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank")
    )


_IVF_QUANT = 1_000_000  # fixed-point scale for order-independent mean sums


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic spherical k-means over the corpus; returns (C, dim).

    Determinism at ANY parallelism, rigorously:
    * init = the embeddings of the ``n_centroids`` rows with the smallest
      md5(id) (a seeded, partitioning-independent sample);
    * each Lloyd mean is computed from per-dimension SUMS of fixed-point
      int64 components (round(v * 1e6)) — integer addition is exact and
      commutative, so the aggregated sums (and hence the next centroids)
      are bit-identical regardless of row order or partition count, which
      float sums are not. Cells keep their previous centroid when empty.
    Per-iteration driver sync is one (C × dim)-row collect — the same O(1)
    serial floor as connected-components' convergence fingerprint.
    """
    seed_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    centroids = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)
    # a corpus smaller than n_centroids seeds fewer cells — degrade, don't
    # crash: every row becomes its own cell and Lloyd is a no-op refinement
    n_centroids = centroids.shape[0]
    dim = centroids.shape[1]

    quant = (
        F.round(F.col("_v") * _IVF_QUANT).cast("long").alias("_q")
    )
    for _ in range(n_iters):
        assign = _assign_cells_udf(centroids, 1)
        sums = (
            corpus.select(
                F.element_at(assign(F.col(vec_col)), 1).alias("_cid"),
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "_pos", "_v"
                ),
            )
            .select("_cid", "_pos", quant)
            .groupBy("_cid", "_pos")
            .agg(F.sum("_q").alias("_s"), F.count("*").alias("_n"))
            .collect()
        )
        new = centroids.copy()
        acc = np.zeros((n_centroids, dim), dtype=np.int64)
        cnt = np.zeros(n_centroids, dtype=np.int64)
        for r in sums:
            acc[r["_cid"], r["_pos"]] = r["_s"]
            cnt[r["_cid"]] = r["_n"]
        nonempty = cnt > 0
        new[nonempty] = acc[nonempty] / (
            _IVF_QUANT * cnt[nonempty, None].astype(np.float64)
        )
        centroids = new
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into k-means cells,
    probe each query's n_probe nearest cells, exact cosine re-rank inside.

    With ``n_probe == n_centroids`` every cell is probed and the result
    equals ``brute_force_topk`` exactly (the re-rank is exact) — the
    recall dial goes all the way to 1. Pass precomputed ``centroids`` to
    amortize training across query batches (index build vs search split).
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, n_iters, id_col, vec_col
        )
    cell_of = _assign_cells_udf(centroids, 1)
    probes = _assign_cells_udf(centroids, n_probe)
    c = corpus.withColumn("_cell", F.element_at(cell_of(F.col(vec_col)), 1))
    q = queries.withColumn("_cell", F.explode(probes(F.col(query_vec_col))))
    joined = c.join(F.broadcast(q), "_cell")
    return _exact_rerank(joined, k, id_col, vec_col, query_id_col, query_vec_col)
