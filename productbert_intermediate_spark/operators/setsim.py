"""Exact set-similarity join via prefix filtering (SURVEY.md §2.3 J5/J6 scale path).

Replaces the naive per-group all-pairs self-join for threshold Jaccard with
the prefix-filter candidate generation of the AllPairs / PPJoin family
(Bayardo, Ma, Srikant, WWW 2007; Xiao, Wang, Lin, Yu, WWW 2008 — public
algorithms). Unlike LSH this is EXACT: with a global token order, any pair
with Jaccard(x, y) ≥ t must share its least common token inside both
prefixes of length |x| - ceil(t·|x|) + 1, so candidate generation has no
false negatives and the exact verify step makes the result identical to the
brute-force join — at sub-quadratic cost.

Why it scales: tokens are ordered rarest-first (df ascending), so prefix
tokens are the rare ones and the inverted-index self-join touches small
posting lists; the frequent tokens that would create quadratic blocks never
enter a prefix. All steps are hash-shuffles on bounded keys; no cartesian
product appears in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_rarity_sorted_tokens(
    docs: DataFrame, id_col: str, toks_col: str, group_cols: list[str]
) -> DataFrame:
    """Re-sort each row's token set by (global df asc, token asc).

    The ordering must be one TOTAL order shared by all rows (prefix-filter
    correctness depends on it); document frequency is computed over the whole
    input, not per group.
    """
    toks = docs.select(id_col, F.explode(toks_col).alias("_tok"))
    dfc = toks.groupBy("_tok").agg(F.count("*").alias("_df"))
    sorted_toks = (
        toks.join(dfc, "_tok")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("_df", "_tok"))).alias("_dt"))
        .select(id_col, F.col("_dt._tok").alias("_sorted_toks"))
    )
    return docs.select(id_col, *group_cols, toks_col).join(sorted_toks, id_col)


def jaccard_similarity_join(
    docs: DataFrame,
    id_col: str,
    toks_col: str,
    threshold: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs with Jaccard(toks_a, toks_b) ≥ threshold.

    group_cols restricts pairs to rows sharing those columns (the reference
    compares offers within category; the dedup query within source).
    Output: group_cols + (id_a, id_b, jaccard). Exact — equal as a set to
    the brute-force within-group all-pairs join.
    """
    gcols = list(group_cols or [])
    base = _with_rarity_sorted_tokens(docs, id_col, toks_col, gcols)

    n = F.size("_sorted_toks")
    prefix_len = (n - F.ceil(F.lit(threshold) * n) + 1).cast("int")
    prefix = base.select(
        F.col(id_col).alias("_id"),
        *gcols,
        F.explode(F.slice("_sorted_toks", 1, prefix_len)).alias("_ptok"),
    )
    other = prefix.select(
        F.col("_id").alias("_id_b"),
        *[F.col(g).alias(f"_{g}_b") for g in gcols],
        F.col("_ptok").alias("_ptok_b"),
    )
    cond = [F.col("_ptok") == F.col("_ptok_b"), F.col("_id") < F.col("_id_b")]
    cond += [F.col(g) == F.col(f"_{g}_b") for g in gcols]
    candidates = (
        prefix.join(other, cond)
        .select(F.col("_id").alias("id_a"), F.col("_id_b").alias("id_b"))
        .distinct()
    )

    sides = base.select(F.col(id_col).alias("_sid"), F.col(toks_col).alias("_stoks"))
    hydrated = (
        candidates.join(sides.withColumnRenamed("_sid", "id_a"), "id_a")
        .withColumnRenamed("_stoks", "_toks_a")
        .join(sides.withColumnRenamed("_sid", "id_b"), "id_b")
        .withColumnRenamed("_stoks", "_toks_b")
    )
    inter = F.size(F.array_intersect("_toks_a", "_toks_b")).cast("double")
    union = F.size(F.array_union("_toks_a", "_toks_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        hydrated.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
