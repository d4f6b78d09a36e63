"""Exact set-similarity join via prefix filtering (SURVEY.md §2.3 J5/J6 scale path).

Replaces the naive per-group all-pairs self-join for threshold Jaccard with
the prefix-filter candidate generation of the AllPairs / PPJoin family
(Bayardo, Ma, Srikant, WWW 2007; Xiao, Wang, Lin, Yu, WWW 2008 — public
algorithms). Unlike LSH this is EXACT: with a global token order, any pair
with Jaccard(x, y) ≥ t must share a token between the probe prefix of the
larger record (length |x| - ceil(t·|x|) + 1) and the shorter index prefix
of the smaller record (length |y| - ceil(2t/(1+t)·|y|) + 1, valid because
the pair's overlap floor is at least 2t/(1+t)·|y| when |x| ≥ |y|), so
candidate generation has no false negatives and the exact verify step
makes the result identical to the brute-force join — at sub-quadratic cost.

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

    The group columns ride the explode and come back through first() in the
    per-id aggregation (they are functionally dependent on the id), so the
    old corpus-sized join back onto ``docs`` is gone (guide §2.4). The
    original ``toks_col`` is NOT carried: ``_sorted_toks`` is a permutation
    of it, and every downstream read (prefix slices, size-of-intersection /
    size-of-union verify) is permutation-invariant. Rows whose token set is
    empty drop out of the explode exactly as the old inner join dropped
    them.
    """
    toks = docs.select(
        id_col, *group_cols, F.explode(toks_col).alias("_tok")
    )
    dfc = toks.groupBy("_tok").agg(F.count("*").alias("_df"))
    return (
        toks.join(dfc, "_tok")
        .groupBy(id_col)
        .agg(
            *[F.first(g).alias(g) for g in group_cols],
            F.array_sort(F.collect_list(F.struct("_df", "_tok"))).alias("_dt"),
        )
        .select(
            id_col, *group_cols, F.col("_dt._tok").alias("_sorted_toks")
        )
    )


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
    Output: (id_a, id_b, jaccard). Exact — equal as a set to the brute-force
    within-group all-pairs join.

    Jaccard is a SET measure, so token arrays are deduplicated up front:
    without this, a duplicate-heavy row inflates the multiset length used by
    the prefix/overlap bounds past what the set-semantics verify step can
    reach, and true pairs would be pruned.
    """
    gcols = list(group_cols or [])
    docs = docs.withColumn(toks_col, F.array_distinct(F.col(toks_col)))
    base = _with_rarity_sorted_tokens(docs, id_col, toks_col, gcols)

    n = F.size("_sorted_toks")
    # Asymmetric PPJoin prefixes (Xiao et al. 2008 §4): with records ordered
    # by (size, id), the smaller record of a pair is always the INDEXED side,
    # whose prefix only needs length |y| - ceil(2t/(1+t)·|y|) + 1 (overlap
    # floor when the probe is at least as large: o_min >= 2t/(1+t)·|y|); the
    # PROBE side keeps the full AllPairs prefix |x| - ceil(t·|x|) + 1
    # (o_min >= t·|x| via the length filter |y| >= t·|x|). At t=0.6 the index
    # prefix is 0.25·|y| vs the symmetric 0.4·|y| — join rows shrink by the
    # product of the posting-list cuts while recall stays lossless.
    # The -1e-9 slack inside each ceil guards against double rounding-UP of
    # an exactly-integral product (e.g. t=0.43, n=143: exact 2t/(1+t)·n = 86
    # but the double product lands at 86.000000000000014 → ceil 87 → a
    # one-short prefix that silently drops qualifying pairs). Same guard as
    # o_min and the length filter below.
    probe_len = (
        n - F.ceil(F.lit(threshold) * n - F.lit(1e-9)) + 1
    ).cast("int")
    index_len = (
        n
        - F.ceil(F.lit(2.0 * threshold / (1.0 + threshold)) * n - F.lit(1e-9))
        + 1
    ).cast("int")
    # Both branches project from one `base` subplan, so base's internal
    # shuffles (the rarity-sort groupBy) are computed once; the probe/index
    # explodes differ in slice length and are necessarily separate stages.

    def _exploded(plen, side: str):
        return base.select(
            F.col(id_col).alias("_id"),
            *gcols,
            n.alias("_len"),
            F.posexplode(F.slice("_sorted_toks", 1, plen)).alias(
                "_pos", "_ptok"
            ),
        ).alias(side)

    pa = _exploded(probe_len, "_pa")  # probe: the (size, id)-larger record
    pb = _exploded(index_len, "_pb")  # index: the (size, id)-smaller record
    # PPJoin positional filter: a matched prefix token at 0-based positions
    # (pa, pb) bounds the achievable overlap by 1 + min(|x|-1-pa, |y|-1-pb);
    # pairs whose bound can't reach the Jaccard-equivalent overlap floor
    # ceil(t·(|x|+|y|)/(1+t)) are pruned BEFORE the distinct. Recall-
    # lossless: the pair's first common token has the loosest bound, so a
    # true pair always keeps at least that join row (the 1e-9 slack guards
    # the float ceil against over-pruning).
    ubound = 1 + F.least(
        F.col("_pa._len") - 1 - F.col("_pa._pos"),
        F.col("_pb._len") - 1 - F.col("_pb._pos"),
    )
    o_min = F.ceil(
        F.lit(threshold) * (F.col("_pa._len") + F.col("_pb._len"))
        / F.lit(1.0 + threshold)
        - F.lit(1e-9)
    )
    cond = [
        F.col("_pa._ptok") == F.col("_pb._ptok"),
        # index side strictly precedes the probe side in (size, id) order
        (F.col("_pb._len") < F.col("_pa._len"))
        | (
            (F.col("_pb._len") == F.col("_pa._len"))
            & (F.col("_pb._id") < F.col("_pa._id"))
        ),
        # length filter: J >= t forces |y| >= t·|x| for the smaller side
        F.col("_pb._len")
        >= F.ceil(F.lit(threshold) * F.col("_pa._len") - F.lit(1e-9)),
        ubound >= o_min,
    ]
    cond += [F.col(f"_pa.{g}") == F.col(f"_pb.{g}") for g in gcols]
    candidates = (
        pa.join(pb, cond)
        .select(
            F.least("_pa._id", "_pb._id").alias("id_a"),
            F.greatest("_pa._id", "_pb._id").alias("id_b"),
        )
        .distinct()
    )

    sides = base.select(
        F.col(id_col).alias("_sid"), F.col("_sorted_toks").alias("_stoks")
    )
    sa = sides.alias("_sa")
    sb = sides.alias("_sb")
    hydrated = (
        candidates.join(sa, F.col("id_a") == F.col("_sa._sid"))
        .join(sb, F.col("id_b") == F.col("_sb._sid"))
        .select(
            "id_a",
            "id_b",
            F.col("_sa._stoks").alias("_toks_a"),
            F.col("_sb._stoks").alias("_toks_b"),
        )
    )
    inter = F.size(F.array_intersect("_toks_a", "_toks_b")).cast("double")
    union = F.size(F.array_union("_toks_a", "_toks_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        hydrated.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
