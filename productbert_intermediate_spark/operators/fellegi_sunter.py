"""Fellegi-Sunter probabilistic record linkage with EM-estimated weights.

The reference's matchers are all SUPERVISED — its training sets are built
from a labeled gold standard (every pair carries a gold label:
/root/reference/src/processing/sample-training-sets/
build_intermediate_training_set.py:41-64; the magellan/wordcooc/BERT
matchers all consume it). A web-scale ER deployment usually has
no labels at the start: the standard bootstrap is the Fellegi-Sunter model
(Fellegi & Sunter 1969, JASA 64) with parameters estimated by EM (Winkler
1988), the approach productionised by the public Splink package. This
module is that unsupervised matcher, Spark-first:

* **Agreement vectors** (gamma): per candidate pair, k binary columns
  "does attribute i agree?" — pure JVM expressions built by the caller
  (exact match, banded numeric, token overlap, ...), whole-stage-codegen.
* **Pattern counts**: one ``groupBy`` over the gamma columns. The key
  space is ≤ 2^k (k ≤ ~20), so map-side combine collapses every partition
  to ≤ 2^k rows before the shuffle — the ONLY data-sized pass in a fit.
* **EM**: driver-side over the collected pattern counts. The collect is
  k-bounded (≤ 2^k rows — same justification as the IVF centroid collect,
  operators/ann.py): the counts table IS the sufficient statistic for the
  conditionally-independent FS likelihood, so no further data pass is
  needed per iteration. Deterministic: fixed dyadic-rational init, fixed
  attribute order, pure-Python floats (no BLAS), clamped away from 0/1.
* **Scoring**: posterior match probability and Bayes factor per pair as
  literal arithmetic over the gamma columns — no join, no UDF, map-only.

Scale shape at 10^12 candidate pairs: gamma build + scoring are map-only;
the fit's one shuffle moves ≤ 2^k rows per partition; EM cost is
O(2^k · iters) on the driver, independent of data size.

Determinism / engine-invariance contract (driver hash gate): per-pattern
E-step arithmetic is plain IEEE-754 double ops in a FIXED association
order (identical bits in any IEEE engine), and the posterior is then
QUANTIZED to integer units of 2^-30 — scaling by a power of two is exact
(exponent shift, no rounding) and floor is exact, so the M-step reduces to
integer sums (exact, commutative) and one final double division. This
sidesteps the double→decimal cast, whose rounding differs across engines
(Spark rounds the shortest decimal repr via BigDecimal.valueOf; DuckDB
rounds the exact binary expansion), which float-in-decimal-out tricks like
the operators/scoring.py calibration never have to reconcile because they
only need Spark-internal parallelism-invariance. Quantization error is
≤ 2^-30 per pattern posterior — orders of magnitude below EM's statistical
noise — and is applied identically in ``em_step`` (distributed) and the
local one-step replica the tests and SQL oracle use.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPS = 1e-6

# Dyadic-rational defaults: exactly representable doubles, so Spark and any
# SQL oracle that embeds the same literals compute bit-identical products.
DEFAULT_LAM0 = 0.25
DEFAULT_M0 = 0.875
DEFAULT_U0 = 0.125


@dataclass(frozen=True)
class FSParams:
    """Fitted Fellegi-Sunter model: prevalence + per-attribute m/u."""

    lam: float
    m: tuple[float, ...]
    u: tuple[float, ...]
    n_iter: int = 0
    converged: bool = True

    @property
    def k(self) -> int:
        return len(self.m)


def gamma_pattern_counts(pairs: DataFrame, gamma_cols: list[str]) -> DataFrame:
    """Candidate pairs with 0/1 gamma columns → (gamma..., n) counts.

    One partial-aggregable groupBy over a ≤ 2^k key space: the shuffle
    moves at most 2^k rows per map task regardless of pair count.
    """
    return pairs.groupBy(*[F.col(c).cast("int").alias(c) for c in gamma_cols]).agg(
        F.count(F.lit(1)).alias("n")
    )


def _posterior_expr(
    gamma_cols: list[str], lam: float, m: list[float], u: list[float]
):
    """E-step posterior as one fixed-association-order double expression.

    w = lam * prod(m_i or 1-m_i); v = (1-lam) * prod(u_i or 1-u_i);
    p = w / (w + v). Every factor is a Python-precomputed double literal
    (1-m_i evaluated HERE, not in the engine), multiplied left-to-right in
    attribute order — the exact sequence a SQL oracle can replicate.
    """
    w = F.lit(float(lam))
    v = F.lit(float(1.0 - lam))
    for i, c in enumerate(gamma_cols):
        g = F.col(c)
        w = w * F.when(g == 1, F.lit(float(m[i]))).otherwise(
            F.lit(float(1.0 - m[i]))
        )
        v = v * F.when(g == 1, F.lit(float(u[i]))).otherwise(
            F.lit(float(1.0 - u[i]))
        )
    return w / (w + v), w, v


# E-step quantization denominator: posteriors become integer multiples of
# 2^-30 so every M-step sum is exact integer arithmetic (module docstring).
_Q = 1 << 30


def em_step(
    counts: DataFrame,
    gamma_cols: list[str],
    lam: float,
    m: list[float],
    u: list[float],
) -> DataFrame:
    """One distributed EM step over a pattern-counts table.

    Returns one row per attribute: (attr, m_next, u_next, lam_next), every
    value a double derived from exact integer sums of 2^-30-quantized
    posteriors — parallelism- AND engine-invariant (module docstring), so
    a SQL oracle can hash-match it. Exposed both as the unit the driver
    oracle checks and for fits where the counts table is too wide to
    collect (gamma levels beyond binary).

    Overflow headroom: per-pattern products n·p_int are decimal(19,0) ×
    decimal(11,0) → exact decimal(31,0); their sums hold > 10^38 — fine
    past 10^12 candidate pairs.
    """
    p, _, _ = _posterior_expr(gamma_cols, lam, m, u)
    p_int = F.floor(p * F.lit(float(_Q))).cast("decimal(11,0)")
    nn = F.col("n").cast("decimal(19,0)")
    base = counts.select(
        *[F.col(c) for c in gamma_cols],
        (nn * p_int).alias("np"),
        (nn * (F.lit(_Q).cast("decimal(11,0)") - p_int)).alias("nq"),
        nn.alias("nn"),
    )
    aggs = [
        F.sum("np").alias("sum_np"),
        F.sum("nq").alias("sum_nq"),
        F.sum("nn").alias("sum_n"),
    ]
    for c in gamma_cols:
        g = F.col(c)
        aggs.append(F.sum(F.when(g == 1, F.col("np")).otherwise(F.lit(0))).alias(f"np_{c}"))
        aggs.append(F.sum(F.when(g == 1, F.col("nq")).otherwise(F.lit(0))).alias(f"nq_{c}"))
    tot = base.agg(*aggs)

    rows = []
    for c in gamma_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("attr"),
                (F.col(f"np_{c}").cast("double") / F.col("sum_np").cast("double")).alias("m_next"),
                (F.col(f"nq_{c}").cast("double") / F.col("sum_nq").cast("double")).alias("u_next"),
                (
                    F.col("sum_np").cast("double")
                    / (F.col("sum_n").cast("double") * F.lit(float(_Q)))
                ).alias("lam_next"),
            )
        )
    return tot.select(F.explode(F.array(*rows)).alias("s")).select(
        "s.attr", "s.m_next", "s.u_next", "s.lam_next"
    )


def em_step_local(
    counts: list[tuple], k: int, lam: float, m: list[float], u: list[float]
) -> tuple[float, list[float], list[float]]:
    """Driver-side replica of ``em_step``'s exact quantized arithmetic.

    Python floats ARE IEEE doubles and ``math.floor`` on a float is exact,
    so this reproduces the distributed step bit-for-bit — the tests pin
    ``em_step`` ≡ ``em_step_local`` and the SQL oracle to the same bits.
    """
    sum_np = sum_nq = sum_n = 0
    np_g = [0] * k
    nq_g = [0] * k
    for row in counts:
        g = tuple(int(x) for x in row[:k])
        n = int(row[k])
        w = lam
        v = 1.0 - lam
        for i in range(k):
            w *= m[i] if g[i] else 1.0 - m[i]
            v *= u[i] if g[i] else 1.0 - u[i]
        p_int = int(math.floor((w / (w + v)) * _Q))
        np_v = n * p_int
        nq_v = n * (_Q - p_int)
        sum_np += np_v
        sum_nq += nq_v
        sum_n += n
        for i in range(k):
            if g[i]:
                np_g[i] += np_v
                nq_g[i] += nq_v
    lam_next = float(sum_np) / (float(sum_n) * float(_Q))
    m_next = [float(np_g[i]) / float(sum_np) for i in range(k)]
    u_next = [float(nq_g[i]) / float(sum_nq) for i in range(k)]
    return lam_next, m_next, u_next


def em_fit_counts(
    counts: list[tuple],
    k: int,
    lam0: float = DEFAULT_LAM0,
    m0: float | list[float] = DEFAULT_M0,
    u0: float | list[float] = DEFAULT_U0,
    max_iter: int = 200,
    tol: float = 1e-10,
    fix_u: list[float] | None = None,
) -> FSParams:
    """EM over local pattern counts: rows (g_1..g_k, n) → FSParams.

    Pure-Python doubles in fixed order (no numpy reduction reorder):
    deterministic for a given counts multiset regardless of row order —
    counts are re-sorted internally. Parameters are clamped to
    [_EPS, 1-_EPS] each M-step (Winkler's degenerate-boundary guard).

    ``fix_u``: hold the u side fixed at externally-estimated values
    (``estimate_u_from_random_pairs``) and let EM fit only m and λ — the
    Splink training recipe; far more stable on weakly-separated gammas.
    The label-switching guard is skipped when u is pinned (the match
    class is determined by the fixed side).
    """
    pats = sorted((tuple(int(g) for g in r[:k]), int(r[k])) for r in counts)
    lam = float(lam0)
    m = [float(m0)] * k if isinstance(m0, (int, float)) else [float(x) for x in m0]
    if fix_u is not None:
        u = [min(max(float(x), _EPS), 1.0 - _EPS) for x in fix_u]
    else:
        u = [float(u0)] * k if isinstance(u0, (int, float)) else [float(x) for x in u0]
    n_total = sum(n for _, n in pats)
    if n_total == 0:
        return FSParams(lam, tuple(m), tuple(u), 0, True)

    clamp = lambda x: min(max(x, _EPS), 1.0 - _EPS)  # noqa: E731
    it = 0
    converged = False
    for it in range(1, max_iter + 1):
        sum_np = sum_nq = 0.0
        np_g = [0.0] * k
        nq_g = [0.0] * k
        for g, n in pats:
            w = lam
            v = 1.0 - lam
            for i in range(k):
                w *= m[i] if g[i] else 1.0 - m[i]
                v *= u[i] if g[i] else 1.0 - u[i]
            p = w / (w + v)
            npv = n * p
            nqv = n - npv
            sum_np += npv
            sum_nq += nqv
            for i in range(k):
                if g[i]:
                    np_g[i] += npv
                    nq_g[i] += nqv
        lam_new = clamp(sum_np / n_total)
        m_new = [clamp(np_g[i] / sum_np) if sum_np > 0 else m[i] for i in range(k)]
        if fix_u is not None:
            u_new = u
        else:
            u_new = [
                clamp(nq_g[i] / sum_nq) if sum_nq > 0 else u[i] for i in range(k)
            ]
        delta = max(
            abs(lam_new - lam),
            max(abs(m_new[i] - m[i]) for i in range(k)),
            max(abs(u_new[i] - u[i]) for i in range(k)),
        )
        lam, m, u = lam_new, m_new, u_new
        if delta < tol:
            converged = True
            break

    # Label-switching guard: EM is symmetric under (lam, m, u) →
    # (1-lam, u, m); pin "match" to the class with the higher mean
    # agreement rate so downstream thresholds read the right way.
    # Skipped when u is pinned — the fixed side defines the classes.
    if fix_u is None and sum(m) < sum(u):
        lam, m, u = 1.0 - lam, u, m
    return FSParams(lam, tuple(m), tuple(u), it, converged)


def fit_em(
    pairs: DataFrame,
    gamma_cols: list[str],
    lam0: float = DEFAULT_LAM0,
    m0: float | list[float] = DEFAULT_M0,
    u0: float | list[float] = DEFAULT_U0,
    max_iter: int = 200,
    tol: float = 1e-10,
    fix_u: list[float] | None = None,
) -> FSParams:
    """Fit FS by EM from UNLABELED candidate pairs with gamma columns.

    One distributed pattern-count pass (the only data-sized work), then
    driver-side EM over ≤ 2^k sufficient-statistic rows (the collect is
    k-bounded by construction — see module docstring). ``fix_u`` pins the
    u side to externally-estimated rates (estimate_u_from_random_pairs).
    """
    k = len(gamma_cols)
    rows = gamma_pattern_counts(pairs, gamma_cols).collect()
    counts = [tuple(r[c] for c in gamma_cols) + (r["n"],) for r in rows]
    return em_fit_counts(counts, k, lam0, m0, u0, max_iter, tol, fix_u=fix_u)


def score_fs(
    pairs: DataFrame,
    gamma_cols: list[str],
    params: FSParams,
    posterior_col: str = "match_prob",
    bayes_col: str = "bayes_factor",
) -> DataFrame:
    """Append posterior match probability and Bayes factor K = w/v.

    Literal arithmetic over the gamma columns — map-only, no join, no UDF,
    inside whole-stage codegen. log2(K) is the classic FS "match weight";
    left as a ratio here because division is IEEE-engine-invariant while
    log is not (last-ulp differences across libm builds).
    """
    p, w, v = _posterior_expr(
        gamma_cols, params.lam, list(params.m), list(params.u)
    )
    return pairs.withColumn(posterior_col, p).withColumn(bayes_col, w / v)


# Binarization cutoffs turning the pipeline's pair-feature family
# (operators/scoring.py FEATURES) into FS agreement gammas. Heuristic
# midpoints of the observed between-class gap (label-0 p90 vs label-1 p10 on
# the synthetic e2e corpus: emb_cos 0.55/0.85, jac_tokens 0.23/0.42,
# digit_jac 0.14/0.67, brand exact) — NOT label-fitted: the EM fit that
# weighs them never reads a label. jw/lev_title and price_sim are excluded:
# their class distributions overlap, and near-duplicate features would also
# break FS's conditional-independence assumption harder.
FS_FEATURE_THRESHOLDS: dict[str, float] = {
    "emb_cos": 0.70,
    "jac_tokens": 0.35,
    "digit_jac": 0.50,
    "brand_match": 1.00,
}


def feature_gammas(
    features: DataFrame,
    thresholds: dict[str, float] | None = None,
    keep_cols: tuple[str, ...] = ("id_l", "id_r"),
) -> DataFrame:
    """Pair-feature table → FS agreement vectors (g_<feature> ∈ {0,1}).

    NULL features read as disagreement (0) — the conservative direction.
    Map-only JVM projection; gamma column order follows the thresholds
    dict, which callers must hold fixed for a given fit.
    """
    th = FS_FEATURE_THRESHOLDS if thresholds is None else thresholds
    return features.select(
        *keep_cols,
        *[
            (F.coalesce(F.col(k), F.lit(0.0)) >= F.lit(float(v)))
            .cast("int")
            .alias(f"g_{k}")
            for k, v in th.items()
        ],
    )


def score_features_fs(
    features: DataFrame,
    thresholds: dict[str, float] | None = None,
    threshold: float = 0.5,
    max_iter: int = 500,
    tol: float = 1e-8,
    stats: dict | None = None,
) -> DataFrame:
    """Unsupervised matcher over a checkpointed pair-feature table: binarize
    features → fit EM (one pattern-count pass + k-bounded collect) → score
    (map-only). Output mirrors the logistic scorer's contract:
    (id_l, id_r, *features, score, match) with score = FS posterior.

    Callers should hand in a MATERIALIZED feature table (the pipeline
    checkpoints it first): the fit's count pass and the scoring pass each
    scan the input once, and recomputing a pandas-UDF feature stage twice
    would double the most expensive step.

    ``stats``: optional dict filled with the fitted parameters and EM
    iteration count for run reports.
    """
    th = FS_FEATURE_THRESHOLDS if thresholds is None else thresholds
    gcols = [f"g_{k}" for k in th]
    feature_cols = [c for c in features.columns if c not in ("id_l", "id_r")]
    g = feature_gammas(features, th, keep_cols=tuple(features.columns))
    params = fit_em(g, gcols, max_iter=max_iter, tol=tol)
    if stats is not None:
        stats.update(
            {
                "fs_lam": params.lam,
                "fs_m": {k: params.m[i] for i, k in enumerate(th)},
                "fs_u": {k: params.u[i] for i, k in enumerate(th)},
                "fs_em_iters": params.n_iter,
                "fs_em_converged": params.converged,
            }
        )
    scored = score_fs(g, gcols, params, posterior_col="score")
    return scored.select(
        "id_l",
        "id_r",
        *feature_cols,
        "score",
        (F.col("score") >= F.lit(float(threshold))).alias("match"),
    )


def params_table(spark: SparkSession, params: FSParams, gamma_cols: list[str]) -> DataFrame:
    """FSParams → one row per attribute (attr, m, u, lam) for reports."""
    return spark.createDataFrame(
        [
            (c, float(params.m[i]), float(params.u[i]), float(params.lam))
            for i, c in enumerate(gamma_cols)
        ],
        "attr string, m double, u double, lam double",
    )


@dataclass(frozen=True)
class FSLevelParams:
    """Multi-level FS model: per attribute, a distribution over ordinal
    comparison levels (0 = total disagreement .. L_i-1 = exact match) for
    each latent class — the Splink "comparison levels" generalisation of
    the binary m/u."""

    lam: float
    m: tuple[tuple[float, ...], ...]
    u: tuple[tuple[float, ...], ...]
    n_iter: int = 0
    converged: bool = True


def em_fit_counts_levels(
    counts: list[tuple],
    levels: list[int],
    lam0: float = 0.1,
    max_iter: int = 200,
    tol: float = 1e-10,
) -> FSLevelParams:
    """EM over pattern counts with ordinal gamma levels per attribute.

    ``counts`` rows are (g_1..g_k, n) with g_i ∈ 0..levels[i]-1. Same
    sufficient-statistic shape as the binary fit (≤ Π levels patterns);
    driver-side, deterministic (internal sort, fixed order, clamped +
    renormalized M-step).

    Init (all deterministic): λ0; m favors HIGH levels geometrically
    (m0[l] ∝ 2^l — matches agree), u starts at the observed marginal level
    distribution (non-matches dominate any candidate mix, so the marginal
    is an excellent u seed — Splink's u-from-random-pairs logic applied to
    the data in hand). Label-switching guard compares the classes'
    expected levels.
    """
    k = len(levels)
    pats = sorted((tuple(int(g) for g in r[:k]), int(r[k])) for r in counts)
    n_total = sum(n for _, n in pats)
    lam = float(lam0)
    m = [
        [(1 << l) / float((1 << levels[i]) - 1) for l in range(levels[i])]
        for i in range(k)
    ]
    u = []
    for i in range(k):
        marg = [0.0] * levels[i]
        for g, n in pats:
            marg[g[i]] += n
        tot = sum(marg) or 1.0
        u.append([max(_EPS, c / tot) for c in marg])
    if n_total == 0:
        return FSLevelParams(
            lam, tuple(map(tuple, m)), tuple(map(tuple, u)), 0, True
        )

    def _norm(dist: list[float]) -> list[float]:
        dist = [min(max(x, _EPS), 1.0 - _EPS) for x in dist]
        s = sum(dist)
        return [x / s for x in dist]

    it = 0
    converged = False
    for it in range(1, max_iter + 1):
        sum_np = sum_nq = 0.0
        np_l = [[0.0] * levels[i] for i in range(k)]
        nq_l = [[0.0] * levels[i] for i in range(k)]
        for g, n in pats:
            w = lam
            v = 1.0 - lam
            for i in range(k):
                w *= m[i][g[i]]
                v *= u[i][g[i]]
            p = w / (w + v)
            npv = n * p
            nqv = n - npv
            sum_np += npv
            sum_nq += nqv
            for i in range(k):
                np_l[i][g[i]] += npv
                nq_l[i][g[i]] += nqv
        lam_new = min(max(sum_np / n_total, _EPS), 1.0 - _EPS)
        m_new = [
            _norm([np_l[i][l] / sum_np for l in range(levels[i])])
            if sum_np > 0
            else m[i]
            for i in range(k)
        ]
        u_new = [
            _norm([nq_l[i][l] / sum_nq for l in range(levels[i])])
            if sum_nq > 0
            else u[i]
            for i in range(k)
        ]
        delta = abs(lam_new - lam)
        for i in range(k):
            for l in range(levels[i]):
                delta = max(
                    delta, abs(m_new[i][l] - m[i][l]), abs(u_new[i][l] - u[i][l])
                )
        lam, m, u = lam_new, m_new, u_new
        if delta < tol:
            converged = True
            break

    # Label-switching guard: "match" is the class with the higher expected
    # comparison level, summed over attributes.
    exp_m = sum(sum(l * m[i][l] for l in range(levels[i])) for i in range(k))
    exp_u = sum(sum(l * u[i][l] for l in range(levels[i])) for i in range(k))
    if exp_m < exp_u:
        lam, m, u = 1.0 - lam, u, m
    return FSLevelParams(
        lam, tuple(map(tuple, m)), tuple(map(tuple, u)), it, converged
    )


def fit_em_levels(
    pairs: DataFrame,
    gamma_cols: list[str],
    levels: list[int],
    lam0: float = 0.1,
    max_iter: int = 200,
    tol: float = 1e-10,
) -> FSLevelParams:
    """Multi-level EM fit from unlabeled pairs: one pattern-count pass,
    driver-side EM over ≤ Π levels sufficient-statistic rows."""
    rows = gamma_pattern_counts(pairs, gamma_cols).collect()
    counts = [tuple(r[c] for c in gamma_cols) + (r["n"],) for r in rows]
    return em_fit_counts_levels(counts, levels, lam0, max_iter, tol)


def score_fs_levels(
    pairs: DataFrame,
    gamma_cols: list[str],
    params: FSLevelParams,
    posterior_col: str = "match_prob",
    bayes_col: str = "bayes_factor",
    explain: bool = False,
) -> DataFrame:
    """Posterior + Bayes factor under a multi-level FS model: per attribute
    a when-chain maps the observed level to its factor m[l]/u[l] — literal
    arithmetic, map-only, whole-stage codegen.

    ``explain=True`` additionally emits one ``k_<gamma>`` column per
    attribute (that attribute's Bayes-factor contribution) — the standard
    FS interpretability readout: which fields drove this match decision.
    """
    lam = params.lam
    odds = F.lit(float(lam)) / F.lit(float(1.0 - lam))
    out = pairs
    for i, g in enumerate(gamma_cols):
        k_i = F.lit(None).cast("double")
        for l in range(len(params.m[i]) - 1, -1, -1):
            # Python-precomputed per-level factor: one literal per level
            factor = float(params.m[i][l]) / float(params.u[i][l])
            k_i = F.when(F.col(g) == l, F.lit(factor)).otherwise(k_i)
        if explain:
            out = out.withColumn(f"k_{g}", k_i)
            k_i = F.col(f"k_{g}")
        odds = odds * k_i
    return out.withColumn(
        bayes_col, odds * F.lit(float((1.0 - lam) / lam))
    ).withColumn(posterior_col, odds / (odds + F.lit(1.0)))


def estimate_u_from_random_pairs(
    records: DataFrame,
    gamma_of_pair,
    gamma_cols: list[str],
    n_pairs: int,
    seed: int = 42,
) -> list[float]:
    """Direct u estimation from random record pairs (Splink's
    estimate_u_using_random_sampling): two random records are a non-match
    with probability ≈ 1 at web scale, so each gamma's agreement rate over
    random pairs IS u_i — no EM needed for the u side, which stabilises
    the EM fit of m and λ enormously on weakly-separated attributes.

    ``gamma_of_pair(left, right) -> DataFrame`` builds the gamma columns
    from two aliased copies of ``records``. Sampling is seeded and
    deterministic: each side is an independent md5-ordered shuffle, zipped
    by row number — one window per side over a SAMPLED slice (bounded by
    n_pairs), never the corpus.
    """
    from pyspark.sql import Window

    total = records.count()
    take = min(n_pairs, total)
    frac = min(1.0, (take * 1.2 + 16) / max(total, 1))

    def _side(tag: str) -> DataFrame:
        s = records.sample(fraction=frac, seed=seed + (17 if tag == "r" else 0))
        w = Window.orderBy(F.md5(F.concat_ws("\x01", *records.columns, F.lit(tag))))
        return (
            s.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= take)
            .select(F.col("_rn"), *[F.col(c).alias(f"{c}_{tag}") for c in records.columns])
        )

    joined = _side("l").join(_side("r"), "_rn")
    g = gamma_of_pair(joined)
    row = g.agg(
        *[F.avg(F.col(c).cast("double")).alias(c) for c in gamma_cols]
    ).collect()[0]
    return [max(_EPS, float(row[c] or 0.0)) for c in gamma_cols]


def term_frequency(records: DataFrame, value_col: str) -> DataFrame:
    """Per-value relative frequency over the record corpus: (value, tf).

    tf(v) = n_v / N is the probability a random record carries v — the
    value-specific stand-in for the attribute's global u: two records
    agreeing on a RARE value is much stronger match evidence than agreeing
    on a ubiquitous one (the adjustment Splink popularised; Winkler 1988's
    frequency-based matching before it). One partial-aggregable groupBy
    over the attribute's value domain; NULLs carry no agreement evidence
    and are excluded.

    The result is value-domain-sized (brands, cities, ...), usually
    broadcast-able; ``score_fs_tf`` joins it per TF-adjusted attribute.
    """
    nn = records.where(F.col(value_col).isNotNull())
    counts = nn.groupBy(F.col(value_col).alias("value")).agg(
        F.count(F.lit(1)).alias("n_v")
    )
    # one scalar N via a window-free cross-join of a 1-row agg: Spark plans
    # this as a broadcast, keeping the stage fully parallel
    total = nn.agg(F.count(F.lit(1)).alias("n_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "value",
        (F.col("n_v").cast("double") / F.col("n_total").cast("double")).alias("tf"),
    )


def score_fs_tf(
    pairs: DataFrame,
    gamma_cols: list[str],
    params: FSParams,
    tf_adjust: dict[str, tuple[str, str, DataFrame]],
    posterior_col: str = "match_prob",
    bayes_col: str = "bayes_factor",
    broadcast_tf: bool = True,
    min_tf: float = 1e-9,
) -> DataFrame:
    """FS scoring with term-frequency-adjusted agreement evidence.

    ``tf_adjust`` maps a gamma column to ``(val_l, val_r, tf_table)``: when
    that gamma agrees AND the two sides carry the same non-NULL value v,
    its Bayes factor becomes m_i / max(tf(v), min_tf) instead of m_i / u_i
    — same total K for average-frequency values, much larger for rare ones,
    smaller for head values (exactly where false matches concentrate at
    web scale: two offers both titled "new" mean nothing). Gammas that
    agree WITHOUT a usable shared value (NULLs, or the gamma came from a
    banded comparison) fall back to the global u_i; disagreement factors
    are unchanged.

    Plan shape: one equi-join per adjusted attribute against its
    value-domain-sized tf table (broadcast by default), then literal
    arithmetic — no UDF. Posterior is rebuilt from prior odds × Π K_i, so
    the unadjusted attributes contribute identically to ``score_fs``.
    """
    out = pairs
    for g, (vl, vr, tf_df) in tf_adjust.items():
        t = tf_df.select(
            F.col("value").alias(f"_tfv_{g}"), F.col("tf").alias(f"_tf_{g}")
        )
        if broadcast_tf:
            t = F.broadcast(t)
        shared = F.when(
            (F.col(g) == 1)
            & F.col(vl).isNotNull()
            & (F.col(vl) == F.col(vr)),
            F.col(vl),
        )
        out = out.withColumn(f"_tfv_in_{g}", shared).join(
            t, F.col(f"_tfv_in_{g}") == F.col(f"_tfv_{g}"), "left"
        )

    odds = F.lit(float(params.lam)) / F.lit(float(1.0 - params.lam))
    for i, g in enumerate(gamma_cols):
        m_i = float(params.m[i])
        u_i = float(params.u[i])
        agree_k = F.lit(m_i) / F.lit(u_i)
        if g in tf_adjust:
            tf = F.col(f"_tf_{g}")
            agree_k = F.when(
                tf.isNotNull(),
                F.lit(m_i) / F.greatest(tf, F.lit(float(min_tf))),
            ).otherwise(agree_k)
        k_i = F.when(F.col(g) == 1, agree_k).otherwise(
            F.lit(float(1.0 - m_i)) / F.lit(float(1.0 - u_i))
        )
        odds = odds * k_i

    drop = [c for g in tf_adjust for c in (f"_tfv_in_{g}", f"_tfv_{g}", f"_tf_{g}")]
    return (
        out.withColumn(bayes_col, odds * F.lit(float((1.0 - params.lam) / params.lam)))
        .withColumn(posterior_col, odds / (odds + F.lit(1.0)))
        .drop(*drop)
    )
