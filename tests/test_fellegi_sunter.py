"""Fellegi-Sunter EM: planted-parameter recovery, distributed-step
bit-identity at any parallelism, label-switching guard, scoring
monotonicity, and an unsupervised end-to-end fit on the synthetic corpus
scored against its planted truth."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from productbert_intermediate_spark.operators.fellegi_sunter import (
    FSParams,
    em_fit_counts,
    em_step,
    em_step_local,
    fit_em,
    gamma_pattern_counts,
    score_fs,
)

K = 3
GAMMA_COLS = ["g_a", "g_b", "g_c"]


def _planted_counts(lam=0.3, m=(0.9, 0.8, 0.95), u=(0.1, 0.2, 0.05), n=200_000):
    """Exact expected pattern counts under the FS model (no sampling noise:
    EM on the exact expectation must recover the planted parameters)."""
    counts = []
    for g0 in (0, 1):
        for g1 in (0, 1):
            for g2 in (0, 1):
                g = (g0, g1, g2)
                pm = lam
                pu = 1.0 - lam
                for i in range(K):
                    pm *= m[i] if g[i] else 1.0 - m[i]
                    pu *= u[i] if g[i] else 1.0 - u[i]
                counts.append(g + (max(1, round(n * (pm + pu))),))
    return counts


def test_em_recovers_planted_params():
    lam, m, u = 0.3, (0.9, 0.8, 0.95), (0.1, 0.2, 0.05)
    params = em_fit_counts(_planted_counts(lam, m, u), K)
    assert params.converged
    assert abs(params.lam - lam) < 0.01
    for i in range(K):
        assert abs(params.m[i] - m[i]) < 0.01, (i, params.m)
        assert abs(params.u[i] - u[i]) < 0.01, (i, params.u)


def test_em_deterministic_under_row_order():
    counts = _planted_counts()
    shuffled = counts[::-1]
    random.Random(7).shuffle(shuffled)
    a = em_fit_counts(counts, K)
    b = em_fit_counts(shuffled, K)
    assert a == b  # bit-identical: fixed internal sort order


def test_label_switching_guard():
    # Init biased toward the wrong class: m0 low, u0 high latches the
    # "match" latent class onto non-matches; the guard must swap back.
    params = em_fit_counts(_planted_counts(), K, lam0=0.7, m0=0.2, u0=0.8)
    assert sum(params.m) > sum(params.u)
    assert params.lam < 0.5


def test_em_step_spark_matches_local_bitwise(spark):
    counts = _planted_counts()
    lam0, m0, u0 = 0.25, [0.875] * K, [0.125] * K
    df = spark.createDataFrame(
        [tuple(map(int, r)) for r in counts], "g_a int, g_b int, g_c int, n long"
    )
    lam1, m1, u1 = em_step_local(counts, K, lam0, m0, u0)
    for parts in (1, 7):
        got = {
            r["attr"]: r
            for r in em_step(df.repartition(parts), GAMMA_COLS, lam0, m0, u0).collect()
        }
        for i, c in enumerate(GAMMA_COLS):
            # exact equality — integer-sum arithmetic, no float accumulation
            assert got[c]["m_next"] == m1[i]
            assert got[c]["u_next"] == u1[i]
            assert got[c]["lam_next"] == lam1


def test_em_step_quantization_close_to_float_em():
    counts = _planted_counts()
    lam0, m0, u0 = 0.25, [0.875] * K, [0.125] * K
    lam_q, m_q, u_q = em_step_local(counts, K, lam0, m0, u0)
    ref = em_fit_counts(counts, K, lam0, m0, u0, max_iter=1)
    assert abs(lam_q - ref.lam) < 1e-8
    for i in range(K):
        assert abs(m_q[i] - ref.m[i]) < 1e-8
        assert abs(u_q[i] - ref.u[i]) < 1e-8


def test_gamma_pattern_counts_partial_aggregable(spark):
    rows = [(1, 0, 1)] * 5 + [(0, 0, 0)] * 3 + [(1, 1, 1)] * 2
    df = spark.createDataFrame(rows, "g_a int, g_b int, g_c int")
    got = {
        (r["g_a"], r["g_b"], r["g_c"]): r["n"]
        for r in gamma_pattern_counts(df.repartition(5), GAMMA_COLS).collect()
    }
    assert got == {(1, 0, 1): 5, (0, 0, 0): 3, (1, 1, 1): 2}


def test_score_fs_monotone_and_bounded(spark):
    params = FSParams(0.3, (0.9, 0.8, 0.95), (0.1, 0.2, 0.05))
    rows = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (1, 1, 1)]
    df = spark.createDataFrame(rows, "g_a int, g_b int, g_c int")
    out = score_fs(df, GAMMA_COLS, params).collect()
    by_g = {(r["g_a"], r["g_b"], r["g_c"]): r for r in out}
    probs = [by_g[g]["match_prob"] for g in rows]
    assert probs == sorted(probs)  # more agreement -> higher posterior
    assert 0.0 < probs[0] < 0.05 and 0.95 < probs[-1] < 1.0
    for r in out:
        assert r["bayes_factor"] > 0.0


def _pair_gammas(pairs):
    """Unsupervised agreement vectors over the hydrated gold pairs —
    built WITHOUT the label column."""
    tok = lambda c: F.array_distinct(  # noqa: E731
        F.split(F.lower(F.coalesce(F.col(c), F.lit(""))), r"\s+")
    )
    inter = F.size(F.array_intersect(tok("title_left"), tok("title_right")))
    union = F.size(F.array_union(tok("title_left"), tok("title_right")))
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    head = lambda c: F.slice(  # noqa: E731
        F.split(F.lower(F.coalesce(F.col(c), F.lit(""))), r"\s+"), 1, 4
    )
    return pairs.select(
        "id_left",
        "id_right",
        (jac >= 0.5).cast("int").alias("g_title"),
        (
            F.col("brand_left").isNotNull()
            & F.col("brand_right").isNotNull()
            & (F.col("brand_left") == F.col("brand_right"))
        ).cast("int").alias("g_brand"),
        (head("description_left") == head("description_right"))
        .cast("int")
        .alias("g_desc"),
    )


def test_unsupervised_fit_separates_synthetic_corpus(spark, fixtures_dir):
    pairs = spark.read.parquet(f"{fixtures_dir}/labeled_pairs_gs.parquet")
    gcols = ["g_title", "g_brand", "g_desc"]
    gammas = _pair_gammas(pairs)
    # 1e-8 tol: the weakly-separating title gamma (m≈0.23) gives EM a slow
    # asymptotic rate here; 1e-10 needs >200 iterations for no extra signal
    params = fit_em(gammas, gcols, max_iter=500, tol=1e-8)
    assert params.converged
    # matches agree more than non-matches on every attribute
    for i in range(len(gcols)):
        assert params.m[i] > params.u[i] + 0.1, (gcols[i], params)

    scored = score_fs(gammas, gcols, params).join(
        pairs.select("id_left", "id_right", "label"), ["id_left", "id_right"]
    )
    cm = scored.agg(
        F.sum(((F.col("match_prob") >= 0.5) & (F.col("label") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("match_prob") >= 0.5) & (F.col("label") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("match_prob") < 0.5) & (F.col("label") == 1)).cast("long")).alias("fn"),
    ).collect()[0]
    prec = cm["tp"] / max(1, cm["tp"] + cm["fp"])
    rec = cm["tp"] / max(1, cm["tp"] + cm["fn"])
    f1 = 2 * prec * rec / max(1e-9, prec + rec)
    # fully unsupervised on a corpus with planted hard negatives: the FS
    # posterior should still cleanly separate (supervised paths hit 0.99)
    assert f1 >= 0.90, (prec, rec, f1)


def test_term_frequency_and_tf_adjusted_scoring(spark):
    from productbert_intermediate_spark.operators.fellegi_sunter import (
        score_fs_tf,
        term_frequency,
    )

    recs = spark.createDataFrame(
        [("acme",)] * 8 + [("rare",)] * 1 + [(None,)] * 1, "brand string"
    )
    tf = {r["value"]: r["tf"] for r in term_frequency(recs, "brand").collect()}
    assert tf == {"acme": 8 / 9, "rare": 1 / 9}  # NULLs excluded from N

    params = FSParams(0.25, (0.875,), (0.125,))
    pairs = spark.createDataFrame(
        [
            (1, "rare", "rare", 1),   # rare agreement: strongest
            (2, "acme", "acme", 1),   # head-value agreement: weaker than global
            (3, None, None, 1),       # agreement w/o usable value: global u
            (4, "acme", "rare", 0),   # disagreement: unchanged
        ],
        "pid long, brand_a string, brand_b string, g_brand int",
    )
    out = {
        r["pid"]: r
        for r in score_fs_tf(
            pairs,
            ["g_brand"],
            params,
            {"g_brand": ("brand_a", "brand_b", term_frequency(recs, "brand"))},
        ).collect()
    }
    # K(rare)=m/(1/9)=7.875 > K(global)=m/u=7.0 > K(acme)=m/(8/9)=0.984
    assert abs(out[1]["bayes_factor"] - 0.875 * 9) < 1e-12
    assert abs(out[3]["bayes_factor"] - 7.0) < 1e-12
    assert abs(out[2]["bayes_factor"] - 0.875 * 9 / 8) < 1e-12
    assert abs(out[4]["bayes_factor"] - (0.125 / 0.875)) < 1e-12
    assert (
        out[2]["match_prob"] < out[3]["match_prob"] < out[1]["match_prob"]
    )
    # posterior consistency: odds/(1+odds) with odds = lam/(1-lam)*K
    odds = 0.25 / 0.75 * out[1]["bayes_factor"]
    assert abs(out[1]["match_prob"] - odds / (1 + odds)) < 1e-12
    # join left intact: no helper columns leak
    assert not [c for c in out[1].asDict() if c.startswith("_tf")]


def _planted_level_counts(
    lam=0.3,
    m=((0.05, 0.15, 0.8), (0.1, 0.9), (0.2, 0.8)),
    u=((0.7, 0.25, 0.05), (0.85, 0.15), (0.9, 0.1)),
    n=500_000,
):
    """Exact expected counts under a 3-attribute multi-level FS model
    (levels 3, 2, 2). Three attributes because two are NOT identifiable:
    a (3,2)-level model has 7 free parameters against only 5 free pattern
    probabilities, so EM converges to a different point on the likelihood
    ridge; (3,2,2) gives 9 parameters against 11 dof."""
    counts = []
    for g0 in range(3):
        for g1 in range(2):
            for g2 in range(2):
                pm = lam * m[0][g0] * m[1][g1] * m[2][g2]
                pu = (1.0 - lam) * u[0][g0] * u[1][g1] * u[2][g2]
                counts.append((g0, g1, g2, max(1, round(n * (pm + pu)))))
    return counts


def test_em_levels_recovers_planted_params():
    from productbert_intermediate_spark.operators.fellegi_sunter import (
        em_fit_counts_levels,
    )

    lam = 0.3
    m = ((0.05, 0.15, 0.8), (0.1, 0.9), (0.2, 0.8))
    u = ((0.7, 0.25, 0.05), (0.85, 0.15), (0.9, 0.1))
    params = em_fit_counts_levels(_planted_level_counts(lam, m, u), [3, 2, 2])
    assert params.converged
    assert abs(params.lam - lam) < 0.01
    for i in range(3):
        for l in range(len(m[i])):
            assert abs(params.m[i][l] - m[i][l]) < 0.01, (i, l, params)
            assert abs(params.u[i][l] - u[i][l]) < 0.01, (i, l, params)
    # distributions: each class's levels sum to 1
    for dist in (*params.m, *params.u):
        assert abs(sum(dist) - 1.0) < 1e-9


def test_score_fs_levels_monotone_and_explains(spark):
    from productbert_intermediate_spark.operators.fellegi_sunter import (
        FSLevelParams,
        score_fs_levels,
    )

    params = FSLevelParams(
        0.3, ((0.05, 0.15, 0.8), (0.1, 0.9)), ((0.7, 0.25, 0.05), (0.85, 0.15))
    )
    rows = [(0, 0), (1, 0), (2, 0), (2, 1)]
    df = spark.createDataFrame(rows, "g_a int, g_b int")
    out = {
        (r["g_a"], r["g_b"]): r
        for r in score_fs_levels(df, ["g_a", "g_b"], params, explain=True).collect()
    }
    probs = [out[g]["match_prob"] for g in rows]
    assert probs == sorted(probs)  # higher levels -> higher posterior
    # explanation columns are the exact per-attribute factors and their
    # product times prior odds reproduces the posterior odds
    r = out[(2, 1)]
    assert abs(r["k_g_a"] - 0.8 / 0.05) < 1e-12
    assert abs(r["k_g_b"] - 0.9 / 0.15) < 1e-12
    odds = 0.3 / 0.7 * r["k_g_a"] * r["k_g_b"]
    assert abs(r["match_prob"] - odds / (1 + odds)) < 1e-12
    assert abs(r["bayes_factor"] - r["k_g_a"] * r["k_g_b"]) < 1e-9


def test_fit_em_levels_on_corpus(spark, fixtures_dir):
    from productbert_intermediate_spark.operators.fellegi_sunter import (
        fit_em_levels,
        score_fs_levels,
    )

    pairs = spark.read.parquet(f"{fixtures_dir}/labeled_pairs_gs.parquet")
    bin_g = _pair_gammas(pairs)
    # 3-level title gamma: 0 = jaccard<0.25, 1 = [0.25,0.5), 2 = >=0.5
    tok = lambda c: F.array_distinct(  # noqa: E731
        F.split(F.lower(F.coalesce(F.col(c), F.lit(""))), r"\s+")
    )
    inter = F.size(F.array_intersect(tok("title_left"), tok("title_right")))
    union = F.size(F.array_union(tok("title_left"), tok("title_right")))
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    lv = pairs.select(
        "id_left",
        "id_right",
        F.when(jac >= 0.5, 2).when(jac >= 0.25, 1).otherwise(0).alias("g_title3"),
    ).join(bin_g.select("id_left", "id_right", "g_brand", "g_desc"), ["id_left", "id_right"])
    gcols = ["g_title3", "g_brand", "g_desc"]
    params = fit_em_levels(lv, gcols, [3, 2, 2], max_iter=500, tol=1e-8)
    scored = score_fs_levels(lv, gcols, params).join(
        pairs.select("id_left", "id_right", "label"), ["id_left", "id_right"]
    )
    cm = scored.agg(
        F.sum(((F.col("match_prob") >= 0.5) & (F.col("label") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("match_prob") >= 0.5) & (F.col("label") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("match_prob") < 0.5) & (F.col("label") == 1)).cast("long")).alias("fn"),
    ).collect()[0]
    prec = cm["tp"] / max(1, cm["tp"] + cm["fp"])
    rec = cm["tp"] / max(1, cm["tp"] + cm["fn"])
    f1 = 2 * prec * rec / max(1e-9, prec + rec)
    assert f1 >= 0.90, (prec, rec, f1, params)


def test_fix_u_pins_u_through_em():
    counts = _planted_counts()
    fixed = [0.12, 0.21, 0.04]
    params = em_fit_counts(counts, K, fix_u=fixed)
    assert list(params.u) == fixed  # untouched by EM
    assert params.converged
    # m and lam still recovered near the planted values (0.03 tolerance:
    # the pinned u values are deliberately offset from the planted truth,
    # which biases the m fit proportionally)
    assert abs(params.lam - 0.3) < 0.03
    for i, want in enumerate((0.9, 0.8, 0.95)):
        assert abs(params.m[i] - want) < 0.03


def test_estimate_u_from_random_pairs(spark, fixtures_dir):
    from productbert_intermediate_spark.operators.fellegi_sunter import (
        estimate_u_from_random_pairs,
    )

    offers = spark.read.parquet(f"{fixtures_dir}/offers_truth.parquet").select(
        "id", "brand", "cluster_id"
    )

    def gammas(joined):
        return joined.select(
            (
                F.col("brand_l").isNotNull()
                & F.col("brand_r").isNotNull()
                & (F.col("brand_l") == F.col("brand_r"))
            ).cast("int").alias("g_brand"),
        )

    u = estimate_u_from_random_pairs(offers, gammas, ["g_brand"], 400, seed=3)
    # random-pair brand agreement: positive but far below the in-cluster
    # rate; deterministic for a fixed seed
    assert 0.0 < u[0] < 0.5
    u2 = estimate_u_from_random_pairs(offers, gammas, ["g_brand"], 400, seed=3)
    assert u == u2


def test_fit_em_parallelism_invariant(spark, fixtures_dir):
    pairs = spark.read.parquet(f"{fixtures_dir}/labeled_pairs_gs.parquet")
    gcols = ["g_title", "g_brand", "g_desc"]
    g = _pair_gammas(pairs)
    a = fit_em(g.repartition(1), gcols, max_iter=50, tol=1e-8)
    b = fit_em(g.repartition(13), gcols, max_iter=50, tol=1e-8)
    assert a == b
