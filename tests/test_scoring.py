"""Scoring stage: hydration oracle, feature values, truncation parity, calibration."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.functions.similarity import (
    jaro_winkler_py,
)
from productbert_intermediate_spark.operators import scoring as S
from productbert_intermediate_spark.operators.extract import extract_offers


def test_jaro_winkler_known_values():
    # canonical values from the Winkler 1990 literature
    assert jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler_py("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-4)
    assert jaro_winkler_py("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-4)
    assert jaro_winkler_py("abc", "abc") == 1.0
    assert jaro_winkler_py("abc", "xyz") == 0.0
    assert jaro_winkler_py(None, "abc") == 0.0


def test_hydration_matches_pandas_oracle(spark, fixtures_dir):
    offers = extract_offers(
        spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    ).where("id is not null")
    opd = offers.toPandas()
    ids = sorted(opd["id"])[:40]
    pairs = [(ids[i], ids[i + 1]) for i in range(0, len(ids) - 1, 2)]
    pairs_df = spark.createDataFrame(pairs, "id_l long, id_r long")
    got = S.hydrate_pairs(pairs_df, offers).toPandas().sort_values("id_l")

    idx = opd.set_index("id")
    for _, row in got.iterrows():
        for attr in S.PAIR_ATTRS:
            lv = idx.at[row["id_l"], attr]
            rv = idx.at[row["id_r"], attr]
            assert (row[f"{attr}_left"] == lv) or (
                pd.isna(row[f"{attr}_left"]) and pd.isna(lv)
            )
            assert (row[f"{attr}_right"] == rv) or (
                pd.isna(row[f"{attr}_right"]) and pd.isna(rv)
            )


def test_sequence_truncation_matches_reference_cut(spark):
    """token_prefix == ' '.join(x.split(' ')[:N]) (reference _cut_lspc)."""
    from productbert_intermediate_spark.functions.text import token_prefix

    cases = [
        ("a b c d e f", 3),
        ("single", 5),
        ("a  doublespace b", 3),  # split(' ') keeps empty tokens
        ("", 4),
    ]
    for val, n in cases:
        got = (
            spark.createDataFrame([(val,)], "s string")
            .select(token_prefix(F.col("s"), n).alias("o"))
            .collect()[0]["o"]
        )
        want = " ".join(val.split(" ")[:n])
        assert got == want, (val, n, got, want)


def test_scoring_separates_gold_pairs(spark, fixtures_dir):
    offers = extract_offers(
        spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    ).where("id is not null")
    labeled = spark.read.parquet(f"{fixtures_dir}/labeled_pairs_gs.parquet")
    pairs = labeled.select(
        F.col("id_left").alias("id_l"), F.col("id_right").alias("id_r"), "label"
    )
    scored = S.score_candidates(pairs, offers, broadcast_offers=True).toPandas()
    acc = (scored["match"].astype(int) == scored["label"]).mean()
    assert acc >= 0.99, acc


def test_price_value_multi_locale():
    """Deterministic locale disambiguation: EU comma-decimal, US grouping,
    repeated-separator grouping, currency prefixes, junk → NULL."""
    from productbert_intermediate_spark.session import get_spark

    spark = get_spark("t")
    cases = [
        ("1.234,56", 1234.56),   # EU: dot grouping, comma decimal
        ("1,234.56", 1234.56),   # US: comma grouping, dot decimal
        ("12,99", 12.99),        # lone comma + 2 decimals → decimal
        ("1,234", 1234.0),       # lone comma + 3 digits → grouping
        ("1.234.567", 1234567.0),  # repeated dots → grouping
        ("1 234,56", 1234.56),     # fr: space grouping, comma decimal
        ("1 234,56", 1234.56),  # NBSP grouping (fr/ru WDC html)
        ("1 234 567", 1234567.0),  # narrow-NBSP grouping
        ("1 234 567,89", 1234567.89),
        ("2 for 10.99", 2.0),      # "10" is no 3-digit group → not joined
        ("10 12", 10.0),           # two numbers, not grouping
        ("$1,234.00", 1234.0),
        ("USD 123", 123.0),
        ("123.99", 123.99),
        ("9.99", 9.99),
        ("1.234", 1.234),        # en-locale tie-break, documented
        ("no digits here", None),
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "price_left string")
    got = [
        r["v"] for r in df.select(S._price_value("price_left").alias("v")).collect()
    ]
    for (raw, want), v in zip(cases, got):
        if want is None:
            assert v is None, (raw, v)
        else:
            assert v == pytest.approx(want), (raw, v, want)


def test_text_index_distributed_embed_bit_identical(spark, fixtures_dir):
    """The distributed (mapInPandas) index-embed path must be bit-identical
    to the driver-side path — embed_texts is row-local, so batch shape and
    locality cannot change a single float."""
    offers = extract_offers(
        spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    ).where("id is not null")
    n = offers.count()
    bc_small = S.build_text_index_broadcast(offers, n_offers=n)  # driver path
    bc_large = S.build_text_index_broadcast(offers, n_offers=10**9)  # forced distributed
    a, b = bc_small.value, bc_large.value
    assert np.array_equal(a["ids"], b["ids"])
    assert np.array_equal(a["emb"], b["emb"])
    assert a["texts"] == b["texts"]
    assert np.array_equal(a["tlens"], b["tlens"])


def test_fit_calibration_distributed_matches_driver_fit(spark):
    """IRLS over decimal-exact Spark aggregations converges to the same
    l2-regularized optimum the driver-side GD fitter approaches — weights
    agree to small tolerance, predictions agree exactly."""
    rng = np.random.RandomState(11)
    X = pd.DataFrame(rng.rand(400, len(S.FEATURES)), columns=list(S.FEATURES))
    # noisy labels + stronger l2 → strongly convex objective with an O(1)
    # optimum both fitters actually reach (near-separable data would leave
    # GD far from the optimum Newton finds)
    y = (X["jac_tokens"] + X["digit_jac"] + 0.5 * rng.randn(400) > 1.0).astype(int)
    w_driver = S.fit_calibration(X, y, iters=6000, l2=1e-2)
    df = spark.createDataFrame(X.assign(label=y))
    w_dist = S.fit_calibration_distributed(df, iters=25, l2=1e-2)
    for k in w_driver:
        assert abs(w_driver[k] - w_dist[k]) < 0.05, (k, w_driver[k], w_dist[k])
    logit_a = w_driver["bias"] + X.to_numpy() @ np.array([w_driver[f] for f in S.FEATURES])
    logit_b = w_dist["bias"] + X.to_numpy() @ np.array([w_dist[f] for f in S.FEATURES])
    assert ((logit_a > 0) == (logit_b > 0)).mean() > 0.995


def test_fit_calibration_distributed_parallelism_invariant(spark):
    """Decimal-exact sums → bit-identical weights at different partition
    counts (float sums would differ in the last ulps)."""
    rng = np.random.RandomState(3)
    X = pd.DataFrame(rng.rand(300, len(S.FEATURES)), columns=list(S.FEATURES))
    y = (X["emb_cos"] > 0.5).astype(int)
    df = spark.createDataFrame(X.assign(label=y))
    w1 = S.fit_calibration_distributed(df.repartition(2), iters=8)
    w2 = S.fit_calibration_distributed(df.repartition(37), iters=8)
    assert w1 == w2


def test_fit_calibration_distributed_early_stop(spark, fixtures_dir):
    """Early stop (tol) ends the Newton loop once |Δw| < tol with weights
    identical to the fixed-count run on the gate corpus, in strictly fewer
    Spark jobs — and the stop decision itself is parallelism-invariant
    (driver-side function of the bit-identical decimal aggregates)."""
    offers = extract_offers(
        spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    ).where("id is not null")
    labeled = spark.read.parquet(f"{fixtures_dir}/labeled_pairs_gs.parquet")
    pairs = labeled.select(
        F.col("id_left").alias("id_l"), F.col("id_right").alias("id_r"), "label"
    )
    # freeze the gate-corpus feature table so both fits see identical rows
    feats = (
        S.score_candidates(pairs, offers, broadcast_offers=True)
        .select(*S.FEATURES, "label")
        .toPandas()
    )
    df = spark.createDataFrame(feats)
    st_fixed, st_es = {}, {}
    w_fixed = S.fit_calibration_distributed(
        df, iters=25, l2=1e-2, tol=None, stats=st_fixed
    )
    w_es = S.fit_calibration_distributed(
        df, iters=25, l2=1e-2, tol=1e-9, stats=st_es
    )
    assert st_fixed["iters"] == 25
    assert st_es["iters"] < 25, st_es
    for k in w_fixed:
        assert abs(w_fixed[k] - w_es[k]) < 1e-9, (k, w_fixed[k], w_es[k])
    # same tol at a different partitioning: same stop point, same bits
    st2 = {}
    w2 = S.fit_calibration_distributed(
        df.repartition(13), iters=25, l2=1e-2, tol=1e-9, stats=st2
    )
    assert st2 == st_es
    assert w2 == w_es


def test_fit_calibration_deterministic():
    rng = np.random.RandomState(7)
    X = pd.DataFrame(
        rng.rand(200, len(S.FEATURES)), columns=list(S.FEATURES)
    )
    y = (X["jac_tokens"] + X["digit_jac"] > 1.0).astype(int)
    w1 = S.fit_calibration(X, y)
    w2 = S.fit_calibration(X, y)
    assert w1 == w2
    logit = w1["bias"] + X.to_numpy() @ np.array([w1[f] for f in S.FEATURES])
    pred = (1 / (1 + np.exp(-logit)) > 0.5).astype(int)
    assert (pred == y).mean() > 0.9


def test_hydration_broadcast_exchange_is_reused(spark, fixtures_dir):
    """Both hydration sides must come from ONE materialized exchange.

    The side subplan is identical for the left and right joins (renames
    happen after the join), so the exchange-reuse rule replaces the second
    BroadcastExchange with a ReusedExchange — one driver-serial broadcast
    build per scoring run instead of two. Asserted with AQE off: the static
    ReuseExchangeAndSubquery rule applies iff the two subplans canonicalize
    equal — the exact property the hydrate restructure establishes — and is
    deterministic, while AQE applies the same reuse at runtime but its
    stage-creation order makes the final-plan string timing-dependent."""
    offers = extract_offers(
        spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    ).where("id is not null")
    ids = [r[0] for r in offers.select("id").limit(20).collect()]
    pairs = [(ids[i], ids[i + 1]) for i in range(0, len(ids) - 1, 2)]
    pairs_df = spark.createDataFrame(pairs, "id_l long, id_r long")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        hydrated = S.hydrate_pairs(
            pairs_df, S.prepare_offers_for_scoring(offers),
            broadcast_offers=True, prepared=True,
        )
        assert hydrated.count() == len(pairs)
        plan = hydrated._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "ReusedExchange" in plan, plan
