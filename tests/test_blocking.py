"""Blocking stage: recall guarantee, brute-force oracle, skew cap, determinism."""

from collections import defaultdict

import pandas as pd
from pyspark.sql import functions as F

from productbert_intermediate_spark.operators import blocking as B
from productbert_intermediate_spark.operators.extract import extract_offers


def _offers(spark, fixtures_dir):
    pages = spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    return extract_offers(pages).where("id is not null")


def test_blocking_full_recall_on_planted_clusters(spark, fixtures_dir):
    offers = _offers(spark, fixtures_dir).cache()
    truth = (
        spark.read.parquet(f"{fixtures_dir}/offers_truth.parquet")
        .select("id", "cluster_id")
        .toPandas()
    )
    pairs = B.block_offers(offers).toPandas()
    got = {(a, b) for a, b in zip(pairs["id_l"], pairs["id_r"])}

    extracted = set(offers.select("id").toPandas()["id"])
    by_cluster = defaultdict(list)
    for i, c in zip(truth["id"], truth["cluster_id"]):
        if i in extracted:
            by_cluster[c].append(i)
    missed = []
    for ids in by_cluster.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if (a, b) not in got:
                    missed.append((a, b))
    assert not missed, f"blocking missed {len(missed)} true pairs, e.g. {missed[:5]}"


def test_rare_token_keys_match_bruteforce_oracle(spark, fixtures_dir):
    """Pairs from the token family == all pairs sharing a token with
    min_df ≤ df ≤ min(max_rare_df, max_df_frac·N) within category (oracle
    computed independently in pandas)."""
    offers = _offers(spark, fixtures_dir).cache()
    tokenized = B.build_title_for_ts(offers)
    pruned = B.prune_tokens_by_df(tokenized)
    keys = B.rare_token_keys(pruned, max_rare_df=50)
    got = set(
        map(
            tuple,
            B.candidate_pairs_from_keys(keys, max_block_size=10**9)
            .toPandas()[["id_l", "id_r"]]
            .to_numpy()
            .tolist(),
        )
    )

    pdf = offers.select("id", "category", "title", "description").toPandas()

    def toks(row):
        title = row["title"] or ""
        desc5 = " ".join((row["description"] or "").split(" ")[:5])
        return set((title + " " + desc5).lower().split())

    pdf["tokens"] = pdf.apply(toks, axis=1)
    want = set()
    for cat, grp in pdf.groupby("category"):
        n = len(grp)
        df_count = defaultdict(int)
        for ts in grp["tokens"]:
            for t in ts:
                df_count[t] += 1
        keep = {
            t
            for t, c in df_count.items()
            if 2 <= c <= min(50, int(0.8 * n))
        }
        by_token = defaultdict(list)
        for i, ts in zip(grp["id"], grp["tokens"]):
            for t in ts & keep:
                by_token[t].append(i)
        for ids in by_token.values():
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    want.add((a, b))
    assert got == want


def test_oversized_blocks_are_dropped(spark):
    rows = [(i, "tok shared") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, title string").withColumn(
        "category", F.lit("c")
    ).withColumn("description", F.lit(None).cast("string"))
    keys = B.rare_token_keys(
        B.prune_tokens_by_df(B.build_title_for_ts(df), max_df_frac=2.0),
        max_rare_df=1000,
    )
    capped = B.candidate_pairs_from_keys(keys, max_block_size=10)
    assert capped.count() == 0
    uncapped = B.candidate_pairs_from_keys(keys, max_block_size=100)
    assert uncapped.count() == 30 * 29 // 2


def test_degenerate_band_key_never_reaches_collect(spark):
    """A planted degenerate LSH key (10k identical token sets → every id in
    one band) must be filtered by the count pass BEFORE collect_set: the
    optimized plan gates the collect aggregation behind a semi-join on the
    bounded keys, and the job completes with the oversized block dropped
    while healthy small blocks still pair up."""
    hot = [(i, "k") for i in range(10_000)]
    ok = [(100_000 + i, f"g{i // 2}") for i in range(6)]
    keys = spark.createDataFrame(hot + ok, "id long, key string")

    pairs = B.candidate_pairs_from_keys(keys, max_block_size=5)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    collect_pos = plan.find("collect_set")
    semi_pos = plan.find("LeftSemi")
    assert collect_pos != -1 and semi_pos != -1
    # plans print top-down: collect_set must sit ABOVE (after) the semi-join
    assert collect_pos < semi_pos, "collect_set runs before the size gate"

    got = sorted(map(tuple, pairs.collect()))
    assert got == [(100_000 + 2 * i, 100_001 + 2 * i) for i in range(3)]


def test_dropped_block_counters_observed(spark):
    """The size cap's recall trade must be measurable: a tracker attached to
    candidate_pairs_from_keys reports how many keys/ids/pairs the cap
    forfeited, computed during the query's own action (no extra job)."""
    from productbert_intermediate_spark.operators.metrics_ops import MetricTracker

    hot = [(i, "hot") for i in range(100)]
    ok = [(1000 + i, f"g{i // 2}") for i in range(6)]
    keys = spark.createDataFrame(hot + ok, "id long, key string")
    tracker = MetricTracker()
    pairs = B.candidate_pairs_from_keys(keys, max_block_size=5, tracker=tracker)
    assert pairs.count() == 3  # healthy 2-id blocks only
    tracker.harvest()
    assert tracker.total("blocking_dropped_keys") == 1
    assert tracker.total("blocking_dropped_rows") == 100
    assert tracker.total("blocking_dropped_pairs") == 100 * 99 // 2


def test_size_gate_counts_distinct_ids_not_key_rows(spark):
    """Duplicate (id, key) rows must not inflate a block past the cap: the
    gate measures distinct ids — the same population collect_set emits —
    so a 3-id block with repeated rows survives max_block_size=3."""
    rows = [(1, "k"), (1, "k"), (2, "k"), (2, "k"), (3, "k"), (3, "k")]
    keys = spark.createDataFrame(rows, "id long, key string")
    got = sorted(map(tuple, B.candidate_pairs_from_keys(keys, max_block_size=3).collect()))
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_blocking_is_deterministic(spark, fixtures_dir):
    offers = _offers(spark, fixtures_dir)
    a = sorted(map(tuple, B.block_offers(offers).collect()))
    b = sorted(map(tuple, B.block_offers(offers).collect()))
    assert a == b


def test_candidate_pairs_canonical_and_distinct(spark, fixtures_dir):
    pairs = B.block_offers(_offers(spark, fixtures_dir)).toPandas()
    assert (pairs["id_l"] < pairs["id_r"]).all()
    assert not pairs.duplicated(["id_l", "id_r"]).any()


def test_null_category_offers_still_block_together(spark):
    """Offers with NULL category must form their own blocking group, not be
    silently dropped by null-hostile equi-joins in the df pruning."""
    from productbert_intermediate_spark.operators import blocking as B

    rows = []
    for i in range(6):
        # three matching pairs sharing a rare token each, category NULL
        rows.append((10 + i, None, f"widget alpha{i // 2} common", None))
    for i in range(4):
        rows.append((50 + i, "cat", f"gadget beta{i // 2} common", None))
    offers = spark.createDataFrame(
        rows, "id long, category string, title string, description string"
    )
    pairs = {
        (r.id_l, r.id_r)
        for r in B.block_offers(offers, min_df=2, max_df_frac=0.9).collect()
    }
    assert (10, 11) in pairs and (12, 13) in pairs and (14, 15) in pairs
    assert (50, 51) in pairs and (52, 53) in pairs
    # no cross-group pairs between NULL-category and 'cat' offers
    assert not any(a < 50 <= b for a, b in pairs)


def test_minhash_band_divisibility_guard(spark):
    import pytest as _pytest

    from productbert_intermediate_spark.operators import blocking as B

    offers = spark.createDataFrame(
        [(1, "c", "a b c", None)],
        "id long, category string, title string, description string",
    )
    with _pytest.raises(ValueError):
        B.block_offers(offers, num_hashes=16, bands=5)


def _bruteforce_dfs(offers_pdf):
    """(group, token) → df over title_for_ts token sets, NULL category its
    own group (matches build_title_for_ts + the _gnorm coalesce)."""
    df_count = defaultdict(int)
    group_n = defaultdict(int)
    for _, row in offers_pdf.iterrows():
        cat = row["category"] if pd.notna(row["category"]) else "\x00<null>"
        group_n[cat] += 1
        title = row["title"] or ""
        desc5 = " ".join((row["description"] or "").split(" ")[:5])
        for t in set((title + " " + desc5).lower().split()):
            df_count[(cat, t)] += 1
    return df_count, group_n


def test_pair_budget_curve_matches_bruteforce(spark, fixtures_dir):
    """est_pairs per threshold == sum over eligible (group, token) keys of
    df·(df−1)/2 — the exact pre-distinct pair-expansion row count —
    computed independently in pandas."""
    offers = _offers(spark, fixtures_dir).cache()
    thresholds = [2, 3, 5, 10, 50]
    got = {
        int(r["max_rare_df"]): (int(r["n_keys"]), int(r["est_pairs"]))
        for r in B.pair_budget_curve(offers, thresholds).collect()
    }

    pdf = offers.select("id", "category", "title", "description").toPandas()
    df_count, group_n = _bruteforce_dfs(pdf)
    want = {}
    for t in thresholds:
        n_keys = est = 0
        for (cat, _tok), df in df_count.items():
            if 2 <= df <= min(t, 100, int(0.8 * group_n[cat])):
                n_keys += 1
                est += df * (df - 1) // 2
        if n_keys:
            want[t] = (n_keys, est)
    assert got == want
    # absence of a zero-key threshold row is part of the contract
    assert set(got) == {t for t in thresholds if want.get(t)}


def test_choose_max_rare_df_budget_logic(spark, fixtures_dir):
    offers = _offers(spark, fixtures_dir).cache()
    thresholds = (2, 5, 50)

    # an effectively unlimited budget picks the largest threshold
    chosen, curve = B.choose_max_rare_df(offers, 10**15, thresholds=thresholds)
    assert chosen == 50
    assert [c["max_rare_df"] for c in curve] == [2, 5, 50]
    # curve is monotone in both columns (every key admitted at t is admitted at t' > t)
    assert curve[0]["n_keys"] <= curve[1]["n_keys"] <= curve[2]["n_keys"]
    assert curve[0]["est_pairs"] <= curve[1]["est_pairs"] <= curve[2]["est_pairs"]
    assert curve[2]["est_pairs"] > 0

    # the largest AFFORDABLE threshold wins, not the largest overall
    mid_budget = curve[1]["est_pairs"]
    chosen_mid, _ = B.choose_max_rare_df(offers, mid_budget, thresholds=thresholds)
    assert chosen_mid == (50 if curve[2]["est_pairs"] <= mid_budget else 5)

    # nothing affordable → smallest candidate, overrun visible in the curve
    chosen0, curve0 = B.choose_max_rare_df(offers, 0, thresholds=thresholds)
    assert chosen0 == 2
    assert curve0[0]["est_pairs"] > 0


def test_choose_max_rare_df_bounds_actual_expansion(spark, fixtures_dir):
    """The chosen threshold's ACTUAL rare-token pair expansion (pre-distinct
    combination rows) never exceeds est_pairs — the estimate is exact, so
    the realized distinct-pair count is ≤ the budgeted cost."""
    offers = _offers(spark, fixtures_dir).cache()
    budget = 20_000
    chosen, curve = B.choose_max_rare_df(offers, budget)
    est = next(c["est_pairs"] for c in curve if c["max_rare_df"] == chosen)
    assert est <= budget
    pruned = B.prune_tokens_by_df(B.build_title_for_ts(offers))
    keys = B.rare_token_keys(pruned, max_rare_df=chosen)
    realized = B.candidate_pairs_from_keys(keys, max_block_size=100).count()
    assert realized <= est


# ---- sorted_neighborhood_pairs ----

def _sn_oracle(rows, window):
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want = set()
    for i, (a, _k) in enumerate(order):
        for j in range(i + 1, min(i + window + 1, len(order))):
            b = order[j][0]
            want.add((min(a, b), max(a, b)))
    return want


def test_sorted_neighborhood_vs_bruteforce(spark):
    import random as _random

    rng = _random.Random(99)
    rows = [(i, "k%02d" % rng.randrange(12)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, key string")
    for w in (1, 3, 7):
        got = {
            (int(r["id_l"]), int(r["id_r"]))
            for r in B.sorted_neighborhood_pairs(df, window=w).collect()
        }
        assert got == _sn_oracle(rows, w), w


def test_sorted_neighborhood_partition_invariant(spark):
    """Global rank (and hence the pair set) must not depend on the input's
    partitioning — the distributed-rank path is boundary-invariant."""
    rows = [(i, "g%d" % (i % 5)) for i in range(100)]
    base = spark.createDataFrame(rows, "id long, key string")
    a = B.sorted_neighborhood_pairs(base.repartition(1), window=4)
    b = B.sorted_neighborhood_pairs(base.repartition(17), window=4)
    sa = {(int(r["id_l"]), int(r["id_r"])) for r in a.collect()}
    sb = {(int(r["id_l"]), int(r["id_r"])) for r in b.collect()}
    assert sa == sb and len(sa) > 0


def test_sorted_neighborhood_window_exceeds_corpus(spark):
    """window >= n-1 degenerates to all pairs — the budget bound's edge."""
    rows = [(i, "same") for i in range(6)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {
        (int(r["id_l"]), int(r["id_r"]))
        for r in B.sorted_neighborhood_pairs(df, window=10).collect()
    }
    assert got == {(i, j) for i in range(6) for j in range(i + 1, 6)}


def test_block_offers_sn_window_is_superset(spark, fixtures_dir):
    """The sorted-neighborhood pass only ever ADDS candidates: the keyed
    pair set is a subset of the sn-augmented one, and the extras are
    exactly the SN pairs over the normalized title prefix."""
    offers = _offers(spark, fixtures_dir)
    base = {
        (int(r["id_l"]), int(r["id_r"]))
        for r in B.block_offers(offers, use_lsh=False).collect()
    }
    augmented = {
        (int(r["id_l"]), int(r["id_r"]))
        for r in B.block_offers(offers, use_lsh=False, sn_window=3).collect()
    }
    assert base <= augmented
    from productbert_intermediate_spark.functions.text import lower_ws_normalize

    keyed = offers.select(
        "id",
        F.substring(
            lower_ws_normalize(F.coalesce(F.col("title"), F.lit(""))), 1, 12
        ).alias("key"),
    )
    sn = {
        (int(r["id_l"]), int(r["id_r"]))
        for r in B.sorted_neighborhood_pairs(keyed, window=3).collect()
    }
    assert augmented == base | sn and len(sn - base) > 0


def test_prune_narrow_mode_yields_identical_keys(spark):
    """narrow=True (r6: skips the corpus-sized join back onto offers) must
    produce exactly the same rare-token AND LSH band keys as the wide
    mode, including NULL-category offers and offers losing every token."""
    rows = [
        (1, "a", "acme widget blue fast", None),
        (2, "a", "acme widget blue slow", None),
        (3, "a", "acme gizmo red", None),
        (4, "a", "bolt nut washer", None),
        (5, None, "zeta gadget green", None),
        (6, None, "zeta gadget green", None),
        (7, None, "zeta gearbox teal", None),
        (8, None, "pump hose valve", None),
        (9, "b", "onlyuniquetokenshere atall", None),  # all tokens df=1
    ]
    df = spark.createDataFrame(
        rows, "id long, category string, title string, description string"
    )
    tokenized = B.build_title_for_ts(df)
    wide = B.prune_tokens_by_df(tokenized)
    narrow = B.prune_tokens_by_df(tokenized, narrow=True)
    for gen in (
        lambda p: B.rare_token_keys(p, 100),
        lambda p: B.minhash_band_keys(p),
    ):
        kw = {(r.id, r.key) for r in gen(wide).collect()}
        kn = {(r.id, r.key) for r in gen(narrow).collect()}
        assert kw == kn and kw
