"""Training-set construction: split arithmetic, filter chains, swap, e2e."""

import pandas as pd
from pyspark.sql import functions as F

from productbert_intermediate_spark.operators.training_sets import (
    build_training_pairs,
    candidate_similarities,
    hard_negative_pairs,
    hard_random_counts,
    orientation_dedup,
    positive_pairs,
    random_negative_pairs,
    seeded_swap,
)


def _ref_split(available: int, amount: int) -> tuple[int, int]:
    """The reference's literal arithmetic (sample_intermediate_training_
    sets.py:63-76)."""
    m = min(available, amount)
    if m == 1:
        return 1, 0
    if m % 2 == 1:
        return m // 2 + 1, m // 2
    return m // 2, m // 2


def test_hard_random_counts_match_reference_arithmetic(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "n")
    h, r = hard_random_counts(F.col("n"), 15)
    got = {row["n"]: (row["h"], row["r"])
           for row in df.select("n", h.alias("h"), r.alias("r")).collect()}
    for n in range(40):
        assert got[n] == _ref_split(n, 15), n


def _corpus(spark):
    rows = [
        # cluster 1 (cat A): three similar offers
        (1, 1, "A", ["red", "fast", "car", "x1"]),
        (2, 1, "A", ["red", "fast", "car", "x2"]),
        (3, 1, "A", ["red", "fast", "car", "x1", "x2"]),
        # cluster 2 (cat A): near-identical to cluster 1 (hard negatives)
        (4, 2, "A", ["red", "fast", "car", "y1"]),
        (5, 2, "A", ["red", "fast", "car", "x1"]),
        # cluster 3 (cat A): unrelated
        (6, 3, "A", ["green", "slow", "bike"]),
        # exact copy of offer 1 in another cluster → sim 1.0, must be dropped
        (7, 4, "A", ["red", "fast", "car", "x1"]),
        # cat B: separate pool
        (8, 5, "B", ["blue", "boat", "z"]),
        (9, 6, "B", ["blue", "boat", "w"]),
    ]
    return spark.createDataFrame(
        rows, "id long, cluster_id long, category string, tokens array<string>"
    )


def test_hard_negative_chain_small_oracle(spark):
    corpus = _corpus(spark)
    cands = candidate_similarities(corpus, 0.2, toks_col="tokens")
    hard = hard_negative_pairs(corpus, cands, amount=4, num_best=10)
    rows = {(r["query_id"], r["cand_id"]) for r in hard.collect()}
    # query 1: sim≥0.2 candidates are 5(1.0) 3(0.8) 4(0.6) 2(0.6); 5 and 7
    # are exact copies (sim 1.0 → dropped); best-per-cluster keeps 3 for
    # cluster 1 and 4 for cluster 2; cross-cluster drops 3 → avail=1 →
    # hard=1 → (1,4)
    assert (1, 4) in rows
    assert (1, 5) not in rows and (1, 7) not in rows, "sim >= 1.0 must be dropped"
    # same-cluster candidates never appear
    meta = {r["id"]: r["cluster_id"] for r in corpus.collect()}
    for q, c in rows:
        assert meta[q] != meta[c]


def test_hard_negatives_one_per_candidate_cluster(spark):
    corpus = _corpus(spark)
    cands = candidate_similarities(corpus, 0.2, toks_col="tokens")
    hard = hard_negative_pairs(corpus, cands, amount=10, num_best=10).toPandas()
    meta = {r["id"]: r["cluster_id"] for r in corpus.collect()}
    hard["cc"] = hard["cand_id"].map(meta)
    dup = hard.groupby(["query_id", "cc"]).size()
    assert (dup <= 1).all()


def test_random_negatives_constraints_and_determinism(spark):
    corpus = _corpus(spark)
    cands = candidate_similarities(corpus, 0.2, toks_col="tokens")
    hard = hard_negative_pairs(corpus, cands, amount=4, num_best=10)
    rand1 = random_negative_pairs(corpus, hard, amount=4, seed=42)
    rand2 = random_negative_pairs(corpus, hard, amount=4, seed=42)
    r1 = sorted(map(tuple, rand1.collect()))
    assert r1 == sorted(map(tuple, rand2.collect()))
    meta = {r["id"]: r["cluster_id"] for r in corpus.collect()}
    hard_set = {(r["query_id"], r["cand_id"]) for r in hard.collect()}
    for q, c in r1:
        assert q != c
        assert meta[q] != meta[c]
        assert (q, c) not in hard_set


def test_positive_pairs_within_cluster_only(spark):
    corpus = _corpus(spark)
    pos = positive_pairs(corpus, amount=4, num_best=10).toPandas()
    meta = {r["id"]: r["cluster_id"] for r in corpus.collect()}
    assert len(pos) > 0
    for q, c in zip(pos["query_id"], pos["cand_id"]):
        assert q != c
        assert meta[q] == meta[c]
    # per-query totals respect the split arithmetic cap
    per_q = pos.groupby("query_id").size()
    assert (per_q <= 4).all()


def test_orientation_dedup_and_swap_preserve_pair_set(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (5, 6)], "query_id long, cand_id long"
    )
    ded = orientation_dedup(pairs)
    assert ded.count() == 3
    swapped = seeded_swap(ded, seed=42)
    rows = swapped.collect()
    assert {frozenset((r["id_left"], r["id_right"])) for r in rows} == {
        frozenset((1, 2)), frozenset((3, 4)), frozenset((5, 6)),
    }
    for r in rows:
        assert r["pair_id"] == f"{r['id_left']}#{r['id_right']}"
    # deterministic
    again = {r["pair_id"] for r in seeded_swap(ded, seed=42).collect()}
    assert again == {r["pair_id"] for r in rows}
    # a different seed flips at least one orientation eventually
    seeds = [{r["pair_id"] for r in seeded_swap(ded, seed=s).collect()}
             for s in range(6)]
    assert len(set(map(frozenset, seeds))) > 1


def test_build_training_pairs_end_to_end(spark):
    corpus = _corpus(spark)
    out = build_training_pairs(
        corpus, amount=4, pos_num_best=10, neg_num_best=10, neg_sim_threshold=0.2
    ).toPandas()
    assert set(out.columns) >= {"id_left", "id_right", "pair_id", "label"}
    assert set(out["label"].unique()) == {0, 1}
    meta = {r["id"]: r["cluster_id"] for r in corpus.collect()}
    for _, row in out.iterrows():
        same = meta[row["id_left"]] == meta[row["id_right"]]
        assert same == (row["label"] == 1)
    # unordered pairs are unique
    key = out.apply(lambda r: frozenset((r["id_left"], r["id_right"])), axis=1)
    assert not key.duplicated().any()


def test_build_training_pairs_gs_exclusion(spark):
    corpus = _corpus(spark)
    gs = spark.createDataFrame([(2, 1)], "id_a long, id_b long")
    out = build_training_pairs(
        corpus, amount=4, pos_num_best=10, neg_num_best=10,
        neg_sim_threshold=0.2, gs_pairs=gs,
    ).toPandas()
    key = set(out.apply(lambda r: frozenset((r["id_left"], r["id_right"])), axis=1))
    assert frozenset((1, 2)) not in key


def test_random_negatives_dominant_cluster_not_undersampled(spark):
    """A query inside a cluster holding 90% of its category must still get
    its full n_random quota: the probe window adapts to eligibility (and
    degenerates to scanning the whole category) instead of probing a fixed
    oversample*k slice that is mostly same-cluster."""
    rows = [(i, 1 if i < 180 else 100 + i, "A") for i in range(200)]
    corpus = spark.createDataFrame(
        [(i, c, g, ["t"]) for i, c, g in rows],
        "id long, cluster_id long, category string, tokens array<string>",
    )
    hard = spark.createDataFrame(
        [(1, 185, 10)], "query_id long, cand_id long, avail int"
    )
    got = random_negative_pairs(corpus, hard, amount=10, seed=42).collect()
    # k = min(avail, amount) - n_hard = 9; eligible cross-cluster candidates
    # excluding the hard pick = 19 >= k, so exactly k rows must come back
    assert len(got) == 9
    meta = dict((i, c) for i, c, _g in rows)
    for r in got:
        assert r.query_id == 1
        assert meta[r.cand_id] != 1
        assert r.cand_id != 185
