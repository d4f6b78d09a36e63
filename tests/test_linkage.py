"""Record-linkage blocking: cross-side-only invariant, brute-force oracle,
pair cap + tracker, LSH path, partition invariance.

The registry query `er_link_pairs` pins the rare-token family against a
DuckDB oracle on the sf tables; these tests pin the invariants that
oracle can't bind at sf0.001 — the cap actually dropping a key, the
tracker counting what it dropped, and the LSH family emitting cross
pairs for near-identical token sets.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from productbert_intermediate_spark.operators import blocking as B
from productbert_intermediate_spark.operators.extract import extract_offers
from productbert_intermediate_spark.operators.linkage import (
    link_candidate_pairs,
)
from productbert_intermediate_spark.operators.metrics_ops import MetricTracker


def _sides(spark, fixtures_dir):
    pages = spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    offers = extract_offers(pages).where("id is not null")
    return offers.where("id % 2 = 0"), offers.where("id % 2 = 1")


def _brute_cross_pairs(left_df, right_df, max_rare_df, max_block_pairs):
    """Independent pandas re-derivation: union dfs, per-(category, token)
    key, gate on both-sides + cap, cross-expand."""
    import pandas as pd  # noqa: F401

    def rows(df, side):
        t = B.build_title_for_ts(df).select("id", "category", "tokens").toPandas()
        return [
            (r["id"], side, r["category"], tok)
            for _, r in t.iterrows()
            for tok in set(r["tokens"])
        ]

    all_rows = rows(left_df, "l") + rows(right_df, "r")
    n_by_g = defaultdict(set)
    for i, _s, g, _t in all_rows:
        n_by_g[g].add(i)
    df_count = defaultdict(set)
    for i, _s, g, tok in all_rows:
        df_count[(g, tok)].add(i)
    keys = defaultdict(lambda: (set(), set()))
    for i, s, g, tok in all_rows:
        df = len(df_count[(g, tok)])
        if 2 <= df <= min(max_rare_df, 0.8 * len(n_by_g[g])):
            keys[(g, tok)][0 if s == "l" else 1].add(i)
    pairs = set()
    for ls, rs in keys.values():
        if ls and rs and len(ls) * len(rs) <= max_block_pairs:
            pairs |= {(a, b) for a in ls for b in rs}
    return pairs


def test_link_pairs_cross_side_only_and_match_bruteforce(spark, fixtures_dir):
    left, right = _sides(spark, fixtures_dir)
    got_df = link_candidate_pairs(
        left, right, max_rare_df=20, max_block_pairs=100, use_lsh=False
    )
    got = {(r["id_l"], r["id_r"]) for r in got_df.collect()}
    assert all(a % 2 == 0 and b % 2 == 1 for a, b in got)
    want = _brute_cross_pairs(left, right, 20, 100)
    assert got == want and len(got) > 0


def test_link_pair_cap_drops_key_and_tracker_observes(spark):
    # one shared token 'hub' on 4 left + 3 right ids (12 cross pairs) and
    # one 'tiny' on 1+1: cap at 4 keeps only the tiny key
    rows = [(i, "x", "hub common%d" % i, None) for i in range(4)]
    rows += [(10 + i, "x", "hub other%d" % i, None) for i in range(1, 4)]
    rows += [(100, "x", "tiny alpha", None), (101, "x", "tiny beta", None)]
    df = spark.createDataFrame(
        rows, "id long, category string, title string, description string"
    )
    left, right = df.where("id % 2 = 0"), df.where("id % 2 = 1")
    tr = MetricTracker()
    got = link_candidate_pairs(
        left, right, max_rare_df=50, max_block_pairs=4, use_lsh=False,
        tracker=tr,
    )
    pairs = {(r["id_l"], r["id_r"]) for r in got.collect()}
    tr.harvest()
    assert pairs == {(100, 101)}
    assert tr.total("link_dropped_keys") == 1
    assert tr.total("link_dropped_pairs") == 12  # 4 left * 3 right on 'hub'


def test_link_lsh_family_finds_near_identical_cross_pair(spark):
    # two near-identical titles on opposite sides, every token df-pruned
    # out of the rare family (each appears on both sides → df=2, but we
    # set max_rare_df=0 to silence the token family); LSH must carry them
    t = "zeta yotta quux corge grault garply waldo fred plugh xyzzy"
    rows = [(2, "x", t, None), (3, "x", t + " thud", None)]
    # df=1 background tokens so the pruner keeps nothing else
    rows += [(4, "x", "solo%d only%d" % (i, i), None) for i in range(6)]
    rows += [(5 + 2 * i, "x", "lone%d single%d" % (i, i), None) for i in range(3)]
    df = spark.createDataFrame(
        rows, "id long, category string, title string, description string"
    )
    got = link_candidate_pairs(
        df.where("id % 2 = 0"), df.where("id % 2 = 1"),
        max_rare_df=0, use_lsh=True,
    )
    pairs = {(r["id_l"], r["id_r"]) for r in got.collect()}
    assert (2, 3) in pairs
    assert all(a % 2 == 0 and b % 2 == 1 for a, b in pairs)


def test_link_pairs_partition_invariant(spark, fixtures_dir):
    left, right = _sides(spark, fixtures_dir)
    a = link_candidate_pairs(
        left.repartition(1), right.repartition(1),
        max_rare_df=20, use_lsh=False,
    )
    b = link_candidate_pairs(
        left.repartition(13), right.repartition(7),
        max_rare_df=20, use_lsh=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
