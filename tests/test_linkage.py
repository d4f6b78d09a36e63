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


# --------------------------------------------------------------------------
# link_records: the end-to-end block -> score -> one-to-one flow


def _clean_sides(spark, fixtures_dir):
    """Two properly DEDUPLICATED catalogs from the fixture truth: per
    cluster, the lowest even id goes left and the lowest odd id right —
    so the true linkage is one-to-one by construction and carries
    cluster_id for grading."""
    offers = (
        extract_offers(spark.read.parquet(f"{fixtures_dir}/pages.parquet"))
        .where("id is not null")
        .join(
            spark.read.parquet(f"{fixtures_dir}/offers_truth.parquet")
            .select("id", "cluster_id"),
            "id",
        )
    )
    from pyspark.sql import Window

    w_first = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy("id")
    )
    left = (
        offers.where("id % 2 = 0").withColumn("_rn", w_first)
        .where("_rn = 1").drop("_rn")
    )
    right = (
        offers.where("id % 2 = 1").withColumn("_rn", w_first)
        .where("_rn = 1").drop("_rn")
    )
    return left, right


def test_link_records_end_to_end_quality(spark, fixtures_dir):
    from productbert_intermediate_spark.operators.linkage import link_records

    left, right = _clean_sides(spark, fixtures_dir)
    truth_l = {r["id"]: r["cluster_id"] for r in left.select("id", "cluster_id").collect()}
    truth_r = {r["id"]: r["cluster_id"] for r in right.select("id", "cluster_id").collect()}
    got = link_records(
        left.drop("cluster_id"), right.drop("cluster_id"),
        blocking={"max_rare_df": 20},
    ).collect()
    # valid one-to-one matching
    assert len({r.id_l for r in got}) == len(got)
    assert len({r.id_r for r in got}) == len(got)
    # graded against truth: precision high (matched pairs same cluster),
    # and most linkable clusters found
    correct = sum(1 for r in got if truth_l[r.id_l] == truth_r[r.id_r])
    linkable = len(set(truth_l.values()) & set(truth_r.values()))
    assert len(got) > 0 and linkable > 20
    precision = correct / len(got)
    recall = correct / linkable
    assert precision >= 0.95, (precision, len(got))
    assert recall >= 0.80, (recall, linkable)


def test_link_records_id_collision_and_decision_layers(spark, fixtures_dir):
    from productbert_intermediate_spark.operators.linkage import link_records

    left, right = _clean_sides(spark, fixtures_dir)
    left, right = left.drop("cluster_id"), right.drop("cluster_id")
    # force the two catalogs onto OVERLAPPING autoincrement keys: BOTH
    # sides renumber to 1..n, so ids 1..min(nl,nr) exist on both sides
    from pyspark.sql import Window
    rn = F.row_number().over(Window.orderBy("id")).cast("long")
    left_c = left.withColumn("id", rn)
    right_c = right.withColumn("id", rn)
    overlap = left_c.select("id").intersect(right_c.select("id")).count()
    assert overlap > 0  # the collision is real
    base = {
        (r.id_l, r.id_r)
        for r in link_records(left, right, blocking={"max_rare_df": 20}).collect()
    }
    # the renumber is order-preserving, so results must be the SAME pairs
    # modulo the id mapping — collisions change nothing
    def _rank_of(df):
        return {
            r.id: i + 1
            for i, r in enumerate(sorted(df.select("id").collect(), key=lambda r: r.id))
        }
    rank_l, rank_r = _rank_of(left), _rank_of(right)
    collided = {
        (r.id_l, r.id_r)
        for r in link_records(left_c, right_c, blocking={"max_rare_df": 20}).collect()
    }
    assert collided == {(rank_l[l], rank_r[r]) for l, r in base}
    # decision-layer ladder on the same input: mutual ⊆ greedy ⊆ all-matched
    all_m = {
        (r.id_l, r.id_r)
        for r in link_records(
            left, right, one_to_one=None, blocking={"max_rare_df": 20}
        ).collect()
    }
    mutual = {
        (r.id_l, r.id_r)
        for r in link_records(
            left, right, one_to_one="mutual", blocking={"max_rare_df": 20}
        ).collect()
    }
    assert mutual <= base <= all_m


# --------------------------------------------------------------------------
# sorted-neighborhood pass for linkage (sn_window)


def test_link_sn_window_catches_prefix_neighbors_cross_side_only(spark):
    # two near-identical titles on opposite sides sharing a 12-char prefix;
    # the token family is silenced with an impossible min_df, so only the
    # SN pass can pair them
    rows = [
        (2, "x", "professional widget alpha", None),
        (3, "x", "professional widget alpha deluxe", None),
        # background rows far away in sort order, one per side
        (4, "x", "aaaa early sort", None),
        (5, "x", "zzzz late sort", None),
    ]
    df = spark.createDataFrame(
        rows, "id long, category string, title string, description string"
    )
    got = link_candidate_pairs(
        df.where("id % 2 = 0"), df.where("id % 2 = 1"),
        min_df=10**6, use_lsh=False, sn_window=1,
    )
    pairs = {(r["id_l"], r["id_r"]) for r in got.collect()}
    assert (2, 3) in pairs
    # cross-side orientation: id_l always from the left catalog
    assert all(a % 2 == 0 and b % 2 == 1 for a, b in pairs)


def test_link_sn_window_matches_bruteforce_rank_windows(spark, fixtures_dir):
    left, right = _sides(spark, fixtures_dir)
    w = 3
    got = {
        (r["id_l"], r["id_r"])
        for r in link_candidate_pairs(
            # min_df above any real df silences the token family entirely
            # (max_rare_df=0 would NOT: `0 or DEFAULT` takes the default
            # cap) — SN contribution only
            left, right, min_df=10**6, use_lsh=False, sn_window=w,
        ).collect()
    }
    # brute force: sort the union by (12-char normalized-title prefix,
    # remapped id), pair every row with its w successors, keep cross pairs
    import re

    def keyed(df, mul, add):
        out = []
        for r in df.select("id", "title").collect():
            t = re.sub(r"\s+", " ", (r["title"] or "").lower().strip())
            out.append((t[:12], r["id"] * mul + add))
        return out

    rows = sorted(keyed(left, 2, 0) + keyed(right, 2, 1))
    want = set()
    for i, (_, uid_a) in enumerate(rows):
        for j in range(i + 1, min(i + 1 + w, len(rows))):
            uid_b = rows[j][1]
            if uid_a % 2 != uid_b % 2:
                l, r = (uid_a, uid_b) if uid_a % 2 == 0 else (uid_b, uid_a)
                want.add((l // 2, r // 2))
    assert got == want and len(got) > 0


# --------------------------------------------------------------------------
# meta-blocking pruning for linkage (meta_prune)


def test_link_meta_prune_wep_matches_bruteforce(spark, fixtures_dir):
    left, right = _sides(spark, fixtures_dir)
    got = {
        (r["id_l"], r["id_r"])
        for r in link_candidate_pairs(
            left, right, max_rare_df=20, max_block_pairs=100,
            use_lsh=False, meta_prune="wep",
        ).collect()
    }
    # brute force: CBS weight = # shared kept keys; WEP keeps
    # weight * n_pairs > sum(weights) (exact integer rule)
    base = _brute_cross_pairs(left, right, 20, 100)
    from collections import Counter

    def keyed_sets(df, side):
        t = B.build_title_for_ts(df).select("id", "category", "tokens").toPandas()
        return {
            (r["id"], r["category"], tok)
            for _, r in t.iterrows()
            for tok in set(r["tokens"])
        }

    lrows, rrows = keyed_sets(left, "l"), keyed_sets(right, "r")
    w = Counter()
    lmap = defaultdict(set)
    for i, g, tok in lrows:
        lmap[(g, tok)].add(i)
    rmap = defaultdict(set)
    for i, g, tok in rrows:
        rmap[(g, tok)].add(i)
    # recompute kept keys exactly as _brute_cross_pairs gates them
    df_count = defaultdict(set)
    n_by_g = defaultdict(set)
    for i, g, tok in lrows | rrows:
        df_count[(g, tok)].add(i)
        n_by_g[g].add(i)
    for (g, tok), ids in df_count.items():
        df = len(ids)
        ls, rs = lmap[(g, tok)], rmap[(g, tok)]
        if (
            2 <= df <= min(20, 0.8 * len(n_by_g[g]))
            and ls and rs and len(ls) * len(rs) <= 100
        ):
            for a in ls:
                for b in rs:
                    w[(a, b)] += 1
    assert set(w) == base  # weights cover exactly the plain pair set
    n, s = len(w), sum(w.values())
    want = {p for p, wt in w.items() if wt * n > s}
    assert got == want and 0 < len(got) < len(base)


def test_link_meta_prune_wep_vs_wnp_semantics(spark):
    # A-B share two kept tokens (weight 2), A-C share one (weight 1).
    # WEP (global mean, strict): 2*2 > 3 keeps A-B; 1*2 < 3 drops A-C.
    # WNP (either-endpoint mean, OR): A-C survives via endpoint C, whose
    # only pair it is (the scheme is redundancy-positive by design).
    rows = [
        (0, "x", "alpha beta gamma", None),       # left A
        (1, "x", "alpha beta delta", None),       # right B: shares alpha+beta
        (3, "x", "gamma epsilon zeta", None),     # right C: shares gamma
    ]
    df = spark.createDataFrame(
        rows, "id long, category string, title string, description string"
    )

    def run(prune):
        return {
            (r["id_l"], r["id_r"])
            for r in link_candidate_pairs(
                df.where("id % 2 = 0"), df.where("id % 2 = 1"),
                max_rare_df=50, use_lsh=False, meta_prune=prune,
            ).collect()
        }

    assert run("wep") == {(0, 1)}
    assert run("wnp") == {(0, 1), (0, 3)}


def test_link_meta_prune_overlapping_id_spaces(spark):
    """ADVICE r5 (medium): WNP/WEP pruning unions id_l/id_r into one node
    column, so overlapping catalog id spaces merged a left and an
    unrelated right record into one node and corrupted the keep/drop
    means. The prune now runs in the disjoint id*2+side space, so a run
    on overlapping ids must equal the same run with the right catalog
    manually shifted into a disjoint range (blocking is id-agnostic)."""
    from productbert_intermediate_spark.operators.linkage import (
        link_candidate_pairs,
    )

    rows_l = [
        (i, "cat", f"acme widget model{i} blue", None) for i in range(8)
    ]
    # SAME numeric ids on the right (the overlap), similar titles so keys
    # collide across sides and several pairs share an endpoint
    rows_r = [
        (i, "cat", f"acme widget model{i // 2} blue", None) for i in range(8)
    ]
    schema = "id long, category string, title string, description string"
    left = spark.createDataFrame(rows_l, schema)
    right = spark.createDataFrame(rows_r, schema)
    shift = 10_000
    right_shifted = right.withColumn("id", F.col("id") + shift)

    for prune in ("wnp", "wep"):
        got = {
            (r.id_l, r.id_r)
            for r in link_candidate_pairs(
                left, right, use_lsh=False, meta_prune=prune
            ).collect()
        }
        expect = {
            (r.id_l, r.id_r - shift)
            for r in link_candidate_pairs(
                left, right_shifted, use_lsh=False, meta_prune=prune
            ).collect()
        }
        assert got == expect, prune


def test_link_remap_precondition_raises_loudly(spark):
    """ADVICE r5: an id outside [0, 2^62) must fail the job instead of
    silently corrupting the id*2+side remap."""
    import pytest

    from productbert_intermediate_spark.operators.linkage import (
        link_candidate_pairs,
    )

    schema = "id long, category string, title string, description string"
    left = spark.createDataFrame(
        [(-1, "cat", "acme widget blue", None),
         (2, "cat", "acme widget blue", None)], schema
    )
    right = spark.createDataFrame(
        [(3, "cat", "acme widget blue", None),
         (4, "cat", "acme widget blue", None)], schema
    )
    with pytest.raises(Exception, match="remap precondition"):
        link_candidate_pairs(left, right, use_lsh=False).collect()
