"""Stable entity ids: inheritance, splits, merges, fresh clusters,
determinism, empty-prev bootstrap."""

from __future__ import annotations

from productbert_intermediate_spark.operators.entity_ids import stabilize_entity_ids


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, entity_id long")


def _got(spark, prev_rows, new_rows):
    out = stabilize_entity_ids(_df(spark, prev_rows), _df(spark, new_rows))
    return {r["id"]: (r["entity_id"], r["inherited"]) for r in out.collect()}


def test_unchanged_clusters_keep_ids(spark):
    prev = [(1, 10), (2, 10), (3, 30)]
    new = [(1, 1), (2, 1), (3, 3)]  # same membership, relabeled by CC
    got = _got(spark, prev, new)
    assert got[1] == (10, True) and got[2] == (10, True)
    assert got[3] == (30, True)


def test_grown_cluster_inherits(spark):
    prev = [(1, 10), (2, 10)]
    new = [(1, 1), (2, 1), (4, 1)]  # new member 4 joined entity 10
    got = _got(spark, prev, new)
    assert got[1] == (10, True) and got[4] == (10, True)


def test_split_strongest_claimant_wins(spark):
    # prev entity 10 = {1,2,3}; new run splits it {1,2} vs {3}
    prev = [(1, 10), (2, 10), (3, 10)]
    new = [(1, 1), (2, 1), (3, 3)]
    got = _got(spark, prev, new)
    assert got[1] == (10, True) and got[2] == (10, True)
    # the loser is a FRESH id above every prev id
    eid, inherited = got[3]
    assert not inherited and eid > 10


def test_merge_takes_larger_overlap_smallest_on_tie(spark):
    # prev entities 10={1,2} and 20={3,4} merge into one new cluster:
    # equal overlap → smallest prev id (10) wins
    prev = [(1, 10), (2, 10), (3, 20), (4, 20)]
    new = [(1, 1), (2, 1), (3, 1), (4, 1)]
    got = _got(spark, prev, new)
    assert all(got[i] == (10, True) for i in (1, 2, 3, 4))


def test_fresh_clusters_get_dense_ids_above_prev(spark):
    prev = [(1, 10)]
    new = [(1, 1), (5, 5), (6, 5), (7, 7)]
    got = _got(spark, prev, new)
    assert got[1] == (10, True)
    fresh = sorted({got[i][0] for i in (5, 6, 7)})
    assert fresh == [11, 12]  # dense, starting at max_prev + 1
    assert got[5] == got[6] and not got[5][1]


def test_empty_prev_bootstraps_dense_from_zero(spark):
    new = [(1, 1), (2, 1), (3, 3)]
    got = _got(spark, [], new)
    assert {got[1][0], got[3][0]} == {0, 1}
    assert not got[1][1] and not got[3][1]


def test_deterministic_under_repartition(spark):
    prev = [(i, i // 3 * 100) for i in range(60)]
    new = [(i, i // 4) for i in range(80)]
    a = _got(spark, prev, new)
    out2 = stabilize_entity_ids(
        _df(spark, prev).repartition(13), _df(spark, new).repartition(7)
    )
    b = {r["id"]: (r["entity_id"], r["inherited"]) for r in out2.collect()}
    assert a == b
