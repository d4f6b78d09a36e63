"""Golden-record survivorship: rule semantics, tie-breaks, NULL handling,
and blocking-quality metric arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from productbert_intermediate_spark.operators.metrics_ops import blocking_quality
from productbert_intermediate_spark.operators.survivorship import golden_records


def _members(spark):
    rows = [
        # entity A (ids 1-3): longest title 'bbbb'; brand tie a/a/b → modal a;
        # price min 5.0
        (1, "bbbb", "a", 9.0),
        (2, "ccc", "a", 5.0),
        (3, "aaa", "b", 7.0),
        # entity B (ids 4-5): title LENGTH tie 'xx' vs 'zy' → lexicographically
        # largest wins ('zy'); brand count tie x=1, y=1 → smallest ('x');
        # price all NULL
        (4, "xx", "y", None),
        (5, "zy", "x", None),
        # entity C (id 6): all attribute NULLs stay NULL, count 1
        (6, None, None, None),
    ]
    return spark.createDataFrame(
        rows, "id long, title string, brand string, price double"
    )


def _entities(spark):
    rows = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)]
    return spark.createDataFrame(rows, "id long, entity_id long")


def test_golden_records_rules_and_ties(spark):
    out = golden_records(
        _members(spark),
        _entities(spark),
        longest_cols=("title",),
        modal_cols=("brand",),
        min_cols=("price",),
    )
    got = {r["entity_id"]: r.asDict() for r in out.collect()}
    assert got[1] == {
        "entity_id": 1, "n_members": 3, "title": "bbbb", "brand": "a",
        "price": 5.0,
    }
    assert got[4] == {
        "entity_id": 4, "n_members": 2, "title": "zy", "brand": "x",
        "price": None,
    }
    assert got[6] == {
        "entity_id": 6, "n_members": 1, "title": None, "brand": None,
        "price": None,
    }


def test_golden_records_partition_invariant(spark):
    """The picks are pure functions of each entity's value set: any input
    partitioning/order gives identical rows."""
    m = _members(spark)
    e = _entities(spark)
    base = sorted(
        map(tuple, golden_records(
            m, e, longest_cols=("title",), modal_cols=("brand",),
            min_cols=("price",),
        ).collect())
    )
    shuffled = sorted(
        map(tuple, golden_records(
            m.repartition(7).sortWithinPartitions(F.desc("id")), e,
            longest_cols=("title",), modal_cols=("brand",),
            min_cols=("price",),
        ).collect())
    )
    assert base == shuffled


def test_blocking_quality_counts_and_ratios(spark):
    # universe of 5 records; truth: (1,2) (3,4); candidates capture (2,1)
    # [reversed + duplicated] and add a false pair (1,5); (3,3) self-pair
    # must be dropped by normalization
    cands = spark.createDataFrame(
        [(2, 1), (1, 2), (1, 5), (3, 3)], "id_l long, id_r long"
    )
    truth = spark.createDataFrame([(1, 2), (3, 4)], "id_l long, id_r long")
    row = blocking_quality(cands, truth, 5).collect()[0]
    assert row["n_candidates"] == 2          # {1,2} {1,5}
    assert row["n_truth"] == 2
    assert row["n_captured"] == 1            # {1,2}
    assert row["pair_completeness"] == 0.5
    assert row["reduction_ratio"] == 1.0 - 2 / 10.0


def test_blocking_quality_empty_truth_guard(spark):
    cands = spark.createDataFrame([(1, 2)], "id_l long, id_r long")
    truth = spark.createDataFrame([], "id_l long, id_r long")
    row = blocking_quality(cands, truth, 3).collect()[0]
    assert row["pair_completeness"] is None
    assert row["n_captured"] == 0
