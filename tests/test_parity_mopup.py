"""A8 observe-based metric tracker, S3 CSV report sink, Magellan features."""

import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.functions.similarity import (
    abs_norm,
    exact_match,
    jaro_winkler_py,
    monge_elkan_py,
    monge_elkan_udf,
    needleman_wunsch_py,
    needleman_wunsch_udf,
)
from productbert_intermediate_spark.operators.metrics_ops import MetricTracker
from productbert_intermediate_spark.sources.catalog import StageCatalog


# ------------------------------------------------------------- A8 tracker


def test_metric_tracker_observe_costs_no_extra_job(spark):
    tracker = MetricTracker("score")
    df = spark.createDataFrame([(0.2,), (0.4,), (0.9,)], "score double")
    observed = tracker.attach(df, score=F.col("score"))
    assert observed.count() == 3  # the only action
    tracker.harvest()
    assert abs(tracker.avg("score") - 0.5) < 1e-12


def test_metric_tracker_running_mean_across_batches(spark):
    tracker = MetricTracker("loss")
    for batch in ([1.0, 3.0], [5.0]):
        df = spark.createDataFrame([(v,) for v in batch], "loss double")
        tracker.attach(df, loss=F.col("loss")).count()
        tracker.harvest()
    # reference semantics: total / count over everything seen (util.py:88-95)
    assert tracker.avg("loss") == 3.0
    assert tracker.result() == {"loss": 3.0}


def test_metric_tracker_driver_side_update():
    t = MetricTracker("f1")
    t.update("f1", 0.5, n=2)
    t.update("f1", 1.0, n=2)
    assert t.avg("f1") == 0.75
    assert t.avg("missing") is None if "missing" in t.result() else True


# ------------------------------------------------------------ S3 CSV sink


def test_csv_report_roundtrip(spark, tmp_path):
    cat = StageCatalog(spark, str(tmp_path))
    df = spark.createDataFrame(
        [("1#2", 1), ("3#4", 0)], "pair_id string, label int"
    )
    cat.write_csv_report("training_ids", df)
    back = cat.read_csv_report("training_ids")
    got = {(r["pair_id"], int(r["label"])) for r in back.collect()}
    assert got == {("1#2", 1), ("3#4", 0)}


# ------------------------------------------------- Magellan feature family


def test_monge_elkan_hand_values():
    assert monge_elkan_py("good time", "good time") == 1.0
    # each token of a takes its best JW match in b
    expect = (jaro_winkler_py("aa", "aa") + max(
        jaro_winkler_py("bb", "aa"), jaro_winkler_py("bb", "cc")
    )) / 2
    assert abs(monge_elkan_py("aa bb", "aa cc") - expect) < 1e-12
    assert monge_elkan_py(None, "x") == 0.0
    assert monge_elkan_py("", "") == 0.0


def test_needleman_wunsch_hand_values():
    assert needleman_wunsch_py("", "") == 0.0
    assert needleman_wunsch_py("a", "a") == 1.0
    assert needleman_wunsch_py("ab", "ab") == 2.0
    assert needleman_wunsch_py("a", "b") == 0.0
    # py_stringmatching documented example
    assert needleman_wunsch_py("dva", "deeva") == 1.0
    # symmetric
    assert needleman_wunsch_py("abcd", "xbcy") == needleman_wunsch_py("xbcy", "abcd")


def test_magellan_udfs_and_columns(spark):
    df = spark.createDataFrame(
        [("good time", "good time", "A", "A", 10.0, 8.0),
         ("aa bb", "aa cc", "A", "B", 0.0, 0.0),
         (None, "x", None, "B", None, 1.0)],
        "a string, b string, ba string, bb string, na double, nb double",
    )
    rows = df.select(
        monge_elkan_udf("a", "b").alias("me"),
        needleman_wunsch_udf("a", "b").alias("nw"),
        exact_match(F.col("ba"), F.col("bb")).alias("em"),
        abs_norm(F.col("na"), F.col("nb")).alias("anm"),
    ).collect()
    assert rows[0]["me"] == 1.0 and rows[0]["em"] == 1.0
    assert abs(rows[0]["anm"] - 0.8) < 1e-12
    # py_entitymatching parity: both inputs 0 → 0.0 (not 1.0)
    assert rows[1]["em"] == 0.0 and rows[1]["anm"] == 0.0
    assert rows[2]["em"] is None and rows[2]["anm"] is None


def test_abs_norm_py_entitymatching_edge_parity(spark):
    """Both-zero → 0.0; relative difference ≤ 10e-5 clamps to exactly 1.0;
    just above the clamp threshold stays un-clamped."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0 + 5e-5), (1.0, 1.0 + 2e-4), (10.0, 8.0)],
        "x double, y double",
    )
    got = [r["anm"] for r in df.select(abs_norm(F.col("x"), F.col("y")).alias("anm")).collect()]
    assert got[0] == 0.0
    assert got[1] == 1.0
    assert got[2] == pytest.approx(1.0 - 2e-4 / 1.0002)
    assert got[3] == pytest.approx(0.8)


# --- dense_ids: scale-safe surrogate-id assignment ------------------------

def test_dense_ids_matches_global_window_rank(spark):
    from pyspark.sql import Window
    from productbert_intermediate_spark.operators.ids import dense_ids

    # Skewed, shuffled, multi-partition distinct keys (strings sort
    # differently from their insertion order).
    import random

    rng = random.Random(7)
    keys = [f"k{rng.randrange(10**6):06d}" for _ in range(5000)]
    keys = list(dict.fromkeys(keys))
    rng.shuffle(keys)
    df = spark.createDataFrame([(k,) for k in keys], "key string").repartition(16)

    got = {
        r["key"]: r["dense_id"]
        for r in dense_ids(df, "key", num_partitions=8).collect()
    }
    want = {
        r["key"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("key")) - 1
        ).collect()
    }
    assert got == want


def test_dense_ids_single_partition_and_tiny(spark):
    from productbert_intermediate_spark.operators.ids import dense_ids

    df = spark.createDataFrame([(x,) for x in (30, 10, 20)], "key int")
    rows = sorted(
        dense_ids(df, "key", out_col="code", num_partitions=1).collect()
    )
    assert [(r["key"], r["code"]) for r in rows] == [(10, 0), (20, 1), (30, 2)]
    # more partitions than rows
    rows = sorted(dense_ids(df, "key", num_partitions=64).collect())
    assert [r["dense_id"] for r in rows] == [0, 1, 2]


def test_metric_tracker_never_run_action_does_not_hang(spark):
    """An attached df whose action never executed must not block harvest
    forever (bare Observation.get would); it stays pending and folds in
    once the action eventually runs."""
    import time

    tracker = MetricTracker("x")
    df = tracker.attach(
        spark.createDataFrame([(1.0,)], "x double"), x=F.col("x")
    )
    t0 = time.monotonic()
    tracker.harvest(timeout_s=0.5)
    assert time.monotonic() - t0 < 5.0
    assert tracker.avg("x") is None and len(tracker._pending) == 1
    df.count()
    tracker.harvest()
    assert tracker.avg("x") == 1.0 and not tracker._pending


def test_metric_tracker_public_api_fallback(spark, monkeypatch):
    """When the private Observation._jo peek is unavailable (Spark Connect,
    future PySpark), harvest must still fold completed observations via the
    public blocking get, and still not hang on never-run actions."""
    import time

    def _no_private(obs):
        raise AttributeError("_jo gone (Spark Connect)")

    monkeypatch.setattr(MetricTracker, "_peek_completed", staticmethod(_no_private))

    tracker = MetricTracker("x")
    df = tracker.attach(
        spark.createDataFrame([(2.0,), (4.0,)], "x double"), x=F.col("x")
    )
    df.count()
    deadline = time.monotonic() + 30
    while tracker._pending and time.monotonic() < deadline:
        tracker.harvest(timeout_s=1.0)
    assert tracker.avg("x") == 3.0 and not tracker._pending

    # never-run action on the fallback path: bounded, stays pending
    t2 = MetricTracker("y")
    t2.attach(spark.createDataFrame([(1.0,)], "y double"), y=F.col("y"))
    t0 = time.monotonic()
    t2.harvest(timeout_s=0.5)
    assert time.monotonic() - t0 < 5.0
    assert t2.avg("y") is None and len(t2._pending) == 1
