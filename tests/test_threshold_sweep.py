"""pr_threshold_sweep / best_threshold / uncertainty_sample unit behavior.

The registry queries (driver contract) pin both operators against DuckDB
on the sf tables; these tests pin the parts the oracle queries don't
exercise — a brute-force sweep reference, the no-positives guard, the
best-threshold tie-break, and the stratified sampler branch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from productbert_intermediate_spark.operators.metrics_ops import (
    best_threshold,
    population_stability_index,
    pr_threshold_sweep,
    score_drift_cells,
)
from productbert_intermediate_spark.operators.training_sets import (
    uncertainty_sample,
)


def _brute_sweep(rows: list[tuple[float, int]], n_bins: int):
    """Per-threshold confusion counts by literal re-scan."""
    bins = sorted({int(s * n_bins) for s, _ in rows})
    out = {}
    for b in bins:
        th = b / n_bins
        tp = sum(1 for s, y in rows if int(s * n_bins) >= b and y == 1)
        fp = sum(1 for s, y in rows if int(s * n_bins) >= b and y == 0)
        fn = sum(1 for s, y in rows if int(s * n_bins) < b and y == 1)
        out[th] = (tp, fp, fn)
    return out


def test_sweep_matches_brute_force(spark):
    rows = [
        (0.95, 1), (0.91, 1), (0.90, 0), (0.72, 1), (0.71, 0),
        (0.55, 1), (0.31, 0), (0.30, 1), (0.11, 0), (0.05, 0),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {
        r["threshold"]: (r["tp"], r["fp"], r["fn"])
        for r in pr_threshold_sweep(df, n_bins=100).collect()
    }
    assert got == _brute_sweep(rows, 100)


def test_sweep_ratios_and_partition_invariance(spark):
    rows = [(i / 100, 1 if i % 3 == 0 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label int")
    one = pr_threshold_sweep(df.coalesce(1), n_bins=10).collect()
    many = pr_threshold_sweep(df.repartition(13), n_bins=10).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
    for r in one:
        assert r["precision"] == r["tp"] / (r["tp"] + r["fp"])
        assert r["recall"] == r["tp"] / (r["tp"] + r["fn"])


def test_sweep_no_positives_guard(spark):
    df = spark.createDataFrame(
        [(0.9, 0), (0.2, 0)], "score double, label int"
    )
    for r in pr_threshold_sweep(df, n_bins=10).collect():
        assert r["recall"] is None and r["f1"] is None
        assert r["tp"] == 0 and r["fn"] == 0
        assert r["precision"] == 0.0


def test_best_threshold_ties_break_low(spark):
    # two thresholds with identical (tp, fp, fn) → identical f1; the
    # lower one must win (maximal recall margin at equal f1)
    df = spark.createDataFrame(
        [(0.85, 1), (0.45, 0)], "score double, label int"
    )
    best = best_threshold(df, n_bins=10)
    # sweep rows: th=0.8 (tp1 fp0) f1=1.0 ; th=0.4 (tp1 fp1) lower f1
    assert best["threshold"] == 0.8 and best["f1"] == 1.0

    # exact tie: both occupied bins classify identically
    df2 = spark.createDataFrame(
        [(0.95, 1), (0.75, 1)], "score double, label int"
    )
    best2 = best_threshold(df2, n_bins=10)
    assert best2["f1"] == 1.0
    assert best2["threshold"] == 0.7  # 0.9 row ties at f1=1.0; lower wins


def test_score_drift_cells_zero_fill_both_sides(spark):
    cur = spark.createDataFrame([(0.05,), (0.05,), (0.95,)], "score double")
    base = spark.createDataFrame([(0.05,), (0.55,)], "score double")
    got = {
        r["bin"]: (r["n_current"], r["n_baseline"])
        for r in score_drift_cells(cur, base, n_bins=10).collect()
    }
    # bin 9 only in current, bin 5 only in baseline — both zero-filled
    assert got == {0: (2, 1), 5: (0, 1), 9: (1, 0)}


def test_psi_identical_is_zero_and_shift_is_positive(spark):
    a = spark.createDataFrame([(i / 100,) for i in range(100)], "score double")
    assert population_stability_index(a, a, n_bins=10) == 0.0
    # all mass moved into the top decile: large PSI
    b = spark.createDataFrame([(0.95,)] * 100, "score double")
    psi = population_stability_index(b, a, n_bins=10)
    assert psi is not None and psi > 0.25
    # empty side → None, not a crash
    empty = a.where("score < 0")
    assert population_stability_index(empty, a, n_bins=10) is None


def test_uncertainty_sample_global_deterministic(spark):
    rows = [(i, abs(((i * 37) % 100) / 100)) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, score double")
    a = uncertainty_sample(df.coalesce(1), 10, key_cols=("vec_id",)).collect()
    b = uncertainty_sample(df.repartition(17), 10, key_cols=("vec_id",)).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    # brute force: order by |score-0.5| then vec_id
    want = sorted(rows, key=lambda t: (abs(t[1] - 0.5), t[0]))[:10]
    assert [r["vec_id"] for r in a] == [i for i, _ in want]
    assert all(r["uncertainty"] == abs(r["score"] - 0.5) for r in a)


def test_uncertainty_sample_stratified(spark):
    rows = [
        (i, ((i * 37) % 100) / 100, "blk%d" % (i % 3)) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "vec_id long, score double, blk string")
    got = uncertainty_sample(
        df.repartition(7), 4, key_cols=("vec_id",), per="blk"
    ).collect()
    by_blk: dict[str, list] = {}
    for r in got:
        by_blk.setdefault(r["blk"], []).append(r["vec_id"])
    # exactly 4 per stratum, and each stratum's 4 are its brute-force best
    for blk, ids in by_blk.items():
        members = [t for t in rows if t[2] == blk]
        want = sorted(members, key=lambda t: (abs(t[1] - 0.5), t[0]))[:4]
        assert sorted(ids) == sorted(i for i, _, _ in want), blk
    assert len(by_blk) == 3 and all(len(v) == 4 for v in by_blk.values())
    # helper column dropped on the stratified branch too
    assert "_rk" not in got[0].asDict()
