"""B-cubed cluster metrics vs a brute-force per-record reference."""

from __future__ import annotations

from productbert_intermediate_spark.operators.metrics_ops import (
    bcubed_cells,
    bcubed_metrics,
)


def _brute_bcubed(pred: dict, truth: dict):
    """Per-record definition: for record e, precision_e = |C(e) ∩ T(e)| /
    |C(e)| over records sharing e's predicted cluster (truth for recall)."""
    ids = [i for i in pred if i in truth]
    ps, rs = [], []
    for e in ids:
        c = [i for i in ids if pred[i] == pred[e]]
        t = [i for i in ids if truth[i] == truth[e]]
        both = [i for i in c if truth[i] == truth[e]]
        ps.append(len(both) / len(c))
        rs.append(len(both) / len(t))
    return sum(ps) / len(ids), sum(rs) / len(ids)


def test_bcubed_matches_brute_force(spark):
    # pred splits truth cluster X; merges Y and Z; id 9 unlabeled in truth
    pred = {1: 100, 2: 100, 3: 101, 4: 102, 5: 102, 6: 102, 7: 103, 9: 104}
    truth = {1: "X", 2: "X", 3: "X", 4: "Y", 5: "Y", 6: "Z", 7: "Z"}
    p_df = spark.createDataFrame(list(pred.items()), "id long, entity_id long")
    t_df = spark.createDataFrame(list(truth.items()), "id long, truth_id string")

    got = bcubed_metrics(p_df, t_df)
    exp_p, exp_r = _brute_bcubed(pred, truth)
    assert abs(got["bcubed_precision"] - exp_p) < 1e-12
    assert abs(got["bcubed_recall"] - exp_r) < 1e-12

    cells = {(r.entity_id, r.truth_id): r for r in bcubed_cells(p_df, t_df).collect()}
    assert cells[(100, "X")].n_cell == 2
    assert cells[(100, "X")].n_pred == 2
    assert cells[(100, "X")].n_truth == 3
    assert cells[(102, "Y")].n_cell == 2 and cells[(102, "Z")].n_cell == 1
    assert (104, None) not in cells and all(e != 104 for e, _ in cells)


def test_bcubed_perfect_clustering(spark):
    pred = [(i, i // 2) for i in range(10)]
    truth = [(i, str(i // 2)) for i in range(10)]
    got = bcubed_metrics(
        spark.createDataFrame(pred, "id long, entity_id long"),
        spark.createDataFrame(truth, "id long, truth_id string"),
    )
    assert got["bcubed_precision"] == 1.0
    assert got["bcubed_recall"] == 1.0
    assert got["bcubed_f1"] == 1.0


def test_bcubed_empty_intersection_guard(spark):
    got = bcubed_metrics(
        spark.createDataFrame([(1, 1)], "id long, entity_id long"),
        spark.createDataFrame([(2, "a")], "id long, truth_id string"),
    )
    assert got == {
        "bcubed_precision": None, "bcubed_recall": None, "bcubed_f1": None
    }


def test_pipeline_reports_bcubed_with_truth(spark, e2e_dir, tmp_path_factory):
    """With ground-truth clusters supplied, the run report carries B-cubed;
    on the F1-gate corpus the resolved partition should be near-perfect."""
    from productbert_intermediate_spark.plans.pipeline import run_pipeline

    wd = str(tmp_path_factory.mktemp("bcubed_pipe"))
    report = run_pipeline(
        spark,
        f"{e2e_dir}/pages.parquet",
        wd,
        truth_path=f"{e2e_dir}/offers_truth.parquet",
    )
    b = report["bcubed_eval"]
    assert b["bcubed_precision"] >= 0.98
    assert b["bcubed_recall"] >= 0.98
    assert b["bcubed_f1"] >= 0.98
