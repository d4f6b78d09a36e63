"""run_linkage (plans/linkage_pipeline.py): stage creation, resume,
scorer/assignment switches, and the stored-id contract.

Linkage QUALITY (precision/recall vs cluster truth) is pinned in
tests/test_linkage.py on deduplicated sides; these tests pin the pipeline
machinery around the same operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.plans.linkage_pipeline import run_linkage


@pytest.fixture(scope="module")
def catalogs(spark, fixtures_dir, tmp_path_factory):
    """Two page corpora from the fixture: a deterministic url-hash split
    (pages are 1:1 with offers, so this is a random-ish disjoint split
    with cross-catalog duplicates from the generator's clusters)."""
    d = tmp_path_factory.mktemp("link_catalogs")
    pages = spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    side = F.pmod(F.xxhash64("url"), F.lit(2))
    lp, rp = str(d / "left_pages.parquet"), str(d / "right_pages.parquet")
    pages.where(side == 0).write.parquet(lp)
    pages.where(side == 1).write.parquet(rp)
    return lp, rp


def test_run_linkage_end_to_end_and_resume(spark, catalogs, tmp_path):
    lp, rp = catalogs
    wd = str(tmp_path / "wd")
    rep = run_linkage(spark, lp, rp, wd)
    c = rep["counts"]
    assert c["offers_left"] > 0 and c["offers_right"] > 0
    assert c["link_candidates"] > 0
    assert 0 < c["link_matches"] <= c["link_scored"] <= c["link_candidates"]
    # matches form a valid one-to-one matching of above-threshold pairs
    rows = rep["matches"].collect()
    assert len(rows) == c["link_matches"]
    assert len({r.id_l for r in rows}) == len(rows)
    assert len({r.id_r for r in rows}) == len(rows)
    assert all(r.match for r in rows)
    # every stage resumes on re-run, output identical
    rep2 = run_linkage(spark, lp, rp, wd)
    assert all(s["resumed"] for s in rep2["stages"].values())
    assert sorted((r.id_l, r.id_r) for r in rep2["matches"].collect()) == sorted(
        (r.id_l, r.id_r) for r in rows
    )
    # blocking drop counters surfaced from the stage manifest
    assert set(rep["blocking"]) == {"link_dropped_keys", "link_dropped_pairs"}


def test_run_linkage_fs_scorer_and_mutual(spark, catalogs, tmp_path):
    lp, rp = catalogs
    wd = str(tmp_path / "wd_fs")
    rep = run_linkage(spark, lp, rp, wd, scorer="fs", one_to_one="mutual")
    assert "fs_lam" in rep["stages"]["link_scored"]
    assert rep["stages"]["link_pair_features"]["resumed"] is False
    rows = rep["matches"].collect()
    assert len(rows) > 0
    assert len({r.id_l for r in rows}) == len(rows)
    assert len({r.id_r for r in rows}) == len(rows)
    # decision-rule consistency: match ≡ posterior > 0.5 on every kept row
    assert all(r.score > 0.5 and r.match for r in rows)
    # switching the scorer invalidates link_scored but resumes the shared
    # upstream stages
    rep2 = run_linkage(spark, lp, rp, wd, scorer="logistic")
    assert rep2["stages"]["offers_left"]["resumed"]
    assert rep2["stages"]["link_candidates"]["resumed"]
    assert not rep2["stages"]["link_scored"]["resumed"]


def test_run_linkage_agrees_with_link_records(spark, catalogs, tmp_path):
    """The pipeline's matched pair set equals the one-shot link_records
    flow on the same extracted catalogs (same operators, checkpointed)."""
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.operators.linkage import link_records

    lp, rp = catalogs
    rep = run_linkage(spark, lp, rp, str(tmp_path / "wd_eq"))
    left = extract_offers(spark.read.parquet(lp)).where("id is not null")
    right = extract_offers(spark.read.parquet(rp)).where("id is not null")
    direct = link_records(left, right)
    assert sorted((r.id_l, r.id_r) for r in rep["matches"].collect()) == sorted(
        (r.id_l, r.id_r) for r in direct.collect()
    )


def test_run_linkage_rejects_bad_switches(spark, catalogs, tmp_path):
    lp, rp = catalogs
    with pytest.raises(ValueError, match="scorer"):
        run_linkage(spark, lp, rp, str(tmp_path / "x"), scorer="encoder")
    with pytest.raises(ValueError, match="one_to_one"):
        run_linkage(spark, lp, rp, str(tmp_path / "y"), one_to_one="hungarian")


def test_run_linkage_labeled_evaluation(spark, catalogs, tmp_path, fixtures_dir):
    """Labels synthesized from cluster truth (cross-catalog same-cluster
    pairs = 1, plus deterministic negatives) -> pipeline reports decision-
    layer P/R/F1 and a checkpointed threshold curve with an F1-max cutoff."""
    from productbert_intermediate_spark.operators.extract import extract_offers

    lp, rp = catalogs
    truth = spark.read.parquet(f"{fixtures_dir}/offers_truth.parquet").select(
        "id", "cluster_id"
    )

    def _ids(path):
        return (
            extract_offers(spark.read.parquet(path))
            .where("id is not null")
            .join(truth, "id")
            .select("id", "cluster_id")
        )

    li, ri = _ids(lp), _ids(rp)
    pos = (
        li.withColumnRenamed("id", "id_left")
        .join(ri.withColumnRenamed("id", "id_right"), "cluster_id")
        .select("id_left", "id_right", F.lit(1).alias("label"))
    )
    # deterministic negatives: shifted-cluster cross pairs (never dups)
    neg = (
        li.withColumnRenamed("id", "id_left")
        .withColumn("cluster_id", F.col("cluster_id") + 1)
        .join(ri.withColumnRenamed("id", "id_right"), "cluster_id")
        .select("id_left", "id_right", F.lit(0).alias("label"))
    )
    labels_path = str(tmp_path / "labels.parquet")
    pos.unionByName(neg).write.parquet(labels_path)

    wd = str(tmp_path / "wd_lab")
    rep = run_linkage(spark, lp, rp, wd, labeled_path=labels_path)
    ev = rep["pairwise_eval"]
    assert ev["tp"] > 0 and ev["f1"] is not None
    # the matcher separates the synthesized classes decisively
    assert ev["precision"] >= 0.9, ev
    te = rep["threshold_eval"]
    assert te["n_labeled_scored"] > 0
    assert 0.0 <= te["best"]["threshold"] <= 1.0 and te["best"]["f1"] > 0.5
    # curve landed as a stage
    curve = spark.read.parquet(f"{wd}/link_threshold_curve")
    assert curve.count() > 0


def test_run_linkage_all_candidates_eval_grades_decision_not_assignment(
    spark, catalogs, tmp_path
):
    """ADVICE r5: with match_only=False (--all-candidates) link_matches
    contains assigned-but-below-threshold pairs with match=false; the
    labeled eval must grade the DECISION flag, not mere assignment. The
    labels here mark exactly those assigned-not-matched pairs as
    negatives (what a review queue decides): the fixed eval grades them
    true negatives (fp == 0), where the old lit(True)-on-join grading
    counted every one of them as a false positive."""
    lp, rp = catalogs
    wd = str(tmp_path / "wd_ac")
    # first pass just materializes the all-candidates matches table
    run_linkage(spark, lp, rp, wd, match_only=False)
    matches = spark.read.parquet(f"{wd}/link_matches")
    unmatched = matches.where("not match").select(
        F.col("id_l").alias("id_left"),
        F.col("id_r").alias("id_right"),
        F.lit(0).alias("label"),
    )
    matched = matches.where("match").select(
        F.col("id_l").alias("id_left"),
        F.col("id_r").alias("id_right"),
        F.lit(1).alias("label"),
    )
    n_unmatched = unmatched.count()
    assert n_unmatched > 0  # the scenario must actually occur
    labels_path = str(tmp_path / "labels_ac.parquet")
    unmatched.unionByName(matched).write.parquet(labels_path)

    # resumed stages + labeled eval over the same matches table
    rep = run_linkage(
        spark, lp, rp, wd, labeled_path=labels_path, match_only=False
    )
    ev = rep["pairwise_eval"]
    assert ev["fp"] == 0, ev       # old grading: fp == n_unmatched
    assert ev["tn"] == n_unmatched, ev
    assert ev["tp"] == matched.count(), ev
