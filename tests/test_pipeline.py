"""End-to-end gates: pairwise F1 ≥ 0.99, resume-from-checkpoint, determinism."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.plans.pipeline import run_pipeline
from productbert_intermediate_spark.sources.catalog import StageCatalog


@pytest.fixture(scope="module")
def e2e_run(spark, e2e_dir, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("pipeline_run"))
    report = run_pipeline(
        spark,
        f"{e2e_dir}/pages.parquet",
        workdir,
        labeled_path=f"{e2e_dir}/labeled_pairs_gs.parquet",
    )
    return workdir, report


def test_pairwise_f1_gate(e2e_run):
    """North-rule gate: pairwise F1 ≥ 0.99 on labeled pairs."""
    _, report = e2e_run
    f1 = report["pairwise_eval"]["f1"]
    assert f1 is not None and f1 >= 0.99, report["pairwise_eval"]


def test_labeled_run_reports_threshold_sweep(spark, e2e_run):
    """The labeled run ships a threshold_curve stage and the F1-max
    cutoff: the curve's counts must be consistent (tp+fn constant =
    labeled positives the blocker surfaced) and the reported best row
    must dominate every other curve row on F1."""
    workdir, report = e2e_run
    te = report["threshold_eval"]
    assert te["n_labeled_scored"] > 0
    best = te["best"]
    assert 0.0 <= best["threshold"] <= 1.0

    curve = StageCatalog(spark, workdir).read("threshold_curve").collect()
    assert len(curve) >= 1
    totals = {r["tp"] + r["fn"] for r in curve}
    assert len(totals) == 1  # every threshold sees the same positives
    f1s = [r["f1"] for r in curve if r["f1"] is not None]
    assert best["f1"] == max(f1s)
    # ties break toward the LOWEST threshold (metrics_ops.best_threshold)
    assert best["threshold"] == min(
        r["threshold"] for r in curve if r["f1"] == best["f1"]
    )
    # the e2e corpus is cleanly separable (F1 gate above): the data-chosen
    # cutoff must do at least as well as the inherited 0.5 on scored pairs
    at_half = max(
        (r for r in curve if r["threshold"] <= 0.5),
        key=lambda r: r["threshold"],
    )
    assert best["f1"] >= (at_half["f1"] or 0.0)


@pytest.fixture(scope="module")
def e2e_encoder_run(spark, e2e_dir, tmp_path_factory):
    """Same corpus, transformer-shaped scorer, its own workdir (the shared
    e2e_run workdir must stay logistic-scored for the resume tests)."""
    workdir = str(tmp_path_factory.mktemp("pipeline_run_encoder"))
    report = run_pipeline(
        spark,
        f"{e2e_dir}/pages.parquet",
        workdir,
        labeled_path=f"{e2e_dir}/labeled_pairs_gs.parquet",
        scorer="encoder",
    )
    return workdir, report


def test_pairwise_f1_gate_encoder_path(e2e_encoder_run):
    """The transformer-shaped scorer (encode → frozen IDF-weighted encoder →
    sigmoid → 0.5) must clear the same F1 ≥ 0.99 north-rule gate as the
    calibrated feature scorer — the reference's decision stack end-to-end
    (/root/reference/src/productbert/test.py:54-93)."""
    _, report = e2e_encoder_run
    f1 = report["pairwise_eval"]["f1"]
    assert f1 is not None and f1 >= 0.99, report["pairwise_eval"]


@pytest.fixture(scope="module")
def e2e_fs_run(spark, e2e_dir, tmp_path_factory):
    """Same corpus, UNSUPERVISED Fellegi-Sunter scorer, own workdir."""
    workdir = str(tmp_path_factory.mktemp("pipeline_run_fs"))
    report = run_pipeline(
        spark,
        f"{e2e_dir}/pages.parquet",
        workdir,
        labeled_path=f"{e2e_dir}/labeled_pairs_gs.parquet",
        scorer="fs",
    )
    return workdir, report


def test_pairwise_f1_gate_fs_path(e2e_fs_run):
    """The unsupervised FS scorer (feature gammas → EM-fitted m/u/λ →
    posterior ≥ 0.5) must clear the same F1 ≥ 0.99 north-rule gate as the
    two supervised scorers — the labels are used ONLY for evaluation here;
    the fit never reads them (operators/fellegi_sunter.py)."""
    _, report = e2e_fs_run
    f1 = report["pairwise_eval"]["f1"]
    assert f1 is not None and f1 >= 0.99, report["pairwise_eval"]
    sp = report["stages"]["scored_pairs"]
    assert sp["fs_em_converged"] is True
    # fitted params must separate: every attribute's m above its u
    for k, m in sp["fs_m"].items():
        assert m > sp["fs_u"][k], (k, sp)
    # feature stage is checkpointed once and owned by the fs path
    assert "fs_pair_features" in report["stages"]


def test_fs_path_resumes_feature_stage(spark, e2e_dir, e2e_fs_run):
    """Re-running the fs-scored pipeline resumes BOTH the feature stage and
    scored_pairs (params keys cover thresholds + parent lineage)."""
    workdir, _ = e2e_fs_run
    report = run_pipeline(
        spark,
        f"{e2e_dir}/pages.parquet",
        workdir,
        scorer="fs",
    )
    assert report["stages"]["fs_pair_features"]["resumed"]
    assert report["stages"]["scored_pairs"]["resumed"]


def test_scorer_switch_invalidates_only_scored_stage(spark, e2e_dir, e2e_encoder_run):
    """Switching scorer resumes offers/candidates but rebuilds scored_pairs:
    the checkpoint params key carries the scorer choice."""
    workdir, _ = e2e_encoder_run
    report = run_pipeline(
        spark, f"{e2e_dir}/pages.parquet", workdir, scorer="logistic"
    )
    assert report["stages"]["offers"]["resumed"]
    assert report["stages"]["candidate_pairs"]["resumed"]
    assert not report["stages"]["scored_pairs"]["resumed"]


def test_manifest_has_lineage(e2e_run):
    workdir, _ = e2e_run
    with open(f"{workdir}/_manifest.jsonl") as f:
        entries = [json.loads(l) for l in f if l.strip()]
    stages = {e["stage"] for e in entries}
    assert {"offers", "candidate_pairs", "scored_pairs", "entities"} <= stages
    for e in entries:
        assert e["rows"] >= 0
        assert isinstance(e["partitions"], list) and e["partitions"]
        assert all("rows" in p and "checksum" in p for p in e["partitions"])
        assert "wall_sec" in e
    # no-silent-caps: the blocking stage's manifest entry reports how much
    # the size cap dropped (the e2e corpus plants a 90-member cluster, so
    # the counters exist and are sane even when nothing is dropped)
    cp = [e for e in entries if e["stage"] == "candidate_pairs"][-1]
    for k in ("blocking_dropped_keys", "blocking_dropped_rows", "blocking_dropped_pairs"):
        assert k in cp and cp[k] >= 0, cp


def test_rerun_resumes_every_stage(spark, e2e_dir, e2e_run):
    workdir, first = e2e_run
    report = run_pipeline(
        spark,
        f"{e2e_dir}/pages.parquet",
        workdir,
        labeled_path=f"{e2e_dir}/labeled_pairs_gs.parquet",
    )
    assert all(s["resumed"] for s in report["stages"].values()), report["stages"]
    assert report["pairwise_eval"] == first["pairwise_eval"]


def test_resume_after_partial_failure(spark, e2e_dir, e2e_run, tmp_path_factory):
    """Kill-after-stage-k simulation: later stages rebuilt, earlier resumed,
    final clusters identical."""
    workdir, first = e2e_run
    cat = StageCatalog(spark, workdir)
    before = sorted(map(tuple, cat.read("entities").collect()))

    shutil.rmtree(f"{workdir}/entities")
    shutil.rmtree(f"{workdir}/scored_pairs")
    report = run_pipeline(
        spark,
        f"{e2e_dir}/pages.parquet",
        workdir,
        labeled_path=f"{e2e_dir}/labeled_pairs_gs.parquet",
    )
    assert report["stages"]["offers"]["resumed"]
    assert report["stages"]["candidate_pairs"]["resumed"]
    assert not report["stages"]["scored_pairs"]["resumed"]
    assert not report["stages"]["entities"]["resumed"]
    after = sorted(map(tuple, cat.read("entities").collect()))
    assert before == after
    assert report["pairwise_eval"] == first["pairwise_eval"]


def test_stale_params_invalidate_checkpoint(spark, e2e_dir, e2e_run):
    workdir, _ = e2e_run
    report = run_pipeline(
        spark,
        f"{e2e_dir}/pages.parquet",
        workdir,
        blocking_params={"max_block_size": 99},
    )
    # changed blocking params → candidate_pairs and downstream rebuilt
    assert report["stages"]["offers"]["resumed"]
    assert not report["stages"]["candidate_pairs"]["resumed"]


def test_pipeline_deterministic_across_workdirs(spark, e2e_dir, e2e_run, tmp_path_factory):
    workdir1, _ = e2e_run
    workdir2 = str(tmp_path_factory.mktemp("pipeline_run2"))
    run_pipeline(spark, f"{e2e_dir}/pages.parquet", workdir2)
    cat1 = StageCatalog(spark, workdir1)
    cat2 = StageCatalog(spark, workdir2)
    e1 = sorted(map(tuple, cat1.read("entities").collect()))
    e2 = sorted(map(tuple, cat2.read("entities").collect()))
    assert e1 == e2


def test_pipeline_stages_survive_degenerate_corpora(spark):
    """Empty and single-offer corpora flow through block → score → cluster
    without crashing: zero candidates, and a lone offer becomes its own
    entity (isolated-node path of assign_entities)."""
    from pyspark.sql import functions as F

    from productbert_intermediate_spark.operators import blocking as B
    from productbert_intermediate_spark.operators import scoring as S
    from productbert_intermediate_spark.operators.clustering import assign_entities

    schema = (
        "id long, url string, cluster_id long, category string, title string,"
        " description string, brand string, price string, specTableContent string"
    )
    empty = spark.createDataFrame([], schema)
    one = spark.createDataFrame(
        [(1, "u", 1, "c", "solo item title", None, None, None, None)], schema
    )
    for offers, want_entities in ((empty, 0), (one, 1)):
        pairs = B.block_offers(offers)
        assert pairs.count() == 0
        scored = S.score_candidates(pairs, offers)
        assert scored.count() == 0
        ents = assign_entities(offers, scored.where("match"))
        assert ents.count() == want_entities
        if want_entities:
            row = ents.collect()[0]
            assert row.entity_id == row.id


def test_partitioned_write_manifest_has_distinct_file_lineage(spark, tmp_path_factory):
    """Partitioned writes name files in different partition dirs with the
    SAME basename; the manifest must key lineage by root-relative path, or
    distinct physical files merge into one entry."""
    from productbert_intermediate_spark.sources.catalog import StageCatalog

    cat = StageCatalog(spark, str(tmp_path_factory.mktemp("cat_part")))
    df = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(100)], "id long, part string"
    ).repartition(2)
    entry = cat.write("t", df, params_key="k", partition_by=["part"])
    files = [p["file"] for p in entry["partitions"]]
    assert len(files) == len(set(files))
    assert all("part=" in f for f in files), files
    assert sum(p["rows"] for p in entry["partitions"]) == 100


def test_bucketed_checkpoint_join_avoids_offers_shuffle(spark, tmp_path_factory):
    """A bucketed offers checkpoint must join on its bucket key with NO
    exchange on the bucketed side — the whole point of paying the bucketed
    write: at 100 TB every downstream id-join re-shuffles a plain parquet
    offers table, but reads a bucketed one in place."""
    cat = StageCatalog(spark, str(tmp_path_factory.mktemp("cat_bkt")))
    offers = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 7).alias("feat")
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 1000, 3)], "id_l long, id_r long"
    )
    entry = cat.write_bucketed(
        "offers_b", offers, bucket_cols=["id"], n_buckets=8, params_key="k"
    )
    assert entry["rows"] == 2000 and entry["n_buckets"] == 8

    bucketed = cat.read_bucketed("offers_b")
    assert bucketed.count() == 2000
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = pairs.join(bucketed, pairs.id_l == bucketed.id)
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the bucketed scan is visible and exchange-free: only the pairs
        # side shuffles, so the join plan has exactly one Exchange
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # baseline sanity: the SAME join against the plain parquet files
        # shuffles BOTH sides
        plain = spark.read.parquet(cat.path("offers_b"))
        base = pairs.join(plain, pairs.id_l == plain.id)
        base.count()
        base_plan = base._jdf.queryExecution().executedPlan().toString()
        assert base_plan.count("Exchange hashpartitioning") == 2, base_plan
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_checkpoint_reregisters_in_fresh_session(spark, tmp_path_factory):
    """Parquet files carry no bucket metadata; after the session catalog
    forgets the table (fresh session resuming from checkpoints),
    read_bucketed must re-register it from the manifest's bucket spec and
    return the same rows with bucketing intact."""
    cat = StageCatalog(spark, str(tmp_path_factory.mktemp("cat_bkt2")))
    df = spark.range(0, 500).select(F.col("id"), (F.col("id") * 2).alias("v"))
    cat.write_bucketed("t2", df, bucket_cols=["id"], n_buckets=4)
    tbl = cat._table_name("t2")
    # simulate the fresh session: drop the catalog entry (external table —
    # data files survive), then read through the manifest path
    spark.sql(f"DROP TABLE {tbl}")
    assert not spark.catalog.tableExists(tbl)
    back = cat.read_bucketed("t2")
    assert back.count() == 500
    assert spark.catalog.tableExists(tbl)
    assert sorted(r["v"] for r in back.where("id < 3").collect()) == [0, 2, 4]
    # bucketing metadata really came back: bucketed scan, no exchange on a
    # self-aggregation keyed by the bucket column
    agg = back.groupBy("id").count()
    agg.count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_pipeline_offers_checkpoint_is_bucketed(e2e_run, spark):
    """run_pipeline's offers checkpoint lands bucketed on id by default
    (one up-front shuffle buys a shuffle-free offers side in every
    downstream id-join), and a resume read keeps the bucket metadata."""
    workdir, _ = e2e_run
    cat = StageCatalog(spark, workdir)
    entry = cat.latest_entry("offers")
    assert entry["bucket_cols"] == ["id"]
    assert entry["n_buckets"] >= 1
    assert entry["sort_cols"] == ["id"]
    offers = cat.read_bucketed("offers")
    agg = offers.groupBy("id").count()
    agg.count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_layout_mismatch_rebuilds_checkpoint(spark, tmp_path_factory):
    """A plain checkpoint resumed with a bucket spec (or a different spec)
    is STALE: resuming it would silently drop the no-shuffle join property.
    write_or_resume must rebuild, not resume."""
    cat = StageCatalog(spark, str(tmp_path_factory.mktemp("cat_layout")))
    build = lambda: spark.range(0, 100).select(  # noqa: E731
        F.col("id"), (F.col("id") % 3).alias("v")
    )
    _, resumed = cat.write_or_resume("t", build, params_key="k")
    assert not resumed
    # same params, plain again → resume
    _, resumed = cat.write_or_resume("t", build, params_key="k")
    assert resumed
    # same params, bucketed requested → layout mismatch → rebuild
    df, resumed = cat.write_or_resume(
        "t", build, params_key="k", bucket_by=(["id"], 4)
    )
    assert not resumed
    assert df.count() == 100
    # same bucketed spec → resume, metadata intact
    df, resumed = cat.write_or_resume(
        "t", build, params_key="k", bucket_by=(["id"], 4)
    )
    assert resumed
    agg = df.groupBy("id").count()
    agg.count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    # different bucket count → rebuild
    _, resumed = cat.write_or_resume(
        "t", build, params_key="k", bucket_by=(["id"], 8)
    )
    assert not resumed


def test_stale_params_token_blocks_resume(spark, tmp_path_factory):
    """A crash between a rewrite's data commit and its manifest append must
    not let the OLD manifest entry resurrect the NEW data as a valid
    checkpoint: exists() requires the in-directory _PARAMS token to agree."""
    import os

    from productbert_intermediate_spark.sources.catalog import StageCatalog

    cat = StageCatalog(spark, str(tmp_path_factory.mktemp("cat_tok")))
    df = spark.range(5)
    cat.write("s", df, params_key="A")
    assert cat.exists("s", "A")
    # simulate the crash window: new data + new token on disk, manifest
    # still carrying the old entry (append never happened)
    with open(cat._params_token_path("s"), "w") as f:
        f.write('{"params_key": "B"}')
    assert not cat.exists("s", "A")
    assert not cat.exists("s", "B")
    # missing token (crash before token write) is equally not resumable
    os.remove(cat._params_token_path("s"))
    assert not cat.exists("s", "A")


# ---------------------------------------------------------------- stable ids


@pytest.fixture(scope="module")
def stab_runs(spark, e2e_dir, tmp_path_factory):
    """Run A on ~80% of the e2e corpus, then run B on the FULL corpus with
    stabilize_against=A — the grown-corpus re-resolve the north rule's
    continuity story needs. Same fixture underneath, so ids are consistent
    and the delta genuinely extends A's clusters."""
    base = tmp_path_factory.mktemp("stab")
    small_pages = str(base / "pages_small")
    (
        spark.read.parquet(f"{e2e_dir}/pages.parquet")
        .where(F.pmod(F.xxhash64("url"), F.lit(5)) != 0)
        .write.parquet(small_pages)
    )
    wd_a = str(base / "run_a")
    run_pipeline(spark, small_pages, wd_a)
    wd_b = str(base / "run_b")
    report = run_pipeline(
        spark, f"{e2e_dir}/pages.parquet", wd_b, stabilize_against=wd_a
    )
    return small_pages, wd_a, wd_b, report


def _members_by_entity(df):
    rows = df.groupBy("entity_id").agg(
        F.sort_array(F.collect_list("id")).alias("members")
    ).collect()
    return {r["entity_id"]: tuple(r["members"]) for r in rows}


def test_stabilize_keeps_unsplit_entity_ids(spark, stab_runs):
    """Every previous entity that is neither split nor merged by the grown
    corpus keeps its entity_id in the stabilized assignment."""
    _, wd_a, wd_b, report = stab_runs
    prev = StageCatalog(spark, wd_a).read("entities")
    stable = StageCatalog(spark, wd_b).read("entities_stable")
    prev_members = _members_by_entity(prev)
    prev_ids = {i for m in prev_members.values() for i in m}
    new_members = _members_by_entity(stable.select("id", "entity_id"))

    # map each new cluster to the prev entities it covers (via prev members)
    id_to_prev = {
        i: eid for eid, mem in prev_members.items() for i in mem
    }
    kept = checked = 0
    for new_eid, mem in new_members.items():
        prev_hit = {id_to_prev[i] for i in mem if i in id_to_prev}
        if len(prev_hit) != 1:
            continue  # merged several prev entities (or all-new cluster)
        (p,) = prev_hit
        if set(prev_members[p]) <= set(mem):
            # p unsplit (fully inside this cluster) and unmerged
            checked += 1
            if new_eid == p:
                kept += 1
    assert checked > 0  # the corpus must actually exercise the rule
    assert kept == checked, f"only {kept}/{checked} unsplit entities kept ids"

    # fresh ids live strictly above every previous id
    max_prev = max(prev_members)
    fresh = [r["entity_id"] for r in stable.where(~F.col("inherited"))
             .select("entity_id").distinct().collect()]
    assert all(f > max_prev for f in fresh)

    # report bookkeeping adds up
    stab = report["stabilize"]
    n_entities = stable.select("entity_id").distinct().count()
    assert stab["inherited_entities"] + stab["fresh_entities"] == n_entities
    assert stab["inherited_entities"] > 0
    assert report["counts"]["entities"] == n_entities

    # the changelog stage is checkpointed and equals the operator applied
    # to the two assignments it bridges (prev entities → stabilized)
    from productbert_intermediate_spark.operators.entity_diff import (
        entity_changelog,
    )

    clog = StageCatalog(spark, wd_b).read("entity_changelog")
    want = entity_changelog(
        prev.select("id", "entity_id"), stable.select("id", "entity_id")
    )
    assert sorted(map(tuple, clog.select(*want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )
    by_class = {
        r["change"]: r["n"]
        for r in clog.groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    assert report["stabilize"]["changelog"] == by_class
    # `created` rows are exactly the fresh entities: fresh ids start above
    # every prev id (so n_prev=0), and every inherited id existed before
    assert by_class.get("created", 0) == stab["fresh_entities"]


def test_stabilize_in_place_rerun_snapshots_prev(spark, e2e_dir, stab_runs):
    """stabilize_against == workdir (re-resolving a grown corpus in place):
    the previous assignment must be snapshotted (entities_prev) before the
    stage rebuild overwrites it, and ids still carry over."""
    import shutil as _sh

    small_pages, wd_a, _, _ = stab_runs
    wd = wd_a + "_inplace"
    _sh.copytree(wd_a, wd)
    prev_members = _members_by_entity(StageCatalog(spark, wd).read("entities"))
    report = run_pipeline(
        spark, f"{e2e_dir}/pages.parquet", wd, stabilize_against=wd
    )
    cat = StageCatalog(spark, wd)
    assert cat.exists("entities_prev")
    stable = cat.read("entities_stable")
    inherited_ids = {
        r["entity_id"]
        for r in stable.where("inherited").select("entity_id").distinct().collect()
    }
    assert inherited_ids <= set(prev_members)
    assert report["stabilize"]["inherited_entities"] == len(inherited_ids)
    # a second in-place pass (corpus unchanged) resumes and inherits
    # EVERYTHING: stable output == its own anchor
    report2 = run_pipeline(
        spark, f"{e2e_dir}/pages.parquet", wd, stabilize_against=wd
    )
    assert report2["stabilize"]["fresh_entities"] == 0


def test_stabilize_against_missing_stage_raises(spark, tmp_path_factory):
    empty = str(tmp_path_factory.mktemp("no_run"))
    with pytest.raises(ValueError, match="no entities stage"):
        run_pipeline(
            spark, empty, str(tmp_path_factory.mktemp("wd")),
            stabilize_against=empty,
        )


def test_pair_budget_drives_max_rare_df(spark, fixtures_dir, tmp_path_factory):
    """pair_budget picks max_rare_df from the measured cost curve, records
    the auditable decision in report + manifest, and a resume skips the
    planning pass (same stage key)."""
    from productbert_intermediate_spark.operators import blocking as B

    workdir = str(tmp_path_factory.mktemp("budget_run"))
    budget = 50_000
    report = run_pipeline(
        spark, f"{fixtures_dir}/pages.parquet", workdir, pair_budget=budget
    )
    cp = report["stages"]["candidate_pairs"]
    assert cp["pair_budget"] == budget
    curve = cp["pair_budget_curve"]
    chosen = cp["chosen_max_rare_df"]
    affordable = [c["max_rare_df"] for c in curve if c["est_pairs"] <= budget]
    assert chosen == (max(affordable) if affordable else curve[0]["max_rare_df"])
    # decision persisted to the stage manifest, not just the in-memory report
    entry = StageCatalog(spark, workdir).latest_entry("candidate_pairs")
    assert entry["chosen_max_rare_df"] == chosen
    assert entry["pair_budget_curve"] == curve

    # candidates equal an explicit run at the chosen threshold
    got = spark.read.parquet(f"{workdir}/candidate_pairs")
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.sources.readers import read_pages

    offers = extract_offers(
        read_pages(spark, f"{fixtures_dir}/pages.parquet")
    ).where("id is not null")
    want = B.block_offers(offers, max_rare_df=chosen)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # resume: same budget → stage resumes (no rebuild, no re-plan)
    report2 = run_pipeline(
        spark, f"{fixtures_dir}/pages.parquet", workdir, pair_budget=budget
    )
    assert report2["stages"]["candidate_pairs"]["resumed"]
    # a different budget is a different stage key → rebuild
    report3 = run_pipeline(
        spark, f"{fixtures_dir}/pages.parquet", workdir, pair_budget=1
    )
    assert not report3["stages"]["candidate_pairs"]["resumed"]
    assert report3["stages"]["candidate_pairs"]["chosen_max_rare_df"] == 2


def test_pair_budget_conflicts_with_explicit_max_rare_df(spark, tmp_path_factory):
    with pytest.raises(ValueError, match="pair_budget"):
        run_pipeline(
            spark,
            "/nonexistent",
            str(tmp_path_factory.mktemp("conflict")),
            blocking_params={"max_rare_df": 10},
            pair_budget=100,
        )


def test_pipeline_giant_guard_high_cap_is_identity(spark, e2e_dir, e2e_run, tmp_path_factory):
    """A cap above the corpus's largest true entity makes the guard a
    structural no-op: the entity assignment must be row-identical to the
    unguarded run's, and the report must carry the oversized counter."""
    base_wd, _ = e2e_run
    wd = str(tmp_path_factory.mktemp("pipeline_guard_hi"))
    report = run_pipeline(
        spark, f"{e2e_dir}/pages.parquet", wd, max_entity_size=500
    )
    assert report["stages"]["entities"]["oversized_after_split"] == 0
    cat_a = StageCatalog(spark, base_wd)
    cat_b = StageCatalog(spark, wd)
    a = {(r["id"], r["entity_id"]) for r in cat_a.read("entities").collect()}
    b = {(r["id"], r["entity_id"]) for r in cat_b.read("entities").collect()}
    assert a == b


def test_pipeline_giant_guard_tiny_cap_splits_and_rekeys_stage(
    spark, e2e_dir, tmp_path_factory
):
    """A tiny cap forces splitting: entity count grows vs the cap-free
    assignment, no small entity is merged (the guard only ever splits),
    and flipping the cap re-keys the stage (fresh build, not a resume)."""
    wd = str(tmp_path_factory.mktemp("pipeline_guard_lo"))
    r1 = run_pipeline(spark, f"{e2e_dir}/pages.parquet", wd)
    n1 = r1["counts"]["entities"]
    r2 = run_pipeline(
        spark, f"{e2e_dir}/pages.parquet", wd, max_entity_size=2,
        split_ladder=(0.7, 0.9, 0.99),
    )
    assert r2["stages"]["entities"]["resumed"] is False  # cap re-keys stage
    assert r2["counts"]["entities"] >= n1
    assert "oversized_after_split" in r2["stages"]["entities"]


def test_report_exposes_max_entity_size(e2e_run):
    """The chaining failure the giant guard bounds must be visible from
    every run report, guard on or off."""
    _, report = e2e_run
    ms = report["counts"]["max_entity_size"]
    assert isinstance(ms, int) and 1 <= ms
    assert report["counts"]["entities"] > 0
