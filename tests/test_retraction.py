"""Retraction / upsert over the indexed incremental-ER state: the other
two lifecycle events of a continuous crawl (page taken down, re-crawl with
changed content). Pinned invariant, same as insertion's: after every
commit, the maintained state equals a from-scratch batch run over the
corpus as it NOW stands — retracting a bridge record splits its entity,
falling token dfs re-validate keys among survivors, and an upsert re-scores
every pair the changed content enters. Plus the crash/replay story and the
changelog-feed collision regression (commit-sequence partition keys)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from productbert_intermediate_spark.operators import blocking as B
from productbert_intermediate_spark.operators import scoring as S
from productbert_intermediate_spark.operators.clustering import assign_entities
from productbert_intermediate_spark.streaming.incremental_er import (
    EDGE_COLS,
    read_corpus_indexed,
    read_entities_indexed,
    read_match_edges_indexed,
    read_score_cache_indexed,
    resolve_batch_indexed,
    resolve_batch_retract,
    resolve_batch_upsert,
)
from productbert_intermediate_spark.streaming.state_store import VersionedState

BP = {"max_block_size": 3, "use_lsh": False, "min_df": 2}
SCHEMA = (
    "id long, cluster_id long, category string, title string,"
    " description string, brand string, price string, specTableContent string"
)


def _offer(i, title):
    return (i, None, "cat", title, None, None, None, None)


def _offers(spark, rows):
    return spark.createDataFrame([_offer(*r) for r in rows], SCHEMA)


def _ids(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _from_scratch(corpus):
    scored = S.score_candidates(B.block_offers(corpus, **BP), corpus).select(
        *EDGE_COLS
    )
    return scored, assign_entities(corpus, scored.where("match"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


# Bridge corpus: 1-2 share rare token "zephyr", 2-3 share rare token
# "quokka", 1-3 share only dead-key tokens (df 7 > max_block_size 3), so 2
# is the one bridge between 1 and 3 in both the candidate graph and the
# match graph (the near-identical titles score as matches).
BRIDGE = [
    (1, "acme turbo 9000 zephyr red widget"),
    (2, "acme turbo 9000 zephyr quokka red widget"),
    (3, "acme turbo 9000 quokka red widget"),
    (10, "acme turbo 9000 red widget alpha"),
    (11, "acme turbo 9000 red widget beta"),
    (12, "acme turbo 9000 red widget gamma"),
    (13, "acme turbo 9000 red widget delta"),
]


def test_retract_bridge_splits_entity_exactly(spark, tmp_path):
    """Retracting the bridge record must SPLIT its entity — the state after
    the commit equals a from-scratch run on the survivors, edges WITH
    scores, and the retracted id leaves every table including the cache."""
    wd = str(tmp_path / "work")
    resolve_batch_indexed(
        spark, _offers(spark, BRIDGE), wd, batch_id=0, blocking_params=BP
    )
    pre = {r["id"]: r["entity_id"] for r in read_entities_indexed(spark, wd).collect()}
    assert pre[1] == pre[2] == pre[3], "bridge corpus did not cluster"

    resolve_batch_retract(spark, _ids(spark, 2), wd, blocking_params=BP)

    survivors = _offers(spark, [r for r in BRIDGE if r[0] != 2])
    ref_scored, ref_entities = _from_scratch(survivors)
    assert _rows(read_match_edges_indexed(spark, wd)) == _rows(ref_scored)
    got_ents = read_entities_indexed(spark, wd)
    assert _rows(got_ents) == _rows(ref_entities)
    post = {r["id"]: r["entity_id"] for r in got_ents.collect()}
    assert post[1] != post[3], "bridge removal did not split the entity"
    assert 2 not in post
    # resolved-corpus view drops the id; the flat offers dir keeps it (log)
    assert sorted(
        r["id"] for r in read_corpus_indexed(spark, wd).collect()
    ) == [1, 3, 10, 11, 12, 13]
    assert spark.read.parquet(f"{wd}/offers").where("id = 2").count() == 1
    # cache eviction: nothing referencing the retracted id survives
    assert (
        read_score_cache_indexed(spark, wd)
        .where("id_l = 2 OR id_r = 2")
        .count()
        == 0
    )


def test_retract_revalidates_fallen_df_keys(spark, tmp_path):
    """The inverse of threshold drift: 'zephyr' df=5 exceeds the block
    bound, so (1,2) is never a candidate; retracting three holders drops df
    to 2, the key revives, and the RETROACTIVE pair among survivors enters
    match_edges — exactly the from-scratch candidate set on survivors."""
    wd = str(tmp_path / "work")
    corpus = [
        (1, "zephyr alpha one"),
        (2, "zephyr beta two"),  # shares ONLY the dead key with offer 1
        (4, "zephyr four x"),
        (5, "zephyr five y"),
        (6, "zephyr six z"),
        (10, "quartz filler ten"),
        (11, "quartz filler eleven"),
    ]
    resolve_batch_indexed(
        spark, _offers(spark, corpus), wd, batch_id=0, blocking_params=BP
    )
    pre = _rows(read_match_edges_indexed(spark, wd).select("id_l", "id_r"))
    assert (1, 2) not in pre

    resolve_batch_retract(spark, _ids(spark, 4, 5, 6), wd, blocking_params=BP)

    survivors = _offers(spark, [r for r in corpus if r[0] not in (4, 5, 6)])
    ref_scored, _ = _from_scratch(survivors)
    got = read_match_edges_indexed(spark, wd)
    assert (1, 2) in _rows(got.select("id_l", "id_r"))
    assert _rows(got) == _rows(ref_scored)


def test_retract_replay_and_unknown_ids_are_noops(spark, tmp_path):
    """A committed retraction's replay (same batch_id) and a retraction of
    never-indexed ids both leave the state untouched — no new version; and
    an out-of-band retraction (batch_id=None) carries the last stream batch
    id forward in the pointer, so the stream's replay guard survives it."""
    wd = str(tmp_path / "work")
    resolve_batch_indexed(
        spark, _offers(spark, BRIDGE), wd, batch_id=0, blocking_params=BP
    )
    state = VersionedState(spark, os.path.join(wd, "index"))

    resolve_batch_retract(
        spark, _ids(spark, 10), wd, batch_id=7, blocking_params=BP
    )
    v = state.current_version()
    # retraction replay ids live in their own pointer field; the insert
    # stream's guard (batch 0) is untouched
    assert state.last_retract_batch_id() == 7
    assert state.last_batch_id() == 0
    edges = _rows(read_match_edges_indexed(spark, wd))

    resolve_batch_retract(  # replay of the committed retraction
        spark, _ids(spark, 10), wd, batch_id=7, blocking_params=BP
    )
    assert state.current_version() == v
    resolve_batch_retract(  # ids never indexed (or already retracted)
        spark, _ids(spark, 10, 999), wd, blocking_params=BP
    )
    assert state.current_version() == v
    assert _rows(read_match_edges_indexed(spark, wd)) == edges

    # out-of-band retraction (no batch id): BOTH replay guards carry over
    resolve_batch_retract(spark, _ids(spark, 11), wd, blocking_params=BP)
    assert state.last_batch_id() == 0
    assert state.last_retract_batch_id() == 7


def test_upsert_rescores_changed_content_exactly(spark, tmp_path):
    """A re-crawl batch re-offering id 2 with entirely new content: its old
    pairs leave, its cached scores are evicted (no stale reuse), the new
    content's pairs are scored fresh, and the state equals a from-scratch
    run over the UPDATED corpus — edges with scores, entities, corpus view."""
    wd = str(tmp_path / "work")
    resolve_batch_indexed(
        spark,
        _offers(
            spark,
            [
                (1, "zephyr alpha one"),
                (2, "zephyr alpha two"),
                (10, "quartz filler ten"),
            ],
        ),
        wd,
        batch_id=0,
        blocking_params=BP,
    )
    assert (1, 2) in _rows(
        read_match_edges_indexed(spark, wd).select("id_l", "id_r")
    )

    resolve_batch_upsert(
        spark,
        _offers(
            spark,
            [
                (2, "quartz filler twenty"),  # changed: now blocks with 10
                (1, "zephyr alpha one"),  # byte-identical: skipped
                (7, "zephyr alpha seven"),  # brand new
            ],
        ),
        wd,
        batch_id=1,
        blocking_params=BP,
    )

    cur = read_corpus_indexed(spark, wd)
    titles = {r["id"]: r["title"] for r in cur.collect()}
    assert titles[2] == "quartz filler twenty" and len(titles) == 4
    ref_scored, ref_entities = _from_scratch(cur)
    assert _rows(read_match_edges_indexed(spark, wd)) == _rows(ref_scored)
    assert _rows(read_entities_indexed(spark, wd)) == _rows(ref_entities)
    got_pairs = _rows(
        read_match_edges_indexed(spark, wd).select("id_l", "id_r")
    )
    assert (1, 2) not in got_pairs and (2, 10) in got_pairs
    # the cache holds only current-content scores for the changed id
    cache = read_score_cache_indexed(spark, wd)
    assert cache.count() == cache.select("id_l", "id_r").distinct().count()
    assert _rows(
        cache.where("id_l = 2 OR id_r = 2").select("id_l", "id_r")
    ) == [(2, 10)]


def test_upsert_unchanged_batch_skips_retraction(spark, tmp_path):
    """An upsert batch whose every id is byte-identical to the stored row
    must not open a retraction version: exactly ONE commit (the insert's
    no-op fold), and the cache/edges are untouched."""
    wd = str(tmp_path / "work")
    rows = [
        (1, "zephyr alpha one"),
        (2, "zephyr alpha two"),
        (10, "quartz filler ten"),
    ]
    resolve_batch_indexed(
        spark, _offers(spark, rows), wd, batch_id=0, blocking_params=BP
    )
    state = VersionedState(spark, os.path.join(wd, "index"))
    v0 = state.current_version()
    cache0 = _rows(read_score_cache_indexed(spark, wd))

    resolve_batch_upsert(
        spark, _offers(spark, rows), wd, batch_id=1, blocking_params=BP
    )
    assert state.current_version() == v0 + 1  # insert fold only, no retract
    assert _rows(read_score_cache_indexed(spark, wd)) == cache0

    # full-commit replay short-circuits before any version opens
    resolve_batch_upsert(
        spark, _offers(spark, rows), wd, batch_id=1, blocking_params=BP
    )
    assert state.current_version() == v0 + 1


def test_changelog_keys_survive_interleaved_retraction(spark, tmp_path):
    """The collision regression (round 5): changelog partitions are keyed
    by the state's COMMIT SEQUENCE, so a user retraction between stream
    batches gets its own partition and a LATER stream batch can never
    overwrite it. Applying the feed's deltas in partition order must
    reconcile: sum of per-entity membership deltas equals the final sizes."""
    wd = str(tmp_path / "work")
    clog = f"{wd}/entity_changelog"

    resolve_batch_indexed(
        spark,
        _offers(spark, BRIDGE[:3]),  # {1,2,3} one entity
        wd,
        batch_id=0,
        blocking_params=BP,
        stable_ids=True,
        changelog=True,
    )
    resolve_batch_indexed(
        spark,
        _offers(spark, BRIDGE[3:5]),  # singletons 10, 11
        wd,
        batch_id=1,
        blocking_params=BP,
        stable_ids=True,
        changelog=True,
    )
    # out-of-band retraction of the bridge: splits {1,2,3} -> {1}, {3}
    resolve_batch_retract(
        spark,
        _ids(spark, 2),
        wd,
        blocking_params=BP,
        stable_ids=True,
        changelog=True,
    )
    retract_part = max(
        int(d.split("=", 1)[1])
        for d in os.listdir(clog)
        if d.startswith("batch=")
    )
    retract_delta = _rows(spark.read.parquet(f"{clog}/batch={retract_part}"))
    assert retract_delta, "retraction emitted no changelog delta"

    # the NEXT stream batch commits a later sequence number — with stream
    # batch-id keying this would be batch=2 and clobber the retraction
    resolve_batch_indexed(
        spark,
        _offers(spark, BRIDGE[5:]),  # singletons 12, 13
        wd,
        batch_id=2,
        blocking_params=BP,
        stable_ids=True,
        changelog=True,
    )
    parts = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(clog)
        if d.startswith("batch=")
    )
    assert parts == sorted(set(parts)) and len(parts) == 4
    assert (
        _rows(spark.read.parquet(f"{clog}/batch={retract_part}"))
        == retract_delta
    ), "a later stream batch overwrote the retraction's delta"

    # feed reconciliation: per-entity (n_new of its LAST delta) must equal
    # the final stable snapshot's sizes for every entity the feed mentions
    feed = spark.read.parquet(clog)
    last = (
        feed.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("entity_id").orderBy(F.desc("batch"))
            ),
        )
        .where("rn = 1")
        .select("entity_id", "n_new")
    )
    final_sizes = (
        spark.read.parquet(f"{wd}/stable_entities")
        .groupBy("entity_id")
        .agg(F.count("*").alias("n"))
    )
    joined = last.join(final_sizes, "entity_id", "left").select(
        "entity_id", "n_new", F.coalesce("n", F.lit(0)).alias("n")
    )
    bad = joined.where("n_new <> n").collect()
    assert not bad, bad


def _land_offer_drops(spark, root, drops):
    """Write each drops[i] (list of (id, title)) as one parquet file in a
    landing dir with strictly increasing mtimes."""
    import time

    landing = os.path.join(root, "landing")
    os.makedirs(landing, exist_ok=True)
    now = time.time()
    for i, rows in enumerate(drops):
        stage = os.path.join(root, f"stage{i}")
        _offers(spark, rows).coalesce(1).write.mode("overwrite").parquet(stage)
        src = next(
            p for p in sorted(os.listdir(stage)) if p.endswith(".parquet")
        )
        dst = os.path.join(landing, f"drop-{i:04d}.parquet")
        shutil.move(os.path.join(stage, src), dst)
        os.utime(dst, (now - 600 + i * 10, now - 600 + i * 10))
        shutil.rmtree(stage)
    return landing


def test_streaming_upsert_mode_applies_recrawled_content(spark, tmp_path):
    """upsert=True through the real readStream machinery: a later drop
    re-offering a seen id with CHANGED content replaces it (retract +
    re-insert per micro-batch), and the final state equals a from-scratch
    run over the updated corpus; the default insert mode on the same drops
    keeps the first version (append-only semantics)."""
    from productbert_intermediate_spark.streaming.incremental_er import (
        run_incremental_er_offers,
    )

    drops = [
        [
            (1, "zephyr alpha one"),
            (2, "zephyr alpha two"),
            (10, "quartz filler ten"),
        ],
        [
            (2, "quartz filler twenty"),  # re-crawl: content changed
            (7, "zephyr alpha seven"),  # new
        ],
    ]

    up_root = str(tmp_path / "up")
    landing = _land_offer_drops(spark, up_root, drops)
    report = run_incremental_er_offers(
        spark,
        landing,
        os.path.join(up_root, "work"),
        blocking_params=BP,
        indexed=True,
        upsert=True,
    )
    wd = os.path.join(up_root, "work")
    cur = read_corpus_indexed(spark, wd)
    titles = {r["id"]: r["title"] for r in cur.collect()}
    assert titles[2] == "quartz filler twenty"
    assert report["offers"] == 4  # resolved corpus, not the ingest log
    ref_scored, ref_entities = _from_scratch(cur)
    assert _rows(read_match_edges_indexed(spark, wd)) == _rows(ref_scored)
    assert _rows(read_entities_indexed(spark, wd)) == _rows(ref_entities)

    # default insert mode: the re-offer is ignored, v1 content stands
    ins_root = str(tmp_path / "ins")
    landing2 = _land_offer_drops(spark, ins_root, drops)
    run_incremental_er_offers(
        spark,
        landing2,
        os.path.join(ins_root, "work"),
        blocking_params=BP,
        indexed=True,
    )
    t2 = {
        r["id"]: r["title"]
        for r in read_corpus_indexed(
            spark, os.path.join(ins_root, "work")
        ).collect()
    }
    assert t2[2] == "zephyr alpha two"

    # upsert without the index is a contract error, not silent foldback
    with pytest.raises(ValueError):
        run_incremental_er_offers(
            spark,
            landing,
            os.path.join(up_root, "work2"),
            indexed=False,
            upsert=True,
        )


def test_streaming_tombstone_feed_retracts_exactly(spark, tmp_path):
    """run_incremental_retractions: tombstone drops drained through real
    readStream machinery, each micro-batch folding a retraction; the final
    state equals from-scratch on the survivors, a catch-up rerun processes
    only new files, and both streams' replay guards stay namespaced."""
    import time

    from productbert_intermediate_spark.streaming.incremental_er import (
        run_incremental_retractions,
    )

    root = str(tmp_path)
    wd = os.path.join(root, "work")
    resolve_batch_indexed(
        spark, _offers(spark, BRIDGE), wd, batch_id=0, blocking_params=BP
    )

    tomb = os.path.join(root, "tombstones")
    os.makedirs(tomb)
    now = time.time()
    for i, ids in enumerate([(2,), (12, 999)]):  # bridge, then one absent id
        stage = os.path.join(root, f"tstage{i}")
        _ids(spark, *ids).coalesce(1).write.mode("overwrite").parquet(stage)
        src = next(
            p for p in sorted(os.listdir(stage)) if p.endswith(".parquet")
        )
        dst = os.path.join(tomb, f"drop-{i:04d}.parquet")
        shutil.move(os.path.join(stage, src), dst)
        os.utime(dst, (now - 600 + i * 10, now - 600 + i * 10))
        shutil.rmtree(stage)

    report = run_incremental_retractions(spark, tomb, wd, blocking_params=BP)
    assert report["micro_batches"] == 2
    assert report["offers"] == 5

    survivors = _offers(spark, [r for r in BRIDGE if r[0] not in (2, 12)])
    ref_scored, ref_entities = _from_scratch(survivors)
    assert _rows(read_match_edges_indexed(spark, wd)) == _rows(ref_scored)
    assert _rows(read_entities_indexed(spark, wd)) == _rows(ref_entities)
    # the flat per-run views were refreshed to the post-retraction state
    assert _rows(spark.read.parquet(f"{wd}/entities")) == _rows(ref_entities)

    state = VersionedState(spark, os.path.join(wd, "index"))
    assert state.last_batch_id() == 0  # offers stream guard untouched
    assert state.last_retract_batch_id() is not None

    # catch-up rerun: nothing new landed, nothing reprocessed
    v = state.current_version()
    report2 = run_incremental_retractions(spark, tomb, wd, blocking_params=BP)
    assert report2["micro_batches"] == 0
    assert state.current_version() == v
    assert report2["entities"] == report["entities"]


def test_retract_keeps_surviving_entities_stable_ids(spark, tmp_path):
    """Retracting a non-bridge member must not relabel the surviving
    entity: its stable id persists (inherited), only its membership
    shrinks."""
    wd = str(tmp_path / "work")
    rows = [
        (1, "acme turbo zephyr red widget one"),
        (2, "acme turbo zephyr red widget two"),
        (3, "acme turbo zephyr red widget three"),
        (10, "quartz filler ten"),
        (11, "garnet filler eleven"),
    ]
    resolve_batch_indexed(
        spark,
        _offers(spark, rows),
        wd,
        batch_id=0,
        blocking_params=BP,
        stable_ids=True,
    )
    pre = {
        r["id"]: r["entity_id"]
        for r in spark.read.parquet(f"{wd}/stable_entities").collect()
    }
    assert pre[1] == pre[2] == pre[3]

    resolve_batch_retract(
        spark, _ids(spark, 3), wd, blocking_params=BP, stable_ids=True
    )
    post = spark.read.parquet(f"{wd}/stable_entities")
    got = {r["id"]: (r["entity_id"], r["inherited"]) for r in post.collect()}
    assert 3 not in got
    assert got[1] == (pre[1], True) and got[2] == (pre[2], True)
