"""Incremental entity resolution: a pages feed → continuously current
entity table, one micro-batch at a time.

The reference resolves a corpus in one offline pass (fixed script order,
/root/reference/README.md:25-38). A crawl, though, never stops — so this
module runs the SAME pipeline stages (extract → block → score → cluster)
under Structured Streaming's ``foreachBatch``, arranged so that the
expensive stage is incremental while the result stays EXACTLY the batch
run's:

* **extract** — per micro-batch, the streaming extractor (verbatim the
  batch one, see ``ingest.stream_extract_offers``);
* **block** — re-planned over the FULL accumulated corpus each batch.
  Deliberate: blocking's df statistics (min_df / max_df_frac) are
  corpus-wide, so only a full-corpus pass discovers pairs whose shared
  token reached min_df when its second occurrence arrived in THIS batch.
  Blocking is the cheap linear stage (token shuffles, bounded keys);
* **score** — incremental through a monotone SCORE CACHE: candidates
  already scored are anti-joined away on (id_l, id_r), so the
  quadratic-ish expensive stage only ever touches NEW pairs. Sound
  because the pair score is a PURE function of the two offers (row-local
  hash embeddings, fixed calibrated weights — no corpus statistics), so a
  pair scored in batch 1 carries the score the final batch run would give
  it;
* **edges** — the batch-equivalent edge set is derived each batch as
  ``score_cache ∩ current candidates``. The intersection is what makes
  the equivalence EXACT rather than monotone-superset: corpus growth can
  push a blocking key past max_block_size or a token past max_df_frac,
  and a pair surfaced through it earlier must then LEAVE the edge set
  (a from-scratch run would never see it) — its cached score stays, and
  is reused for free if the pair ever resurfaces;
* **cluster** — recomputed from the valid match edges after each batch
  (new edges can merge entities discovered many batches apart, so entity
  ids are not incrementally stable by nature).

Invariant (pinned by tests): after every micro-batch, ``match_edges`` and
``entities`` equal what the batch pipeline (block → score → cluster)
produces from scratch on the offers accumulated so far.

Exactly-once story: ``foreachBatch`` replays a batch after a crash; the
two appends are guarded by anti-joins against the tables they append to
(offers by id, score cache by pair), so a replayed batch appends nothing
twice — idempotence at the row-set level, the strongest guarantee a
non-transactional sink offers; the derived tables (match_edges, entities)
are overwrite-mode and self-heal on the next batch. (On Iceberg the
appends become atomic commits; same seam as sources.catalog.)

Scale: the foldback mode above re-blocks the full corpus and re-closes the
full match graph each batch — exact but O(corpus) per batch. The INDEXED
mode (``indexed=True`` / :func:`resolve_batch_indexed`) is the upgrade this
module used to only name: a persistent (key, id) blocking index with
token-df deltas and retroactive pairs (streaming/blocking_index.py) plus an
incremental closure over delta-affected components only
(streaming/incremental_cc.py), all on versioned snapshot state
(streaming/state_store.py). Round 5 also moved the last two per-batch
corpus touches into that state: scoring hydrates from an id-bucketed
``offers`` table pruned to the add pairs' ids, and the score cache is a
pair-hash-bucketed table probed only at the add pairs' buckets — no step
of an indexed batch scans the accumulated corpus or cache. Per-batch cost
is bounded by the batch + the flipped-token fallout, measured ~flat under
corpus growth (test_indexed_per_batch_cost_flat_under_corpus_growth and
scripts/incremental_er_bench.py); the same pinned batch-equivalence
invariant holds in both modes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking as B
from ..operators import scoring as S
from ..operators.clustering import assign_entities
from .ingest import stream_extract_offers, stream_pages

EDGE_COLS = ("id_l", "id_r", "logit", "score", "match")


def _has_data(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def resolve_batch_increment(
    spark: SparkSession,
    batch_offers: DataFrame,
    offers_dir: str,
    cache_dir: str,
    edges_dir: str,
    entities_dir: str,
    weights: dict[str, float] | None = None,
    blocking_params: dict | None = None,
    stable_dir: str | None = None,
    changelog_dir: str | None = None,
    batch_id: int | None = None,
    max_entity_size: int | None = None,
    split_ladder: tuple[float, ...] = (0.6, 0.7, 0.8, 0.9, 0.95),
) -> None:
    """One incremental ER step: fold ``batch_offers`` into the accumulated
    tables. Plain batch function — ``foreachBatch`` calls it with each
    micro-batch, and tests/registry queries can call it directly.

    ``stable_dir`` additionally maintains a stable_entities table: the
    entities table keeps the batch-run-equivalent labels (the pinned
    invariant — CC labels are min member id of the CURRENT graph), while
    stable_dir carries ids re-keyed against the previous batch via
    operators/entity_ids.stabilize_entity_ids, so downstream keys survive
    micro-batches. The two tables always hold the same PARTITION of ids —
    only the labels differ.

    ``max_entity_size`` applies the giant-component guard
    (operators/clustering.split_giant_components) to the per-batch entity
    derivation; the batch-equivalence invariant then holds against the
    GUARDED batch pipeline (run_pipeline with the same cap and ladder),
    because the guard is a pure function of the valid edge set, which is
    already batch-equivalent. Foldback mode only — this step re-clusters
    per batch anyway, so the guard's component-sizes pass adds no new
    asymptotic cost; the indexed mode's O(batch) bound would not survive
    a per-batch corpus-wide sizes scan, so it does not offer the knob.
    """
    bp = blocking_params or {}
    batch = batch_offers.where(F.col("id").isNotNull())
    if _has_data(offers_dir):
        existing = spark.read.parquet(offers_dir).select("id")
        batch = batch.join(existing, "id", "left_anti")
    batch.write.mode("append").parquet(offers_dir)

    offers_all = spark.read.parquet(offers_dir)
    n_offers = offers_all.count()
    cands = B.block_offers(offers_all, **bp)
    # candidate generation runs twice below (new-pair discovery, then the
    # validity intersection); one local materialization per batch
    cands = cands.localCheckpoint(eager=True)
    new_pairs = cands
    if _has_data(cache_dir):
        prev = spark.read.parquet(cache_dir).select("id_l", "id_r")
        new_pairs = cands.join(prev, ["id_l", "id_r"], "left_anti")
    scored_new = S.score_candidates(
        new_pairs, offers_all, weights=weights, n_offers=n_offers
    ).select(*EDGE_COLS)
    scored_new.write.mode("append").parquet(cache_dir)

    # batch-equivalent edge set = cache ∩ current candidates: every current
    # candidate is in the cache (just appended), and cached pairs whose
    # blocking key has since been pruned/capped drop out — exactly what a
    # from-scratch run over the accumulated corpus would produce
    cache = spark.read.parquet(cache_dir)
    valid = cache.join(cands, ["id_l", "id_r"], "left_semi")
    valid.write.mode("overwrite").parquet(edges_dir)

    edges = spark.read.parquet(edges_dir)
    if max_entity_size is None:
        ents = assign_entities(offers_all, edges.where("match"))
    else:
        from ..operators.clustering import split_giant_components

        comp = split_giant_components(
            edges.where("match"), max_entity_size, list(split_ladder)
        )
        ents = (
            offers_all.select("id")
            .join(comp, "id", "left")
            .select(
                "id", F.coalesce("entity_id", F.col("id")).alias("entity_id")
            )
        )
    ents.write.mode("overwrite").parquet(entities_dir)

    if stable_dir is not None:
        _stabilize_step(
            spark,
            spark.read.parquet(entities_dir).select("id", "entity_id"),
            stable_dir,
            changelog_dir=changelog_dir,
            batch_id=batch_id,
        )


SCH_MATCH_EDGES = (
    "id_l long, id_r long, logit double, score double, match boolean,"
    " bucket int"
)
# the score cache shares the edge shape; bucketed by pair hash so per-batch
# probes prune to the add pairs' buckets instead of scanning the cache
SCH_SCORE_CACHE = SCH_MATCH_EDGES


def _append_offers_idempotent(
    spark, batch_new: DataFrame, offers_dir: str, batch_id: int | None
) -> None:
    """Append a batch to the flat offers corpus dir WITHOUT reading it.

    The old guard anti-joined the batch against the accumulated dir's id
    column — correct, but the one remaining per-batch corpus scan in the
    indexed path. With a ``batch_id`` the append is made idempotent by
    NAMING instead: files land as ``b{batch_id}-*.parquet`` via a staging
    dir + metadata-only renames, and a foreachBatch replay first deletes
    any files carrying its own prefix — a replayed batch can only replace
    its own bytes, never double-append. Spark skips the dot-prefixed
    staging dir on read, so a concurrent reader of the corpus never sees
    a half-staged batch. Without a batch_id (direct calls outside a
    stream) the scan-guarded append remains the correct fallback.
    """
    if batch_id is None:
        to_append = batch_new
        if _has_data(offers_dir):
            existing = spark.read.parquet(offers_dir).select("id")
            to_append = batch_new.join(existing, "id", "left_anti")
        to_append.write.mode("append").parquet(offers_dir)
        return
    staging = os.path.join(offers_dir, f".staging-b{batch_id}")
    batch_new.write.mode("overwrite").parquet(staging)
    prefix = f"b{batch_id}-"
    for name in os.listdir(offers_dir):
        if name.startswith(prefix):
            os.remove(os.path.join(offers_dir, name))
    i = 0
    for name in sorted(os.listdir(staging)):
        if name.startswith(("_", ".")) or not name.endswith(".parquet"):
            continue
        os.rename(
            os.path.join(staging, name),
            os.path.join(offers_dir, f"{prefix}{i}.parquet"),
        )
        i += 1
    shutil.rmtree(staging, ignore_errors=True)


def _offers_state_schema(batch: DataFrame) -> str:
    """DDL for the id-bucketed offers state table: the batch's own schema
    (sources differ — the streamed extractor has url and no cluster_id,
    synthetic corpora the reverse) plus the bucket partition column."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in batch.schema.fields
    )
    return cols + ", bucket int"


def _pair_bucket(n_buckets: int):
    from .state_store import bucket_of

    return bucket_of(F.concat_ws("\x00", "id_l", "id_r"), n_buckets)


def _stabilize_step(
    spark,
    new_ents: DataFrame,
    stable_dir: str,
    changelog_dir: str | None = None,
    batch_id: int | None = None,
) -> None:
    """Maintain the stable_entities table against ``new_ents`` (id,
    entity_id) with a write-then-rename swap (crash-safe, see ADVICE r4).

    ``changelog_dir`` additionally appends this step's per-entity delta
    (operators/entity_diff.entity_changelog, computed over the STABLE ids so
    an entity_id means the same entity on both sides) as one ``batch=<id>``
    partition — idempotent under foreachBatch replay: the partition path is
    keyed by ``batch_id`` and overwritten whole. Indexed-mode callers pass
    the state's COMMIT SEQUENCE (VersionedState.in_progress_version) as the
    key, not the stream batch id: out-of-band commits (a user retraction
    between micro-batches) consume their own sequence number, so a later
    stream batch can never collide with — and silently overwrite — the
    retraction's delta, and the feed's partition order IS the commit order
    a consumer must apply deltas in. Replay stability is unchanged: an
    uncommitted attempt's replay re-begins the same version. A replay that
    arrives AFTER the stable swap landed recomputes an empty delta
    (prev == new by then); the empty-delta guard below skips the overwrite
    so the real changelog written just before the swap survives.
    """
    from ..operators.entity_ids import stabilize_entity_ids

    old_dir = stable_dir + ".old"
    if not os.path.isdir(stable_dir) and os.path.isdir(old_dir):
        os.rename(old_dir, stable_dir)
    if _has_data(stable_dir):
        prev = spark.read.parquet(stable_dir).select("id", "entity_id")
        stable = stabilize_entity_ids(prev, new_ents)
    else:
        prev = spark.createDataFrame([], "id long, entity_id long")
        stable = new_ents.select(
            "id", "entity_id", F.lit(False).alias("inherited")
        )
    tmp_dir = stable_dir + ".next"
    stable.write.mode("overwrite").parquet(tmp_dir)
    if changelog_dir is not None:
        from ..operators.entity_diff import entity_changelog

        delta = entity_changelog(
            prev, spark.read.parquet(tmp_dir).select("id", "entity_id")
        )
        part = os.path.join(
            changelog_dir, f"batch={0 if batch_id is None else int(batch_id)}"
        )
        if not delta.isEmpty() or not os.path.isdir(part):
            delta.write.mode("overwrite").parquet(part)
    if os.path.isdir(old_dir):
        shutil.rmtree(old_dir)
    if os.path.isdir(stable_dir):
        os.rename(stable_dir, old_dir)
    os.rename(tmp_dir, stable_dir)
    if os.path.isdir(old_dir):
        shutil.rmtree(old_dir)


def resolve_batch_indexed(
    spark: SparkSession,
    batch_offers: DataFrame,
    workdir: str,
    batch_id: int | None = None,
    weights: dict[str, float] | None = None,
    blocking_params: dict | None = None,
    n_buckets: int = 16,
    stable_ids: bool = False,
    changelog: bool = False,
    compact_max_files: int = 8,
) -> None:
    """One incremental ER step at O(batch) cost: the blocking-index upgrade
    of :func:`resolve_batch_increment` (VERDICT r4 #3).

    Same pinned invariant — after every batch, the candidate/edge/entity
    state equals a from-scratch batch run over the accumulated corpus — but
    per-batch work is bounded by the batch plus flipped-token fallout
    (streaming/blocking_index.py), never a corpus re-block, and the closure
    is reconciled only inside delta-affected components
    (streaming/incremental_cc.py).

    Crash story: all index/edge/component state commits atomically per batch
    (VersionedState CURRENT pointer); ``batch_id`` short-circuits a replay
    of an already-committed batch, and a replay of an UNcommitted batch
    re-derives everything from the previous snapshot (the offers/cache
    appends are anti-join-guarded, as in the non-indexed path).
    """
    from .blocking_index import (
        SCH_OFFER_TOKENS,
        BlockingParams,
        apply_batch,
    )
    from .incremental_cc import update_components
    from .state_store import VersionedState

    state = VersionedState(spark, os.path.join(workdir, "index"), n_buckets)
    if batch_id is not None and state.last_batch_id() == batch_id:
        return  # replay of a committed batch — already folded in
    offers_dir = os.path.join(workdir, "offers")
    params = BlockingParams(**(blocking_params or {}))

    batch = batch_offers.where(F.col("id").isNotNull())
    # new = not yet in the INDEX (bucket-pruned lookup): derived from the
    # committed snapshot, not the offers dir, so a crash between the offers
    # append and the commit replays cleanly
    seen = state.lookup(
        "offer_tokens",
        SCH_OFFER_TOKENS,
        "id",
        batch.select("id").distinct(),
    ).select("id")
    batch_new = batch.join(seen, "id", "left_anti").localCheckpoint(eager=True)
    _append_offers_idempotent(spark, batch_new, offers_dir, batch_id)

    state.begin()
    delta = apply_batch(state, batch_new, params)
    pb = _pair_bucket(n_buckets)

    # offers also live in the state, id-bucketed: the scoring hydration
    # below (and every later batch's) reads them BUCKET-PRUNED instead of
    # scanning the accumulated offers dir — the dir stays as the flat
    # user-facing corpus table, written once per batch, read by nothing
    # per-batch
    from .state_store import bucket_of

    offer_cols = list(batch_new.columns)
    sch_offers = _offers_state_schema(batch_new)
    state.append(
        "offers",
        batch_new.withColumn("bucket", bucket_of(F.col("id"), n_buckets)),
    )

    # candidate adds not already in the set (== in match_edges); both probes
    # broadcast the SMALL delta over bucket-pruned reads — map-only
    me = state.read("match_edges", SCH_MATCH_EDGES)
    raw_adds = delta["pair_adds"]
    add_buckets = [
        r["b"] for r in raw_adds.select(pb.alias("b")).distinct().collect()
    ]
    if add_buckets:
        already = (
            me.where(F.col("bucket").isin(add_buckets))
            .join(F.broadcast(raw_adds), ["id_l", "id_r"], "left_semi")
            .select("id_l", "id_r")
        )
        # single checkpoint for the whole adds derivation (`already` feeds
        # only this anti-join — a separate eager cut was one more job)
        adds = raw_adds.join(
            F.broadcast(already), ["id_l", "id_r"], "left_anti"
        ).localCheckpoint(eager=True)

        # score only never-scored pairs; cached scores are reused verbatim.
        # Both remaining per-batch data touches are bucket-pruned (round
        # 5): the cache probe reads only the add pairs' buckets, and
        # hydration reads only the offers the add pairs reference — nothing
        # here scans the accumulated corpus or cache (sound because the
        # pair score is a pure function of the two offers; n_offers pins
        # the one corpus-sized input a feature could take)
        sc_cur = state.read("score_cache", SCH_SCORE_CACHE)
        cache_pruned = sc_cur.where(F.col("bucket").isin(add_buckets))
        to_score = adds.join(
            cache_pruned.select("id_l", "id_r"), ["id_l", "id_r"], "left_anti"
        )
        pair_ids = (
            adds.select(F.col("id_l").alias("id"))
            .unionByName(adds.select(F.col("id_r").alias("id")))
            .distinct()
        )
        offers_scope = (
            state.lookup("offers", sch_offers, "id", pair_ids)
            .drop("bucket")
            .unionByName(
                # this batch's offers sit in the in-progress version, not
                # the committed one the lookup reads — union them in
                batch_new.join(F.broadcast(pair_ids), "id", "left_semi")
                .select(*offer_cols)
            )
        )
        scored_new = S.score_candidates(
            to_score, offers_scope, weights=weights, n_offers=delta["n_offers"]
        ).select(*EDGE_COLS)
        state.append("score_cache", scored_new.withColumn("bucket", pb))
        cache_next = state.read_next("score_cache", SCH_SCORE_CACHE)
        add_rows = (
            cache_next.where(F.col("bucket").isin(add_buckets))
            .join(F.broadcast(adds), ["id_l", "id_r"], "left_semi")
            .select(*EDGE_COLS)
            .localCheckpoint(eager=True)
        )
    else:
        # no candidate pair enters this batch (common on idle/duplicate
        # drops): skip the scoring machinery's half-dozen empty-input jobs
        # — just carry the cache forward unchanged
        adds = raw_adds
        state.carry("score_cache")
        add_rows = spark.createDataFrame(
            [],
            "id_l long, id_r long, logit double, score double, match boolean",
        )

    # removals leave match_edges; their stored rows carry the match flag
    removals = delta["pair_removals"].localCheckpoint(eager=True)
    rem_buckets = [
        r["b"] for r in removals.select(pb.alias("b")).distinct().collect()
    ]
    if rem_buckets:
        me_rem_pruned = me.where(F.col("bucket").isin(rem_buckets))
        rem_rows = me_rem_pruned.join(
            F.broadcast(removals), ["id_l", "id_r"], "left_semi"
        ).select(*EDGE_COLS).localCheckpoint(eager=True)
        touched = sorted(
            {int(b) for b in add_buckets} | {int(b) for b in rem_buckets}
        )
        keep = (
            me.where(F.col("bucket").isin(touched))
            .select(*EDGE_COLS)
            .join(F.broadcast(removals), ["id_l", "id_r"], "left_anti")
        )
        state.rewrite_buckets(
            "match_edges",
            SCH_MATCH_EDGES,
            keep.unionByName(add_rows).select(*EDGE_COLS, pb.alias("bucket")),
            touched,
        )
    else:
        # no pair leaves the set this batch — the common append-only case.
        # `adds` is anti-joined against match_edges above, so appending
        # add_rows is row-identical to the rewrite-union while skipping the
        # touched-bucket read + reshuffle entirely (hard links + one small
        # write instead)
        rem_rows = spark.createDataFrame(
            [], "id_l long, id_r long, logit double, score double, match boolean"
        )
        state.carry("match_edges")
        if add_buckets:
            state.append_rows_next(
                "match_edges", add_rows.select(*EDGE_COLS, pb.alias("bucket"))
            )

    cur_match = (
        state.read_next("match_edges", SCH_MATCH_EDGES)
        .where("match")
        .select("id_l", "id_r")
    )
    update_components(
        state,
        new_ids=batch_new.select("id"),
        edge_adds=add_rows.where("match").select("id_l", "id_r"),
        edge_dels=rem_rows.where("match").select("id_l", "id_r"),
        current_match_edges=cur_match,
    )
    if stable_ids:
        _stabilize_step(
            spark,
            _next_entities(spark, state),
            os.path.join(workdir, "stable_entities"),
            changelog_dir=(
                os.path.join(workdir, "entity_changelog") if changelog else None
            ),
            # keyed by commit sequence, not stream batch id — see
            # _stabilize_step's docstring (out-of-band retractions)
            batch_id=state.in_progress_version(),
        )
    # bin-pack any bucket that accumulated more than compact_max_files
    # small files (append() adds one file set per batch): keeps per-bucket
    # read cost O(1) across micro-batches instead of O(#batches)
    state.compact_all(compact_max_files)
    state.commit(batch_id)


def _offers_ddl(offers_tbl: DataFrame) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in offers_tbl.schema.fields
    )


def resolve_batch_retract(
    spark: SparkSession,
    retract_ids: DataFrame,
    workdir: str,
    batch_id: int | None = None,
    weights: dict[str, float] | None = None,
    blocking_params: dict | None = None,
    n_buckets: int = 16,
    stable_ids: bool = False,
    changelog: bool = False,
    compact_max_files: int = 8,
) -> None:
    """Retract offers from an indexed-mode workdir: the other lifecycle
    event of a continuous crawl (page taken down, right-to-erasure, or the
    retract half of an upsert). ``retract_ids`` is a single-column (id)
    DataFrame; ids not currently indexed are ignored, so a replay of a
    committed retraction is a no-op.

    Invariant, mirrored from :func:`resolve_batch_indexed`: after the
    commit, every state table equals a from-scratch batch run over the
    corpus MINUS the retracted ids — candidate pairs touching them leave
    match_edges, retroactive pairs re-validated by falling token dfs enter
    (scored, or reused from cache), and their components re-close without
    them (a retracted bridge record SPLITS its entity, exactly as from
    scratch; streaming/incremental_cc.py ``removed_ids``).

    Cached scores touching retracted ids are EVICTED (one map-only scan of
    the cache's two id columns with a broadcast filter — the one
    cache-sized touch, no shuffle; only hit buckets rewrite), so a later
    re-insert of the same id with different content re-scores instead of
    reusing a stale row — the correctness seam :func:`resolve_batch_upsert`
    relies on.

    The flat ``offers/`` dir is the append-only INGEST LOG and is left
    untouched; the resolved corpus view is :func:`read_corpus_indexed`
    (the committed, id-bucketed offers state table).
    """
    from .blocking_index import (
        SCH_OFFER_TOKENS,
        BlockingParams,
        apply_retraction,
    )
    from .incremental_cc import update_components
    from .state_store import VersionedState, bucket_of

    state = VersionedState(spark, os.path.join(workdir, "index"), n_buckets)
    # retractions guard replays in their OWN pointer field: the retraction
    # stream's foreachBatch counter starts at 0 just like the insert
    # stream's (separate checkpoints), so sharing one field would let a
    # committed retraction batch N mask a crash-replay of insert batch N
    if batch_id is not None and state.last_retract_batch_id() == batch_id:
        return  # replay of a committed retraction
    params = BlockingParams(**(blocking_params or {}))
    rids = (
        state.lookup(
            "offer_tokens",
            SCH_OFFER_TOKENS,
            "id",
            retract_ids.select("id").distinct(),
        )
        .select("id")
        .localCheckpoint(eager=True)
    )
    if rids.isEmpty():
        return  # nothing indexed to retract (incl. replay after commit)

    state.begin()
    delta = apply_retraction(state, rids, params)
    pb = _pair_bucket(n_buckets)

    # offers state: drop retracted rows (bucket-pruned rewrite)
    offers_tbl = state.read("offers", "id long, bucket int")
    sch_offers = _offers_ddl(offers_tbl)
    rid_buckets = [
        r["b"]
        for r in rids.select(
            bucket_of(F.col("id"), n_buckets).alias("b")
        ).distinct().collect()
    ]
    keep_offers = offers_tbl.where(F.col("bucket").isin(rid_buckets)).join(
        F.broadcast(rids), "id", "left_anti"
    )
    state.rewrite_buckets("offers", sch_offers, keep_offers, rid_buckets)

    # score-cache eviction: scan id_l/id_r with a broadcast filter to find
    # hit buckets (map-only, two long columns), rewrite only those
    sc = state.read("score_cache", SCH_SCORE_CACHE)
    r_l = rids.withColumnRenamed("id", "id_l")
    r_r = rids.withColumnRenamed("id", "id_r")
    hit_buckets = [
        r["b"]
        for r in sc.join(F.broadcast(r_l), "id_l", "left_semi")
        .select(F.col("bucket").alias("b"))
        .unionByName(
            sc.join(F.broadcast(r_r), "id_r", "left_semi").select(
                F.col("bucket").alias("b")
            )
        )
        .distinct()
        .collect()
    ]
    if hit_buckets:
        keep_cache = (
            sc.where(F.col("bucket").isin(hit_buckets))
            .join(F.broadcast(r_l), "id_l", "left_anti")
            .join(F.broadcast(r_r), "id_r", "left_anti")
        )
        state.rewrite_buckets(
            "score_cache", SCH_SCORE_CACHE, keep_cache, hit_buckets
        )
    else:
        state.carry("score_cache")

    # retroactive adds among survivors: reuse evicted-aware cache, score
    # the rest (hydration = bucket-pruned lookup of the committed offers)
    me = state.read("match_edges", SCH_MATCH_EDGES)
    raw_adds = delta["pair_adds"]
    add_buckets = [
        r["b"] for r in raw_adds.select(pb.alias("b")).distinct().collect()
    ]
    if add_buckets:
        already = (
            me.where(F.col("bucket").isin(add_buckets))
            .join(F.broadcast(raw_adds), ["id_l", "id_r"], "left_semi")
            .select("id_l", "id_r")
        )
        adds = raw_adds.join(
            F.broadcast(already), ["id_l", "id_r"], "left_anti"
        ).localCheckpoint(eager=True)
        cache_next = state.read_next("score_cache", SCH_SCORE_CACHE)
        cache_pruned = cache_next.where(F.col("bucket").isin(add_buckets))
        to_score = adds.join(
            cache_pruned.select("id_l", "id_r"), ["id_l", "id_r"], "left_anti"
        )
        pair_ids = (
            adds.select(F.col("id_l").alias("id"))
            .unionByName(adds.select(F.col("id_r").alias("id")))
            .distinct()
        )
        offers_scope = state.lookup(
            "offers", sch_offers, "id", pair_ids
        ).drop("bucket")
        scored_new = S.score_candidates(
            to_score, offers_scope, weights=weights, n_offers=delta["n_offers"]
        ).select(*EDGE_COLS)
        state.append_rows_next(
            "score_cache", scored_new.withColumn("bucket", pb)
        )
        add_rows = (
            state.read_next("score_cache", SCH_SCORE_CACHE)
            .where(F.col("bucket").isin(add_buckets))
            .join(F.broadcast(adds), ["id_l", "id_r"], "left_semi")
            .select(*EDGE_COLS)
            .localCheckpoint(eager=True)
        )
    else:
        adds = raw_adds
        add_rows = spark.createDataFrame(
            [],
            "id_l long, id_r long, logit double, score double, match boolean",
        )

    # removals: every candidate pair touching a retracted id is in the
    # delta (its keys all died, and no valid shared key survives)
    removals = delta["pair_removals"].localCheckpoint(eager=True)
    rem_buckets = [
        r["b"] for r in removals.select(pb.alias("b")).distinct().collect()
    ]
    if rem_buckets:
        me_rem_pruned = me.where(F.col("bucket").isin(rem_buckets))
        rem_rows = me_rem_pruned.join(
            F.broadcast(removals), ["id_l", "id_r"], "left_semi"
        ).select(*EDGE_COLS).localCheckpoint(eager=True)
        touched = sorted(
            {int(b) for b in add_buckets} | {int(b) for b in rem_buckets}
        )
        keep = (
            me.where(F.col("bucket").isin(touched))
            .select(*EDGE_COLS)
            .join(F.broadcast(removals), ["id_l", "id_r"], "left_anti")
        )
        state.rewrite_buckets(
            "match_edges",
            SCH_MATCH_EDGES,
            keep.unionByName(add_rows).select(*EDGE_COLS, pb.alias("bucket")),
            touched,
        )
    else:
        rem_rows = spark.createDataFrame(
            [], "id_l long, id_r long, logit double, score double, match boolean"
        )
        state.carry("match_edges")
        if add_buckets:
            state.append_rows_next(
                "match_edges", add_rows.select(*EDGE_COLS, pb.alias("bucket"))
            )

    cur_match = (
        state.read_next("match_edges", SCH_MATCH_EDGES)
        .where("match")
        .select("id_l", "id_r")
    )
    update_components(
        state,
        new_ids=spark.createDataFrame([], "id long"),
        edge_adds=add_rows.where("match").select("id_l", "id_r"),
        edge_dels=rem_rows.where("match").select("id_l", "id_r"),
        current_match_edges=cur_match,
        removed_ids=rids,
    )
    if stable_ids:
        _stabilize_step(
            spark,
            _next_entities(spark, state),
            os.path.join(workdir, "stable_entities"),
            changelog_dir=(
                os.path.join(workdir, "entity_changelog") if changelog else None
            ),
            # keyed by commit sequence, not stream batch id — see
            # _stabilize_step's docstring (out-of-band retractions)
            batch_id=state.in_progress_version(),
        )
    state.compact_all(compact_max_files)
    state.commit(retract_batch_id=batch_id)


def resolve_batch_upsert(
    spark: SparkSession,
    batch_offers: DataFrame,
    workdir: str,
    batch_id: int | None = None,
    weights: dict[str, float] | None = None,
    blocking_params: dict | None = None,
    n_buckets: int = 16,
    stable_ids: bool = False,
    changelog: bool = False,
    compact_max_files: int = 8,
) -> None:
    """Fold a batch that may RE-OFFER already-indexed ids with changed
    content (a re-crawl): retract the stale versions, then insert the batch.

    Invariant: after the commit, state equals a from-scratch run over
    (accumulated corpus − batch ids) ∪ batch. Ids whose stored row is
    byte-identical to the batch row are NOT retracted (nothing to redo —
    the insert path's seen-filter then skips them); changed ids are
    retracted first, which evicts their cached pair scores, so the insert
    re-scores every pair they enter with the NEW content.

    Crash story: the retraction commits its own version (carrying both
    replay-guard fields forward in the pointer), the insert commits with
    ``batch_id``. A replay after a crash in between finds the stale ids
    already gone (retract no-ops before opening a version) and re-runs the
    insert idempotently; a replay after full commit short-circuits on this
    function's batch-id guard before touching anything.

    ``stable_ids``/``changelog`` apply to the INSERT step only: the
    mid-upsert snapshot (content removed, not yet re-added) is an artifact,
    so a consumer sees ONE net delta per upsert batch, computed against the
    pre-upsert stable table.
    """
    from .blocking_index import SCH_OFFER_TOKENS
    from .state_store import VersionedState

    state = VersionedState(spark, os.path.join(workdir, "index"), n_buckets)
    if batch_id is not None and state.last_batch_id() == batch_id:
        return
    batch = batch_offers.where(F.col("id").isNotNull())
    present = state.lookup(
        "offer_tokens", SCH_OFFER_TOKENS, "id", batch.select("id").distinct()
    ).select("id")
    stale = present
    if not present.isEmpty():
        offers_tbl = state.read("offers", "id long, bucket int")
        stored = state.lookup(
            "offers", _offers_ddl(offers_tbl), "id", present
        ).drop("bucket")
        shared = sorted(c for c in stored.columns if c in batch.columns)
        val_cols = [c for c in shared if c != "id"]
        bh = batch.select("id", F.xxhash64(*val_cols).alias("_h"))
        sh = stored.select("id", F.xxhash64(*val_cols).alias("_h_old"))
        stale = (
            bh.join(sh, "id")
            .where(F.col("_h") != F.col("_h_old"))
            .select("id")
        )
    # the retract half never stabilizes or logs: the mid-upsert snapshot
    # (content removed, not yet re-added) is an artifact, and a consumer
    # wants ONE net delta per upsert — the insert step emits it, comparing
    # against the pre-upsert stable table
    resolve_batch_retract(
        spark,
        stale,
        workdir,
        batch_id=None,
        weights=weights,
        blocking_params=blocking_params,
        n_buckets=n_buckets,
        stable_ids=False,
        changelog=False,
        compact_max_files=compact_max_files,
    )
    resolve_batch_indexed(
        spark,
        batch,
        workdir,
        batch_id=batch_id,
        weights=weights,
        blocking_params=blocking_params,
        n_buckets=n_buckets,
        stable_ids=stable_ids,
        changelog=changelog,
        compact_max_files=compact_max_files,
    )


def read_corpus_indexed(
    spark: SparkSession, workdir: str, n_buckets: int = 16
) -> DataFrame:
    """The resolved corpus of an indexed workdir: the committed offers
    state table — exact under retractions/upserts, unlike the flat
    ``offers/`` dir, which is the append-only ingest log."""
    from .state_store import VersionedState

    state = VersionedState(spark, os.path.join(workdir, "index"), n_buckets)
    return state.read("offers", "id long, bucket int").drop("bucket")


def _next_entities(spark, state) -> DataFrame:
    """(id, entity_id) from the IN-PROGRESS components table."""
    from .incremental_cc import SCH_COMPONENTS

    return state.read_next("components", SCH_COMPONENTS).select(
        "id", F.col("label").alias("entity_id")
    )


def read_entities_indexed(
    spark: SparkSession, workdir: str, n_buckets: int = 16
) -> DataFrame:
    """The committed (id, entity_id) table of an indexed-mode workdir."""
    from .incremental_cc import read_entities
    from .state_store import VersionedState

    return read_entities(
        VersionedState(spark, os.path.join(workdir, "index"), n_buckets)
    )


def read_match_edges_indexed(
    spark: SparkSession, workdir: str, n_buckets: int = 16
) -> DataFrame:
    """The committed valid-edge table (EDGE_COLS) of an indexed workdir."""
    from .state_store import VersionedState

    state = VersionedState(spark, os.path.join(workdir, "index"), n_buckets)
    return state.read("match_edges", SCH_MATCH_EDGES).select(*EDGE_COLS)


def read_score_cache_indexed(
    spark: SparkSession, workdir: str, n_buckets: int = 16
) -> DataFrame:
    """The committed score-cache table (EDGE_COLS) of an indexed workdir."""
    from .state_store import VersionedState

    state = VersionedState(spark, os.path.join(workdir, "index"), n_buckets)
    return state.read("score_cache", SCH_SCORE_CACHE).select(*EDGE_COLS)


def _run_stream(
    spark: SparkSession,
    source: DataFrame,
    workdir: str,
    weights: dict[str, float] | None,
    blocking_params: dict | None,
    available_now: bool,
    timeout_s: int,
    stable_ids: bool = False,
    indexed: bool = False,
    n_buckets: int = 16,
    changelog: bool = False,
    upsert: bool = False,
    max_entity_size: int | None = None,
    split_ladder: tuple[float, ...] = (0.6, 0.7, 0.8, 0.9, 0.95),
) -> dict:
    if upsert and not indexed:
        raise ValueError(
            "upsert=True requires indexed=True: re-crawl folds retract"
            " stale content through the versioned blocking index"
        )
    if max_entity_size is not None and indexed:
        raise ValueError(
            "max_entity_size requires indexed=False: the guard's per-batch"
            " component-sizes pass is corpus-wide, which the indexed mode's"
            " O(batch) bound cannot absorb (see resolve_batch_increment)"
        )
    offers_dir = os.path.join(workdir, "offers")
    cache_dir = os.path.join(workdir, "score_cache")
    edges_dir = os.path.join(workdir, "match_edges")
    entities_dir = os.path.join(workdir, "entities")
    stable_dir = os.path.join(workdir, "stable_entities") if stable_ids else None
    checkpoint = os.path.join(workdir, "_stream_checkpoint")

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        if indexed:
            step = resolve_batch_upsert if upsert else resolve_batch_indexed
            step(
                spark,
                batch_df,
                workdir,
                batch_id=batch_id,
                weights=weights,
                blocking_params=blocking_params,
                n_buckets=n_buckets,
                stable_ids=stable_ids,
                changelog=changelog,
            )
        else:
            resolve_batch_increment(
                spark,
                batch_df,
                offers_dir,
                cache_dir,
                edges_dir,
                entities_dir,
                weights=weights,
                blocking_params=blocking_params,
                stable_dir=stable_dir,
                changelog_dir=(
                    os.path.join(workdir, "entity_changelog")
                    if changelog and stable_ids
                    else None
                ),
                batch_id=batch_id,
                max_entity_size=max_entity_size,
                split_ladder=split_ladder,
            )

    writer = source.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if not available_now:  # pragma: no cover - tail mode returns the handle
        return {"query": q}
    q.awaitTermination(timeout_s)

    if indexed:
        # flat views once per RUN (not per batch — that is the point):
        # downstream consumers and the report keep the same layout
        read_match_edges_indexed(spark, workdir, n_buckets).write.mode(
            "overwrite"
        ).parquet(edges_dir)
        read_entities_indexed(spark, workdir, n_buckets).write.mode(
            "overwrite"
        ).parquet(entities_dir)

    def _rows(p) -> int:
        # recentProgress entries are dicts in some PySpark versions and
        # StreamingQueryProgress objects in others
        try:
            return int(p["numInputRows"])
        except (TypeError, KeyError):
            return int(getattr(p, "numInputRows", 0) or 0)

    n_batches = len([p for p in q.recentProgress if p is not None and _rows(p)])
    edges = spark.read.parquet(edges_dir)
    return {
        "micro_batches": n_batches,
        # indexed: the resolved corpus is the committed state table (the
        # flat offers dir is the append-only ingest log, which an upsert
        # stream appends each changed version to)
        "offers": (
            read_corpus_indexed(spark, workdir, n_buckets)
            if indexed
            else spark.read.parquet(offers_dir)
        ).count(),
        "scored_pairs_cached": (
            read_score_cache_indexed(spark, workdir, n_buckets)
            if indexed
            else spark.read.parquet(cache_dir)
        ).count(),
        "valid_pairs": edges.count(),
        "match_edges": edges.where("match").count(),
        "entities": spark.read.parquet(entities_dir)
        .select("entity_id")
        .distinct()
        .count(),
    }


def run_incremental_er(
    spark: SparkSession,
    pages_path: str,
    workdir: str,
    weights: dict[str, float] | None = None,
    blocking_params: dict | None = None,
    lang: str = "en",
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
    timeout_s: int = 900,
    stable_ids: bool = False,
    indexed: bool = False,
    n_buckets: int = 16,
    changelog: bool = False,
    upsert: bool = False,
    max_entity_size: int | None = None,
    split_ladder: tuple[float, ...] = (0.6, 0.7, 0.8, 0.9, 0.95),
) -> dict:
    """Stream a PAGES landing directory into a continuously maintained
    entity table under ``workdir`` (offers/, score_cache/, match_edges/,
    entities/; plus stable_entities/ when ``stable_ids`` — entity ids that
    survive micro-batches via operators/entity_ids.stabilize_entity_ids).

    ``available_now=True`` drains the current backlog and stops — the
    idempotent catch-up mode: rerunning after new pages land processes
    only the new files (file-source checkpoint) and scores only the new
    pairs (the cache anti-join), exactly like a resumed batch pipeline but
    without re-scoring anything. ``available_now=False`` tails the
    directory. Returns a report dict (counts + micro-batches this run).

    ``indexed=True`` switches the per-batch step to the O(batch) blocking
    index + incremental closure (resolve_batch_indexed) — same final
    tables, per-batch cost bounded by the delta instead of the corpus.

    ``upsert=True`` (requires ``indexed``) treats a re-offered id as a
    RE-CRAWL: if its content changed, the stale version is retracted (index
    rows, cached scores, candidate pairs, component membership) before the
    new version folds in — resolve_batch_upsert per micro-batch. The
    default insert mode instead keeps the FIRST version seen and ignores
    re-offers, which is right for append-only corpora but silently drops
    content updates on a live crawl.

    ``max_entity_size`` (+ ``split_ladder``) turns on the giant-component
    guard per micro-batch — foldback mode only; see
    resolve_batch_increment's docstring for why the indexed mode refuses it.
    """
    pages = stream_pages(spark, pages_path, max_files_per_trigger)
    return _run_stream(
        spark,
        stream_extract_offers(pages, lang=lang),
        workdir,
        weights,
        blocking_params,
        available_now,
        timeout_s,
        stable_ids=stable_ids,
        indexed=indexed,
        n_buckets=n_buckets,
        changelog=changelog,
        upsert=upsert,
        max_entity_size=max_entity_size,
        split_ladder=split_ladder,
    )


def run_incremental_er_offers(
    spark: SparkSession,
    offers_landing: str,
    workdir: str,
    weights: dict[str, float] | None = None,
    blocking_params: dict | None = None,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
    timeout_s: int = 900,
    stable_ids: bool = False,
    indexed: bool = False,
    n_buckets: int = 16,
    changelog: bool = False,
    upsert: bool = False,
    max_entity_size: int | None = None,
    split_ladder: tuple[float, ...] = (0.6, 0.7, 0.8, 0.9, 0.95),
) -> dict:
    """Same incremental ER over a landing directory of ALREADY-EXTRACTED
    offers (OFFER_SCHEMA parquet drops) — the entry point for corpora that
    arrive as records rather than raw pages (and for the oracle-backed
    registry twin, which feeds deterministic offer drops). ``upsert`` as in
    :func:`run_incremental_er`."""
    from ..sources.readers import OFFER_SCHEMA

    reader = spark.readStream.schema(OFFER_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _run_stream(
        spark,
        reader.parquet(offers_landing),
        workdir,
        weights,
        blocking_params,
        available_now,
        timeout_s,
        stable_ids=stable_ids,
        indexed=indexed,
        n_buckets=n_buckets,
        changelog=changelog,
        upsert=upsert,
        max_entity_size=max_entity_size,
        split_ladder=split_ladder,
    )


def run_incremental_retractions(
    spark: SparkSession,
    ids_landing: str,
    workdir: str,
    weights: dict[str, float] | None = None,
    blocking_params: dict | None = None,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
    timeout_s: int = 900,
    stable_ids: bool = False,
    n_buckets: int = 16,
    changelog: bool = False,
) -> dict:
    """Drain a TOMBSTONE landing directory — parquet drops of single-column
    ``id`` tables (pages taken down, right-to-erasure requests) — into an
    INDEXED workdir previously built by the insert/upsert streams:
    :func:`resolve_batch_retract` per micro-batch, with its own streaming
    checkpoint (``_retract_checkpoint``) and its own replay-guard namespace
    in the state pointer, so this feed's batch counter can never mask or be
    masked by the offers stream's.

    Single-writer contract (the versioned state has one CURRENT pointer and
    no lock): drain feeds ALTERNATELY with ``availableNow`` — never run this
    concurrently with the offers stream on the same workdir. The same rule
    any single-writer table format imposes.

    Returns the usual report dict over the post-drain state; already-absent
    ids in a drop are no-ops (idempotent replays)."""
    reader = spark.readStream.schema("id long")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    source = reader.parquet(ids_landing)
    checkpoint = os.path.join(workdir, "_retract_checkpoint")

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        resolve_batch_retract(
            spark,
            batch_df,
            workdir,
            batch_id=batch_id,
            weights=weights,
            blocking_params=blocking_params,
            n_buckets=n_buckets,
            stable_ids=stable_ids,
            changelog=changelog,
        )

    writer = source.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if not available_now:  # pragma: no cover - tail mode returns the handle
        return {"query": q}
    q.awaitTermination(timeout_s)

    # refresh the flat per-run views so downstream consumers of the batch
    # layout (and the report below) see the post-retraction state
    edges_dir = os.path.join(workdir, "match_edges")
    entities_dir = os.path.join(workdir, "entities")
    read_match_edges_indexed(spark, workdir, n_buckets).write.mode(
        "overwrite"
    ).parquet(edges_dir)
    read_entities_indexed(spark, workdir, n_buckets).write.mode(
        "overwrite"
    ).parquet(entities_dir)

    def _rows(p) -> int:
        try:
            return int(p["numInputRows"])
        except (TypeError, KeyError):
            return int(getattr(p, "numInputRows", 0) or 0)

    n_batches = len([p for p in q.recentProgress if p is not None and _rows(p)])
    edges = spark.read.parquet(edges_dir)
    return {
        "micro_batches": n_batches,
        "offers": read_corpus_indexed(spark, workdir, n_buckets).count(),
        "scored_pairs_cached": read_score_cache_indexed(
            spark, workdir, n_buckets
        ).count(),
        "valid_pairs": edges.count(),
        "match_edges": edges.where("match").count(),
        "entities": spark.read.parquet(entities_dir)
        .select("entity_id")
        .distinct()
        .count(),
    }
