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

Scale: per-batch cost = one full-corpus blocking pass (linear, bounded
keys) + scoring of new pairs only + one CC over the match graph. At
10^12 offers the full re-block per batch is the piece to upgrade: keep a
persistent (key, id) index plus a token-df delta table and emit
retroactive pairs for tokens that cross min_df — the score cache and
everything downstream is already shaped for it.
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
    assign_entities(offers_all, edges.where("match")).write.mode(
        "overwrite"
    ).parquet(entities_dir)

    if stable_dir is not None:
        from ..operators.entity_ids import stabilize_entity_ids

        new_ents = spark.read.parquet(entities_dir).select("id", "entity_id")
        # crash recovery: a failure between the two renames below leaves
        # the previous table under .old and no live dir — restore it so
        # the replayed batch still inherits ids
        old_dir = stable_dir + ".old"
        if not os.path.isdir(stable_dir) and os.path.isdir(old_dir):
            os.rename(old_dir, stable_dir)
        if _has_data(stable_dir):
            prev = spark.read.parquet(stable_dir).select("id", "entity_id")
            stable = stabilize_entity_ids(prev, new_ents)
        else:
            stable = new_ents.select(
                "id", "entity_id", F.lit(False).alias("inherited")
            )
        # Write-then-swap, never overwrite-in-place: the new table reads
        # from the old one, and in-place overwrite protected only by
        # localCheckpoint is non-reliable (executor loss discards the
        # blocks AFTER the source files are gone) and non-atomic (a crash
        # mid-write loses the previous stable table — exactly the cross-run
        # continuity this table exists for). ADVICE r4. The directory
        # rename is atomic on a local FS; on Iceberg this whole dance
        # becomes one snapshot commit (same seam as sources.catalog).
        tmp_dir = stable_dir + ".next"
        stable.write.mode("overwrite").parquet(tmp_dir)
        if os.path.isdir(old_dir):
            shutil.rmtree(old_dir)
        if os.path.isdir(stable_dir):
            os.rename(stable_dir, old_dir)
        os.rename(tmp_dir, stable_dir)
        if os.path.isdir(old_dir):
            shutil.rmtree(old_dir)


def _run_stream(
    spark: SparkSession,
    source: DataFrame,
    workdir: str,
    weights: dict[str, float] | None,
    blocking_params: dict | None,
    available_now: bool,
    timeout_s: int,
    stable_ids: bool = False,
) -> dict:
    offers_dir = os.path.join(workdir, "offers")
    cache_dir = os.path.join(workdir, "score_cache")
    edges_dir = os.path.join(workdir, "match_edges")
    entities_dir = os.path.join(workdir, "entities")
    stable_dir = os.path.join(workdir, "stable_entities") if stable_ids else None
    checkpoint = os.path.join(workdir, "_stream_checkpoint")

    def _step(batch_df: DataFrame, batch_id: int) -> None:
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
        "offers": spark.read.parquet(offers_dir).count(),
        "scored_pairs_cached": spark.read.parquet(cache_dir).count(),
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
) -> dict:
    """Same incremental ER over a landing directory of ALREADY-EXTRACTED
    offers (OFFER_SCHEMA parquet drops) — the entry point for corpora that
    arrive as records rather than raw pages (and for the oracle-backed
    registry twin, which feeds deterministic offer drops)."""
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
    )
