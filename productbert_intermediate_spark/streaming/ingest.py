"""Structured-Streaming ingest: incremental pages → offers (beyond-reference).

The reference is batch-only (its corpus is a finished crawl snapshot;
SURVEY §2.8), but a production training-data pipeline ingests crawls as
they land. This module re-expresses the S1+extraction front of the batch
pipeline as an incremental stream with the same cleaned-offer semantics:

* ``stream_pages``      — file-source readStream with the SAME pinned
  PAGES_SCHEMA as the batch scan (schema drift fails at the boundary);
* ``dedup_pages_streaming`` — watermark + dropDuplicates on url: exactly-
  once page processing across micro-batches within the lateness bound;
* ``stream_extract_offers`` — the batch extraction stage verbatim
  (map-only: pandas-UDF field parse + byte-identical cleaners), legal on a
  stream because it has no wide operator;
* ``crawl_stats_stream``  — windowed per-language page counts with an
  event-time watermark (the late-data pattern for crawl monitoring);
* ``run_ingest``          — writeStream → parquet offers table with a
  checkpoint; ``available_now=True`` drains the current backlog and stops,
  which is the batch↔streaming bridge: the SAME code serves continuous
  tail-f ingest on a cluster and incremental catch-up runs locally.

Scale notes: the stream is map-only up to the sink (no shuffle), state is
bounded by the watermark (url-dedup state evicts at warc_ts horizon), and
the parquet sink commits per micro-batch through Spark's streaming commit
log — resumable from the checkpoint like StageCatalog's manifest, but
managed by the engine.

Custom stateful operators beyond watermark dedup live in
``streaming.stateful`` (applyInPandasWithState): ``dedup_ids_stateful`` is
the cross-crawl global exact-dedup whose state outlives any watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import extract_offers
from ..sources.readers import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental pages scan (parquet file source, pinned schema).

    ``max_files_per_trigger`` bounds micro-batch size — backpressure for
    catch-up runs over a large landed backlog.
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def dedup_pages_streaming(pages: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """First-crawl-wins url dedup across micro-batches, bounded state.

    ``dropDuplicatesWithinWatermark`` is the operator whose per-url state
    actually EVICTS at the event-time horizon (plain ``dropDuplicates`` on
    a subset without the event-time column keeps state forever — unbounded
    at crawl scale), so state is bounded by crawl rate × lateness, not by
    corpus size. Semantics: the first arrival of a url wins; re-crawls
    inside the lateness window are dropped; a re-crawl arriving after the
    window is NEW and flows through (the batch pipeline's optional dedup
    keeps the LATEST warc_ts instead — callers wanting batch parity
    re-dedup the offer table at compaction time).
    """
    return pages.withWatermark("warc_ts", lateness).dropDuplicatesWithinWatermark(
        ["url"]
    )


def stream_extract_offers(pages: DataFrame, lang: str = "en") -> DataFrame:
    """The batch extraction stage applied to a stream.

    Map-only (field-parse pandas UDF + byte-identical cleaners), therefore
    streaming-legal as-is; cleaned values are identical to the batch path
    per url. ``dedup_latest_crawl`` (a window) is the batch-only knob —
    use dedup_pages_streaming upstream instead.
    """
    return extract_offers(pages, lang=lang, dedup_latest_crawl=False)


def crawl_stats_stream(
    pages: DataFrame,
    window_duration: str = "1 hour",
    lateness: str = "2 hours",
) -> DataFrame:
    """Per-(event-time-window, lang) page counts with late-data handling.

    The watermark lets the engine finalize and emit a window once no page
    older than (max warc_ts − lateness) can still arrive; later stragglers
    are dropped rather than held as unbounded state.
    """
    from pyspark.sql import functions as F

    return (
        pages.withWatermark("warc_ts", lateness)
        .groupBy(F.window("warc_ts", window_duration), "lang")
        .count()
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "lang",
            "count",
        )
    )


def run_ingest(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    checkpoint_dir: str,
    lang: str = "en",
    dedup_lateness: str | None = "1 hour",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """pages dir → incremental cleaned-offers parquet table.

    Returns the StreamingQuery. ``available_now=True`` processes exactly
    the files present now and stops — an idempotent incremental catch-up
    (rerunning after new files land extracts only the new files, courtesy
    of the checkpoint's file log). ``available_now=False`` runs
    continuously (cluster tail-f mode).
    """
    pages = stream_pages(spark, pages_path, max_files_per_trigger)
    if dedup_lateness is not None:
        pages = dedup_pages_streaming(pages, dedup_lateness)
    offers = stream_extract_offers(pages, lang=lang)
    writer = (
        offers.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
