"""Structured-Streaming ingest: stream≡batch extraction, incremental
catch-up via the checkpoint, watermark url-dedup, windowed crawl stats."""

import glob
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.operators.extract import extract_offers
from productbert_intermediate_spark.sources.readers import read_pages
from productbert_intermediate_spark.streaming.ingest import (
    crawl_stats_stream,
    dedup_pages_streaming,
    run_ingest,
    stream_extract_offers,
    stream_pages,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def pages_dir(fixtures_dir, tmp_path):
    """Fixture pages split into a landing directory of several files (the
    shape a crawl drop has), so file-source incremental semantics are real."""
    src = pd.read_parquet(f"{fixtures_dir}/pages.parquet")
    d = str(tmp_path / "landing")
    os.makedirs(d)
    n = len(src)
    for i in range(3):
        part = src.iloc[i * n // 3 : (i + 1) * n // 3]
        part.to_parquet(f"{d}/part-{i}.parquet", index=False)
    return d


def test_streamed_extraction_equals_batch(spark, pages_dir, tmp_path):
    out = str(tmp_path / "offers")
    ckpt = str(tmp_path / "ckpt")
    q = run_ingest(spark, pages_dir, out, ckpt, dedup_lateness=None)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    want = extract_offers(read_pages(spark, pages_dir))
    assert _rows(got) == _rows(want)


def test_incremental_catchup_processes_only_new_files(spark, pages_dir, tmp_path):
    """availableNow + checkpoint = idempotent incremental runs: a second
    invocation after one new file lands appends exactly that file's offers."""
    out = str(tmp_path / "offers")
    ckpt = str(tmp_path / "ckpt")
    run_ingest(spark, pages_dir, out, ckpt, dedup_lateness=None).awaitTermination(120)
    n_first = spark.read.parquet(out).count()

    # land one more file: a copy of part-0 with shifted urls (all-new pages)
    extra = pd.read_parquet(f"{pages_dir}/part-0.parquet").copy()
    extra["url"] = extra["url"] + "?recrawl=1"
    extra.to_parquet(f"{pages_dir}/part-3.parquet", index=False)

    run_ingest(spark, pages_dir, out, ckpt, dedup_lateness=None).awaitTermination(120)
    got = spark.read.parquet(out)
    n_extra = extract_offers(
        spark.read.parquet(f"{pages_dir}/part-3.parquet")
    ).count()
    assert got.count() == n_first + n_extra
    # rerun with nothing new → no change
    run_ingest(spark, pages_dir, out, ckpt, dedup_lateness=None).awaitTermination(120)
    assert spark.read.parquet(out).count() == n_first + n_extra


def test_streaming_url_dedup_drops_recrawls(spark, pages_dir, tmp_path):
    """A duplicate-url file inside the watermark window contributes zero new
    rows when dedup is on (first crawl wins)."""
    dup_dir = str(tmp_path / "landing_dup")
    shutil.copytree(pages_dir, dup_dir)
    shutil.copy(f"{dup_dir}/part-0.parquet", f"{dup_dir}/part-9.parquet")

    out = str(tmp_path / "offers_dedup")
    ckpt = str(tmp_path / "ckpt_dedup")
    run_ingest(spark, dup_dir, out, ckpt, dedup_lateness="365 days").awaitTermination(180)

    want = extract_offers(read_pages(spark, pages_dir))  # without the dup file
    got = spark.read.parquet(out)
    assert got.count() == want.count()
    assert _rows(got.select("url")) == _rows(want.select("url"))


def test_windowed_crawl_stats_match_batch(spark, pages_dir, tmp_path):
    """Stream windowed counts (availableNow, watermark) == batch window agg."""
    stats = crawl_stats_stream(
        stream_pages(spark, pages_dir), window_duration="30 minutes",
        lateness="1 hour",
    )
    out = str(tmp_path / "stats_sink")
    q = (
        stats.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "stats_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)

    want = (
        read_pages(spark, pages_dir)
        .groupBy(F.window("warc_ts", "30 minutes"), "lang")
        .count()
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "lang",
            "count",
        )
    )
    # append mode emits only watermark-finalized windows: emitted rows must
    # match batch EXACTLY, and everything older than the final watermark
    # horizon (max event time − lateness, minus one trigger's watermark lag)
    # MUST have been emitted — the open tail may be withheld.
    got_rows, want_rows = _rows(got), _rows(want)
    max_ts = read_pages(spark, pages_dir).agg(F.max("warc_ts")).collect()[0][0]
    horizon = max_ts - pd.Timedelta("1 hour") - pd.Timedelta("30 minutes")
    must = {r for r in want_rows if r[1] <= horizon}
    assert must <= set(got_rows) <= set(want_rows)
    assert len(got_rows) > 0


def test_stateful_global_dedup_across_batches_and_restarts(spark, pages_dir, tmp_path):
    """applyInPandasWithState exact-dedup: first arrival per id wins across
    micro-batches AND across query restarts (state rides the checkpoint),
    with no event-time horizon."""
    from productbert_intermediate_spark.streaming.stateful import dedup_ids_stateful

    out = str(tmp_path / "uniq")
    ckpt = str(tmp_path / "uniq_ckpt")

    def run_once():
        offers = stream_extract_offers(stream_pages(spark, pages_dir))
        q = (
            dedup_ids_stateful(offers, id_col="id", n_shards=8)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    batch = extract_offers(read_pages(spark, pages_dir)).where("id is not null")
    want_ids = {r["id"] for r in batch.select("id").distinct().collect()}
    got = spark.read.parquet(out)
    got_ids = [r["id"] for r in got.select("id").collect()]
    assert len(got_ids) == len(set(got_ids)) == len(want_ids)
    assert set(got_ids) == want_ids

    # land a file that re-offers ONLY already-seen ids → restart emits nothing
    dup = pd.read_parquet(f"{pages_dir}/part-0.parquet").copy()
    dup["url"] = dup["url"] + "?again=1"
    dup.to_parquet(f"{pages_dir}/part-7.parquet", index=False)
    run_once()
    assert spark.read.parquet(out).count() == len(want_ids)


def test_url_dedup_state_evicts_at_watermark_horizon(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics: a re-crawl INSIDE the
    lateness window is dropped; once the watermark passes first_seen +
    lateness the state evicts, and a much-later re-crawl flows through.
    (Plain dropDuplicates on url would hold state forever and drop both.)"""
    import time as _time

    base = pd.Timestamp("2021-01-01T00:00:00")
    land = str(tmp_path / "land")
    os.makedirs(land)

    def page(url, ts):
        return {
            "url": url, "warc_ts": ts.to_datetime64(),
            "html": b"<html/>", "text": f"<<sku>>1<</sku>><<title>>\"t\"@en <</title>>",
            "lang": "en",
        }

    # batch a: url X at T0 (+ a same-window dup of X that must drop)
    pd.DataFrame([page("X", base), page("X", base + pd.Timedelta("5 minutes"))]).astype(
        {"warc_ts": "datetime64[us]"}
    ).to_parquet(f"{land}/a.parquet", index=False)
    _time.sleep(1.1)
    # batch b: unrelated url advancing the watermark far past X's horizon
    pd.DataFrame([page("Y", base + pd.Timedelta("10 days"))]).astype(
        {"warc_ts": "datetime64[us]"}
    ).to_parquet(f"{land}/b.parquet", index=False)
    _time.sleep(1.1)
    # batch c: filler — state eviction runs at batch COMMIT, so X's entry
    # clears at the end of the first batch processed under the advanced
    # watermark, one batch before the re-crawl arrives
    pd.DataFrame([page("Z", base + pd.Timedelta("10 days"))]).astype(
        {"warc_ts": "datetime64[us]"}
    ).to_parquet(f"{land}/c.parquet", index=False)
    _time.sleep(1.1)
    # batch d: X re-crawled 10 days later — state evicted → must be emitted
    pd.DataFrame([page("X", base + pd.Timedelta("10 days 1 hour"))]).astype(
        {"warc_ts": "datetime64[us]"}
    ).to_parquet(f"{land}/d.parquet", index=False)

    deduped = dedup_pages_streaming(
        stream_pages(spark, land, max_files_per_trigger=1), lateness="1 hour"
    )
    out = str(tmp_path / "sink")
    q = (
        deduped.select("url", "warc_ts")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["url"], r["warc_ts"]) for r in spark.read.parquet(out).collect()
    )
    urls = [u for u, _ in got]
    # first X, late-recrawl X, Y, Z — the same-window dup X is gone
    assert urls == ["X", "X", "Y", "Z"], got


def test_stateful_dedup_state_growth_monitor(spark, pages_dir, tmp_path):
    """state_size_col surfaces state GROWTH for an operator whose state
    never evicts by design: every emitted row carries its shard's
    post-batch seen-id count, the per-shard max equals that shard's true
    distinct-id count, and the per-batch peak lands in
    StreamingQueryProgress.observedMetrics across micro-batches — the
    page-before-it-kills-the-cluster signal VERDICT r3 asked for."""
    from productbert_intermediate_spark.streaming.stateful import dedup_ids_stateful

    n_shards = 8
    out = str(tmp_path / "uniq")
    offers = stream_extract_offers(
        stream_pages(spark, pages_dir, max_files_per_trigger=1)
    )
    q = (
        dedup_ids_stateful(
            offers, id_col="id", n_shards=n_shards, state_size_col="_seen_ids"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    shard = F.pmod(F.xxhash64(F.col("id")), F.lit(n_shards))
    # per-shard: the max reported count == the shard's distinct-id count
    # (the last row into a shard's seen-set reports its full size)
    per_shard = (
        got.groupBy(shard.alias("s"))
        .agg(
            F.max("_seen_ids").alias("reported"),
            F.countDistinct("id").alias("actual"),
        )
        .collect()
    )
    assert len(per_shard) > 0
    for r in per_shard:
        assert r["reported"] == r["actual"], r

    # observedMetrics: each micro-batch that emitted rows published a
    # dedup_ids_state row; the peak over batches == the true peak shard
    # size, and emitted_rows sums to the distinct-id total
    obs = [
        p["observedMetrics"]["dedup_ids_state"]
        for p in (q.recentProgress or [])
        if p.get("observedMetrics", {}).get("dedup_ids_state")
        and p["observedMetrics"]["dedup_ids_state"]["emitted_rows"]
    ]
    assert len(obs) >= 2, "expected metrics from multiple micro-batches"
    assert max(m["max_shard_seen_ids"] for m in obs) == max(
        r["actual"] for r in per_shard
    )
    assert sum(m["emitted_rows"] for m in obs) == got.count()


def test_stateful_dedup_rejects_non_integral_id(spark, pages_dir):
    from productbert_intermediate_spark.streaming.stateful import dedup_ids_stateful

    with pytest.raises(TypeError, match="integral id column"):
        dedup_ids_stateful(stream_pages(spark, pages_dir), id_col="url")


def test_stream_pages_schema_is_pinned(spark, pages_dir):
    s = stream_pages(spark, pages_dir)
    assert s.isStreaming
    assert [f.name for f in s.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]


def test_state_warn_threshold_fires_on_over_limit_shard(spark, pages_dir, tmp_path):
    """The growth monitor is actionable: a shard crossing state_warn_threshold
    surfaces shards_crossed_threshold > 0 in observedMetrics (exactly once per
    shard, ever — growth is monotone), with the threshold self-described in
    the same metrics row; output rows are unchanged by the monitoring."""
    from productbert_intermediate_spark.streaming.stateful import dedup_ids_stateful

    out = str(tmp_path / "uniq")
    offers = stream_extract_offers(
        stream_pages(spark, pages_dir, max_files_per_trigger=1)
    )
    threshold = 3  # tiny on purpose: every shard is a synthetic over-limit one
    n_shards = 4
    q = (
        dedup_ids_stateful(
            offers,
            id_col="id",
            n_shards=n_shards,
            state_warn_threshold=threshold,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    # monitoring columns never leak into the sink schema
    assert "_dedup_state_size" not in got.columns
    assert "_dedup_state_crossed" not in got.columns

    shard = F.pmod(F.xxhash64(F.col("id")), F.lit(n_shards))
    shards_over = (
        got.groupBy(shard.alias("s"))
        .agg(F.countDistinct("id").alias("n"))
        .where(F.col("n") > threshold)
        .count()
    )
    assert shards_over > 0, "fixture must actually overflow the threshold"

    obs = [
        p["observedMetrics"]["dedup_ids_state"]
        for p in (q.recentProgress or [])
        if p.get("observedMetrics", {}).get("dedup_ids_state")
    ]
    assert obs, "expected observed metrics rows"
    crossed_total = sum(m["shards_crossed_threshold"] or 0 for m in obs)
    # each over-limit shard crossed exactly once across all micro-batches
    assert crossed_total == shards_over
    assert all(m["state_warn_threshold"] == threshold for m in obs)


def test_stateful_dedup_on_rocksdb_state_store(spark, pages_dir, tmp_path):
    """rocksdb_state_store swaps the per-query state store to Spark's
    bundled RocksDB provider: same dedup output as the default HDFS-backed
    store, and the query's stateOperators metrics prove RocksDB actually
    backed the state. Skips (loudly) only if this distribution ships no
    RocksDB JNI."""
    from productbert_intermediate_spark.streaming.stateful import (
        dedup_ids_stateful,
        rocksdb_state_store,
    )

    out = str(tmp_path / "uniq")
    offers = stream_extract_offers(stream_pages(spark, pages_dir))
    with rocksdb_state_store(spark):
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            .endswith("RocksDBStateStoreProvider")
        )
        q = (
            dedup_ids_stateful(offers, id_col="id", n_shards=8)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        except Exception as e:  # pragma: no cover - JNI-less distribution
            if "RocksDB" in str(e) or "rocksdb" in str(e):
                pytest.skip(f"RocksDB state store unavailable here: {e}")
            raise
        progresses = list(q.recentProgress or [])
    # conf restored on exit (the SQLConf default is the HDFS-backed store)
    try:
        restored = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    except Exception:
        restored = ""
    assert not restored.endswith("RocksDBStateStoreProvider")

    batch = extract_offers(read_pages(spark, pages_dir)).where("id is not null")
    want_ids = {r["id"] for r in batch.select("id").distinct().collect()}
    got_ids = [r["id"] for r in spark.read.parquet(out).select("id").collect()]
    assert len(got_ids) == len(set(got_ids)) == len(want_ids)
    assert set(got_ids) == want_ids

    # the state operator's custom metrics are RocksDB-specific counters —
    # present only when the provider really is RocksDB
    custom = {}
    for p in progresses:
        for op in p.get("stateOperators", []):
            custom.update(op.get("customMetrics") or {})
    assert any(k.startswith("rocksdb") for k in custom), sorted(custom)[:10]
