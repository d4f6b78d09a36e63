"""Custom stateful streaming operator: global exact-dedup by id.

Watermark ``dropDuplicates`` (ingest.dedup_pages_streaming) evicts its
state at the event-time horizon — correct for re-crawls, but a training
pipeline's "never emit the same id twice, EVER" guarantee needs state that
outlives any watermark. That is exactly the applyInPandasWithState shape:
an explicit per-group state object the operator reads and updates per
micro-batch, checkpointed by the engine and restored on restart.

Design:
* groups are HASH SHARDS of the id (``pmod(xxhash64(id), n_shards)``), not
  the ids themselves — state lookups batch per shard and the shard count
  (not the key count) bounds the number of state rows;
* per-shard state = the sorted array of seen ids. State grows with
  distinct ids per shard — the honest cost of global exact dedup; shard it
  wider (or swap the state store to RocksDB on a cluster) as the id space
  grows. ``state_size_col`` turns that growth observable: each emitted row
  carries its shard's seen-id count and the stream observe()s the
  per-batch max into StreamingQueryProgress.
* first arrival wins, within and across micro-batches AND across query
  restarts (the state rides the checkpoint). Among same-batch duplicates
  the first row in arrival order survives — arrival order inside a
  micro-batch is not deterministic, so exact-survivor determinism needs an
  upstream per-batch pre-dedup with an explicit orderer; the ID SET
  emitted is deterministic regardless.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

_STATE_SCHEMA = StructType([StructField("seen", ArrayType(LongType()))])

#: Spark's bundled RocksDB state store provider — the remedy the growth
#: monitor points at: state spills to local disk instead of living on the
#: JVM heap, so a never-evicting seen-id set stops being an OOM risk.
ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def rocksdb_state_store(
    spark: SparkSession, changelog_checkpointing: bool = True
):
    """Run streaming queries started inside this block on the RocksDB
    state store (per-query conf is read at query START, so set-and-restore
    around the ``.start()`` call is the whole mechanism).

    ``changelog_checkpointing=True`` checkpoints per-batch changelogs
    instead of full RocksDB snapshots — the production setting for large
    state. Restores the previous provider on exit, so a session's other
    queries keep their configured store. If the distribution lacks the
    RocksDB JNI (some minimal builds), the query fails at start — probe
    with a tiny query first or catch StreamingQueryException at the call
    site; this context manager itself never hides the error."""
    conf = spark.conf
    keys = {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_STATE_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": str(
            changelog_checkpointing
        ).lower(),
    }
    prev = {}
    for k, v in keys.items():
        try:
            prev[k] = conf.get(k)
        except Exception:
            prev[k] = None
        conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in prev.items():
            if old is None:
                conf.unset(k)
            else:
                conf.set(k, old)


def dedup_ids_stateful(
    stream: DataFrame,
    id_col: str = "id",
    n_shards: int = 64,
    state_size_col: str | None = None,
    state_warn_threshold: int | None = None,
) -> DataFrame:
    """Emit only the first-ever row per ``id_col`` value, with state that
    never expires (GroupStateTimeout.NoTimeout). NULL ids are dropped —
    they are not an identity. Returns a stream with the input's schema.

    ``state_size_col`` names an extra long column to emit carrying the
    row's shard's post-batch seen-id count — the state-GROWTH monitor for
    an operator whose state never evicts by design. When set, the stream
    also carries an ``observe("dedup_ids_state", max(col), count(*))`` so
    each micro-batch's peak shard state surfaces in
    ``StreamingQueryProgress.observedMetrics`` without reading the sink;
    max(col) × n_shards upper-bounds total state rows, and a shard whose
    count nears executor memory is the page-this-before-it-kills-the-
    cluster signal (resharding wider / RocksDB are the remedies).

    ``state_warn_threshold`` makes that signal ACTIONABLE instead of a
    number someone must watch: the first time any shard's seen-id count
    crosses the threshold, (a) the executor logs a WARNING naming the
    shard and its count, and (b) the micro-batch's observed metrics carry
    ``shards_crossed_threshold`` (shards that crossed in THIS batch —
    growth is monotone, so each shard counts exactly once ever; alert on
    ``> 0``) alongside ``state_warn_threshold`` itself. Pair with
    :func:`rocksdb_state_store` when the alert fires and resharding wider
    is not enough."""
    # same column order the grouped frame carries (original fields, then the
    # appended shard key) so the yielded pandas frames match positionally
    # long-id contract, checked loudly: the state array is array<long> and
    # a silently NULL-casting shard key would both serialize every row into
    # ONE state group and crash int() later
    id_type = stream.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise TypeError(
            f"dedup_ids_stateful requires an integral id column; "
            f"{id_col!r} is {id_type}"
        )
    emit_size = state_size_col is not None or state_warn_threshold is not None
    size_col = state_size_col or "_dedup_state_size"
    over_col = "_dedup_state_crossed"
    warn_th = state_warn_threshold

    out_fields = [*stream.schema.fields, StructField("_shard", LongType(), False)]
    if emit_size:
        out_fields.append(StructField(size_col, LongType(), False))
    if warn_th is not None:
        out_fields.append(StructField(over_col, LongType(), False))
    out_schema = StructType(out_fields)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:  # pragma: no cover - executed by Spark
        (seen_list,) = state.get if state.exists else ([],)
        seen = set(seen_list or [])
        start_n = len(seen)
        flagged = False
        for pdf in pdfs:
            fresh = pdf[pdf[id_col].notna() & ~pdf[id_col].isin(seen)]
            fresh = fresh[~fresh[id_col].duplicated()]
            if len(fresh):
                seen.update(int(v) for v in fresh[id_col])
                if emit_size:
                    # post-update count: every emitted row reports how big
                    # its shard's seen-set is once the row is in it
                    fresh = fresh.assign(**{size_col: len(seen)})
                if warn_th is not None:
                    # the crossing event: this batch took the shard from
                    # <= threshold to > threshold; flag exactly one row so
                    # sum(over_col) counts each shard once, ever
                    over = [0] * len(fresh)
                    if not flagged and start_n <= warn_th < len(seen):
                        over[-1] = 1
                        flagged = True
                        logging.getLogger(__name__).warning(
                            "dedup_ids_stateful: shard %s crossed "
                            "state_warn_threshold (%d seen ids > %d) — "
                            "state never evicts; reshard wider or move to "
                            "the RocksDB state store (rocksdb_state_store)",
                            key,
                            len(seen),
                            warn_th,
                        )
                    fresh = fresh.assign(**{over_col: over})
                yield fresh
        state.update((sorted(seen),))

    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    out = (
        stream.withColumn("_shard", shard)
        .groupBy("_shard")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .drop("_shard")
    )
    if emit_size:
        metrics = [
            F.max(size_col).alias("max_shard_seen_ids"),
            F.count(F.lit(1)).alias("emitted_rows"),
        ]
        if warn_th is not None:
            metrics += [
                F.sum(over_col).alias("shards_crossed_threshold"),
                F.max(F.lit(warn_th)).alias("state_warn_threshold"),
            ]
        out = out.observe("dedup_ids_state", *metrics)
    if warn_th is not None:
        out = out.drop(over_col)
    if state_size_col is None and emit_size:
        out = out.drop(size_col)
    return out
