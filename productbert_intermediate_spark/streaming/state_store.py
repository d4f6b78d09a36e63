"""Versioned, bucket-partitioned parquet state for incremental operators.

The O(batch) incremental blocking index (streaming/blocking_index.py) needs
what a table format like Iceberg provides: point-lookups by key without a
corpus scan, partial rewrites, and atomic snapshot commits. This sandbox has
parquet and a local filesystem, so this module builds the minimal honest
analog:

* every table is directory-partitioned by a fixed hash BUCKET of its access
  key (``bucket=K/`` subdirs). Readers filter ``bucket IN (...)`` — Spark
  partition-prunes, so a lookup touching few buckets reads few files;
* every micro-batch writes a fresh VERSION directory ``v{n}/``; tables (or
  buckets) the batch didn't touch are carried over by hard-linking the
  previous version's parquet files (O(#files) metadata ops, zero data copy);
* the commit is one atomic rename of a CURRENT pointer file. A crash
  mid-batch leaves the previous version fully intact; foreachBatch replays
  the batch against it. This is exactly the seam where Iceberg's snapshot
  commit slots in (same contract as sources/catalog.py's checkpoints).

Scale notes: hash buckets stand in for Iceberg's file pruning — lookup cost
is O(rows-per-touched-bucket), so ``n_buckets`` should scale with expected
state size (a config, like shuffle partitions). Hard links require the
version dirs to share a filesystem (they do: one workdir); on object
storage the carryover becomes manifest reuse, which Iceberg gives for free.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CURRENT = "CURRENT"


def bucket_of(col, n_buckets: int):
    """Deterministic bucket expression (non-negative, matches pmod reads)."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


class VersionedState:
    """A directory of versioned, bucket-partitioned parquet tables.

    Layout::

        root/
          CURRENT              # json: {"version": n, "batch_id": b}
          v3/<table>/bucket=K/part-*.parquet
          v4/...

    One ``begin() → write/carry per table → commit(batch_id)`` cycle per
    micro-batch. ``commit`` is a tmp-write + atomic rename of CURRENT;
    versions older than ``keep_versions`` are pruned after commit.
    """

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16,
                 keep_versions: int = 2) -> None:
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.keep_versions = keep_versions
        os.makedirs(root, exist_ok=True)
        self._next: int | None = None

    # -------------------------------------------------------- versioning

    def _pointer(self) -> dict | None:
        path = os.path.join(self.root, CURRENT)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def current_version(self) -> int | None:
        ptr = self._pointer()
        return None if ptr is None else int(ptr["version"])

    def last_batch_id(self) -> int | None:
        ptr = self._pointer()
        return None if ptr is None or ptr.get("batch_id") is None else int(
            ptr["batch_id"]
        )

    def last_retract_batch_id(self) -> int | None:
        """Replay guard for the RETRACTION stream, namespaced apart from the
        insert stream's ``batch_id``: the two feeds run off separate
        streaming checkpoints, so their foreachBatch counters both start at
        0 and would collide in one pointer field — a crash-replay of insert
        batch N must not be skipped because retraction batch N committed."""
        ptr = self._pointer()
        return (
            None
            if ptr is None or ptr.get("retract_batch_id") is None
            else int(ptr["retract_batch_id"])
        )

    def in_progress_version(self) -> int:
        """The version number a ``begin()``-ed transaction will commit as —
        the state's COMMIT SEQUENCE: unique and monotone across every
        commit (stream batches and out-of-band retractions alike), and
        stable under crash replay (an uncommitted attempt's replay re-begins
        the same number). The changelog feed keys its partitions by this."""
        assert self._next is not None, "in_progress_version() without begin()"
        return self._next

    def begin(self) -> None:
        cur = self.current_version()
        self._next = 0 if cur is None else cur + 1
        nxt = os.path.join(self.root, f"v{self._next}")
        # a crashed previous attempt may have left a partial next dir
        shutil.rmtree(nxt, ignore_errors=True)
        os.makedirs(nxt)

    def commit(
        self,
        batch_id: int | None = None,
        retract_batch_id: int | None = None,
    ) -> None:
        assert self._next is not None, "commit() without begin()"
        # a commit sets at most one stream's replay guard; the other (and
        # any out-of-band commit's None) carries forward, so e.g. a user
        # retraction between stream micro-batches never erases the insert
        # stream's guard — a foreachBatch replay still short-circuits
        if batch_id is None:
            batch_id = self.last_batch_id()
        if retract_batch_id is None:
            retract_batch_id = self.last_retract_batch_id()
        tmp = os.path.join(self.root, CURRENT + ".tmp")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": self._next,
                    "batch_id": batch_id,
                    "retract_batch_id": retract_batch_id,
                },
                f,
            )
        os.replace(tmp, os.path.join(self.root, CURRENT))  # atomic
        committed = self._next
        self._next = None
        # prune old versions (the pointer no longer references them)
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                v = int(name[1:])
                if v <= committed - self.keep_versions:
                    shutil.rmtree(
                        os.path.join(self.root, name), ignore_errors=True
                    )

    # ------------------------------------------------------------ tables

    def _cur_table(self, table: str) -> str | None:
        cur = self.current_version()
        if cur is None:
            return None
        path = os.path.join(self.root, f"v{cur}", table)
        return path if os.path.isdir(path) else None

    def _next_table(self, table: str) -> str:
        assert self._next is not None, "write without begin()"
        return os.path.join(self.root, f"v{self._next}", table)

    def read(self, table: str, schema: str) -> DataFrame:
        """Current contents (all buckets); empty DF with ``schema`` if absent.

        ``schema`` must include the ``bucket int`` column.
        """
        path = self._cur_table(table)
        if path is None or not any(
            n.startswith("bucket=") for n in os.listdir(path)
        ):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(path)

    def lookup(self, table: str, schema: str, key_col: str, keys: DataFrame,
               key_expr=None) -> DataFrame:
        """Rows of ``table`` whose ``key_col`` appears in ``keys`` (a
        single-column DF named ``key_col``) — bucket-pruned: only partitions
        that can contain the requested keys are read, then a broadcast
        semi-join filters exactly. ``key_expr`` overrides the hashed
        expression (default: the key column itself)."""
        df = self.read(table, schema)
        expr = key_expr if key_expr is not None else F.col(key_col)
        wanted = [
            r["b"]
            for r in keys.select(
                bucket_of(expr, self.n_buckets).alias("b")
            ).distinct().collect()
        ]
        if not wanted:
            return df.limit(0)
        pruned = df.where(F.col("bucket").isin(wanted))
        return pruned.join(F.broadcast(keys.distinct()), key_col, "left_semi")

    # ------------------------------------------------------------ writes

    def _link_files(self, src: str, dst: str) -> None:
        for dirpath, _dirs, files in os.walk(src):
            rel = os.path.relpath(dirpath, src)
            out = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(out, exist_ok=True)
            for fname in files:
                if fname.startswith(("_", ".")):
                    continue  # _SUCCESS / checksums — not data
                os.link(
                    os.path.join(dirpath, fname), os.path.join(out, fname)
                )

    def carry(self, table: str) -> None:
        """Hard-link the whole previous table into the next version."""
        prev = self._cur_table(table)
        nxt = self._next_table(table)
        os.makedirs(nxt, exist_ok=True)
        if prev is not None:
            self._link_files(prev, nxt)

    def append(self, table: str, rows: DataFrame) -> None:
        """Append-only table: carry previous files + write new rows into
        their buckets. ``rows`` must already carry the ``bucket`` column."""
        self.carry(table)
        nxt = self._next_table(table)
        rows.write.mode("append").partitionBy("bucket").parquet(nxt)

    def append_rows_next(self, table: str, rows: DataFrame) -> None:
        """Append rows into the IN-PROGRESS version of a table that was
        already carried/rewritten this version (no second carry). Appends
        never remove rows, so landing extra files in any bucket — touched
        or hard-linked — is safe."""
        rows.write.mode("append").partitionBy("bucket").parquet(
            self._next_table(table)
        )

    def rewrite_buckets(self, table: str, schema: str,
                        new_rows: DataFrame, touched: list[int]) -> None:
        """Replace the ``touched`` buckets' contents with ``new_rows``
        (which must contain ONLY rows for those buckets, with the ``bucket``
        column set); every other bucket is hard-linked from the previous
        version."""
        prev = self._cur_table(table)
        nxt = self._next_table(table)
        os.makedirs(nxt, exist_ok=True)
        touched_set = {int(t) for t in touched}
        if prev is not None:
            for name in os.listdir(prev):
                if not name.startswith("bucket="):
                    continue
                if int(name.split("=", 1)[1]) in touched_set:
                    continue
                self._link_files(
                    os.path.join(prev, name), os.path.join(nxt, name)
                )
        if touched_set:
            new_rows.where(
                F.col("bucket").isin(list(touched_set))
            ).write.mode("append").partitionBy("bucket").parquet(nxt)

    def compact(self, table: str, max_files_per_bucket: int = 8) -> list[int]:
        """Bin-pack oversized buckets of the IN-PROGRESS version of a table.

        ``append()`` adds one file set per batch per touched bucket, and
        hard-link carryover preserves them all — after B batches an
        append-only table's bucket holds O(B) small files, and every
        bucket-pruned read pays O(files) open/footer costs. This rewrites
        each bucket whose file count exceeds ``max_files_per_bucket`` into
        ONE file (row-set identical), the analog of Iceberg's bin-packing
        compaction; untouched buckets keep their hard links. Call between
        the table's writes and ``commit()`` — a crash mid-compaction only
        loses the in-progress version, which ``begin()`` rebuilds on replay.
        Returns the compacted bucket ids."""
        nxt = self._next_table(table)
        if not os.path.isdir(nxt):
            return []
        over = []
        for name in os.listdir(nxt):
            if not name.startswith("bucket="):
                continue
            n_files = sum(
                1
                for f in os.listdir(os.path.join(nxt, name))
                if not f.startswith(("_", "."))
            )
            if n_files > max_files_per_bucket:
                over.append(int(name.split("=", 1)[1]))
        if not over:
            return []
        # one shuffle partition per oversized bucket → exactly one output
        # file per bucket; only the oversized buckets are read or written
        packed = (
            self.spark.read.parquet(nxt)
            .where(F.col("bucket").isin(over))
            .repartition(len(over), "bucket")
        )
        tmp = nxt + ".compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        packed.write.partitionBy("bucket").parquet(tmp)
        for b in over:
            dst = os.path.join(nxt, f"bucket={b}")
            src = os.path.join(tmp, f"bucket={b}")
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        return over

    def compact_all(self, max_files_per_bucket: int = 8) -> dict:
        """Run :meth:`compact` over every table of the in-progress version;
        returns {table: [compacted buckets]} for the tables that needed it."""
        assert self._next is not None, "compact_all without begin()"
        vdir = os.path.join(self.root, f"v{self._next}")
        out = {}
        for t in sorted(os.listdir(vdir)):
            if os.path.isdir(os.path.join(vdir, t)):
                got = self.compact(t, max_files_per_bucket)
                if got:
                    out[t] = got
        return out

    def read_next(self, table: str, schema: str) -> DataFrame:
        """Read a table already written in the IN-PROGRESS version (for
        steps that consume an earlier step's output within one batch)."""
        path = self._next_table(table)
        if not os.path.isdir(path) or not any(
            n.startswith("bucket=") for n in os.listdir(path)
        ):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(path)
