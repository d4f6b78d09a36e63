"""Stage checkpoint catalog: resumable stage tables + manifest lineage.

Plays the role the reference's per-stage pickle files play
(/root/reference/src/processing/preprocess/preprocess_corpus.py:31,47 — every
stage writes its whole DataFrame to disk and the next stage reads it back),
upgraded to the north rule's requirements: columnar stage tables, a manifest
with per-partition lineage + metrics, and existence checks that make reruns
resume after the last complete stage.

The API is deliberately shaped like an Iceberg catalog
(``write``/``read``/``exists`` ≈ ``writeTo(...).createOrReplace()`` /
``read.format("iceberg")``): this sandbox has no Iceberg runtime jar, so
tables are parquet directories whose atomicity comes from Spark's
``_SUCCESS`` marker plus the manifest commit written strictly after the
data. On a cluster with Iceberg configured, swap the two marked methods.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageCatalog:
    """Parquet-backed stage tables + `_manifest.jsonl` lineage log."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -------------------------------------------------------------- paths

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.jsonl")

    # ------------------------------------------------------------ manifest

    def manifest_entries(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def latest_entry(self, name: str) -> dict | None:
        entries = [e for e in self.manifest_entries() if e["stage"] == name]
        return entries[-1] if entries else None

    def _params_token_path(self, name: str) -> str:
        return os.path.join(self.path(name), "_PARAMS")

    def exists(self, name: str, params_key: str | None = None) -> bool:
        """Stage complete: _SUCCESS marker + manifest entry (+ params match).

        The params check consults BOTH the manifest entry and the `_PARAMS`
        token written inside the stage directory after the data commit: the
        manifest alone cannot identify which data it describes — a crash
        between a rewrite's parquet commit and its manifest append leaves
        NEW data under the OLD manifest entry, and resuming from the
        manifest would serve wrong-params data as a valid checkpoint.
        """
        if not os.path.exists(os.path.join(self.path(name), "_SUCCESS")):
            return False
        entry = self.latest_entry(name)
        if entry is None:
            return False
        if params_key is not None:
            if entry.get("params_key") != params_key:
                return False
            token_path = self._params_token_path(name)
            if not os.path.exists(token_path):
                return False
            with open(token_path) as f:
                if json.load(f).get("params_key") != params_key:
                    return False
        return True

    # ----------------------------------------------------------- write/read

    def write(
        self,
        name: str,
        df: DataFrame,
        params_key: str | None = None,
        partition_by: list[str] | None = None,
        extra_after=None,
    ) -> dict:
        """Checkpoint a stage table; record per-partition lineage + metrics.

        Iceberg equivalent: df.writeTo(f"cat.db.{name}").createOrReplace().
        """
        target = self.path(name)
        start = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        wall = time.time() - start
        entry = self._lineage_entry(name, wall, params_key)
        # extra_after: zero-arg callable evaluated AFTER the data commit but
        # before the manifest append — the hook for metrics that only exist
        # once the write job has run (e.g. observe()-harvested counters).
        # Keys never override the lineage fields above.
        if extra_after is not None:
            entry = {**(extra_after() or {}), **entry}
        # commit order: data (_SUCCESS) → _PARAMS token → manifest append.
        # A crash between any two leaves exists() False for every key (the
        # token and manifest must BOTH match), so a later run rebuilds
        # instead of resuming from mismatched data.
        with open(self._params_token_path(name), "w") as f:
            json.dump({"params_key": params_key}, f)
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        return entry

    def _lineage_entry(
        self, name: str, wall: float, params_key: str | None
    ) -> dict:
        """Per-file row counts + order-insensitive checksums for a just-
        committed stage directory — the manifest's lineage record."""
        import re as _re

        written = self.spark.read.parquet(self.path(name))
        # lineage key = path RELATIVE to the table root (partition dirs
        # kept): partitioned writes give files in different partition
        # directories identical basenames (same task + job UUID), so a
        # basename key would merge distinct physical files
        rel_file = F.regexp_replace(
            F.input_file_name(), r".*/" + _re.escape(name) + "/", ""
        )
        per_file = (
            written.groupBy(rel_file.alias("file"))
            .agg(
                F.count("*").alias("rows"),
                F.bit_xor(F.xxhash64(*written.columns)).alias("checksum"),
            )
            .collect()
        )
        rows = sum(int(r["rows"]) for r in per_file)
        checksum = 0
        for r in per_file:
            checksum ^= int(r["checksum"] or 0)
        return {
            "stage": name,
            "params_key": params_key,
            "rows": rows,
            "num_files": len(per_file),
            "checksum": checksum,
            "partitions": [
                {
                    "file": r["file"],
                    "rows": int(r["rows"]),
                    "checksum": int(r["checksum"] or 0),
                }
                for r in sorted(per_file, key=lambda r: r["file"])
            ],
            "wall_sec": round(wall, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }

    def read(self, name: str) -> DataFrame:
        """Iceberg equivalent: spark.read.format('iceberg').load(...)."""
        return self.spark.read.parquet(self.path(name))

    # ------------------------------------------------------- bucketed tables

    def _table_name(self, name: str) -> str:
        import hashlib
        import re as _re

        # table names are SESSION-global but catalogs are per-workdir: two
        # StageCatalogs in one session (e.g. two pipeline runs in tests, or
        # a backfill next to production) must not clobber each other's
        # bucket registration — suffix a digest of the catalog root
        root_tag = hashlib.sha256(
            os.path.abspath(self.root).encode()
        ).hexdigest()[:10]
        return (
            "stage_" + _re.sub(r"[^A-Za-z0-9_]", "_", name) + "_" + root_tag
        )

    def write_bucketed(
        self,
        name: str,
        df: DataFrame,
        bucket_cols: list[str],
        n_buckets: int,
        sort_cols: list[str] | None = None,
        params_key: str | None = None,
        extra_after=None,
    ) -> dict:
        """Checkpoint a stage table hash-bucketed on ``bucket_cols``.

        Why this exists: the 100 TB pipeline re-reads the offers checkpoint
        in every downstream stage and joins it on ``id`` (hydration ×2,
        clustering, training-set builds). A plain parquet checkpoint makes
        EVERY such join shuffle the full offers table again; a bucketed
        checkpoint is already hash-partitioned on the join key at rest, so
        Spark plans the bucketed side with NO exchange — the dominant
        repeated shuffle of the pipeline becomes a one-time write cost
        (demonstrated by a plan-shape test: the bucketed side of an id join
        has zero Exchange operators above its scan).

        Mechanics: bucket metadata lives in the SESSION catalog
        (``saveAsTable`` with an explicit ``path`` under the catalog root —
        an external table, so the data stays with the other checkpoints).
        Parquet files themselves do not carry bucketing metadata, so a NEW
        session must call ``read_bucketed`` (which re-registers the table
        from the manifest entry) before the no-shuffle property returns;
        plain ``read()`` still works and simply degrades to a normal scan.
        On a real cluster an Iceberg/HMS catalog persists the bucket spec —
        this is the documented swap point, same as write()/read().

        Iceberg equivalent: ``df.writeTo(t).partitionedBy(bucket(N, col))``.
        """
        import shutil

        target = self.path(name)
        tbl = self._table_name(name)
        start = time.time()
        # external table: DROP leaves data files — clear both so a rewrite
        # can't mix old bucket files into the new layout
        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(target, ignore_errors=True)
        # repartition onto the bucket key first: without it every write task
        # hash-splits its rows locally and emits up to n_buckets files each
        # (tasks × buckets small files at scale); with it the write is one
        # file per bucket. This is the checkpoint's ONE up-front shuffle —
        # the price that buys shuffle-free downstream joins on the key.
        writer = (
            df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
            .write.mode("overwrite")
            .format("parquet")
            .option("path", target)
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(tbl)
        wall = time.time() - start
        entry = self._lineage_entry(name, wall, params_key)
        if extra_after is not None:
            entry = {**(extra_after() or {}), **entry}
        entry["bucket_cols"] = list(bucket_cols)
        entry["n_buckets"] = int(n_buckets)
        entry["sort_cols"] = list(sort_cols or [])
        entry["table"] = tbl
        with open(self._params_token_path(name), "w") as f:
            json.dump({"params_key": params_key}, f)
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        return entry

    def read_bucketed(self, name: str) -> DataFrame:
        """Read a bucketed stage table WITH its bucket metadata.

        If the table is registered in this session's catalog, read it
        directly; otherwise re-register it from the manifest's recorded
        bucket spec (fresh session resuming from checkpoints) so joins on
        the bucket columns keep the no-shuffle plan.
        """
        tbl = self._table_name(name)
        if not self.spark.catalog.tableExists(tbl):
            entry = self.latest_entry(name)
            if entry is None or "bucket_cols" not in entry:
                raise ValueError(f"no bucketed checkpoint recorded for {name!r}")
            df = self.spark.read.parquet(self.path(name))
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
            )
            bucket_sql = ", ".join(f"`{c}`" for c in entry["bucket_cols"])
            sorted_sql = (
                "SORTED BY (" + ", ".join(f"`{c}`" for c in entry["sort_cols"]) + ")"
                if entry.get("sort_cols")
                else ""
            )
            self.spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING parquet "
                f"CLUSTERED BY ({bucket_sql}) {sorted_sql} "
                f"INTO {entry['n_buckets']} BUCKETS "
                f"LOCATION '{self.path(name)}'"
            )
        return self.spark.table(tbl)

    # ------------------------------------------------------------ CSV reports

    def write_csv_report(
        self, name: str, df: DataFrame, compression: str | None = "gzip"
    ) -> str:
        """Small human/downstream-facing reports as CSV (SURVEY §2.1 S3) —
        the reference's training-set-id and prediction CSVs
        (process_intermediate_training_sets.py:139, test.py:87-93). Reports
        are driver-sized by contract, so one output file is fine; big data
        stays in parquet stage tables.
        """
        target = self.path(f"{name}_csv")
        writer = df.coalesce(1).write.mode("overwrite").option("header", True)
        if compression:
            writer = writer.option("compression", compression)
        writer.csv(target)
        return target

    def read_csv_report(self, name: str) -> DataFrame:
        return self.spark.read.option("header", True).csv(self.path(f"{name}_csv"))

    def write_or_resume(
        self,
        name: str,
        build,
        params_key: str | None = None,
        force: bool = False,
        partition_by: list[str] | None = None,
        extra_after=None,
        bucket_by: tuple[list[str], int] | None = None,
        sort_cols: list[str] | None = None,
    ) -> tuple[DataFrame, bool]:
        """Return (stage DataFrame, resumed_from_checkpoint).

        ``build`` is a zero-arg callable producing the stage DataFrame; it is
        only invoked when the checkpoint is missing/stale/forced (so is
        ``extra_after`` — a resumed stage appends no manifest entry).

        ``bucket_by=(cols, n)`` checkpoints through ``write_bucketed`` and
        resumes through ``read_bucketed`` so the bucket metadata (and the
        shuffle-free join property it buys) survives a resume. A checkpoint
        whose on-disk layout doesn't match the requested spec — plain where
        bucketed was asked, or a different (cols, n) — is treated as STALE
        and rebuilt: silently resuming it would keep correctness but drop
        the no-shuffle plan every downstream join was sized around.
        """
        if not force and self.exists(name, params_key):
            entry = self.latest_entry(name) or {}
            have = (
                (entry.get("bucket_cols"), entry.get("n_buckets"))
                if "bucket_cols" in entry
                else None
            )
            want = (list(bucket_by[0]), int(bucket_by[1])) if bucket_by else None
            if have == want:
                if bucket_by:
                    return self.read_bucketed(name), True
                return self.read(name), True
        if bucket_by:
            self.write_bucketed(
                name,
                build(),
                bucket_cols=bucket_by[0],
                n_buckets=bucket_by[1],
                sort_cols=sort_cols,
                params_key=params_key,
                extra_after=extra_after,
            )
            return self.read_bucketed(name), False
        self.write(
            name, build(), params_key=params_key, partition_by=partition_by,
            extra_after=extra_after,
        )
        return self.read(name), False
