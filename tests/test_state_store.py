"""VersionedState compaction: bounded per-bucket file counts.

append() lands one file set per batch per touched bucket and hard-link
carryover preserves them all, so an append-only table's bucket grows one
small file per micro-batch forever — O(#batches) open/footer cost on every
bucket-pruned read. compact() bin-packs oversized buckets of the
in-progress version into one file each (Iceberg's bin-packing analog),
row-set identical; resolve_batch_indexed runs compact_all() before every
commit so state file counts stay O(1) across a stream's lifetime.
"""

import os

import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.streaming.state_store import (
    VersionedState,
    bucket_of,
)

SCH = "id long, v long, bucket int"


def _rows(spark, lo, hi, nb):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") * 10).alias("v"),
        bucket_of(F.col("id"), nb).alias("bucket"),
    )


def _bucket_file_counts(state: VersionedState, table: str) -> dict[int, int]:
    vdir = os.path.join(state.root, f"v{state.current_version()}", table)
    out = {}
    for name in os.listdir(vdir):
        if not name.startswith("bucket="):
            continue
        out[int(name.split("=", 1)[1])] = sum(
            1
            for f in os.listdir(os.path.join(vdir, name))
            if not f.startswith(("_", "."))
        )
    return out


def test_compact_bounds_files_and_preserves_rows(spark, tmp_path):
    nb = 4
    state = VersionedState(spark, str(tmp_path / "st"), n_buckets=nb)
    # 10 append-only batches, NO compaction: files accumulate per bucket
    for i in range(10):
        state.begin()
        state.append("t", _rows(spark, i * 8, (i + 1) * 8, nb))
        state.commit(batch_id=i)
    before = _bucket_file_counts(state, "t")
    assert max(before.values()) >= 10  # the problem being fixed

    # one more batch WITH compaction
    state.begin()
    state.append("t", _rows(spark, 80, 88, nb))
    compacted = state.compact("t", max_files_per_bucket=3)
    state.commit(batch_id=10)
    assert sorted(compacted) == sorted(before)  # every bucket was oversized
    after = _bucket_file_counts(state, "t")
    assert set(after) == set(before)
    assert max(after.values()) == 1  # bin-packed to one file per bucket

    got = sorted(
        map(tuple, state.read("t", SCH).select("id", "v").collect())
    )
    assert got == [(i, i * 10) for i in range(88)]


def test_compact_skips_small_buckets_and_keeps_links(spark, tmp_path):
    nb = 2
    state = VersionedState(spark, str(tmp_path / "st"), n_buckets=nb)
    state.begin()
    state.append("t", _rows(spark, 0, 6, nb))
    state.commit(batch_id=0)
    state.begin()
    state.carry("t")
    assert state.compact("t", max_files_per_bucket=8) == []  # under bound
    state.commit(batch_id=1)
    got = sorted(map(tuple, state.read("t", SCH).select("id").collect()))
    assert got == [(i,) for i in range(6)]


def test_compact_all_via_resolve_batch_indexed(spark, tmp_path):
    """Integration: many tiny indexed batches with an aggressive compaction
    bound keep every state bucket's file count O(1), and the pinned
    batch-equivalence invariant still holds."""
    from productbert_intermediate_spark.operators import blocking as B
    from productbert_intermediate_spark.streaming.incremental_er import (
        read_match_edges_indexed,
        resolve_batch_indexed,
    )

    wd = str(tmp_path / "wd")
    schema = (
        "id long, cluster_id long, category string, title string,"
        " description string, brand string, price string,"
        " specTableContent string"
    )

    def batch(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id",
            "cast(null as long) as cluster_id",
            "concat('cat', floor(id / 2) % 3) as category",
            "concat('item pair', cast(floor(id / 2) as string),"
            " ' common', cast(id % 5 as string)) as title",
            "cast(null as string) as description",
            "cast(null as string) as brand",
            "cast(null as string) as price",
            "cast(null as string) as specTableContent",
        ).withColumn("id", F.col("id").cast("long"))

    for i in range(8):
        resolve_batch_indexed(
            spark,
            batch(i * 12, (i + 1) * 12),
            wd,
            batch_id=i,
            compact_max_files=2,
        )

    state = VersionedState(spark, os.path.join(wd, "index"), 16)
    vdir = os.path.join(state.root, f"v{state.current_version()}")
    worst = 0
    for t in os.listdir(vdir):
        tdir = os.path.join(vdir, t)
        if not os.path.isdir(tdir):
            continue
        for name in os.listdir(tdir):
            if name.startswith("bucket="):
                n = sum(
                    1
                    for f in os.listdir(os.path.join(tdir, name))
                    if not f.startswith(("_", "."))
                )
                worst = max(worst, n)
    # every bucket was re-packed whenever it crossed 2 files; with one
    # append per batch it can be at most 3 deep at commit time
    assert 0 < worst <= 3, worst

    offers_all = spark.read.parquet(f"{wd}/offers")
    ref = sorted(
        map(tuple, B.block_offers(offers_all).select("id_l", "id_r").collect())
    )
    got = sorted(
        map(
            tuple,
            read_match_edges_indexed(spark, wd)
            .select("id_l", "id_r")
            .collect(),
        )
    )
    assert len(ref) > 0
    assert got == ref
