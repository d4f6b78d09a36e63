"""Retraction/upsert per-batch cost bench over the indexed ER state.

The round-5 lifecycle ops (streaming/incremental_er.resolve_batch_retract /
resolve_batch_upsert) mirror the insert fold's bucket-pruned shape with one
honest asymmetry: deletes are copy-on-write (touched buckets rewrite whole,
Iceberg-COW semantics) where inserts append. This script measures what that
costs: time a fixed-size retraction (and a fixed-size changed-content
upsert) against a corpus at N and at GROWTH*N offers, report both plus the
ratio, and checksum the post-retraction candidate set against a
from-scratch re-block of the SURVIVOR corpus — a bench row that drifted
from the maintained-state-equals-from-scratch invariant would be
meaningless.

Same deterministic generator as scripts/incremental_er_bench.py (i pairs
with i^1 via a shared rare token; shared category so df pruning keeps the
pairs). Retraction batches take one member of each pair, so every
retraction breaks candidate pairs AND re-validates nothing — the pure
delete path; the upsert batch changes titles, so it exercises
retract+evict+re-score.

Usage: python scripts/retraction_bench.py [seed_n] [batch_n] [cores] [growth]
Prints one JSON line; paste into BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from productbert_intermediate_spark.session import get_spark  # noqa: E402
from productbert_intermediate_spark.operators import blocking as B  # noqa: E402
from productbert_intermediate_spark.streaming.incremental_er import (  # noqa: E402
    read_corpus_indexed,
    read_match_edges_indexed,
    resolve_batch_indexed,
    resolve_batch_retract,
    resolve_batch_upsert,
)

REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def offers_range(spark, lo: int, hi: int, suffix: str = ""):
    return spark.range(lo, hi).selectExpr(
        "id",
        "cast(null as long) as cluster_id",
        "concat('cat', floor(id / 2) % 7) as category",
        "concat('item pair', cast(floor(id / 2) as string),"
        f" ' common', cast(id % 23 as string){', %r' % suffix if suffix else ''}) as title",
        "cast(null as string) as description",
        "cast(null as string) as brand",
        "cast(null as string) as price",
        "cast(null as string) as specTableContent",
    )


def loadavg() -> float:
    return round(os.getloadavg()[0], 1)


def run_at(spark, root: str, corpus_n: int, batch_n: int) -> dict:
    wd = os.path.join(root, f"c{corpus_n}")
    shutil.rmtree(wd, ignore_errors=True)
    resolve_batch_indexed(spark, offers_range(spark, 0, corpus_n), wd, batch_id=0)

    # retraction: REPS disjoint batches of EVEN ids (one member per pair —
    # pure candidate-pair deletion, no retroactive re-adds at this shape)
    def retract(lo, i):
        ids = spark.range(lo, lo + 2 * batch_n, 2).selectExpr("id")
        t0 = time.time()
        resolve_batch_retract(spark, ids, wd, batch_id=i)
        return time.time() - t0

    t_retract = min(retract(4 * i * batch_n, i) for i in range(REPS))

    # upsert: changed titles for batch_n ids far from the retracted ranges
    def upsert(lo, i):
        up = offers_range(spark, lo, lo + batch_n, suffix=" recrawled")
        t0 = time.time()
        resolve_batch_upsert(spark, up, wd, batch_id=100 + i)
        return time.time() - t0

    base = corpus_n // 2
    t_upsert = min(upsert(base + i * batch_n, i) for i in range(REPS))

    # invariant: maintained candidate set == from-scratch re-block of the
    # resolved corpus (retractions applied, upserted content current)
    corpus = read_corpus_indexed(spark, wd)
    ref = B.block_offers(corpus).select("id_l", "id_r")
    got = read_match_edges_indexed(spark, wd).select("id_l", "id_r")
    n_ref = ref.count()
    if n_ref == 0:
        raise SystemExit("generator produced ZERO candidate pairs")
    mism = (
        ref.unionByName(got)
        .groupBy("id_l", "id_r")
        .count()
        .where(F.col("count") != 2)
        .count()
    )
    return {
        "retract_sec": round(t_retract, 3),
        "upsert_sec": round(t_upsert, 3),
        "corpus_after": corpus.count(),
        "n_candidate_edges": n_ref,
        "state_equals_batch_run": mism == 0,
    }


def main() -> None:
    seed_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    growth = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    spark = get_spark("retraction-bench", cores=cores)
    spark.sparkContext.setLogLevel("WARN")
    root = f"/tmp/spark_graft_retr_bench_{seed_n}_{batch_n}_{cores}_{growth}"

    la0 = loadavg()
    small = run_at(spark, root, seed_n, batch_n)
    large = run_at(spark, root, growth * seed_n, batch_n)
    out = {
        "seed_n": seed_n,
        "batch_n": batch_n,
        "cores": cores,
        "reps": REPS,
        "growth": growth,
        "at_seed": small,
        "at_grown": large,
        "retract_ratio": round(large["retract_sec"] / small["retract_sec"], 3),
        "upsert_ratio": round(large["upsert_sec"] / small["upsert_sec"], 3),
        "loadavg_bracket": [la0, loadavg()],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
