"""Incremental-ER per-batch cost bench: O(batch) vs O(corpus), measured.

VERDICT r4 #3 asked for a MEASURED per-batch wall-time that stays ~flat as
the accumulated corpus grows 10x. pytest holds a 3x noise bound
(tests/test_incremental_er.py::test_indexed_per_batch_cost_flat_under_
corpus_growth); this script produces the BENCH.md numbers at a larger
shape and contrasts the two modes:

* indexed (streaming/incremental_er.resolve_batch_indexed) — persistent
  bucketed (token, id) blocking index + token-df deltas + incremental CC;
  per-batch work bounded by the batch + flipped-token fallout.
* foldback (resolve_batch_increment) — the honest baseline the index
  replaces: monotone score cache (scoring IS incremental) but a full
  corpus re-block + full CC per batch, i.e. O(corpus).

Protocol: seed a corpus, time a fixed-size batch fold (min over REPS)
at ~SEED offers, grow the corpus ~GROWTH x with bulk folds (untimed),
then time an identical-size fold again. Reported per mode: fold seconds
at seed and grown size, plus the ratio (flatness = ratio near 1;
O(corpus) shows up as ratio tracking corpus growth). At the default 10x
both modes are still constant-dominated (snapshot commits / driver-side
job scheduling); pass growth=50 to let the corpus term show — that is
the BENCH.md shape. Both modes' final match-edge sets are
checksummed against a from-scratch batch run over the accumulated corpus
(the pinned batch-equivalence invariant) — a bench row that drifted from
the invariant would be meaningless.

Offer shape: synthetic pairs (i <-> i^1 share one rare token) plus common
filler tokens, the same generator as the pytest flatness bound, scaled up.

Usage: python scripts/incremental_er_bench.py [seed_n] [batch_n] [cores] [growth]
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
    resolve_batch_increment,
    resolve_batch_indexed,
    read_match_edges_indexed,
)

REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def offers_range(spark, lo: int, hi: int):
    """Deterministic offers: i pairs with i^1 via a shared rare token.

    category is floor(id/2)%7 — SHARED by both pair members: df pruning is
    per-category, so an id%7 shape would leave every rare token at
    within-group df=1 (pruned) and the bench would measure zero pairs.
    """
    return spark.range(lo, hi).selectExpr(
        "id",
        "cast(null as long) as cluster_id",
        "concat('cat', floor(id / 2) % 7) as category",
        "concat('item pair', cast(floor(id / 2) as string),"
        " ' common', cast(id % 23 as string)) as title",
        "cast(null as string) as description",
        "cast(null as string) as brand",
        "cast(null as string) as price",
        "cast(null as string) as specTableContent",
    )


def loadavg() -> float:
    return round(os.getloadavg()[0], 1)


def run_mode(spark, mode, root, seed_n, batch_n, growth=10):
    wd = os.path.join(root, mode)
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    bid = 0

    def fold(lo, hi):
        nonlocal bid
        t0 = time.time()
        if mode == "indexed":
            resolve_batch_indexed(
                spark, offers_range(spark, lo, hi), wd, batch_id=bid
            )
        else:
            resolve_batch_increment(
                spark,
                offers_range(spark, lo, hi),
                offers_dir=f"{wd}/offers",
                cache_dir=f"{wd}/score_cache",
                edges_dir=f"{wd}/edges",
                entities_dir=f"{wd}/entities",
            )
        bid += 1
        return time.time() - t0

    la0 = loadavg()
    pos = seed_n
    fold(0, pos)  # seed corpus (untimed)
    t_small = min(fold(pos + i * batch_n, pos + (i + 1) * batch_n)
                  for i in range(REPS))
    pos += REPS * batch_n
    # grow to ~growth x of seed in two bulk folds (untimed)
    target = growth * seed_n
    mid = pos + (target - pos) // 2
    fold(pos, mid)
    fold(mid, target)
    pos = target
    t_large = min(fold(pos + i * batch_n, pos + (i + 1) * batch_n)
                  for i in range(REPS))
    pos += REPS * batch_n
    la1 = loadavg()

    # invariant check: accumulated state == from-scratch batch run
    offers_all = spark.read.parquet(f"{wd}/offers")
    ref = B.block_offers(offers_all).select("id_l", "id_r")
    if mode == "indexed":
        got = read_match_edges_indexed(spark, wd).select("id_l", "id_r")
    else:
        got = spark.read.parquet(f"{wd}/edges").select("id_l", "id_r")
    n_ref = ref.count()
    if n_ref == 0:
        raise SystemExit(
            "generator produced ZERO candidate pairs - the fold timings "
            "would measure empty work and the invariant would be [] == []"
        )
    mism = ref.unionByName(got).groupBy("id_l", "id_r").count().where(
        F.col("count") != 2
    ).count()
    return {
        "fold_sec_at_seed": round(t_small, 3),
        "fold_sec_at_grown": round(t_large, 3),
        "ratio_grown_over_seed": round(t_large / t_small, 3),
        "final_corpus": pos,
        "n_candidate_edges": n_ref,
        "state_equals_batch_run": mism == 0,
        "loadavg_bracket": [la0, la1],
    }


def main() -> None:
    seed_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    growth = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    spark = get_spark("incremental-er-bench", cores=cores)
    spark.sparkContext.setLogLevel("WARN")
    root = f"/tmp/spark_graft_incr_bench_{seed_n}_{batch_n}_{cores}_{growth}"

    out = {
        "seed_n": seed_n,
        "batch_n": batch_n,
        "cores": cores,
        "reps": REPS,
        "growth": growth,
        "indexed": run_mode(spark, "indexed", root, seed_n, batch_n, growth),
        "foldback": run_mode(spark, "foldback", root, seed_n, batch_n, growth),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
