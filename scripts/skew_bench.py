"""Skew stress bench: hot-id candidate pairs, default vs salted scoring.

The north rule requires skew handled EXPLICITLY. Capped blocking bounds
per-id pair counts structurally, so the pipeline's own candidates can't
produce this shape — but externally-supplied candidate tables (knn
negatives, streaming joins, a user's own blocker) can: one hub id carried
by a large fraction of all pairs. build_pair_features_narrow repartitions
the source by id_l, so a hot id_l concentrates that fraction of the
PYTHON scoring work in ONE partition — a straggler that byte-based AQE
cannot split (the cost is per-row Python, not bytes).

This script measures that failure mode and the fix on the same input:
N_PAIRS candidate pairs, HOT_FRAC of them sharing one left id, scored at
a fixed parallelism with (a) the default id_l repartition and (b)
salt_hot_ids — the hash-of-pair spread + differential salted hydration
(operators/skew.py). Output identity is asserted (count + checksum).

Usage: python scripts/skew_bench.py [n_pages] [n_pairs] [cores]
Prints one JSON line; paste into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hot_frac = 0.4

    from pyspark.sql import functions as F

    from productbert_intermediate_spark.operators import scoring as S
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.session import get_spark
    from productbert_intermediate_spark.synth.generator import write_fixtures

    fx = f"/tmp/spark_graft_bench_fixtures_{n_pages}"
    if not os.path.exists(f"{fx}/pages.parquet"):
        write_fixtures(fx, n_pages=n_pages, seed=42)

    spark = get_spark(
        f"skew-bench-{cores}", cores=cores, shuffle_partitions=cores * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    offers = extract_offers(spark.read.parquet(f"{fx}/pages.parquet")).where(
        F.col("id").isNotNull()
    )
    offers.cache()
    n_offers = offers.count()

    # skewed candidate table: hot_frac of pairs share ONE left id; partners
    # and the uniform tail are deterministic functions of the row index.
    # pmod, not %: Spark's % keeps the dividend's sign, so xxhash64 % n
    # lands negative for ~half of hashes — ids matching NO offer, which the
    # inner hydration join silently drops (~2/3 of the workload in r4's
    # recorded run; flagged in ADVICE r4). pmod keeps every generated pair
    # joinable, matching operators/skew.py's own salt arithmetic.
    hot_id = offers.agg(F.min("id")).collect()[0][0]
    n_hot = int(n_pairs * hot_frac)
    idx = spark.range(n_pairs)
    pairs = idx.select(
        F.when(F.col("id") < n_hot, F.lit(hot_id))
        .otherwise(F.pmod(F.xxhash64(F.col("id"), F.lit("l")), F.lit(n_offers)))
        .alias("id_l"),
        F.pmod(F.xxhash64(F.col("id"), F.lit("r")), F.lit(n_offers)).alias("id_r"),
    ).where(F.col("id_l") != F.col("id_r"))
    pairs.cache()
    n_real = pairs.count()

    def run(salt):
        # streamed (non-broadcast) path: the skew surface under test
        return S.score_candidates(
            pairs, offers, use_text_broadcast=False, salt_hot_ids=salt
        )

    def measure(salt, reps=3):
        run(salt).write.format("noop").mode("overwrite").save()  # warm-up
        times = []
        for _ in range(reps):
            t0 = time.time()
            run(salt).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        return min(times), sorted(times)[len(times) // 2]

    def checksum_and_count(salt):
        row = run(salt).agg(
            F.coalesce(
                F.bit_xor(F.xxhash64("id_l", "id_r", F.col("match"))), F.lit(0)
            ).alias("ck"),
            F.count("*").alias("n"),
        ).collect()[0]
        return row["ck"], row["n"]

    plain_min, plain_med = measure(None)
    salted_min, salted_med = measure((cores * 2, 50_000))
    ck_plain, n_scored = checksum_and_count(None)
    ck_salted, n_scored_salted = checksum_and_count((cores * 2, 50_000))
    same = (ck_plain == ck_salted) and (n_scored == n_scored_salted)

    print(
        json.dumps(
            {
                "n_offers": n_offers,
                "n_pairs": n_real,
                # pairs/s denominators use the POST-hydration scored row
                # count, not the generated pair count: pairs whose partner
                # id extracted to NULL never hydrate, and counting them
                # overstates throughput (ADVICE r4)
                "n_scored": n_scored,
                "hot_frac": hot_frac,
                "cores": cores,
                "plain_sec": round(plain_min, 3),
                "plain_sec_median": round(plain_med, 3),
                "salted_sec": round(salted_min, 3),
                "salted_sec_median": round(salted_med, 3),
                "plain_pairs_per_sec": round(n_scored / plain_min, 1),
                "salted_pairs_per_sec": round(n_scored / salted_min, 1),
                "speedup": round(plain_min / salted_min, 3),
                "output_identical": same,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
