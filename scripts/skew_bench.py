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
Both scorers are measured: the logistic feature scorer
(score_candidates) and the encoder path (score_candidates_with_encoder,
which gained the same salt_hot_ids guard in round 5) — the encoder's
corpus vocab+IDF build is paid ONCE outside the timed loop, mirroring
bench.py's cold/warm split.

The encoder section runs with spark.sql.autoBroadcastJoinThreshold=-1: at
this fixture scale the tokenized-offers table is a few MB, so the plain
leg's hydration auto-broadcasts, no shuffle exists, pairs keep their
uniform source layout, and the hot id CANNOT straggle the Arrow stage —
salting would only add exchanges. The guard targets the at-scale plan,
where offers are far beyond any broadcast budget and hydration is a
shuffle join on the hot key; disabling auto-broadcast reproduces that
plan honestly at fixture scale. The encoder's hot id sits on id_r — the
LAST hydration join key, whose shuffle layout the Arrow stage inherits; a
hot id_l is measured harmless on this path (the id_r join re-levels it
for free; 36.0s ≈ the balanced floor with no skew handling at all).
THREE encoder legs tell the whole story:

* plain + AQE — Spark's built-in handling: skew-join split re-balances
  the sort-merge join itself, but the split works on join OUTPUT bytes,
  not downstream per-row Python cost;
* plain, AQE off — the naked straggler: the hot id_r partition rides one
  task through the per-row Arrow encoder stage;
* salted (AQE off) — the differential guard: hot-id dim salting spreads
  the join, and the pair-hash re-level carries the balance into the
  Arrow stage.

salt_hot_ids stays opt-in (default None) on the encoder path: candidate
tables from OUR blocker are size-capped and cannot produce this shape;
the guard is for externally-supplied hub-id tables, and this bench is
the evidence for when to reach for it.

Usage: python scripts/skew_bench.py [n_pages] [n_pairs] [cores]
SPARK_GRAFT_SKEW_MODE=enc skips the logistic A/B (encoder legs only).
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

    enc_only = os.environ.get("SPARK_GRAFT_SKEW_MODE", "all") == "enc"
    if enc_only:
        plain_min = plain_med = salted_min = salted_med = None
        _, n_scored = None, checksum_and_count(None)[1]
        same = None
    else:
        plain_min, plain_med = measure(None)
        salted_min, salted_med = measure((cores * 2, 50_000))
        ck_plain, n_scored = checksum_and_count(None)
        ck_salted, n_scored_salted = checksum_and_count((cores * 2, 50_000))
        same = (ck_plain == ck_salted) and (n_scored == n_scored_salted)

    # encoder path: vocab+IDF built once (the bench's one-time cost), then
    # the streamed hydration + Arrow encoder stage is what the hot id
    # stresses — the straggler VERDICT r4 #4 named. The hot id sits on
    # id_r here, NOT id_l: hydration joins id_l first and id_r LAST, so a
    # hot id_l is re-shuffled to the uniform id_r layout before the Arrow
    # stage ever runs (measured: no straggler, plain no-AQE 36.0s ≈
    # balanced), while a hot id_r owns the final shuffle layout and rides
    # one task through the per-row encoder — the worst case for this path.
    # (The logistic section keeps hot id_l: ITS Arrow stage repartitions
    # by id_l explicitly, so that is its worst case.)
    pairs_r = idx.select(
        F.pmod(F.xxhash64(F.col("id"), F.lit("l")), F.lit(n_offers)).alias("id_l"),
        F.when(F.col("id") < n_hot, F.lit(hot_id))
        .otherwise(F.pmod(F.xxhash64(F.col("id"), F.lit("r")), F.lit(n_offers)))
        .alias("id_r"),
    ).where(F.col("id_l") != F.col("id_r"))
    pairs_r.cache()
    pairs_r.count()

    from productbert_intermediate_spark.operators import bert_scoring as B

    vocab, idf = B.build_vocab_and_idf_from_corpus(
        offers.select(S.offer_blocking_text().alias("text"))
    )

    # force the at-scale plan: offers_tok is only a few MB here and would
    # auto-broadcast, which deletes the shuffle the hot id skews (see
    # module docstring). At 100 TB it cannot broadcast — simulate that.
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def run_enc(salt):
        return B.score_candidates_with_encoder(
            pairs_r, offers, vocab=vocab, token_weights=idf,
            broadcast_offers=False, salt_hot_ids=salt,
        )

    def measure_enc(salt, reps=3):
        run_enc(salt).write.format("noop").mode("overwrite").save()  # warm-up
        times = []
        for _ in range(reps):
            t0 = time.time()
            run_enc(salt).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        return min(times), sorted(times)[len(times) // 2]

    def checksum_enc(salt):
        row = run_enc(salt).agg(
            F.coalesce(
                F.bit_xor(F.xxhash64("id_l", "id_r", F.col("match"))), F.lit(0)
            ).alias("ck"),
            F.count("*").alias("n"),
        ).collect()[0]
        return row["ck"], row["n"]

    enc_plain_min, enc_plain_med = measure_enc(None)

    # AQE off for the remaining two legs: the guard's target environment
    # (see module docstring) — without it the built-in skew split
    # re-balances the plain leg and there is nothing left to salt
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    enc_noaqe_min, enc_noaqe_med = measure_enc(None)
    enc_salt_min, enc_salt_med = measure_enc((cores * 2, 50_000))
    eck_p, en_p = checksum_enc(None)
    eck_s, en_s = checksum_enc((cores * 2, 50_000))
    enc_same = (eck_p == eck_s) and (en_p == en_s)
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)

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
                **(
                    {}
                    if enc_only
                    else {
                        "plain_sec": round(plain_min, 3),
                        "plain_sec_median": round(plain_med, 3),
                        "salted_sec": round(salted_min, 3),
                        "salted_sec_median": round(salted_med, 3),
                        "plain_pairs_per_sec": round(n_scored / plain_min, 1),
                        "salted_pairs_per_sec": round(n_scored / salted_min, 1),
                        "speedup": round(plain_min / salted_min, 3),
                        "output_identical": same,
                    }
                ),
                "encoder_plain_aqe_sec": round(enc_plain_min, 3),
                "encoder_plain_aqe_sec_median": round(enc_plain_med, 3),
                "encoder_plain_noaqe_sec": round(enc_noaqe_min, 3),
                "encoder_plain_noaqe_sec_median": round(enc_noaqe_med, 3),
                "encoder_salted_sec": round(enc_salt_min, 3),
                "encoder_salted_sec_median": round(enc_salt_med, 3),
                "encoder_plain_aqe_pairs_per_sec": round(en_p / enc_plain_min, 1),
                "encoder_salted_pairs_per_sec": round(en_p / enc_salt_min, 1),
                "encoder_speedup_vs_noaqe": round(enc_noaqe_min / enc_salt_min, 3),
                "encoder_cost_vs_aqe": round(enc_plain_min / enc_salt_min, 3),
                "encoder_output_identical": enc_same,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
