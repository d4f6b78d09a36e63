"""One scaling-bench trial: run the ER scoring job at a fixed parallelism.

Invoked by scripts/scaling_bench.py in a fresh process per parallelism level
(a JVM's master can't change after startup). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    fx = sys.argv[2]
    out_check = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F

    from productbert_intermediate_spark.operators import blocking as B
    from productbert_intermediate_spark.operators import scoring as S
    from productbert_intermediate_spark.operators.clustering import assign_entities
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.session import get_spark

    # Experiment knobs (VERDICT r2 #7): shuffle-partition multiplier and
    # Arrow batch size, env-set so A/B runs need no code edits.
    shuffle_mult = int(os.environ.get("SPARK_GRAFT_SHUFFLE_MULT", "2"))
    arrow_batch = os.environ.get("SPARK_GRAFT_ARROW_BATCH")
    extra = (
        {"spark.sql.execution.arrow.maxRecordsPerBatch": arrow_batch}
        if arrow_batch
        else None
    )
    spark = get_spark(
        f"scaling-{cores}",
        cores=cores,
        shuffle_partitions=max(cores * shuffle_mult, 16),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    offers = extract_offers(spark.read.parquet(f"{fx}/pages.parquet")).where(
        F.col("id").isNotNull()
    )
    offers.cache()
    offers.count()

    pairs = B.block_offers(offers)
    pairs.cache()
    n_pairs = pairs.count()

    # one-time setup: the broadcast scoring index (the analog of loading the
    # frozen matcher weights before an eval loop) — excluded from throughput.
    text_index = S.build_text_index_broadcast(offers)

    def run_score():
        return S.score_candidates(
            pairs, offers, text_index_broadcast=text_index
        )

    def measure(fn, n=5):
        """Warm-up once, then n measured runs; returns (min, median).

        This box is a shared sandbox: external tenants keep a 2-3 core
        background load (load avg ~2-3 at '0 users') and identical runs in
        one process vary ±35%. The MIN is the noise-floor estimate of the
        job's actual capability at this parallelism — the standard
        estimator for throughput benchmarking on machines with exogenous
        interference; the median is reported alongside for transparency."""
        fn()
        times = []
        for _ in range(n):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return min(times), sorted(times)[len(times) // 2]

    score_min, score_med = measure(
        lambda: run_score().write.format("noop").mode("overwrite").save()
    )
    score_sec = score_min

    # scorer-STAGE throughput: pairwise scoring over materialized candidate
    # features (the north-rule unit, candidate-pairs-scored/sec)
    narrow = S.build_pair_features_narrow(pairs, offers, broadcast_offers=True)
    narrow.cache()
    narrow.count()
    stage_min, stage_med = measure(
        lambda: S.apply_pair_scorer(narrow, text_index)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    stage_sec = stage_min
    narrow.unpersist()

    # features-only stage (hydration joins + JVM similarity columns): with
    # the scorer stage above this decomposes the e2e scoring time, so a
    # scaling gap can be attributed to a specific stage instead of "the JVM"
    feat_min, feat_med = measure(
        lambda: S.build_pair_features_narrow(pairs, offers, broadcast_offers=True)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # encoder-scorer STAGE (pair-encode → frozen encoder → sigmoid, the
    # reference's actual decision-stack shape): timed over pre-hydrated
    # cached pair texts; the corpus vocab+IDF build is one-time setup like
    # the text index above. Gives the encoder path its own scaling row.
    from productbert_intermediate_spark.functions.text import token_prefix
    from productbert_intermediate_spark.operators import bert_scoring as BS
    from productbert_intermediate_spark.operators.scoring import (
        blocking_text,
        hydrate_pairs,
    )

    title = F.coalesce(F.col("title"), F.lit(""))
    desc5 = token_prefix(F.coalesce(F.col("description"), F.lit("")), 5)
    corpus = offers.select(F.lower(F.concat_ws(" ", title, desc5)).alias("text"))
    enc_vocab, enc_idf = BS.build_vocab_and_idf_from_corpus(corpus, min_df=2)
    # The encoder runs a Python WordPiece encode per pair — ~7x the feature
    # scorer's per-pair cost — so timing all candidate pairs at the low leg
    # would take an hour per level. A deterministic ~25% hash sample (same
    # subset at every parallelism: xxhash64 of the pair ids, independent of
    # partitioning) keeps each pass minutes long; throughput is normalized
    # by the subset's own pair count so the efficiency ratio is exact.
    enc_pairs = pairs.where(F.xxhash64("id_l", "id_r") % 4 == 0)
    texts = (
        hydrate_pairs(
            enc_pairs, offers, broadcast_offers=True, attrs=("title", "description")
        )
        .select(
            "id_l",
            "id_r",
            blocking_text("left").alias("_b_l"),
            blocking_text("right").alias("_b_r"),
        )
        # pin source parallelism like build_pair_features_narrow: the cached
        # candidate table arrives AQE-coalesced, which would serialize the
        # Python encoder stage
        .repartition(max(cores * 2, 16), "id_l", "id_r")
    )
    texts.cache()
    n_enc_pairs = texts.count()
    enc_min, enc_med = measure(
        lambda: BS.score_pairs_with_encoder(
            texts, "_b_l", "_b_r", enc_vocab,
            max_length=64, wordpiece=True, token_weights=enc_idf,
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
        n=3,
    )
    texts.unpersist()

    scored = run_score()
    scored.cache()
    scored.count()

    # min-of-2 like every other stage: single-shot CC timing swung 2x with
    # co-tenant load and read as anti-scaling in round-3 experiments
    t0 = time.time()
    assign_entities(offers, scored.where("match")).write.format("noop").mode(
        "overwrite"
    ).save()
    cluster_first = time.time() - t0
    t0 = time.time()
    entities = assign_entities(offers, scored.where("match"))
    entities.cache()
    n_entities = entities.select("entity_id").distinct().count()
    cluster_sec = min(cluster_first, time.time() - t0)

    # output-equality evidence across parallelism levels
    checksum = entities.agg(
        F.coalesce(F.bit_xor(F.xxhash64("id", "entity_id")), F.lit(0))
    ).collect()[0][0]

    result = {
        "cores": cores,
        "n_pairs": n_pairs,
        "score_sec": round(score_sec, 3),
        "score_sec_median": round(score_med, 3),
        "stage_sec": round(stage_sec, 3),
        "stage_sec_median": round(stage_med, 3),
        "features_sec": round(feat_min, 3),
        "features_sec_median": round(feat_med, 3),
        "encoder_stage_sec": round(enc_min, 3),
        "encoder_stage_sec_median": round(enc_med, 3),
        "encoder_stage_n_pairs": n_enc_pairs,
        "encoder_stage_pairs_per_sec": (
            round(n_enc_pairs / enc_min, 1) if enc_min else 0
        ),
        "cluster_sec": round(cluster_sec, 3),
        "shuffle_partitions": max(cores * shuffle_mult, 16),
        "arrow_batch": int(arrow_batch) if arrow_batch else 10000,
        "pairs_per_sec": round(n_pairs / score_sec, 1) if score_sec else 0,
        "stage_pairs_per_sec": round(n_pairs / stage_sec, 1) if stage_sec else 0,
        "n_entities": n_entities,
        "entities_checksum": int(checksum),
    }
    line = json.dumps(result)
    print(line)
    if out_check:
        with open(out_check, "w") as f:
            f.write(line)
    spark.stop()


if __name__ == "__main__":
    main()
