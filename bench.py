"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Prints ONE JSON line:
  {"metric": "er_pairs_scored_per_sec", "value": N, "unit": "pairs/sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Headline queries run over the driver-provided testdata tables; the ER
throughput figure (the BASELINE.md north-rule metric) is measured on the
deterministic synthetic web-page corpus (FIXTURES.md) at bench scale.
Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from productbert_intermediate_spark.session import get_spark

HEADLINE = [
    "wdc_clean_string",
    "lineitem_agg",
    "hydration_join",
    "topk_per_group",
    "exact_dedup",
    "symmetric_pair_dedup",
    "minhash_lsh_pairs",
    "jaccard_dup_pairs",
    "simhash_fingerprint",
    "ann_cosine_matches",
    "quality_score",
    "er_blocking_pairs",
    "er_entities",
]

BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
# Timed repetitions per query (min-of-N): single-shot timings on this shared
# box swing ±35% with co-tenant load (measured r4: 4.3-7.9s over four warm
# reps of the same query), so every figure the driver records is the min
# over N steady-state passes — the same protocol the scaling bench uses.
# N=3 because min-of-2 still recorded a 2x-off outlier in r3.
BENCH_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def _materialize(df) -> int:
    """Force full computation of every column (count() would prune)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


# 1-min loadavg sampled around every timed section and emitted in the JSON:
# this box is shared, identical runs swing ±35% under co-tenant load, and
# round-3's regression cluster could only be *attributed* to contention, not
# checked from the recorded numbers. With [pre, post] per query the claim is
# checkable from the JSON alone (32 cores: loadavg ≫ 32 ⇒ contended sample).
_LOADAVG: dict[str, list[float]] = {}


def _loadavg_bracket(name: str):
    _LOADAVG.setdefault(name, []).append(round(os.getloadavg()[0], 1))


def _bench_er_throughput(spark, n_pages: int) -> tuple[float, float, dict[str, float]]:
    """Candidate-pairs-scored/sec on the synthetic corpus (north-rule metric)."""
    from pyspark.sql import functions as F

    from productbert_intermediate_spark.operators import bert_scoring as BS
    from productbert_intermediate_spark.operators import blocking as B
    from productbert_intermediate_spark.operators import scoring as S
    from productbert_intermediate_spark.operators.clustering import assign_entities
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.synth.generator import write_fixtures

    fx = f"/tmp/spark_graft_bench_fixtures_{n_pages}"
    if not os.path.exists(f"{fx}/pages.parquet"):
        write_fixtures(fx, n_pages=n_pages, seed=42)

    timings: dict[str, float] = {}
    pages = spark.read.parquet(f"{fx}/pages.parquet")
    offers = extract_offers(pages).where(F.col("id").isNotNull())
    # Warm once (Python-UDF worker fan-out + parquet footer cache), then
    # min-of-N steady-state passes. Every rep times the SAME operation —
    # cache-fill + count, the rounds-1/2 protocol — so the figure is
    # comparable across rounds (round 3 mixed noop-write reps into the min,
    # which timed a cheaper op; flagged in ADVICE r3 and fixed here).
    _materialize(offers)
    extract_runs = []
    _loadavg_bracket("er_extract")
    for i in range(max(2, BENCH_REPS)):
        t0 = time.time()
        offers.cache()
        offers.count()
        extract_runs.append(time.time() - t0)
        if i < max(2, BENCH_REPS) - 1:
            offers.unpersist(blocking=True)
    _loadavg_bracket("er_extract")
    timings["er_extract"] = min(extract_runs)

    # Stage timings are min-of-2 (shared box, ±35% single-shot swing): the
    # first pass materializes through noop, the second caches — the min is
    # the comparable steady-state figure, same rationale as the headline.
    _loadavg_bracket("er_block")
    t0 = time.time()
    _materialize(B.block_offers(offers))
    block_first = time.time() - t0
    t0 = time.time()
    pairs = B.block_offers(offers)
    pairs.cache()
    n_pairs = pairs.count()
    timings["er_block"] = min(block_first, time.time() - t0)
    _loadavg_bracket("er_block")

    # Headline metric: min of 3 measured scoring runs (first run doubles as
    # the warm-up). Single-shot timing of the Python-UDF stage swings ±35%
    # on this shared box; the min is the stable noise-floor estimate the
    # scaling bench also reports (see BENCH.md methodology).
    runs = []
    scored = None
    _loadavg_bracket("er_score")
    for i in range(3):
        t0 = time.time()
        if i < 2:
            _materialize(S.score_candidates(pairs, offers))
        else:
            # last timed run doubles as the cache fill for the clustering
            # stage — no fourth (un-timed) full scoring pass
            scored = S.score_candidates(pairs, offers)
            scored.cache()
            scored.count()
        runs.append(time.time() - t0)
    _loadavg_bracket("er_score")
    score_sec = min(runs)
    timings["er_score"] = score_sec

    # Encoder-scorer stage (the reference's actual decision stack shape:
    # pair-encode → frozen encoder → sigmoid; model/model.py:28-55).
    # Protocol (VERDICT r4 #1 — the old min-of-2 mixed a >10x one-time cost
    # into the figure: 46.8-85.5s cold vs 6.5-9.9s warm at this shape):
    #   * the corpus vocabulary+IDF build is timed ONCE, separately
    #     (er_encoder_vocab_build) — the reference's analog loads the model
    #     outside its eval loop (base_trainer.py:158-191);
    #   * the first scoring pass is recorded as er_score_encoder_cold
    #     (Python-worker fan-out + broadcast + JIT — what a fresh run pays
    #     once per job, NOT once per candidate table);
    #   * er_score_encoder and encoder_pairs_per_sec are the min over
    #     BENCH_REPS further passes — the steady-state rate that governs
    #     anything beyond the first few million pairs.
    from productbert_intermediate_spark.operators.scoring import (
        offer_blocking_text,
    )

    _loadavg_bracket("er_encoder_vocab_build")
    t0 = time.time()
    enc_vocab, enc_idf = BS.build_vocab_and_idf_from_corpus(
        offers.select(offer_blocking_text().alias("text")), min_df=2
    )
    timings["er_encoder_vocab_build"] = time.time() - t0
    _loadavg_bracket("er_encoder_vocab_build")

    def _enc_pass() -> float:
        t0 = time.time()
        _materialize(
            BS.score_candidates_with_encoder(
                pairs, offers, vocab=enc_vocab, token_weights=enc_idf
            )
        )
        return time.time() - t0

    _loadavg_bracket("er_score_encoder")
    timings["er_score_encoder_cold"] = _enc_pass()
    timings["er_score_encoder"] = min(_enc_pass() for _ in range(BENCH_REPS))
    _loadavg_bracket("er_score_encoder")

    cluster_runs = []
    _loadavg_bracket("er_cluster")
    for _ in range(2):
        t0 = time.time()
        _materialize(assign_entities(offers, scored.where("match")))
        cluster_runs.append(time.time() - t0)
    _loadavg_bracket("er_cluster")
    timings["er_cluster"] = min(cluster_runs)

    # Unsupervised FS decision layer (operators/fellegi_sunter.py) over the
    # SAME cached feature table the logistic pass produced — the marginal
    # cost of scorer="fs" beyond the shared feature stage: one pattern-count
    # pass (≤ 2^k-row shuffle), driver-side EM, map-only posterior.
    from productbert_intermediate_spark.operators import fellegi_sunter as FS

    fs_feats = scored.select("id_l", "id_r", *S.FEATURES)
    fs_gcols = [f"g_{k}" for k in FS.FS_FEATURE_THRESHOLDS]
    fs_runs = []
    _loadavg_bracket("er_fs_decision")
    for _ in range(2):
        t0 = time.time()
        fs_g = FS.feature_gammas(fs_feats)
        fs_params = FS.fit_em(fs_g, fs_gcols, max_iter=500, tol=1e-8)
        _materialize(
            FS.score_fs(fs_g, fs_gcols, fs_params, posterior_col="score")
        )
        fs_runs.append(time.time() - t0)
    _loadavg_bracket("er_fs_decision")
    timings["er_fs_decision"] = min(fs_runs)

    # Clean-clean linkage chain (operators/linkage.link_records): a parity
    # split of the same corpus stands in for two separately-curated
    # catalogs; cross-side-only blocking → the same scorer → greedy
    # one-to-one. One end-to-end timing per rep (the assignment fixpoint
    # runs eager rounds inside the call, so the timed region covers the
    # whole decision layer), min-of-2 like the other stage figures.
    from productbert_intermediate_spark.operators.linkage import link_records

    link_left = offers.where("id % 2 = 0")
    link_right = offers.where("id % 2 = 1")
    link_runs = []
    _loadavg_bracket("er_link_match")
    for _ in range(2):
        t0 = time.time()
        _materialize(link_records(link_left, link_right))
        link_runs.append(time.time() - t0)
    _loadavg_bracket("er_link_match")
    timings["er_link_match"] = min(link_runs)

    offers.unpersist()
    pairs.unpersist()
    scored.unpersist()
    enc_pairs_per_sec = (
        n_pairs / timings["er_score_encoder"]
        if timings["er_score_encoder"] > 0
        else 0.0
    )
    return (n_pairs / score_sec if score_sec > 0 else 0.0), enc_pairs_per_sec, timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")

    from productbert_intermediate_spark.plans.testdata_queries import REGISTRY

    queries: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf_dir)
        _materialize(df)  # warm (plan compile + shuffle files + cache parquet footers)
        best = float("inf")
        _loadavg_bracket(name)
        for _ in range(BENCH_REPS):
            t0 = time.time()
            _materialize(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        _loadavg_bracket(name)
        queries[name] = round(best, 3)

    throughput, enc_throughput, er_timings = _bench_er_throughput(spark, BENCH_PAGES)
    for k, v in er_timings.items():
        queries[k] = round(v, 3)

    print(
        json.dumps(
            {
                "metric": "er_pairs_scored_per_sec",
                "value": round(throughput, 1),
                "unit": "pairs/sec",
                "encoder_pairs_per_sec": round(enc_throughput, 1),
                "queries": queries,
                "loadavg_1m": _LOADAVG,
                "sf": sf,
                "bench_pages": BENCH_PAGES,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
