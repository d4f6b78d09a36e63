"""Per-stage isolation bench (guide §1.4): noop-sink timings for the
sub-stages of the expensive bench queries, so optimization targets the
stage that actually burns the time. NOT the driver's bench — bench.py is
frozen; this file exists to produce the evidence OPTIMIZATION_r06.md cites.

Usage: python bench_extra.py [section ...]   (default: all sections)
Prints one JSON line per section with stage→seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from productbert_intermediate_spark.session import get_spark

BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label: str, fn, reps: int = 2):
    """min-of-reps timing with a job label; first rep reported separately."""
    spark.sparkContext.setJobDescription(label)
    runs = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    return runs


def profile_er(spark, out: dict) -> None:
    from pyspark.sql import functions as F

    from productbert_intermediate_spark.operators import bert_scoring as BS
    from productbert_intermediate_spark.operators import blocking as B
    from productbert_intermediate_spark.operators import scoring as S
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.operators.scoring import (
        offer_blocking_text,
    )
    from productbert_intermediate_spark.synth.generator import write_fixtures

    fx = f"/tmp/spark_graft_bench_fixtures_{BENCH_PAGES}"
    if not os.path.exists(f"{fx}/pages.parquet"):
        write_fixtures(fx, n_pages=BENCH_PAGES, seed=42)
    pages = spark.read.parquet(f"{fx}/pages.parquet")
    offers = extract_offers(pages).where(F.col("id").isNotNull())
    offers.cache()
    out["n_offers"] = offers.count()

    # ---- blocking sub-stages
    tokenized = B.build_title_for_ts(offers)
    pruned = B.prune_tokens_by_df(tokenized)
    out["block_tokenize_prune"] = _timed(
        spark, "block: tokenize+df-prune", lambda: _noop(pruned)
    )
    pruned_cp = pruned.localCheckpoint(eager=True)
    rare = B.rare_token_keys(pruned_cp, B.DEFAULT_MAX_BLOCK_SIZE)
    out["block_rare_keys"] = _timed(
        spark, "block: rare keys", lambda: _noop(rare)
    )
    lsh = B.minhash_band_keys(pruned_cp)
    out["block_lsh_keys"] = _timed(spark, "block: lsh keys", lambda: _noop(lsh))
    keys = rare.unionByName(lsh)
    out["block_pair_expand"] = _timed(
        spark,
        "block: pair expansion",
        lambda: _noop(
            B.candidate_pairs_from_keys(
                keys, B.DEFAULT_MAX_BLOCK_SIZE, assume_distinct_keys=True
            )
        ),
    )
    out["block_full"] = _timed(
        spark, "block: full", lambda: _noop(B.block_offers(offers))
    )
    pairs = B.block_offers(offers)
    pairs.cache()
    out["n_pairs"] = pairs.count()

    # ---- logistic scorer sub-stages
    t0 = time.time()
    bc = S.build_text_index_broadcast(offers, n_offers=out["n_offers"])
    out["score_text_index_build"] = round(time.time() - t0, 3)
    narrow = S.build_pair_features_narrow(
        pairs, offers, keep_texts=False, broadcast_offers=True
    )
    out["score_narrow_features"] = _timed(
        spark, "score: hydrate+jvm features", lambda: _noop(narrow), reps=3
    )
    narrow_c = narrow.cache()
    narrow_c.count()
    out["score_udf_stage"] = _timed(
        spark,
        "score: pandas-udf stage only",
        lambda: _noop(S.apply_pair_scorer(narrow_c, bc)),
        reps=3,
    )
    narrow_c.unpersist()
    out["score_full"] = _timed(
        spark,
        "score: full",
        lambda: _noop(S.score_candidates(pairs, offers, n_offers=out["n_offers"])),
        reps=3,
    )

    # ---- encoder scorer sub-stages
    t0 = time.time()
    enc_vocab, enc_idf = BS.build_vocab_and_idf_from_corpus(
        offers.select(offer_blocking_text().alias("text")), min_df=2
    )
    out["enc_vocab_build"] = round(time.time() - t0, 3)
    out["enc_vocab_size"] = len(enc_vocab.tokens)

    bc_vocab = spark.sparkContext.broadcast(enc_vocab)
    offers_tok = offers.select(
        "id",
        BS.make_tokenize_ids_udf(bc_vocab, wordpiece=True)(
            offer_blocking_text()
        ).alias("_tok"),
    )
    out["enc_offers_tok"] = _timed(
        spark, "enc: tokenize offers", lambda: _noop(offers_tok), reps=3
    )
    hydrated = S.hydrate_pairs(
        pairs, offers_tok, prepared=True, attrs=(), prepared_cols=("_tok",)
    )
    out["enc_hydrate"] = _timed(
        spark, "enc: hydrate tok ids", lambda: _noop(hydrated), reps=3
    )
    hyd_c = hydrated.cache()
    hyd_c.count()
    out["enc_forward_stage"] = _timed(
        spark,
        "enc: prepare+forward only",
        lambda: _noop(
            BS.score_pretokenized_pairs(
                hyd_c, "_tok_left", "_tok_right", enc_vocab,
                max_length=64, token_weights=enc_idf,
            ).select("id_l", "id_r", "logit", "score", "match")
        ),
        reps=3,
    )
    hyd_c.unpersist()
    out["enc_full"] = _timed(
        spark,
        "enc: full",
        lambda: _noop(
            BS.score_candidates_with_encoder(
                pairs, offers, vocab=enc_vocab, token_weights=enc_idf
            )
        ),
        reps=3,
    )

    # ---- clustering
    scored = S.score_candidates(pairs, offers, n_offers=out["n_offers"])
    scored.cache()
    out["n_scored"] = scored.count()
    from productbert_intermediate_spark.operators.clustering import (
        assign_entities,
    )

    out["cluster_full"] = _timed(
        spark,
        "cluster: full",
        lambda: _noop(assign_entities(offers, scored.where("match"))),
        reps=3,
    )
    scored.unpersist()

    # ---- linkage sub-stages
    from productbert_intermediate_spark.operators.assignment import (
        greedy_one_to_one,
    )
    from productbert_intermediate_spark.operators.linkage import (
        link_candidate_pairs,
        link_records,
        remap_link_pairs,
        tagged_union_for_scoring,
    )

    link_left = offers.where("id % 2 = 0")
    link_right = offers.where("id % 2 = 1")
    out["link_cands"] = _timed(
        spark,
        "link: candidate pairs",
        lambda: _noop(link_candidate_pairs(link_left, link_right)),
        reps=2,
    )
    cands = link_candidate_pairs(link_left, link_right).localCheckpoint(
        eager=True
    )
    out["n_link_cands"] = cands.count()
    pairs_u = remap_link_pairs(cands)
    t0 = time.time()
    union = tagged_union_for_scoring(link_left, link_right)
    out["link_union_ckpt"] = round(time.time() - t0, 3)
    out["link_score"] = _timed(
        spark,
        "link: score stage",
        lambda: _noop(S.score_candidates(pairs_u, union)),
        reps=2,
    )
    scored_l = S.score_candidates(pairs_u, union).localCheckpoint(eager=True)
    matched = scored_l.where("match")
    out["n_link_matched"] = matched.count()
    out["link_greedy"] = _timed(
        spark,
        "link: greedy fixpoint",
        lambda: _noop(greedy_one_to_one(matched, "logit")),
        reps=2,
    )
    out["link_full"] = _timed(
        spark,
        "link: full",
        lambda: _noop(link_records(link_left, link_right)),
        reps=2,
    )

    offers.unpersist()
    pairs.unpersist()


def profile_headline(spark, out: dict) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from productbert_intermediate_spark.plans.testdata_queries import REGISTRY

    for name in ("minhash_lsh_pairs", "jaccard_dup_pairs", "er_entities",
                 "er_blocking_pairs", "symmetric_pair_dedup"):
        fn, _ = REGISTRY[name]
        _noop(fn(spark, sf_dir))  # warm
        out[name] = _timed(
            spark, f"headline: {name}", lambda: _noop(fn(spark, sf_dir)), reps=3
        )


def main() -> None:
    sections = sys.argv[1:] or ["er", "headline"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cores=cpus,
                      shuffle_partitions=max(cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    if "er" in sections:
        profile_er(spark, out)
    if "headline" in sections:
        profile_headline(spark, out)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
