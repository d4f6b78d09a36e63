"""Capture .explain("formatted") for the bench-visible query paths into
plans/r06/<name>_<tag>.txt (tag = before|after). The judge checks plan
claims in OPTIMIZATION_r06.md against these files.

Usage: python scripts/capture_plans.py <tag> [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from productbert_intermediate_spark.session import get_spark

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))


def _er_frames(spark):
    """The bench's ER-stage DataFrames, named as bench.py names them."""
    from pyspark.sql import functions as F

    from productbert_intermediate_spark.operators import bert_scoring as BS
    from productbert_intermediate_spark.operators import blocking as B
    from productbert_intermediate_spark.operators import scoring as S
    from productbert_intermediate_spark.operators.clustering import (
        assign_entities,
    )
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.operators.linkage import link_records
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
    n_offers = offers.count()
    pairs = B.block_offers(offers)
    pairs.cache()
    pairs.count()

    def _enc():
        vocab, idf = BS.build_vocab_and_idf_from_corpus(
            offers.select(offer_blocking_text().alias("text")), min_df=2
        )
        return BS.score_candidates_with_encoder(
            pairs, offers, vocab=vocab, token_weights=idf
        )

    def _cluster():
        scored = S.score_candidates(pairs, offers, n_offers=n_offers)
        return assign_entities(offers, scored.where("match"))

    return {
        "er_extract": lambda: extract_offers(pages).where(
            F.col("id").isNotNull()
        ),
        "er_block": lambda: B.block_offers(offers),
        "er_score": lambda: S.score_candidates(
            pairs, offers, n_offers=n_offers
        ),
        "er_score_encoder": _enc,
        "er_cluster": _cluster,
        "er_link_match": lambda: link_records(
            offers.where("id % 2 = 0"), offers.where("id % 2 = 1")
        ),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("capture-plans", cores=cpus,
                      shuffle_partitions=max(cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from productbert_intermediate_spark.plans.testdata_queries import REGISTRY

    headline = [
        "wdc_clean_string", "lineitem_agg", "hydration_join",
        "topk_per_group", "exact_dedup", "symmetric_pair_dedup",
        "minhash_lsh_pairs", "jaccard_dup_pairs", "simhash_fingerprint",
        "ann_cosine_matches", "quality_score", "er_blocking_pairs",
        "er_entities",
    ]
    frames = {
        name: (lambda n=name: REGISTRY[n][0](spark, sf_dir))
        for name in headline
    }
    frames.update(_er_frames(spark))

    for name, build in frames.items():
        if only and name not in only:
            continue
        try:
            import contextlib
            import io

            df = build()
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # pragma: no cover
            txt = f"ERROR capturing plan: {e}"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
