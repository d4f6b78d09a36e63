"""Skew operators: salted join ≡ plain join, hot keys actually spread,
pair re-level is balanced + deterministic, salted scoring ≡ default."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.operators import scoring as S
from productbert_intermediate_spark.operators.blocking import block_offers
from productbert_intermediate_spark.operators.extract import extract_offers
from productbert_intermediate_spark.operators.skew import (
    hot_keys,
    salt_dim,
    salted_repartition_pairs,
    salted_skew_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """Fact with one hub key (×400) + uniform tail; dim covering all keys."""
    fact = spark.range(0, 400).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    ).unionByName(
        spark.range(400, 1000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("payload")
        )
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("dk"), F.concat(F.lit("name"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_skew_join_matches_plain_join(skewed):
    fact, dim = skewed
    plain = fact.join(dim, fact.k == dim.dk).select("k", "payload", "name")
    salted = salted_skew_join(
        fact, dim, "k", "dk", n_salts=4, hot_threshold=100
    ).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_hot_key_spreads_across_partitions(spark, skewed):
    """The hub key's joined rows must land in >1 shuffle partition (the
    whole point of the salt); a cold key stays in exactly one."""
    fact, dim = skewed
    # force the shuffled-join shape under test: a tiny dim would otherwise
    # broadcast (no shuffle → nothing to observe), and AQE would re-coalesce
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = salted_skew_join(
            fact, dim, "k", "dk", n_salts=4, hot_threshold=100
        ).withColumn("_pid", F.spark_partition_id())
        parts = {
            int(r["k"]): r["n"]
            for r in joined.groupBy("k", "_pid")
            .count()
            .groupBy("k")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    assert parts[7] > 1, parts
    cold = [n for k, n in parts.items() if k != 7]
    assert cold and all(n == 1 for n in cold), parts


def test_salt_dim_replicates_only_hot(spark, skewed):
    fact, dim = skewed
    hot = hot_keys(fact, "k", 100)
    assert [r[0] for r in hot.collect()] == [7]
    salted = salt_dim(dim, "dk", hot, n_salts=4)
    counts = {r["dk"]: r["n"] for r in
              salted.groupBy("dk").agg(F.count("*").alias("n")).collect()}
    assert counts[7] == 4
    assert all(v == 1 for k, v in counts.items() if k != 7)


def test_keys_only_fact_rejected(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="non-key fact column"):
        salted_skew_join(fact.select("k"), dim, "k", "dk")


def test_salted_repartition_pairs_balanced_and_deterministic(spark):
    # pairs arriving in a block-clustered layout: 1 partition per hub
    pairs = (
        spark.range(0, 2000)
        .select(
            (F.col("id") % 4).alias("id_l"), (F.col("id") + 10000).alias("id_r")
        )
        .repartition(4, "id_l")
    )
    out = salted_repartition_pairs(pairs, 16)
    sizes = [
        r["n"]
        for r in out.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 16
    assert max(sizes) < 2 * (2000 / 16), sizes
    # deterministic assignment: same (partition, row) mapping on a re-run
    def layout(df):
        return sorted(
            map(tuple, df.select(F.spark_partition_id(), "id_l", "id_r").collect())
        )

    assert layout(out) == layout(salted_repartition_pairs(pairs, 16))
    # content unchanged
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, pairs.collect()))


def test_hydrate_pairs_salted_matches_hydrate_pairs(spark, fixtures_dir):
    offers = extract_offers(spark.read.parquet(f"{fixtures_dir}/pages.parquet"))
    pairs = block_offers(offers).limit(3000)
    prepped = S.prepare_offers_for_scoring(offers)
    kw = dict(prepared=True, attrs=("title", "brand", "price"),
              prepared_cols=("_toks", "_dtoks"))
    plain = S.hydrate_pairs(pairs, prepped, **kw)
    # hot_threshold=3 drives real ids down the salted branch on this corpus
    salted = S.hydrate_pairs_salted(
        pairs, prepped, n_salts=4, hot_threshold=3, **kw
    )
    assert salted.columns == plain.columns
    cols = [c for c in plain.columns if not c.startswith("_")]
    key = lambda rows: sorted(map(tuple, rows))
    assert key(salted.select(cols).collect()) == key(plain.select(cols).collect())


def test_score_candidates_salted_equals_default(spark, fixtures_dir):
    """Opting the streamed scorer into salting changes partitioning only:
    every (pair, feature, logit, match) row is identical."""
    offers = extract_offers(spark.read.parquet(f"{fixtures_dir}/pages.parquet"))
    pairs = block_offers(offers)
    base = S.score_candidates(pairs, offers, use_text_broadcast=False)
    salted = S.score_candidates(
        pairs, offers, use_text_broadcast=False, salt_hot_ids=(4, 5)
    )
    assert salted.columns == base.columns
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(salted) == key(base)


def test_pipeline_salted_identical_entities_and_resume(
    spark, e2e_dir, tmp_path_factory
):
    """run_pipeline(salt_hot_ids=...) is plumbing-only: same entities as the
    default path, and — because salting is row-identical — flipping it on an
    existing workdir resumes every stage instead of invalidating any."""
    from productbert_intermediate_spark.plans.pipeline import run_pipeline
    from productbert_intermediate_spark.sources.catalog import StageCatalog

    wd_plain = str(tmp_path_factory.mktemp("salted_pipe_plain"))
    wd_salt = str(tmp_path_factory.mktemp("salted_pipe_salt"))
    pages = f"{e2e_dir}/pages.parquet"
    run_pipeline(spark, pages, wd_plain)
    run_pipeline(spark, pages, wd_salt, salt_hot_ids=(4, 5))
    e_plain = sorted(
        map(tuple, StageCatalog(spark, wd_plain).read("entities").collect())
    )
    e_salt = sorted(
        map(tuple, StageCatalog(spark, wd_salt).read("entities").collect())
    )
    assert e_salt == e_plain

    rerun = run_pipeline(spark, pages, wd_plain, salt_hot_ids=(4, 5))
    assert all(s["resumed"] for s in rerun["stages"].values())


def test_encoder_scorer_salted_equals_default(spark, fixtures_dir):
    """salt_hot_ids on the ENCODER path (VERDICT r4 #4) is plumbing-only:
    every (pair, logit, score, match) row identical to the plain path, with
    hot_threshold low enough that real ids take the salted branch."""
    from productbert_intermediate_spark.operators import bert_scoring as BS

    offers = extract_offers(spark.read.parquet(f"{fixtures_dir}/pages.parquet"))
    pairs = block_offers(offers).limit(2000)
    base = BS.score_candidates_with_encoder(pairs, offers)
    salted = BS.score_candidates_with_encoder(
        pairs, offers, salt_hot_ids=(4, 3)
    )
    assert salted.columns == base.columns
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(salted) == key(base)


def test_encoder_scorer_prebuilt_vocab_equals_self_built(spark, fixtures_dir):
    """Passing the (vocab, idf) pair built once outside — the bench's
    one-time-cost split (VERDICT r4 #1) — scores byte-identically to the
    self-contained build-from-offers path."""
    from productbert_intermediate_spark.operators import bert_scoring as BS
    from productbert_intermediate_spark.operators.scoring import (
        offer_blocking_text,
    )

    offers = extract_offers(spark.read.parquet(f"{fixtures_dir}/pages.parquet"))
    pairs = block_offers(offers).limit(2000)
    vocab, idf = BS.build_vocab_and_idf_from_corpus(
        offers.select(offer_blocking_text().alias("text")), min_df=2
    )
    pre = BS.score_candidates_with_encoder(
        pairs, offers, vocab=vocab, token_weights=idf
    )
    auto = BS.score_candidates_with_encoder(pairs, offers)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(pre) == key(auto)
