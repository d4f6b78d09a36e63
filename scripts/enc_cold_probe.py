"""Probe: where do the ~43s of the FIRST encoder forward pass go?

Workers append per-batch timings to /tmp/enc_probe.log (local mode: same
host). Run: python scripts/enc_cold_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from productbert_intermediate_spark.session import get_spark

LOG = "/tmp/enc_probe.log"


def main() -> None:
    from pyspark.sql import functions as F

    from productbert_intermediate_spark.operators import bert_scoring as BS
    from productbert_intermediate_spark.operators import blocking as B
    from productbert_intermediate_spark.operators import scoring as S
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.operators.scoring import offer_blocking_text

    if os.path.exists(LOG):
        os.remove(LOG)
    spark = get_spark("enc-probe", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    fx = "/tmp/spark_graft_bench_fixtures_20000"
    pages = spark.read.parquet(f"{fx}/pages.parquet")
    offers = extract_offers(pages).where(F.col("id").isNotNull())
    offers.cache(); offers.count()
    pairs = B.block_offers(offers)
    pairs.cache(); pairs.count()
    vocab, idf = BS.build_vocab_and_idf_from_corpus(
        offers.select(offer_blocking_text().alias("text")), min_df=2
    )
    bc_vocab = spark.sparkContext.broadcast(vocab)
    offers_tok = offers.select(
        "id",
        BS.make_tokenize_ids_udf(bc_vocab, wordpiece=True)(
            offer_blocking_text()
        ).alias("_tok"),
    )
    hydrated = S.hydrate_pairs(
        pairs, offers_tok, prepared=True, attrs=(), prepared_cols=("_tok",)
    )
    hyd = hydrated.cache()
    print("n_hyd", hyd.count(), flush=True)

    from productbert_intermediate_spark.functions.bert_encode import (
        prepare_for_model,
    )
    from pyspark.sql.types import (
        BooleanType, DoubleType, LongType, StructField, StructType,
    )

    vocab_size = len(vocab.tokens)
    bcv = spark.sparkContext.broadcast(vocab)
    bcw = spark.sparkContext.broadcast(idf)

    out_schema = StructType([
        StructField("id_l", LongType()),
        StructField("id_r", LongType()),
        StructField("logit", DoubleType()),
        StructField("score", DoubleType()),
        StructField("match", BooleanType()),
    ])

    def run(batches):
        t_start = time.time()
        pid = os.getpid()
        v = bcv.value
        t_bc = time.time()
        enc = BS.make_default_frozen_encoder(vocab_size, token_weights=bcw.value)
        t_enc = time.time()
        with open(LOG, "a") as f:
            f.write(
                f"task pid={pid} bc={t_bc - t_start:.3f} "
                f"encbuild={t_enc - t_bc:.3f} start={t_start:.3f}\n"
            )
        empty = []
        nb = 0
        for pdf in batches:
            t0 = time.time()
            n = len(pdf)
            if n == 0:
                continue
            ids = np.zeros((n, 64), dtype=np.int32)
            tt = np.zeros((n, 64), dtype=np.int32)
            am = np.zeros((n, 64), dtype=np.int32)
            t1 = time.time()
            for i, (a, b) in enumerate(zip(pdf["_tok_left"], pdf["_tok_right"])):
                e = prepare_for_model(
                    empty if a is None else a, empty if b is None else b, 64, v
                )
                ids[i] = e["input_ids"]
                tt[i] = e["token_type_ids"]
                am[i] = e["attention_mask"]
            t2 = time.time()
            logit = enc(ids, tt, am)
            score = 1.0 / (1.0 + np.exp(-logit))
            t3 = time.time()
            out = pd.DataFrame({
                "id_l": pdf["id_l"], "id_r": pdf["id_r"],
                "logit": logit, "score": score, "match": score > 0.5,
            })
            t4 = time.time()
            nb += 1
            with open(LOG, "a") as f:
                f.write(
                    f"batch pid={pid} n={n} recv={t1 - t0:.3f} "
                    f"prep={t2 - t1:.3f} fwd={t3 - t2:.3f} out={t4 - t3:.3f} "
                    f"at={t0:.3f}\n"
                )
            yield out
        with open(LOG, "a") as f:
            f.write(f"done pid={pid} nb={nb} at={time.time():.3f}\n")

    sel = hyd.select("id_l", "id_r", "_tok_left", "_tok_right")
    for rep in range(2):
        with open(LOG, "a") as f:
            f.write(f"=== rep {rep} wall_start={time.time():.3f}\n")
        t0 = time.time()
        sel.mapInPandas(run, schema=out_schema).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"rep {rep}: {time.time() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
