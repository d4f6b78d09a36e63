"""Encoder-seam scorer: determinism, decision shape, pluggability."""

import numpy as np

from productbert_intermediate_spark.functions.bert_encode import WordPieceVocab
from productbert_intermediate_spark.operators.bert_scoring import (
    make_default_frozen_encoder,
    score_pairs_with_encoder,
)

VOCAB = WordPieceVocab.from_tokens(
    [f"w{i}" for i in range(50)] + ["##x", "red", "fast", "car", "blue", "slow", "bike"]
)


def _pairs(spark):
    return spark.createDataFrame(
        [
            (1, "red fast car w1 w2", "red fast car w1 w2"),   # identical
            (2, "red fast car w1 w2", "red fast car w1 w3"),   # near-dup
            (3, "red fast car w1 w2", "blue slow bike w40 w41"),  # disjoint
        ],
        "pid long, a string, b string",
    )


def test_identical_beats_near_dup_beats_disjoint(spark):
    out = score_pairs_with_encoder(_pairs(spark), "a", "b", VOCAB, max_length=16)
    rows = {r["pid"]: r for r in out.collect()}
    assert rows[1]["score"] > rows[2]["score"] > rows[3]["score"]
    assert rows[1]["match"] and not rows[3]["match"]
    # identical segments → cosine 1 → logit scale*(1-0.5); float32 table
    assert abs(rows[1]["logit"] - 4.0) < 1e-5


def test_scoring_is_deterministic(spark):
    df = _pairs(spark)
    a = sorted(map(tuple, score_pairs_with_encoder(df, "a", "b", VOCAB, 16).collect()))
    b = sorted(map(tuple, score_pairs_with_encoder(df, "a", "b", VOCAB, 16).collect()))
    assert a == b


def test_custom_encoder_plugs_in(spark):
    def stub_encoder(ids, tt, am):
        # logit = +5 when the first content token ids agree, else -5
        return np.where(ids[:, 1] == ids[:, 1], 0, 0) + np.where(
            (ids[:, 1] != 0), 5.0, -5.0
        )

    out = score_pairs_with_encoder(
        _pairs(spark), "a", "b", VOCAB, max_length=16, encoder=stub_encoder
    )
    assert all(r["logit"] == 5.0 for r in out.collect())


def test_default_encoder_batch_semantics():
    enc = make_default_frozen_encoder(vocab_size=len(VOCAB.tokens))
    ids = np.array([[2, 4, 5, 3, 4, 5, 3, 0], [2, 4, 5, 3, 6, 7, 3, 0]], dtype=np.int32)
    tt = np.array([[0, 0, 0, 0, 1, 1, 1, 0]] * 2, dtype=np.int32)
    am = np.array([[1, 1, 1, 1, 1, 1, 1, 0]] * 2, dtype=np.int32)
    logits = enc(ids, tt, am)
    assert logits.shape == (2,)
    assert abs(logits[0] - 4.0) < 1e-6  # identical sides: cos=1 → 8*(1-0.5)
    assert logits[1] < logits[0]


def test_pretokenized_path_byte_identical_to_text_path(spark, fixtures_dir):
    """score_candidates_with_encoder (tokenize-once-per-offer) must emit
    exactly the rows the per-pair text path emits — logits compared
    bitwise, on real extracted offers and real blocked candidates."""
    from productbert_intermediate_spark.operators.blocking import block_offers
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.operators.scoring import (
        blocking_text,
        hydrate_pairs,
    )
    from productbert_intermediate_spark.operators.bert_scoring import (
        build_vocab_and_idf_from_corpus,
        score_candidates_with_encoder,
        score_pairs_with_encoder,
    )
    from productbert_intermediate_spark.operators.scoring import (
        offer_blocking_text,
    )
    from pyspark.sql import functions as F

    offers = extract_offers(
        spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    ).localCheckpoint()
    pairs = block_offers(offers).localCheckpoint()

    new = score_candidates_with_encoder(pairs, offers)

    corpus = offers.select(offer_blocking_text().alias("text"))
    vocab, idf = build_vocab_and_idf_from_corpus(corpus, min_df=2)
    texts = hydrate_pairs(
        pairs, offers, attrs=("title", "description")
    ).select(
        "id_l", "id_r",
        blocking_text("left").alias("_b_l"),
        blocking_text("right").alias("_b_r"),
    )
    old = score_pairs_with_encoder(
        texts, "_b_l", "_b_r", vocab, max_length=64,
        wordpiece=True, token_weights=idf,
    ).select("id_l", "id_r", "logit", "score", "match")

    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(new) == key(old)


def test_chunked_encoder_matches_per_row_forward():
    """The chunked default encoder (r6: small reused intermediates instead
    of one giant gather per batch) must be bit-identical to calling the
    forward one row at a time, across the chunk boundary."""
    rng = np.random.RandomState(7)
    n, seq, vs = 1300, 32, 200  # n > _CHUNK=512, spans 3 chunks
    enc = make_default_frozen_encoder(vs, token_weights=rng.rand(vs))
    ids = rng.randint(0, vs, size=(n, seq)).astype(np.int32)
    tt = (rng.rand(n, seq) > 0.5).astype(np.int32)
    am = (rng.rand(n, seq) > 0.1).astype(np.int32)
    whole = enc(ids, tt, am)
    per_row = np.concatenate(
        [enc(ids[i : i + 1], tt[i : i + 1], am[i : i + 1]) for i in range(n)]
    )
    assert np.array_equal(whole, per_row)


def test_inlined_pair_assembly_matches_prepare_for_model(spark):
    """score_pretokenized_pairs' in-place row assembly (r6) must reproduce
    prepare_for_model exactly, including truncation and None sides, and
    output_cols must drop passthrough columns without changing values."""
    import pandas as pd

    from productbert_intermediate_spark.functions.bert_encode import (
        prepare_for_model,
    )
    from productbert_intermediate_spark.operators.bert_scoring import (
        score_pretokenized_pairs,
    )

    rng = np.random.RandomState(11)
    max_length = 16
    rows = []
    for i in range(40):
        la = int(rng.randint(0, 25))
        lb = int(rng.randint(0, 25))
        a = [int(x) for x in rng.randint(0, 50, size=la)] if la else []
        b = [int(x) for x in rng.randint(0, 50, size=lb)] if lb else []
        if i % 10 == 7:
            a = None
        if i % 10 == 9:
            b = None
        rows.append((i, a, b))
    df = spark.createDataFrame(
        rows, "pid long, a array<int>, b array<int>"
    )
    got = {
        r["pid"]: r
        for r in score_pretokenized_pairs(
            df, "a", "b", VOCAB, max_length=max_length,
            output_cols=("pid",),
        ).collect()
    }
    assert set(got[0].asDict()) == {"pid", "logit", "score", "match"}

    # reference: prepare_for_model + the unchunked original forward
    enc = make_default_frozen_encoder(len(VOCAB.tokens))
    for pid, a, b in rows:
        e = prepare_for_model(a or [], b or [], max_length, VOCAB)
        ids = np.array([e["input_ids"]], dtype=np.int32)
        tt = np.array([e["token_type_ids"]], dtype=np.int32)
        am = np.array([e["attention_mask"]], dtype=np.int32)
        logit = float(enc(ids, tt, am)[0])
        assert got[pid]["logit"] == logit, pid
