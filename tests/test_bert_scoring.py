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
