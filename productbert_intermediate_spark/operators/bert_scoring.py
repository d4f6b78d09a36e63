"""Transformer-shaped pair scoring over encoded token ids (SURVEY §2.7 M1).

The reference's matcher is a frozen fine-tuned BERT + linear head applied to
prepare_for_model output, thresholded at sigmoid>0.5
(/root/reference/src/productbert/model/model.py:28-55, model/metric.py:21-27,
test.py:54-81). This stage reproduces that EXECUTION SHAPE on Spark:

    pair texts → tokenize + pair-encode (P14) → frozen encoder over
    (input_ids, token_type_ids, attention_mask) batches → logit → sigmoid
    → 0.5 threshold

as ONE iterator ``mapInPandas`` pass: the tokenizer vocabulary is broadcast,
the encoder is initialized once per task and reused across Arrow batches
(the Spark analog of DataLoader workers holding a loaded model), and only
ids/texts cross the Arrow boundary.

The encoder is pluggable: any callable (input_ids, token_type_ids,
attention_mask) → logits over int32 [batch, seq] arrays. The default is an
honestly-labeled stand-in for BERT weights (this sandbox has no torch/HF):
a deterministic frozen random projection of each segment's bag-of-ids,
cosine-compared and affinely mapped to a logit. Swapping in a real
transformer changes only the callable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BooleanType, DoubleType, StructField, StructType

from ..functions.bert_encode import WordPieceVocab, encode_pair_text

EncoderFn = Callable[[np.ndarray, np.ndarray, np.ndarray], np.ndarray]


def make_default_frozen_encoder(
    vocab_size: int, dim: int = 64, seed: int = 42, scale: float = 8.0
) -> EncoderFn:
    """Deterministic frozen stand-in for a fine-tuned transformer encoder.

    Embeds each segment (token_type 0 vs 1, [PAD]/[CLS]/[SEP] masked out) as
    the L2-normalized sum of frozen random token vectors and returns
    logit = scale·(cosine − 0.5) — the same calibrated-threshold decision
    shape as the reference's pooler+linear head. NOT a trained model; the
    seam exists so real weights can be dropped in.
    """
    rng = np.random.RandomState(seed)
    table = rng.normal(size=(vocab_size, dim)).astype(np.float32)

    def encoder(
        input_ids: np.ndarray, token_type_ids: np.ndarray, attention_mask: np.ndarray
    ) -> np.ndarray:
        # content tokens only: mask PAD/CLS/SEP, keep vocabulary ids and UNK
        real = (attention_mask == 1) & ((input_ids >= 4) | (input_ids == 1))
        vecs = table[np.clip(input_ids, 0, vocab_size - 1)]
        side0 = (real & (token_type_ids == 0))[..., None] * vecs
        side1 = (real & (token_type_ids == 1))[..., None] * vecs
        a = side0.sum(axis=1)
        b = side1.sum(axis=1)
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(b, axis=1)
        denom = np.where((na > 0) & (nb > 0), na * nb, 1.0)
        cos = np.einsum("ij,ij->i", a, b) / denom
        return (scale * (cos - 0.5)).astype(np.float64)

    return encoder


def score_pairs_with_encoder(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    vocab: WordPieceVocab,
    max_length: int = 128,
    encoder: EncoderFn | None = None,
    wordpiece: bool = True,
    threshold: float = 0.5,
) -> DataFrame:
    """pairs(+texts) → + (logit, score, match) via encode → frozen encoder.

    One mapInPandas stage; passthrough columns are preserved. The encoder
    factory default is built lazily INSIDE the task (once per task, reused
    for every Arrow batch it serves) so heavyweight weights never serialize
    through the driver per-batch.
    """
    spark = pairs.sparkSession
    bc_vocab = spark.sparkContext.broadcast(vocab)
    vocab_size = len(vocab.tokens)
    # fresh StructType — DataFrame.schema returns the df's cached schema
    # object and StructType.add mutates in place
    out_schema = StructType(
        list(pairs.schema.fields)
        + [
            StructField("logit", DoubleType()),
            StructField("score", DoubleType()),
            StructField("match", BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = bc_vocab.value
        enc = encoder or make_default_frozen_encoder(vocab_size)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = np.zeros((n, max_length), dtype=np.int32)
            tt = np.zeros((n, max_length), dtype=np.int32)
            am = np.zeros((n, max_length), dtype=np.int32)
            for i, (a, b) in enumerate(zip(pdf[left_col], pdf[right_col])):
                e = encode_pair_text(a, b, v, max_length, wordpiece)
                ids[i] = e["input_ids"]
                tt[i] = e["token_type_ids"]
                am[i] = e["attention_mask"]
            logit = enc(ids, tt, am)
            score = 1.0 / (1.0 + np.exp(-logit))
            out = pdf.copy()
            out["logit"] = logit
            out["score"] = score
            out["match"] = score > threshold
            yield out

    return pairs.mapInPandas(run, schema=out_schema)
