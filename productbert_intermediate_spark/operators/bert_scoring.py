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
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.bert_encode import (
    WordPieceVocab,
    basic_tokenize,
    convert_tokens_to_ids,
    prepare_for_model,
    tokenize,
    wordpiece_tokenize,
)

EncoderFn = Callable[[np.ndarray, np.ndarray, np.ndarray], np.ndarray]


def make_default_frozen_encoder(
    vocab_size: int,
    dim: int = 64,
    seed: int = 42,
    scale: float = 8.0,
    token_weights: np.ndarray | None = None,
) -> EncoderFn:
    """Deterministic frozen stand-in for a fine-tuned transformer encoder.

    Embeds each segment (token_type 0 vs 1, [PAD]/[CLS]/[SEP] masked out) as
    the L2-normalized sum of frozen random token vectors and returns
    logit = scale·(cosine − 0.5) — the same calibrated-threshold decision
    shape as the reference's pooler+linear head. NOT a trained model; the
    seam exists so real weights can be dropped in.

    ``token_weights`` (shape [vocab_size]) scales each token's vector —
    pass corpus IDF so rare discriminative tokens (model codes) dominate the
    cosine over shared boilerplate, the hand-rolled analog of the attention
    weighting a fine-tuned matcher learns. None keeps uniform weights.
    """
    rng = np.random.RandomState(seed)
    table = rng.normal(size=(vocab_size, dim)).astype(np.float32)
    if token_weights is not None:
        table = table * np.asarray(token_weights, dtype=np.float32)[:, None]

    # Rows are independent, so the batch is processed in fixed-size chunks:
    # the [chunk, seq, dim] intermediates stay a few MB and the allocator
    # reuses them, instead of one [batch, seq, dim] gather per side
    # (~165 MB each at 10k x 64 x 64). Measured: the large allocations are
    # first-touch page-faulted on every batch, and with 32 local workers
    # faulting concurrently the kernel zone locks serialize them — the
    # bench's entire 30-45s "cold encoder" overhead was this (guide §5:
    # what tasks hold in memory; 1230s cold vs 49s warm CPU in the forward
    # alone, scripts/enc_cold_probe.py). Chunking is bit-identical: every
    # per-row value is computed by the same ops in the same order.
    _CHUNK = 512

    def _fwd_chunk(
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

    def encoder(
        input_ids: np.ndarray, token_type_ids: np.ndarray, attention_mask: np.ndarray
    ) -> np.ndarray:
        n = len(input_ids)
        if n <= _CHUNK:
            return _fwd_chunk(input_ids, token_type_ids, attention_mask)
        out = np.empty(n, dtype=np.float64)
        for s in range(0, n, _CHUNK):
            e = min(n, s + _CHUNK)
            out[s:e] = _fwd_chunk(
                input_ids[s:e], token_type_ids[s:e], attention_mask[s:e]
            )
        return out

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
    token_weights: np.ndarray | None = None,
) -> DataFrame:
    """pairs(+texts) → + (logit, score, match) via encode → frozen encoder.

    One mapInPandas stage; passthrough columns are preserved. The encoder
    factory default is built lazily INSIDE the task (once per task, reused
    for every Arrow batch it serves) so heavyweight weights never serialize
    through the driver per-batch. ``token_weights`` (e.g. corpus IDF) rides
    a broadcast — ~4 bytes/token — and the [vocab, dim] embedding table is
    derived from it in-task; passing a table-capturing ``encoder`` closure
    instead would pickle the whole table into every task command.
    """
    spark = pairs.sparkSession
    bc_vocab = spark.sparkContext.broadcast(vocab)
    bc_weights = spark.sparkContext.broadcast(token_weights)
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
        enc = encoder or make_default_frozen_encoder(
            vocab_size, token_weights=bc_weights.value
        )
        # text→ids memo, per task: hot offers appear in MANY pairs of the
        # same partition (more so under id_l-partitioned input), so the
        # tokenize+WordPiece cost — the dominant per-pair Python work —
        # runs once per distinct text, not once per pair side. Bounded:
        # past 1M distinct texts new ones are encoded without caching
        # (results are identical either way — this is a pure memo).
        memo: dict[str, list[int]] = {}

        def ids_of(t) -> list[int]:
            t = t or ""
            got = memo.get(t)
            if got is None:
                got = convert_tokens_to_ids(tokenize(t, v, wordpiece), v)
                if len(memo) < 1_000_000:
                    memo[t] = got
            return got

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = np.zeros((n, max_length), dtype=np.int32)
            tt = np.zeros((n, max_length), dtype=np.int32)
            am = np.zeros((n, max_length), dtype=np.int32)
            for i, (a, b) in enumerate(zip(pdf[left_col], pdf[right_col])):
                e = prepare_for_model(ids_of(a), ids_of(b), max_length, v)
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


def make_tokenize_ids_udf(vocab_broadcast, wordpiece: bool = True):
    """Arrow-batched text → token-id-array UDF (tokenize + WordPiece +
    id-convert, NO truncation/padding — that's per-pair state).

    Used to tokenize each OFFER once; the per-pair stage then only
    assembles [CLS] a [SEP] b [SEP] from the precomputed ids. A word-level
    memo (word → subword ids) lives in the UDF closure, OUTSIDE the
    per-batch function: pandas_udf invokes ``tok_ids`` once per Arrow
    batch, so a memo created inside it would reset every batch (ADVICE r4);
    in the closure it persists for the life of the deserialized UDF in the
    Python worker — product text re-uses a small vocabulary heavily, so
    greedy WordPiece matching (the expensive inner loop) runs once per
    distinct word per worker, amortized across every batch it serves.
    Sound because one UDF instance sees exactly one vocabulary broadcast.
    """
    word_memo: dict[str, list[int]] = {}

    @pandas_udf(ArrayType(IntegerType()))
    def tok_ids(s: pd.Series) -> pd.Series:  # pragma: no cover - executor
        v = vocab_broadcast.value
        get_id = v.tokens.get
        unk = v.unk_id

        def word_ids(w: str) -> list[int]:
            got = word_memo.get(w)
            if got is None:
                if wordpiece:
                    got = [get_id(p, unk) for p in wordpiece_tokenize(w, v)]
                else:
                    got = [get_id(w, unk)]
                if len(word_memo) < 2_000_000:
                    word_memo[w] = got
            return got

        def text_ids(t) -> list[int]:
            if not wordpiece:
                # oracle mode mirrors tokenize(wordpiece=False): split on
                # single spaces, empty tokens resolve to [UNK]
                words = (t or "").split(" ") if t else []
            else:
                words = basic_tokenize(t or "")
            out: list[int] = []
            for w in words:
                out.extend(word_ids(w))
            return out

        return s.map(text_ids)

    return tok_ids


def score_pretokenized_pairs(
    pairs: DataFrame,
    left_ids_col: str,
    right_ids_col: str,
    vocab: WordPieceVocab,
    max_length: int = 128,
    encoder: EncoderFn | None = None,
    threshold: float = 0.5,
    token_weights: np.ndarray | None = None,
    output_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """score_pairs_with_encoder over PRE-tokenized id arrays: per pair only
    truncate/assemble/pad (prepare_for_model) + the encoder forward run —
    tokenization cost scales with |offers|, not |pairs|. Output is
    byte-identical to the text path (asserted in tests/test_bert_scoring).

    ``output_cols`` narrows the passthrough columns of the OUTPUT (default:
    all input columns). Spark cannot column-prune through mapInPandas, so
    without this the big token-id arrays are serialized back JVM-ward in
    every batch only to be dropped by the caller's select (guide §4.1:
    control how many columns cross the boundary — both ways).
    """
    spark = pairs.sparkSession
    bc_vocab = spark.sparkContext.broadcast(vocab)
    bc_weights = spark.sparkContext.broadcast(token_weights)
    vocab_size = len(vocab.tokens)
    keep = (
        list(pairs.columns)
        if output_cols is None
        else [c for c in pairs.columns if c in output_cols]
    )
    out_schema = StructType(
        [pairs.schema[c] for c in keep]
        + [
            StructField("logit", DoubleType()),
            StructField("score", DoubleType()),
            StructField("match", BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = bc_vocab.value
        enc = encoder or make_default_frozen_encoder(
            vocab_size, token_weights=bc_weights.value
        )
        # Inlined prepare_for_model (bit-identical, pinned by test): write
        # each pair's [CLS] a [SEP] b [SEP] row straight into the batch
        # arrays instead of building three Python lists + a dict per pair —
        # the assembly loop is the stage's dominant per-pair Python cost.
        cls_id, sep_id, pad_id = v.cls_id, v.sep_id, v.pad_id
        budget = max_length - 3
        half = (budget + 1) // 2
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            if pad_id == 0:
                ids = np.zeros((n, max_length), dtype=np.int32)
            else:  # pragma: no cover - WordPieceVocab pins PAD at 0
                ids = np.full((n, max_length), pad_id, dtype=np.int32)
            tt = np.zeros((n, max_length), dtype=np.int32)
            am = np.zeros((n, max_length), dtype=np.int32)
            for i, (a, b) in enumerate(
                zip(pdf[left_ids_col], pdf[right_ids_col])
            ):
                la = 0 if a is None else len(a)
                lb = 0 if b is None else len(b)
                if la + lb <= budget:
                    ka, kb = la, lb
                else:
                    ka = min(la, max(budget - lb, half))
                    kb = budget - ka
                row = ids[i]
                row[0] = cls_id
                if ka:
                    row[1 : ka + 1] = a[:ka]
                row[ka + 1] = sep_id
                if kb:
                    row[ka + 2 : ka + kb + 2] = b[:kb]
                row[ka + kb + 2] = sep_id
                tt[i, ka + 2 : ka + kb + 3] = 1
                am[i, : ka + kb + 3] = 1
            logit = enc(ids, tt, am)
            score = 1.0 / (1.0 + np.exp(-logit))
            out = pdf[keep].copy() if len(keep) < len(pdf.columns) else pdf.copy()
            out["logit"] = logit
            out["score"] = score
            out["match"] = score > threshold
            yield out

    return pairs.mapInPandas(run, schema=out_schema)


# ------------------------------------------------- pipeline-level wiring


def _corpus_token_df(
    texts: DataFrame, text_col: str, min_df: int, max_vocab: int
) -> DataFrame:
    """Shared vocabulary plan: basic-tokenize each text (the SAME tokenizer
    the encoder applies at scoring time — lowercase, accent-strip,
    punctuation-split), explode distinct tokens, keep df ≥ min_df, top
    max_vocab with ties broken by token text so the result is identical at
    any parallelism. ONE definition — both vocabulary entry points consume
    it, so the tokenize/df/tie-break contract cannot drift between them."""

    @pandas_udf(ArrayType(StringType()))
    def _basic_tok(s: pd.Series) -> pd.Series:  # pragma: no cover - executor
        return s.map(lambda t: basic_tokenize(t) if t else [])

    toks = texts.select(
        F.explode(F.array_distinct(_basic_tok(F.col(text_col)))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .orderBy(F.col("df").desc(), F.col("token"))
        .limit(max_vocab)
    )


def build_vocab_from_corpus(
    texts: DataFrame,
    text_col: str = "text",
    min_df: int = 2,
    max_vocab: int = 200_000,
) -> WordPieceVocab:
    """Word-level tokenizer vocabulary from a text corpus, distributed.

    The reference ships a pretrained WordPiece vocab file with its
    fine-tuned checkpoint (process_to_bert.py loads BertTokenizer from a
    model dir); this engine has no checkpoint to load, so the vocabulary is
    derived from the corpus itself (see _corpus_token_df for the plan).
    The driver collect is bounded by max_vocab (BERT vocabularies are ~30k;
    200k word rows ≈ a few MB), never by corpus size.
    """
    rows = _corpus_token_df(texts, text_col, min_df, max_vocab).collect()
    return WordPieceVocab.from_tokens(sorted(r["token"] for r in rows))


def build_vocab_and_idf_from_corpus(
    texts: DataFrame,
    text_col: str = "text",
    min_df: int = 2,
    max_vocab: int = 200_000,
) -> tuple[WordPieceVocab, np.ndarray]:
    """Vocabulary plus an id-aligned IDF weight vector, one distributed pass.

    idf[id] = ln((N + 1) / (df + 1)) + 1 (smoothed, sklearn's formula) for
    vocabulary tokens; the four specials get weight 0 — [PAD]/[CLS]/[SEP]
    are masked by the encoder anyway, and [UNK] weight 0 stops two
    *different* out-of-vocabulary tokens (which share the single UNK vector)
    from reading as a match. Same plan and scale bounds as
    build_vocab_from_corpus (shared via _corpus_token_df).

    n_docs rides an ``observe()`` on the corpus scan the vocabulary job
    already makes, instead of a second full corpus pass (guide §1.2:
    remove passes) — the metric is exact (every row flows through the
    token aggregation before the limit).
    """
    from pyspark.sql import Observation

    obs = Observation()
    rows = _corpus_token_df(
        texts.observe(obs, F.count(F.lit(1)).alias("n_docs")),
        text_col,
        min_df,
        max_vocab,
    ).collect()
    n_docs = int(obs.get["n_docs"])
    df_of = {r["token"]: r["df"] for r in rows}
    vocab = WordPieceVocab.from_tokens(sorted(df_of))
    idf = np.zeros(len(vocab.tokens), dtype=np.float32)
    for tok, tid in vocab.tokens.items():
        if tid >= 4:
            idf[tid] = np.log((n_docs + 1.0) / (df_of[tok] + 1.0)) + 1.0
    return vocab, idf


def score_candidates_with_encoder(
    pairs: DataFrame,
    offers: DataFrame,
    vocab: WordPieceVocab | None = None,
    max_length: int = 64,
    encoder: EncoderFn | None = None,
    vocab_min_df: int = 2,
    threshold: float = 0.5,
    broadcast_offers: bool = False,
    token_weights: np.ndarray | None = None,
    salt_hot_ids: tuple[int, int] | None = None,
) -> DataFrame:
    """Candidate (id_l, id_r) pairs → (id_l, id_r, logit, score, match) via
    the transformer-shaped path: hydrate pair texts → encode → frozen
    encoder → sigmoid → 0.5 threshold.

    This is the pipeline-level twin of scoring.score_candidates with the
    reference's actual decision stack (process_to_bert.py encode +
    model/model.py:28-55 forward + metric.py threshold) instead of the
    calibrated feature scorer. The pair text is the discriminative blocking
    text (title + first-5 description tokens, lowered — title_for_ts,
    sample_intermediate_training_sets.py:197-205): the stand-in encoder is
    a bag-of-token cosine, which full 100-token descriptions would drown in
    filler; a real fine-tuned BERT dropped into ``encoder`` can switch the
    hydrated text to scoring.build_sequence without touching this plumbing.

    Scale shape: one hydration join (exchange-reused, broadcast when small)
    carrying only ~100-byte texts, then one iterator mapInPandas — encoder
    state initialized once per task, ids/texts cross Arrow once per pair.

    ``token_weights`` rides along with an externally-built ``vocab`` (the
    pair ``build_vocab_and_idf_from_corpus`` returns), so a caller — the
    bench, a resumed pipeline — can pay the corpus vocabulary pass ONCE and
    score many candidate tables against it; leaving both None keeps the
    self-contained build-from-offers behavior.

    ``salt_hot_ids=(n_salts, hot_threshold)`` opts the streamed hydration
    into differential hot-id salting (hydrate_pairs_salted) — the same
    skew guard the logistic scorer has: an externally-supplied candidate
    table with one hub id otherwise concentrates that id's entire Arrow
    scoring workload in one task (VERDICT r4 #4). Ignored on the broadcast
    path, which has no shuffle to skew.
    """
    from .scoring import hydrate_pairs, hydrate_pairs_salted, offer_blocking_text

    idf = token_weights
    if vocab is None:
        # vocabulary over the SAME per-offer text the encoder will see;
        # when the encoder is also defaulted, its token vectors get corpus
        # IDF weights from the same pass (rare model-code tokens dominate
        # the cosine — the stand-in for learned attention)
        corpus = offers.select(offer_blocking_text().alias("text"))
        if encoder is None:
            # leave encoder=None and ship only the ~4-byte/token idf vector:
            # score_pretokenized_pairs broadcasts it and builds the
            # [vocab, dim] table lazily inside each task (the seam exists
            # for exactly this — an eager make_default_frozen_encoder here
            # would closure-capture up to ~50 MB into the task command)
            vocab, idf = build_vocab_and_idf_from_corpus(corpus, min_df=vocab_min_df)
        else:
            vocab = build_vocab_from_corpus(corpus, min_df=vocab_min_df)
    # tokenize-once-per-OFFER: WordPiece runs |offers| times here instead
    # of 2·|pairs| times in the scoring stage (the candidate:offer ratio is
    # 10-100× for real blockers); the hydration joins then carry the int32
    # id arrays (~4 B/token, comparable to the text they replace) and the
    # per-pair stage is only assemble + encoder forward. Byte-identical to
    # the text path — prepare_for_model consumes the same ids either way.
    bc_vocab = pairs.sparkSession.sparkContext.broadcast(vocab)
    offers_tok = offers.select(
        "id",
        make_tokenize_ids_udf(bc_vocab, wordpiece=True)(
            offer_blocking_text()
        ).alias("_tok"),
    )
    if salt_hot_ids is not None and not broadcast_offers:
        from .skew import salted_repartition_pairs

        n_salts, hot_threshold = salt_hot_ids
        # NO source re-level here (unlike the logistic path, which feeds an
        # id_l-partitioned feature builder): the salted hydration join's own
        # (id, salt) shuffle is the first thing pairs hit, and it spreads a
        # hot id by construction — a pre-shuffle would move the full pair
        # table once more for a layout the join immediately destroys
        # (measured: dropping it cut one of three exchanges on this path)
        hydrated = hydrate_pairs_salted(
            pairs, offers_tok, n_salts=n_salts, hot_threshold=hot_threshold,
            prepared=True, attrs=(), prepared_cols=("_tok",),
        )
        # hydration leaves a hot id spread over only n_salts partitions;
        # the Arrow stage's cost is per-ROW, so re-level by pair hash
        # before it (rows are ids + two int arrays — cheap shuffle)
        hydrated = salted_repartition_pairs(
            hydrated, pairs.sparkSession.sparkContext.defaultParallelism * 2
        )
    else:
        hydrated = hydrate_pairs(
            pairs, offers_tok, broadcast_offers=broadcast_offers,
            prepared=True, attrs=(), prepared_cols=("_tok",),
        )
    scored = score_pretokenized_pairs(
        hydrated, "_tok_left", "_tok_right", vocab,
        max_length=max_length, encoder=encoder,
        threshold=threshold, token_weights=idf,
        # only the ids ride back through Arrow — the token arrays would be
        # serialized JVM-ward and immediately dropped by the select below
        output_cols=("id_l", "id_r"),
    )
    return scored.select("id_l", "id_r", "logit", "score", "match")
