"""BERT-style tokenization + pair encoding (SURVEY.md §2.2 P14, §2.7 M1).

The reference encodes candidate pairs with a HuggingFace BertTokenizer:
per-side ``tokenizer.convert_tokens_to_ids(tokenizer.tokenize(x))`` followed
by ``tokenizer.prepare_for_model(left_ids, right_ids, max_length,
pad_to_max_length=True)`` (/root/reference/src/processing/process-bert/
process_to_bert.py:71-114,152-159,193-202). This module reimplements that
public tokenizer contract from its documented behavior — no transformers
dependency exists in this sandbox — and exposes it as an Arrow-batched
pandas UDF over pair text columns:

* basic tokenization: control-char cleanup, whitespace split, lowercase +
  accent stripping (NFD, drop Mn), punctuation split, CJK isolation;
* WordPiece: greedy longest-match-first with ``##`` continuations,
  per-token 100-char guard → [UNK];
* pair assembly: [CLS] a [SEP] b [SEP], token_type_ids 0…0 1…1,
  longest-first truncation to max_length, attention mask, [PAD] fill.

Longest-first truncation removes one token at a time from the currently
longer side (ties remove from the right/pair side). That loop has the
closed form used here: with budget B = max_length - 3,
``keep_a = min(len_a, max(B - len_b, ceil(B/2)))``, ``keep_b = B - keep_a``
— O(1) instead of O(overflow), bit-identical to the iterative rule.

The tokenizer mode is pluggable: ``wordpiece=True`` is the reference path;
``wordpiece=False`` does whitespace-split + vocabulary lookup only, which is
SQL-expressible and is what the driver's ``bert_pair_encode`` oracle checks.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType


# --------------------------------------------------------------- vocabulary


@dataclass(frozen=True)
class WordPieceVocab:
    """token → id table with the four reserved specials."""

    tokens: dict[str, int] = field(default_factory=dict)
    pad_token: str = "[PAD]"
    unk_token: str = "[UNK]"
    cls_token: str = "[CLS]"
    sep_token: str = "[SEP]"

    @property
    def pad_id(self) -> int:
        return self.tokens[self.pad_token]

    @property
    def unk_id(self) -> int:
        return self.tokens[self.unk_token]

    @property
    def cls_id(self) -> int:
        return self.tokens[self.cls_token]

    @property
    def sep_id(self) -> int:
        return self.tokens[self.sep_token]

    @staticmethod
    def from_tokens(vocab_tokens: list[str]) -> "WordPieceVocab":
        """Specials at ids 0-3, then the given tokens in the given order."""
        tokens = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
        for t in vocab_tokens:
            if t not in tokens:
                tokens[t] = len(tokens)
        return WordPieceVocab(tokens)


# --------------------------------------------------- basic tokenizer (HF parity)


def _is_whitespace(ch: str) -> bool:
    return ch in " \t\n\r" or unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in "\t\n\r":
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if 33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96 or 123 <= cp <= 126:
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def _strip_accents(text: str) -> str:
    return "".join(
        ch for ch in unicodedata.normalize("NFD", text)
        if unicodedata.category(ch) != "Mn"
    )


def basic_tokenize(text: str, do_lower_case: bool = True) -> list[str]:
    """HF BasicTokenizer behavior: clean, CJK-isolate, lower+de-accent,
    punctuation-split."""
    cleaned = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        if _is_cjk(cp):
            cleaned.append(f" {ch} ")
        elif _is_whitespace(ch):
            cleaned.append(" ")
        else:
            cleaned.append(ch)
    out: list[str] = []
    for tok in "".join(cleaned).split():
        if do_lower_case:
            tok = _strip_accents(tok.lower())
        # split punctuation chars into standalone tokens
        buf = ""
        for ch in tok:
            if _is_punctuation(ch):
                if buf:
                    out.append(buf)
                    buf = ""
                out.append(ch)
            else:
                buf += ch
        if buf:
            out.append(buf)
    return out


# ------------------------------------------------------ WordPiece (HF parity)

_MAX_CHARS_PER_WORD = 100


def wordpiece_tokenize(word: str, vocab: WordPieceVocab) -> list[str]:
    """Greedy longest-match-first subword split with ## continuations."""
    if len(word) > _MAX_CHARS_PER_WORD:
        return [vocab.unk_token]
    pieces: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab.tokens:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [vocab.unk_token]
        pieces.append(cur)
        start = end
    return pieces


def tokenize(text: str, vocab: WordPieceVocab, wordpiece: bool = True) -> list[str]:
    """Full tokenize: basic (+WordPiece when enabled). wordpiece=False is
    plain whitespace split (the SQL-expressible oracle mode)."""
    if not wordpiece:
        # split on single spaces (NOT whitespace runs): the oracle mode must
        # mirror SQL string_split(text, ' '), where consecutive spaces yield
        # empty tokens that resolve to [UNK] on both engines.
        return text.split(" ") if text else []
    out: list[str] = []
    for tok in basic_tokenize(text or ""):
        out.extend(wordpiece_tokenize(tok, vocab))
    return out


def convert_tokens_to_ids(tokens: list[str], vocab: WordPieceVocab) -> list[int]:
    unk = vocab.unk_id
    return [vocab.tokens.get(t, unk) for t in tokens]


# ----------------------------------------------------------- pair assembly


def truncate_longest_first(len_a: int, len_b: int, budget: int) -> tuple[int, int]:
    """Kept lengths under HF 'longest_first' truncation (closed form).

    Iterative rule: drop one token from the longer side per step, ties drop
    from b. Closed form: keep_a = min(len_a, max(budget - len_b,
    ceil(budget/2))); keep_b = budget - keep_a.
    """
    if len_a + len_b <= budget:
        return len_a, len_b
    keep_a = min(len_a, max(budget - len_b, (budget + 1) // 2))
    return keep_a, budget - keep_a


def prepare_for_model(
    ids_a: list[int],
    ids_b: list[int],
    max_length: int,
    vocab: WordPieceVocab,
) -> dict[str, list[int]]:
    """[CLS] a [SEP] b [SEP] + type ids + attention mask, padded to max_length
    (the reference's tokenizer.prepare_for_model(..., pad_to_max_length=True),
    process_to_bert.py:107-114)."""
    budget = max_length - 3
    ka, kb = truncate_longest_first(len(ids_a), len(ids_b), budget)
    a, b = ids_a[:ka], ids_b[:kb]
    input_ids = [vocab.cls_id, *a, vocab.sep_id, *b, vocab.sep_id]
    token_type_ids = [0] * (ka + 2) + [1] * (kb + 1)
    n = len(input_ids)
    attention_mask = [1] * n
    if n < max_length:
        pad = max_length - n
        input_ids += [vocab.pad_id] * pad
        token_type_ids += [0] * pad
        attention_mask += [0] * pad
    return {
        "input_ids": input_ids,
        "token_type_ids": token_type_ids,
        "attention_mask": attention_mask,
    }


def encode_pair_text(
    text_a: str | None,
    text_b: str | None,
    vocab: WordPieceVocab,
    max_length: int,
    wordpiece: bool = True,
) -> dict[str, list[int]]:
    ids_a = convert_tokens_to_ids(tokenize(text_a or "", vocab, wordpiece), vocab)
    ids_b = convert_tokens_to_ids(tokenize(text_b or "", vocab, wordpiece), vocab)
    return prepare_for_model(ids_a, ids_b, max_length, vocab)


# ------------------------------------------------------------- Spark surface

PAIR_ENCODE_SCHEMA = StructType(
    [
        StructField("input_ids", ArrayType(IntegerType())),
        StructField("token_type_ids", ArrayType(IntegerType())),
        StructField("attention_mask", ArrayType(IntegerType())),
    ]
)


def make_pair_encode_udf(vocab_broadcast, max_length: int, wordpiece: bool = True):
    """Arrow-batched pair encoder; the vocabulary crosses the wire once per
    executor via the broadcast (the analog of the reference loading its
    tokenizer once before the encode loop)."""

    @pandas_udf(PAIR_ENCODE_SCHEMA)
    def pair_encode(a: pd.Series, b: pd.Series) -> pd.DataFrame:  # pragma: no cover
        vocab = vocab_broadcast.value
        rows = [
            encode_pair_text(x, y, vocab, max_length, wordpiece)
            for x, y in zip(a.tolist(), b.tolist())
        ]
        return pd.DataFrame.from_records(rows)

    return pair_encode


def encode_pairs(
    pairs,
    left_col: str,
    right_col: str,
    vocab: WordPieceVocab,
    max_length: int = 128,
    wordpiece: bool = True,
    output_col: str = "encoded",
):
    """DataFrame stage: add struct(input_ids, token_type_ids, attention_mask).

    One Arrow crossing per batch; tokenizer state is broadcast, never
    rebuilt per row. Feed the result to any frozen pairwise encoder.
    """
    bc = pairs.sparkSession.sparkContext.broadcast(vocab)
    udf = make_pair_encode_udf(bc, max_length, wordpiece)
    return pairs.withColumn(output_col, udf(F.col(left_col), F.col(right_col)))
