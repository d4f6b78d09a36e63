"""BERT tokenizer/pair-encoder golden tests (HF BertTokenizer parity).

Expected values are HuggingFace's own documented/unit-tested behaviors for
BasicTokenizer + WordPieceTokenizer + prepare_for_model(longest_first,
pad_to_max_length) — the exact surface the reference calls
(process_to_bert.py:71-114).
"""

import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.functions.bert_encode import (
    WordPieceVocab,
    basic_tokenize,
    convert_tokens_to_ids,
    encode_pair_text,
    encode_pairs,
    prepare_for_model,
    tokenize,
    truncate_longest_first,
    wordpiece_tokenize,
)

VOCAB = WordPieceVocab.from_tokens(
    ["want", "##want", "##ed", "wa", "un", "runn", "##ing", "hello", "!", "?"]
)


def test_basic_tokenizer_lower_punct_whitespace():
    # HF BasicTokenizer(do_lower_case=True) canonical unit-test vector
    assert basic_tokenize("HeLLo!how  \n Are yoU?") == [
        "hello", "!", "how", "are", "you", "?",
    ]


def test_basic_tokenizer_strips_accents():
    assert basic_tokenize("Héllo") == ["hello"]
    assert basic_tokenize("naïve café") == ["naive", "cafe"]


def test_basic_tokenizer_drops_control_chars_and_isolates_cjk():
    assert basic_tokenize("ab\x00cd�ef") == ["abcdef"]
    assert basic_tokenize("ab中文cd") == ["ab", "中", "文", "cd"]


def test_wordpiece_greedy_longest_match():
    # HF WordpieceTokenizer canonical unit-test vector
    assert tokenize("unwanted running", VOCAB) == [
        "un", "##want", "##ed", "runn", "##ing",
    ]


def test_wordpiece_unmatchable_token_is_unk():
    assert wordpiece_tokenize("unwantedx", VOCAB) == ["[UNK]"]
    assert tokenize("unwantedx running", VOCAB) == ["[UNK]", "runn", "##ing"]


def test_wordpiece_over_100_chars_is_unk():
    assert wordpiece_tokenize("a" * 101, VOCAB) == ["[UNK]"]


def test_convert_tokens_to_ids():
    # specials occupy 0-3; first vocab token gets 4
    assert VOCAB.tokens["[PAD]"] == 0 and VOCAB.tokens["[UNK]"] == 1
    assert convert_tokens_to_ids(["want", "nope"], VOCAB) == [4, 1]


def _iterative_truncate(la: int, lb: int, budget: int) -> tuple[int, int]:
    """HF truncate_sequences('longest_first'): one token per step off the
    longer side, ties off the pair side."""
    while la + lb > budget:
        if la > lb:
            la -= 1
        else:
            lb -= 1
    return la, lb


@pytest.mark.parametrize("la", range(0, 25, 3))
@pytest.mark.parametrize("lb", range(0, 25, 3))
@pytest.mark.parametrize("budget", [1, 2, 7, 13, 29])
def test_truncation_closed_form_matches_iterative_rule(la, lb, budget):
    assert truncate_longest_first(la, lb, budget) == _iterative_truncate(la, lb, budget)


def test_prepare_for_model_no_truncation():
    out = prepare_for_model([5, 6, 7], [8, 9], max_length=10, vocab=VOCAB)
    assert out["input_ids"] == [2, 5, 6, 7, 3, 8, 9, 3, 0, 0]
    assert out["token_type_ids"] == [0, 0, 0, 0, 0, 1, 1, 1, 0, 0]
    assert out["attention_mask"] == [1, 1, 1, 1, 1, 1, 1, 1, 0, 0]


def test_prepare_for_model_longest_first_truncation():
    # budget 5: (5,5) -> (3,2) per the tie-removes-pair rule
    out = prepare_for_model([1, 2, 3, 4, 5], [6, 7, 8, 9, 10], 8, VOCAB)
    assert out["input_ids"] == [2, 1, 2, 3, 3, 6, 7, 3]
    assert out["token_type_ids"] == [0, 0, 0, 0, 0, 1, 1, 1]
    assert out["attention_mask"] == [1] * 8


def test_encode_pair_text_end_to_end():
    out = encode_pair_text("unwanted running", "hello!", VOCAB, max_length=12)
    ids = convert_tokens_to_ids(["un", "##want", "##ed", "runn", "##ing"], VOCAB)
    ids_b = convert_tokens_to_ids(["hello", "!"], VOCAB)
    assert out["input_ids"] == [2, *ids, 3, *ids_b, 3, 0, 0]


def test_encode_pairs_dataframe_stage(spark):
    pairs = spark.createDataFrame(
        [(1, "unwanted running", "hello!"), (2, "wa want", "unwantedx")],
        "pid long, a string, b string",
    )
    out = encode_pairs(pairs, "a", "b", VOCAB, max_length=12).select(
        "pid", "encoded.input_ids", "encoded.token_type_ids", "encoded.attention_mask"
    )
    rows = {r["pid"]: r for r in out.collect()}
    expect1 = encode_pair_text("unwanted running", "hello!", VOCAB, 12)
    assert rows[1]["input_ids"] == expect1["input_ids"]
    assert rows[1]["token_type_ids"] == expect1["token_type_ids"]
    assert rows[1]["attention_mask"] == expect1["attention_mask"]
    assert rows[2]["input_ids"][:6] == [2, VOCAB.tokens["wa"], VOCAB.tokens["want"], 3, 1, 3]
