"""Golden byte-identity tests for the cleaning functions (FIXTURES.md T4)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from productbert_intermediate_spark.functions.cleaning import (
    clean_spec_py,
    clean_spec_series,
    clean_string_py,
    clean_string_series,
)
from tests.oracle_cleaning import oracle_clean_spec, oracle_clean_string

# FIXTURES.md T4 — adversarial inputs
ADVERSARIAL = [
    None,
    "",
    " ",
    "\t\n  \t",
    "no quotes at all",
    '"',  # exactly one quote
    'leading "only',
    'trailing" only',
    '""',
    '"x"',
    '"hello world"@en ',
    '"a"@en "b"@en',
    '"a"@en-US "b"@de-DE tail',
    '"multi\nline\tvalue"@en ',
    '"nbsp and thin"@en ',
    '"inner "quoted" text"@en ',
    '" surrounded by spaces "@en',
    'prefix "value"@en suffix',
    '"@en ',
    '"@en"@de ',
    '"tab\t\ttab"',
    '"ends with tag"@fr',
    '"unicode ß é 中文"@en ',
    '"a  b   c    d"@en ',
    '" "@en ',
    'just "one pair" here',
    '"v"@x y"w"',
]


@pytest.mark.parametrize("raw", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_clean_string_adversarial_scalar(raw):
    assert clean_string_py(raw) == oracle_clean_string(raw)


@pytest.mark.parametrize("raw", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_clean_string_adversarial_vectorized(raw):
    got = clean_string_series(pd.Series([raw], dtype="object"))[0]
    assert got == oracle_clean_string(raw)


@pytest.mark.parametrize("raw", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_clean_spec_adversarial(raw):
    assert clean_spec_py(raw) == oracle_clean_spec(raw)
    got = clean_spec_series(pd.Series([raw], dtype="object"))[0]
    assert got == oracle_clean_spec(raw)


_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=80,
)


@given(st.lists(st.one_of(st.none(), _text), min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_clean_string_property(batch):
    got = clean_string_series(pd.Series(batch, dtype="object")).tolist()
    want = [oracle_clean_string(x) for x in batch]
    assert got == want


@given(st.lists(st.one_of(st.none(), _text), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_clean_spec_property(batch):
    got = clean_spec_series(pd.Series(batch, dtype="object")).tolist()
    want = [oracle_clean_spec(x) for x in batch]
    assert got == want


def test_empty_output_stays_empty_string():
    # truthy input that cleans to '' must yield '', not None
    assert clean_string_py("x") == ""
    assert clean_string_series(pd.Series(['"'], dtype="object"))[0] == ""


def test_tokenize_matches_python_str_split_property(spark):
    """tokenize() must equal Python str.split() — the reference's tokenizer
    (utils.py tokenize with delimiter=None) — on arbitrary text including
    every flavor of unicode whitespace. Hypothesis-style: a deterministic
    seeded generator over an alphabet weighted toward whitespace edge
    cases, verified in one Spark round-trip."""
    import random

    from pyspark.sql import functions as F

    from productbert_intermediate_spark.functions.text import tokenize

    rng = random.Random(424242)
    alphabet = (
        list("abcXY01.,!\"'@-") +
        [" ", "\t", "\n", "\r", "\x0b", "\x0c", "\x1c", "\x1d", "\x1e",
         "\x1f", "\x85", "\xa0", " ", " ", " ", " ",
         " ", " ", " ", " ", "　"]
    )
    cases = [""]
    for _ in range(300):
        n = rng.randint(0, 24)
        cases.append("".join(rng.choice(alphabet) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i long, s string"
    )
    got = {
        r.i: r.toks
        for r in df.select("i", tokenize(F.col("s")).alias("toks")).collect()
    }
    for i, s in enumerate(cases):
        assert got[i] == s.split(), (i, repr(s), got[i], s.split())
