"""Porter stemmer golden tests — NLTK-default-mode (NLTK_EXTENSIONS) parity.

The reference stems via nltk.PorterStemmer().stem (reference
src/data/utils.py:56-61); expected values below are NLTK's outputs for its
default mode, covering both the classic Porter 1980 vocabulary and every
NLTK-documented extension point (irregular pool, ies/ied length-4, y→i
consonant rule, bli/fulli/logi, alli recursion, length≤2 guard).
"""

import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.functions.stemmer_golden import GOLDEN
from productbert_intermediate_spark.functions.stemmer import (
    porter_stem,
    stem,
    stem_sentence,
)



@pytest.mark.parametrize("word,expected", sorted(GOLDEN.items()))
def test_golden_word(word, expected):
    assert porter_stem(word) == expected


def test_pool_is_case_sensitive_like_nltk():
    # NLTK checks the pool with the ORIGINAL spelling, then stems the
    # lowercased word: "News" misses the pool and stems to "new".
    assert porter_stem("news") == "news"
    assert porter_stem("News") == "new"


def test_short_words_keep_original_case():
    assert porter_stem("AB") == "AB"


def test_stem_sentence_none_and_join():
    assert stem_sentence(None) is None
    assert stem_sentence("the ponies are dying") == "the poni are die"


def test_stem_udf_matches_python(spark):
    words = sorted(GOLDEN)
    df = spark.createDataFrame([(w,) for w in words], "text string")
    got = {r["text"]: r["stemmed"] for r in df.select("text", stem(F.col("text")).alias("stemmed")).collect()}
    assert got == {w: GOLDEN[w] for w in words}
