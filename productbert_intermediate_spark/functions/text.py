"""Tokenization / stopword / normalization functions (SURVEY.md §2.2 P3-P10).

All Column-level, built on JVM-side pyspark.sql.functions — no Python in the
hot path. Parity targets:
  tokenize            — reference utils.tokenize (str.split, NaN → [])
  remove_stopwords    — reference utils.remove_stopwords (NLTK english list)
  lower_ws_normalize  — ' '.join(x.lower().split()) (preprocess_corpus.py:42)
  token_prefix        — first-N-token truncation (process_to_bert.py:193-202)
  token_set           — lower().split() → set() (sample_intermediate_training_sets.py:203-205)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The standard NLTK English stopword list (public domain content, 179 words),
# embedded so the engine has no nltk runtime dependency.
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you", "you're",
    "you've", "you'll", "you'd", "your", "yours", "yourself", "yourselves", "he",
    "him", "his", "himself", "she", "she's", "her", "hers", "herself", "it",
    "it's", "its", "itself", "they", "them", "their", "theirs", "themselves",
    "what", "which", "who", "whom", "this", "that", "that'll", "these", "those",
    "am", "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at", "by",
    "for", "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now", "d",
    "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma", "mightn",
    "mightn't", "mustn", "mustn't", "needn", "needn't", "shan", "shan't",
    "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't", "won",
    "won't", "wouldn", "wouldn't",
)


# The EXACT whitespace set of Python str.split() / str.isspace() (Unicode
# White_Space property + the ASCII separators \x1c-\x1f Python treats as
# whitespace), written with \x{..} escapes valid in BOTH Java regex (Spark)
# and RE2 (DuckDB oracles) — Java's bare \s is ASCII-only ([ \t\n\x0B\f\r])
# and RE2's \s additionally lacks \x0B, so every engine's shorthand class
# diverges from Python on real web text (NBSP from &nbsp; is everywhere).
_PY_WS_CODEPOINTS = (
    "09-0D", "1C-1F", "20", "85", "A0", "1680",
    "2000-200A", "2028", "2029", "202F", "205F", "3000",
)


def _ws_class() -> str:
    parts = []
    for cp in _PY_WS_CODEPOINTS:
        if "-" in cp:
            lo, hi = cp.split("-")
            parts.append(rf"\x{{{lo}}}-\x{{{hi}}}")
        else:
            parts.append(rf"\x{{{cp}}}")
    return "[" + "".join(parts) + "]"


PY_WS_CLASS = _ws_class()


def tokenize(col: Column, delimiter: str | None = None) -> Column:
    """Split into tokens; NULL → empty array (reference utils.tokenize).

    delimiter=None mirrors Python str.split(): split on whitespace runs and
    drop empties. An explicit delimiter splits literally (keeps empties),
    like str.split(sep).
    """
    if delimiter is None:
        # Python str.split() parity in ONE regex pass: splitting on the
        # Python whitespace class leaves empty strings only at the array
        # edges (leading/trailing whitespace; interior runs are consumed),
        # and array_remove drops them. NOT F.trim — trim() strips only
        # 0x20 spaces — and NOT \s — Java's is ASCII-only, so NBSP-joined
        # words would stay fused where the reference splits them. This
        # expression runs per pair in the scoring feature stage, so the
        # single-pass form matters.
        arr = F.array_remove(F.split(col, PY_WS_CLASS + "+"), "")
    else:
        import re as _re

        arr = F.split(col, _re.escape(delimiter), -1)
    return F.coalesce(arr, F.array().cast("array<string>"))


def remove_stopwords(col: Column, lower: bool = False) -> Column:
    """Drop English stopwords from a whitespace-tokenized string, rejoin.

    lower=True lowercases the *stopword list* only (reference semantics:
    utils.remove_stopwords lowercases the list, never the input — the list
    is already lowercase, so the flag is a no-op there and here).
    """
    stop = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    kept = F.filter(tokenize(col), lambda t: ~F.array_contains(stop, t))
    return F.when(col.isNull(), None).otherwise(F.array_join(kept, " "))


def lower_ws_normalize(col: Column) -> Column:
    """' '.join(x.lower().split()) — lowercase + whitespace collapse + strip,
    over the full Python whitespace set (see PY_WS_CLASS)."""
    collapsed = F.regexp_replace(F.lower(col), PY_WS_CLASS + "+", " ")
    # after collapse every separator is a single 0x20, so plain trim works
    return F.trim(collapsed)


def token_prefix(col: Column, n: int) -> Column:
    """Keep the first n space-separated tokens (' '.join(x.split(' ')[:n]))."""
    return F.array_join(F.slice(F.split(col, " ", -1), 1, n), " ")


def token_set(col: Column) -> Column:
    """lower().split() → distinct tokens (order not significant)."""
    return F.array_distinct(tokenize(F.lower(col)))


def blank_to_null_double(col: Column) -> Column:
    """Blank/whitespace-only string → NULL, else cast to double (P11:
    replace(r'^\\s*$', NaN).astype(float64), process_to_magellan.py:26-29).

    The blank test is a regex over the full whitespace class, not
    trim() == '' — trim strips only 0x20, so a tab-only string would fall
    through to the cast and THROW under Spark 4's default ANSI mode. A
    non-blank non-numeric string still raises, exactly as the reference's
    astype('float64') would."""
    return (
        F.when(col.rlike("^" + PY_WS_CLASS + r"*$"), F.lit(None))
        .otherwise(col)
        .cast("double")
    )
