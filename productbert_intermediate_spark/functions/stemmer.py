"""Porter stemmer, NLTK-default-mode parity (SURVEY.md §2.2 P5).

The reference stems through ``nltk.PorterStemmer().stem`` with default
settings (/root/reference/src/data/utils.py:56-61), and NLTK's default mode
is NLTK_EXTENSIONS — the published Porter 1980 algorithm ("An algorithm for
suffix stripping") plus the extensions NLTK documents in-source (a table of
irregular forms collected by Martin Porter over the years, a length≤2
guard, ies/ied handling for 4-letter words, a consonant-preceded y→i rule,
bli/fulli/logi step-2 rules, and a 2-letter CVC form). This module
implements that documented behavior directly — this sandbox has no nltk —
and exposes it as an Arrow-batched pandas UDF.

Rule semantics follow the paper: within a step, the FIRST rule whose suffix
matches decides; if its condition fails, the step ends with the word
unchanged (no later rule in the step is tried).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_VOWELS = set("aeiou")

# Irregular forms drawn to Martin Porter's attention over the algorithm's
# lifetime; NLTK consults this pool before running the steps.
_IRREGULAR_FORMS = {
    "sky": ["sky", "skies"],
    "die": ["dying"],
    "lie": ["lying"],
    "tie": ["tying"],
    "news": ["news"],
    "inning": ["innings", "inning"],
    "outing": ["outings", "outing"],
    "canning": ["cannings", "canning"],
    "howe": ["howe"],
    "proceed": ["proceed"],
    "exceed": ["exceed"],
    "succeed": ["succeed"],
}
_POOL = {form: root for root, forms in _IRREGULAR_FORMS.items() for form in forms}


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences ([C](VC)^m[V])."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        if _is_cons(stem, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _positive_measure(stem: str) -> bool:
    return _measure(stem) > 0


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    # NLTK extension: a 2-letter vowel-consonant word (e.g. "ob" in
    # "obsess" truncations) also counts as ending CVC.
    if (
        len(word) >= 3
        and _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    ):
        return True
    return len(word) == 2 and not _is_cons(word, 0) and _is_cons(word, 1)


def _apply_rules(word: str, rules) -> str:
    """First rule whose suffix matches decides; failed condition ends the step."""
    for suffix, repl, cond in rules:
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if cond is None or cond(stem):
                return stem + repl
            return word
    return word


def _step1a(w: str) -> str:
    # NLTK extension: 4-letter 'ies' words keep their stem vowel
    # ("ties"→"tie", "dies"→"die") where the paper's rule gives "ti"/"di".
    if w.endswith("ies") and len(w) == 4:
        return w[:-3] + "ie"
    return _apply_rules(
        w,
        [("sses", "ss", None), ("ies", "i", None), ("ss", "ss", None), ("s", "", None)],
    )


def _step1b(w: str) -> str:
    # NLTK extension: 'ied' mirrors the 'ies' handling ("died"→"die",
    # "spied"→"spi").
    if w.endswith("ied"):
        return w[:-3] + ("ie" if len(w) == 4 else "i")
    if w.endswith("eed"):
        stem = w[:-3]
        return stem + "ee" if _measure(stem) > 0 else w
    intermediate = None
    for suffix in ("ed", "ing"):
        if w.endswith(suffix):
            candidate = w[: len(w) - len(suffix)]
            if _has_vowel(candidate):
                intermediate = candidate
                break
    if intermediate is None:
        return w
    # post-removal cleanup; first matching rule decides, a failed condition
    # ends the step (paper semantics)
    if intermediate.endswith(("at", "bl", "iz")):
        return intermediate + "e"
    if _ends_double_cons(intermediate):
        return intermediate[:-1] if intermediate[-1] not in "lsz" else intermediate
    if _measure(intermediate) == 1 and _ends_cvc(intermediate):
        return intermediate + "e"
    return intermediate


def _step1c(w: str) -> str:
    # NLTK extension: y→i only when preceded by a consonant AND the stem is
    # longer than one letter: "happy"→"happi" but "enjoy"→"enjoy", "by"→"by".
    if w.endswith("y"):
        stem = w[:-1]
        if len(stem) > 1 and _is_cons(stem, len(stem) - 1):
            return stem + "i"
    return w


def _step2(w: str) -> str:
    # NLTK extension: the ALLI→AL rule runs first and, on success, feeds its
    # output back through step 2 (so "formalli"→"formal"→"formal").
    if w.endswith("alli") and _positive_measure(w[:-4]):
        return _step2(w[:-4] + "al")
    rules = [
        ("ational", "ate", _positive_measure),
        ("tional", "tion", _positive_measure),
        ("enci", "ence", _positive_measure),
        ("anci", "ance", _positive_measure),
        ("izer", "ize", _positive_measure),
        # NLTK extension: BLI→BLE instead of the paper's ABLI→ABLE
        ("bli", "ble", _positive_measure),
        ("alli", "al", _positive_measure),
        ("entli", "ent", _positive_measure),
        ("eli", "e", _positive_measure),
        ("ousli", "ous", _positive_measure),
        ("ization", "ize", _positive_measure),
        ("ation", "ate", _positive_measure),
        ("ator", "ate", _positive_measure),
        ("alism", "al", _positive_measure),
        ("iveness", "ive", _positive_measure),
        ("fulness", "ful", _positive_measure),
        ("ousness", "ous", _positive_measure),
        ("aliti", "al", _positive_measure),
        ("iviti", "ive", _positive_measure),
        ("biliti", "ble", _positive_measure),
        # NLTK extensions: FULLI→FUL, and LOGI→LOG whose condition keeps the
        # 'l' with the stem so short stems like "geo"/"theo" qualify.
        ("fulli", "ful", _positive_measure),
        ("logi", "log", lambda stem: _positive_measure(w[:-3])),
    ]
    return _apply_rules(w, rules)


def _step3(w: str) -> str:
    return _apply_rules(
        w,
        [
            ("icate", "ic", _positive_measure),
            ("ative", "", _positive_measure),
            ("alize", "al", _positive_measure),
            ("iciti", "ic", _positive_measure),
            ("ical", "ic", _positive_measure),
            ("ful", "", _positive_measure),
            ("ness", "", _positive_measure),
        ],
    )


def _step4(w: str) -> str:
    def gt1(stem: str) -> bool:
        return _measure(stem) > 1

    return _apply_rules(
        w,
        [
            ("al", "", gt1),
            ("ance", "", gt1),
            ("ence", "", gt1),
            ("er", "", gt1),
            ("ic", "", gt1),
            ("able", "", gt1),
            ("ible", "", gt1),
            ("ant", "", gt1),
            ("ement", "", gt1),
            ("ment", "", gt1),
            ("ent", "", gt1),
            ("ion", "", lambda stem: gt1(stem) and bool(stem) and stem[-1] in "st"),
            ("ou", "", gt1),
            ("ism", "", gt1),
            ("ate", "", gt1),
            ("iti", "", gt1),
            ("ous", "", gt1),
            ("ive", "", gt1),
            ("ize", "", gt1),
        ],
    )


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return w


def _step5b(w: str) -> str:
    if w.endswith("ll") and _measure(w[:-1]) > 1:
        return w[:-1]
    return w


def porter_stem(word: str, to_lowercase: bool = True) -> str:
    """Stem one token with NLTK-default (NLTK_EXTENSIONS) behavior."""
    w = word.lower() if to_lowercase else word
    # NLTK consults the pool with the ORIGINAL spelling but returns the
    # lowercased root — reproduced as-is for parity.
    if word in _POOL:
        return _POOL[w]
    if len(word) <= 2:
        return word
    for step in (
        _step1a, _step1b, _step1c, _step2, _step3, _step4, _step5a, _step5b,
    ):
        w = step(w)
    return w


def stem_sentence(words: str | None) -> str | None:
    """Tokenize-on-whitespace + stem each token + rejoin (reference utils.stem)."""
    if words is None:
        return None
    return " ".join(porter_stem(t) for t in str(words).split())


@pandas_udf(StringType())
def stem_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - exercised via Spark
    return s.map(lambda x: stem_sentence(x) if x is not None else None)


def stem(col: Column) -> Column:
    """Column API: Porter-stem every whitespace token."""
    return stem_udf(col)
