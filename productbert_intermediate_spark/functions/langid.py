"""Language identification — stopword-profile heuristic (LLM-data-pipeline op).

The classic lightweight language-ID heuristic: score a document's token set
against per-language function-word profiles (the most frequent closed-class
words of each language — public lists) and take the argmax, with a fixed
preference order for ties and 'und' (undetermined, BCP-47) when nothing
hits. Function words are the highest-signal, fastest feature for this (they
are the top of every language's frequency table and rarely borrowed).

Scale shape: the whole classifier is one JVM-side projection per document —
lower + split + array_intersect against literal arrays + a when-chain.
Map-only: no shuffle, no UDF, no broadcast state; Catalyst folds the
profile literals into codegen. At 10^12 documents this runs at scan speed.

The reference pipeline filters on a precomputed `lang` column
(preprocess_corpus.py English-corpus assumption); this operator closes the
gap for corpora that arrive WITHOUT language metadata, which is the normal
Common-Crawl case.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Top function words per language (public frequency-list heads; lowercase).
# Order matters: it is the deterministic tie-break preference.
STOPWORD_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "and", "of", "to", "in", "is", "you", "that", "it", "was",
        "for", "on", "are", "with", "as", "at", "this", "have", "from",
        "or", "by", "not", "but", "what", "his",
    ),
    "de": (
        "der", "die", "und", "das", "ist", "ich", "nicht", "sie", "wir",
        "ein", "eine", "mit", "auf", "für", "von", "zu", "den", "dem",
        "aber", "auch", "nach", "bei", "aus", "sich", "wie",
    ),
    "fr": (
        "le", "la", "les", "des", "et", "est", "une", "dans", "que",
        "qui", "pour", "pas", "vous", "je", "nous", "avec", "sur", "au",
        "ce", "il", "elle", "mais", "ne", "se", "son",
    ),
    "es": (
        "el", "los", "las", "que", "y", "en", "un", "una", "es", "no",
        "por", "con", "para", "su", "se", "lo", "como", "más", "pero",
        "sus", "ya", "cuando", "muy", "sin", "sobre",
    ),
    "it": (
        "il", "di", "che", "e", "è", "un", "per", "non", "sono", "con",
        "si", "da", "come", "anche", "ma", "della", "nel", "alla", "più",
        "questo", "hanno", "gli", "una", "dei", "delle",
    ),
    "nl": (
        "de", "het", "een", "en", "van", "ik", "te", "dat", "die", "niet",
        "op", "aan", "met", "als", "voor", "er", "maar", "om", "hij",
        "zij", "dan", "zou", "wat", "naar", "ook",
    ),
}

UNDETERMINED = "und"


def lang_scores(tokens: Column) -> dict[str, Column]:
    """Per-language hit counts: |tokens ∩ profile(lang)| — all JVM-side."""
    return {
        lang: F.size(
            F.array_intersect(tokens, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in STOPWORD_PROFILES.items()
    }


def lang_id(tokens: Column) -> Column:
    """argmax-language column with deterministic tie-break.

    tokens: array<string> of lowercased tokens. Ties resolve in
    STOPWORD_PROFILES insertion order; zero hits → 'und'.
    """
    scores = lang_scores(tokens)
    mx = F.greatest(*scores.values())
    out = F.when(mx <= 0, F.lit(UNDETERMINED))
    for lang in STOPWORD_PROFILES:
        out = out.when(scores[lang] == mx, F.lit(lang))
    return out


def lang_id_sql(tokens_expr: str) -> tuple[str, str]:
    """The identical classifier as DuckDB SQL (oracle twin).

    tokens_expr: SQL expression yielding a list of lowercased tokens.
    Returns (case_expr, max_expr); the caller binds max_expr as `_mx`.
    """
    score_exprs = {
        lang: "len(list_intersect({t}, [{w}]))".format(
            t=tokens_expr,
            w=", ".join("'" + w + "'" for w in words),
        )
        for lang, words in STOPWORD_PROFILES.items()
    }
    mx = "greatest({})".format(", ".join(score_exprs.values()))
    cases = " ".join(
        f"when {expr} = _mx then '{lang}'"
        for lang, expr in score_exprs.items()
    )
    return f"case when _mx <= 0 then '{UNDETERMINED}' {cases} end", mx
