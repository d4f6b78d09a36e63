"""Word-coocurrence featurizer (SURVEY.md §2.7 M3) + vocabulary build (A9).

The reference builds a binary CountVectorizer(min_df=2) vocabulary over the
union of left/right pair strings and multiplies the binary vectors
elementwise (/root/reference/src/processing/process-wordcooc/
process-to-wordcooc.py:52-93). For binary vectors the elementwise product
is exactly the intersection of the vocabulary-filtered token sets, so the
distributed form needs no vectors at all:

  vocabulary   = tokens with document frequency ≥ min_df (binary, union side)
  cooc feature = |vocab ∩ tokens_left ∩ tokens_right|

Everything is JVM-side (explode → df agg → semi-join → array_intersect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def build_vocabulary(
    strings: DataFrame, text_col: str = "text", min_df: int = 2, splitter=None
) -> DataFrame:
    """Distinct tokens with df ≥ min_df over the input strings → (token, df).

    Spark analog of CountVectorizer(min_df=2, binary=True).fit
    (process-to-wordcooc.py:52-65): binary df = number of rows whose token
    SET contains the token. ``splitter`` overrides the tokenizer (default
    whitespace-run ``tokenize``) — e.g. single-space split for callers whose
    downstream encoder splits that way.

    Documented deviation: sklearn's default analyzer lowercases and keeps
    only \\w\\w+ word tokens; this engine uses its uniform str.split()
    tokenizer everywhere (reference utils.tokenize) so vocabulary
    membership is consistent with blocking/stopword/stemming. Callers
    needing analyzer-faithful tokens pass a custom ``splitter``.
    """
    split_fn = splitter or tokenize
    toks = strings.select(
        F.explode(F.array_distinct(split_fn(F.col(text_col)))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
    )


def wordcooc_features(
    pairs: DataFrame,
    left_col: str = "text_left",
    right_col: str = "text_right",
    vocabulary: DataFrame | None = None,
    min_df: int = 2,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``cooc_count`` = |vocab-filtered tokens_left ∩ tokens_right|.

    vocabulary=None builds it from the union of both sides (reference
    behavior: fit on train-pair left+right strings, :58).

    The vocabulary stays a TABLE end-to-end: the shared tokens of each pair
    are exploded, joined against it (Spark broadcasts it when it fits,
    shuffle-joins when it doesn't), and re-aggregated per pair. Collecting
    the vocabulary into a single array cell would cap it at one row's worth
    of memory — a web-scale corpus has billions of distinct tokens.

    id_cols: columns that identify a pair for the re-aggregation join. When
    omitted, the text pair itself is the key (correct — the feature depends
    only on the texts — but it shuffles full texts; pass ids at scale).
    """
    if vocabulary is None:
        # distinct: the reference fits its CountVectorizer on the pair-side
        # union deduped by offer id (process-to-wordcooc.py, drop_duplicates
        # on id) — without dedup an offer in k pairs would inflate its
        # tokens' document frequencies k-fold. Text-dedup is the id-dedup
        # stand-in here (equal id ⇒ equal text); two distinct offers with
        # byte-identical text collapse to one df count, a conservative and
        # documented deviation.
        union = (
            pairs.select(F.col(left_col).alias("text"))
            .unionAll(pairs.select(F.col(right_col).alias("text")))
            .distinct()
        )
        vocabulary = build_vocabulary(union, "text", min_df)
    key = list(id_cols) if id_cols else [left_col, right_col]
    inter = F.array_intersect(
        F.array_distinct(tokenize(F.col(left_col))),
        F.array_distinct(tokenize(F.col(right_col))),
    )
    counted = (
        pairs.select(*key, F.explode(inter).alias("token"))
        .dropDuplicates(key + ["token"])
        .join(vocabulary.select("token"), "token")
        .groupBy(*key)
        .agg(F.count("*").alias("_cooc"))
    )
    return (
        pairs.join(counted, key, "left")
        .withColumn("cooc_count", F.coalesce(F.col("_cooc"), F.lit(0)).cast("int"))
        .drop("_cooc")
    )


def class_ratio(labeled: DataFrame, label_col: str = "label") -> float:
    """pos_neg ratio = round(neg/pos) — the reference's BCE pos_weight source
    (run_magellan.py:174-175; consumed as pos_neg_ratio, loss.py:8-9).

    Labels are normalized through int() so string-typed 0/1 columns (a
    pd.read_json inference artifact the reference tolerates) count
    correctly instead of silently reporting inf."""
    counts: dict[int, int] = {}
    for row in labeled.groupBy(label_col).count().collect():
        key = row[0]
        if key is None:
            continue
        counts[int(key)] = counts.get(int(key), 0) + int(row[1])
    pos = counts.get(1, 0)
    neg = counts.get(0, 0)
    return float(round(neg / pos)) if pos else float("inf")
