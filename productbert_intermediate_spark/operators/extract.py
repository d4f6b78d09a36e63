"""Extraction stage: pages (url, warc_ts, html, text, lang) → offers.

Replaces the reference's corpus-preprocessing entry point
(/root/reference/src/processing/preprocess/preprocess_corpus.py:14-48):
where the reference reads a pre-extracted JSON corpus into pandas and
row-applies the cleaners, this stage parses offer fields out of the page
text with one Arrow-batched pandas UDF (vectorized .str.extract), then
applies the byte-identical cleaners (functions/cleaning.py) per field.

Scale notes (100TB design point):
- one narrow projection of (url, warc_ts, text) — html is never read
  (column pruning reaches the parquet scan);
- lang filter is a pushed-down predicate;
- the whole stage is map-only: zero shuffles;
- latest-crawl-wins per url is an optional window dedup (the only shuffle,
  keyed by url — skipped when the source guarantees unique urls).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.cleaning import clean_spec_series, clean_string_series

_FIELDS = ("sku", "category", "title", "description", "brand", "price", "spec")

# Output of the fused parse+clean UDF: one Arrow crossing carries the page
# text in and every cleaned offer field out. Splitting parse and per-field
# cleaning into separate pandas UDFs (the previous shape) cost FOUR
# ArrowEvalPython crossings of the field payloads per scan — the optimizer
# interleaves pushed filters between the UDF projections, which breaks them
# into separate eval batches (guide §4.1: control the columns AND the
# number of crossings). The cleaners are the same byte-identity
# clean_*_series functions, now called inside the one UDF.
_FIELDS_SCHEMA = StructType(
    [StructField("raw_sku", StringType())]
    + [
        StructField(f, StringType())
        for f in (
            "category",
            "title",
            "description",
            "brand",
            "price",
            "specTableContent",
        )
    ]
)

# Schema of extract_offers OUTPUT (distinct from sources.readers.OFFER_SCHEMA,
# which describes the synthetic truth table: that one carries cluster_id and
# no url). id IS nullable here: a page without a numeric <<sku>> extracts
# id=NULL, and the pipeline filters those explicitly (plans/pipeline.py).
OFFER_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("url", StringType(), True),
        StructField("category", StringType(), True),
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("brand", StringType(), True),
        StructField("price", StringType(), True),
        StructField("specTableContent", StringType(), True),
    ]
)


@pandas_udf(_FIELDS_SCHEMA)
def _parse_and_clean_udf(text: pd.Series) -> pd.DataFrame:  # pragma: no cover - via Spark
    raw = {}
    for f in _FIELDS:
        # DOTALL: raw values legitimately contain newlines/tabs
        raw[f] = text.str.extract(
            rf"<<{f}>>(.*?)<</{f}>>", expand=False, flags=16
        )
    return pd.DataFrame(
        {
            "raw_sku": raw["sku"],
            "category": raw["category"],
            "title": clean_string_series(raw["title"]),
            "description": clean_string_series(raw["description"]),
            "brand": clean_string_series(raw["brand"]),
            "price": clean_string_series(raw["price"]),
            "specTableContent": clean_spec_series(raw["spec"]),
        }
    )


# asNondeterministic is OPTIMIZER metadata, not a semantics change (the
# function is a pure map): without it, every caller's
# where(id.isNotNull()) filter — id = try_cast of a UDF output column —
# is pushed below the projection and the optimizer duplicates the whole
# parse+clean evaluation, one copy feeding the filter and one the output
# (guide §4.4: two ArrowEvalPython nodes for one UDF, every surviving row
# parsed and cleaned twice). Marked non-deterministic, the plan keeps a
# single evaluation with the filter above it.
_parse_and_clean = _parse_and_clean_udf.asNondeterministic()


def extract_offers(
    pages: DataFrame,
    lang: str = "en",
    dedup_latest_crawl: bool = False,
) -> DataFrame:
    """pages → cleaned offers DataFrame (OFFER_SCHEMA).

    The cleaned field values are byte-identical to the reference cleaners
    (utils.py:17-33) applied to the same raw field strings — the pipeline's
    per-url invariant.
    """
    df = pages.select("url", "warc_ts", "text", "lang").where(F.col("lang") == lang)

    if dedup_latest_crawl:
        # content-hash tiebreak: two crawls of one url can share a warc_ts
        # (source timestamp granularity), and row_number over a non-unique
        # ordering would pick a partition-layout-dependent winner — breaking
        # the pipeline's determinism/byte-identity guarantee
        w = Window.partitionBy("url").orderBy(
            F.desc("warc_ts"), F.xxhash64("text")
        )
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    parsed = df.withColumn("_p", _parse_and_clean(F.col("text")))
    return parsed.select(
        # try_cast, not cast: Spark 4's default ANSI mode makes a plain
        # cast THROW on a non-numeric sku, killing the stage on one dirty
        # page; the contract is non-numeric sku → id=NULL → dropped by the
        # pipeline's isNotNull guard
        F.col("_p.raw_sku").try_cast("long").alias("id"),
        F.col("url"),
        F.col("_p.category").alias("category"),
        F.col("_p.title").alias("title"),
        F.col("_p.description").alias("description"),
        F.col("_p.brand").alias("brand"),
        F.col("_p.price").alias("price"),
        F.col("_p.specTableContent").alias("specTableContent"),
    )
