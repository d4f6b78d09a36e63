"""Primary scans (SURVEY §2.1 S1): JSON-lines corpus + parquet pages.

The reference ingests its corpus with ``pd.read_json(path, lines=True)``
(gzipped JSON-lines, /root/reference/src/processing/preprocess/
preprocess_corpus.py:18). The distributed scan declares the schema
explicitly — schema inference reads the data twice and types drift between
files at web scale; gz decompression is per-file (gz is not splittable, so
many small files beat one giant archive — the WDC corpus ships that way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# the reference's offer corpus columns (preprocess_corpus.py:24-28)
OFFER_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("cluster_id", LongType()),
        StructField("category", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("brand", StringType()),
        StructField("price", StringType()),
        StructField("specTableContent", StringType()),
    ]
)

# the driver's input_hint page schema (BASELINE.json)
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: StructType = OFFER_SCHEMA
) -> DataFrame:
    """JSON-lines (optionally .gz) offer-corpus scan with a fixed schema."""
    return spark.read.schema(schema).json(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Columnar pages scan (parquet here; Iceberg on a real cluster)."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)
