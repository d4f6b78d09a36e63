"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship dedup query on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) with DuckDB oracles where the
semantics are SQL-expressible. Implementations live in
productbert_intermediate_spark/plans/testdata_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from productbert_intermediate_spark.plans.testdata_queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: MinHash-LSH near-duplicate pairs over documents."""
    fn, _ = REGISTRY["minhash_lsh_pairs"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
