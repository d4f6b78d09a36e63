"""S1: JSON-lines corpus scan with explicit schema (gz + nulls + extra keys)."""

import gzip
import json

from productbert_intermediate_spark.sources.readers import (
    OFFER_SCHEMA,
    read_jsonl_corpus,
)

ROWS = [
    {"id": 1, "cluster_id": 10, "category": "computers", "title": "fast pc",
     "description": "a desc", "brand": "acme", "price": "9.99",
     "specTableContent": None},
    # missing keys → NULL; unknown keys ignored (the reference drops
    # identifiers/keyValuePairs columns — sample_intermediate_training_
    # sets.py:200)
    {"id": 2, "cluster_id": 11, "category": "shoes", "title": "boot",
     "identifiers": ["x"], "keyValuePairs": {"a": "b"}},
]


def _check(df):
    assert df.schema == OFFER_SCHEMA
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["brand"] == "acme" and got[1]["specTableContent"] is None
    assert got[2]["description"] is None and got[2]["title"] == "boot"


def test_read_jsonl_plain(spark, tmp_path):
    p = tmp_path / "corpus.json"
    p.write_text("\n".join(json.dumps(r) for r in ROWS))
    _check(read_jsonl_corpus(spark, str(p)))


def test_read_jsonl_gzip(spark, tmp_path):
    p = tmp_path / "corpus.json.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(json.dumps(r) for r in ROWS))
    _check(read_jsonl_corpus(spark, str(p)))
