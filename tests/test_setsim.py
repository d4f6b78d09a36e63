"""Prefix-filter Jaccard join: brute-force equivalence + plan shape."""

import itertools
import random

from pyspark.sql import functions as F

from productbert_intermediate_spark.operators.setsim import jaccard_similarity_join

THRESHOLD = 0.6


def _random_docs(seed=7, n=120, vocab=40):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for i in range(n):
        k = rng.randint(1, 12)
        toks = sorted(set(rng.choices(words, k=k)))
        rows.append((i, f"s{i % 3}", toks))
    # plant a few near-duplicates across the size spectrum
    for i in range(0, n, 17):
        base = rows[i][2]
        if len(base) >= 3:
            rows.append((1000 + i, rows[i][1], base[:-1] + [f"x{i}"]))
            rows.append((2000 + i, rows[i][1], list(base)))
    return rows


def _brute_force(rows, threshold=THRESHOLD):
    want = set()
    for (ia, ga, ta), (ib, gb, tb) in itertools.combinations(rows, 2):
        if ga != gb:
            continue
        a, b = set(ta), set(tb)
        if len(a | b) and len(a & b) / len(a | b) >= threshold:
            want.add((min(ia, ib), max(ia, ib)))
    return want


def test_prefix_filter_join_equals_brute_force(spark):
    rows = _random_docs()
    docs = spark.createDataFrame(rows, "doc_id long, source string, toks array<string>")
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_similarity_join(
            docs, "doc_id", "toks", THRESHOLD, group_cols=["source"]
        ).collect()
    }
    assert got == _brute_force(rows)


def test_prefix_filter_join_has_no_cartesian(spark):
    docs = spark.createDataFrame(
        _random_docs(), "doc_id long, source string, toks array<string>"
    )
    out = jaccard_similarity_join(docs, "doc_id", "toks", THRESHOLD, ["source"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_values_are_exact(spark):
    rows = [
        (1, "s", ["a", "b", "c", "d", "e"]),
        (2, "s", ["a", "b", "c", "d", "x"]),  # 4/6 = 0.666…
        (3, "s", ["a", "b", "c", "d", "e"]),  # identical to 1 → 1.0
        (4, "s", ["z"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, toks array<string>")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_similarity_join(docs, "doc_id", "toks", 0.6, ["source"]).collect()
    }
    assert got[(1, 3)] == 1.0
    assert abs(got[(1, 2)] - 4 / 6) < 1e-12
    assert abs(got[(2, 3)] - 4 / 6) < 1e-12
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got


import pytest


@pytest.mark.parametrize("threshold", [0.2, 0.43, 0.5, 0.75])
def test_prefix_filter_lossless_across_thresholds(spark, threshold):
    """Losslessness must hold at ANY threshold, including ones where
    t*n or 2t/(1+t)*n is exactly integral and double rounding could
    shorten a prefix (t=0.43 with |toks|=143 is such a pair; the sweep
    plants same-size-class documents to exercise the equal-length path
    of the (size, id) ordering too)."""
    rng = random.Random(threshold)
    words = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(90):
        k = rng.randint(1, 14)
        rows.append((i, "g", sorted(set(rng.choices(words, k=k)))))
    # exact-integral-product shape: 143-token sets overlapping in 86
    big = [f"b{i}" for i in range(200)]
    rows.append((500, "g", big[:143]))
    rows.append((501, "g", big[57:200]))  # overlap 86, union 200
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, toks array<string>"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_similarity_join(
            docs, "doc_id", "toks", threshold, group_cols=["source"]
        ).collect()
    }
    assert got == _brute_force(rows, threshold)
