"""Connected components: union-find oracle, O(log n) convergence, singletons."""

import random

from productbert_intermediate_spark.operators.clustering import (
    assign_entities,
    connected_components,
)


def _union_find_oracle(edges, nodes=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    out = {}
    for n in nodes or list(parent):
        out[n] = find(n)
    # normalize: component id = min member
    comp_min = {}
    for n, r in out.items():
        comp_min.setdefault(r, n)
        comp_min[r] = min(comp_min[r], n)
    return {n: comp_min[out[n]] for n in out}


def _run_cc(spark, edges):
    df = spark.createDataFrame(edges, "id_l long, id_r long")
    got = connected_components(df).collect()
    return {int(r["id"]): int(r["entity_id"]) for r in got}


def test_cc_on_graph_shapes(spark):
    shapes = {
        "clique": [(a, b) for a in range(5) for b in range(a + 1, 5)],
        "chain": [(i, i + 1) for i in range(30)],
        "star": [(0, i) for i in range(1, 20)],
        "two_components": [(1, 2), (2, 3), (10, 11), (12, 11)],
        "self_loops_and_dups": [(1, 1), (1, 2), (2, 1), (2, 3), (3, 3)],
        "reversed_ids": [(100, 5), (5, 50), (50, 7)],
    }
    for name, edges in shapes.items():
        got = _run_cc(spark, edges)
        want = _union_find_oracle(edges)
        assert got == want, name


def test_cc_random_graphs_vs_oracle(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 200
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(150)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _run_cc(spark, edges)
        want = _union_find_oracle(edges)
        assert got == want, trial


def test_cc_converges_fast_on_path(spark):
    """A 64-node path must converge well within the O(log n) bound."""
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "id_l long, id_r long")
    got = connected_components(df, max_iterations=12).collect()
    assert {int(r["entity_id"]) for r in got} == {0}
    assert {int(r["id"]) for r in got} == set(range(64))


def test_assign_entities_isolated_offers_are_singletons(spark):
    offers = spark.createDataFrame([(i,) for i in range(10)], "id long")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "id_l long, id_r long")
    got = {
        int(r["id"]): int(r["entity_id"])
        for r in assign_entities(offers, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, **{i: i for i in range(3, 10)}}


def test_cc_empty_edges(spark):
    offers = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame([], "id_l long, id_r long")
    got = {
        int(r["id"]): int(r["entity_id"])
        for r in assign_entities(offers, edges).collect()
    }
    assert got == {i: i for i in range(5)}
