"""One-to-one assignment (operators/assignment.py) vs literal references.

The load-bearing check is greedy_one_to_one == the SEQUENTIAL greedy walk
(sort by (score desc, id_l, id_r), accept iff both endpoints free) — the
parallel locally-dominant fixpoint must reproduce it exactly, ties and
all, at any partition count.
"""

import random

from pyspark.sql import functions as F

from productbert_intermediate_spark.operators.assignment import (
    greedy_one_to_one,
    reciprocal_best_match,
)

SCHEMA = "id_l long, id_r long, score double"


def _sequential_greedy(rows):
    """The literal reference: one pair at a time, in the total order."""
    taken_l, taken_r, out = set(), set(), []
    for r in sorted(rows, key=lambda r: (-r[2], r[0], r[1])):
        if r[0] not in taken_l and r[1] not in taken_r:
            taken_l.add(r[0])
            taken_r.add(r[1])
            out.append(tuple(r))
    return sorted(out)


def _reciprocal_best(rows):
    best_l = {}
    best_r = {}
    for r in rows:
        key = (-r[2], r[0], r[1])
        if r[0] not in best_l or key < best_l[r[0]][0]:
            best_l[r[0]] = (key, tuple(r))
        if r[1] not in best_r or key < best_r[r[1]][0]:
            best_r[r[1]] = (key, tuple(r))
    return sorted(
        t
        for _, t in best_l.values()
        if best_r[t[1]][1] == t
    )


def _random_pairs(rng, n_l, n_r, n_pairs, tie_prob=0.3):
    seen = set()
    rows = []
    while len(rows) < n_pairs:
        pair = (rng.randrange(n_l), 1000 + rng.randrange(n_r))
        if pair in seen:
            continue
        seen.add(pair)
        # coarse score grid so ties are common — the tie-break path is
        # exactly what a float-scored table never exercises
        score = (
            rng.choice([0.5, 0.7, 0.9])
            if rng.random() < tie_prob
            else round(rng.random(), 3)
        )
        rows.append((pair[0], pair[1], score))
    return rows


def test_greedy_equals_sequential_reference(spark):
    rng = random.Random(7)
    for trial in range(5):
        rows = _random_pairs(rng, 40, 40, 120)
        df = spark.createDataFrame(rows, SCHEMA)
        # budget=0 forces the pure distributed fixpoint; the default
        # takes the r6 collect-residual finish — both must equal the
        # literal sequential walk
        for budget in (0, 100_000):
            got = sorted(
                tuple(r)
                for r in greedy_one_to_one(
                    df, residual_rows_budget=budget
                ).collect()
            )
            assert got == _sequential_greedy(rows), f"trial {trial} b={budget}"


def test_greedy_partition_invariant(spark):
    rng = random.Random(11)
    rows = _random_pairs(rng, 30, 30, 90)
    expect = _sequential_greedy(rows)
    for parts in (1, 7):
        for budget in (0, 100_000):
            df = spark.createDataFrame(rows, SCHEMA).repartition(parts)
            got = sorted(
                tuple(r)
                for r in greedy_one_to_one(
                    df, residual_rows_budget=budget
                ).collect()
            )
            assert got == expect, f"partitions={parts} b={budget}"


def test_reciprocal_best_equals_reference(spark):
    rng = random.Random(13)
    for trial in range(5):
        rows = _random_pairs(rng, 40, 40, 120)
        df = spark.createDataFrame(rows, SCHEMA)
        got = sorted(
            tuple(r) for r in reciprocal_best_match(df).collect()
        )
        assert got == _reciprocal_best(rows), f"trial {trial}"


def test_both_outputs_are_matchings(spark):
    rng = random.Random(17)
    rows = _random_pairs(rng, 25, 25, 150)
    df = spark.createDataFrame(rows, SCHEMA)
    for fn in (greedy_one_to_one, reciprocal_best_match):
        out = fn(df).collect()
        assert len({r.id_l for r in out}) == len(out)
        assert len({r.id_r for r in out}) == len(out)


def test_reciprocal_is_subset_of_greedy_pairs_under_strict_scores(spark):
    # with all-distinct scores, a mutually-best pair is locally dominant
    # in round 1, so reciprocal-best ⊆ greedy
    rng = random.Random(19)
    rows = []
    seen = set()
    while len(rows) < 100:
        p = (rng.randrange(30), 1000 + rng.randrange(30))
        if p in seen:
            continue
        seen.add(p)
        rows.append((p[0], p[1], len(rows) * 0.001 + 0.1))
    df = spark.createDataFrame(rows, SCHEMA)
    greedy = {tuple(r) for r in greedy_one_to_one(df).collect()}
    recip = {tuple(r) for r in reciprocal_best_match(df).collect()}
    assert recip <= greedy


def test_domino_chain_needs_rounds_and_converges(spark):
    # strictly decreasing path l0-r0, r0's side blocked by l1, ...: the
    # adversarial shape where each round frees exactly the next link
    rows = [(i, 1000 + i, 1.0 - 0.01 * i) for i in range(10)]
    rows += [(i + 1, 1000 + i, 1.0 - 0.01 * i - 0.005) for i in range(9)]
    df = spark.createDataFrame(rows, SCHEMA)
    for budget in (0, 100_000):
        got = sorted(
            tuple(r)
            for r in greedy_one_to_one(
                df, residual_rows_budget=budget
            ).collect()
        )
        assert got == _sequential_greedy(rows)


def test_max_rounds_raises_loudly(spark):
    rows = [(i, 1000 + i, 1.0 - 0.01 * i) for i in range(6)]
    rows += [(i + 1, 1000 + i, 1.0 - 0.01 * i - 0.005) for i in range(5)]
    df = spark.createDataFrame(rows, SCHEMA)
    try:
        # budget=0 disables the residual finish so the loud guard stays
        # reachable (with any budget, a shrinking live set always
        # completes instead)
        greedy_one_to_one(df, max_rounds=1, residual_rows_budget=0)
    except RuntimeError as e:
        assert "did not converge" in str(e)
    else:
        raise AssertionError("expected RuntimeError at max_rounds=1")


def test_long_domino_chain_completes_via_residual(spark):
    """ADVICE r5: a strictly-score-decreasing chain longer than
    2x max_rounds used to raise RuntimeError; the collect-residual finish
    must complete it with the exact sequential-greedy result."""
    n = 250  # chain links >> default max_rounds when budget disabled
    rows = [(i, 1000 + i, 1.0 - 0.001 * i) for i in range(n)]
    rows += [(i + 1, 1000 + i, 1.0 - 0.001 * i - 0.0005) for i in range(n - 1)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        tuple(r)
        for r in greedy_one_to_one(df, max_rounds=3).collect()
    )
    assert got == _sequential_greedy(rows)


def test_extra_columns_pass_through(spark):
    df = spark.createDataFrame(
        [(1, 1001, 0.9, "a"), (1, 1002, 0.8, "b"), (2, 1002, 0.95, "c")],
        "id_l long, id_r long, score double, tag string",
    )
    out = {
        (r.id_l, r.id_r, r.tag)
        for r in greedy_one_to_one(df).collect()
    }
    assert out == {(2, 1002, "c"), (1, 1001, "a")}
