"""Entity changelog: classification semantics, delta-bounded output, and a
DuckDB cross-check of the full ledger arithmetic on a generated move set."""

from __future__ import annotations

import duckdb
import pandas as pd

from productbert_intermediate_spark.operators.entity_diff import (
    entity_changelog,
    member_moves,
)


def _snapshots(spark):
    # prev: E1={1,2}, E2={3,4,5}, E3={6}, E4={7,8}
    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 2), (5, 2), (6, 3), (7, 4), (8, 4)],
        "id long, entity_id long",
    )
    # new: E1 grew (+9), E2 shrank (5 left to fresh E5), E3 dissolved
    # (6 departed the corpus), E4 reshaped (7 left to E5, 10 arrived),
    # E5 created ({5,7}), E6 unchanged? — no E6; unchanged case is E1..
    # none: add E7={11,12} in BOTH snapshots → must emit nothing.
    prev2 = spark.createDataFrame(
        [(11, 7), (12, 7)], "id long, entity_id long"
    )
    new = spark.createDataFrame(
        [
            (1, 1), (2, 1), (9, 1),          # grew
            (3, 2), (4, 2),                   # shrank
            (5, 5), (7, 5),                   # created
            (8, 4), (10, 4),                  # reshaped
            (11, 7), (12, 7),                 # unchanged
        ],
        "id long, entity_id long",
    )
    return prev.unionByName(prev2), new


def test_changelog_classification(spark):
    prev, new = _snapshots(spark)
    got = {r["entity_id"]: r.asDict() for r in entity_changelog(prev, new).collect()}
    assert got[1] == {
        "entity_id": 1, "change": "grew", "n_prev": 2, "n_new": 3,
        "added": 1, "removed": 0,
    }
    assert got[2] == {
        "entity_id": 2, "change": "shrank", "n_prev": 3, "n_new": 2,
        "added": 0, "removed": 1,
    }
    assert got[3] == {
        "entity_id": 3, "change": "dissolved", "n_prev": 1, "n_new": 0,
        "added": 0, "removed": 1,
    }
    assert got[4] == {
        "entity_id": 4, "change": "reshaped", "n_prev": 2, "n_new": 2,
        "added": 1, "removed": 1,
    }
    assert got[5] == {
        "entity_id": 5, "change": "created", "n_prev": 0, "n_new": 2,
        "added": 2, "removed": 0,
    }
    # unchanged entity 7 emits nothing — changelog size is delta-bounded
    assert 7 not in got
    assert set(got) == {1, 2, 3, 4, 5}


def test_member_moves(spark):
    prev, new = _snapshots(spark)
    got = {
        r["id"]: (r["prev_entity_id"], r["new_entity_id"])
        for r in member_moves(prev, new).collect()
    }
    assert got == {
        5: (2, 5),       # re-keyed
        6: (3, None),    # departed
        7: (4, 5),       # re-keyed
        9: (None, 1),    # arrived
        10: (None, 4),   # arrived
    }


def test_changelog_matches_duckdb_ledger(spark):
    """Cross-engine check of the ledger arithmetic on a generated snapshot
    pair with every change class present (deterministic arithmetic moves)."""
    n = 500
    base = spark.range(n).selectExpr("id", "id % 37 AS entity_id")
    # new: ids %5==0 move to entity_id+1000 (creates + reshapes), %7==0
    # leave the corpus, ids n..n+49 arrive into entity 1
    new = (
        spark.range(n + 50)
        .selectExpr(
            "id",
            "CASE WHEN id >= {n} THEN 1 "
            "     WHEN id % 5 = 0 THEN id % 37 + 1000 "
            "     ELSE id % 37 END AS entity_id".format(n=n),
        )
        .where("id % 7 != 0 OR id >= {n}".format(n=n))
    )
    got = (
        entity_changelog(base, new)
        .orderBy("entity_id")
        .toPandas()
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("prev", base.toPandas())
    con.register("new", new.toPandas())
    want = con.execute(
        """
        WITH both_sides AS (
          SELECT COALESCE(p.id, n.id) AS id,
                 p.entity_id AS pe, n.entity_id AS ne
          FROM prev p FULL OUTER JOIN new n ON p.id = n.id
        ), ledger AS (
          SELECT pe AS entity_id, 1 AS n_prev, 0 AS n_new, 0 AS added,
                 CASE WHEN pe IS NOT DISTINCT FROM ne THEN 0 ELSE 1 END AS removed
          FROM both_sides WHERE pe IS NOT NULL
          UNION ALL
          SELECT ne, 0, 1,
                 CASE WHEN pe IS NOT DISTINCT FROM ne THEN 0 ELSE 1 END, 0
          FROM both_sides WHERE ne IS NOT NULL
        ), agg AS (
          SELECT entity_id, SUM(n_prev) AS n_prev, SUM(n_new) AS n_new,
                 SUM(added) AS added, SUM(removed) AS removed
          FROM ledger GROUP BY entity_id
        )
        SELECT entity_id,
               CASE WHEN n_prev = 0 THEN 'created'
                    WHEN n_new = 0 THEN 'dissolved'
                    WHEN added > 0 AND removed > 0 THEN 'reshaped'
                    WHEN added > 0 THEN 'grew'
                    ELSE 'shrank' END AS change,
               n_prev, n_new, added, removed
        FROM agg WHERE added > 0 OR removed > 0
        ORDER BY entity_id
        """
    ).df()
    want = want.astype(
        {c: "int64" for c in ("entity_id", "n_prev", "n_new", "added", "removed")}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # 'grew' cannot arise here (every arrival-gaining entity also loses a
    # %7 member → reshaped); it is pinned by test_changelog_classification
    assert set(got["change"]) >= {"created", "shrank", "reshaped"}


def test_apply_member_moves_round_trip(spark):
    """Consumer contract: prev + the move feed reconstructs new EXACTLY —
    arrivals inserted, departures dropped, re-keys applied, everything
    else untouched."""
    from productbert_intermediate_spark.operators.entity_diff import (
        apply_member_moves,
    )

    prev, new = _snapshots(spark)
    got = apply_member_moves(prev, member_moves(prev, new))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_apply_member_moves_round_trip_generated(spark):
    """Same round-trip on the arithmetic snapshot pair with every move
    class (re-key, departure, arrival) at a few hundred rows."""
    from productbert_intermediate_spark.operators.entity_diff import (
        apply_member_moves,
    )

    n = 500
    prev = spark.range(n).selectExpr("id", "id % 37 AS entity_id")
    new = (
        spark.range(n + 50)
        .selectExpr(
            "id",
            "CASE WHEN id >= {n} THEN 1 "
            "     WHEN id % 5 = 0 THEN id % 37 + 1000 "
            "     ELSE id % 37 END AS entity_id".format(n=n),
        )
        .where("id % 7 != 0 OR id >= {n}".format(n=n))
    )
    got = apply_member_moves(prev, member_moves(prev, new))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, new.collect())
    )
    # empty feed is the identity
    empty = member_moves(prev, prev)
    assert empty.count() == 0
    same = apply_member_moves(prev, empty)
    assert sorted(map(tuple, same.collect())) == sorted(
        map(tuple, prev.collect())
    )
