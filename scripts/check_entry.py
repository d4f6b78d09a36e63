"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin on the
same parquet tables, compares row count, column names, and an
order-insensitive value hash (stringified, column-name-sorted) — the same
comparison shape the driver applies at sf=0.01.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    import math

    if v is None:
        return "NULL"
    # No %.6g smoothing — repr exposes the int-vs-float render artifacts the
    # driver's hash catches (same bar as tests/test_driver_contract.py).
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from productbert_intermediate_spark.session import get_spark

    spark = get_spark("check-entry", cores=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name:32s} rows={len(srows):6d} (rows-only, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"✗ {name:32s} ORACLE ERROR: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        else:
            hs = table_hash(srows, scols)
            ho = table_hash(orows, ocols)
            if hs != ho:
                problems.append(f"value hash {hs} != {ho}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"✗ {name:32s} {'; '.join(problems)}")
            if srows and orows:
                print(f"    spark:  {sorted(srows)[:2]}")
                print(f"    oracle: {sorted(orows)[:2]}")
        else:
            print(f"✓ {name:32s} rows={len(srows):6d} hash match")
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
