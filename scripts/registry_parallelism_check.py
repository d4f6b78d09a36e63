"""Full-registry determinism across parallelism: every driver-contract
query must produce bit-identical value-hashes at two local[N] levels.

This is the evidence behind BENCH.md's "all registry queries bit-identical
at local[2] vs local[8]" line — seeded sampling, windowed splits, LSH/IVF
ANN, k-means training and the pandas-UDF stages included. Each level runs
in a fresh JVM (a master can't change after startup).

Usage: python scripts/registry_parallelism_check.py [sf_dir] [low] [high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORKER = """
import hashlib, json, math, sys
sys.path.insert(0, {root!r})
from productbert_intermediate_spark.plans.testdata_queries import REGISTRY
from productbert_intermediate_spark.session import get_spark

def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return f"{{type(v).__name__}}:{{v}}" if not isinstance(v, (int, str)) else str(v)

def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode()); h.update(b"\\n")
    return h.hexdigest()

cores = int(sys.argv[1]); sf = sys.argv[2]; out = sys.argv[3]
spark = get_spark(f"detcheck-{{cores}}", cores=cores, shuffle_partitions=max(cores * 2, 4))
spark.sparkContext.setLogLevel("ERROR")
hashes = {{}}
for name in sorted(REGISTRY):
    fn, _sql = REGISTRY[name]
    df = fn(spark, sf)
    hashes[name] = _hash([tuple(r) for r in df.collect()], df.columns)
with open(out, "w") as f:
    json.dump(hashes, f)
spark.stop()
"""


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    results = {}
    for cores in (low, high):
        out = f"/tmp/registry_hashes_{cores}.json"
        subprocess.run(
            [sys.executable, "-c", _WORKER.format(root=root), str(cores), sf_dir, out],
            check=True,
            cwd=root,
        )
        with open(out) as f:
            results[cores] = json.load(f)

    lo, hi = results[low], results[high]
    mismatched = sorted(n for n in lo if lo[n] != hi.get(n))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "levels": [low, high],
                "queries": len(lo),
                "identical": len(lo) - len(mismatched),
                "mismatched": mismatched,
            }
        )
    )
    if mismatched:
        sys.exit(1)


if __name__ == "__main__":
    main()
