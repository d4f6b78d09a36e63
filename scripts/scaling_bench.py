"""Two-parallelism scaling benchmark (north rule: efficiency ≥ 0.8 N→4N).

The sandbox has no multi-node cluster, so per the driver instruction the
same job runs at two local parallelism levels (default local[8] vs
local[32]) on the same input; this reports throughput at both, the scaling
efficiency, and asserts output equality. Results → BENCH.md.

Usage: python scripts/scaling_bench.py [n_pages] [low_cores] [high_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    fx = f"/tmp/spark_graft_bench_fixtures_{n_pages}"
    if not os.path.exists(f"{fx}/pages.parquet"):
        from productbert_intermediate_spark.synth.generator import write_fixtures

        print(f"generating {n_pages}-page corpus at {fx} ...", file=sys.stderr)
        write_fixtures(fx, n_pages=n_pages, seed=42)

    results = {}
    for cores in (low, high):
        out = f"/tmp/scaling_{cores}.json"
        subprocess.run(
            [sys.executable, "scripts/scaling_worker.py", str(cores), fx, out],
            check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        with open(out) as f:
            results[cores] = json.loads(f.read())

    r_lo, r_hi = results[low], results[high]
    ratio = high / low
    efficiency = (r_hi["pairs_per_sec"] / r_lo["pairs_per_sec"]) / ratio
    stage_efficiency = (
        r_hi["stage_pairs_per_sec"] / r_lo["stage_pairs_per_sec"]
    ) / ratio
    same_output = r_lo["entities_checksum"] == r_hi["entities_checksum"] and (
        r_lo["n_entities"] == r_hi["n_entities"]
    )
    summary = {
        "n_pages": n_pages,
        "low": r_lo,
        "high": r_hi,
        "speedup": round(r_hi["pairs_per_sec"] / r_lo["pairs_per_sec"], 3),
        "core_ratio": ratio,
        "scaling_efficiency": round(efficiency, 3),
        "scorer_stage_scaling_efficiency": round(stage_efficiency, 3),
        "output_identical": same_output,
    }
    if "features_sec" in r_lo and "features_sec" in r_hi:
        summary["features_stage_scaling_efficiency"] = round(
            (r_lo["features_sec"] / r_hi["features_sec"]) / ratio, 3
        )
        summary["cluster_stage_scaling_efficiency"] = round(
            (r_lo["cluster_sec"] / r_hi["cluster_sec"]) / ratio, 3
        )
    if "encoder_stage_sec" in r_lo and "encoder_stage_sec" in r_hi:
        summary["encoder_stage_scaling_efficiency"] = round(
            (r_lo["encoder_stage_sec"] / r_hi["encoder_stage_sec"]) / ratio, 3
        )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
