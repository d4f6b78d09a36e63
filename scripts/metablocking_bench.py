"""Meta-blocking A/B at the scaling-bench shape: comparisons saved vs F1.

Runs the full pipeline twice on the same deterministic corpus (the
scaling bench's 60k-page fixture by default) — plain blocking vs
meta_prune=wnp — and reports candidate counts, per-stage wall times, F1
on the labeled GS pairs, and entity counts. One JSON line to stdout.

Usage: python scripts/metablocking_bench.py [n_pages] [cores]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    fx = f"/tmp/spark_graft_bench_fixtures_{n_pages}"
    if not os.path.exists(f"{fx}/pages.parquet"):
        from productbert_intermediate_spark.synth.generator import write_fixtures

        print(f"generating {n_pages}-page corpus at {fx} ...", file=sys.stderr)
        write_fixtures(fx, n_pages=n_pages, seed=42)

    from productbert_intermediate_spark.plans.pipeline import run_pipeline
    from productbert_intermediate_spark.session import get_spark

    spark = get_spark("metablocking-bench", cores=cores,
                      shuffle_partitions=max(cores * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n_pages": n_pages, "cores": cores, "legs": {}}
    for leg, bp in (("plain", {}), ("wnp", {"meta_prune": "wnp"})):
        wd = f"/tmp/metablocking_bench_wd_{n_pages}_{leg}"
        shutil.rmtree(wd, ignore_errors=True)
        t0 = time.monotonic()
        rep = run_pipeline(
            spark,
            f"{fx}/pages.parquet",
            wd,
            labeled_path=f"{fx}/labeled_pairs_gs.parquet",
            blocking_params=bp,
        )
        wall = time.monotonic() - t0
        out["legs"][leg] = {
            "wall_s": round(wall, 2),
            "candidates": rep["counts"]["candidate_pairs"],
            "match_edges": rep["counts"]["match_edges"],
            "entities": rep["counts"]["entities"],
            "f1": rep["pairwise_eval"]["f1"],
        }
    p, w = out["legs"]["plain"], out["legs"]["wnp"]
    out["pair_reduction"] = round(p["candidates"] / max(w["candidates"], 1), 3)
    out["f1_delta"] = round((w["f1"] or 0) - (p["f1"] or 0), 6)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
