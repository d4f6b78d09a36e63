"""Phase-level profile of the end-to-end scoring path at one parallelism.

Usage: python scripts/profile_score.py <cores> [fixtures_dir] [mode]
mode: broadcast | shuffle  (hydration-join strategy in the narrow builder)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    fx = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_bench_fixtures_60000"
    mode = sys.argv[3] if len(sys.argv) > 3 else "broadcast"

    from pyspark.sql import functions as F

    from productbert_intermediate_spark.operators import blocking as B
    from productbert_intermediate_spark.operators import scoring as S
    from productbert_intermediate_spark.operators.extract import extract_offers
    from productbert_intermediate_spark.session import get_spark

    spark = get_spark(f"prof-{cores}", cores=cores, shuffle_partitions=max(cores * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    offers = extract_offers(spark.read.parquet(f"{fx}/pages.parquet")).where(
        F.col("id").isNotNull()
    ).cache()
    offers.count()
    pairs = B.block_offers(offers).cache()
    n_pairs = pairs.count()
    text_index = S.build_text_index_broadcast(offers)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t: dict[str, float] = {}

    def timed(name, fn, warm=True):
        if warm:
            fn()
        t0 = time.time()
        fn()
        t[name] = round(time.time() - t0, 2)

    bcast = mode == "broadcast"
    # phase 1: hydrate + JVM features (no python)
    timed("narrow_only", lambda: noop(
        S.build_pair_features_narrow(pairs, offers, broadcast_offers=bcast)
    ))
    # phase 2: full end-to-end scoring
    timed("e2e_score", lambda: noop(
        S.apply_pair_scorer(
            S.build_pair_features_narrow(pairs, offers, broadcast_offers=bcast),
            text_index,
        )
    ))
    print(json.dumps({
        "cores": cores, "mode": mode, "n_pairs": n_pairs,
        "phases": t,
        "e2e_pairs_per_sec": round(n_pairs / t["e2e_score"], 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
