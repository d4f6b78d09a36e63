"""spark-submit driver for the ER pipeline.

This is the file a cluster operator actually submits — the package arrives
via ``--py-files``, NOT from a checked-out repo, and the SparkSession comes
from spark-submit's own conf (master/executors/memory are submit-side
flags, never hardcoded here):

    spark-submit --master <cluster> \
        --py-files dist/productbert_intermediate_spark.zip \
        scripts/submit_pipeline.py \
        --pages s3://.../pages --workdir s3://.../er_run1 \
        [--labeled .../labeled.parquet] [--scorer logistic|encoder] \
        [--report report.json]

The package import sits inside main() so a missing --py-files fails with a
clear ImportError at startup rather than a worker-side stack trace mid-job.
tests/test_spark_submit.py runs this end-to-end with a real spark-submit
subprocess (local master standing in for a cluster, per TESTDATA.md) and
gates on the report's pairwise F1.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--labeled")
    p.add_argument("--scorer", choices=("logistic", "encoder"), default="logistic")
    p.add_argument(
        "--salt-hot-ids",
        metavar="N_SALTS,HOT_THRESHOLD",
        help="differential hot-id salting for the scorer's hydration joins "
        "(use when --pages candidates bypass capped blocking; see "
        "plans/pipeline.py docstring), e.g. 8,100000",
    )
    p.add_argument("--force", action="store_true")
    p.add_argument("--report", help="write the run report JSON here")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    # No .master()/.config() here: builder options would override the
    # spark-submit conf, silently turning a cluster submit into local mode.
    spark = SparkSession.builder.appName("er-pipeline").getOrCreate()

    from productbert_intermediate_spark.plans.pipeline import run_pipeline

    salt = None
    if args.salt_hot_ids:
        n_salts, hot_threshold = (int(x) for x in args.salt_hot_ids.split(","))
        salt = (n_salts, hot_threshold)

    report = run_pipeline(
        spark,
        args.pages,
        args.workdir,
        labeled_path=args.labeled,
        scorer=args.scorer,
        force=args.force,
        salt_hot_ids=salt,
    )
    blob = json.dumps(report, indent=2, default=str)
    print(blob)
    if args.report:
        with open(args.report, "w") as f:
            f.write(blob)
    spark.stop()


if __name__ == "__main__":
    main()
