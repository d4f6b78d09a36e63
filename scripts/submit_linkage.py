"""spark-submit driver for the clean-clean linkage pipeline.

Sibling of scripts/submit_pipeline.py (same packaging contract: the
package arrives via --py-files, the SparkSession comes from submit-side
conf — no master/memory hardcoded here):

    spark-submit --master <cluster> \
        --py-files dist/productbert_intermediate_spark.zip \
        scripts/submit_linkage.py \
        --left-pages s3://.../catalog_a --right-pages s3://.../catalog_b \
        --workdir s3://.../link_run1 \
        [--scorer logistic|fs] [--one-to-one greedy|mutual] \
        [--all-candidates] [--report report.json]

The matched-pair table lands as the ``link_matches`` stage under
--workdir (parquet, catalogs' own ids in id_l/id_r); the report JSON
carries stage counts, resume flags, blocking drop counters, and — for
--scorer fs — the fitted Fellegi-Sunter parameters.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--left-pages", required=True)
    p.add_argument("--right-pages", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--scorer", choices=("logistic", "fs"), default="logistic")
    p.add_argument(
        "--one-to-one", choices=("greedy", "mutual"), default="greedy"
    )
    p.add_argument(
        "--all-candidates",
        action="store_true",
        help="assign over ALL scored candidates (match flag kept as a "
        "column) instead of only above-threshold pairs — review-queue "
        "shape (match_only=False)",
    )
    p.add_argument(
        "--labeled",
        help="parquet of gold cross-catalog pairs (id_left, id_right, "
        "label) for P/R/F1 + threshold-curve reporting",
    )
    p.add_argument("--force", action="store_true")
    p.add_argument("--report", help="write the run report JSON here")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    # No .master()/.config() here (see submit_pipeline.py).
    spark = SparkSession.builder.appName("er-linkage").getOrCreate()
    from productbert_intermediate_spark.plans.linkage_pipeline import run_linkage

    report = run_linkage(
        spark,
        args.left_pages,
        args.right_pages,
        args.workdir,
        scorer=args.scorer,
        one_to_one=args.one_to_one,
        match_only=not args.all_candidates,
        labeled_path=args.labeled,
        force=args.force,
    )
    report.pop("matches", None)  # DataFrame handle, not JSON
    out = json.dumps(report, indent=2, default=str)
    print(out)
    if args.report:
        with open(args.report, "w") as f:
            f.write(out)
    spark.stop()


if __name__ == "__main__":
    main()
