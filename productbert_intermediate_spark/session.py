"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100TB design point, scaled down for local[N] testing:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow on (every Python crossing is vectorized — the input_hint forbids
per-row Python), shuffle partitions sized to the local core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "productbert-intermediate-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None → local[*]. On a real cluster this builder is bypassed and the
    session comes from spark-submit; every knob here is also safe cluster-side.
    """
    # Make this package importable by Python workers. In local mode workers
    # inherit the JVM's PYTHONPATH; on a real cluster ship the package with
    # `spark-submit --py-files productbert_intermediate_spark.zip` instead.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{existing}" if existing else pkg_parent
        )

    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env_cores) if env_cores else 0
    master = f"local[{cores}]" if cores and cores > 0 else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 32) if cores else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Local-mode scan fan-out: test/bench inputs are single small parquet
        # files, and the default 4 MiB open-cost makes the split planner pack
        # them into one task, serializing map-only stages (extraction's
        # pandas UDFs). A real deployment reads thousands of files and keeps
        # the 4 MiB default; shrinking it here only changes LOCAL split
        # planning, never results.
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
