"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark-sea",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Session tuned for the inverted-index workload.

    AQE handles runtime coalescing + skew-join splitting; Arrow is required
    for the vectorized pandas-UDF stages. ``spark.sql.shuffle.partitions``
    defaults to 2 x cores locally (on a real cluster it should be sized so a
    per-task posting group fits executor memory; AQE coalesces the rest).
    """
    # make this package importable by executor Python workers regardless of
    # the driver's cwd (spark-submit --py-files is the cluster path; local
    # workers inherit PYTHONPATH)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root
        )

    cores = os.environ.get("SPARK_GRAFT_CPUS", "")
    master = master or (f"local[{cores}]" if cores else "local[*]")
    if shuffle_partitions is None:
        ncores = os.cpu_count() or 8
        if master.startswith("local["):
            inner = master[6:-1]
            if inner.isdigit():
                ncores = int(inner)
        shuffle_partitions = max(8, 2 * ncores)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default advisory is 64MB — tuned for byte-bound JVM stages. Our
        # wide stages feed Arrow->Python encoders whose cost is per ROW,
        # so 64MB coalescing collapses them to a handful of tasks and
        # starves >8-core runs; 8MB keeps Python stages wide while still
        # coalescing truly tiny partitions.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
