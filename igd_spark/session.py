"""SparkSession factory tuned for the local[N] sandbox.

In production this engine runs via spark-submit --py-files on a real
multi-executor cluster (north_rule); the configs below are the ones that
matter at both scales (AQE, Arrow, shuffle partition sizing). Memory is left
to spark-submit in cluster mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app: str = "igd_spark",
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # byte-based AQE coalescing measured faster here than forcing
        # core-count partitions (Python-kernel groups are few and chunky);
        # parallelismFirst (default true) already floors at cluster parallelism
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        # skew-join handling for the Zipf term distribution (SURVEY §4)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("IGD_SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
