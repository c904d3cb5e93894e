"""SparkSession factory tuned for this engine.

Used by tests and bench.py; the driver's verify passes its own session
into `__spark_entry__.entry`, so nothing here assumes it owns the only
session. Settings are chosen for local[N] testing but are the same ones
we would ship on a 1000-executor cluster (AQE on, Arrow on, UTC):
only `shuffle.partitions` is environment-sized — on a real cluster it
would be ~2-3× total cores or left to AQE's coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "demo-segmenter-spark",
    cpus: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(4, int(cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Early fixture drops encode events.ts as parquet
        # TIMESTAMP(NANOS), which Spark 4 refuses without this legacy
        # flag. Set once at session build so no query ever observes a
        # mid-job conf flip; sources/tables.py keeps an idempotent
        # guard for DRIVER-OWNED sessions this factory never sees.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Semi-join pushdown for selective non-broadcast joins: the
        # build side's keys become a bloom filter applied at the probe
        # side's scan. Irrelevant at local fixture sizes (thresholds
        # keep it off) but the right default for the 100 TB cluster;
        # tests/test_plans.py pins that the rewrite actually fires.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
