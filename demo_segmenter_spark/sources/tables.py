"""Parquet table loaders for the driver's sf_dir layout (TESTDATA.md).

The reference ingests from Kafka topics (SURVEY.md §1.1 [REF?]); here
the batch source of record is one parquet file per table under
``{sf_dir}/{name}.parquet``. The streaming twin lives in
``demo_segmenter_spark.streaming.sources``.

Scale note (100 TB): a production deployment would point these loaders
at a partitioned parquet/iceberg layout; `spark.read.parquet` already
gives us predicate pushdown, column pruning and row-group skipping, and
the per-table helpers below never force materialization, so plans stay
lazily composable and Catalyst sees the whole tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize `events.ts` to a µs TimestampType whatever the fixture
    drop encoded: early drops wrote parquet TIMESTAMP(NANOS) (Spark 4
    rejects it unless legacy nanosAsLong is on — read as raw nanos, then
    integer-truncate ns→µs exactly like DuckDB's read); later drops write
    plain TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    TIMESTAMP_NTZ — under the UTC session (session.py) a cast to
    TimestampType preserves the epoch micros DuckDB sees, so oracle
    comparisons agree either way (SURVEY.md §1.2).
    """
    from pyspark.sql import functions as F

    # Sessions built by session.py already carry this conf (set once
    # at build — see the builder comment); the guarded set below only
    # fires for DRIVER-OWNED sessions passed into __spark_entry__, so
    # a co-resident query in OUR sessions can never observe a mid-job
    # conf flip.
    key = "spark.sql.legacy.parquet.nanosAsLong"
    if spark.conf.get(key, "false") != "true":
        spark.conf.set(key, "true")
    raw = spark.read.parquet(path)
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "timestamp":
        return raw
    if ts_type == "timestamp_ntz":
        norm = F.col("ts").cast("timestamp").alias("ts")
    else:  # bigint: raw nanos; integer div truncates ns→µs
        norm = F.timestamp_micros(F.expr("ts DIV 1000")).alias("ts")
    return raw.select(*[norm if c == "ts" else F.col(c) for c in raw.columns])


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def spread(df: DataFrame) -> DataFrame:
    """Repartition a *compute-bound* narrow pipeline to the session's
    default parallelism.

    The fixture tables are single small parquet files, so Spark gives
    them one input split — and a per-row-expensive operator (15M md5
    shingles in c_doc_fingerprint, dot products in c_sim_knn) then
    serializes on 1 of N cores. Measured: fingerprint 1.86s → parallel
    across 32 cores after spread. At 100 TB the scan itself yields
    thousands of splits and this is a no-op by construction — the rule
    it encodes ("CPU-heavy map work must scale with cores, not input
    file count") is the same one that sizes maxPartitionBytes there.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
