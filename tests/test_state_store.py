"""RocksDB state-store provider (the production backend for large
streaming state — SURVEY.md §4 "RocksDB state stores + changelog" row):
the same session_window query must produce identical results under the
HDFS-backed default and the RocksDB provider. At 100 TB of keyed state
the RocksDB provider is mandatory (heap can't hold the working set);
this proves the swap is a pure config change, like swapping the
reference's in-memory store for its RocksDB store."""

from __future__ import annotations

from demo_segmenter_spark.streaming.sessionize import sessionize_stream
from tests.conftest import SF_SMOKE

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _session_set(df):
    return {
        (r["user_id"], r["session_start_us"], r["session_last_us"], r["n_events"])
        for r in df.collect()
    }


def test_rocksdb_provider_matches_default(spark):
    default = _session_set(sessionize_stream(spark, SF_SMOKE))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        rocks = _session_set(sessionize_stream(spark, SF_SMOKE))
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert rocks == default
    assert len(rocks) > 0
