"""OHLC family: ordering-key guard + multi-batch streaming state.

The candle tiebreak key is a zero-padded string replayed byte-identical
by the DuckDB oracle — which means the hash certification CANNOT see a
pad-width overflow (both engines would mis-pick open/close the same
way). _ohlc_ord_key therefore carries an in-plan assert_true; the first
test proves it actually fires. The second test proves min_by/max_by
state merges across micro-batch boundaries: the open pick of an hour
must come from the EARLIEST batch that touched it even when later
batches append rows to the same window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_segmenter_spark.operators.layer_a import _OHLC_ID_BOUND, _ohlc_ord_key
from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.test_stream_multibatch import SF, _read_stream, _run_to_memory, _trickle_src

load_all_operators()


def _key_of(spark, event_id, ts):
    from datetime import datetime

    df = spark.createDataFrame(
        [(event_id, datetime.fromisoformat(ts))], "event_id long, ts timestamp"
    ).select(_ohlc_ord_key().alias("ord"))
    return df.collect()[0].ord


def test_ord_key_guard_fires_on_overflow(spark):
    # in-bounds id: key computed, lexicographic == chronological
    ok = _key_of(spark, 123, "2024-01-01 00:00:00")
    assert len(ok) == 32 and ok.endswith("000000000123")
    # id at the pad bound: must fail LOUDLY, not truncate silently
    with pytest.raises(Exception, match="ordering key overflow"):
        _key_of(spark, _OHLC_ID_BOUND, "2024-01-01 00:00:00")
    with pytest.raises(Exception, match="ordering key overflow"):
        _key_of(spark, -1, "2024-01-01 00:00:00")
    # pre-epoch ts: '-' would break lexicographic order
    with pytest.raises(Exception, match="ordering key overflow"):
        _key_of(spark, 123, "1969-12-31 23:59:59")


def test_ohlc_stream_merges_ordered_state_across_batches(spark):
    # Three ts-ordered micro-batches; hour windows cut by the batch
    # boundaries receive rows from two batches, so the min_by state
    # (value, ord) pair of the earlier batch must survive the merge.
    src, _, _ = _trickle_src(spark)
    ev = _read_stream(spark, src).withWatermark("ts", "1 hour")
    agg = (
        ev.withColumn("ord", _ohlc_ord_key())
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", "ord").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord").alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.unix_micros("w.start").alias("hour_us"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )
    name, n_batches = _run_to_memory(agg, "append")
    assert n_batches == 3, f"expected 3 micro-batches, saw {n_batches}"
    got = {tuple(r) for r in spark.table(name).collect()}
    # Batch twin restricted to closed windows = the streaming contract
    # (a_ohlc_stream's oracle); emitted exactly once each.
    full = REGISTRY["a_ohlc"].fn(spark, SF)
    from demo_segmenter_spark.sources import load_table

    max_ts = load_table(spark, SF, "events").agg(
        F.unix_micros(F.max("ts")).alias("m")
    ).collect()[0].m
    closed = full.filter(
        F.col("hour_us") + 3600 * 1_000_000 <= max_ts - 3600 * 1_000_000
    )
    want = {tuple(r) for r in closed.collect()}
    assert got == want
    assert len(got) == len(spark.table(name).collect())  # no double-emit
