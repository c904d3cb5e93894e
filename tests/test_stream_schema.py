"""Schema sniffing for the file-stream events source
(streaming/sources._events_raw_schema): the fixture's `ts` encoding has
varied across drops, so every structural branch — raw nanos, tz-naive
micros, tz-adjusted micros, non-timestamp — must be pinned by a
synthetic parquet footer, not just by whatever the current fixture
happens to use."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from demo_segmenter_spark.streaming.sources import _events_raw_schema


def _write_events(tmp_path, ts_type):
    arr = pa.array([1_700_000_000_000_000], type=ts_type)
    table = pa.table(
        {
            "event_id": pa.array([1], type=pa.int64()),
            "ts": arr,
            "user_id": pa.array([7], type=pa.int64()),
            "event_type": pa.array(["view"], type=pa.string()),
            "value": pa.array([1.0], type=pa.float64()),
            "props": pa.array(["{}"], type=pa.string()),
        }
    )
    pq.write_table(table, f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _ts_field(schema: T.StructType) -> T.StructField:
    return schema["ts"]


def test_nanos_read_as_long(tmp_path):
    d = _write_events(tmp_path, pa.timestamp("ns"))
    schema, nanos = _events_raw_schema(d)
    assert nanos is True
    assert _ts_field(schema).dataType == T.LongType()


def test_naive_micros_is_ntz(tmp_path):
    d = _write_events(tmp_path, pa.timestamp("us"))
    schema, nanos = _events_raw_schema(d)
    assert nanos is False
    assert _ts_field(schema).dataType == T.TimestampNTZType()


def test_tz_adjusted_micros_is_ltz(tmp_path):
    # The branch no fixture currently exercises: timestamp[us, tz=UTC]
    # (isAdjustedToUTC in the parquet logical type) must map to the
    # session-TZ TimestampType, with the nanos path off.
    d = _write_events(tmp_path, pa.timestamp("us", tz="UTC"))
    schema, nanos = _events_raw_schema(d)
    assert nanos is False
    assert _ts_field(schema).dataType == T.TimestampType()


def test_tz_adjusted_millis_is_ltz(tmp_path):
    d = _write_events(tmp_path, pa.timestamp("ms", tz="+02:00"))
    schema, nanos = _events_raw_schema(d)
    assert nanos is False
    assert _ts_field(schema).dataType == T.TimestampType()


def test_non_timestamp_ts_fails_loudly(tmp_path):
    table = pa.table(
        {
            "event_id": pa.array([1], type=pa.int64()),
            "ts": pa.array([123], type=pa.int64()),
        }
    )
    pq.write_table(table, f"{tmp_path}/events.parquet")
    with pytest.raises(TypeError, match="timestamp"):
        _events_raw_schema(str(tmp_path))
