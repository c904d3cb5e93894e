"""Malformed-input policy at the ingest edge (100 TB reality: some
fraction of any lake's JSON is broken): PERMISSIVE mode must quarantine
bad rows into _corrupt_record without failing the job; FAILFAST must
fail loudly. Pinned so an accidental mode change can't silently drop
or silently admit garbage."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


@pytest.fixture()
def jsonl(tmp_path_factory):
    d = tmp_path_factory.mktemp(f"corrupt_{uuid.uuid4().hex[:6]}")
    p = os.path.join(d, "data.jsonl")
    with open(p, "w") as f:
        f.write('{"event_id": 1, "value": 1.5}\n')
        f.write('{"event_id": 2, "value": BROKEN\n')  # malformed
        f.write('{"event_id": 3, "value": 3.5}\n')
    return str(p)


def test_permissive_quarantines_corrupt_rows(spark, jsonl):
    df = spark.read.schema(SCHEMA).option("mode", "PERMISSIVE").json(jsonl)
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull()).cache()
    assert bad.count() == 1
    assert {r["event_id"] for r in good.collect()} == {1, 3}
    assert "BROKEN" in bad.collect()[0]["_corrupt_record"]


def test_failfast_raises_on_corrupt_row(spark, jsonl):
    df = spark.read.schema(
        T.StructType(SCHEMA.fields[:2])
    ).option("mode", "FAILFAST").json(jsonl)
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()
