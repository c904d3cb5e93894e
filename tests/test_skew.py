"""salted_join must be row-identical to the plain join while spreading
a hot key across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_segmenter_spark.functions.skew import salted_join
from demo_segmenter_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    cust = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    plain = ev.join(cust, "user_id").select("event_id", "c_mktsegment")
    salted = salted_join(ev, cust, "user_id").select("event_id", "c_mktsegment")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_spreads_rows(spark):
    # the salted left side must actually occupy >1 bucket for a hot key
    from demo_segmenter_spark.functions.skew import SALT_COL

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    salted = ev.withColumn(SALT_COL, (F.rand(seed=42) * 8).cast("int"))
    buckets = (
        salted.filter(F.col("user_id") == 0)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert buckets > 1
