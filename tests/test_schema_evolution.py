"""Schema evolution on read (mergeSchema): a 100 TB lake accretes
columns over time — old files must read with nulls for new columns,
and the union schema must be the merge of all file schemas."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from demo_segmenter_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_merge_schema_fills_missing_column_with_nulls(spark):
    base = f"/tmp/dss_evolution/{uuid.uuid4().hex[:8]}"
    docs = load_table(spark, SF_SMOKE, "documents")

    # Epoch 1: original schema. Epoch 2: adds a quality_score column.
    docs.select("doc_id", "lang").write.parquet(f"{base}/e1")
    docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "lang",
        F.lit(0.5).alias("quality_score"),
    ).write.parquet(f"{base}/e2")

    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/e1", f"{base}/e2"
    )
    assert set(merged.columns) == {"doc_id", "lang", "quality_score"}
    assert merged.count() == 1000
    # Old rows surface the new column as NULL; new rows carry values.
    assert merged.filter(F.col("quality_score").isNull()).count() == 500
    assert (
        merged.filter(F.col("doc_id") >= 1_000_000)
        .filter(F.col("quality_score") == 0.5)
        .count()
        == 500
    )
