"""The two remaining Python-boundary variants (SURVEY §2 c_udf_surface
row): scalar pandas_udf (Series -> Series, Arrow-batched — the right
choice when an expression genuinely needs Python) and the classic
row-at-a-time udf (the WRONG choice in any hot path — kept here only
to pin that both produce results identical to the built-in)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from demo_segmenter_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_scalar_pandas_udf_matches_builtin(spark):
    @F.pandas_udf("long")
    def tok_count(text: pd.Series) -> pd.Series:
        return text.str.split(" ").str.len().astype("int64")

    docs = load_table(spark, SF_SMOKE, "documents")
    out = docs.select(
        tok_count("text").alias("py"),
        F.size(F.split("text", " ")).cast("long").alias("jvm"),
    )
    assert out.filter(F.col("py") != F.col("jvm")).count() == 0


def test_row_udf_matches_builtin(spark):
    slow = F.udf(lambda t: len(t.split(" ")), LongType())
    docs = load_table(spark, SF_SMOKE, "documents")
    out = docs.select(
        slow("text").alias("py"),
        F.size(F.split("text", " ")).cast("long").alias("jvm"),
    )
    assert out.filter(F.col("py") != F.col("jvm")).count() == 0
