"""mapInArrow (Spark 4 arrow-native batch transform): pyarrow
RecordBatches in and out with NO pandas conversion — the lowest-
overhead Python escape hatch. Verified by recomputing documents'
n_chars from text arrow-side and matching the stored column."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import functions as F

from demo_segmenter_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_map_in_arrow_matches_stored_column(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "n_chars")

    def recompute(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.utf8_length(batch.column(1)),
                    batch.column(2),
                ],
                names=["doc_id", "arrow_chars", "n_chars"],
            )

    out = docs.mapInArrow(
        recompute, schema="doc_id long, arrow_chars int, n_chars long"
    )
    mismatches = out.filter(F.col("arrow_chars") != F.col("n_chars")).count()
    assert mismatches == 0
    assert out.count() == 500
