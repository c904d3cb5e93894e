"""Streaming sinks — the Kafka-producer twin (SURVEY.md §2 Layer A
"Sink" row). Production shape: writeStream → kafka/delta with
checkpointing; here a foreachBatch parquet writer, which is also the
pattern for idempotent multi-table sinks at scale (batchId-based
dedup on replay)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_stream_parquet(df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Append a streaming DataFrame to parquet, exactly-once via the
    file-sink commit log; runs to completion with AvailableNow."""
    return (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def write_stream_foreach_batch(df: DataFrame, out_dir: str, checkpoint_dir: str):
    """foreachBatch variant: gives the batch DataFrame + batchId for
    idempotent custom sinks (upserts, multi-sink fan-out)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(f"{out_dir}/batch={batch_id}")

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
