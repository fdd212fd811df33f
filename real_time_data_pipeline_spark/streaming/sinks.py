"""Streaming sinks (SURVEY.md §2.1 S2/S3/S9/S10/S11).

Each helper returns a started ``StreamingQuery``.  Sinks that Spark lacks
natively at the needed shape (date-partitioned warehouse append, S9) go
through ``foreachBatch`` — the batch writer inside is the same code a
batch backfill would use, which is the point: one writer, two run modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from real_time_data_pipeline_spark.functions.scalar import partition_cols
from real_time_data_pipeline_spark.operators.transforms import to_kafka_payload


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str = "account_id",
) -> StreamingQuery:
    """S2: key=account_id, value=row-as-JSON, append mode, checkpointed
    (reference transaction_processor.py:187-198)."""
    return (
        to_kafka_payload(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def console_sink(
    df: DataFrame,
    output_mode: str = "complete",
    trigger_seconds: int = 10,
    truncate: bool = False,
) -> StreamingQuery:
    """S3: console sink, complete mode, processing-time trigger
    (reference transaction_processor.py:200-205)."""
    return (
        df.writeStream.format("console")
        .outputMode(output_mode)
        .option("truncate", str(truncate).lower())
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def memory_sink(
    df: DataFrame, name: str, output_mode: str = "append"
) -> StreamingQuery:
    """Test sink: results queryable as ``spark.sql(f"SELECT * FROM {name}")``."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def partitioned_parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    ts_col: str = "event_time",
    partition_by: tuple[str, ...] = ("year", "month", "day"),
) -> StreamingQuery:
    """S9: warehouse append partitioned by (year, month, day) derived from
    the event timestamp (declared at reference spark_config.yml:65-69; the
    partition columns don't exist in the schema and must be derived).

    Storage-partition pruning then makes day-ranged batch queries skip
    irrelevant files — the 100 TB table layout."""

    def write_batch(batch: DataFrame, _batch_id: int) -> None:
        batch.select("*", *partition_cols(ts_col)).write.partitionBy(
            *partition_by
        ).mode("append").parquet(path)

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def foreach_batch_collect(df: DataFrame, out: list) -> StreamingQuery:
    """Test sink: append each micro-batch's rows to a driver-side list.
    Test-only by design — a driver-side collect of the full stream is the
    anti-pattern the engine otherwise avoids."""

    def _collect(batch: DataFrame, batch_id: int) -> None:
        out.extend(batch.collect())

    return df.writeStream.foreachBatch(_collect).outputMode("append").start()
