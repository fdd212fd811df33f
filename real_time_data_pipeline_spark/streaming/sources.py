"""Streaming sources (SURVEY.md §2.1 S1/S6/S8).

Every source returns a Kafka-shaped streaming DataFrame with at least
``key`` (string|binary, nullable) and ``value`` (string|binary JSON
payload) columns, so the rest of the pipeline is source-agnostic:
``transforms.parse_kafka_payload`` is the single deserialization point.

- ``kafka_source`` — the production path (reference
  src/spark/transaction_processor.py:154-160).  Needs a broker; tests use
  the file/rate sources instead.
- ``file_json_source`` — JSON-lines directory stream; the test twin.
  Deterministic and replayable (the driver contract's batch queries use
  plain ``spark.read`` — this is only for streaming-semantics tests).
- ``rate_synthetic_source`` — `rate` source mapped through the synthetic
  transaction generator expressions (reference
  src/kafka/transaction_producer.py:66-130 semantics, S8), for soak runs
  without Kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Reader options for S1 as a pure dict, so the plumbing is
    unit-testable without a broker (the broker-gated integration test
    then proves the same dict against a live cluster)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # fail fast on truncated topics instead of silently dropping data
        "failOnDataLoss": "true",
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1: subscribe to a Kafka topic (reference transaction_processor.py:154-160).

    ``maxOffsetsPerTrigger`` bounds micro-batch size — at production rates
    this is the backpressure knob that keeps batch duration under the
    trigger interval."""
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_source_options(
                bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger
            )
        )
        .load()
    )


def file_json_source(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """JSON-lines directory stream shaped like Kafka records.

    Each line is one message body; ``key`` is derived from the payload's
    account_id the way the reference producer keys messages
    (src/kafka/transaction_producer.py:143)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    lines = reader.load(path)
    return lines.select(
        F.get_json_object(F.col("value"), "$.account_id").alias("key"),
        F.col("value"),
    )


def rate_synthetic_source(
    spark: SparkSession, rows_per_second: int = 100, seed: int = 7
) -> DataFrame:
    """S8: `rate` source → synthetic transaction JSON, Kafka-shaped.

    Reuses the batch generator's projection so stream and batch synthesize
    identical distributions."""
    from real_time_data_pipeline_spark.sources.generator import transactions_from_ids

    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()
    txns = transactions_from_ids(rate.select(F.col("value").alias("id")), seed=seed)
    return txns.select(
        F.col("account_id").alias("key"),
        F.to_json(F.struct(*txns.columns)).alias("value"),
    )
