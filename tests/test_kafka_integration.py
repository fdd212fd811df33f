"""Kafka path tests (SURVEY.md §2.1 S1/S2/S12).

Two tiers, because this sandbox has no broker:

1. Broker-free unit tests of the option plumbing — the exact reader /
   writer option dicts the production path passes to
   ``format("kafka")`` (reference transaction_processor.py:154-160 and
   :187-198).  These always run.
2. A broker-gated integration test: when ``KAFKA_BOOTSTRAP_SERVERS`` is
   set (CI with a docker/testcontainers broker) AND the Spark
   distribution ships the kafka connector, it provisions a topic
   (scripts/provision_kafka.sh layout), produces via the batch kafka
   writer, and round-trips produce → kafka_source → parse → kafka_sink →
   re-read, including the checkpoint directory.  Skips cleanly here.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

from real_time_data_pipeline_spark.streaming import sinks, sources

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS", "")


def _broker_reachable() -> bool:
    if not BOOTSTRAP:
        return False
    host, _, port = BOOTSTRAP.partition(",")[0].partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


def _kafka_connector_available(spark) -> bool:
    """The kafka data source ships as a separate jar
    (spark-sql-kafka-0-10); probe for it without a broker."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


# ---------------------------------------------------------------- tier 1


def test_kafka_source_options_plumbing():
    opts = sources.kafka_source_options(
        "broker:9092", "banking.transactions.raw",
        starting_offsets="latest", max_offsets_per_trigger=5000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "banking.transactions.raw",
        "startingOffsets": "latest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "5000",
    }
    # backpressure knob is optional and must not appear when unset
    assert "maxOffsetsPerTrigger" not in sources.kafka_source_options(
        "broker:9092", "t"
    )


def test_kafka_sink_options_plumbing(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    opts = sinks.kafka_sink_options(
        "broker:9092", "banking.transactions.validated", ckpt
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "banking.transactions.validated",
        "checkpointLocation": ckpt,
    }


# ---------------------------------------------------------------- tier 2


@pytest.mark.skipif(not _broker_reachable(), reason="no Kafka broker "
                    "(set KAFKA_BOOTSTRAP_SERVERS to enable)")
def test_kafka_roundtrip_produce_parse_sink(spark, tmp_path):
    """Produce → kafka_source → parse_kafka_payload → kafka_sink → read
    back, with checkpointing — the reference's entry point 1
    (transaction_processor.py:154-205) end to end."""
    if not _kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")

    import json

    from pyspark.sql import functions as F

    from real_time_data_pipeline_spark.operators import transforms

    run = uuid.uuid4().hex[:8]
    topic_in, topic_out = f"it.raw.{run}", f"it.validated.{run}"

    payload = {
        "transaction_id": "K1",
        "account_id": "ACC000001",
        "transaction_type": "deposit",
        "amount": 12.5,
        "currency": "USD",
        "status": "completed",
        "timestamp": "2024-01-01T10:00:00",
    }
    # batch produce (auto-creates the topic on default broker configs;
    # CI can pre-provision with scripts/provision_kafka.sh instead)
    spark.createDataFrame(
        [(payload["account_id"], json.dumps(payload))], "key string, value string"
    ).write.format("kafka").option(
        "kafka.bootstrap.servers", BOOTSTRAP
    ).option("topic", topic_in).save()

    raw = sources.kafka_source(spark, BOOTSTRAP, topic_in)
    parsed = transforms.parse_kafka_payload(
        raw.select(F.col("key").cast("string"), F.col("value").cast("string"))
    )
    q = sinks.kafka_sink(
        parsed, BOOTSTRAP, topic_out, str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic_out)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("value").cast("string"))
        .collect()
    )
    assert len(back) == 1
    assert json.loads(back[0][0])["transaction_id"] == "K1"
    # checkpoint directory was actually used
    assert os.path.isdir(str(tmp_path / "ckpt"))
