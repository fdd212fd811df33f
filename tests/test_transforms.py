"""Golden tests for parse/validate/enrich (SURVEY.md §2.2, §5.2)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators import transforms
from real_time_data_pipeline_spark.sources.generator import synthetic_transactions


def _txn(**overrides):
    base = {
        "transaction_id": "TXN1",
        "account_id": "ACC000001",
        "customer_id": "CUST000001",
        "transaction_type": "deposit",
        "amount": 100.0,
        "currency": "USD",
        "timestamp": "2024-01-01T10:00:00",
        "status": "completed",
    }
    base.update(overrides)
    return {k: v for k, v in base.items() if v is not None}


def _parse(spark, payloads):
    raw = spark.createDataFrame(
        [(p.get("account_id"), json.dumps(p)) for p in payloads],
        "key string, value string",
    )
    return transforms.parse_kafka_payload(raw)


def test_parse_flattens_21_fields_and_casts_timestamps(spark):
    df = _parse(spark, [_txn()])
    row = df.first()
    assert row.transaction_id == "TXN1"
    assert row.amount == 100.0
    assert str(row.event_time) == "2024-01-01 10:00:00"
    assert row.ingestion_time is not None
    # all 21 wire fields present after flatten
    for f in ["merchant_info", "location", "tags", "metadata", "validation_errors"]:
        assert f in df.columns


def test_parse_z_suffix_timestamp(spark):
    df = _parse(spark, [_txn(timestamp="2024-01-01T10:00:00Z")])
    assert str(df.first().event_time) == "2024-01-01 10:00:00"


def test_validate_splits(spark):
    rows = [
        _txn(),  # valid
        _txn(transaction_id=None),  # missing required
        _txn(transaction_id="TXN2", amount=-5.0),  # non-positive
        _txn(transaction_id="TXN3", amount=0.0),  # boundary: 0 is invalid (amount > 0)
        _txn(transaction_id="TXN4", transaction_type="fee"),  # bad type
    ]
    df = transforms.validate(_parse(spark, rows))
    collected = df.collect()
    got = {r.transaction_id: r for r in collected}
    assert got["TXN1"].is_valid and got["TXN1"].validation_result == "valid"
    # null id, negative, zero are invalid; bad type passes P3 (reference
    # transaction_processor.py:229-235 checks only null/amount)
    invalid = [r for r in collected if not r.is_valid]
    assert len(invalid) == 3
    assert got["TXN1"].validation_errors == []
    assert "Invalid transaction type: fee" in got["TXN4"].validation_errors


def test_categorize_thresholds(spark):
    """P5 golden: thresholds 1000/500/100 are strict > (reference
    transaction_processor.py:256-265)."""
    cases = [
        ("deposit", 1000.0, "regular_deposit"),
        ("deposit", 1000.01, "large_deposit"),
        ("withdrawal", 500.0, "regular_withdrawal"),
        ("withdrawal", 500.01, "large_withdrawal"),
        ("payment", 100.0, "regular_payment"),
        ("payment", 100.01, "large_payment"),
        ("transfer", 99999.0, "transfer"),
        ("refund", 1.0, "refund"),
    ]
    df = spark.createDataFrame(
        [(t, a) for t, a, _ in cases], "transaction_type string, amount double"
    ).withColumn("cat", transforms.categorize_amount())
    got = [r.cat for r in df.collect()]
    assert got == [c for _, _, c in cases]


def test_to_kafka_payload_drops_nulls_roundtrip(spark):
    """P7/S5: to_json omits null fields (reference to_dict drops None,
    transaction.py:40-67); round-trip preserves populated fields."""
    df = _parse(spark, [_txn(description=None)])
    payload = transforms.to_kafka_payload(df)
    row = payload.first()
    assert row.key == "ACC000001"
    d = json.loads(row.value)
    assert "description" not in d  # null dropped
    assert d["transaction_id"] == "TXN1"
    # round-trip back through the parser
    df2 = transforms.parse_kafka_payload(
        payload.selectExpr("key", "value"),
    )
    assert df2.first().transaction_id == "TXN1"


def test_generator_domains(spark):
    """S8 distribution parity (reference producer.py:66-130)."""
    df = synthetic_transactions(spark, 2000, seed=1).cache()
    types = {r.transaction_type for r in df.select("transaction_type").distinct().collect()}
    assert types == {"deposit", "withdrawal", "transfer", "payment", "refund"}
    # per-type amount ranges
    rng = {r.transaction_type: (r.lo, r.hi) for r in df.groupBy("transaction_type")
           .agg(F.min("amount").alias("lo"), F.max("amount").alias("hi")).collect()}
    assert rng["deposit"][0] >= 50.0 and rng["deposit"][1] <= 5000.0
    assert rng["payment"][0] >= 5.0 and rng["payment"][1] <= 500.0
    # merchant_info only for payments
    n_bad = df.filter(
        (F.col("transaction_type") != "payment") & F.col("merchant_info").isNotNull()
    ).count()
    assert n_bad == 0
    # status skew ~3:1
    n = df.count()
    n_completed = df.filter(F.col("status") == "completed").count()
    assert 0.68 < n_completed / n < 0.82
    # deterministic
    df2 = synthetic_transactions(spark, 2000, seed=1)
    assert df2.orderBy("transaction_id").first() == df.orderBy("transaction_id").first()
    df.unpersist()


def test_cdc_latest_snapshot_and_apply(spark):
    from real_time_data_pipeline_spark.operators.cdc import (
        apply_changelog,
        latest_snapshot,
    )

    log = spark.createDataFrame(
        [
            # key 1: insert then update -> update wins
            (1, 10, "I", "a"),
            (1, 20, "U", "b"),
            # key 2: insert then delete -> dropped
            (2, 10, "I", "c"),
            (2, 30, "D", "c"),
            # key 3: delete then (re)insert with higher seq -> resurrected
            (3, 10, "D", "x"),
            (3, 40, "I", "y"),
        ],
        "k long, seq long, op string, payload string",
    )
    snap = latest_snapshot(log, ["k"], ["seq"], op_col="op").orderBy("k")
    rows = snap.collect()
    assert [(r["k"], r["seq"], r["payload"], r["n_changes"]) for r in rows] == [
        (1, 20, "b", 2),
        (3, 40, "y", 2),
    ]
    # Apply an increment: update key 1, delete key 3, insert key 4.
    inc = spark.createDataFrame(
        [(1, 50, "U", "z"), (3, 50, "D", "y"), (4, 50, "I", "new")],
        "k long, seq long, op string, payload string",
    )
    merged = apply_changelog(snap, inc, ["k"], ["seq"], op_col="op")
    got = {r["k"]: r for r in merged.collect()}
    assert set(got) == {1, 4}
    assert got[1]["payload"] == "z" and got[1]["seq"] == 50
    assert got[4]["payload"] == "new"
    # Idempotent: re-applying the same increment changes nothing.
    again = apply_changelog(merged, inc, ["k"], ["seq"], op_col="op")
    assert sorted(
        again.select("k", "seq", "op", "payload").collect()
    ) == sorted(merged.select("k", "seq", "op", "payload").collect())
    # Stale increment (lower seq than the snapshot) is a no-op too.
    stale = spark.createDataFrame(
        [(1, 5, "D", "old")], "k long, seq long, op string, payload string"
    )
    assert apply_changelog(merged, stale, ["k"], ["seq"], op_col="op").filter(
        "k = 1"
    ).collect()[0]["payload"] == "z"


def test_flatten_struct_recursive_and_array_preserving(spark):
    from real_time_data_pipeline_spark.operators.transforms import (
        flatten_struct,
    )

    df = spark.createDataFrame(
        [(1, {"b": {"c": 2, "d": "x"}, "e": 3}, [1, 2])],
        "a long, s struct<b: struct<c: long, d: string>, e: long>, arr array<long>",
    )
    out = flatten_struct(df)
    assert out.columns == ["a", "s_b_c", "s_b_d", "s_e", "arr"]
    r = out.collect()[0]
    assert (r["s_b_c"], r["s_b_d"], r["s_e"], r["arr"]) == (2, "x", 3, [1, 2])
