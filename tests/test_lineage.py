"""Lineage operator tests (SURVEY.md §2.7): hash canonicalization,
transform-step input/output hashes, readback ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators import lineage


def test_record_hash_is_deterministic_and_field_order_free(spark):
    from real_time_data_pipeline_spark.functions.scalar import record_hash

    df = spark.createDataFrame(
        [("T1", 10.0), ("T2", 20.0)], "transaction_id string, amount double"
    )
    a = df.select(record_hash(["amount", "transaction_id"]).alias("h")).collect()
    b = df.select(record_hash(["transaction_id", "amount"]).alias("h")).collect()
    assert [r.h for r in a] == [r.h for r in b]  # alphabetical canonicalization
    assert len(set(r.h for r in a)) == 2         # distinct rows, distinct hashes


def test_transform_lineage_hashes_differ_when_payload_changes(spark):
    df_in = spark.createDataFrame(
        [("T1", 10.0), ("T2", 20.0)], "transaction_id string, amount double"
    )
    df_out = df_in.withColumn("amount", F.col("amount") * 2)
    recs = lineage.transform_lineage(
        df_in, df_out, "enrich", "test_proc",
        in_hash_cols=["transaction_id", "amount"],
        out_hash_cols=["transaction_id", "amount"],
    ).collect()
    assert len(recs) == 2
    for r in recs:
        assert r.input_record_hash != r.output_record_hash
        assert r.processing_stage == "enrich"
        assert len(r.input_record_hash) == 64  # sha256 hex

    # identity transform -> hashes equal
    same = lineage.transform_lineage(
        df_in, df_in, "receive", "test_proc",
        in_hash_cols=["transaction_id", "amount"],
        out_hash_cols=["transaction_id", "amount"],
    ).collect()
    assert all(r.input_record_hash == r.output_record_hash for r in same)


def test_lineage_readback_time_ordered(spark, tmp_path):
    df = spark.createDataFrame(
        [("T1", 1.0)], "transaction_id string, amount double"
    )
    path = str(tmp_path / "lineage")
    lineage.track_processing_step(df, path, "receive", "p")
    lineage.track_processing_step(df, path, "validate", "p")
    back = lineage.get_transaction_lineage(spark, path, "T1").collect()
    assert sorted(r.processing_stage for r in back) == ["receive", "validate"]
    ts = [r.processing_timestamp for r in back]
    assert ts == sorted(ts)  # ordered by processing_timestamp


def test_merkle_manifest_detects_tamper_and_ignores_order(spark):
    """Root/partition hashes are ingest-order-free; a single-char edit
    in one partition changes THAT partition's hash and the root, and
    no other partition's."""
    rows = [(i, f"doc text {i}", f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    base = {
        (r["level"], r["key"]): (r["hash"], r["n_docs"])
        for r in lineage.merkle_manifest(df).collect()
    }
    assert len(base) == 4 and ("root", "__all__") in base
    assert base[("root", "__all__")][1] == 30

    shuffled = spark.createDataFrame(
        list(reversed(rows)), "doc_id long, text string, source string"
    ).repartition(7)
    again = {
        (r["level"], r["key"]): (r["hash"], r["n_docs"])
        for r in lineage.merkle_manifest(shuffled).collect()
    }
    assert again == base

    tampered_rows = [
        (i, ("doc text X" if i == 4 else f"doc text {i}"), f"s{i % 3}")
        for i in range(30)
    ]
    tampered = {
        (r["level"], r["key"]): r["hash"]
        for r in lineage.merkle_manifest(
            spark.createDataFrame(
                tampered_rows, "doc_id long, text string, source string"
            )
        ).collect()
    }
    # doc 4 lives in s1: only s1's hash and the root change
    assert tampered[("source", "s1")] != base[("source", "s1")][0]
    assert tampered[("root", "__all__")] != base[("root", "__all__")][0]
    for k in (("source", "s0"), ("source", "s2")):
        assert tampered[k] == base[k][0]


def test_merkle_incremental_fold_equals_full(spark, tmp_path):
    """Incremental re-hash from the persisted leaf store equals the
    ground-up manifest over history+increment."""
    rows = [(i, f"doc body {i * 7 % 13} {i}", f"s{i % 4}") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    hist = df.filter(F.col("doc_id") % 10 != 0)
    inc = df.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "merkle")
    lineage.build_merkle_store(hist, path)
    got = {
        (r["level"], r["key"]): (r["hash"], r["n_docs"])
        for r in lineage.merkle_manifest_incremental(spark, inc, path).collect()
    }
    want = {
        (r["level"], r["key"]): (r["hash"], r["n_docs"])
        for r in lineage.merkle_manifest(df).collect()
    }
    assert got == want
