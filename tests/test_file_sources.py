"""Schema-enforced JSONL/CSV sources: corrupt-record quarantine split
(sources/files.py), mirroring the reference consumer's skip-on-parse-
failure semantics (transaction_consumer.py:96-109) declaratively."""

from __future__ import annotations

from pyspark.sql import types as T

from real_time_data_pipeline_spark.sources import files

SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("currency", T.StringType()),
    ]
)


def test_jsonl_corrupt_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"transaction_id": "t1", "amount": 10.5, "currency": "USD"}',
                "{this is not json",
                '{"transaction_id": "t2", "currency": "EUR"}',  # missing field -> clean+NULL
                '{"transaction_id": "t3", "amount": "not_a_number", "currency": "USD"}',
            ]
        )
    )
    clean, bad = files.read_jsonl(spark, str(p), SCHEMA)
    crows = {r["transaction_id"]: r for r in clean.collect()}
    brows = bad.collect()
    # t1 parses fully; t2 is schema-valid with NULL amount (validity is
    # the downstream predicate's job, same order as the reference).
    assert set(crows) == {"t1", "t2"}
    assert crows["t1"]["amount"] == 10.5
    assert crows["t2"]["amount"] is None
    # Unparseable line and uncastable cell both quarantine with the raw
    # text preserved for the dead-letter topic.
    assert len(brows) == 2
    assert any("not json" in r[files.CORRUPT_COL] for r in brows)
    assert any("not_a_number" in r[files.CORRUPT_COL] for r in brows)
    # Clean schema carries no corrupt column.
    assert files.CORRUPT_COL not in clean.columns


def test_csv_corrupt_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "transaction_id,amount,currency\n"
        "t1,10.5,USD\n"
        "t2,oops,EUR\n"
        "t3,3.25,GBP\n"
    )
    clean, bad = files.read_csv(spark, str(p), SCHEMA)
    assert {r["transaction_id"] for r in clean.collect()} == {"t1", "t3"}
    brows = bad.collect()
    assert len(brows) == 1 and "oops" in brows[0][files.CORRUPT_COL]


def test_quarantine_split_is_tracked_and_fails_loud_after_release(
    spark, tmp_path
):
    """The corrupt-column cache is routed through cache.track (no leak
    per read).  The cache doubles as Spark's corrupt-column barrier, so
    a post-release evaluation of the quarantine split must fail LOUDLY
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — never silently recompute."""
    import pytest
    from pyspark.errors import AnalysisException

    from real_time_data_pipeline_spark.operators import cache

    p = tmp_path / "q.jsonl"
    p.write_text('{"a": 1}\n{bad\n')
    schema = T.StructType([T.StructField("a", T.LongType())])
    before = cache.n_tracked()
    clean, quar = files.read_jsonl(spark, str(p), schema)
    assert cache.n_tracked() == before + 1
    assert clean.count() == 1 and quar.count() == 1
    cache.release_all()
    with pytest.raises(AnalysisException):
        quar.count()
