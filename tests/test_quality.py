"""Expectation-suite compiler tests (SURVEY.md §2.6) — each expectation
type gets a pass and a fail case."""

from __future__ import annotations

from real_time_data_pipeline_spark.operators import quality
from real_time_data_pipeline_spark.operators.quality import (
    ACCOUNT_SUITE,
    TRANSACTION_SUITE,
    Expectation,
    apply_suite,
    suite_metrics,
)

SCHEMA = (
    "transaction_id string, account_id string, transaction_type string, "
    "amount double, currency string, status string, timestamp string"
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


GOOD = ("T1", "A1", "deposit", 10.0, "USD", "pending", "2024-01-01T00:00:00")


def test_all_pass(spark):
    df = apply_suite(_rows(spark, [GOOD]), TRANSACTION_SUITE)
    row = df.first()
    assert row.dq_valid and row.dq_errors == []


def test_each_expectation_fails(spark):
    cases = {
        "not_null": (None, "A1", "deposit", 10.0, "USD", "pending", "2024-01-01T00:00:00"),
        "in_set_type": ("T1", "A1", "fee", 10.0, "USD", "pending", "2024-01-01T00:00:00"),
        "between_low": ("T1", "A1", "deposit", 0.001, "USD", "pending", "2024-01-01T00:00:00"),
        "between_high": ("T1", "A1", "deposit", 1_000_000.01, "USD", "pending", "2024-01-01T00:00:00"),
        "in_set_currency": ("T1", "A1", "deposit", 10.0, "XYZ", "pending", "2024-01-01T00:00:00"),
        "in_set_status": ("T1", "A1", "deposit", 10.0, "USD", "lost", "2024-01-01T00:00:00"),
        "parseable": ("T1", "A1", "deposit", 10.0, "USD", "pending", "not-a-date"),
    }
    for name, row in cases.items():
        got = apply_suite(_rows(spark, [row]), TRANSACTION_SUITE).first()
        assert not got.dq_valid, name
        assert len(got.dq_errors) >= 1, name


def test_boundaries_pass(spark):
    for amt in (0.01, 1_000_000.00):
        row = ("T1", "A1", "deposit", amt, "USD", "pending", "2024-01-01T00:00:00")
        assert apply_suite(_rows(spark, [row]), TRANSACTION_SUITE).first().dq_valid


def test_unique(spark):
    df = _rows(spark, [GOOD, GOOD, ("T2",) + GOOD[1:]])
    rows = apply_suite(df, TRANSACTION_SUITE).collect()
    dup = [r for r in rows if r.transaction_id == "T1"]
    uniq = [r for r in rows if r.transaction_id == "T2"]
    assert all(not r.dq_valid for r in dup)
    assert all("Failed unique" in e for r in dup for e in r.dq_errors)
    assert all(r.dq_valid for r in uniq)


def test_null_passes_non_required_checks(spark):
    """GE semantics: nulls pass in_set/between; only not_null catches them."""
    row = ("T1", "A1", None, None, None, None, None)
    got = apply_suite(_rows(spark, [row]), TRANSACTION_SUITE).first()
    errors = set(got.dq_errors)
    assert not got.dq_valid
    assert any("not_null" in e for e in errors)  # transaction_type not_null fails
    assert not any("in_set" in e and "currency" in str(e) for e in errors)


def test_suite_metrics(spark):
    df = _rows(spark, [GOOD, ("T2", "A1", "fee", -1.0, "XYZ", "pending", "2024-01-01T00:00:00")])
    m = {(r.column, r.expectation_type): (r.n_pass, r.n_fail)
         for r in suite_metrics(df, TRANSACTION_SUITE).collect()}
    assert m[("transaction_id", "not_null")] == (2, 0)
    assert m[("transaction_type", "in_set")] == (1, 1)
    assert m[("amount", "between")] == (1, 1)
    assert m[("currency", "in_set")] == (1, 1)


def test_account_suite(spark):
    df = spark.createDataFrame(
        [("A1", "C1", "checking"), ("A2", None, "mystery")],
        "account_id string, customer_id string, account_type string",
    )
    rows = apply_suite(df, ACCOUNT_SUITE).collect()
    byid = {r.account_id: r for r in rows}
    assert byid["A1"].dq_valid
    assert not byid["A2"].dq_valid
    assert len(byid["A2"].dq_errors) == 2  # customer_id null + bad type


def test_unknown_expectation_raises():
    import pytest

    with pytest.raises(ValueError):
        quality.compile_expectation(Expectation("x", "expect_magic"))
