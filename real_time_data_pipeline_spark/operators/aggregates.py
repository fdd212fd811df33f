"""Windowed / grouped aggregations.

Reference parity:
  A1 tumbling-window group-agg  — reference src/spark/transaction_processor.py:282-294
     (1h tumbling window x account_id -> count/sum/avg)
  A2 watermark                  — transaction_processor.py:283 (30 minutes)
  A3 sliding window             — declared src/config/spark_config.yml:36-37
     (60s window / 30s slide; never wired in reference code)
  A5 validation summary         — src/validation/transaction_validator.py:197-218
  A7 transaction_summary rollup — declared spark_config.yml:62,68-69
     (periodic (year, month) rollup of A1)
  N5 session windows            — north-star tier (BASELINE.json)

All functions are pure ``DataFrame -> DataFrame`` and work in both batch
and streaming (the watermark argument is a no-op on batch frames, matching
Spark semantics).

Scale notes: each of these is a single hash-aggregate — Spark plans a
partial (map-side) aggregate before the exchange, so the shuffle carries
one row per (window, key) per input partition, not per event.  Double
aggregates are rounded only at the presentation edge (callers/oracles), not
here, to avoid losing precision in downstream math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    ts_col: str = "event_time",
    key_col: str = "account_id",
    value_col: str = "amount",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
    count_col: str = "transaction_id",
) -> DataFrame:
    """Tumbling (A1) or sliding (A3) window aggregate: count / sum / avg.

    Mirrors reference transaction_processor.py:282-294 verbatim semantics:
    groupBy(window(ts, dur), key).agg(count -> transaction_count,
    sum -> total_amount, avg -> avg_amount); slide!=None gives the declared
    sliding variant (spark_config.yml:36-37).
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        df.groupBy(win.alias("window"), F.col(key_col))
        .agg(
            F.count(F.col(count_col)).alias("transaction_count"),
            F.sum(F.col(value_col)).alias("total_amount"),
            F.avg(F.col(value_col)).alias("avg_amount"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "transaction_count",
            "total_amount",
            "avg_amount",
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Session-window aggregate (N5): per-key sessions split on `gap` idle.

    Uses the built-in ``session_window`` (stateful merge in streaming,
    sort-within-key in batch) — no Python in the loop.
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col)).alias("total_value"),
        )
        .select(
            F.col("session.start").alias("session_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def validation_summary(df: DataFrame, valid_col: str = "is_valid") -> DataFrame:
    """Batch data-quality rollup (A5): total/valid/invalid/success_rate.

    Vectorized twin of reference transaction_validator.py:197-218 (which
    loops over per-row GE results in Python).  One partial+final aggregate,
    no shuffle of raw rows.
    """
    v = F.col(valid_col).cast("int")
    return df.agg(
        F.count("*").alias("total"),
        F.sum(v).alias("valid_count"),
        F.sum(1 - v).alias("invalid_count"),
        F.round(F.avg(v) * 100.0, 2).alias("success_rate"),
    )


def monthly_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """A7 `transaction_summary` rollup: (year, month, key) -> count/sum/avg.

    The reference declares this as a Hive table partitioned by (year, month)
    (spark_config.yml:62,68-69); writers should ``partitionBy("year",
    "month")`` so downstream reads get partition pruning.
    """
    return (
        df.groupBy(
            F.year(ts_col).alias("year"),
            F.month(ts_col).alias("month"),
            F.col(key_col),
        )
        .agg(
            F.count("*").alias("transaction_count"),
            F.sum(value_col).alias("total_amount"),
            F.avg(value_col).alias("avg_amount"),
        )
    )


def uniqueness_violations(df: DataFrame, key_col: str = "transaction_id") -> DataFrame:
    """A6 uniqueness check: keys appearing more than once, with counts.

    Batch form of GE expect_column_values_to_be_unique
    (reference transaction_validator.py:79-84).
    """
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """N2: HyperLogLog++ approximate distinct count — constant memory per
    partition, single small shuffle of sketches (not rows)."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))
