"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column names are aliased identically on both sides; double aggregates are
rounded to 2 decimals on BOTH sides so the order-insensitive value hash is
stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.functions import stable
from real_time_data_pipeline_spark.schemas import load_table

SF0001 = "/root/testdata/sf0.001"


def _q_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 flagship: 1h tumbling window x user_id -> count/sum/avg over events.

    Reference semantics: src/spark/transaction_processor.py:282-294.
    Money aggregates use exact integer-cents arithmetic (stable.py) so the
    DuckDB oracle hashes identically.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("window"), "user_id")
        .agg(
            F.count("event_id").alias("transaction_count"),
            stable.sum_money("value", "total_amount"),
            stable.avg_money("value", "avg_amount", "COUNT(event_id)"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "user_id",
            "transaction_count",
            "total_amount",
            "avg_amount",
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_windowed_agg(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from real_time_data_pipeline_spark.queries import all_queries

    out = {"windowed_agg": _q_windowed_agg}
    out.update(all_queries())
    return out


def oracle_sql() -> dict[str, str]:
    from real_time_data_pipeline_spark.functions.stable import (
        avg_money_sql,
        sum_money_sql,
    )
    from real_time_data_pipeline_spark.queries import all_oracles

    out = {
        "windowed_agg": f"""
            SELECT
              CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
              user_id,
              count(event_id) AS transaction_count,
              {sum_money_sql('value')} AS total_amount,
              {avg_money_sql('value', 'COUNT(event_id)')} AS avg_amount
            FROM events
            GROUP BY 1, 2
        """,
    }
    out.update(all_oracles())
    return out
