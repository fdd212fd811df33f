"""Oracle-checked query registry.

Each submodule exports ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL over the same
parquet).  Keys must match; queries without an oracle entry get a weaker
rows-only check from the driver.

Conventions (driver contract):
- every computed column aliased identically in Spark and SQL;
- money/double aggregates via functions/stable.py integer-cents SQL so
  value hashes match across engines;
- timestamps cast to microsecond TIMESTAMP on the DuckDB side (events.ts
  is nanos there, micros in Spark).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_data_pipeline_spark.queries import (
    dedup,
    joins_ext,
    lineage_q,
    multimodal,
    reference_parity,
    similarity,
    text,
    tpch,
)

_MODULES = [reference_parity, tpch, joins_ext, lineage_q, dedup, text, similarity, multimodal]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
