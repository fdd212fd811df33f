"""Warehouse layout helpers: date-partitioned and bucketed tables.

Two physical-layout tools that matter at 100 TB:

- **Date partitioning** (year/month/day directories) → partition pruning:
  day-ranged scans touch only matching directories.  Streaming writes via
  sinks.partitioned_parquet_sink; batch backfills via write_partitioned.
- **Bucketing** (hash-bucketed, sorted files per bucket on the join key)
  → repeated large-fact joins and aggregations on the bucket key skip
  their Exchange entirely: Spark's bucketed scan reports the hash
  distribution, so SortMergeJoin consumes both sides in place.  Paying
  one shuffle at write time amortizes it over every subsequent join —
  the right trade for fact tables joined daily on the same key.

Bucketed tables must go through the session catalog (`saveAsTable`);
plain `.parquet(path)` writes cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from real_time_data_pipeline_spark.functions.scalar import partition_cols


def write_partitioned(
    df: DataFrame, path: str, ts_col: str, mode: str = "append"
) -> None:
    """Batch twin of the S9 streaming sink: parquet partitioned by
    (year, month, day) derived from `ts_col`."""
    df.select("*", *partition_cols(ts_col)).write.partitionBy(
        "year", "month", "day"
    ).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a catalog table hash-bucketed (and sorted) by `key`.

    Bucket count should be sized so one bucket of the largest co-bucketed
    table fits an executor's memory at the target scale; co-locate tables
    joined together by giving them the SAME bucket count and key."""
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode(mode).format("parquet").saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucket spec
    only survives a catalog read)."""
    return spark.table(table)
