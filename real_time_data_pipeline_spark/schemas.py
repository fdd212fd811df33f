"""Canonical schemas.

``TRANSACTION_SCHEMA`` mirrors the reference wire schema field-for-field
(reference src/spark/transaction_processor.py:122-144 — 21 fields; the
dataclass twin is src/models/transaction.py:11-38).  Timestamps travel as
ISO-8601 strings on the wire and are cast to TimestampType downstream
(reference lines 172-175), so the wire schema keeps them as strings.

Also declares the driver testdata schemas (TESTDATA.md) used by the batch
query surface, so readers can apply explicit schemas instead of relying on
inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference wire schema (21 fields, all nullable, reference ordering) ---
TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), True),
        T.StructField("account_id", T.StringType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("transaction_type", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),  # ISO-8601 wire format
        T.StructField("description", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("reference_id", T.StringType(), True),
        T.StructField("merchant_info", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("location", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("processing_timestamp", T.StringType(), True),
        T.StructField("validation_status", T.StringType(), True),
        T.StructField("enrichment_status", T.StringType(), True),
        T.StructField("data_source", T.StringType(), True),
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("validation_errors", T.ArrayType(T.StringType()), True),
    ]
)

# Value domains from the reference generator + expectation suites
# (reference src/kafka/transaction_producer.py:66-130,
#  src/validation/transaction_validator.py:100-139,
#  src/config/validation_config.yml:26-59).
TRANSACTION_TYPES = ["deposit", "withdrawal", "transfer", "payment", "refund"]
CURRENCIES = ["USD", "EUR", "GBP", "JPY", "CAD", "AUD"]
STATUSES = ["pending", "completed", "failed", "rejected"]
SOURCES = ["mobile_app", "web_banking", "branch", "atm", "merchant_pos"]
ACCOUNT_TYPES = ["checking", "savings", "credit", "loan", "investment"]
ACCOUNT_STATUSES = ["active", "frozen", "closed"]
AMOUNT_MIN, AMOUNT_MAX = 0.01, 1_000_000.00

# --- dimension schemas (FIXTURES.md §2-3; reference declares these via
# kafka_config.yml:18-19 / spark_config.yml:58-62 / transaction.py:97-110) ---
ACCOUNT_SCHEMA = T.StructType(
    [
        T.StructField("account_id", T.StringType(), False),
        T.StructField("customer_id", T.StringType(), False),
        T.StructField("account_type", T.StringType(), True),
        T.StructField("account_status", T.StringType(), True),
    ]
)

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("segment", T.StringType(), True),
    ]
)

# --- lineage table (reference src/utils/data_lineage.py:61-76, 12 columns) ---
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("lineage_id", T.StringType(), False),
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("source_system", T.StringType(), True),
        T.StructField("source_timestamp", T.TimestampType(), True),
        T.StructField("processing_stage", T.StringType(), True),
        T.StructField("processing_timestamp", T.TimestampType(), True),
        T.StructField("process_name", T.StringType(), True),
        T.StructField("process_version", T.StringType(), True),
        T.StructField("input_record_hash", T.StringType(), True),
        T.StructField("output_record_hash", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("metadata", T.StringType(), True),
    ]
)

# --- driver testdata tables (TESTDATA.md) ---
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Tables whose downstream operators are CPU-heavy per row (tokenization,
# shingling, vector math).  Their testdata files are single-row-group
# parquet, which Spark cannot split below one task; fan the scan out to
# cluster parallelism so per-row work uses every core.  At 100 TB a scan
# already yields thousands of splits and this is a no-op.
_COMPUTE_HEAVY_TABLES = {"documents", "embeddings"}


def load_table(spark, sf_dir: str, name: str):
    """Read one driver testdata table as a DataFrame.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as int64 nanos (legacy conf, runtime-settable)
    and convert with integer division so there is no float precision loss.
    Micros = floor(nanos/1000), matching DuckDB's CAST(ts_ns AS TIMESTAMP).
    """
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _COMPUTE_HEAVY_TABLES:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df
