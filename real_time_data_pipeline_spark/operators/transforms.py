"""Core record transforms: parse → validate → enrich.

Pure ``DataFrame -> DataFrame`` functions; the same code path serves batch
(tests / oracle) and streaming (wrapped by streaming/pipeline.py), which
collapses the reference's duplicated Python row path and Spark path into
one implementation (SURVEY.md §3).

Reference parity:
  S4 parse    — src/spark/transaction_processor.py:163-175
  P3/P4 validate — transaction_processor.py:218-243
  P6 validate w/ error accumulation — src/models/transaction.py:112-139
  P5 enrich/categorize — transaction_processor.py:245-269
  S5 serialize — transaction_processor.py:187-191

Everything here is built-in Column expressions — whole-stage codegen,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_data_pipeline_spark.schemas import TRANSACTION_SCHEMA, TRANSACTION_TYPES

# P5 category thresholds (reference transaction_processor.py:256-265).
LARGE_DEPOSIT_THRESHOLD = 1000.0
LARGE_WITHDRAWAL_THRESHOLD = 500.0
LARGE_PAYMENT_THRESHOLD = 100.0


def parse_kafka_payload(
    df: DataFrame, schema: T.StructType = TRANSACTION_SCHEMA
) -> DataFrame:
    """S4: Kafka (key,value) bytes → typed columns.

    CAST value to string, `from_json` against the 21-field schema, flatten,
    then cast the ISO-8601 string timestamps and stamp ingestion_time
    (reference transaction_processor.py:163-175).  Rows whose JSON doesn't
    match the schema surface as null columns (standard from_json
    semantics), which is why validation runs *after* parse.
    """
    return (
        df.selectExpr("CAST(key AS STRING) AS kafka_key", "CAST(value AS STRING) AS raw")
        .withColumn("data", F.from_json(F.col("raw"), schema))
        .select("kafka_key", "data.*")
        .withColumn("event_time", F.to_timestamp("timestamp"))
        .withColumn("processing_time", F.to_timestamp("processing_timestamp"))
        .withColumn("ingestion_time", F.current_timestamp())
    )


def validity_predicate(
    required: tuple[str, ...] = ("transaction_id", "account_id", "transaction_type"),
    amount_col: str = "amount",
) -> Column:
    """P3: required fields present ∧ amount present and positive
    (reference transaction_processor.py:229-235)."""
    pred = F.lit(True)
    for c in required:
        pred = pred & F.col(c).isNotNull()
    return pred & F.col(amount_col).isNotNull() & (F.col(amount_col) > 0)


def validation_errors_col(
    required: tuple[str, ...] = ("transaction_id", "account_id", "transaction_type"),
    amount_col: str = "amount",
    type_col: str = "transaction_type",
    allowed_types: list[str] = TRANSACTION_TYPES,
) -> Column:
    """P6: array of error strings, vectorized twin of the Python
    row validator (reference src/models/transaction.py:112-139).

    Error message text mirrors the reference ("X is required", "Amount
    must be positive", "Invalid transaction type: T").
    """
    checks = [
        F.when(F.col(c).isNull(), F.lit(f"{c} is required")) for c in required
    ]
    checks.append(
        F.when(
            F.col(amount_col).isNull() | (F.col(amount_col) <= 0),
            F.lit("Amount must be positive"),
        )
    )
    checks.append(
        F.when(
            F.col(type_col).isNotNull() & ~F.col(type_col).isin(allowed_types),
            F.concat(F.lit("Invalid transaction type: "), F.col(type_col)),
        )
    )
    return F.filter(F.array(*checks), lambda x: x.isNotNull())


def validate(df: DataFrame) -> DataFrame:
    """P3+P4+P6: add is_valid, validation_result, validation_errors
    (reference transaction_processor.py:218-243 + transaction.py:112-139)."""
    return (
        df.withColumn("is_valid", validity_predicate())
        .withColumn(
            "validation_result",
            F.when(F.col("is_valid"), F.lit("valid")).otherwise(F.lit("invalid")),
        )
        .withColumn("validation_errors", validation_errors_col())
    )


def categorize_amount(
    type_col: str = "transaction_type", amount_col: str = "amount"
) -> Column:
    """P5: nested CASE categorization (reference
    transaction_processor.py:256-265, thresholds 1000/500/100)."""
    t, a = F.col(type_col), F.col(amount_col)
    return (
        F.when(
            t == "deposit",
            F.when(a > LARGE_DEPOSIT_THRESHOLD, "large_deposit").otherwise(
                "regular_deposit"
            ),
        )
        .when(
            t == "withdrawal",
            F.when(a > LARGE_WITHDRAWAL_THRESHOLD, "large_withdrawal").otherwise(
                "regular_withdrawal"
            ),
        )
        .when(
            t == "payment",
            F.when(a > LARGE_PAYMENT_THRESHOLD, "large_payment").otherwise(
                "regular_payment"
            ),
        )
        .otherwise(t)
    )


def enrich(df: DataFrame) -> DataFrame:
    """P5 wrapper: add transaction_category + enrichment_status
    (reference transaction_processor.py:245-269)."""
    return df.withColumn("transaction_category", categorize_amount()).withColumn(
        "enrichment_status", F.lit("enriched")
    )


def to_kafka_payload(df: DataFrame, key_col: str = "account_id") -> DataFrame:
    """S5/P7: row → (key, JSON value) for a Kafka sink (reference
    transaction_processor.py:187-191).  Spark's to_json drops null fields,
    matching the reference's None-dropping to_dict
    (src/models/transaction.py:40-67)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def flatten_struct(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten every struct column into top-level columns
    (``a.b.c`` → ``a_b_c``) — the schema-normalization step between
    nested ingestion formats (JSON/protobuf-shaped parquet) and flat
    consumers (feature stores, warehouse tables, the DuckDB oracles,
    which cannot hash struct cells).

    Pure projection (no shuffle, no UDF); arrays are left intact —
    explode is a row-multiplying decision the caller must own.
    """
    from pyspark.sql.types import StructType

    def cols(prefix: str, schema: StructType) -> list:
        out = []
        for f in schema.fields:
            path = f"{prefix}.{f.name}" if prefix else f.name
            name = path.replace(".", sep)
            if isinstance(f.dataType, StructType):
                out.extend(cols(path, f.dataType))
            else:
                out.append(F.col(path).alias(name))
        return out

    return df.select(*cols("", df.schema))
