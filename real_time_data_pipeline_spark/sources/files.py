"""Schema-enforced file sources with corrupt-record quarantine.

The reference ingests JSON strings off Kafka and hand-parses them row by
row, silently skipping records that fail json.loads (reference
src/kafka/transaction_consumer.py:96-109).  The engine's file-source twin
makes the same semantics declarative and auditable: read with an EXPLICIT
schema in PERMISSIVE mode, capture unparseable lines in a corrupt-record
column, and split the result into (clean, quarantined) — the quarantined
half flows to the same dead-letter path as the streaming pipeline's
(pipeline.build_dag()["dead_letter"]).

Explicit schemas are non-negotiable at 100 TB: schema inference is a
full extra pass over the data, and a drifted upstream field silently
widens every downstream type.  Both readers take the schema as an
argument and never infer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_data_pipeline_spark.operators import cache

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """Schema + corrupt-record capture column (must be part of the read
    schema for PERMISSIVE mode to populate it)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON with an enforced schema.

    Returns ``(clean, quarantined)``: clean rows match the schema
    (corrupt column dropped); quarantined rows carry the raw offending
    line in ``_corrupt_record`` plus NULLs for every schema field.  A
    syntactically valid object with a missing field is CLEAN with that
    field NULL (the validity predicate downstream decides, mirroring the
    reference's validate-after-parse order); only unparseable lines
    quarantine."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires a materialization barrier between referencing the
    # corrupt column and filtering on it (SPARK-21610): cache the parsed
    # frame once; both halves reuse it.  Tracked so callers release it
    # (cache.release_all / scoped) instead of leaking per read — but the
    # cache doubles as the corrupt-column barrier, so evaluate both
    # splits BEFORE releasing: a post-release evaluation of the
    # quarantine split raises QUERY_ONLY_CORRUPT_RECORD_COLUMN (loud,
    # pinned in tests) rather than recomputing.
    df = cache.track(df)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantined


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_jsonl` — same (clean, quarantined) split,
    same PERMISSIVE + corrupt-column contract.  Rows with the wrong
    column count or uncastable cells quarantine; valid rows with NULLs
    stay clean for the downstream validity predicate."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )
    df = cache.track(df)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantined
