"""Lineage queries (SURVEY.md §2.7 L1-L4) over the events stream mapped
as transactions.

``lineage_records`` emits uuid() and current_timestamp() (reference
data_lineage.py:114,131), so the full record surface is rows-only; the
deterministic projection (stage × status counts over a two-stage
receive→validate pipeline) is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators.lineage import lineage_records
from real_time_data_pipeline_spark.queries.reference_parity import VALID_SQL
from real_time_data_pipeline_spark.schemas import load_table


def _two_stage_lineage(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "is_valid", F.expr(VALID_SQL)
    )
    receive = lineage_records(
        ev, "receive", "etl_pipeline", id_col="event_id",
        hash_cols=["event_id", "user_id", "event_type"],
    )
    validate = lineage_records(
        ev, "validate", "etl_pipeline", id_col="event_id", status_col="is_valid",
        hash_cols=["event_id", "user_id", "event_type"],
    )
    return receive.unionByName(validate)


def q_lineage_records(spark, sf_dir):
    """L1: full 12-column lineage surface for a two-stage pipeline.
    Rows-only (uuid + wall-clock timestamps are non-deterministic)."""
    return _two_stage_lineage(spark, sf_dir)


def q_lineage_summary(spark, sf_dir):
    """L1/L4 deterministic projection: records per (stage, status)."""
    return (
        _two_stage_lineage(spark, sf_dir)
        .groupBy("processing_stage", "status")
        .agg(F.count("*").alias("n_records"))
    )


QUERIES = {
    "lineage_records": q_lineage_records,  # rows-only
    "lineage_summary": q_lineage_summary,
}

ORACLES = {
    "lineage_summary": f"""
        SELECT 'receive' AS processing_stage, 'success' AS status,
               count(*) AS n_records
        FROM events
        UNION ALL
        SELECT 'validate' AS processing_stage,
               CASE WHEN {VALID_SQL} THEN 'success' ELSE 'failure' END AS status,
               count(*) AS n_records
        FROM events
        GROUP BY 2
    """,
}


def q_corpus_merkle(spark, sf_dir):
    """Merkle integrity manifest of the document corpus
    (operators/lineage.merkle_manifest): per-source content hashes
    rolled up a fixed-fanout sha256 tree to one root — replica/epoch
    verification in O(partitions) comparisons, every hash reproducible
    in any engine."""
    from real_time_data_pipeline_spark.operators.lineage import (
        merkle_manifest,
    )

    docs = load_table(spark, sf_dir, "documents")
    return merkle_manifest(docs)


QUERIES["corpus_merkle"] = q_corpus_merkle

ORACLES["corpus_merkle"] = """
    WITH fp AS (
      SELECT source AS key,
             sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS fp
      FROM documents
    ),
    b AS (
      SELECT key, substr(fp, 1, 2) AS bkt,
             sha256(string_agg(fp, '' ORDER BY fp)) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM fp GROUP BY 1, 2
    ),
    parts AS (
      SELECT key, sha256(string_agg(h, '' ORDER BY h)) AS hash,
             CAST(SUM(n) AS BIGINT) AS n_docs
      FROM b GROUP BY 1
    ),
    root AS (
      SELECT '__all__' AS key,
             sha256(string_agg(hash, '' ORDER BY hash)) AS hash,
             CAST(SUM(n_docs) AS BIGINT) AS n_docs
      FROM parts
    )
    SELECT 'source' AS level, key, n_docs, hash FROM parts
    UNION ALL
    SELECT 'root' AS level, key, n_docs, hash FROM root
"""


def q_corpus_merkle_append(spark, sf_dir):
    """Incremental Merkle refresh
    (operators/lineage.merkle_manifest_incremental): docs with
    doc_id % 10 == 0 play the ingest increment, the rest the history
    whose leaf store is a staged artifact (first call per sf builds
    it).  Only touched buckets re-hash; the oracle is the ground-up
    full-corpus manifest — the fold-equality certificate that the
    append loses nothing."""
    import os

    from real_time_data_pipeline_spark.operators.lineage import (
        build_merkle_store,
        merkle_manifest_incremental,
    )

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    wh = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "spark-warehouse",
    )
    path = os.path.join(
        wh, f"merkle_store_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    # Staleness guard: the persisted store is keyed only by the sf_dir
    # basename, so if the documents table were ever regenerated under
    # the same path a stale store would silently drive the manifest.
    # Two checks, no content scan (the point of the incremental path is
    # NOT re-hashing history):
    #   1. source-file identity — (path, size, mtime) of every parquet
    #      part backing the live table, stamped at build time and
    #      compared on reuse (git's stat-before-hash rule).  Catches
    #      regeneration even when per-source row counts are identical,
    #      the hole the r9 count-only guard left (ADVICE r9).
    #   2. per-key leaf counts vs the live history — a safety net for
    #      frames whose file listing is unavailable.
    # Control flow is explicit (no assert: under `python -O` asserts
    # strip and an assert-based guard silently never rebuilds).
    import json

    def _file_stamp() -> list[list]:
        return sorted(
            [f, os.path.getsize(f[7:] if f.startswith("file://") else f),
             os.path.getmtime(f[7:] if f.startswith("file://") else f)]
            for f in docs.inputFiles()
        )

    stamp_path = os.path.join(path, "_source_stamp.json")
    fresh = False
    try:
        with open(stamp_path) as fh:
            fresh = json.load(fh) == _file_stamp()
        if fresh:
            stored = {
                r["key"]: r["n"]
                for r in spark.read.parquet(f"{path}/buckets")
                .groupBy("key")
                .agg(F.sum("n").alias("n"))
                .collect()
            }
            live = {
                r["source"]: r["n"]
                for r in hist.groupBy("source").agg(
                    F.count("*").alias("n")
                ).collect()
            }
            fresh = bool(stored) and stored == live
    except Exception:
        fresh = False
    if not fresh:
        build_merkle_store(hist, path)
        with open(stamp_path, "w") as fh:
            json.dump(_file_stamp(), fh)
    return merkle_manifest_incremental(spark, new, path)


QUERIES["corpus_merkle_append"] = q_corpus_merkle_append

# The certificate: incremental re-hash == ground-up full-corpus manifest.
ORACLES["corpus_merkle_append"] = ORACLES["corpus_merkle"]
