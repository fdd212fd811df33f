"""Lineage tracking (SURVEY.md §2.7).

The reference inserts one SQLAlchemy row per record per stage
(src/utils/data_lineage.py:82-157) into a 12-column `data_lineage` table
and reads it back per transaction_id ordered by processing_timestamp
(data_lineage.py:159-199).  Here lineage is derived as a DataFrame (one
row per input record) and appended to a parquet table partitioned by
processing_stage — batched, distributed writes instead of per-row inserts.

Record hashes use sha2(to_json(struct(alphabetical fields)), 256),
canonicalizing key order the way the reference's json.dumps(sort_keys=True)
does (data_lineage.py:201-217).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.functions.scalar import record_hash

PROCESS_VERSION = "1.0"  # reference data_lineage.py default


def lineage_records(
    df: DataFrame,
    stage: str,
    process_name: str,
    source_system: str = "engine",
    id_col: str = "transaction_id",
    status_col: str | None = None,
    hash_cols: list[str] | None = None,
) -> DataFrame:
    """L1: derive one lineage row per input record (12-column schema of
    reference data_lineage.py:61-76)."""
    cols = hash_cols or [c for c, t in df.dtypes if t in ("string", "double", "bigint", "int")]
    h = record_hash(cols)
    status = (
        F.when(F.col(status_col), "success").otherwise("failure")
        if status_col
        else F.lit("success")
    )
    return df.select(
        F.expr("uuid()").alias("lineage_id"),
        F.col(id_col).alias("transaction_id"),
        F.lit(source_system).alias("source_system"),
        F.current_timestamp().alias("source_timestamp"),
        F.lit(stage).alias("processing_stage"),
        F.current_timestamp().alias("processing_timestamp"),
        F.lit(process_name).alias("process_name"),
        F.lit(PROCESS_VERSION).alias("process_version"),
        h.alias("input_record_hash"),
        h.alias("output_record_hash"),
        status.alias("status"),
        F.to_json(F.struct(F.lit(stage).alias("stage"))).alias("metadata"),
    )


def transform_lineage(
    df_in: DataFrame,
    df_out: DataFrame,
    stage: str,
    process_name: str,
    id_col: str = "transaction_id",
    in_hash_cols: list[str] | None = None,
    out_hash_cols: list[str] | None = None,
    source_system: str = "engine",
) -> DataFrame:
    """L1 for a transform step: input_record_hash from the pre-transform
    row, output_record_hash from the post-transform row (the reference
    hashes both payloads per step, data_lineage.py:127-129,201-217).

    One broadcast-free equi-join on the record id; both hash columns are
    computed scan-side before the join so only (id, hash) pairs shuffle.
    """

    def hashes(df: DataFrame, cols: list[str] | None, alias: str) -> DataFrame:
        cs = cols or [
            c for c, t in df.dtypes if t in ("string", "double", "bigint", "int")
        ]
        return df.select(F.col(id_col).alias("_id"), record_hash(cs).alias(alias))

    ih = hashes(df_in, in_hash_cols, "input_record_hash")
    oh = hashes(df_out, out_hash_cols, "output_record_hash")
    joined = ih.join(oh, "_id")
    return joined.select(
        F.expr("uuid()").alias("lineage_id"),
        F.col("_id").alias("transaction_id"),
        F.lit(source_system).alias("source_system"),
        F.current_timestamp().alias("source_timestamp"),
        F.lit(stage).alias("processing_stage"),
        F.current_timestamp().alias("processing_timestamp"),
        F.lit(process_name).alias("process_name"),
        F.lit(PROCESS_VERSION).alias("process_version"),
        "input_record_hash",
        "output_record_hash",
        F.lit("success").alias("status"),
        F.to_json(F.struct(F.lit(stage).alias("stage"))).alias("metadata"),
    )


def append_lineage(records: DataFrame, path: str) -> None:
    """L1 sink: append to the lineage table, partitioned by stage so
    per-stage scans prune (reference indexes transaction_id instead,
    data_lineage.py:73-76)."""
    records.write.mode("append").partitionBy("processing_stage").parquet(path)


def get_transaction_lineage(spark, path: str, transaction_id: str) -> DataFrame:
    """L2: point lookup, time-ordered (reference data_lineage.py:159-199)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("transaction_id") == transaction_id)
        .orderBy("processing_timestamp")
    )


def track_processing_step(
    df: DataFrame, path: str, stage: str, process_name: str, **kw
) -> DataFrame:
    """L4: convenience wrapper — derive + append lineage, pass `df`
    through unchanged (mirrors reference track_processing_step,
    data_lineage.py:224-260)."""
    append_lineage(lineage_records(df, stage, process_name, **kw), path)
    return df


def merkle_manifest(
    df: DataFrame,
    part_col: str = "source",
    id_col: str = "doc_id",
    content_col: str = "text",
    fanout_hex: int = 2,
) -> DataFrame:
    """Merkle integrity manifest of a partitioned corpus — the
    verification ledger a 100 TB data-versioning story needs next to
    the row-grain lineage table: per-partition content hashes roll up
    a fixed-fanout hash tree to ONE root, so two corpus replicas (or
    two points in time — compose with snapshot_diff to find WHAT
    changed) compare in O(partitions) hash lookups, and a re-ingest
    verifies per partition without touching the rest.

    Tree: doc fingerprint = sha256(id ':' content); docs bucket by the
    first ``fanout_hex`` hex chars of their fingerprint (256 buckets at
    2 — grow with the corpus so each bucket's member list stays
    executor-sized); bucket hash = sha256 of the fingerprints
    concatenated in SORTED order (order-independent of ingest);
    partition hash = sha256 of its sorted bucket hashes; root = sha256
    of the sorted partition hashes.  Every step is sha256-of-strings —
    reproducible in any engine, so the whole manifest sits under a
    value-hash oracle.

    Output: one row per partition (level='source') + the root row
    (level='root', key='__all__'), each with its doc count.

    Scale shape: one (partition, bucket) hash aggregate over the
    corpus — the only data-scale shuffle — then partition-grain and
    1-row folds; collect_list is bucket-bounded by fanout choice."""
    fp = F.sha2(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(content_col)),
        256,
    )
    buckets = (
        df.select(
            F.col(part_col).alias("key"),
            fp.alias("fp"),
        )
        .withColumn("bkt", F.substring("fp", 1, fanout_hex))
        .groupBy("key", "bkt")
        .agg(
            F.sha2(F.array_join(F.array_sort(F.collect_list("fp")), ""), 256)
            .alias("h"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    parts = buckets.groupBy("key").agg(
        F.sha2(F.array_join(F.array_sort(F.collect_list("h")), ""), 256)
        .alias("hash"),
        F.sum("n").cast("bigint").alias("n_docs"),
    )
    root = parts.agg(
        F.sha2(F.array_join(F.array_sort(F.collect_list("hash")), ""), 256)
        .alias("hash"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
    ).select(F.lit("__all__").alias("key"), "hash", "n_docs")
    return (
        parts.select("key", "hash", "n_docs")
        .withColumn("level", F.lit("source"))
        .unionByName(root.withColumn("level", F.lit("root")))
        .select("level", "key", "n_docs", "hash")
    )


def build_merkle_store(
    df: DataFrame,
    path: str,
    part_col: str = "source",
    id_col: str = "doc_id",
    content_col: str = "text",
    fanout_hex: int = 2,
) -> None:
    """Persist the Merkle leaf store for a history corpus: the
    (key, bkt, fp) fingerprint table partitioned by key (the git-style
    object index — 64 B per doc, the state that makes re-hashing
    incremental) plus the derived (key, bkt, h, n) bucket-hash table
    under ``<path>/buckets``."""
    fp = F.sha2(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(content_col)),
        256,
    )
    fps = df.select(
        F.col(part_col).alias("key"), fp.alias("fp")
    ).withColumn("bkt", F.substring("fp", 1, fanout_hex))
    fps.write.mode("overwrite").partitionBy("key").parquet(f"{path}/fps")
    spark = df.sparkSession
    (
        spark.read.parquet(f"{path}/fps")
        .groupBy("key", "bkt")
        .agg(
            F.sha2(F.array_join(F.array_sort(F.collect_list("fp")), ""), 256)
            .alias("h"),
            F.count("*").cast("bigint").alias("n"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/buckets")
    )


def merkle_manifest_incremental(
    spark,
    new_docs: DataFrame,
    path: str,
    part_col: str = "source",
    id_col: str = "doc_id",
    content_col: str = "text",
    fanout_hex: int = 2,
) -> DataFrame:
    """Refresh the Merkle manifest after an ingest increment WITHOUT
    re-hashing the history: only buckets the increment TOUCHES recompute
    (from the persisted leaf store plus the new fingerprints — a
    touched-keys semi-join, partition-pruned on ``key``); every other
    bucket reuses its stored hash.  Output is the full manifest —
    bit-identical to a ground-up :func:`merkle_manifest` over
    history+increment, which is the fold-equality certificate the
    registry oracle pins (the dup_substr_append /
    dsir_weights_incremental posture).

    Scale: the increment pays its own hashing; history cost is the
    touched buckets' leaf lists + one bucket-table read — at a 2-hex
    fanout an increment touching t buckets re-reads ~t/256ths of each
    touched partition's leaf store, and fanout grows with the corpus."""
    new_fp = (
        new_docs.select(
            F.col(part_col).alias("key"),
            F.sha2(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col(content_col),
                ),
                256,
            ).alias("fp"),
        )
        .withColumn("bkt", F.substring("fp", 1, fanout_hex))
    )
    from real_time_data_pipeline_spark.operators import cache

    new_fp = cache.track(new_fp)
    touched = new_fp.select("key", "bkt").distinct()
    hist_fps = spark.read.parquet(f"{path}/fps").select("key", "bkt", "fp")
    touched_hist = hist_fps.join(F.broadcast(touched), ["key", "bkt"], "semi")
    recomputed = (
        touched_hist.unionByName(new_fp)
        .groupBy("key", "bkt")
        .agg(
            F.sha2(F.array_join(F.array_sort(F.collect_list("fp")), ""), 256)
            .alias("h"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    kept = spark.read.parquet(f"{path}/buckets").join(
        F.broadcast(touched), ["key", "bkt"], "left_anti"
    )
    buckets = kept.unionByName(recomputed)
    parts = buckets.groupBy("key").agg(
        F.sha2(F.array_join(F.array_sort(F.collect_list("h")), ""), 256)
        .alias("hash"),
        F.sum("n").cast("bigint").alias("n_docs"),
    )
    root = parts.agg(
        F.sha2(F.array_join(F.array_sort(F.collect_list("hash")), ""), 256)
        .alias("hash"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
    ).select(F.lit("__all__").alias("key"), "hash", "n_docs")
    return (
        parts.select("key", "hash", "n_docs")
        .withColumn("level", F.lit("source"))
        .unionByName(root.withColumn("level", F.lit("root")))
        .select("level", "key", "n_docs", "hash")
    )
