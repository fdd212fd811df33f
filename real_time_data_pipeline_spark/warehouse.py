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

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.functions.scalar import partition_cols


def write_partitioned(
    df: DataFrame, path: str, ts_col: str, mode: str = "append"
) -> None:
    """Batch twin of the S9 streaming sink: parquet partitioned by
    (year, month, day) derived from `ts_col`."""
    df.select("*", *partition_cols(ts_col)).write.partitionBy(
        "year", "month", "day"
    ).mode(mode).parquet(path)


def backfill_partitioned(
    spark: SparkSession, df: DataFrame, path: str, ts_col: str
) -> None:
    """Recompute and replace ONLY the date partitions present in ``df``
    (dynamic partition overwrite) — the standard warehouse backfill:
    corrections rerun for an affected day range land atomically per
    partition, days outside the range are never touched, and rerunning
    the same backfill is idempotent (same partitions, same rows).

    At 100 TB this is how late-arriving corrections get applied without
    rewriting the table: the write only shuffles the backfilled days.
    """
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.select("*", *partition_cols(ts_col)).write.partitionBy(
            "year", "month", "day"
        ).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partitioned(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: tuple[str, ...] = ("year", "month", "day"),
) -> int:
    """Small-files compaction for a date-partitioned parquet table.

    Streaming micro-batch sinks leave one file per trigger per partition;
    at 100 TB that means millions of tiny files and scan planning that
    takes longer than the scan.  This rewrites the table with
    ``repartition(n, partition cols)`` where n is sized from the table's
    on-disk bytes / target file size, using dynamic partition overwrite so
    only rewritten partitions are replaced.  Returns the output file-group
    count.  Run it as the periodic maintenance job (per closed day at
    scale — pass a day-filtered path for that)."""
    df = spark.read.parquet(path)
    total_bytes = sum(f.stat().st_size for f in Path(path).rglob("*.parquet"))
    n = max(1, int(total_bytes / target_file_bytes) + 1)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartition(n, *[F.col(c) for c in partition_by])
            .write.partitionBy(*partition_by)
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n


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


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted parquet layout for min/max data skipping.

    `repartitionByRange` (one range-exchange via sampled bounds) gives
    files DISJOINT value ranges on sort_cols; `sortWithinPartitions`
    orders rows inside each file so parquet row-group statistics are
    tight.  A reader filtering on the leading sort column then prunes
    whole files from its min/max footers before any IO — the third
    physical-layout lever next to date partitioning (directory pruning)
    and bucketing (shuffle-free joins).  At 100 TB this is the layout
    for range-scanned fact tables (time-series replays, backfills):
    pruning effectiveness is verified per-file in
    tests/test_warehouse.py::test_range_sorted_files_have_disjoint_ranges.
    """
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_col: str,
    ts_col: str,
) -> None:
    """MERGE INTO re-expressed for plain parquet: upsert ``updates`` by
    ``key_col`` into a (year, month, day)-partitioned table, rewriting
    ONLY the partitions the updates touch.

    Plan: derive the affected partition set from the updates (an
    aggregate over the batch, not the table), read back just those
    partitions (partition-pruned scan), anti-join out the keys being
    replaced, union the new rows, and land the result via dynamic
    partition overwrite — so the rewrite cost is proportional to the
    touched days, untouched partitions keep their files byte-for-byte,
    and replaying the same batch is idempotent (same keys removed, same
    rows re-inserted).  This is the lakehouse-format MERGE contract
    (copy-on-write) built from Spark primitives; swapping in a table
    format with a transaction log changes the commit, not the dataflow.

    Assumes a row's partition is stable under update (the partition
    date derives from ``ts_col``); a row whose event date CHANGED is a
    delete+insert across partitions and must be handled by the caller.
    """
    up = updates.select("*", *partition_cols(ts_col))
    days = [
        (r["year"], r["month"], r["day"])
        for r in up.select("year", "month", "day").distinct().collect()
    ]
    if not days:
        return
    pred = None
    for y, m, d in days:
        clause = (
            (F.col("year") == y) & (F.col("month") == m) & (F.col("day") == d)
        )
        pred = clause if pred is None else (pred | clause)
    existing = spark.read.parquet(path).filter(pred)
    keys = up.select(F.col(key_col)).distinct()
    kept = existing.join(keys, key_col, "left_anti")
    merged = kept.unionByName(up)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.partitionBy("year", "month", "day").mode(
            "overwrite"
        ).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def morton_key(col_a: str, col_b: str, bits: int = 16) -> "F.Column":
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    non-negative integer columns — bit i of each input lands at output
    bits 2i / 2i+1, so sorting by the key clusters rows that are close in
    BOTH dimensions.  Pure shift/mask expression tree (codegen'd, no UDF);
    callers with wider domains should first quantile-bucket each column
    into 2^bits ranks (the standard Z-order recipe), since interleaving
    raw skewed values wastes key bits on empty space."""
    a = F.col(col_a).cast("bigint")
    b = F.col(col_b).cast("bigint")
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        bit = F.lit(1 << i).cast("bigint")
        key = (
            key.bitwiseOR(F.shiftleft(a.bitwiseAND(bit), i))  # bit i -> 2i
            .bitwiseOR(F.shiftleft(b.bitwiseAND(bit), i + 1))  # bit i -> 2i+1
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 4,
    mode: str = "overwrite",
) -> None:
    """Z-ordered parquet layout: quantile-rank both columns into 2^bits
    buckets, range-partition + sort by the Morton key of the two ranks,
    so per-file min/max footers are tight on BOTH columns simultaneously
    — a reader filtering on EITHER dimension skips most files, which
    single-column range sorting (:func:`write_range_sorted`) only
    achieves for its leading column.  This is the (Delta/Iceberg-style)
    OPTIMIZE ZORDER layout re-expressed on plain parquet.

    Ranking first is the standard recipe: interleaving RAW values lets
    the wider-domain column monopolize the key's high bits (an id
    spanning 2^20 against a day-of-month spanning 2^5 degenerates to an
    id sort).  Equal-width ranks give both dimensions equal say in every
    key prefix.  Boundaries come from one ``approxQuantile`` pass
    (driver gets 2·(2^bits−1) scalars — bounded; writers are actions
    already); the bucket rank is a pure sum-of-comparisons expression,
    monotone in the raw value, so raw-column footer spans stay
    contiguous per file.  Helper columns are dropped from the written
    schema (layout-only).

    At 100 TB: the go-to layout for fact tables filtered on two
    independent dimensions (e.g. user_id × day); pruning effectiveness
    is verified per-file from parquet footers in
    tests/test_warehouse.py."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    qa, qb = df.stat.approxQuantile([col_a, col_b], probs, 0.001)

    def rank(col: str, bounds: list[float]) -> F.Column:
        r = F.lit(0).cast("bigint")
        for bnd in sorted(set(bounds)):
            r = r + (F.col(col).cast("double") >= F.lit(bnd)).cast("bigint")
        return r

    keyed = (
        df.withColumn("_ra", rank(col_a, qa))
        .withColumn("_rb", rank(col_b, qb))
        .withColumn("_zkey", morton_key("_ra", "_rb", bits))
    )
    (
        keyed.repartitionByRange(num_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_ra", "_rb", "_zkey")
        .write.mode(mode)
        .parquet(path)
    )


# ------------------------------------------------------- data contracts

# Lossless numeric widenings an append may introduce without breaking
# readers (the Avro/Iceberg-style promotion lattice, parquet-level).
_WIDENINGS = {
    ("int", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("float", "double"),
    ("date", "timestamp"),
}


def schema_diff(old, new) -> dict:
    """Data-contract diff between two Spark schemas (StructTypes):
    ``added`` / ``removed`` columns, ``changed`` types (old→new), and
    an ``append_compatible`` verdict — True iff every existing column
    survives with the same or a losslessly widened type, so files
    written with the NEW schema can land next to OLD files without
    breaking existing readers (new nullable columns are fine: parquet
    readers project missing columns as null).

    Pure metadata (no jobs); the write-path guard is
    :func:`assert_append_compatible`.
    """
    o = {f.name: f.dataType.simpleString() for f in old.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    added = sorted(set(n) - set(o))
    removed = sorted(set(o) - set(n))
    changed = {
        c: (o[c], n[c]) for c in sorted(set(o) & set(n)) if o[c] != n[c]
    }
    incompatible_changes = {
        c: ch for c, ch in changed.items() if ch not in _WIDENINGS
    }
    return {
        "added": added,
        "removed": removed,
        "changed": changed,
        "append_compatible": not removed and not incompatible_changes,
    }


def assert_append_compatible(df: DataFrame, path: str) -> dict:
    """Write-path contract guard: diff ``df``'s schema against the
    table already at ``path`` and raise ``ValueError`` (with the diff)
    when appending would break existing readers.  Reads only parquet
    footers (schema inference), no data scan.  Returns the diff when
    compatible; a missing/empty target is trivially compatible.
    """
    spark = df.sparkSession
    try:
        existing = spark.read.parquet(path).schema
    except Exception:
        return {
            "added": [],
            "removed": [],
            "changed": {},
            "append_compatible": True,
        }
    diff = schema_diff(existing, df.schema)
    if not diff["append_compatible"]:
        raise ValueError(f"append would break readers of {path}: {diff}")
    return diff


def layout_advice(
    df: "DataFrame",
    candidate_cols: list[str],
    partition_max_ndv: int = 1000,
    partition_min_rows_per_value: int = 10_000,
    bucket_min_ndv: int = 100_000,
) -> "DataFrame":
    """Physical-layout advisor: for each candidate column, measure the
    cardinality profile and emit the partitioning verdict a warehouse
    reviewer would reach — the codified version of the §2.1 S9 design
    rule (partition on low-cardinality columns whose values carry
    enough rows to make useful files; bucket on high-cardinality join
    keys; otherwise rely on range-sort/z-order file skipping).

    Verdict rule (deterministic, documented):
      'partition'  ndv <= partition_max_ndv AND
                   rows/ndv >= partition_min_rows_per_value
      'bucket'     ndv >= bucket_min_ndv  (join-key class)
      'neither'    otherwise (use range-sort / z-order instead)

    One pass: a single aggregate computes exact ndv + null counts for
    every candidate at once (count_distinct per column — for
    unbounded-cardinality audits swap approx_count_distinct); the
    verdict is a projection.  Output one row per candidate.
    """
    aggs = [F.count("*").cast("bigint").alias("_total")]
    for i, c in enumerate(candidate_cols):
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"_ndv{i}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"_null{i}")
        )
    one = df.agg(*aggs)
    rows = []
    for i, c in enumerate(candidate_cols):
        ndv, nnull = F.col(f"_ndv{i}"), F.col(f"_null{i}")
        rpv = F.expr(f"_total div greatest(_ndv{i}, 1)")
        verdict = (
            F.when(
                (ndv <= partition_max_ndv)
                & (rpv >= partition_min_rows_per_value),
                "partition",
            )
            .when(ndv >= bucket_min_ndv, "bucket")
            .otherwise("neither")
        )
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                ndv.alias("ndv"),
                nnull.alias("n_null"),
                rpv.cast("bigint").alias("rows_per_value"),
                verdict.alias("advice"),
            )
        )
    return one.select(
        F.explode(F.array(*rows)).alias("m"), F.col("_total").alias("total_rows")
    ).select("m.*", "total_rows")


# ------------------------------------------------------------ snapshots
#
# Manifest-pinned snapshot versions (the Iceberg/Delta *pattern*,
# dependency-free): every commit writes an immutable manifest listing
# exactly the data files that version owns, and the commit itself is an
# atomic manifest rename.  What this buys at 100 TB:
#
# - **Reproducible training runs**: a run records the snapshot version
#   it read; re-reading that version later returns byte-identical input
#   even after arbitrary later appends/compactions.
# - **Safe compaction**: compaction writes NEW files and a NEW manifest;
#   pinned readers of older versions never see files disappear.
# - **Atomic multi-file commits**: readers see all of an append or none
#   of it (the manifest rename is the commit point).
#
# All file IO goes through the Hadoop FileSystem API, so the same code
# addresses local disk, HDFS, or object stores.


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return hpath.getFileSystem(conf), hpath, jvm


def _read_text(spark: SparkSession, path: str) -> str:
    fs, p, jvm = _fs(spark, path)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Write-then-rename: the rename is the atomic commit point, and a
    failed rename (destination exists) is the optimistic-concurrency
    conflict signal — of two racing commits for the same version, one
    wins and the other fails loudly instead of silently clobbering."""
    fs, p, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, p):
        fs.delete(tmp, False)
        raise IOError(
            f"snapshot commit conflict: {path} already exists "
            "(a concurrent commit won this version)"
        )


def _data_files(spark: SparkSession, directory: str) -> list[str]:
    fs, _, jvm = _fs(spark, directory)
    glob = jvm.org.apache.hadoop.fs.Path(f"{directory}/*.parquet")
    return sorted(
        s.getPath().toString() for s in fs.globStatus(glob) or []
    )


def snapshot_versions(spark: SparkSession, root: str) -> list[int]:
    """Committed snapshot versions at ``root``, ascending."""
    fs, _, jvm = _fs(spark, root)
    glob = jvm.org.apache.hadoop.fs.Path(f"{root}/_manifests/v*.json")
    out = []
    for s in fs.globStatus(glob) or []:
        name = s.getPath().getName()
        out.append(int(name[1:-5]))
    return sorted(out)


def _manifest_path(root: str, version: int) -> str:
    return f"{root}/_manifests/v{version:06d}.json"


def _manifest_files(spark: SparkSession, root: str, version: int) -> list[str]:
    import json

    m = json.loads(_read_text(spark, _manifest_path(root, version)))
    if m.get("version") != version or "files" not in m:
        raise ValueError(f"corrupt snapshot manifest v{version} at {root}")
    return m["files"]


def snapshot_append(df: DataFrame, root: str) -> int:
    """Commit ``df`` as the next snapshot version: data files land in an
    immutable per-version directory, and the new manifest lists the
    previous version's files PLUS the new ones (append semantics, no
    data rewritten).  Returns the committed version number."""
    import json

    spark = df.sparkSession
    vers = snapshot_versions(spark, root)
    new_v = (vers[-1] if vers else 0) + 1
    data_dir = f"{root}/data/v{new_v:06d}"
    df.write.mode("error").parquet(data_dir)
    new_files = _data_files(spark, data_dir)
    prev_files = _manifest_files(spark, root, vers[-1]) if vers else []
    manifest = {
        "version": new_v,
        "files": prev_files + new_files,
        "added": len(new_files),
        "parent": vers[-1] if vers else None,
    }
    _write_text_atomic(
        spark, _manifest_path(root, new_v), json.dumps(manifest)
    )
    return new_v


def snapshot_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot version (default: latest).  The read is pinned to
    the manifest's exact file list, so later appends and compactions can
    never change what a pinned reader sees."""
    vers = snapshot_versions(spark, root)
    if not vers:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    v = vers[-1] if version is None else version
    if v not in vers:
        raise ValueError(f"snapshot v{v} does not exist at {root}: {vers}")
    files = _manifest_files(spark, root, v)
    return spark.read.parquet(*files)


def snapshot_compact(
    spark: SparkSession, root: str, target_files: int = 1
) -> int:
    """Rewrite the LATEST snapshot's rows into ``target_files`` files and
    commit the result as a new version (a replacement manifest: only the
    new files).  Old versions keep their manifests and files, so pinned
    readers are untouched — the safe-compaction half of the snapshot
    contract.  Returns the new version."""
    import json

    vers = snapshot_versions(spark, root)
    if not vers:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    cur = snapshot_read(spark, root, vers[-1])
    new_v = vers[-1] + 1
    data_dir = f"{root}/data/v{new_v:06d}"
    cur.coalesce(target_files).write.mode("error").parquet(data_dir)
    manifest = {
        "version": new_v,
        "files": _data_files(spark, data_dir),
        "compacted_from": vers[-1],
        "parent": vers[-1],
    }
    _write_text_atomic(
        spark, _manifest_path(root, new_v), json.dumps(manifest)
    )
    return new_v
