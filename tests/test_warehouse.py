"""Physical-layout tests: partition pruning and bucketed shuffle-free
joins — assertions are on the PLAN, not just the values, because the plan
is the feature."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from real_time_data_pipeline_spark import warehouse
from real_time_data_pipeline_spark.schemas import load_table


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_part")
    warehouse.write_partitioned(orders, out, "o_orderdate", mode="overwrite")

    read = spark.read.parquet(out).filter(
        (F.col("year") == 1995) & (F.col("month") == 3)
    )
    # plan check: the partition predicates reach the scan as
    # PartitionFilters (directory pruning, not data filtering)
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "(year" in plan and "(month" in plan
    # semantic check: filtered read equals source-side filter
    expected = orders.filter(
        (F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 3)
    ).count()
    assert read.count() == expected
    # physical check: only year=1995/month=3 directories are listed
    assert os.path.isdir(os.path.join(out, "year=1995", "month=3"))


@pytest.fixture(scope="module")
def bucket_db(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bwh LOCATION '{loc}'")
    warehouse.write_bucketed(
        load_table(spark, sf_dir, "orders"), "bwh.orders_b", "o_custkey", 8
    )
    warehouse.write_bucketed(
        load_table(spark, sf_dir, "customer"), "bwh.customer_b", "c_custkey", 8
    )
    yield "bwh"
    spark.sql("DROP DATABASE bwh CASCADE")


def test_bucketed_join_is_shuffle_free(spark, bucket_db):
    """Joining two tables bucketed 8-ways on the join key must produce a
    SortMergeJoin with NO Exchange on either side."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = warehouse.bucketed(spark, "bwh.orders_b")
        c = warehouse.bucketed(spark, "bwh.customer_b")
        joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        # values still correct vs the unbucketed join
        expected = {
            (r.c_mktsegment, r["count"])
            for r in spark.table("bwh.orders_b")
            .join(
                spark.table("bwh.customer_b"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .count()
            .collect()
        }
        got = {(r.c_mktsegment, r["count"]) for r in joined.collect()}
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_agg_skips_exchange(spark, bucket_db):
    """groupBy on the bucket key reuses the bucket distribution — no
    Exchange before the aggregate."""
    o = warehouse.bucketed(spark, "bwh.orders_b")
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    """Compaction bin-packs many tiny files down to ~one per partition,
    keeps every row, and the partition layout survives."""
    import pathlib

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_frag")
    # month-partitioned table fragmented by 40 concurrent writers
    (
        orders.repartition(40)
        .select("*", F.year("o_orderdate").alias("year"), F.month("o_orderdate").alias("month"))
        .write.partitionBy("year", "month")
        .mode("overwrite")
        .parquet(out)
    )
    n_partitions = len(list(pathlib.Path(out).glob("year=*/month=*")))
    n_before = len(list(pathlib.Path(out).rglob("*.parquet")))
    rows_before = spark.read.parquet(out).count()
    assert n_before > 10 * n_partitions  # genuinely fragmented

    warehouse.compact_partitioned(
        spark, out, target_file_bytes=64 * 1024 * 1024,
        partition_by=("year", "month"),
    )

    n_after = len(list(pathlib.Path(out).rglob("*.parquet")))
    after = spark.read.parquet(out)
    assert after.count() == rows_before
    # floor is one file per partition directory; allow a little slack
    assert n_after <= 2 * n_partitions
    # layout survives: pruned reads still work
    assert after.filter((F.col("year") == 1995) & (F.col("month") == 1)).count() > 0


def test_backfill_replaces_only_target_partitions(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_bf")
    warehouse.write_partitioned(orders, out, "o_orderdate", mode="overwrite")

    # corrupt one month: shrink 1995-03 to a single mangled row
    target = orders.filter(
        (F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 3)
    )
    bad = target.limit(1).withColumn("o_totalprice", F.lit(-1.0))
    warehouse.backfill_partitioned(spark, bad, out, "o_orderdate")
    # snapshot untouched-partition files BEFORE repair (name+mtime)
    untouched = {
        (p, os.path.getmtime(p))
        for p in glob.glob(f"{out}/year=*/month=*/day=*/*.parquet")
        if "/year=1995/month=3/" not in p
    }

    # backfill the month from source
    warehouse.backfill_partitioned(spark, target, out, "o_orderdate")

    # corrupted month fully restored
    got = (
        spark.read.parquet(out)
        .filter((F.col("year") == 1995) & (F.col("month") == 3))
        .drop("year", "month", "day")
    )
    assert got.count() == target.count()
    assert got.filter(F.col("o_totalprice") < 0).count() == 0
    # files of every other partition untouched (same paths, same mtimes)
    after = {
        (p, os.path.getmtime(p))
        for p in glob.glob(f"{out}/year=*/month=*/day=*/*.parquet")
        if "/year=1995/month=3/" not in p
    }
    assert after == untouched
    # full-table row count intact
    assert spark.read.parquet(out).count() == orders.count()


def test_range_sorted_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """write_range_sorted produces files whose [min,max] spans on the
    sort key are pairwise disjoint, so footer-stats pruning can skip
    whole files for a range predicate — verified from the parquet
    metadata itself (per-file min/max), not from Spark's plan."""
    import duckdb

    out = str(tmp_path / "li_ranges")
    li = load_table(spark, sf_dir, "lineitem")
    warehouse.write_range_sorted(li, out, ["l_shipdate"], num_files=6)

    spans = duckdb.connect().execute(
        f"""
        SELECT file_name,
               min(stats_min_value) AS lo, max(stats_max_value) AS hi
        FROM parquet_metadata('{out}/*.parquet')
        WHERE path_in_schema = 'l_shipdate'
        GROUP BY file_name ORDER BY lo
        """
    ).fetchall()
    assert len(spans) >= 2  # range exchange actually split the data
    for (_, _, prev_hi), (_, cur_lo, _) in zip(spans, spans[1:]):
        assert cur_lo >= prev_hi  # disjoint (boundary value may touch)

    # Round-trip: layout change must not lose rows.
    assert spark.read.parquet(out).count() == li.count()


def test_morton_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    got = df.select(warehouse.morton_key("a", "b", bits=4).alias("k")).collect()[0]["k"]
    # a=101 contributes bits at even positions: 1<<0, 0<<2, 1<<4 -> 0b010001
    # b=011 contributes bits at odd positions:  1<<1, 1<<3, 0<<5 -> 0b001010
    assert got == 0b011011


def test_zordered_files_prune_on_both_dims(spark, sf_dir, tmp_path):
    """write_zordered footers are selective on BOTH dimensions: for a
    point-ish predicate on either column alone, most files' [min,max]
    span excludes it — the two-dimensional skipping a single-column sort
    cannot give.  Verified from parquet metadata, not Spark's plan."""
    import duckdb

    out = str(tmp_path / "ev_zorder")
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.col("user_id").cast("bigint").alias("user_id"),
            F.dayofmonth("ts").cast("bigint").alias("day"),
        )
    )
    warehouse.write_zordered(ev, out, "user_id", "day", num_files=8)

    con = duckdb.connect()
    spans = {}
    for col in ("user_id", "day"):
        spans[col] = con.execute(
            f"""
            SELECT file_name,
                   min(CAST(stats_min_value AS BIGINT)) AS lo,
                   max(CAST(stats_max_value AS BIGINT)) AS hi
            FROM parquet_metadata('{out}/*.parquet')
            WHERE path_in_schema = '{col}'
            GROUP BY file_name
            """
        ).fetchall()
    n_files = len(spans["user_id"])
    assert n_files >= 4
    # Midpoint probe on each dimension: at least one file must be
    # skippable per dim (its span excludes the probe).  A single-column
    # sort would fail this for the non-leading column (every file spans
    # the full domain there).
    for col in ("user_id", "day"):
        lo = min(s[1] for s in spans[col])
        hi = max(s[2] for s in spans[col])
        probe = (lo + hi) // 2
        skippable = sum(1 for _, flo, fhi in spans[col] if probe < flo or probe > fhi)
        assert skippable >= 1, f"no file skippable on {col}"

    assert spark.read.parquet(out).count() == ev.count()
    assert "_zkey" not in spark.read.parquet(out).columns


def test_schema_diff_and_append_guard(spark, tmp_path):
    from pyspark.sql import functions as F

    from real_time_data_pipeline_spark.warehouse import (
        assert_append_compatible,
        schema_diff,
    )

    base = spark.createDataFrame([(1, 1.5, "x")], "id int, v float, s string")
    p = str(tmp_path / "t")
    base.write.parquet(p)

    # widened v (float->double) + new column: compatible
    wider = spark.createDataFrame(
        [(2, 2.5, "y", True)], "id int, v double, s string, flag boolean"
    )
    d = assert_append_compatible(wider, p)
    assert d["append_compatible"] and d["added"] == ["flag"]
    assert d["changed"] == {"v": ("float", "double")}

    # dropped column: breaks readers
    import pytest

    narrower = spark.createDataFrame([(3, 3.5)], "id int, v double")
    with pytest.raises(ValueError, match="removed.*'s'|break"):
        assert_append_compatible(narrower, p)

    # type NARROWING (bigint -> int) is not in the widening lattice
    assert not schema_diff(
        spark.createDataFrame([(1,)], "id bigint").schema,
        spark.createDataFrame([(1,)], "id int").schema,
    )["append_compatible"]
    # missing target: trivially compatible
    assert assert_append_compatible(base, str(tmp_path / "missing"))[
        "append_compatible"
    ]


def test_layout_advice_verdict_rule(spark):
    """Low-ndv/high-rows -> partition; high-ndv -> bucket; in-between ->
    neither; NULLs counted not crashed."""
    from real_time_data_pipeline_spark.warehouse import layout_advice

    rows = [(i, i % 2, i if i % 10 else None) for i in range(1000)]
    df = spark.createDataFrame(rows, "uid long, parity long, sparse long")
    got = {
        r["col_name"]: (r["ndv"], r["advice"], r["n_null"])
        for r in layout_advice(
            df,
            ["parity", "uid", "sparse"],
            partition_max_ndv=10,
            partition_min_rows_per_value=100,
            bucket_min_ndv=900,
        ).collect()
    }
    assert got["parity"] == (2, "partition", 0)
    assert got["uid"] == (1000, "bucket", 0)
    # sparse: 900 distinct non-null values, 100 nulls -> bucket-class ndv
    assert got["sparse"] == (900, "bucket", 100)


class TestSnapshots:
    """Manifest-pinned snapshot versions (warehouse.snapshot_*)."""

    def test_append_read_and_time_travel(self, spark, tmp_path):
        root = str(tmp_path / "snap")
        v1 = warehouse.snapshot_append(
            spark.range(0, 10).withColumn("tag", F.lit("a")), root
        )
        v2 = warehouse.snapshot_append(
            spark.range(10, 15).withColumn("tag", F.lit("b")), root
        )
        assert (v1, v2) == (1, 2)
        assert warehouse.snapshot_versions(spark, root) == [1, 2]
        assert warehouse.snapshot_read(spark, root, 1).count() == 10
        assert warehouse.snapshot_read(spark, root).count() == 15  # latest
        ids = {
            r["id"] for r in warehouse.snapshot_read(spark, root, 2).collect()
        }
        assert ids == set(range(15))

    def test_compaction_never_disturbs_pinned_readers(self, spark, tmp_path):
        root = str(tmp_path / "snap")
        warehouse.snapshot_append(
            spark.range(0, 20).repartition(8), root
        )
        before = sorted(
            r["id"] for r in warehouse.snapshot_read(spark, root, 1).collect()
        )
        v = warehouse.snapshot_compact(spark, root, target_files=1)
        assert v == 2
        # the compacted version holds the same rows in fewer files
        files_v1 = warehouse._manifest_files(spark, root, 1)
        files_v2 = warehouse._manifest_files(spark, root, 2)
        assert len(files_v2) < len(files_v1)
        assert sorted(
            r["id"] for r in warehouse.snapshot_read(spark, root, 2).collect()
        ) == before
        # the PINNED v1 read is byte-identical: same files, same rows
        assert sorted(
            r["id"] for r in warehouse.snapshot_read(spark, root, 1).collect()
        ) == before

    def test_commit_conflict_fails_loudly(self, spark, tmp_path):
        import json

        import pytest

        root = str(tmp_path / "snap")
        warehouse.snapshot_append(spark.range(5), root)
        # simulate a racing writer that already committed v2
        warehouse._write_text_atomic(
            spark,
            warehouse._manifest_path(root, 2),
            json.dumps({"version": 2, "files": []}),
        )
        with pytest.raises(IOError, match="conflict"):
            warehouse._write_text_atomic(
                spark,
                warehouse._manifest_path(root, 2),
                json.dumps({"version": 2, "files": []}),
            )

    def test_missing_version_and_empty_root_raise(self, spark, tmp_path):
        import pytest

        root = str(tmp_path / "snap")
        with pytest.raises(FileNotFoundError):
            warehouse.snapshot_read(spark, root)
        warehouse.snapshot_append(spark.range(3), root)
        with pytest.raises(ValueError, match="does not exist"):
            warehouse.snapshot_read(spark, root, 7)
