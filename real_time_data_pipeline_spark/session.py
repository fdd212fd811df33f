"""SparkSession factory with scale-conscious defaults.

The reference configures Spark via YAML (reference
src/config/spark_config.yml:18-25): AQE on, AQE partition coalescing, AQE
skew-join handling, Kryo.  We keep all of those and pin the session
timezone to UTC so batch results are comparable with the DuckDB oracle.

On a real cluster ``shuffle_partitions`` should be ~2-3x total cores and
scaled with input size; AQE coalescing makes over-provisioning cheap, so we
default to a generous value and let AQE shrink it at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "real_time_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Reference spark_config.yml:21-24 — keep AQE + Kryo.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # Deterministic wall-clock timestamps for oracle parity.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas_udf / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 128MB input splits: good default for large parquet scans.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Single-JVM local mode: driver heap IS the executor heap.  A/B
        # at both 8g and 24g over the full 77-query suite showed the
        # mid-suite inflation was NOT heap size but ContextCleaner
        # starvation (see periodicGC below); with that fixed, 8g beats
        # 24g (120 s vs 137 s total — smaller heaps GC faster).  On a
        # real cluster this knob is irrelevant — executors size
        # separately.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # ContextCleaner only frees broadcast blocks / shuffle state when
        # the DRIVER heap GCs; a big heap can go minutes without one, so a
        # long multi-query session accumulates every prior query's
        # broadcasts until later queries thrash (measured: 2-5x mid-suite
        # inflation).  The default periodic GC is 30min — far past any
        # suite; 45s keeps cleanup ahead of accumulation at negligible
        # cost.  Same setting matters on real clusters for long-lived
        # multi-tenant driver sessions.
        .config("spark.cleaner.periodicGC.interval", "45s")
        # The MinHash signature aggregate carries num_perm (128) min()
        # buffer fields; the default codegen cutoff (100 fields) silently
        # dropped the whole dedup signature stage out of whole-stage
        # codegen into interpreted evaluation (measured 2.4x slower at
        # sf0.1).  256 keeps every 128-permutation aggregate inside
        # codegen while still guarding against pathological 1000-column
        # plans.  Same knob matters on a real cluster — it is plan-shape,
        # not data-scale, dependent.
        .config("spark.sql.codegen.maxFields", "256")
        .config("spark.ui.enabled", "false")
        # Keep harness stdout parseable: the console progress bar can
        # interleave with the one-line JSON contract bench.py prints.
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
