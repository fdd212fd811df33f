#!/usr/bin/env python3
"""Pipeline entry point — the engine's twin of the reference's
scripts/run_pipeline.py (modes, reference run_pipeline.py:283-284).

Modes:
  generate  — write `--num` synthetic transactions as JSON-lines files
              into `--data-dir` (the file-source inbox), `--batch-size`
              rows per file (reference producer thread,
              run_pipeline.py:103-134, distributed instead of
              row-at-a-time).
  stream    — run the full streaming DAG over `--source`
              (file | rate | kafka): enriched rows to the warehouse
              parquet sink, windowed aggregates to console, dead-letter
              and alerts to side parquet sinks (reference EP1 two-sink
              DAG + the declared-only S9/S10/S11 sinks).
  batch     — run the same DAG once over the files already in
              `--data-dir` with spark.read and print summaries (the
              reference's consumer path, vectorized).

Kafka mode needs a broker (`--bootstrap-servers`); file/rate modes run
self-contained.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators import quality
from real_time_data_pipeline_spark.session import get_spark
from real_time_data_pipeline_spark.sources.generator import synthetic_transactions
from real_time_data_pipeline_spark.streaming import pipeline, sinks, sources


def cmd_generate(args) -> None:
    spark = get_spark("generate")
    txns = synthetic_transactions(spark, args.num, seed=args.seed)
    n_files = max(1, args.num // args.batch_size)
    (
        txns.select(F.to_json(F.struct(*txns.columns)).alias("value"))
        .repartition(n_files)
        .write.mode("append")
        .text(args.data_dir)
    )
    print(f"wrote {args.num} transactions to {args.data_dir} (~{n_files} files)")


def _make_source(spark, args):
    if args.source == "file":
        return sources.file_json_source(spark, args.data_dir)
    if args.source == "rate":
        return sources.rate_synthetic_source(spark, rows_per_second=args.rate)
    return sources.kafka_source(spark, args.bootstrap_servers, args.topic)


def cmd_stream(args) -> None:
    from real_time_data_pipeline_spark.streaming import monitoring

    spark = get_spark("stream")
    raw = _make_source(spark, args)
    cfg = pipeline.PipelineConfig(watermark=args.watermark)
    out = args.out_dir
    monitoring.attach_metrics_recorder(spark, f"{out}/metrics")
    queries = pipeline.start_pipeline(
        raw,
        {
            "enriched": lambda df: sinks.partitioned_parquet_sink(
                df, f"{out}/warehouse", f"{out}/ckpt/warehouse"
            ),
            "aggregates": lambda df: sinks.console_sink(
                df, output_mode="complete", trigger_seconds=args.trigger
            ),
            "dead_letter": lambda df: sinks.partitioned_parquet_sink(
                df, f"{out}/dead_letter", f"{out}/ckpt/dead_letter"
            ),
            "alerts": lambda df: sinks.partitioned_parquet_sink(
                df, f"{out}/alerts", f"{out}/ckpt/alerts"
            ),
            "validated": lambda df: quality.validation_results_sink(
                df,
                quality.TRANSACTION_SUITE,
                f"{out}/validation_results",
                f"{out}/ckpt/validation_results",
            ),
        },
        cfg,
    )
    print(f"started {len(queries)} streaming queries; Ctrl-C to stop")
    for q in queries:
        q.awaitTermination()


def cmd_batch(args) -> None:
    spark = get_spark("batch")
    raw = spark.read.text(args.data_dir).select(
        F.get_json_object("value", "$.account_id").alias("key"), "value"
    )
    dag = pipeline.build_dag(raw, pipeline.PipelineConfig(watermark=args.watermark))
    n = dag["enriched"].count()
    bad = dag["dead_letter"].count()
    alerts = dag["alerts"].count()
    artifact = quality.save_validation_results(
        dag["validated"],
        quality.TRANSACTION_SUITE,
        f"{args.out_dir}/validation_results",
        run_id="batch",
    )
    print(f"processed {n} rows: {bad} dead-lettered, {alerts} alerts")
    print(f"validation results: {artifact}")
    dag["aggregates"].orderBy(F.desc("transaction_count")).show(20, truncate=False)


def cmd_query(args) -> None:
    """Run any registry query by name against a testdata scale-factor
    directory and show the result — the ad-hoc entry point a user of
    the engine reaches for (`--name list` prints the catalog)."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from real_time_data_pipeline_spark.operators import cache
    from real_time_data_pipeline_spark.session import get_spark

    qs = entrymod.queries()
    if args.name in (None, "list"):
        oracles = entrymod.oracle_sql()
        for name in qs:
            tag = "oracle" if name in oracles else "rows-only"
            print(f"{name:32s} {tag}")
        return
    if args.name not in qs:
        raise SystemExit(f"unknown query {args.name!r} — use --name list")
    spark = get_spark("query")
    df = qs[args.name](spark, args.sf_dir)
    df.show(args.show, truncate=False)
    print(f"rows: {df.count()}")
    cache.release_all()


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["generate", "stream", "batch", "query"], required=True)
    p.add_argument("--data-dir", default="data/inbox")
    p.add_argument("--out-dir", default="data/out")
    p.add_argument("--num", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--source", choices=["file", "rate", "kafka"], default="file")
    p.add_argument("--rate", type=int, default=100)
    p.add_argument("--topic", default="banking.transactions.raw")
    p.add_argument("--bootstrap-servers", default="localhost:9092")
    p.add_argument("--watermark", default="30 minutes")
    p.add_argument("--trigger", type=int, default=10)
    p.add_argument("--name", default=None, help="query mode: registry query name, or 'list'")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="query mode: testdata dir")
    p.add_argument("--show", type=int, default=20, help="query mode: rows to display")
    args = p.parse_args()
    {"generate": cmd_generate, "stream": cmd_stream, "batch": cmd_batch,
     "query": cmd_query}[args.mode](args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
