"""Benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_query_wall", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a ``noop``-format write so every
column is materialized (a bare ``count()`` would let Spark prune the plan
and under-report).  One warmup of the flagship query amortizes JVM/codegen
startup out of the per-query numbers, and a trivial mapInPandas warms the
Python worker pool (32 workers importing pandas/pyarrow ≈ 7 s, a one-time
session cost that would otherwise be attributed to whichever Arrow-UDF
query happens to run first).

Usage: python bench.py [query ...]   (subset by name; default = all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from real_time_data_pipeline_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warmup: spin up executors / codegen paths / the Python worker pool.
    _force(qs["windowed_agg"](spark, sf_dir))
    _force(
        spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long")
    )

    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            _force(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # lose the other 100 timings (the r2 bench artifact was lost
            # to exactly this all-or-nothing failure mode).
            failed[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"# {name}: FAILED {failed[name]}", file=sys.stderr)
            spark.catalog.clearCache()
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        # Operators may persist() intermediates that live as long as their
        # plan; drop them (untimed) so queries are measured independently
        # instead of under the accumulated storage pressure of every
        # earlier query's cache.
        spark.catalog.clearCache()
        # clearCache does NOT release broadcast blocks — ContextCleaner
        # frees those only after a driver GC finds the references dead.
        # 77 queries' worth of retained broadcasts measurably poisons the
        # suite tail (2-5x inflation vs isolated runs), so GC explicitly
        # (untimed) to model per-query isolation.
        spark.sparkContext._jvm.System.gc()

    payload = {
        "metric": "total_query_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failed:
        payload["failed"] = failed
    # The driver captures a finite output tail and BENCH_r02 lost its
    # closing bytes mid-JSON ("parsed": null).  Defenses: (a) compact
    # separators keep the line as small as possible, (b) the JSON is the
    # FINAL stdout line with everything else on stderr (console progress
    # is already off via spark.ui.showConsoleProgress in session.py, and
    # the Spark session is stopped BEFORE printing so no JVM shutdown
    # chatter can trail it), (c) the same payload is also written to
    # bench_out.json as a file artifact.
    spark.stop()
    line = json.dumps(payload, separators=(",", ":"))
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json"),
        "w",
    ) as f:
        f.write(line + "\n")
    sys.stdout.flush()
    print(line, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
