"""Preflight the driver's correctness window under driver-like
conditions: run the FIRST 50 registry queries sequentially in one
session, collecting each result, WITHOUT releasing operator caches
between queries (the driver doesn't call cache.release_all) — surfaces
cache-pressure or cross-query interference problems before the driver
does.  Reports per-query wall + rows and the cached-block high-water
mark.

Usage: python tools/window_preflight.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from real_time_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("window_preflight")
    spark.sparkContext.setLogLevel("ERROR")
    qs = list(entrymod.queries().items())[:n]
    total = 0.0
    max_cached = 0
    failed = []
    for name, fn in qs:
        t0 = time.perf_counter()
        try:
            # Full driver-side collect BY DESIGN: this replicates the
            # driver's own correctness harness (which collects every
            # result to hash it).  That is fine at the sf0.001/sf0.01
            # preflight scales this tool exists for — do NOT point it at
            # sf1+ corpora, where a full-corpus query result would
            # flood the driver; use bench.py (noop sink) for timing at
            # larger scales.
            rows = fn(spark, sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — report all, fail at end
            failed.append((name, f"{type(e).__name__}: {e}"[:160]))
            print(f"{name:35s} FAILED {failed[-1][1]}")
            continue
        dt = time.perf_counter() - t0
        total += dt
        cached = spark.sparkContext._jsc.getPersistentRDDs().size()
        max_cached = max(max_cached, cached)
        print(f"{name:35s} {dt:6.2f}s  rows={len(rows):7d}  cached={cached}")
    print(
        f"\nwindow total {total:.1f}s over {len(qs)} queries; "
        f"max cached blocks {max_cached}; {len(failed)} failures"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
