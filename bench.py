"""Benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE SMALL
final JSON line (guaranteed to fit the driver's stdout-tail capture):

    {"metric": "total_query_wall", "value": N, "unit": "sec", "sf": 0.1,
     "n_queries": N, "n_failed": 0, "queries": {10 slowest: sec, ...},
     "queries_file": ".../bench_out.json"}

The COMPLETE per-query map is written to ``bench_out.json`` next to this
script (the driver/judge reads it via ``queries_file``).

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
from real_time_data_pipeline_spark.operators import cache  # noqa: E402
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
    # Warm the shingle/xxhash/window/union-find codegen paths at sf0.001
    # (tiny data, same code): first-touch JIT of that pipeline is ~5 s of
    # session cost that would otherwise be billed to whichever dedup/text
    # query the registry happens to order first — r2→r3 made
    # dedup_pipeline look 2x slower purely from this ordering artifact.
    # Since round 5 the registry FRONT-loads never-checked/modified
    # queries, so the text-index and multimodal Arrow paths now run
    # within the first few suite slots instead of after 100+ queries of
    # incidental warming — without these warmups their first-touch
    # codegen/worker costs get billed to whichever of them runs first
    # (measured ~2x on keyword_search_indexed / mm_audio_segments, the
    # same ordering artifact dedup_pipeline had in r2->r3).
    for wname in ("dedup_pipeline", "keyword_search_indexed",
                  "mm_audio_segments"):
        try:
            _force(qs[wname](spark, "/root/testdata/sf0.001"))
        except Exception as e:  # noqa: BLE001 — warmup must never kill the run
            print(f"# warmup {wname} failed: {e}", file=sys.stderr)
    cache.release_all()
    spark.catalog.clearCache()

    def _cleanup() -> None:
        # Operators route persist() through operators/cache.py; release
        # their tracked frames (untimed) so queries are measured
        # independently instead of under the accumulated storage
        # pressure of every earlier query's cache.  clearCache stays as
        # a backstop for anything persisted outside the tracker.
        cache.release_all()
        spark.catalog.clearCache()
        # clearCache does NOT release broadcast blocks — ContextCleaner
        # frees those only after a driver GC finds the references dead.
        # 77 queries' worth of retained broadcasts measurably poisons the
        # suite tail (2-5x inflation vs isolated runs), so GC explicitly
        # (untimed) to model per-query isolation.
        spark.sparkContext._jvm.System.gc()

    # Variance protocol (BASELINE.md "Timing protocol"): this container's
    # wall clock swings 20-30% run-to-run on the heavy queries (7.4 vs
    # 9.3 s observed for the same dedup_pipeline binary across r4 runs),
    # so any query whose FIRST timing is >= MEDIAN_THRESHOLD seconds is
    # re-run twice more and records the MEDIAN of the three — a
    # single-shot number on those queries measures the container's mood,
    # not the plan.  Sub-threshold queries keep single-shot timings (their
    # absolute jitter is small and 170+ extra runs would triple the
    # suite wall).
    # Round 7 (ADVICE r6): the >= 1 s median-of-3 rule applies
    # UNIFORMLY to every query — r6 applied it only to the first-50
    # driver window, which measured the scored window under a
    # different, noise-suppressed rule than the rest of the suite.
    # Sub-1 s queries keep single-shot timings (their absolute jitter
    # is a few tens of ms and ~160 extra runs would buy nothing).
    # Cost: ~86 queries in the 1-5 s band gain 2 untimed-cleanup reps
    # each (~3-4 min of rep wall, not counted in any timing).
    MEDIAN_THRESHOLD = 1.0
    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
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
            _cleanup()
            continue
        first = round(time.perf_counter() - t0, 3)
        _cleanup()
        if first >= MEDIAN_THRESHOLD:
            samples = [first]
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    _force(fn(spark, sf_dir))
                    samples.append(round(time.perf_counter() - t0, 3))
                except Exception as e:  # noqa: BLE001 — keep the first
                    print(f"# {name}: rep failed {e}", file=sys.stderr)
                _cleanup()
            samples.sort()
            # statistics.median averages the middle pair on an even
            # count — if one rep failed, [a, b] must not record the MAX
            # (that would skew the flaky-heavy queries high, the exact
            # opposite of the protocol's purpose)
            import statistics

            timings[name] = round(statistics.median(samples), 3)
            reps[name] = samples
            print(
                f"# {name}: {timings[name]:.3f}s (median of {samples})",
                file=sys.stderr,
            )
        else:
            timings[name] = first
            print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    full = {
        "metric": "total_query_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if reps:
        full["median_reps"] = reps  # raw samples behind each median
    if failed:
        full["failed"] = failed
    # The driver captures only a finite stdout TAIL, and BENCH_r02/r03
    # both came back "parsed": null because the single-line JSON with a
    # 150+-entry per-query map outgrew that tail — the FRONT of the
    # object was truncated away.  Fix: the per-query map lives in the
    # bench_out.json file artifact (referenced by path), and the final
    # stdout line is a SMALL, complete JSON object (well under 2 KB no
    # matter how large the registry grows) so the driver's tail always
    # contains a parseable record.  The small line keeps the driver
    # contract's "queries" key but holds only the 10 slowest queries —
    # the ones a perf reviewer needs — plus n_queries/queries_file so
    # nothing is silently hidden.
    spark.stop()
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_out.json"
    )
    with open(out_path, "w") as f:
        f.write(json.dumps(full, separators=(",", ":")) + "\n")
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    small = {
        "metric": "total_query_wall",
        "value": full["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": len(failed),
        "queries": slowest,
        "queries_file": out_path,
    }
    sys.stdout.flush()
    print(json.dumps(small, separators=(",", ":")), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
