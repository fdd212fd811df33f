"""sf1 scale probe: run the heavy dedup/ANN/search registry queries
end-to-end on a 10x corpus and compare wall time against sf0.1 —
converting the "this plan survives a scale-up" argument from
plan-reading to measurement (VERDICT r4 item #4).

Builds an sf1-shaped directory (documents + embeddings, the only tables
the probed queries load) under /tmp:

* ``documents``: 10 replicas of sf0.1's table.  Replica 0 keeps the
  original text (so vocabulary-dependent queries — keyword search —
  keep their semantics); replicas 1-9 suffix every token with the
  replica tag so replicas share NO shingles and duplicate structure
  scales linearly with the corpus (naive replication would make every
  doc a 10-way exact duplicate and measure a quadratic candidate-pair
  artifact instead of the operator).
* ``embeddings``: replica 0 keeps the real vectors; replicas 1-9 get
  hash-generated uniform vectors (xxhash64(vec_id, dim) folded into
  [-0.5, 0.5]) — new mass for the bucketed/partitioned paths without
  manufacturing artificial cos>=0.95 duplicate pairs.

Each probed query is the REGISTRY entry (same code the driver checks),
run once at sf0.1 and once at the scaled dir in the same session, cache
released between runs.  Prints one JSON line per (query, sf) plus a
final ratio line per query.

Round-10 note: dedup_pipeline's QUADRATIC_OK flag is RETIRED.  Its
exact-embedding leg is still all-pairs by construction, but the
blocked-GEMM prefilter + exact verify (operators/dedup.
embedding_near_dup) turned the per-pair cost from an interpreted
Catalyst fold into one BLAS flop per (pair, dim): the 10x probe fell
from 17.8x (r9) to 1.77x, inside the linear band, so the entry is now
held to it like everything else.

Usage: python tools/sf1_probe.py [--queries q1 q2 ...] [--keep-dir D]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from real_time_data_pipeline_spark.operators import cache  # noqa: E402
from real_time_data_pipeline_spark.schemas import load_table  # noqa: E402
from real_time_data_pipeline_spark.session import get_spark  # noqa: E402

FACTOR = 10  # default; override with --factor (e.g. 100 for the
# measured-bound probes VERDICT r7 #3 asks for on vocabulary-growth
# entries)
DEFAULT_QUERIES = [
    "dedup_pipeline",
    "dedup_pipeline_lsh_pruned",
    "dedup_incremental",
    "ann_ivf_persisted",
    "keyword_search_indexed",
]
# Quadratic by design (documented exact baselines, not scale paths):
# their ratios are reported but not held to the linear band.
QUADRATIC_OK: set = set()  # r10: dedup_pipeline retired (10x probe 17.8x -> 1.77x)


def build_sf1(spark, sf_dir: str, out_dir: str, factor: int = FACTOR) -> str:
    """Write the factor-x documents+embeddings tables; returns the dir
    path."""
    dst = f"{out_dir}/sf1"
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    parts = [docs]
    for i in range(1, factor):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1_r{i}").alias(
                    "text"
                ),
                "lang",
                "source",
            ).withColumn(
                # the suffixing lengthens every token; carrying the
                # original n_chars would make quality/selectivity gates
                # behave differently at sf1 than at sf0.1 and corrupt
                # the measured scale ratio
                "n_chars",
                F.length("text").cast("long"),
            )
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    scaled.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    dim = len(emb.select("embedding").head()[0])
    eparts = [emb]
    for i in range(1, factor):
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * n_vec)).alias("vec_id"),
                F.expr(
                    f"transform(sequence(0, {dim - 1}), j -> "
                    f"cast((pmod(xxhash64(vec_id + {i * n_vec}, j), 1000)"
                    " / 1000.0 - 0.5) as float))"
                ).alias("embedding"),
                "label",
            )
        )
    escaled = eparts[0]
    for p in eparts[1:]:
        escaled = escaled.unionByName(p)
    escaled.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )
    return dst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", nargs="+", default=DEFAULT_QUERIES)
    ap.add_argument(
        "--keep-dir",
        default=None,
        help="persist the sf1 tables here instead of a throwaway tmpdir",
    )
    ap.add_argument(
        "--factor",
        type=int,
        default=FACTOR,
        help="row-scale multiplier for the probe corpus (default 10)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    spark = get_spark("sf1_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out_dir = args.keep_dir or tempfile.mkdtemp(prefix="sf1_probe_")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    def timed(fn, *a):
        cache.release_all()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        fn(*a)
        return time.monotonic() - t0

    try:
        sf1_dir = build_sf1(spark, args.sf_dir, out_dir, args.factor)
        # warm codegen/worker pools once so first-touch JIT is not billed
        # to whichever probe runs first (same rationale as bench.py);
        # best-effort — the warmup corpus may not exist off this host
        try:
            force(qs["dedup_pipeline"](spark, "/root/testdata/sf0.001"))
        except Exception as e:  # noqa: BLE001 — warmup must never kill the probe
            print(f"# warmup skipped: {e}", file=sys.stderr)
        cache.release_all()
        spark.catalog.clearCache()

        results: dict[str, dict[str, float]] = {}
        for name in args.queries:
            fn = qs[name]
            w01 = timed(lambda: force(fn(spark, args.sf_dir)))
            w1 = timed(lambda: force(fn(spark, sf1_dir)))
            results[name] = {"sf0.1": w01, "sf1": w1}
            print(
                json.dumps(
                    {
                        "query": name,
                        "sf0.1_s": round(w01, 2),
                        "scaled_s": round(w1, 2),
                        f"ratio_at_{args.factor}x_rows": round(w1 / w01, 2),
                    }
                ),
                flush=True,
            )
        for name, r in results.items():
            ratio = r["sf1"] / r["sf0.1"]
            verdict = (
                "quadratic-by-design"
                if name in QUADRATIC_OK
                else (
                    "near-linear"
                    if ratio <= 1.2 * args.factor
                    else "SUPRALINEAR"
                )
            )
            print(
                json.dumps({"query": name, "ratio": round(ratio, 2),
                            "verdict": verdict}),
                flush=True,
            )
    finally:
        if not args.keep_dir:
            shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
