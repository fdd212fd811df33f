"""Scale-slope probe: measure how the heavy operators grow with corpus
size, as evidence the plans hold beyond the shipped scale factors.

Builds k-times-replicated copies of `documents` under /tmp (doc ids
offset per replica; every token suffixed with a replica tag so replicas
share NO shingles — duplicate structure then scales linearly with k,
the realistic shape; naive replication would make every doc an exact
k-way duplicate and blow candidate pairs up quadratically, measuring an
artifact instead of the operator).

Usage:
    python tools/scale_probe.py [--sf-dir /root/testdata/sf0.1]
                                [--factors 1 4 10]

Prints one JSON line per (operator, factor) with rows and wall seconds;
a final line per operator reports the log-log slope between the smallest
and largest factor (1.0 = linear scaling).
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

from real_time_data_pipeline_spark.operators import curation, dedup, graph, text  # noqa: E402
from real_time_data_pipeline_spark.queries.curation import BENCH_SOURCE  # noqa: E402
from real_time_data_pipeline_spark.schemas import load_table  # noqa: E402
from real_time_data_pipeline_spark.session import get_spark  # noqa: E402


def build_scaled(spark, sf_dir: str, factor: int, out_dir: str) -> str:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    parts = []
    for i in range(factor):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                # suffix every token with the replica tag: replicas share
                # no shingles, so duplicate structure scales linearly.
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1_r{i}").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    path = f"{out_dir}/documents_x{factor}.parquet"
    scaled.repartition(32).write.mode("overwrite").parquet(path)
    return path


def timed(fn) -> tuple[float, int]:
    t0 = time.monotonic()
    n = fn()
    return time.monotonic() - t0, n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", nargs="+", type=int, default=[1, 4, 10])
    args = ap.parse_args()

    spark = get_spark()
    out_dir = tempfile.mkdtemp(prefix="scale_probe_")
    results: dict[str, dict[int, float]] = {}
    try:
        for k in args.factors:
            path = build_scaled(spark, args.sf_dir, k, out_dir)
            docs = spark.read.parquet(path)
            n = docs.count()

            def run_minhash():
                return dedup.minhash_lsh_candidates(
                    docs, "doc_id", "text", n=3, num_perm=128, bands=32,
                    verify_threshold=0.8,
                ).count()

            def run_clusters():
                pairs = dedup.minhash_lsh_candidates(
                    docs, "doc_id", "text", n=3, num_perm=128, bands=32,
                    verify_threshold=0.8,
                ).select("id_a", "id_b")
                return graph.connected_components(pairs).count()

            def run_repetition():
                return curation.repetition_stats(docs).count()

            def run_exact():
                return dedup.exact_dedup(docs.select("doc_id", "text"), ["text"], "doc_id").count()

            def run_tfidf():
                return text.tfidf_topk(docs, k=5).count()

            def run_bm25():
                # replica-suffixed vocab: probe with replica-0 terms so the
                # filtered explode keeps matching rows at every factor
                return text.bm25_topk(docs, ["dup_r0", "hash_r0", "merge_r0"], k=10).count()

            def run_surprisal():
                return text.unigram_surprisal(docs).count()

            def run_shuffle():
                return curation.shuffle_shards(docs, 8).count()

            def run_heavy_hitters():
                from real_time_data_pipeline_spark.operators.aggregates import (
                    heavy_hitters,
                )

                toks = docs.select(
                    F.explode(dedup.tokens_col("text")).alias("token")
                )
                return heavy_hitters(toks, "token", threshold_bp=50).count()

            def run_editdistance():
                return dedup.editdistance_near_pairs(docs).count()

            def run_hash_embed():
                return text.hash_embed(docs).count()

            def run_step_provenance():
                return curation.step_provenance(
                    docs.select("doc_id"), 8, 32
                ).count()

            def run_curriculum():
                return curation.curriculum_phases(docs, 2048).count()

            def run_bloom():
                # fixed-size benchmark (replica 0's bench-source docs):
                # probe cost should scale with the corpus, build is constant
                bench = docs.filter(
                    (F.col("doc_id") < n // k)
                    & (F.col("source") == BENCH_SOURCE)
                )
                return curation.decontaminate_bloom(docs, bench).count()

            for name, fn in [
                ("minhash_lsh", run_minhash),
                ("clusters_lsh", run_clusters),
                ("repetition", run_repetition),
                ("exact_dedup", run_exact),
                ("tfidf_topk", run_tfidf),
                ("bm25_topk", run_bm25),
                ("unigram_surprisal", run_surprisal),
                ("shuffle_shards", run_shuffle),
                ("heavy_hitters", run_heavy_hitters),
                ("editdistance_pairs", run_editdistance),
                ("hash_embed", run_hash_embed),
                ("bloom_decontaminate", run_bloom),
                ("step_provenance", run_step_provenance),
                ("curriculum_phases", run_curriculum),
            ]:
                from real_time_data_pipeline_spark.operators import cache
                cache.release_all()
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                wall, rows = timed(fn)
                results.setdefault(name, {})[k] = wall
                print(json.dumps({
                    "op": name, "factor": k, "docs": n,
                    "rows": rows, "wall_s": round(wall, 2),
                }), flush=True)

        import math

        for name, walls in results.items():
            ks = sorted(walls)
            lo, hi = ks[0], ks[-1]
            slope = math.log(walls[hi] / walls[lo]) / math.log(hi / lo)
            print(json.dumps({
                "op": name, "slope": round(slope, 2),
                "note": "log-log wall slope between smallest/largest factor; 1.0=linear",
            }), flush=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
