"""Oracle-checked query registry.

Each submodule exports ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL over the same
parquet).  Keys must match; queries without an oracle entry get a weaker
rows-only check from the driver.

Conventions (driver contract):
- every computed column aliased identically in Spark and SQL;
- money/double aggregates via functions/stable.py integer-cents SQL so
  value hashes match across engines;
- timestamps cast to microsecond TIMESTAMP on the DuckDB side (events.ts
  is nanos there, micros in Spark).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_data_pipeline_spark.queries import (
    analytics,
    analytics_ext,
    analytics_r6,
    curation,
    dedup,
    joins_ext,
    lineage_q,
    multimodal,
    reference_parity,
    selection,
    similarity,
    sketches,
    text,
    tpch,
)

_MODULES = [
    reference_parity, tpch, analytics, analytics_ext, analytics_r6,
    joins_ext, lineage_q, dedup, text, curation, similarity, multimodal,
    selection, sketches,
]


# Round-9 window (VERDICT r8 #1): (a) every oracle-backed query that
# has NEVER had an independent driver verdict — the 24 round-8
# additions (selection tier, NB, KMV, Merkle, PPJoin, search/fusion,
# change-point, attribution, IVF-PQ superset) plus ann_pq_topk (newly
# oracle-backed in r9 via the certified-shortlist re-alias) — then
# (b) the stalest green verdicts: the 17 the r8 rotation note queued
# (r01/r02 entries outside the r8 window) and the 7 stalest r03
# entries.  After this window lands green, every oracle-backed query
# in the registry has a driver verdict and nothing is older than r03
# except queries re-verified in r08.
_R9_PRIORITY = [
    # (a) never driver-checked, oracle-backed
    "dsir_weights",
    "dsir_select",
    "dsir_weights_incremental",
    "dsir_sample_gumbel",
    "stream_dsir_gate",
    "ccnet_ppl_buckets",
    "ccnet_bigram_ppl",
    "weighted_sample_aes",
    "nb_classify",
    "nb_confusion",
    "stream_nb_gate",
    "kmv_distinct",
    "kmv_merge",
    "stream_kmv_fold",
    "cms_heavy_hitters",
    "change_point",
    "attribution_u_shape",
    "corpus_merkle",
    "corpus_merkle_append",
    "dedup_prefix_filter",
    "hybrid_rrf",
    "phrase_search",
    "proximity_search",
    "ann_ivfpq_shortlist_superset",
    "ann_pq_topk",
    # (b) stalest greens: the r8 rotation note's queue
    "alerts",
    "sliding_window_agg",
    "order_ranking",
    "rollup_counts",
    "set_ops",
    "lineage_summary",
    "dedup_exact",
    "dedup_exact_lineitem",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "ann_bruteforce_topk",
    "validation_summary",
    "dq_suite_metrics",
    "pivot_daily_activity",
    "unpivot_measures",
    # new r9 oracle-backed entries take the last eight slots so nothing
    # oracle-backed leaves r9 without a driver verdict; the r10 stale
    # queue (in order): value_histogram, percentiles, scd2_user_state,
    # rollup_order_stats, timeseries_gapfill, user_activity_gaps,
    # skew_profile, order_window_ranks
    "gopher_quality",
    "unimax_allocation",
    "kmeans_clusters",
    "pca_power_top1",
    "qdigest_quantiles",
    "stream_qdigest_fold",
    "stream_gopher_gate",
    "unimax_incremental",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered for the driver's 50-query correctness window:
    _R9_PRIORITY first, then remaining oracle-backed queries, rows-only
    queries last (their stronger checks live in pytest)."""
    out: dict = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    oracles = all_oracles()
    missing = [k for k in _R9_PRIORITY if k not in out]
    if missing:
        raise ValueError(f"_R9_PRIORITY names unknown queries: {missing}")
    # A priority entry without an oracle would be SILENTLY dropped from
    # the front-load below and land outside the driver window — the
    # exact failure this ordering exists to prevent; fail loudly instead.
    no_oracle = [k for k in _R9_PRIORITY if k not in oracles]
    if no_oracle:
        raise ValueError(f"_R9_PRIORITY entries lack oracles: {no_oracle}")
    # The driver checks 50 slots and __spark_entry__ takes slot 1, so a
    # 50th priority entry would silently land OUTSIDE the window — the
    # exact failure this ordering exists to prevent; fail loudly.
    if len(_R9_PRIORITY) > 49:
        raise ValueError(
            f"_R9_PRIORITY has {len(_R9_PRIORITY)} entries; only 49 fit "
            "the driver's 50-slot window behind the flagship"
        )
    ordered = {k: out[k] for k in _R9_PRIORITY}
    ordered.update({k: v for k, v in out.items() if k in oracles})
    ordered.update({k: v for k, v in out.items() if k not in oracles})
    return ordered


def all_oracles() -> dict[str, str]:
    out: dict = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
