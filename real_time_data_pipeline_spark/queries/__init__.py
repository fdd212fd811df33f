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


# Round-10 window (VERDICT r9 #2): with every oracle-backed query
# green in the cumulative union, freshness is the metric — fill the 49
# slots behind the flagship with (a) the five NEW r10 oracle-backed
# entries (so nothing oracle-backed leaves r10 without a driver
# verdict), then (b) the stalest verdicts oldest-first: the single r02
# entry, all 38 r03 entries, and the first 5 of the r04 queue
# (alphabetical; dedup_span_scrub and dedup_editdistance yielded
# their slots to the late c4_quality / stream_c4_gate additions and
# rejoin the r11 queue).  After this window lands green, the
# best-verdict histogram's tail starts at r04 (25 r04 entries remain
# for the r11 window: dedup_editdistance, dedup_span_scrub, doc_quality,
# ewma_user_value, frequent_pairs, funnel_windowed, hard_negatives,
# heavy_hitters, impute_median, item_similarity, keyword_search,
# knn_label_noise, quality_model, rfm_segments, rollup_incremental,
# salted_join_skew, scd2_pit_join, session_paths, snapshot_diff,
# step_provenance, stream_enrich_join, stream_rollup_incremental,
# stream_validate, stream_windowed_agg, value_trend).
_R10_PRIORITY = [
    # (a) new r10 oracle-backed entries
    "gopher_lines",
    "qdigest_merge",
    "clean_corpus_pruned_certificate",
    "c4_quality",
    "stream_c4_gate",
    # (b) stalest greens, oldest-first (r02, then r03 alphabetical)
    "value_histogram",
    "balanced_sample",
    "cdc_snapshot",
    "chunk_windows",
    "cohort_retention",
    "concurrent_events",
    "corpus_dup_spans",
    "daily_anomalies",
    "dataset_mix",
    "dataset_shuffle",
    "dataset_split",
    "dataset_upsample",
    "decile_bins",
    "decontaminate",
    "embedding_outliers",
    "embedding_quantization",
    "event_transitions",
    "funnel_counts",
    "group_split",
    "keyword_topk",
    "mm_frame_sample",
    "order_window_ranks",
    "percentiles",
    "profile_columns",
    "range_join",
    "rolling_7d_value",
    "rollup_order_stats",
    "running_value_total",
    "scd2_user_state",
    "sequence_packing",
    "skew_profile",
    "source_overlap",
    "source_profile",
    "text_normalize",
    "text_repetition",
    "timeseries_gapfill",
    "token_zipf",
    "user_activity_gaps",
    "windowed_distinct_users",
    # r04 queue, first five
    "attribution_last_touch",
    "blocking_eval",
    "corpus_report",
    "curriculum_phases",
    "daily_last_event",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered for the driver's 50-query correctness window:
    _R10_PRIORITY first, then remaining oracle-backed queries, rows-only
    queries last (their stronger checks live in pytest)."""
    out: dict = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    oracles = all_oracles()
    missing = [k for k in _R10_PRIORITY if k not in out]
    if missing:
        raise ValueError(f"_R10_PRIORITY names unknown queries: {missing}")
    # A priority entry without an oracle would be SILENTLY dropped from
    # the front-load below and land outside the driver window — the
    # exact failure this ordering exists to prevent; fail loudly instead.
    no_oracle = [k for k in _R10_PRIORITY if k not in oracles]
    if no_oracle:
        raise ValueError(f"_R10_PRIORITY entries lack oracles: {no_oracle}")
    # The driver checks 50 slots and __spark_entry__ takes slot 1, so a
    # 50th priority entry would silently land OUTSIDE the window — the
    # exact failure this ordering exists to prevent; fail loudly.
    if len(_R10_PRIORITY) > 49:
        raise ValueError(
            f"_R10_PRIORITY has {len(_R10_PRIORITY)} entries; only 49 fit "
            "the driver's 50-slot window behind the flagship"
        )
    ordered = {k: out[k] for k in _R10_PRIORITY}
    ordered.update({k: v for k, v in out.items() if k in oracles})
    ordered.update({k: v for k, v in out.items() if k not in oracles})
    return ordered


def all_oracles() -> dict[str, str]:
    out: dict = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
