"""Oracle-backed registry entries for the EXACTLY-certified sketch
tier: the K-minimum-values distinct sketch and its mergeability
certificate (operators/aggregates.kmv_distinct / kmv_merge).

The certification posture is the ``cms_heavy_hitters`` one: the sketch
hash family is the deterministic engine-portable sha256 fold, so the
sketch CONTENTS — kth hash, estimate, signed error — are reproducible
values, and the DuckDB oracle recomputes the whole sketch rather than
checking an error envelope.  (The JVM-opaque HLL path stays next door
as ``approx_distinct`` + ``approx_distinct_envelope``.)
"""

from __future__ import annotations

from real_time_data_pipeline_spark.operators import aggregates as A
from real_time_data_pipeline_spark.queries.dedup import duck_hexfold_n
from real_time_data_pipeline_spark.schemas import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_H48 = duck_hexfold_n("CAST(user_id AS VARCHAR)", 12)
_EST_NUM = (A.KMV_K - 1) * A.KMV_SPACE


def q_kmv_distinct(spark, sf_dir):
    """Per-event-type distinct-user KMV sketch
    (operators/aggregates.kmv_distinct): k=64 smallest portable 48-bit
    hashes per type, exact-integer estimate, true count and signed
    error bp alongside — the distinct-count accuracy ledger, with the
    sketch itself under the oracle."""
    events = load_table(spark, sf_dir, "events")
    return A.kmv_distinct(events, "event_type", "user_id")


QUERIES["kmv_distinct"] = q_kmv_distinct

ORACLES["kmv_distinct"] = f"""
    WITH hx AS (
      SELECT DISTINCT event_type, {_H48} AS h FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hx
    ),
    sk AS (
      SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n_kept,
             CAST(MAX(h) AS BIGINT) AS kth_hash
      FROM ranked WHERE rn <= {A.KMV_K} GROUP BY 1
    ),
    exact AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY 1
    ),
    est AS (
      SELECT s.event_type, e.n_exact, s.n_kept, s.kth_hash,
             CAST(CASE WHEN s.n_kept < {A.KMV_K} THEN s.n_kept
                       ELSE {_EST_NUM} // s.kth_hash END AS BIGINT)
                 AS est_kmv
      FROM sk s JOIN exact e USING (event_type)
    )
    SELECT event_type, n_exact, n_kept, kth_hash, est_kmv,
           CAST((est_kmv - n_exact) * 10000 // n_exact AS BIGINT) AS err_bp
    FROM est
"""


def q_kmv_merge(spark, sf_dir):
    """KMV mergeability certificate (operators/aggregates.kmv_merge):
    the corpus-wide distinct-user sketch folded across 32 physical
    hash shards AND across the per-event-type logical sketches,
    equality pinned TRUE by the oracle — the lossless-rollup property
    that lets per-shard sketches replace history rescans at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    return A.kmv_merge(events, "event_type", "user_id")


QUERIES["kmv_merge"] = q_kmv_merge

ORACLES["kmv_merge"] = f"""
    WITH hx AS (
      SELECT DISTINCT event_type AS grp, {_H48} AS h FROM events
    ),
    direct AS (
      SELECT CAST(MAX(rn) AS BIGINT) AS n_kept_d,
             CAST(MAX(h) AS BIGINT) AS kth_direct
      FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (
          SELECT DISTINCT h FROM (
            SELECT h,
                   row_number() OVER (PARTITION BY h % 32 ORDER BY h)
                       AS rs
            FROM (SELECT DISTINCT h FROM hx)
          ) WHERE rs <= {A.KMV_K}
        )
      ) WHERE rn <= {A.KMV_K}
    ),
    merged AS (
      SELECT CAST(MAX(rn) AS BIGINT) AS n_kept_m,
             CAST(MAX(h) AS BIGINT) AS kth_merged
      FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (
          SELECT DISTINCT h FROM (
            SELECT grp, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h) AS rg
            FROM hx
          ) WHERE rg <= {A.KMV_K}
        )
      ) WHERE rn <= {A.KMV_K}
    ),
    exact AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events
    )
    SELECT CAST({A.KMV_K} AS BIGINT) AS k, n_exact, kth_direct,
           CAST(CASE WHEN n_kept_d < {A.KMV_K} THEN n_kept_d
                     ELSE {_EST_NUM} // kth_direct END AS BIGINT)
               AS est_direct,
           CAST(CASE WHEN n_kept_m < {A.KMV_K} THEN n_kept_m
                     ELSE {_EST_NUM} // kth_merged END AS BIGINT)
               AS est_merged,
           (kth_direct = kth_merged AND n_kept_d = n_kept_m)
               AS merge_equal
    FROM direct, merged, exact
"""
