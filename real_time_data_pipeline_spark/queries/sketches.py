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

from pyspark.sql import functions as F

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
      WHERE user_id IS NOT NULL
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
      WHERE user_id IS NOT NULL
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


def q_stream_kmv_fold(spark, sf_dir):
    """Streaming twin of ``kmv_distinct`` on the SAME sketch contract:
    the event log ARRIVES AS A STREAM (staged as 8 files,
    maxFilesPerTrigger=1 → 8 real micro-batches) and each batch's
    per-type k-smallest frame (≤ |types|·k rows — the only thing
    collected) folds into the driver-held sketch by the KMV merge rule
    (k smallest of the union).  Because merge is lossless for ANY
    split of the data (the property ``kmv_merge`` certifies over
    groups, applied here over TIME slices), the drained state is
    hash-identical to the one-shot sketch — the monitoring shape at
    100 TB: per-batch sketch frames are tiny, history is never
    re-scanned, state is |types|·k·8 bytes.

    Output: (event_type, n_kept, kth_hash, est_kmv) — the
    sketch-derivable columns (the exact count is precisely what the
    stream never holds)."""
    import os

    from pyspark.sql import Window
    from real_time_data_pipeline_spark.operators.curation import (
        portable_hash48,
    )
    from real_time_data_pipeline_spark.queries.reference_parity import (
        await_streaming,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    )
    stage = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "spark-warehouse",
        f"stream_kmv_events_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    events.repartition(8).write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(stage).schema

    state: dict = {}
    w = Window.partitionBy("event_type").orderBy("h")

    def fold(batch, _i):
        sk = (
            batch.filter(F.col("user_id").isNotNull())
            .select(
                "event_type", portable_hash48(F.col("user_id")).alias("h")
            )
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= A.KMV_K)
            .select("event_type", "h")
            .collect()  # ≤ |types|·k rows
        )
        per: dict = {}
        for r in sk:
            per.setdefault(r["event_type"], []).append(r["h"])
        for g, hs in per.items():
            state[g] = sorted(set(state.get(g, [])) | set(hs))[: A.KMV_K]

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    await_streaming(q, "stream_kmv_fold")

    rows = []
    for g, hs in sorted(state.items()):
        est = (
            len(hs)
            if len(hs) < A.KMV_K
            else ((A.KMV_K - 1) * A.KMV_SPACE) // hs[-1]
        )
        rows.append((g, len(hs), hs[-1], est))
    return spark.createDataFrame(
        rows,
        "event_type string, n_kept bigint, kth_hash bigint, est_kmv bigint",
    )


QUERIES["stream_kmv_fold"] = q_stream_kmv_fold

ORACLES["stream_kmv_fold"] = f"""
    WITH hx AS (
      SELECT DISTINCT event_type, {_H48} AS h FROM events
      WHERE user_id IS NOT NULL
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
    )
    SELECT event_type, n_kept, kth_hash,
           CAST(CASE WHEN n_kept < {A.KMV_K} THEN n_kept
                     ELSE {_EST_NUM} // kth_hash END AS BIGINT) AS est_kmv
    FROM sk
"""
