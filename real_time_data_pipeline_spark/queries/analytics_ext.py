"""Round-5 extension tier: resampling bars, time-weighted means,
multidimensional cube rollups, weighted sampling, asymmetric containment
dedup, and graph triangle audits — each with a DuckDB oracle.

These extend the reference's analytics surface (the reference's rollups
stop at per-month group-aggs — src/config/spark_config.yml:62,68-69)
with the shapes a telemetry / training-data platform needs next:
OHLC downsampling and TWAP for irregular time series, CUBE for
slice-and-dice reporting, weighted corpus sampling, containment (the
asymmetric near-dup Jaccard misses), and triangle/transitivity audits
of the duplicate graph.

Conventions: integer cents via FLOOR(value*100) (bit-identical IEEE
ops on both engines), integer basis points, dates/timestamps through
the micros cast documented in queries/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators.aggregates import (
    ohlc,
    time_weighted_avg,
)
from real_time_data_pipeline_spark.operators.curation import weighted_sample
from real_time_data_pipeline_spark.operators.dedup import (
    ngram_containment_pairs,
)
from real_time_data_pipeline_spark.operators.graph import triangle_stats
from real_time_data_pipeline_spark.functions.stable import sum_money_sql
from real_time_data_pipeline_spark.schemas import load_table

# Shared cents projection: FLOOR of an IEEE multiply — exact same bits on
# both engines for any double input (unlike ROUND, which is only safe for
# 2-decimal-clean data).
_CENTS = "CAST(FLOOR(value * 100) AS BIGINT)"


def q_ohlc_bars(spark, sf_dir):
    """Daily OHLC bars per event type: the candlestick downsample of the
    irregular event-value series (operators/aggregates.ohlc — one
    min_by/max_by hash aggregate, no window sort)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            "ts",
            "event_id",
            F.expr(_CENTS).alias("value_c"),
        )
    )
    return ohlc(
        ev,
        key_cols=["event_type", "day"],
        ts_col="ts",
        seq_col="event_id",
        value_col="value_c",
    )


def q_time_weighted_avg(spark, sf_dir):
    """Per-user TWAP of the event value series: each observation held
    until the user's next event, so burst periods don't dominate the
    mean (operators/aggregates.time_weighted_avg — integer microsecond
    weights, bigint division, no float accumulation)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", F.expr(_CENTS).alias("value_c"))
    )
    return time_weighted_avg(
        ev,
        key_cols=["user_id"],
        ts_col="ts",
        seq_col="event_id",
        value_col="value_c",
    )


def q_cube_order_stats(spark, sf_dir):
    """CUBE over (status, priority): all four grouping sets — the full
    slice-and-dice rollup lattice — in ONE pass with a grouping-set id.

    Spark expands CUBE inside a single hash aggregate (the Expand node
    replicates each input row once per grouping set BEFORE the partial
    aggregate, so the shuffle still carries one row per (set, group) per
    partition — no re-scan per set, unlike a UNION ALL of 4 group-bys).
    Rolled-up dimensions are labeled 'ALL' (both columns are non-null in
    the data, so the label is unambiguous)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.expr(sum_money_sql("o_totalprice")).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.col("gid").cast("bigint").alias("gid"),
            "n_orders",
            "revenue",
        )
    )


def q_weighted_sample(spark, sf_dir):
    """100 documents drawn with probability pressure proportional to
    length (n_chars) — the deterministic exponential-clock sampler
    (operators/curation.weighted_sample): reproducible across engines,
    top-k plan, no corpus shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, id_col="doc_id", weight_col="n_chars", k=100)


def q_dedup_containment(spark, sf_dir):
    """Asymmetric containment dedup: documents ≥80% of whose 3-gram
    shingles appear in another document — the quote/excerpt/boilerplate
    duplicates symmetric Jaccard misses
    (operators/dedup.ngram_containment_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, min_shingles=3
    )


def q_triangle_count(spark, sf_dir):
    """Triangle census of the supplier co-supply graph (suppliers linked
    when lineitem ships them the same part): triangle/wedge counts and
    transitivity — clique-iness audit of a similarity/dup graph
    (operators/graph.triangle_stats, degree-oriented join)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    a = ps.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("src"))
    b = ps.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("dst"))
    edges = (
        a.join(b, "p")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return triangle_stats(edges)


QUERIES = {
    "ohlc_bars": q_ohlc_bars,
    "time_weighted_avg": q_time_weighted_avg,
    "cube_order_stats": q_cube_order_stats,
    "weighted_sample": q_weighted_sample,
    "dedup_containment": q_dedup_containment,
    "triangle_count": q_triangle_count,
}


def _duck_hexfold48(col_expr: str) -> str:
    """DuckDB twin of curation.portable_hash48 (12 hex chars of sha256
    folded via ascii arithmetic — same recipe as queries/curation.py)."""
    hv = lambda i: (  # noqa: E731
        f"(CASE WHEN ascii(substr(h, {i}, 1)) >= 97 "
        f"THEN CAST(ascii(substr(h, {i}, 1)) AS BIGINT) - 87 "
        f"ELSE CAST(ascii(substr(h, {i}, 1)) AS BIGINT) - 48 END)"
    )
    folded = hv(1)
    for i in range(2, 13):
        folded = f"({folded} * 16 + {hv(i)})"
    return f"(SELECT {folded} FROM (SELECT sha256({col_expr}) AS h))"


# DuckDB twins of the Spark-side shingle pipeline (same text as
# queries/dedup.py — one normalization spec, two engines).
_DUCK_TOKENS = (
    "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
)
_DUCK_SHINGLES = f"""
  list_distinct(list_transform(
    range(1, greatest(len({_DUCK_TOKENS}) - 2, 1) + 1),
    i -> array_to_string(({_DUCK_TOKENS})[i:i+2], ' ')))
"""

ORACLES = {
    "ohlc_bars": f"""
        WITH e AS (
          SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                 CAST(ts AS TIMESTAMP) AS ts, event_id,
                 {_CENTS} AS v
          FROM events WHERE value IS NOT NULL
        ),
        r AS (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY event_type, day
                                    ORDER BY ts, event_id) AS rn_a,
                 ROW_NUMBER() OVER (PARTITION BY event_type, day
                                    ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM e
        )
        SELECT event_type, day,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open_c,
               CAST(MAX(v) AS BIGINT) AS high_c,
               CAST(MIN(v) AS BIGINT) AS low_c,
               CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close_c
        FROM r GROUP BY 1, 2
    """,
    "time_weighted_avg": f"""
        WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                 {_CENTS} AS v
          FROM events WHERE value IS NOT NULL
        ),
        d AS (
          SELECT user_id, v,
                 epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS dt
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(SUM(dt) AS BIGINT) AS span_us,
               CAST(SUM(v * dt) // SUM(dt) AS BIGINT) AS twap_c
        FROM d WHERE dt IS NOT NULL
        GROUP BY 1
    """,
    "cube_order_stats": f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sum_money_sql("o_totalprice")} AS revenue
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "weighted_sample": f"""
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               CAST({_duck_hexfold48("CAST(doc_id AS VARCHAR)")} AS DOUBLE)
                   / CAST(n_chars AS DOUBLE) AS sample_key
        FROM documents WHERE n_chars > 0
        ORDER BY sample_key, doc_id
        LIMIT 100
    """,
    "dedup_containment": f"""
        WITH sh AS (
          SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
        ),
        sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        directed AS (
          SELECT id_a AS contained_id, id_b AS container_id,
                 n_common, sa.n AS n_contained
          FROM common JOIN sizes sa ON id_a = sa.doc_id
          UNION ALL
          SELECT id_b AS contained_id, id_a AS container_id,
                 n_common, sb.n AS n_contained
          FROM common JOIN sizes sb ON id_b = sb.doc_id
        )
        SELECT contained_id, container_id,
               CAST(n_common AS BIGINT) AS n_common,
               CAST(n_contained AS BIGINT) AS n_contained,
               CAST(FLOOR(1e4 * n_common / n_contained) AS BIGINT)
                   AS containment_bp
        FROM directed
        WHERE n_contained >= 3
          AND CAST(FLOOR(1e4 * n_common / n_contained) AS BIGINT) >= 8000
    """,
    "triangle_count": """
        WITH ps AS (
          SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        e AS (
          SELECT DISTINCT LEAST(a.s, b.s) AS a, GREATEST(a.s, b.s) AS b
          FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        ),
        deg AS (
          SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
          ) GROUP BY v
        ),
        tri AS (
          SELECT count(*) AS n FROM e e1
          JOIN e e2 ON e2.a = e1.b
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg)
                   AS n_wedges,
               (SELECT CAST(n AS BIGINT) FROM tri) AS n_triangles,
               CAST(CASE WHEN (SELECT SUM(d * (d - 1) // 2) FROM deg) > 0
                    THEN FLOOR(1e4 * 3 * (SELECT n FROM tri)
                               / (SELECT SUM(d * (d - 1) // 2) FROM deg))
                    ELSE 0 END AS BIGINT) AS transitivity_bp
    """,
}
