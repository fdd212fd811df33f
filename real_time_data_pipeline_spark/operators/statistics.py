"""Round-6 statistics tier: market-basket affinity, robust (winsorized)
moments, diversity indices, Pareto frontiers, and interval union —
operator classes the earlier tiers don't cover, each designed so a
DuckDB oracle can recompute it value-for-value (integer arithmetic in
every emitted column; floats never cross an engine boundary).

Scale discipline (the repo-wide rules):
* pair generation only inside a basket equi-join (fanout bounded by
  basket size, never all-pairs);
* corpus-wide totals as 1-row aggregates broadcast back (the
  BNL-against-bounded-build shape tests/test_plan_guard.py certifies);
* rank-selection via the two-phase range-partition recipe
  (queries/analytics_ext.q_gap_sla_quantiles) — no single-partition
  window ever sees a corpus-scale frame;
* sweeps (skyline) run on a value-domain-reduced frame, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def co_occurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pairs: int = 2,
) -> DataFrame:
    """Market-basket co-occurrence with support / confidence / lift in
    integer basis points — the association-rule primitive behind
    "frequently bought together" and feature-affinity audits.

    Shape: distinct (basket, item) pairs self-join ON THE BASKET KEY
    (one shuffle, co-partitioned; per-basket fanout is C(|basket|, 2),
    bounded by basket size — never an item-item cross product), pair and
    item counts are hash aggregates with map-side combine, and the
    basket total is a 1-row aggregate broadcast back.  ``min_pairs``
    makes the output a deterministic SET (a top-k cut would tie-break
    arbitrarily at the boundary).

    All ratios are exact integer division (``div``), so the emitted
    numbers are engine-reproducible.  Bigint headroom: the lift
    numerator is 1e4 * n_ab * n_baskets — fine through ~1e14 baskets x
    pairs; past that, reassociate to (1e4 * n_ab div n_a) * n_baskets
    div n_b or move to DECIMAL(38).
    """
    from real_time_data_pipeline_spark.operators import cache

    # items feeds four consumers (both self-join sides, item counts,
    # basket total) — persist the one distinct-shuffled frame instead of
    # re-aggregating the corpus per consumer.
    items = cache.track(df.select(basket_col, item_col).distinct())
    a = items.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("item_a")
    )
    b = items.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("item_b")
    )
    pairs = (
        a.join(b, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    item_counts = items.groupBy(item_col).agg(
        F.count("*").cast("bigint").alias("n_item")
    )
    n_baskets = items.select(basket_col).distinct().agg(
        F.count("*").cast("bigint").alias("n_baskets")
    )
    ca = item_counts.select(
        F.col(item_col).alias("item_a"), F.col("n_item").alias("n_a")
    )
    cb = item_counts.select(
        F.col(item_col).alias("item_b"), F.col("n_item").alias("n_b")
    )
    # pairs is small after the min_pairs cut — broadcast it through both
    # count joins so the (potentially corpus-scale) item-count side
    # never shuffles.
    enriched = (
        ca.join(F.broadcast(pairs), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    return enriched.select(
        "item_a",
        "item_b",
        "n_ab",
        "n_a",
        "n_b",
        F.expr("(10000 * n_ab) div n_baskets").alias("support_bp"),
        F.expr("(10000 * n_ab) div n_a").alias("conf_a_bp"),
        F.expr("(10000 * n_ab * n_baskets) div (n_a * n_b)").alias(
            "lift_bp"
        ),
    )


def distributed_ranks(df: DataFrame) -> DataFrame:
    """Two-phase fully-distributed per-group ranks (the
    gap_sla_quantiles recipe factored out): input must carry columns
    ``g`` (group), ``v`` (bigint value), ``s`` (tie-break seq); output
    adds ``r`` (1-based rank of v within g by (v, s)) and ``n`` (group
    size), plus ``pid``.  Range-repartition on (g, v, s), per-PARTITION
    row_number (each window sees one partition's slice), partition-count
    offsets folded by a broadcast triangular join — no single-partition
    window at any scale.  The repartitioned frame is persisted
    (cache.track) because it feeds both the rank window and the offset
    counts."""
    from real_time_data_pipeline_spark.operators import cache

    parted = cache.track(
        df.repartitionByRange(32, "g", "v", "s").withColumn(
            "pid", F.spark_partition_id()
        )
    )
    local = parted.withColumn(
        "j",
        F.row_number().over(Window.partitionBy("pid", "g").orderBy("v", "s")),
    )
    cnts = parted.groupBy("pid", "g").agg(F.count("*").alias("cnt"))
    lower = cnts.select(
        F.col("pid").alias("lo_pid"),
        F.col("g").alias("lo_g"),
        F.col("cnt").alias("lo_cnt"),
    )
    offsets = (
        cnts.join(
            F.broadcast(lower),
            (F.col("lo_g") == F.col("g")) & (F.col("lo_pid") < F.col("pid")),
            "left",
        )
        .groupBy("pid", "g")
        .agg(F.coalesce(F.sum("lo_cnt"), F.lit(0)).alias("offset"))
    )
    totals = cnts.groupBy("g").agg(F.sum("cnt").cast("bigint").alias("n"))
    return (
        local.join(F.broadcast(offsets), ["pid", "g"])
        .withColumn("r", F.col("offset") + F.col("j"))
        .join(F.broadcast(totals), "g")
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    seq_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorized mean — robust central tendency with the
    tails clamped to EXACT discrete percentiles (value at rank
    ceil(q*n/100); pure-integer rank targets, so any q is cross-engine
    exact — the gap_sla_quantiles argument applied to moments).

    Ranks come from :func:`distributed_ranks`; the two boundary values
    per group then broadcast back onto the raw rows for the clamp + one
    hash aggregate.

    Output: (group, n, p_lo_c, p_hi_c, win_mean_c, win_sum_c) — all
    bigint.
    """
    src = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("v"),
        F.col(seq_col).alias("s"),
    )
    ranked = distributed_ranks(src)
    # distributed_ranks persisted the repartitioned source; reuse it for
    # the clamp pass instead of re-shuffling the raw frame.
    parted = ranked.select("g", "v")
    lo_expr = f"(n * {lo_pct} + 99) div 100"
    hi_expr = f"(n * {hi_pct} + 99) div 100"
    bounds = (
        ranked.filter(
            (F.col("r") == F.expr(lo_expr)) | (F.col("r") == F.expr(hi_expr))
        )
        .groupBy("g", "n")
        .agg(
            F.max(
                F.when(F.col("r") == F.expr(lo_expr), F.col("v"))
            ).alias("p_lo_c"),
            F.max(
                F.when(F.col("r") == F.expr(hi_expr), F.col("v"))
            ).alias("p_hi_c"),
        )
    )
    clamped = parted.join(F.broadcast(bounds), "g").select(
        "g",
        "n",
        "p_lo_c",
        "p_hi_c",
        F.greatest(F.col("p_lo_c"), F.least(F.col("p_hi_c"), F.col("v"))).alias(
            "w"
        ),
    )
    return (
        clamped.groupBy("g", "n", "p_lo_c", "p_hi_c")
        .agg(F.sum("w").cast("bigint").alias("win_sum_c"))
        .select(
            F.col("g").alias(group_col),
            "n",
            "p_lo_c",
            "p_hi_c",
            F.expr("win_sum_c div n").alias("win_mean_c"),
            "win_sum_c",
        )
    )


def gini_simpson(
    df: DataFrame,
    group_col: str,
    item_col: str,
) -> DataFrame:
    """Gini-Simpson diversity index per group in integer basis points:
    1 - sum_i (n_i/n)^2, emitted as ((n^2 - sum n_i^2) * 1e4) div n^2 —
    a RATIONAL quantity, so unlike Shannon entropy (whose log makes the
    last ulp libm-dependent) it is integer-exact on every engine.  The
    mix-concentration monitor for "is this user/source dominated by one
    event type".

    Two hash aggregates with map-side combine; no window, no shuffle
    beyond the group keys.  Bigint headroom: n^2 * 1e4 overflows past
    n ~ 9.6e5 per group — at that point emit ((n^2 - ss) div (n^2 div
    1e4)) instead; at this repo's grain (events per user) n is orders
    of magnitude below.
    """
    counts = df.groupBy(group_col, item_col).agg(
        F.count("*").cast("bigint").alias("n_i")
    )
    return (
        counts.groupBy(group_col)
        .agg(
            F.sum("n_i").cast("bigint").alias("n"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.sum(F.col("n_i") * F.col("n_i")).cast("bigint").alias("ss"),
        )
        .select(
            group_col,
            "n",
            "n_distinct",
            F.expr("((n * n - ss) * 10000) div (n * n)").alias(
                "diversity_bp"
            ),
        )
    )


def skyline_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D Pareto frontier: rows not dominated by any other row, where
    LOWER x is better and HIGHER y is better (a row dominates another if
    it is <= in x AND >= in y with at least one strict).  Ties on both
    axes all survive (no strict dominance between them).

    The sort-sweep identity makes this distributed-cheap: reduce to the
    per-x maximum of y (one hash aggregate — the sweep frame is then
    |distinct x|, bounded by the VALUE DOMAIN, not the row count; bucket
    a continuous x first), run a strict-prefix running max over x
    ascending on that reduced frame (single-partition window is safe
    exactly because the frame is domain-bounded), keep x-values whose
    max beats every earlier one, and join back to recover all tied
    frontier rows.
    """
    per_x = df.groupBy(x_col).agg(F.max(y_col).alias("_ymax"))
    w = Window.orderBy(x_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_x = (
        per_x.withColumn("_prev", F.max("_ymax").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_ymax") > F.col("_prev")))
        .select(x_col, "_ymax")
    )
    return (
        df.join(F.broadcast(frontier_x), x_col)
        .filter(F.col(y_col) == F.col("_ymax"))
        .select(id_col, x_col, y_col)
    )


def median_mad(
    df: DataFrame,
    group_col: str,
    value_col: str,
    seq_col: str,
) -> DataFrame:
    """Per-group robust center + spread: discrete lower median (value at
    rank ceil(n/2) — integer rank, any engine) and the MAD (median
    absolute deviation: the same discrete median of |v - median|) — the
    outlier-resistant (center, scale) pair that mean/stddev mis-state on
    heavy-tailed data, completing the robust-stats family next to
    :func:`winsorized_stats`.

    Two :func:`distributed_ranks` passes (medians, then deviation
    medians); the per-group medians broadcast back between them — no
    single-partition window, no float anywhere.

    Output: (group, n, median_c, mad_c) — all bigint.
    """
    src = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("v"),
        F.col(seq_col).alias("s"),
    )
    ranked = distributed_ranks(src)
    med = (
        ranked.filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select("g", F.col("n").alias("n_rows"), F.col("v").alias("median_c"))
    )
    dev = ranked.select("g", "v", "s").join(F.broadcast(med), "g").select(
        "g",
        F.abs(F.col("v") - F.col("median_c")).alias("v"),
        "s",
        "n_rows",
        "median_c",
    )
    dev_ranked = distributed_ranks(dev.select("g", "v", "s"))
    mad = dev_ranked.filter(F.col("r") == F.expr("(n + 1) div 2")).select(
        "g", F.col("v").alias("mad_c")
    )
    return (
        med.join(F.broadcast(mad), "g")
        .select(
            F.col("g").alias(group_col),
            F.col("n_rows").alias("n"),
            "median_c",
            "mad_c",
        )
    )


def prorate_largest_remainder(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total_col: str,
    seq_col: str,
) -> DataFrame:
    """Exact proration: split each group's integer ``total_col`` across
    its rows proportional to ``weight_col`` with the largest-remainder
    method — the finance/billing allocation rule where every cent must
    land somewhere and the per-group sum must equal the total EXACTLY
    (floor shares, then the leftover R cents go to the R rows with the
    largest fractional remainder, ties by ``seq_col``).

    Pure integer arithmetic: base = total*w div W, remainder key =
    total*w mod W — no float ever, so the allocation is reproducible on
    any engine.  The windows partition by the group key, so frames are
    bounded by group size (an order's lineitems, an invoice's lines) —
    never data-scale.  One shuffle on the group key; the group totals
    ride the same partitioning.

    Output: (group, seq, weight, alloc_c) with
    SUM(alloc_c) GROUP BY group == total by construction (unit-pinned).
    """
    w_tot = Window.partitionBy(group_col)
    # NB: Spark resolves column names case-insensitively by default, so
    # the weight column and its group total need distinct SPELLINGS,
    # not just distinct cases ("w" vs "W" silently collide).
    base = df.select(
        group_col,
        F.col(seq_col).alias("seq"),
        F.col(weight_col).cast("bigint").alias("wgt"),
        F.col(total_col).cast("bigint").alias("t"),
    ).withColumn("wsum", F.sum("wgt").over(w_tot))
    shared = base.select(
        group_col,
        "seq",
        "wgt",
        "t",
        F.expr("(t * wgt) div wsum").alias("base_c"),
        F.expr("(t * wgt) % wsum").alias("rem_key"),
        (
            F.col("t")
            - F.sum(F.expr("(t * wgt) div wsum")).over(w_tot)
        ).alias("R"),
    )
    rank = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.desc("rem_key"), F.asc("seq"))
    )
    return shared.withColumn("rk", rank).select(
        group_col,
        "seq",
        F.col("wgt").alias("weight_c"),
        (
            F.col("base_c")
            + F.when(F.col("rk") <= F.col("R"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_c"),
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    seq_col: str,
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total (2*cum >= W) — the
    quantity-weighted "typical price" a plain median mis-states when row
    weights differ by orders of magnitude.

    The cumulative weight comes from
    operators/aggregates.scalable_running_sum (two-phase distributed
    prefix sum — no group funnels through one task), and the boundary
    row is selected by the exact integer crossing condition
    2*cum >= W AND 2*(cum - w) < W, which holds for EXACTLY one row per
    group — no min_by / second aggregate needed.

    Output: (group, total_weight, wmedian_c) — all bigint.
    """
    from real_time_data_pipeline_spark.operators.aggregates import (
        scalable_running_sum,
    )

    src = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("v"),
        F.col(weight_col).cast("bigint").alias("wt"),
        F.col(seq_col).alias("s"),
    )
    cum = scalable_running_sum(
        src,
        group_cols=["g"],
        order_cols=["v", "s"],
        value_col="wt",
        out_col="cum",
    )
    tot = cum.groupBy("g").agg(F.max("cum").cast("bigint").alias("W"))
    return (
        cum.join(F.broadcast(tot), "g")
        .filter(
            (F.lit(2) * F.col("cum") >= F.col("W"))
            & (F.lit(2) * (F.col("cum") - F.col("wt")) < F.col("W"))
        )
        .select(
            F.col("g").alias(group_col),
            F.col("W").alias("total_weight"),
            F.col("v").alias("wmedian_c"),
        )
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    seq_col: str,
) -> DataFrame:
    """Interval union per key: merge overlapping-or-touching half-open
    [start, end) intervals into maximal spans — coverage timelines,
    validity-window flattening, downtime stitching.

    This is the RUNNING-MAX-of-end algorithm, not the lag-gap rule
    sessionization uses: with variable-length intervals an early long
    interval can envelop several later ones, and comparing each start
    only to its immediate predecessor's end would split spans the union
    actually connects.  A new span starts exactly when start > max(end)
    over ALL earlier intervals of the key (ROWS frame, (start, seq)
    total order — ties pinned for cross-engine determinism).

    One partition-by-key window + one hash aggregate; per-key data
    only, so the shuffle is the key partitioning and skew follows key
    activity (salt a pathological key upstream if one key holds a
    data-scale share).

    Output: (key, span_no, span_start, span_end, n_intervals).
    """
    w = Window.partitionBy(key_col).orderBy(start_col, seq_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.select(
        key_col,
        start_col,
        end_col,
        seq_col,
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        )
        .otherwise(0)
        .alias("_new"),
    )
    spans = flagged.withColumn(
        "span_no",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    return spans.groupBy(key_col, "span_no").agg(
        F.min(start_col).alias("span_start"),
        F.max(end_col).alias("span_end"),
        F.count("*").cast("bigint").alias("n_intervals"),
    )
