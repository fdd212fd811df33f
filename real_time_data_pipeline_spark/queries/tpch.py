"""TPC-H-style analytical queries over the driver testdata.

These are the bench headliners: scan→filter→join→agg plans that exercise
predicate pushdown, broadcast joins, and partial aggregation — the shapes
that dominate at 100 TB.  Q1/Q3/Q5 adapted to the testdata's column subset
(TESTDATA.md; the tables have fewer columns than real TPC-H).

Money arithmetic via functions/stable.py so the DuckDB oracle hashes
identically (see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.functions.stable import (
    avg_money_sql,
    cents_sql,
    sum_money_sql,
)
from real_time_data_pipeline_spark.schemas import load_table

# revenue item: extendedprice * (1 - discount), computed in doubles
# identically on both engines, then cents-rounded before summing.
REVENUE = "l_extendedprice * (1e0 - l_discount)"


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1: pricing summary report over lineitem.

    One scan + one partial/final hash aggregate on a low-cardinality key —
    at scale this is shuffle-light (a few output rows per map task).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(sum_money_sql("l_quantity")).alias("sum_qty"),
            F.expr(sum_money_sql("l_extendedprice")).alias("sum_base_price"),
            F.expr(sum_money_sql(REVENUE)).alias("sum_disc_price"),
            F.expr(avg_money_sql("l_quantity")).alias("avg_qty"),
            F.expr(avg_money_sql("l_extendedprice")).alias("avg_price"),
            F.expr(avg_money_sql("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3: top-10 unshipped orders by revenue.

    customer SCALES with SF, so no broadcast hint: a hint overrides
    autoBroadcastJoinThreshold and AQE cannot demote it, which OOMs at
    large SF.  Unhinted, the threshold/AQE picks BroadcastHashJoin at
    small SF (verified via .explain) and sort-merge at 100 TB.
    orders⋈lineitem shuffles on o_orderkey.  Deterministic top-k via
    full tie-break (revenue desc, orderkey asc).
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.expr(f"SUM({cents_sql(REVENUE)}) / 1e2").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 (adapted): revenue by nation where customer and supplier
    share the nation.

    Only the genuinely bounded dims (nation: 25 rows, region: 5 rows)
    carry broadcast hints.  customer and supplier scale with SF, so
    their join strategy is left to autoBroadcastJoinThreshold/AQE —
    broadcast at small SF, sort-merge/shuffled-hash at 100 TB.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.expr(f"SUM({cents_sql(REVENUE)}) / 1e2").alias("revenue"))
    )


def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: forecast revenue change — pure filter + global agg; the
    pushdown showcase (all three predicates reach the parquet scan, two
    columns read)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(f"SUM({cents_sql('l_extendedprice * l_discount')}) / 1e2").alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def q_returned_items(spark, sf_dir):
    """TPC-H Q10 (adapted): top-20 customers by revenue lost to returns.
    lineitem filter cuts the fact side before the join; nation (25 rows)
    broadcasts by hint, customer (SF-scaling) by threshold/AQE only."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.expr(f"SUM({cents_sql(REVENUE)}) / 1e2").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (adapted): share of revenue from PROMO parts.

    Conditional aggregation over a lineitem⋈part join.  part scales
    with SF (sf10k ≈ 2B rows), so no broadcast hint — the threshold/AQE
    picks broadcast at small SF and a shuffled join at 100 TB.  The
    percent is computed from two exact integer cent-sums with floor
    division so Spark and DuckDB agree bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.expr(
                f"SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {cents_sql(REVENUE)} "
                "ELSE 0 END)"
            ).alias("_promo"),
            F.expr(f"SUM({cents_sql(REVENUE)})").alias("_total"),
        )
        .select(
            F.expr("CAST(FLOOR(1e6 * _promo / _total) AS BIGINT) / 1e4").alias(
                "promo_pct"
            ),
            F.expr("_promo / 1e2").alias("promo_revenue"),
            F.expr("_total / 1e2").alias("total_revenue"),
        )
    )


def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 (adapted): customers whose orders total > 300 quantity.

    The HAVING-filtered lineitem aggregate runs FIRST (shuffle on
    l_orderkey carries one bigint per group), cutting the fact side to a
    sliver before it joins orders; customer (SF-scaling) joins by
    threshold/AQE choice, no hint.  At 100 TB the pre-aggregation is
    the difference between shuffling 100 TB and shuffling the ~1% of
    orders that pass the threshold.
    """
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.expr(f"SUM({cents_sql('l_quantity')}) / 1e2").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) / 1e2").alias(
                "o_totalprice"
            ),
            "sum_qty",
        )
    )


def q_priority_ship_lag(spark, sf_dir):
    """TPC-H Q4 (adapted to available columns): orders per priority having
    at least one line item shipped >60 days after the order date.

    EXISTS → left-semi join.  The non-equi part of the predicate
    (l_shipdate > o_orderdate + 60d) rides on the equi-join on orderkey,
    so this stays a hash semi-join, not a nested-loop.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_order_ranking(spark, sf_dir):
    """Analytic window functions (absent from the reference; part of the
    engine's inherited surface): rank orders per customer by totalprice."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) / 1e2").alias("o_totalprice"),
        F.row_number().over(w).alias("price_rank"),
    ).filter(F.col("price_rank") <= 3)


def q_rollup_cube(spark, sf_dir):
    """Grouping-set rollup (inherited surface): order counts by
    (status, priority) with subtotals."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_set_ops(spark, sf_dir):
    """Set operations (inherited surface): customers with orders above
    400k EXCEPT those in the AUTOMOBILE segment."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    auto = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    return big.subtract(auto)


QUERIES = {
    "tpch_q1_pricing_summary": q_pricing_summary,
    "tpch_q3_shipping_priority": q_shipping_priority,
    "tpch_q5_local_supplier_volume": q_local_supplier_volume,
    "tpch_q6_forecast_revenue": q_forecast_revenue,
    "tpch_q10_returned_items": q_returned_items,
    "tpch_q14_promo_revenue": q_promo_revenue,
    "tpch_q18_large_volume_customers": q_large_volume_customers,
    "tpch_q4_priority_ship_lag": q_priority_ship_lag,
    "order_ranking": q_order_ranking,
    "rollup_counts": q_rollup_cube,
    "set_ops": q_set_ops,
}

ORACLES = {
    "tpch_q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sum_money_sql('l_quantity')} AS sum_qty,
               {sum_money_sql('l_extendedprice')} AS sum_base_price,
               {sum_money_sql(REVENUE)} AS sum_disc_price,
               {avg_money_sql('l_quantity')} AS avg_qty,
               {avg_money_sql('l_extendedprice')} AS avg_price,
               {avg_money_sql('l_discount')} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q3_shipping_priority": f"""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               SUM({cents_sql(REVENUE)}) / 1e2 AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "tpch_q5_local_supplier_volume": f"""
        SELECT n_name AS nation,
               SUM({cents_sql(REVENUE)}) / 1e2 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name
    """,
    "tpch_q14_promo_revenue": f"""
        SELECT CAST(FLOOR(1e6 * _promo / _total) AS BIGINT) / 1e4 AS promo_pct,
               _promo / 1e2 AS promo_revenue,
               _total / 1e2 AS total_revenue
        FROM (
          SELECT SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {cents_sql(REVENUE)}
                          ELSE 0 END) AS _promo,
                 SUM({cents_sql(REVENUE)}) AS _total
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
        )
    """,
    "tpch_q18_large_volume_customers": f"""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) / 1e2 AS o_totalprice,
               sum_qty
        FROM (
          SELECT l_orderkey, SUM({cents_sql('l_quantity')}) / 1e2 AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM({cents_sql('l_quantity')}) / 1e2 > 300
        ) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "tpch_q4_priority_ship_lag": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    "tpch_q6_forecast_revenue": f"""
        SELECT SUM({cents_sql('l_extendedprice * l_discount')}) / 1e2 AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate < TIMESTAMP '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "tpch_q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name AS nation,
               SUM({cents_sql(REVENUE)}) / 1e2 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "order_ranking": """
        SELECT o_orderkey, o_custkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) / 1e2 AS o_totalprice,
               price_rank
        FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank
          FROM orders
        ) WHERE price_rank <= 3
    """,
    "rollup_counts": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "set_ops": """
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
}
