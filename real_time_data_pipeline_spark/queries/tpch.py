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
    round2,
    round2_sql,
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


def q_nation_volume(spark, sf_dir):
    """TPC-H Q7: shipping volume between two nations, by direction and
    ship year.

    Both nation lookups broadcast (25 rows); the nation-pair filter then
    cuts the fact rows BEFORE the groupBy shuffle.  supplier/customer
    scale with SF → no hints."""
    nation = load_table(spark, sf_dir, "nation")
    n_supp = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_supp), supplier.s_nationkey == F.col("_snk"))
        .join(F.broadcast(n_cust), customer.c_nationkey == F.col("_cnk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.expr(f"SUM({cents_sql(REVENUE)}) / 1e2").alias("revenue"))
    )


def q_market_share(spark, sf_dir):
    """TPC-H Q8: NATION_5's share of STANDARD-part revenue sold to ASIA
    customers, by order year.  Share from two exact integer cent-sums
    with floor division (bit-identical cross-engine)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_regionkey").alias("_crk")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n_cust), customer.c_nationkey == F.col("_cnk"))
        .join(F.broadcast(region), F.col("_crk") == region.r_regionkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_supp), supplier.s_nationkey == F.col("_snk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.expr(
                f"SUM(CASE WHEN supp_nation = 'NATION_5' THEN {cents_sql(REVENUE)} "
                "ELSE 0 END)"
            ).alias("_nat"),
            F.expr(f"SUM({cents_sql(REVENUE)})").alias("_tot"),
        )
        .select(
            "o_year",
            F.expr("CAST(FLOOR(1e6 * _nat / _tot) AS BIGINT) / 1e4").alias(
                "mkt_share_pct"
            ),
            F.expr("_nat / 1e2").alias("nation_revenue"),
            F.expr("_tot / 1e2").alias("total_revenue"),
        )
    )


def q_product_profit(spark, sf_dir):
    """TPC-H Q9 (adapted: no partsupp table in the testdata, so profit =
    discounted revenue): revenue from '%widget%' parts by supplier
    nation and order year."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.expr(f"SUM({cents_sql(REVENUE)}) / 1e2").alias("profit"))
    )


def q_order_counts(spark, sf_dir):
    """TPC-H Q13: distribution of orders per customer (including
    zero-order customers via left join).  Two hash aggregates; the first
    shuffles one bigint per customer, the second one per distinct count —
    the 100 TB histogram shape."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) achieving the maximum revenue in 1996Q1.
    The one-row max broadcasts back against the per-supplier aggregate —
    no second scan of the fact table."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.expr(f"SUM({cents_sql(REVENUE)}) / 1e2").alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("_max_rev"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("_max_rev"))
        .join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17: average yearly revenue lost if Brand#3 orders below
    20% of the part's average quantity were not taken.

    The correlated AVG subquery becomes a per-part aggregate joined back
    to the brand lineitems; the 0.2·avg comparison is done in pure
    integers (5·cents(qty)·cnt < Σcents(qty)) so both engines agree at
    the cut boundary."""
    bp = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    brand_li = li.join(bp, li.l_partkey == bp.p_partkey)
    stats = brand_li.groupBy("l_partkey").agg(
        F.expr(f"SUM({cents_sql('l_quantity')})").alias("_sum_q"),
        F.count("*").alias("_cnt"),
    )
    return (
        brand_li.join(stats, "l_partkey")
        .filter(F.expr(f"5 * {cents_sql('l_quantity')} * _cnt < _sum_q"))
        .agg(
            F.expr(
                f"CAST(FLOOR(SUM({cents_sql('l_extendedprice')}) / 7) AS BIGINT) / 1e2"
            ).alias("avg_yearly")
        )
    )


def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 (adapted to available columns): revenue under disjunctive
    brand/size/quantity predicates — the OR-of-ANDs shape that tests
    predicate pushdown through a join (each disjunct references both
    sides, so only the join survives; per-side prefilters are derived by
    Catalyst)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.expr(f"SUM({cents_sql(REVENUE)}) / 1e2").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 (adapted: no commit/receipt dates in the testdata; late
    = shipped >60 days after the order date): suppliers who were the
    ONLY late shipper on a multi-supplier order.

    exists/not-exists compile to one semi- and one anti-join over the
    distinct (order, supplier) pair set, which is aggregated to one row
    per pair BEFORE the joins — at 100 TB the pair set is a small
    fraction of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pairs = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).distinct()
    multi = (
        pairs.groupBy("ok").agg(F.count("*").alias("_n")).filter(F.col("_n") > 1)
        .select("ok")
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    sole_late = (
        late.join(multi, "ok", "left_semi")
        .alias("l1")
        .join(
            late.select(F.col("ok").alias("ok2"), F.col("sk").alias("sk2")),
            (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
            "left_anti",
        )
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        sole_late.groupBy("sk")
        .agg(F.count("*").alias("numwait"))
        .join(supplier, F.col("sk") == supplier.s_suppkey)
        .select("s_name", "numwait")
    )


def q_idle_customers(spark, sf_dir):
    """TPC-H Q22 (adapted: nation stands in for the phone country code,
    and "idle" means no order since 2000-01-01 — every customer in this
    testdata has SOME order, so the literal no-orders-ever predicate
    would be vacuously empty): customers with above-average positive
    balance and no recent orders, counted per nation.  The threshold
    comes from exact integer cents (cents(bal)·n > Σcents) so the cut is
    cross-engine stable; the one-row stat broadcasts, and the recency
    check is an anti-join whose right side is date-pruned at the scan."""
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    nation = load_table(spark, sf_dir, "nation")
    stats = customer.filter(F.col("c_acctbal") > 0).agg(
        F.expr(f"SUM({cents_sql('c_acctbal')})").alias("_s"),
        F.count("*").alias("_n"),
    )
    eligible = customer.crossJoin(F.broadcast(stats)).filter(
        F.expr(f"{cents_sql('c_acctbal')} * _n > _s")
    )
    idle = eligible.join(recent, eligible.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.expr(f"SUM({cents_sql('c_acctbal')}) / 1e2").alias("totacctbal"),
        )
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


def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 (adapted: the testdata has no partsupp, so lineitem is the
    part-supplier catalog and the supply cost of a (part, supplier) pair is
    the minimum observed unit price l_extendedprice / l_quantity): for each
    LARGE part of size <= 25, the EUROPE supplier(s) offering the minimum
    cost, ordered by account balance.

    The correlated MIN subquery becomes a per-part aggregate joined back on
    (partkey, cost).  The double division is the same IEEE op on both
    engines and MIN is order-independent, so the equality join is
    cross-engine exact; display rounding happens after the join.  At scale:
    lineitem collapses to (part, supplier) pairs BEFORE any join with the
    dims; part and supplier scale with SF so no broadcast hints (the
    threshold/AQE decides); nation/region are bounded dims and are hinted.
    """
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 25))
        .select("p_partkey", "p_name", "p_size")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    sup_eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.join(part_f.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(
            sup_eu.select(F.col("s_suppkey").alias("_sk")),
            li.l_suppkey == F.col("_sk"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.expr("l_extendedprice / l_quantity")).alias("_cost"))
    )
    minc = ps.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("_cost").alias("_min_cost")
    )
    return (
        ps.join(
            minc,
            (ps.l_partkey == minc._pk) & (ps._cost == minc._min_cost),
        )
        .join(sup_eu, ps.l_suppkey == sup_eu.s_suppkey)
        .join(part_f, ps.l_partkey == part_f.p_partkey)
        .select(
            round2("s_acctbal", "s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            round2("_cost", "supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name")
        )
        .limit(100)
    )


def q_important_parts(spark, sf_dir):
    """TPC-H Q11 (adapted: no partsupp, so a part's "stock value" for the
    NATION_3 supplier fleet is its lineitem revenue from those suppliers):
    parts whose value exceeds twice the mean part value.  (Real Q2 uses a
    0.0001/SF fraction precisely because a fixed fraction goes vacuous as
    the part count grows; a mean-relative cut is SF-invariant.)

    One per-part aggregate, then the one-row total broadcasts back — the
    same one-row-stat shape as Q15/Q22; the significance cut is pure
    integer cents (part·n > 2·total) so both engines agree exactly at
    the boundary.  The supplier->nation filter is a semi-join against a
    bounded dim; the per-part aggregate happens before the threshold join
    so the second pass streams one row per part, not per lineitem.
    """
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    nat_sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.join(nat_sup, li.l_suppkey == nat_sup.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.expr(f"SUM({cents_sql(REVENUE)})").alias("_v"))
    )
    total = per_part.agg(
        F.expr("SUM(_v)").alias("_tot"), F.count("*").alias("_n")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.expr("_v * _n > 2 * _tot"))
        .select("partkey", F.expr("_v / 1e2").alias("value"))
        .orderBy(F.desc("value"), F.asc("partkey"))
    )


def q_ship_priority_classes(spark, sf_dir):
    """TPC-H Q12 (adapted: no l_shipmode / commit / receipt dates, so the
    grouping key is the shipping-lateness class — LATE when the item
    shipped more than 60 days after the order date): count critical-
    vs non-critical-priority orders per class for 1997 shipments.

    orders joins lineitem on the order key (one shuffle at scale, both
    sides date-pruned at the parquet scan), then one tiny conditional
    aggregate; SUM(CASE..) integer counts are CAST AS BIGINT on the
    DuckDB side (HUGEINT vs BIGINT hash lesson from round 1).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.expr(
                "CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAYS"
                " THEN 'LATE' ELSE 'ONTIME' END"
            ).alias("ship_class"),
            "o_orderpriority",
        )
        .groupBy("ship_class")
        .agg(
            F.expr(
                "SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                " THEN 1 ELSE 0 END)"
            ).alias("high_line_count"),
            F.expr(
                "SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                " THEN 0 ELSE 1 END)"
            ).alias("low_line_count"),
        )
    )


def q_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 (adapted: lineitem is the part-supplier catalog; the
    complaint blacklist is the negative-balance suppliers): distinct
    supplier count per (brand, type, size) for non-Brand#5, non-PROMO
    parts in eight target sizes.

    lineitem collapses to distinct (part, supplier) pairs first — at
    100 TB that is the dominant reduction; the blacklist anti-join keys a
    tiny table; COUNT(DISTINCT) then runs over pairs, never raw lineitem.
    """
    part_f = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 23, 36, 45)
    )
    bad_sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        pairs.join(bad_sup, pairs.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .join(part_f, pairs.l_partkey == part_f.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
    )


def q_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 (adapted: no partsupp availqty, so "has excess stock"
    becomes "dominates the part's supply" — a supplier qualifies when it
    shipped more than half of some red part's total 1996 volume).

    The nested subqueries compile to two stacked aggregates (pair
    quantities, then per-part totals as a re-aggregation of the pairs —
    lineitem is scanned once) and a final semi-join into supplier.
    Quantity comparison in integer cents: 2·pair > total is exact on both
    engines.  nation is a bounded hinted dim; part/supplier are not.
    """
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    pair_qty = (
        li.join(red, li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.expr(f"SUM({cents_sql('l_quantity')})").alias("_q"))
    )
    part_tot = pair_qty.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.expr("SUM(_q)").alias("_tot")
    )
    dominant = (
        pair_qty.join(part_tot, pair_qty.l_partkey == part_tot._pk)
        .filter(F.expr("2 * _q > _tot"))
        .select("l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supplier.join(
            dominant, supplier.s_suppkey == dominant.l_suppkey, "left_semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            round2("s_acctbal", "s_acctbal"),
        )
        .orderBy("s_suppkey")
    )


QUERIES = {
    "tpch_q1_pricing_summary": q_pricing_summary,
    "tpch_q3_shipping_priority": q_shipping_priority,
    "tpch_q5_local_supplier_volume": q_local_supplier_volume,
    "tpch_q6_forecast_revenue": q_forecast_revenue,
    "tpch_q10_returned_items": q_returned_items,
    "tpch_q14_promo_revenue": q_promo_revenue,
    "tpch_q18_large_volume_customers": q_large_volume_customers,
    "tpch_q4_priority_ship_lag": q_priority_ship_lag,
    "tpch_q7_nation_volume": q_nation_volume,
    "tpch_q8_market_share": q_market_share,
    "tpch_q9_product_profit": q_product_profit,
    "tpch_q13_order_counts": q_order_counts,
    "tpch_q15_top_supplier": q_top_supplier,
    "tpch_q17_small_qty_revenue": q_small_qty_revenue,
    "tpch_q19_disjunctive_revenue": q_disjunctive_revenue,
    "tpch_q21_waiting_suppliers": q_waiting_suppliers,
    "tpch_q22_idle_customers": q_idle_customers,
    "tpch_q2_min_cost_supplier": q_min_cost_supplier,
    "tpch_q11_important_parts": q_important_parts,
    "tpch_q12_ship_priority_classes": q_ship_priority_classes,
    "tpch_q16_supplier_part_counts": q_supplier_part_counts,
    "tpch_q20_dominant_suppliers": q_dominant_suppliers,
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
    "tpch_q7_nation_volume": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               SUM({cents_sql(REVENUE)}) / 1e2 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "tpch_q8_market_share": f"""
        SELECT o_year,
               CAST(FLOOR(1e6 * _nat / _tot) AS BIGINT) / 1e4 AS mkt_share_pct,
               _nat / 1e2 AS nation_revenue,
               _tot / 1e2 AS total_revenue
        FROM (
          SELECT year(o_orderdate) AS o_year,
                 SUM(CASE WHEN n1.n_name = 'NATION_5' THEN {cents_sql(REVENUE)}
                          ELSE 0 END) AS _nat,
                 SUM({cents_sql(REVENUE)}) AS _tot
          FROM lineitem
          JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          GROUP BY 1
        )
    """,
    "tpch_q9_product_profit": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               SUM({cents_sql(REVENUE)}) / 1e2 AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    """,
    "tpch_q13_order_counts": """
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "tpch_q15_top_supplier": f"""
        WITH rev AS (
          SELECT l_suppkey, SUM({cents_sql(REVENUE)}) / 1e2 AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "tpch_q17_small_qty_revenue": f"""
        WITH brand_li AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'
        ), stats AS (
          SELECT l_partkey,
                 CAST(SUM({cents_sql('l_quantity')}) AS BIGINT) AS _sum_q,
                 count(*) AS _cnt
          FROM brand_li GROUP BY l_partkey
        )
        SELECT CAST(FLOOR(CAST(SUM({cents_sql('l_extendedprice')}) AS BIGINT) / 7)
                 AS BIGINT) / 1e2 AS avg_yearly
        FROM brand_li JOIN stats USING (l_partkey)
        WHERE 5 * {cents_sql('l_quantity')} * _cnt < _sum_q
    """,
    "tpch_q19_disjunctive_revenue": f"""
        SELECT SUM({cents_sql(REVENUE)}) / 1e2 AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q21_waiting_suppliers": """
        WITH pairs AS (
          SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
        ), multi AS (
          SELECT ok FROM pairs GROUP BY ok HAVING count(*) > 1
        ), late AS (
          SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s_name, count(*) AS numwait
        FROM late l1
        JOIN multi USING (ok)
        JOIN supplier ON l1.sk = s_suppkey
        WHERE NOT EXISTS (
          SELECT 1 FROM late l2 WHERE l2.ok = l1.ok AND l2.sk <> l1.sk
        )
        GROUP BY s_name
    """,
    "tpch_q22_idle_customers": f"""
        WITH stats AS (
          SELECT CAST(SUM({cents_sql('c_acctbal')}) AS BIGINT) AS _s,
                 count(*) AS _n
          FROM customer WHERE c_acctbal > 0
        )
        SELECT n_name AS nation, count(*) AS numcust,
               SUM({cents_sql('c_acctbal')}) / 1e2 AS totacctbal
        FROM customer CROSS JOIN stats
        JOIN nation ON c_nationkey = n_nationkey
        WHERE {cents_sql('c_acctbal')} * _n > _s
          AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY n_name
    """,
    "tpch_q2_min_cost_supplier": f"""
        WITH sup_eu AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        ), part_f AS (
          SELECT p_partkey, p_name
          FROM part WHERE p_type = 'LARGE' AND p_size <= 25
        ), ps AS (
          SELECT l_partkey, l_suppkey,
                 MIN(l_extendedprice / l_quantity) AS _cost
          FROM lineitem
          JOIN part_f ON l_partkey = p_partkey
          WHERE l_suppkey IN (SELECT s_suppkey FROM sup_eu)
          GROUP BY l_partkey, l_suppkey
        ), minc AS (
          SELECT l_partkey AS _pk, MIN(_cost) AS _min_cost
          FROM ps GROUP BY l_partkey
        )
        SELECT {round2_sql('s_acctbal')} AS s_acctbal, s_name,
               n_name AS nation, p_partkey, p_name,
               {round2_sql('_cost')} AS supply_cost
        FROM ps
        JOIN minc ON l_partkey = _pk AND _cost = _min_cost
        JOIN sup_eu ON l_suppkey = s_suppkey
        JOIN part_f ON l_partkey = p_partkey
        ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC
        LIMIT 100
    """,
    "tpch_q11_important_parts": f"""
        WITH per_part AS (
          SELECT l_partkey AS partkey,
                 SUM({cents_sql(REVENUE)}) AS _v
          FROM lineitem
          WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
          )
          GROUP BY l_partkey
        ), total AS (
          SELECT SUM(_v) AS _tot, count(*) AS _n FROM per_part
        )
        SELECT partkey, _v / 1e2 AS value
        FROM per_part CROSS JOIN total
        WHERE _v * _n > 2 * _tot
        ORDER BY value DESC, partkey ASC
    """,
    "tpch_q12_ship_priority_classes": """
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "tpch_q16_supplier_part_counts": """
        WITH pairs AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM pairs
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 7, 10, 14, 23, 36, 45)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
    """,
    "tpch_q20_dominant_suppliers": f"""
        WITH pair_qty AS (
          SELECT l_partkey, l_suppkey,
                 SUM({cents_sql('l_quantity')}) AS _q
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
            AND l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
            )
          GROUP BY l_partkey, l_suppkey
        ), part_tot AS (
          SELECT l_partkey AS _pk, SUM(_q) AS _tot
          FROM pair_qty GROUP BY l_partkey
        ), dominant AS (
          SELECT DISTINCT l_suppkey
          FROM pair_qty JOIN part_tot ON l_partkey = _pk
          WHERE 2 * _q > _tot
        )
        SELECT s_suppkey, s_name, n_name AS nation,
               {round2_sql('s_acctbal')} AS s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
        ORDER BY s_suppkey ASC
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
