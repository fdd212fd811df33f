"""Unit tests for operators/statistics.py (round-6 tier): goldens on
the edge cases the oracle SFs can't be counted on to hit."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators.statistics import (
    co_occurrence_lift,
    gini_simpson,
    merge_intervals,
    skyline_2d,
    winsorized_stats,
)


def test_co_occurrence_lift_counts_and_dedup(spark):
    # baskets: 1:{a,b,b}, 2:{a,b}, 3:{a,c}, 4:{b,c} — duplicate b in
    # basket 1 must count once (distinct pass)
    rows = [
        (1, "a"), (1, "b"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in co_occurrence_lift(df, "basket", "item", min_pairs=2).collect()
    }
    # only (a,b) co-occurs twice; (a,c) and (b,c) once -> filtered
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert r["n_ab"] == 2 and r["n_a"] == 3 and r["n_b"] == 3
    # N=4 baskets: support = 10000*2//4 = 5000; conf = 10000*2//3 = 6666;
    # lift = 10000*2*4//(3*3) = 8888
    assert (r["support_bp"], r["conf_a_bp"], r["lift_bp"]) == (5000, 6666, 8888)


def test_winsorized_stats_clamps_exact_ranks(spark):
    # group g: values 1..20 -> n=20, p05 rank ceil(1)=1 -> 1,
    # p95 rank ceil(19)=19 -> 19; clamped sum = 19 + sum(2..18)... wait:
    # clamp(v) = max(1, min(19, v)): 1..19 stay, 20 -> 19.
    rows = [("g", v, v) for v in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, v long, s long")
    out = winsorized_stats(df, "g", "v", "s").collect()
    assert len(out) == 1
    r = out[0]
    expect_sum = sum(max(1, min(19, v)) for v in range(1, 21))
    assert (r["n"], r["p_lo_c"], r["p_hi_c"]) == (20, 1, 19)
    assert r["win_sum_c"] == expect_sum
    assert r["win_mean_c"] == expect_sum // 20


def test_gini_simpson_degenerate_and_uniform(spark):
    rows = [("u1", "x"), ("u1", "x"), ("u2", "x"), ("u2", "y")]
    df = spark.createDataFrame(rows, "u string, t string")
    out = {r["u"]: r for r in gini_simpson(df, "u", "t").collect()}
    # u1: one type -> 0 diversity; u2: 2 of 2 types -> (4-2)*1e4//4 = 5000
    assert out["u1"]["diversity_bp"] == 0 and out["u1"]["n_distinct"] == 1
    assert out["u2"]["diversity_bp"] == 5000 and out["u2"]["n"] == 2


def test_skyline_2d_dominance_and_ties(spark):
    # lower x better, higher y better
    rows = [
        (1, 1, 50),   # frontier (earliest)
        (2, 2, 60),   # frontier (beats 1 on y, later x)
        (3, 2, 60),   # exact tie with 2 -> both kept
        (4, 2, 40),   # same x as 2, lower y -> dominated
        (5, 3, 55),   # enveloped by 2 (x=2<=3, y=60>=55) -> dominated
        (6, 4, 70),   # frontier
    ]
    df = spark.createDataFrame(rows, "id int, x int, y int")
    got = {r["id"] for r in skyline_2d(df, "id", "x", "y").collect()}
    assert got == {1, 2, 3, 6}


def test_merge_intervals_envelope_not_lag_gap(spark):
    # [0,100) envelops [10,20) and [30,40): the lag-gap rule would
    # split at 30 (prev end 20); the running-max union must not.
    rows = [
        ("u", 0, 100, 1),
        ("u", 10, 20, 2),
        ("u", 30, 40, 3),
        ("u", 150, 160, 4),
        ("v", 5, 10, 5),
        ("v", 10, 15, 6),  # touching -> merges (half-open union)
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long, q long")
    out = {
        (r["k"], r["span_no"]): r
        for r in merge_intervals(df, "k", "s", "e", "q").collect()
    }
    assert len(out) == 3
    assert (out[("u", 1)]["span_start"], out[("u", 1)]["span_end"],
            out[("u", 1)]["n_intervals"]) == (0, 100, 3)
    assert (out[("u", 2)]["span_start"], out[("u", 2)]["span_end"]) == (150, 160)
    assert (out[("v", 1)]["span_start"], out[("v", 1)]["span_end"],
            out[("v", 1)]["n_intervals"]) == (5, 15, 2)


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    """Property check at sf0.001: the sweep output equals the O(n^2)
    dominance definition."""
    from real_time_data_pipeline_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias("price_c"),
    )
    rows = orders.collect()
    brute = {
        r["o_orderkey"]
        for r in rows
        if not any(
            (b["o_orderdate"] <= r["o_orderdate"])
            and (b["price_c"] >= r["price_c"])
            and (
                b["o_orderdate"] < r["o_orderdate"]
                or b["price_c"] > r["price_c"]
            )
            for b in rows
        )
    }
    got = {
        r["o_orderkey"]
        for r in skyline_2d(
            orders, "o_orderkey", "o_orderdate", "price_c"
        ).collect()
    }
    assert got == brute


def test_prorate_largest_remainder_golden_and_invariant(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        prorate_largest_remainder,
    )

    # total 100 over weights 1,1,1 -> base 33 each, R=1 cent to the
    # largest remainder (all tie at 1/3 -> seq asc wins -> row 1 gets 34)
    rows = [(1, 1, 1, 100), (1, 2, 1, 100), (1, 3, 1, 100),
            # total 10 over weights 7,3 -> base 7,3 exact, R=0
            (2, 1, 7, 10), (2, 2, 3, 10)]
    df = spark.createDataFrame(rows, "g int, seq int, w_c long, t_c long")
    out = {
        (r["g"], r["seq"]): r["alloc_c"]
        for r in prorate_largest_remainder(df, "g", "w_c", "t_c", "seq").collect()
    }
    assert out == {(1, 1): 34, (1, 2): 33, (1, 3): 33, (2, 1): 7, (2, 2): 3}


def test_prorate_sums_exactly_to_total_at_sf(spark, sf_dir):
    """The billing invariant: per-order allocations sum EXACTLY to the
    order total, for every order at sf0.001."""
    from pyspark.sql import functions as F

    from real_time_data_pipeline_spark.queries.analytics_r6 import (
        q_order_proration,
    )
    from real_time_data_pipeline_spark.schemas import load_table

    alloc = q_order_proration(spark, sf_dir)
    sums = alloc.groupBy("l_orderkey").agg(
        F.sum("alloc_c").alias("allocated")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias("total_c"),
    )
    bad = sums.join(orders, "l_orderkey").filter(
        F.col("allocated") != F.col("total_c")
    )
    assert bad.count() == 0


def test_weighted_median_lower_rule(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        weighted_median,
    )

    # g=a: values 1(w5), 2(w1), 3(w1): W=7, half=3.5 -> cum at v=1 is 5,
    #   2*5>=7 and 2*0<7 -> median 1 (weight dominates)
    # g=b: values 10(w1), 20(w1): W=2 -> 2*1>=2 at v=10 -> lower median 10
    rows = [("a", 1, 5, 1), ("a", 2, 1, 2), ("a", 3, 1, 3),
            ("b", 10, 1, 4), ("b", 20, 1, 5)]
    df = spark.createDataFrame(rows, "g string, v long, wt long, s long")
    out = {r["g"]: (r["total_weight"], r["wmedian_c"])
           for r in weighted_median(df, "g", "v", "wt", "s").collect()}
    assert out == {"a": (7, 1), "b": (2, 10)}


def test_median_mad_golden(spark):
    from real_time_data_pipeline_spark.operators.statistics import median_mad

    # g: values 1,2,3,4,100 -> n=5, lower median rank 3 -> 3;
    # deviations |v-3| = 2,1,0,1,97 sorted 0,1,1,2,97 -> rank 3 -> 1
    rows = [("g", v, i) for i, v in enumerate([1, 2, 3, 4, 100])]
    df = spark.createDataFrame(rows, "g string, v long, s long")
    out = median_mad(df, "g", "v", "s").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["median_c"], r["mad_c"]) == (5, 3, 1)
    # even count: 1,2,3,4 -> rank (4+1)//2 = 2 -> lower median 2;
    # deviations 1,0,1,2 sorted 0,1,1,2 -> rank 2 -> 1
    df2 = spark.createDataFrame(
        [("h", v, v) for v in [1, 2, 3, 4]], "g string, v long, s long"
    )
    r2 = median_mad(df2, "g", "v", "s").collect()[0]
    assert (r2["n"], r2["median_c"], r2["mad_c"]) == (4, 2, 1)


def test_clamped_balance_matches_recurrence(spark):
    # adversarial: clamp, recover, exact-zero touch (no clamp event),
    # deep re-clamp, final positive
    deltas = [5, -10, 3, -3, 20, -30, 15, -1]
    rows = [("u", i, i, d) for i, d in enumerate(deltas)]
    # plus a never-clamped key and an all-negative key
    rows += [("v", i, i, d) for i, d in enumerate([7, -2, 4])]
    rows += [("w", i, i, d) for i, d in enumerate([-4, -6])]
    df = spark.createDataFrame(rows, "k string, o long, s long, d long")

    from real_time_data_pipeline_spark.operators.statistics import (
        clamped_running_balance,
    )

    out = {
        r["k"]: r
        for r in clamped_running_balance(df, "k", "o", "s", "d").collect()
    }

    def sim(ds):
        b, peak, clamps, cum, mincum = 0, 0, 0, 0, 0
        for d in ds:
            cum += d
            mincum = min(mincum, cum)
            if b + d < 0:
                clamps += 1
            b = max(0, b + d)
            peak = max(peak, b)
        return b, peak, clamps, mincum

    for k, ds in (("u", deltas), ("v", [7, -2, 4]), ("w", [-4, -6])):
        b, peak, clamps, mincum = sim(ds)
        r = out[k]
        assert r["n_events"] == len(ds)
        assert r["final_balance_c"] == b, (k, r)
        assert r["peak_balance_c"] == peak, (k, r)
        assert r["n_clamps"] == clamps, (k, r)
        assert r["min_cum_c"] == min(0, mincum) if mincum < 0 else True


def test_contingency_chi2_independent_is_zero_and_golden(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        contingency_chi2,
    )

    # perfectly independent 2x2: every cell's dev == 0
    rows = (
        [("a", "x")] * 4 + [("a", "y")] * 2
        + [("b", "x")] * 8 + [("b", "y")] * 4
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = contingency_chi2(df, "r", "c").collect()
    assert all(x["dev"] == 0 and x["chi2_u6"] == 0 for x in out)

    # hand case: O=[[3,1],[1,3]], N=8, R=C=[4,4]
    rows = (
        [("a", "x")] * 3 + [("a", "y")] * 1
        + [("b", "x")] * 1 + [("b", "y")] * 3
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = {(x["r"], x["c"]): x for x in contingency_chi2(df, "r", "c").collect()}
    # dev = 3*8 - 4*4 = 8 for (a,x); chi2_u6 = 64*1e6 // (4*4*8) = 500000
    assert out[("a", "x")]["dev"] == 8
    assert out[("a", "x")]["chi2_u6"] == 500_000
    assert out[("a", "y")]["dev"] == -8
    assert out[("a", "y")]["chi2_u6"] == 500_000


def test_group_mode_tie_breaks_to_smallest_value(spark):
    from real_time_data_pipeline_spark.operators.statistics import group_mode

    rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")]
    df = spark.createDataFrame(rows, "g string, v string")
    out = group_mode(df, "g", "v").collect()
    assert len(out) == 1
    r = out[0]
    # tie between a and b at count 2 -> smallest value wins
    assert r["mode_value"] == "a" and r["mode_count"] == 2
    assert r["n"] == 5 and r["share_bp"] == 4000


def test_khop_reachability_min_hops_and_radius(spark):
    from real_time_data_pipeline_spark.operators.graph import (
        khop_reachability,
    )

    # path 1-2-3-4-5-6 plus shortcut 1-4 (undirected), seed {1}:
    # hops: 1:0, 2:1, 4:1, 3:2, 5:2, 6:3; k=2 cuts 6
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["min_hops"]
        for r in khop_reachability(edges, seeds, k=2).collect()
    }
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # k=5 reaches everything at true BFS distance
    got5 = {
        r["node"]: r["min_hops"]
        for r in khop_reachability(edges, seeds, k=5).collect()
    }
    assert got5 == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2, 6: 3}
    # disconnected node never appears; exhausted component stops early
    edges2 = spark.createDataFrame([(7, 8), (8, 7)], "src long, dst long")
    got_iso = {
        r["node"]: r["min_hops"]
        for r in khop_reachability(edges2, seeds, k=4).collect()
    }
    assert got_iso == {1: 0}


def test_mann_whitney_u_hand_case_and_invariant(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        mann_whitney_u,
    )

    # A = [1, 2, 2, 5], B = [2, 3, 4] — U_a counts WINS of A (a > b):
    # a=1 beats none; each a=2 beats none but ties B's 2 (x2 ties);
    # a=5 beats all 3.  U_a = 3 + 2*0.5 = 4 -> u2_a = 8
    rows = [("g", "A", v) for v in [1, 2, 2, 5]] + [
        ("g", "B", v) for v in [2, 3, 4]
    ]
    df = spark.createDataFrame(rows, "g string, side string, v long")
    out = mann_whitney_u(df, "g", "side", "v", "A", "B").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"], r["u2_a"]) == (4, 3, 8)
    assert r["effect_a_bp"] == (10000 * 8) // (2 * 4 * 3)
    # invariant: u2_a + u2_b == 2 * n_a * n_b
    r_b = mann_whitney_u(df, "g", "side", "v", "B", "A").collect()[0]
    assert r["u2_a"] + r_b["u2_a"] == 2 * r["n_a"] * r["n_b"]
    # rows outside the two sides must be ignored
    df2 = df.union(
        spark.createDataFrame([("g", "C", 100)], "g string, side string, v long")
    )
    r2 = mann_whitney_u(df2, "g", "side", "v", "A", "B").collect()[0]
    assert (r2["n_a"], r2["n_b"], r2["u2_a"]) == (4, 3, 8)


def test_ks_statistic_hand_case_and_bounds(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        ks_statistic,
    )

    # A = [1, 2, 3], B = [3, 4, 5]: max gap at v=2: F_a=2/3, F_b=0
    # d_num = |2*3 - 0*3| = 6, d_bp = 10000*6 // 9 = 6666
    rows = [("g", "A", v) for v in [1, 2, 3]] + [
        ("g", "B", v) for v in [3, 4, 5]
    ]
    df = spark.createDataFrame(rows, "g string, side string, v long")
    r = ks_statistic(df, "g", "side", "v", "A", "B").collect()[0]
    assert (r["n_a"], r["n_b"], r["d_num"], r["d_bp"]) == (3, 3, 6, 6666)

    # identical samples -> D = 0; disjoint -> D = 10000
    same = spark.createDataFrame(
        [("g", s, v) for s in ("A", "B") for v in [1, 2, 3]],
        "g string, side string, v long",
    )
    assert ks_statistic(same, "g", "side", "v", "A", "B").collect()[0][
        "d_bp"
    ] == 0
    disj = spark.createDataFrame(
        [("g", "A", v) for v in [1, 2]] + [("g", "B", v) for v in [10, 20]],
        "g string, side string, v long",
    )
    assert ks_statistic(disj, "g", "side", "v", "A", "B").collect()[0][
        "d_bp"
    ] == 10000


def test_fifo_match_equals_sequential_simulation(spark):
    from real_time_data_pipeline_spark.operators.statistics import fifo_match

    # key A: demand exceeds supply mid-stream; key B: supply never
    # consumed; key C: exact drain
    buys = [
        ("A", 5, 1, 10), ("A", 3, 3, 20), ("A", 4, 6, 30),
        ("B", 7, 1, 5),
        ("C", 2, 1, 7), ("C", 2, 2, 9),
    ]
    sells = [
        ("A", 4, 2), ("A", 6, 4), ("A", 10, 7),
        ("C", 4, 3),
    ]
    bdf = spark.createDataFrame(buys, "k string, qty long, s long, c long")
    sdf = spark.createDataFrame(sells, "k string, qty long, s long")
    out = {
        r["k"]: r
        for r in fifo_match(bdf, sdf, "k", "qty", ["s"], cost_col="c").collect()
    }

    def sim(bl, sl):
        lots = [[q, c] for q, c in bl]  # FIFO queue
        matched, cost = 0, 0
        sold = sum(q for q, in sl)
        for (q,) in sl:
            need = q
            while need and lots:
                take = min(need, lots[0][0])
                matched += take
                cost += take * lots[0][1]
                lots[0][0] -= take
                need -= take
                if lots[0][0] == 0:
                    lots.pop(0)
        return matched, cost, sold

    for k in ("A", "B", "C"):
        bl = [(q, c) for kk, q, s, c in buys if kk == k]
        sl = [(q,) for kk, q, s in sells if kk == k]
        m, cost, sold = sim(bl, sl)
        r = out[k]
        assert r["bought_qty"] == sum(q for q, c in bl)
        assert r["sold_qty"] == sold
        assert r["matched_qty"] == m, (k, r)
        assert r["matched_cost_c"] == cost, (k, r)
        assert r["unmatched_sell_qty"] == sold - m


def test_spearman_rank_stats_goldens(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        spearman_rank_stats,
    )

    # perfect monotone -> d2 = 0, rho = 10000
    rows = [("m", i, i * 10) for i in range(1, 6)]
    # perfect reverse -> classical rho = -10000 exactly (n=5:
    # sum d^2 = 40 -> 4x = 160; 1 - 6*40/120 = -1)
    rows += [("r", i, 100 - i) for i in range(1, 6)]
    # singleton group -> rho undefined (NULL), no div-by-zero
    rows += [("s", 1, 1)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r for r in spearman_rank_stats(df, "g", "x", "y").collect()}
    assert out["m"]["sum_d2"] == 0 and out["m"]["rho_bp"] == 10000
    assert out["r"]["sum_d2"] == 160 and out["r"]["rho_bp"] == -10000
    assert out["s"]["rho_bp"] is None and out["s"]["n"] == 1

    # tie handling: x = [1,1,2], y = [3,7,5] — 2*midranks:
    # x: value 1 -> mr2 = 0+2+1 = 3 (both rows), value 2 -> 2+3+1 = 6
    # y: all distinct -> mr2 = 1,3,5 doubled ranks: y=3->1*2-? use
    # formula lt+cum+1: y=3:0+1+1=2? no: 2*cum-n+1 -> 2*1-1+1=2,
    # y=5 -> 2*2-1+1=4, y=7 -> 2*3-1+1=6
    # rows: (x1,y3): d=3-2=1; (x1,y7): 3-6=-3; (x2,y5): 6-4=2
    # sum_d2 = 1+9+4 = 14
    df2 = spark.createDataFrame(
        [("t", 1, 3), ("t", 1, 7), ("t", 2, 5)], "g string, x long, y long"
    )
    r = spearman_rank_stats(df2, "g", "x", "y").collect()[0]
    assert r["sum_d2"] == 14 and r["n"] == 3


def test_classification_report_goldens(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        classification_report,
    )

    # labels: a a a b b c ; preds: a b a b b d
    rows = [
        ("a", "a"), ("a", "b"), ("a", "a"),
        ("b", "b"), ("b", "b"), ("c", "d"),
    ]
    df = spark.createDataFrame(rows, "label string, pred string")
    out = {r["cls"]: r for r in classification_report(df, "label", "pred").collect()}
    # class a: n_true=3, n_pred=2, tp=2 -> p=10000, r=6666
    a = out["a"]
    assert (a["n_true"], a["n_pred"], a["tp"]) == (3, 2, 2)
    assert (a["precision_bp"], a["recall_bp"]) == (10000, 6666)
    assert a["f1_bp"] == (2 * 10000 * 6666) // (10000 + 6666)
    # class c: true but never predicted -> precision NULL, recall 0
    c = out["c"]
    assert c["n_pred"] == 0 and c["precision_bp"] is None
    assert c["recall_bp"] == 0 and c["f1_bp"] is None
    # class d: predicted but never true -> recall NULL, precision 0
    d = out["d"]
    assert d["n_true"] == 0 and d["recall_bp"] is None
    assert d["precision_bp"] == 0 and d["f1_bp"] is None


def test_cohens_kappa_goldens(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        cohens_kappa,
    )

    # perfect agreement, 2 balanced classes: kappa = 1
    rows = [("x", "x")] * 3 + [("y", "y")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["kappa_bp"] == 10000
    # independent-looking 2x2 with po == pe -> kappa = 0:
    # a: x x y y ; b: x y x y  -> agree 2/4, pe = (2*2 + 2*2)/16 = 1/2
    rows = [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")]
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r["kappa_num"] == 0 and r["kappa_bp"] == 0
    # both raters constant -> pe = 1 -> NULL (degenerate)
    rows = [("x", "x")] * 4
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r["kappa_bp"] is None and r["kappa_den"] == 0


def test_bigram_collocations_counts_and_lift(spark):
    from real_time_data_pipeline_spark.operators.text import (
        bigram_collocations,
    )

    docs = spark.createDataFrame(
        [
            (1, "new york new york city"),
            (2, "new york is big"),
            (3, "x"),        # single token -> no bigrams
            (4, ""),         # empty -> no bigrams
        ],
        "doc_id long, text string",
    )
    out = {
        (r["tok_a"], r["tok_b"]): r
        for r in bigram_collocations(docs, "doc_id", "text", min_count=2).collect()
    }
    # bigrams: d1: (new,york) (york,new) (new,york) (york,city)
    #          d2: (new,york) (york,is) (is,big)      -> N = 7
    assert set(out) == {("new", "york")}
    r = out[("new", "york")]
    # n_ab=3; first-slot new=3; second-slot york=3
    assert (r["n_ab"], r["n_a"], r["n_b"], r["n_bigrams"]) == (3, 3, 3, 7)
    assert r["lift_bp"] == (10000 * 3 * 7) // (3 * 3)


def test_seasonal_median_index_golden(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        seasonal_median_index,
    )

    # group g: season 1 -> [10, 20, 30] (median 20);
    #          season 2 -> [40, 50]     (lower median 40)
    # overall [10..50] -> lower median 30
    rows = [("g", 1, v, i) for i, v in enumerate([10, 20, 30])]
    rows += [("g", 2, v, i + 10) for i, v in enumerate([40, 50])]
    df = spark.createDataFrame(rows, "g string, mon int, v long, s long")
    out = {
        r["season"]: r
        for r in seasonal_median_index(df, "g", "mon", "v", "s").collect()
    }
    assert out["1"]["season_median_c"] == 20 and out["1"]["n_season"] == 3
    assert out["2"]["season_median_c"] == 40
    assert out["1"]["overall_median_c"] == 30
    assert out["1"]["index_bp"] == (10000 * 20) // 30
    assert out["2"]["index_bp"] == (10000 * 40) // 30


def test_ols_trend_goldens(spark):
    from real_time_data_pipeline_spark.operators.statistics import ols_trend

    # exact line y = 3x + 7 -> slope_u = 3e6, intercept 7
    rows = [("up", x, 3 * x + 7) for x in range(10)]
    # exact negative slope y = -2x + 100 (negative-division parity:
    # both engines truncate toward zero)
    rows += [("down", x, -2 * x + 100) for x in range(10)]
    # degenerate: constant x -> NULL
    rows += [("flat", 5, v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r for r in ols_trend(df, "g", "x", "y").collect()}
    assert out["up"]["slope_u"] == 3_000_000
    assert out["up"]["intercept_c"] == 7
    assert out["down"]["slope_u"] == -2_000_000
    assert out["down"]["intercept_c"] == 100
    assert out["flat"]["slope_u"] is None and out["flat"]["intercept_c"] is None


def test_theil_sen_robust_to_outlier(spark):
    from real_time_data_pipeline_spark.operators.statistics import (
        theil_sen_trend,
    )

    # clean line y = 2x with ONE wild outlier at x=9: Theil-Sen median
    # slope stays 2e6 (OLS would be dragged far off)
    rows = [("g", x, 2 * x, x) for x in range(9)]
    rows += [("g", 9, 1_000_000, 9)]
    # duplicate observations at one x collapse to the cell median first
    rows += [("h", 0, 10, 1), ("h", 0, 30, 2), ("h", 0, 20, 3),
             ("h", 1, 25, 4)]
    df = spark.createDataFrame(rows, "g string, x long, y long, s long")
    out = {r["g"]: r for r in theil_sen_trend(df, "g", "x", "y", "s").collect()}
    r = out["g"]
    assert r["n_points"] == 10 and r["n_pairs"] == 45
    assert r["slope_u"] == 2_000_000, r
    # h: cell x=0 -> median 20; pair slope = (25-20)*1e6 // 1 = 5e6
    assert out["h"]["n_points"] == 2 and out["h"]["slope_u"] == 5_000_000
    # single-point group -> NULL slope, 0 pairs
    one = spark.createDataFrame([("z", 3, 7, 1)], "g string, x long, y long, s long")
    rz = theil_sen_trend(one, "g", "x", "y", "s").collect()[0]
    assert rz["slope_u"] is None and rz["n_pairs"] == 0


def test_change_point_finds_planted_step(spark):
    """A clean level shift is recovered exactly: split after the last
    low day, segment means exact, gain equals the closed form
    n_l*n_r/N*(m_l-m_r)^2 (x100).  A brute-force argmax over all
    splits agrees on a noisy series too."""
    from real_time_data_pipeline_spark.operators.statistics import (
        change_point_binary,
    )

    rows = [("a", x, 100) for x in range(10)]
    rows += [("a", x, 500) for x in range(10, 25)]
    # noisy series: deterministic pseudo-noise around a shift at x=12
    noisy = [
        ("b", x, (200 if x < 12 else 900) + (x * 37 % 11) - 5)
        for x in range(30)
    ]
    df = spark.createDataFrame(
        rows + noisy, "grp string, x int, y long"
    )
    got = {
        r["grp"]: r
        for r in change_point_binary(df, "grp", "x", "y").collect()
    }
    a = got["a"]
    assert (a["split_x"], a["n_left"], a["n_right"]) == (9, 10, 15)
    assert (a["mean_left"], a["mean_right"]) == (100, 500)
    # SS_b = n_l*n_r/N*(m_l-m_r)^2 = 10*15/25*400^2 = 960000 (x100)
    assert a["gain_u"] == 96_000_000

    # brute force on the noisy series
    ys = [y for (_, _, y) in noisy]
    n, s = len(ys), sum(ys)
    best = max(
        (
            ((sum(ys[:i]) * (n - i) - (s - sum(ys[:i])) * i) ** 2 * 100)
            // (n * i * (n - i)),
            -i,
        )
        for i in range(1, n)
    )
    b = got["b"]
    assert b["gain_u"] == best[0] and b["split_x"] == -best[1] - 1


def test_attribution_u_shape_goldens_and_exact_sum(spark):
    """Hand-built paths: 1-touch 100%, 2-touch 50/50, 5-touch
    40/20/40 with the remainder rule (2000//3=666 rem 2 -> middles
    667,667,666); pathless purchase credits 'direct'; per-conversion
    credits sum to exactly value_c*10000."""
    from real_time_data_pipeline_spark.operators.statistics import (
        attribution_u_shape,
    )

    rows = []
    # user 1: one click then purchase 100.00 -> click 100%
    rows += [(1, "2024-01-01 00:00:01", 1, "click", None),
             (1, "2024-01-01 00:00:02", 2, "purchase", 100.0)]
    # user 2: view, click, purchase 50.00 -> 50/50
    rows += [(2, "2024-01-01 00:00:01", 3, "view", None),
             (2, "2024-01-01 00:00:02", 4, "click", None),
             (2, "2024-01-01 00:00:03", 5, "purchase", 50.0)]
    # user 3: c v v v c then purchase 1.00 -> 4000,667,667,666,4000
    rows += [(3, "2024-01-01 00:00:01", 6, "click", None),
             (3, "2024-01-01 00:00:02", 7, "view", None),
             (3, "2024-01-01 00:00:03", 8, "view", None),
             (3, "2024-01-01 00:00:04", 9, "view", None),
             (3, "2024-01-01 00:00:05", 10, "click", None),
             (3, "2024-01-01 00:00:06", 11, "purchase", 1.0)]
    # user 4: pathless purchase 9.99 -> direct
    rows += [(4, "2024-01-01 00:00:01", 12, "purchase", 9.99)]
    # user 4 second path: touch AFTER the last purchase is uncredited
    rows += [(4, "2024-01-01 00:00:02", 13, "click", None)]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["touch_type"]: (r["n_credits"], r["credit_cbp"])
        for r in attribution_u_shape(df).collect()
    }
    # click: u1 10000*10000 + u2 5000*5000 + u3 (4000+4000)*100
    assert got["click"] == (4, 100_000_000 + 25_000_000 + 800_000)
    # view: u2 5000*5000 + u3 (667+667+666)*100
    assert got["view"] == (4, 25_000_000 + 200_000)
    assert got["direct"] == (1, 999 * 10000)
    total = sum(v for _, v in got.values())
    assert total == (10000 + 5000 + 100 + 999) * 10000
