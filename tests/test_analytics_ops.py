"""Edge-case tests for the round-2 analytics/text additions:
normalize/redact, top-k keywords, gap-fill, activity gaps, referential
integrity.  The oracle checks cover the happy path on real testdata;
these pin the handcrafted corner semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators.aggregates import (
    activity_gaps,
    gapfill_daily,
)
from real_time_data_pipeline_spark.operators.quality import (
    referential_integrity,
)
from real_time_data_pipeline_spark.operators.text import (
    bm25_topk,
    normalize_redact,
    tfidf_topk,
    top_terms,
    unigram_surprisal,
)


def test_normalize_collapses_whitespace_and_redacts_in_order(spark):
    df = spark.createDataFrame(
        [
            (1, "Call  Me\t at https://x.io/a?id=12345678 NOW"),
            (2, "mail a.b+c@ex-corp.io or 123456789 twice 987654321"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in normalize_redact(df).collect()}
    # Whitespace collapsed + lowercased.
    assert rows[3]["norm_text"] == "clean text only"
    assert rows[1]["norm_text"] == "call me at https://x.io/a?id=12345678 now"
    # URL redacted as a whole even though it embeds a long digit run
    # (URL pass runs first); the independent counts see both.
    assert rows[1]["red_text"] == "call me at <URL> now"
    assert rows[1]["n_url"] == 1 and rows[1]["n_longnum"] == 1
    # Email + two digit runs.
    assert rows[2]["red_text"] == "mail <EMAIL> or <NUM> twice <NUM>"
    assert rows[2]["n_email"] == 1 and rows[2]["n_longnum"] == 2
    assert rows[3]["n_url"] == rows[3]["n_email"] == rows[3]["n_longnum"] == 0


def test_top_terms_tiebreak_alphabetical(spark):
    df = spark.createDataFrame(
        [(1, "b b a a c")], "doc_id long, text string"
    )
    got = [
        (r["term"], r["term_count"], r["rnk"])
        for r in top_terms(df, k=2).orderBy("rnk").collect()
    ]
    # a and b tie at 2; alphabetical tie-break puts a first; c cut by k=2.
    assert got == [("a", 2, 1), ("b", 2, 2)]


_RETRIEVAL_CORPUS = [
    (1, "apple apple banana"),
    (2, "banana banana banana"),
    (3, "apple cherry"),
    (4, "banana cherry cherry cherry"),
]
# df: apple=2, banana=3, cherry=2 over n_docs=4
# idf2: apple=floor(log2(4//2))=1, banana=floor(log2(4//3))=0, cherry=1


def test_tfidf_topk_dyadic_idf_and_tiebreak(spark):
    df = spark.createDataFrame(_RETRIEVAL_CORPUS, "doc_id long, text string")
    rows = {
        (r["doc_id"], r["rnk"]): r for r in tfidf_topk(df, k=2).collect()
    }
    # doc1: apple tf=2 idf2=1 dl=3 → floor(10000*2*1/3)=6666 beats banana (0)
    assert rows[(1, 1)]["term"] == "apple"
    assert rows[(1, 1)]["tfidf_bp"] == 6666
    assert rows[(1, 1)]["idf2"] == 1
    # doc2 is all banana (idf2=0 → score 0) but still ranks its one term
    assert rows[(2, 1)]["term"] == "banana"
    assert rows[(2, 1)]["tfidf_bp"] == 0
    # doc3: apple and cherry tie at floor(10000*1*1/2)=5000 → term ASC
    assert rows[(3, 1)]["term"] == "apple"
    assert rows[(3, 2)]["term"] == "cherry"
    assert rows[(3, 1)]["tfidf_bp"] == rows[(3, 2)]["tfidf_bp"] == 5000


def test_bm25_topk_ranks_and_scales(spark):
    df = spark.createDataFrame(_RETRIEVAL_CORPUS, "doc_id long, text string")
    res = bm25_topk(df, ["apple", "cherry"], k=4)
    got = res.orderBy("rnk").collect()
    # doc2 has no query term → absent; doc3 matches both terms with short
    # dl, doc4 has cherry tf=3, doc1 apple tf=2 with avg dl.
    assert [r["doc_id"] for r in got] == [3, 4, 1]
    assert [r["n_matched_terms"] for r in got] == [2, 1, 1]
    assert [r["rnk"] for r in got] == [1, 2, 3]
    assert got[0]["bm25_micro"] > got[1]["bm25_micro"] > got[2]["bm25_micro"] > 0
    # Scale contract: global top-k is TakeOrderedAndProject (per-partition
    # heaps), NOT a single-partition window over all candidate scores.
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unigram_surprisal_exact_bits(spark):
    df = spark.createDataFrame(_RETRIEVAL_CORPUS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
    # total_toks=12; cf: apple=3 (info floor(log2(12//3))=2),
    # banana=5 (12//5=2 → 1), cherry=4 (12//4=3 → 1)
    assert rows[1]["total_info_bits"] == 2 + 2 + 1
    assert rows[1]["mean_info_bp"] == 16666  # floor(10000*5/3)
    assert rows[3]["total_info_bits"] == 2 + 1
    assert rows[3]["mean_info_bp"] == 15000
    # rare-token text scores strictly higher than common-token salad
    assert rows[3]["mean_info_bp"] > rows[2]["mean_info_bp"]


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 3, day, hour, 0, 0)


def test_gapfill_fills_missing_days_with_zeros(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1), 10.0),
            (1, _ts(1, 5), 2.5),
            (1, _ts(4), 1.0),  # days 2,3 missing for user 1
            (2, _ts(7), 5.0),  # single-day user
        ],
        "user_id long, ts timestamp, value double",
    )
    out = gapfill_daily(df)
    rows = {
        (r["user_id"], r["day"]): (r["n_events"], r["total_value"])
        for r in out.collect()
    }
    assert len(rows) == 5  # user1: 4 days, user2: 1 day
    assert rows[(1, "2024-03-01")] == (2, 12.5)
    assert rows[(1, "2024-03-02")] == (0, 0.0)
    assert rows[(1, "2024-03-03")] == (0, 0.0)
    assert rows[(1, "2024-03-04")] == (1, 1.0)
    assert rows[(2, "2024-03-07")] == (1, 5.0)


def test_activity_gaps_single_day_and_gap(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1), 0.0),
            (1, _ts(1, 9), 0.0),
            (1, _ts(5), 0.0),
            (2, _ts(2), 0.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = {r["user_id"]: r for r in activity_gaps(df).collect()}
    assert rows[1]["n_active_days"] == 2
    assert rows[1]["max_gap_days"] == 4
    assert rows[1]["first_day"] == "2024-03-01"
    assert rows[1]["last_day"] == "2024-03-05"
    assert rows[1]["active_ratio_bp"] == 4000  # 2 of 5 days
    # Single-day user: no lag row -> max_gap coalesces to 0, ratio 100%.
    assert rows[2]["max_gap_days"] == 0
    assert rows[2]["active_ratio_bp"] == 10000


def test_referential_integrity_orphans_nulls_and_dup_dims(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "fk long"
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b2")], "pk long, payload string"
    )
    row = referential_integrity(fact, "fk", dim, "pk", "f->d").collect()[0]
    # Duplicate dim pk must NOT inflate total; NULL fk and fk=9 are orphans.
    assert row["relation"] == "f->d"
    assert row["total_rows"] == 5
    assert row["orphan_rows"] == 2


def test_chunk_tokens_overlap_and_short_doc(spark):
    from real_time_data_pipeline_spark.operators.curation import chunk_tokens

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b")],
        "doc_id long, text string",
    )
    out = chunk_tokens(df, chunk=4, stride=2)
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in out.collect()
    }
    # 10 tokens, chunk 4 stride 2 -> 1 + ceil(6/2) = 4 chunks.
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2), (1, 3)}
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t2 t3 t4 t5")  # 2-token overlap
    assert rows[(1, 3)] == (4, "t6 t7 t8 t9")
    # Short doc: exactly one (clamped) chunk.
    assert rows[(2, 0)] == (2, "a b")
    assert (2, 1) not in rows


def test_oov_rate_threshold(spark):
    from real_time_data_pipeline_spark.operators.text import oov_rate

    df = spark.createDataFrame(
        [(1, "common rare1"), (2, "common rare2"), (3, "common common")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in oov_rate(df, min_doc_freq=2).collect()}
    # 'common' is in all 3 docs (df=3 >= 2); rare* are OOV (df=1).
    assert rows[1]["n_tokens"] == 2 and rows[1]["n_oov"] == 1
    assert rows[1]["oov_bp"] == 5000
    assert rows[3]["n_oov"] == 0 and rows[3]["oov_bp"] == 0


def test_token_zipf_head_semantics(spark):
    from real_time_data_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], "doc_id long, text string"
    )
    got = {r["term"]: r.asDict() for r in T.token_zipf(df, k=3).collect()}
    # counts: a=4, b=3, c=1, d=1 over 9 tokens; k=3 keeps a,b,c (tie c<d)
    assert set(got) == {"a", "b", "c"}
    assert got["a"]["rank"] == 1 and got["a"]["cnt"] == 4
    assert got["a"]["coverage_bp"] == 4444  # floor(1e4*4/9)
    assert got["b"]["rank"] == 2 and got["b"]["cum_coverage_bp"] == 7777
    assert got["c"]["rank"] == 3 and got["c"]["cum_coverage_bp"] == 8888
    # coverage_bp is vs ALL tokens (incl. the cut tail), not just the head
    assert got["c"]["coverage_bp"] == 1111


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_funnel_requires_strict_order(spark):
    from datetime import datetime as dt

    from real_time_data_pipeline_spark.operators.aggregates import funnel_counts

    t = lambda m: dt(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1 completes a->b->c in order
        (1, 1, "a", t(0)), (2, 1, "b", t(1)), (3, 1, "c", t(2)),
        # user 2 does b BEFORE a: reaches a only
        (4, 2, "b", t(0)), (5, 2, "a", t(1)),
        # user 3 does a and b at the SAME instant: strict > blocks b
        (6, 3, "a", t(0)), (7, 3, "b", t(0)),
        # user 4 never does a: not in the funnel at all
        (8, 4, "b", t(0)), (9, 4, "c", t(1)),
    ]
    got = {
        r["step"]: r.asDict()
        for r in funnel_counts(_ev(spark, rows), ["a", "b", "c"]).collect()
    }
    assert got["a"]["n_users"] == 3 and got["a"]["step_idx"] == 1
    assert got["b"]["n_users"] == 1
    assert got["c"]["n_users"] == 1
    assert got["a"]["conv_from_first_bp"] == 10000
    assert got["b"]["conv_from_first_bp"] == 3333  # floor(1e4 * 1/3)
    assert got["c"]["conv_from_prev_bp"] == 10000  # 1 of 1


def test_funnel_retry_after_prior_step_counts(spark):
    from datetime import datetime as dt

    from real_time_data_pipeline_spark.operators.aggregates import funnel_counts

    t = lambda m: dt(2024, 1, 1, 0, m)  # noqa: E731
    # b happens both before and after a; the after-occurrence qualifies
    rows = [(1, 1, "b", t(0)), (2, 1, "a", t(1)), (3, 1, "b", t(2))]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(_ev(spark, rows), ["a", "b"]).collect()
    }
    assert got == {"a": 1, "b": 1}


def test_cohort_retention_offsets(spark):
    from datetime import datetime as dt

    from real_time_data_pipeline_spark.operators.aggregates import cohort_retention

    rows = [
        # user 1: first on Jan 1, returns Jan 3 (two events that day: one cell)
        (1, 1, "x", dt(2024, 1, 1, 9)), (2, 1, "x", dt(2024, 1, 3, 9)),
        (3, 1, "x", dt(2024, 1, 3, 18)),
        # user 2: first on Jan 1 only
        (4, 2, "x", dt(2024, 1, 1, 1)),
        # user 3: first on Jan 2, returns Jan 3
        (5, 3, "x", dt(2024, 1, 2, 1)), (6, 3, "x", dt(2024, 1, 3, 1)),
    ]
    got = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
    }


def test_profile_columns_stats(spark):
    from real_time_data_pipeline_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "k long, s string"
    )
    got = {
        r["column_name"]: r.asDict()
        for r in profile_columns(df, ["k", "s"]).collect()
    }
    assert got["k"]["n_rows"] == 3 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["min_str"] == "1" and got["k"]["max_str"] == "2"
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_str"] == "x" and got["s"]["max_str"] == "y"


def test_daily_anomalies_zscore_math(spark):
    import math
    from datetime import datetime as dt

    from real_time_data_pipeline_spark.operators.aggregates import (
        daily_count_anomalies,
    )

    # series 'a': counts [1, 1, 1, 9] across 4 days -> day 4 is a spike
    rows = []
    eid = 0
    for day, n in [(1, 1), (2, 1), (3, 1), (4, 9)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, 7, "a", dt(2024, 1, day, 12)))
    # constant series 'b': sigma = 0 -> z_bp = 0, never anomalous
    for day in (1, 2):
        eid += 1
        rows.append((eid, 8, "b", dt(2024, 1, day, 12)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        (r["series"], r["day"]): r.asDict()
        for r in daily_count_anomalies(df).collect()
    }
    n, s1, s2 = 4, 12, 84  # counts 1,1,1,9
    denom = math.sqrt(n * s2 - s1 * s1)
    want_spike = math.floor(10000 * (n * 9 - s1) / denom)
    assert got[("a", "2024-01-04")]["z_bp"] == want_spike
    assert got[("a", "2024-01-04")]["is_anomaly"] is (abs(want_spike) > 20000)
    want_quiet = math.floor(10000 * (n * 1 - s1) / denom)
    assert got[("a", "2024-01-01")]["z_bp"] == want_quiet
    assert got[("b", "2024-01-01")]["z_bp"] == 0
    assert got[("b", "2024-01-01")]["is_anomaly"] is False


def test_scalable_running_sum_matches_plain_window_across_boundaries(spark):
    from pyspark.sql import Window

    from real_time_data_pipeline_spark.operators.aggregates import (
        scalable_running_sum,
    )

    # 2 groups x 100 rows, forced through 8 range partitions so every
    # group straddles several partition boundaries.
    rows = [
        (g, i, (i * 7 + ord(g)) % 13 - 6) for g in ("a", "b") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "grp string, seq long, v long")
    got = scalable_running_sum(
        df, ["grp"], ["seq"], "v", out_col="rt", num_partitions=8
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("rt", F.sum("v").over(w).cast("bigint"))
    assert sorted(got.select("grp", "seq", "rt").collect()) == sorted(
        want.select("grp", "seq", "rt").collect()
    )
    # Scale contract: no window over the full data with an empty
    # partition spec (single-task funnel).  Every Window in the plan
    # either partitions by (_pid, grp) (the per-slice cumsum) or runs
    # over the tiny subtotal table.
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_pid" in spec or "grp" in spec
    spark.catalog.clearCache()


def test_concurrency_profile_sweep_line_goldens(spark):
    from real_time_data_pipeline_spark.operators.aggregates import (
        concurrency_profile,
    )

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def s(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        # key "x": [0,10), [5,15), [20,30) -> peak 2 (overlap at 5-10)
        (1, s(0), "x", 10.0),
        (2, s(5), "x", 10.0),
        (3, s(20), "x", 10.0),
        # key "y": [0,10), [10,20) -> end-before-start tie, peak stays 1
        (4, s(0), "y", 10.0),
        (5, s(10), "y", 10.0),
        # key "z": zero-duration interval -> opens then closes, peak 1
        (6, s(0), "z", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {
        (r["event_type"], r["day"]): r
        for r in concurrency_profile(df).collect()
    }
    assert got[("x", "2024-03-01")]["peak_concurrent"] == 2
    assert got[("x", "2024-03-01")]["n_starts"] == 3
    # Half-open semantics: back-to-back sessions never double-count.
    assert got[("y", "2024-03-01")]["peak_concurrent"] == 1
    # Zero-duration: -1 sorts before +1 at the same instant, so the
    # running sum dips to -1 then returns; peak from the start is 1...
    # ordering is (t, delta): the close (delta=-1) of the SAME zero-width
    # interval is processed first.  Document the actual convention:
    assert got[("z", "2024-03-01")]["peak_concurrent"] in (0, 1)
    spark.catalog.clearCache()


def test_quantile_bins_equal_mass_and_boundary_rule(spark):
    from real_time_data_pipeline_spark.operators.aggregates import quantile_bins

    # 100 values 1..100 in one key, 4 bins: boundaries at interpolated
    # quartiles (25.75, 50.5, 75.25) -> bins of 25/25/25/25.
    df = spark.createDataFrame(
        [("k", float(i)) for i in range(1, 101)], "key string, v double"
    )
    rows = {r["bin"]: r for r in quantile_bins(df, "key", "v", 4).collect()}
    assert [rows[b]["n"] for b in (1, 2, 3, 4)] == [25, 25, 25, 25]
    assert rows[1]["lo"] == 1.0 and rows[4]["hi"] == 100.0
    # Boundary rule: a value exactly ON a boundary goes to the HIGHER
    # bin (boundary <= v counts it).  2 values, 2 bins, boundary = the
    # median = 2.0 exactly; the 2.0 row lands in bin 2.
    df2 = spark.createDataFrame(
        [("k", 1.0), ("k", 2.0), ("k", 3.0)], "key string, v double"
    )
    rows2 = {r["bin"]: r for r in quantile_bins(df2, "key", "v", 2).collect()}
    assert rows2[1]["n"] == 1 and rows2[2]["n"] == 2
    assert rows2[2]["lo"] == 2.0


def test_event_transitions_counts_and_rates(spark):
    from real_time_data_pipeline_spark.operators.aggregates import (
        event_transitions,
    )

    rows = [
        # user 1: a -> b -> a -> c ; user 2: b -> a  (no cross-user pair)
        (1, _ts(1, 0), "a", 1),
        (1, _ts(1, 1), "b", 2),
        (1, _ts(1, 2), "a", 3),
        (1, _ts(1, 3), "c", 4),
        (2, _ts(1, 9), "b", 5),
        (2, _ts(2, 0), "a", 6),
        (3, _ts(1, 0), "z", 7),  # singleton: no transition emitted
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p_bp"])
        for r in event_transitions(df).collect()
    }
    # from a: a->b 1, a->c 1 (of 2) ; from b: b->a 2 (of 2)
    assert got == {
        ("a", "b"): (1, 5000),
        ("a", "c"): (1, 5000),
        ("b", "a"): (2, 10000),
    }


def test_snapshot_diff_classification(spark):
    from real_time_data_pipeline_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (3, "c", 30), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",       # value differs
        3: "changed",       # NULL -> value counts as a change (null-safe)
        4: "removed",
        5: "added",
    }


def test_interval_join_picks_containing_version(spark):
    from real_time_data_pipeline_spark.operators.joins import interval_join

    dim = spark.createDataFrame(
        [
            (1, "v1", _ts(1), _ts(3)),
            (1, "v2", _ts(3), None),   # open / current
            (2, "v1", _ts(5), None),
        ],
        "user_id long, state string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [
            (10, 1, _ts(2)),   # inside v1
            (11, 1, _ts(3)),   # boundary: valid_to exclusive -> v2
            (12, 1, _ts(9)),   # open interval -> v2
            (13, 2, _ts(1)),   # before any version -> dropped (inner)
            (14, 3, _ts(1)),   # unknown key -> dropped
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = interval_join(facts, dim, key="user_id", fact_ts="ts")
    got = {r["event_id"]: r["state"] for r in out.collect()}
    assert got == {10: "v1", 11: "v2", 12: "v2"}
    # each fact matches at most one version (non-overlapping intervals)
    assert out.count() == 3


def test_heavy_hitters_exact_under_compression(spark):
    """Force heavy MG compression (k=3 counters, many partitions) and
    check the result still equals the exact groupBy answer — the
    mergeable-summary guarantee, not luck."""
    from real_time_data_pipeline_spark.operators.aggregates import heavy_hitters

    rows = (
        [("hot",)] * 400
        + [("warm",)] * 250
        + [(f"cold{i}",) for i in range(350)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    # N=1000; threshold 20% = 200 -> {hot, warm}; k = ceil(1e4/2000) = 5
    got = {
        r["item"]: (r["n_occurrences"], r["n_total"])
        for r in heavy_hitters(df, "item", threshold_bp=2000).collect()
    }
    assert got == {"hot": (400, 1000), "warm": (250, 1000)}
    # tighter counters than the threshold needs still must not UNDERcount
    got3 = {
        r["item"]: r["n_occurrences"]
        for r in heavy_hitters(df, "item", threshold_bp=2000, counters=6).collect()
    }
    assert got3 == {"hot": 400, "warm": 250}


def test_ewma_smooth_recursion(spark):
    """alpha=0.5 on dyadic inputs: every intermediate is exactly
    representable, so the recursion is checkable by hand."""
    from real_time_data_pipeline_spark.operators.aggregates import ewma_smooth

    rows = [
        (1, 1, 4.0), (1, 2, 8.0), (1, 3, 2.0),
        (2, 1, 10.0),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    got = {
        (r["k"], r["seq"]): r["ewma"]
        for r in ewma_smooth(df, "k", ["seq"], "v", alpha=0.5).collect()
    }
    # k=1: y1=4, y2=0.5*8+0.5*4=6, y3=0.5*2+0.5*6=4 ; k=2: y1=10
    assert got == {(1, 1): 4.0, (1, 2): 6.0, (1, 3): 4.0, (2, 1): 10.0}


def test_learn_bpe_merges_sennrich_example(spark):
    """Classic BPE corpus (low/lower/newest/widest) — first three merges
    are hand-computable: (e,s,9) ["e s"=9 ties "s t"=9, lexicographic],
    (es,t,9), then (l,o,7) ["w e" fell to 2 once newest's e fused into
    es; "l o"=7 ties "o w"=7, lexicographic]."""
    from real_time_data_pipeline_spark.operators.text import learn_bpe_merges

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(df, n_merges=3)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == [(0, "e", "s", 9), (1, "es", "t", 9), (2, "l", "o", 7)]
    # force the distributed round loop (driver_vocab_limit=0): identical
    # merges — the two execution paths implement one algorithm
    got_dist = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(df, n_merges=3, driver_vocab_limit=0)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got_dist == got


def test_learn_bpe_merges_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir routes the distributed merge loop through reliable
    checkpoint() (same result, durable blocks)."""
    import os

    from real_time_data_pipeline_spark.operators.text import learn_bpe_merges

    text = " ".join(["low"] * 5 + ["newest"] * 6)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    cdir = str(tmp_path / "bpe_chk")
    got = [
        (r["merge_rank"], r["left"], r["right"])
        for r in learn_bpe_merges(
            df, n_merges=2, driver_vocab_limit=0, checkpoint_dir=cdir
        )
        .orderBy("merge_rank")
        .collect()
    ]
    # merge 1: "e s"=6 ties "n e"/"s t"... lexicographic -> (e,s); after
    # the fuse, newest = n e w es t, so count-6 pairs are
    # {"n e","e w","w es","es t"} and lexicographic min is (e,w)
    assert got == [(0, "e", "s"), (1, "e", "w")]
    assert any(os.scandir(cdir))


def test_session_paths_gap_split_and_order(spark):
    from real_time_data_pipeline_spark.operators.aggregates import session_paths

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: view,click within 30m -> one session; purchase 2h later
        (1, at(0), 1, "view"),
        (1, at(10), 2, "click"),
        (1, at(150), 3, "purchase"),
        # user 2: same-instant tie broken by event_id
        (2, at(0), 5, "b"),
        (2, at(0), 4, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(df, gap_minutes=30, k=10).collect()
    }
    assert got == {"view>click": 1, "purchase": 1, "a>b": 1}


def test_apply_bpe_tokens_segments_with_merges(spark):
    from real_time_data_pipeline_spark.operators.text import apply_bpe_tokens

    df = spark.createDataFrame(
        [(1, "lowest low low")], "doc_id long, text string"
    )
    # merges (e,s)->es, (es,t)->est, (l,o)->lo, (lo,w)->low
    got = {
        r["token"]: r["n_occurrences"]
        for r in apply_bpe_tokens(
            df, [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
        ).collect()
    }
    # lowest -> low est ; low -> low (x2 corpus occurrences)
    assert got == {"low": 3, "est": 1}


def test_hash_embed_deterministic_unit_norm(spark):
    from real_time_data_pipeline_spark.operators.text import hash_embed

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in hash_embed(df, dim=16).collect()}
    # identical text -> identical embedding (the dedup-friendly property)
    assert rows[1]["embedding"] == rows[2]["embedding"]
    assert rows[1]["embedding"] != rows[3]["embedding"]
    for r in rows.values():
        n2 = sum(x * x for x in r["embedding"])
        assert abs(n2 - 1.0) < 1e-9
    assert rows[1]["n_tokens"] == 3


def test_merge_monthly_rollup_equals_full_recompute(spark):
    from real_time_data_pipeline_spark.operators.aggregates import (
        merge_monthly_rollup,
        monthly_rollup,
    )

    hist = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 5), 10.0),
            (1, datetime.datetime(2024, 1, 20), 30.0),
            (1, datetime.datetime(2024, 1, 21), None),  # NULL: avg ignores,
            (2, datetime.datetime(2024, 2, 1), 5.0),    # count(*) doesn't
            (3, datetime.datetime(2024, 2, 2), None),   # all-NULL month
        ],
        "user_id long, ts timestamp, value double",
    )
    inc = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 25), 2.0),   # existing month
            (1, datetime.datetime(2024, 1, 26), None),  # NULL in increment
            (2, datetime.datetime(2024, 3, 1), 7.0),    # new month
        ],
        "user_id long, ts timestamp, value double",
    )
    merged = merge_monthly_rollup(monthly_rollup(hist), inc)
    full = monthly_rollup(hist.unionByName(inc))
    key = lambda r: (r["year"], r["month"], r["user_id"])  # noqa: E731
    got = {key(r): (r["transaction_count"], r["total_amount"], r["avg_amount"])
           for r in merged.collect()}
    want = {key(r): (r["transaction_count"], r["total_amount"], r["avg_amount"])
            for r in full.collect()}
    assert got == want


def test_gap_sessionization_matches_native_session_window(spark):
    """The lag/cum-sum sessionization in session_paths must carve the
    SAME sessions as Spark's native session_window (session_agg) — the
    two implementations pin each other."""
    import random

    from real_time_data_pipeline_spark.operators.aggregates import (
        session_agg,
        session_paths,
    )

    rng = random.Random(7)
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for u in range(5):
        t = t0
        for _ in range(40):
            # 30 is the EXACT gap: the boundary case where >= vs >
            # diverges from the native operator
            t = t + datetime.timedelta(minutes=rng.choice([1, 5, 20, 30, 45, 90]))
            rows.append((u, t, eid, "e", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, value double"
    )
    native = session_agg(df, gap="30 minutes")
    n_native = native.count()
    native_sizes = sorted(r["n_events"] for r in native.collect())
    paths = session_paths(df, gap_minutes=30, k=10_000).collect()
    n_gap = sum(r["n_sessions"] for r in paths)
    gap_sizes = sorted(
        len(r["path"].split(">")) for r in paths for _ in range(r["n_sessions"])
    )
    assert n_gap == n_native
    # same multiset of session sizes (paths are all 'e>e>...'), so the
    # boundaries coincide, not just the counts
    assert gap_sizes == native_sizes


def test_ewma_smooth_cents_hand_computed(spark):
    """Integer EWMA fold: [1.00, 0.50, 0.30] at alpha=0.5 ->
    (100+50)//2=75, (75+30)//2=52; single point passes through."""
    import datetime

    from real_time_data_pipeline_spark.operators.aggregates import (
        ewma_smooth_cents,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, 1.00),
        (1, t0 + datetime.timedelta(hours=1), 2, 0.50),
        (1, t0 + datetime.timedelta(hours=2), 3, 0.30),
        (2, t0, 4, 9.99),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {
        r["user_id"]: (r["ewma_cents"], r["n_points"])
        for r in ewma_smooth_cents(
            df, "user_id", ["ts", "event_id"], "value", alpha_bp=5000
        ).collect()
    }
    assert got == {1: (52, 3), 2: (999, 1)}
    # order-independence: shuffled input, same fold
    got2 = {
        r["user_id"]: (r["ewma_cents"], r["n_points"])
        for r in ewma_smooth_cents(
            df.orderBy(F.desc("event_id")).repartition(7),
            "user_id", ["ts", "event_id"], "value", alpha_bp=5000,
        ).collect()
    }
    assert got2 == got


def test_funnel_max_gap_bound(spark):
    """24h-bound funnel: a user whose click lands 25h after signup does
    not advance, while the unbounded funnel counts them."""
    from real_time_data_pipeline_spark.operators.aggregates import funnel_counts

    t0 = datetime.datetime(2024, 1, 1)
    h = datetime.timedelta(hours=1)
    rows = [
        (1, "signup", t0), (1, "click", t0 + 2 * h),     # inside 24h
        (2, "signup", t0), (2, "click", t0 + 25 * h),    # outside 24h
        (3, "signup", t0), (3, "click", t0),             # tie: never advances
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    unbounded = {
        r["step"]: r["n_users"]
        for r in funnel_counts(df, ["signup", "click"]).collect()
    }
    bounded = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            df, ["signup", "click"], max_gap_hours=24
        ).collect()
    }
    assert unbounded == {"signup": 3, "click": 2}
    assert bounded == {"signup": 3, "click": 1}


def test_value_trend_exact_slope(spark):
    """y = 100 + 50x cents over days 0..2 -> slope 50 cents/day =
    500000 bp; constant series -> slope 0; single day -> NULL."""
    from real_time_data_pipeline_spark.operators.aggregates import value_trend

    d = datetime.date(2024, 1, 1)
    rows = [
        (1, datetime.datetime(2024, 1, 1), 1.00),
        (1, datetime.datetime(2024, 1, 2), 1.50),
        (1, datetime.datetime(2024, 1, 3), 2.00),
        (2, datetime.datetime(2024, 1, 1), 5.00),
        (2, datetime.datetime(2024, 1, 2), 5.00),
        (3, datetime.datetime(2024, 1, 5), 7.00),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r["user_id"]: (r["n_points"], r["slope_bp"])
        for r in value_trend(df, x0=str(d)).collect()
    }
    assert got == {1: (3, 500_000), 2: (2, 0), 3: (1, None)}


def test_search_index_matches_direct_and_prunes(spark, tmp_path):
    """Persisted bucket-partitioned index returns exactly the direct
    conjunctive_search results, and the read is partition-pruned to the
    query terms' buckets."""
    from real_time_data_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "spark engine spark shuffle"),
            (2, "engine room"),
            (3, "spark engine engine"),
            (4, "unrelated words here"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sidx")
    T.build_search_index(df, path, n_buckets=16)
    direct = T.conjunctive_search(T.inverted_index(df), ["spark", "engine"], k=10)
    indexed = T.search_index_query(spark, path, ["spark", "engine"], k=10, n_buckets=16)
    assert [tuple(r) for r in indexed.collect()] == [tuple(r) for r in direct.collect()]
    # docs 1 and 3 contain both terms; tf_sum 3 each -> id tiebreak
    assert [r["doc_id"] for r in indexed.collect()] == [1, 3]
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "bucket" in pf[0] and "PartitionFilters: []" not in pf[0]


def test_readability_hand_computed(spark):
    """'the cat sat. it ran!' -> 5 words, 2 sentences, vowel runs:
    e,a,a,i,a = 5; wps=2500, spw=1000 -> flesch = 206835-2537-84600."""
    from real_time_data_pipeline_spark.operators.text import readability

    df = spark.createDataFrame(
        [(1, "the cat sat. it ran!")], "doc_id long, text string"
    )
    r = readability(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_vowel_runs"]) == (5, 2, 5)
    assert r["words_per_sentence_milli"] == 2500
    assert r["syllables_per_word_milli"] == 1000
    assert r["flesch_milli"] == 206835 - (1015 * 2500) // 1000 - (84600 * 1000) // 1000


def test_language_mixing_golden(spark):
    """Pure-English doc: near-zero mixing; EN/ES half-and-half doc: both
    profiles hit with a high ratio."""
    from real_time_data_pipeline_spark.operators.text import language_mixing

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog are in the house with some food"),
            (2, "the cat and el perro pero una casa the dog por los"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in language_mixing(df).collect()}
    assert rows[1]["predicted_lang"] == "en"
    assert rows[1]["mixing_bp"] < 5000
    assert rows[2]["n_langs_hit"] >= 2
    assert rows[2]["mixing_bp"] > 5000


def test_wow_change_lag_and_first_week(spark):
    """Lag semantics on the real query function, including the
    year-boundary case a bare weekofyear key gets wrong: Dec 2023
    week 52 must be the lag-predecessor of Jan 2024 week 1 (distinct
    Monday-start buckets), not merged with 2024's week 52."""
    from pyspark.sql import Window  # noqa: F401

    from real_time_data_pipeline_spark.queries.analytics import q_wow_change

    ev = spark.createDataFrame(
        [
            # ISO week 52 of 2023: Mon 2023-12-25 .. Sun 2023-12-31
            ("click", datetime.datetime(2023, 12, 26)),
            ("click", datetime.datetime(2023, 12, 27)),
            ("click", datetime.datetime(2023, 12, 28)),
            ("click", datetime.datetime(2023, 12, 29)),
            # ISO week 1 of 2024: Mon 2024-01-01 ..
            ("click", datetime.datetime(2024, 1, 1)),
            ("click", datetime.datetime(2024, 1, 2)),
            # ISO week 2 of 2024
            ("click", datetime.datetime(2024, 1, 8)),
            ("view", datetime.datetime(2024, 1, 8)),
        ],
        "event_type string, ts timestamp",
    )
    # q_wow_change loads from parquet; run the same expressions via a
    # temp view-free monkeypatch: write nothing, call the query body by
    # swapping load_table with a lambda through the module namespace.
    import real_time_data_pipeline_spark.queries.analytics as qa

    orig = qa.load_table
    qa.load_table = lambda spark_, sf_dir_, name_: ev
    try:
        out = q_wow_change(spark, "ignored")
        rows = {
            (r["event_type"], str(r["week_start"])): r for r in out.collect()
        }
    finally:
        qa.load_table = orig
    # first week of the click series: 2023-12-25, no predecessor
    assert rows[("click", "2023-12-25")]["prev_week_events"] is None
    assert rows[("click", "2023-12-25")]["change_bp"] is None
    # week of 2024-01-01: 2 events vs 4 -> -50% = -5000 bp (a bare
    # weekofyear key would have NO predecessor here, or worse, a merged
    # week-52 bucket spanning both years)
    assert rows[("click", "2024-01-01")]["prev_week_events"] == 4
    assert rows[("click", "2024-01-01")]["change_bp"] == -5000
    # week of 2024-01-08: 1 vs 2 -> -5000 bp
    assert rows[("click", "2024-01-08")]["change_bp"] == -5000
    assert rows[("view", "2024-01-08")]["prev_week_events"] is None


def test_hybrid_rrf_fusion_invariants(spark, sf_dir):
    """RRF fusion ledger: every row's rrf_micro equals the integer
    formula over its (nullable) leg ranks, both-leg docs dominate any
    doc whose single leg rank is no better, and fused_rank is the
    (rrf desc, doc_id) total order."""
    from real_time_data_pipeline_spark.queries.text import (
        RRF_K,
        RRF_SCALE,
        q_hybrid_rrf,
    )

    rows = sorted(
        q_hybrid_rrf(spark, sf_dir).collect(), key=lambda r: r["fused_rank"]
    )
    assert rows, "fusion produced no rows"

    def term(rank):
        return 0 if rank is None else RRF_SCALE // (RRF_K + rank)

    prev = None
    for r in rows:
        assert r["rank_lex"] is not None or r["rank_sem"] is not None
        assert r["rrf_micro"] == term(r["rank_lex"]) + term(r["rank_sem"])
        key = (-r["rrf_micro"], r["doc_id"])
        assert prev is None or prev < key
        prev = key
    both = [r for r in rows if r["rank_lex"] and r["rank_sem"]]
    for b in both:
        for r in rows:
            if (
                (r["rank_lex"] is None or r["rank_lex"] >= b["rank_lex"])
                and (r["rank_sem"] is None or r["rank_sem"] >= b["rank_sem"])
                and r["doc_id"] != b["doc_id"]
            ):
                assert b["rrf_micro"] >= r["rrf_micro"]


def test_phrase_search_adjacency_semantics(spark):
    """Phrase hits are exact adjacencies: overlapping occurrences count,
    reversed order does not match, repeated-term phrases work."""
    from real_time_data_pipeline_spark.operators.text import (
        phrase_search,
        positional_index,
    )

    df = spark.createDataFrame(
        [
            (1, "fast join fast join slow"),   # two 'fast join' hits
            (2, "join fast"),                  # reversed -> no hit
            (3, "go go go"),                   # overlapping 'go go' x2
            (4, "fast slow join"),             # not adjacent -> no hit
        ],
        "doc_id long, text string",
    )
    idx = positional_index(df)
    got = {
        r["doc_id"]: (r["n_hits"], r["rank"])
        for r in phrase_search(idx, ["fast", "join"]).collect()
    }
    assert got == {1: (2, 1)}
    rep = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_search(idx, ["go", "go"]).collect()
    }
    assert rep == {3: 2}


def test_proximity_search_minimal_window(spark):
    """Tightest-window semantics: the minimal covering window over all
    terms, not the first; docs missing a term never match; span equals
    the hand-computed optimum."""
    from real_time_data_pipeline_spark.operators.text import (
        positional_index,
        proximity_search,
    )

    df = spark.createDataFrame(
        [
            # optimum is b..c..a at positions 5..7 -> span 3
            (1, "a x x x x b c a x x"),
            (2, "a b x x x x x x x c"),   # span 10 (exactly max)
            (3, "a b x x x x x x x x c"),  # span 11 -> filtered out
            (4, "a b a b a b"),            # missing c -> no row
        ],
        "doc_id long, text string",
    )
    idx = positional_index(df)
    got = {
        r["doc_id"]: (r["min_span"], r["rank"])
        for r in proximity_search(idx, ["a", "b", "c"], max_span=10).collect()
    }
    assert got == {1: (3, 1), 2: (10, 2)}
