"""Unit goldens for the round-5 extension operators: OHLC bars, TWAP,
weighted sampling, containment dedup, and triangle stats.

Each test pins the semantic edge the oracle can't isolate on synthetic
data: tie-breaking, zero-weight intervals, asymmetric direction,
min-shingle gating, weight monotonicity, and degree-orientation
correctness on graphs with known triangle counts.
"""

from __future__ import annotations

import datetime as dt

import pytest

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


def _ts(minute: int, sec: int = 0):
    return dt.datetime(2024, 1, 1, 10, minute, sec)


def test_ohlc_open_close_tiebreak_on_seq(spark):
    # Two rows share the opening timestamp: the lower seq wins open;
    # two share the closing timestamp: the higher seq wins close.
    rows = [
        ("k", _ts(0), 2, 500),   # same ts as seq 1 — seq 1 is open
        ("k", _ts(0), 1, 300),
        ("k", _ts(5), 3, 900),   # high
        ("k", _ts(9), 4, 100),   # low; same ts as seq 5
        ("k", _ts(9), 5, 400),   # close (higher seq at last ts)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, seq int, v long")
    out = ohlc(df, ["g"], "ts", "seq", "v").collect()[0]
    assert (out.n_events, out.open_c, out.high_c, out.low_c, out.close_c) == (
        5, 300, 900, 100, 400
    )


def test_twap_holds_value_until_next_observation(spark):
    # value 100 held 3 min, then 400 held 1 min; final row carries no
    # weight.  TWAP = (100*180e6 + 400*60e6) div 240e6 = 175.
    rows = [
        ("u", _ts(0), 1, 100),
        ("u", _ts(3), 2, 400),
        ("u", _ts(4), 3, 999_999),  # last observation — zero weight
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, seq int, v long")
    out = time_weighted_avg(df, ["u"], "ts", "seq", "v").collect()[0]
    assert out.n_intervals == 2
    assert out.span_us == 240_000_000
    assert out.twap_c == 175


def test_twap_simultaneous_rows_carry_zero_weight(spark):
    # Duplicate timestamps produce a 0-length interval: included as an
    # interval row but contributing 0 weight — TWAP is the survivor's.
    rows = [
        ("u", _ts(0), 1, 100),
        ("u", _ts(0), 2, 700),  # same instant, later seq
        ("u", _ts(2), 3, 700),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, seq int, v long")
    out = time_weighted_avg(df, ["u"], "ts", "seq", "v").collect()[0]
    assert out.n_intervals == 2
    assert out.span_us == 120_000_000
    # seq 1 spans 0 us (its successor is the same instant), so the
    # later-seq row at the duplicated timestamp is what gets held.
    assert out.twap_c == 700


def test_weighted_sample_deterministic_and_weight_monotone(spark):
    # Same ids, two weight configurations: raising one id's weight can
    # only improve (never worsen) its rank, and the draw is reproducible.
    base = [(i, 10) for i in range(200)]
    df = spark.createDataFrame(base, "doc_id long, w long")
    got1 = [r.doc_id for r in weighted_sample(df, "doc_id", "w", 20).collect()]
    got2 = [r.doc_id for r in weighted_sample(df, "doc_id", "w", 20).collect()]
    assert got1 == got2  # deterministic
    # Boost one excluded id's weight 1000x: its key shrinks 1000x and it
    # must enter the sample (with uniform weights the cut is ~10% of the
    # key range; a 1000x shrink beats that with huge margin).
    loser = next(i for i in range(200) if i not in set(got1))
    boosted = [(i, 10_000 if i == loser else 10) for i in range(200)]
    df2 = spark.createDataFrame(boosted, "doc_id long, w long")
    got3 = {r.doc_id for r in weighted_sample(df2, "doc_id", "w", 20).collect()}
    assert loser in got3
    # Zero/negative weights are excluded entirely.
    df3 = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10)], "doc_id long, w long"
    )
    assert {r.doc_id for r in weighted_sample(df3, "doc_id", "w", 3).collect()} == {3}


def test_containment_is_asymmetric_and_gated(spark):
    quote = "alpha beta gamma delta epsilon"  # 3 shingles
    article = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )  # contains every quote shingle + many more
    tiny = "alpha beta gamma"  # 1 shingle — below min_shingles
    df = spark.createDataFrame(
        [(1, quote), (2, article), (3, tiny)], "doc_id long, text string"
    )
    out = ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.8)
    rows = {(r.contained_id, r.container_id): r for r in out.collect()}
    # quote-in-article: 3/3 shingles → 10000 bp; reverse direction far
    # below threshold; tiny doc gated out despite full containment.
    assert set(rows) == {(1, 2)}
    assert rows[(1, 2)].containment_bp == 10_000
    assert rows[(1, 2)].n_common == 3


def test_triangle_stats_known_graphs(spark):
    # K4 (complete on 4 nodes): 4 triangles, 12 wedges, transitivity 1.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "src long, dst long")
    out = triangle_stats(df).collect()[0]
    assert (out.n_nodes, out.n_edges, out.n_wedges, out.n_triangles) == (
        4, 6, 12, 4
    )
    assert out.transitivity_bp == 10_000
    # Star graph: wedges but zero triangles; duplicate/reversed/self
    # edges normalized away.
    star = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)] + [(2, 2)]
    df2 = spark.createDataFrame(star, "src long, dst long")
    out2 = triangle_stats(df2).collect()[0]
    assert (out2.n_edges, out2.n_triangles) == (4, 0)
    assert out2.n_wedges == 6  # C(4,2) at the hub
    assert out2.transitivity_bp == 0


def test_cdc_mergeable_state_resurrection_and_depth(spark):
    from real_time_data_pipeline_spark.operators.cdc import (
        latest_state,
        merge_snapshot_state,
    )

    # key 1: insert then delete (old) then update (new) — resurrected,
    # depth 3.  key 2: update (old) then delete (new) — tombstone wins.
    # key 3: stale replay in the increment — idempotent, no effect on
    # the winner, and the replayed row still deepens the count exactly
    # as the full recompute over the unioned log would.
    old = [(1, 1, "I", 10), (1, 2, "D", 0), (2, 1, "U", 5), (3, 5, "U", 7)]
    new = [(1, 3, "U", 99), (2, 2, "D", 0), (3, 5, "U", 7)]
    schema = "k long, seq long, op string, v long"
    s_old = latest_state(spark.createDataFrame(old, schema), ["k"], ["seq"])
    s_new = latest_state(spark.createDataFrame(new, schema), ["k"], ["seq"])
    merged = merge_snapshot_state(s_old, s_new, ["k"], ["seq"])
    rows = {r.k: r for r in merged.collect()}
    assert (rows[1].op, rows[1].v, rows[1].n_changes) == ("U", 99, 3)
    assert (rows[2].op, rows[2].n_changes) == ("D", 2)
    assert (rows[3].op, rows[3].v, rows[3].n_changes) == ("U", 7, 2)
    # Associativity against the one-shot compaction of the full log.
    full = latest_state(
        spark.createDataFrame(old + new, schema), ["k"], ["seq"]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def _write_events(spark, tmp_path, rows):
    """Materialize synthetic events as parquet so the sf_dir-shaped
    queries (which load via schemas.load_table) can run on goldens."""
    import os

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_value_correlation_perfect_pairs(spark, tmp_path):
    from real_time_data_pipeline_spark.queries.analytics_ext import (
        q_value_correlation,
    )

    # Three types over 3 days: b = 2a (r=+1), c = -a + const (r=-1).
    rows = []
    eid = 0
    for i, day in enumerate([1, 2, 3]):
        ts = dt.datetime(2024, 1, day, 12, 0)
        for t, v in [("a", 100.0 * (i + 1)), ("b", 200.0 * (i + 1)),
                     ("c", 100.0 * (3 - i))]:
            eid += 1
            rows.append((eid, ts, 1, t, v, "{}"))
    d = _write_events(spark, tmp_path, rows)
    out = {(r.type_a, r.type_b): r.corr_bp
           for r in q_value_correlation(spark, d).collect()}
    # FLOOR(1e4·r) with r through two sqrt roundings: perfect ±1
    # correlation may land one ulp inside (9999 / -10001), never outside
    # by more.
    assert 9_999 <= out[("a", "b")] <= 10_000
    assert -10_001 <= out[("a", "c")] <= -10_000
    assert -10_001 <= out[("b", "c")] <= -10_000


def test_cusum_peak_locates_level_shift(spark, tmp_path):
    from real_time_data_pipeline_spark.queries.analytics_ext import (
        q_cusum_shift,
    )

    # 6 days: 100 for 3 days then 200 for 3 days — mean 150, CUSUM of
    # n-scaled deviations peaks at the shift boundary (day 3).
    rows = []
    for i in range(6):
        v = 100.0 if i < 3 else 200.0
        rows.append((i + 1, dt.datetime(2024, 2, i + 1, 9, 0), 1, "m", v, "{}"))
    d = _write_events(spark, tmp_path, rows)
    out = q_cusum_shift(spark, d).collect()[0]
    assert out.n_days == 6
    assert out.peak_day == dt.date(2024, 2, 3)
    # |sum of 3 days of (6*10000c - 90000c)| = 3 * 30000 n-cents... in
    # n-scaled cents: dev_n per low day = 6*10000 - 90000 = -30000.
    assert out.cusum_peak_n_cents == 90_000


def test_benford_constants_and_shares(spark, tmp_path):
    from real_time_data_pipeline_spark.queries.analytics_ext import (
        _BENFORD_BP,
        q_benford_audit,
    )
    import math

    # The pinned constants ARE floor(1e4*log10(1+1/d)).
    for dgt, bp in _BENFORD_BP.items():
        assert bp == math.floor(1e4 * math.log10(1 + 1 / dgt))
    import os

    df = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate([123.0, 150.0, 190.0, 25.0, 0.5])],
        "o_orderkey long, o_totalprice double",
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    out = {r.first_digit: r for r in q_benford_audit(spark, d).collect()}
    # 0.5 excluded (< 1); three 1xx rows and one 2x row.
    assert set(out) == {1, 2}
    assert out[1].n_orders == 3 and out[1].observed_bp == 7500
    assert out[2].n_orders == 1 and out[2].observed_bp == 2500
    assert out[1].deviation_bp == 7500 - 3010


from hypothesis import given, settings, strategies as st  # noqa: E402

_ohlc_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),          # group
        st.integers(0, 59),                   # minute
        st.integers(1, 50),                   # seq (may collide across rows)
        st.integers(-1000, 1000),             # value
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(rows=_ohlc_rows, cut=st.integers(0, 30))
def test_ohlc_state_merge_equals_one_shot(spark, rows, cut):
    """NO split of the input can change the merged bars (the streaming
    maintainer's invariant) — including splits that separate ties."""
    from real_time_data_pipeline_spark.operators.aggregates import (
        merge_ohlc_state,
        ohlc_state,
    )

    # Deduplicate full (g, ts, seq) collisions: equal ordering keys with
    # different values make open/close genuinely ambiguous — outside the
    # operator's contract (seq must totalize each group's order).
    seen, data = set(), []
    for g, minute, seq, v in rows:
        if (g, minute, seq) in seen:
            continue
        seen.add((g, minute, seq))
        data.append((g, _ts(minute), seq, v))
    cut = min(cut, len(data))
    schema = "g string, ts timestamp, seq long, v long"
    full = ohlc_state(
        spark.createDataFrame(data, schema), ["g"], "ts", "seq", "v"
    )
    lo = spark.createDataFrame(data[:cut] or [], schema)
    hi = spark.createDataFrame(data[cut:] or [], schema)
    merged = merge_ohlc_state(
        ohlc_state(lo, ["g"], "ts", "seq", "v"),
        ohlc_state(hi, ["g"], "ts", "seq", "v"),
        ["g"],
    )
    cols = ["g", "n_events", "open_c", "high_c", "low_c", "close_c"]
    assert sorted(map(tuple, merged.select(*cols).collect())) == sorted(
        map(tuple, full.select(*cols).collect())
    )


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 4),                    # key
            st.integers(1, 30),                   # seq
            st.sampled_from(["I", "U", "D"]),
            st.integers(0, 99),
        ),
        min_size=1,
        max_size=25,
    ),
    cut=st.integers(0, 25),
)
def test_cdc_state_merge_equals_one_shot(spark, rows, cut):
    from real_time_data_pipeline_spark.operators.cdc import (
        latest_state,
        merge_snapshot_state,
    )

    seen, data = set(), []
    for k, seq, op, v in rows:
        if (k, seq) in seen:  # seq must totalize per-key order
            continue
        seen.add((k, seq))
        data.append((k, seq, op, v))
    cut = min(cut, len(data))
    schema = "k long, seq long, op string, v long"
    full = latest_state(spark.createDataFrame(data, schema), ["k"], ["seq"])
    merged = merge_snapshot_state(
        latest_state(spark.createDataFrame(data[:cut] or [], schema), ["k"], ["seq"]),
        latest_state(spark.createDataFrame(data[cut:] or [], schema), ["k"], ["seq"]),
        ["k"],
        ["seq"],
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


@settings(max_examples=10, deadline=None)
@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 80)),  # start, span
        min_size=1,
        max_size=25,
    ),
    width=st.sampled_from([1, 7, 50, 1000]),
)
def test_banded_overlap_join_equals_naive(spark, ivs, width):
    """Banding is an optimization, never a semantics change: for ANY
    bucket width the banded join returns exactly the naive
    quadratic-predicate join's pairs, each exactly once."""
    from real_time_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [(i, s, s + span) for i, (s, span) in enumerate(ivs)]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    banded = interval_overlap_join(
        df, df, ("id", "s", "e"), ("id", "s", "e"), bucket_width=width
    ).filter(F.col("a_id") < F.col("b_id"))
    got = sorted(
        (r.a_id, r.b_id, r.overlap_len) for r in banded.collect()
    )
    want = sorted(
        (a[0], b[0], min(a[2], b[2]) - max(a[1], b[1]))
        for a in rows
        for b in rows
        if a[0] < b[0] and a[1] <= b[2] and b[1] <= a[2]
    )
    assert got == want


def test_wasserstein_shift_by_k_bins_is_k_widths(spark):
    """Shifting a distribution bodily by k bins must cost exactly
    k·bin_width — the defining property TV distance fails."""
    from real_time_data_pipeline_spark.operators.quality import (
        wasserstein_drift,
    )

    ref_rows = [("g", c) for c in [0, 1000, 2000, 3000]]
    cur_rows = [("g", c + 5000) for c in [0, 1000, 2000, 3000]]
    ref = spark.createDataFrame(ref_rows, "g string, cents long")
    cur = spark.createDataFrame(cur_rows, "g string, cents long")
    out = wasserstein_drift(ref, cur, "g", "cents", bin_width_cents=1000)
    row = out.collect()[0]
    assert (row.n_ref, row.n_cur) == (4, 4)
    assert row.w1_cents == 5000
    # And identical distributions have zero drift.
    zero = wasserstein_drift(ref, ref, "g", "cents", 1000).collect()[0]
    assert zero.w1_cents == 0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extension_tier_plans(spark, sf_dir):
    """Physical-plan guarantees for the round-5 extension operators —
    the properties that make them survive a 100 TB input, asserted so a
    refactor can't silently lose them."""
    from real_time_data_pipeline_spark.queries.analytics_ext import (
        q_ohlc_bars,
        q_session_overlap,
        q_time_weighted_avg,
        q_weighted_sample,
    )

    # OHLC: a single aggregate pair (partial+final) with map-side
    # partial aggregation — no window/sort-per-key of the raw events,
    # exactly one exchange.
    p = _plan(q_ohlc_bars(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_min_by" in p and "Window" not in p
    # TWAP: the lead-window shuffle is REUSED by the final aggregate —
    # one hash exchange total.
    p = _plan(q_time_weighted_avg(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1
    # Weighted sample: global top-k must be TakeOrderedAndProject (each
    # task keeps k), never a full Sort.
    p = _plan(q_weighted_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "Sort [sample_key" not in p
    # Banded overlap join: an equi-join on the bucket — the keyless
    # range predicate must NOT degrade to a nested-loop join.
    p = _plan(q_session_overlap(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_portable_simhash_matches_ascii_fold_and_pairs(spark):
    """The conv()-based 60-bit token hash equals the documented ascii
    fold (the oracle's recipe), and the portable pair join still finds
    near-identical docs while separating unrelated ones."""
    from real_time_data_pipeline_spark.operators.dedup import (
        _portable_hash60,
        simhash_near_pairs,
    )

    toks = spark.createDataFrame([("alpha",), ("beta",), ("",)], "tok string")
    h = F.sha2(F.col("tok").cast("string"), 256)
    v = F.lit(0).cast("bigint")
    for i in range(1, 16):
        c = F.ascii(F.substring(h, i, 1))
        v = v * 16 + F.when(c >= 97, c - 87).otherwise(c - 48).cast("bigint")
    rows = toks.select(
        _portable_hash60(F.col("tok")).alias("fast"), v.alias("fold")
    ).collect()
    assert all(r.fast == r.fold for r in rows)
    assert all(0 <= r.fast < (1 << 60) for r in rows)

    base = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),          # one token off — tiny Hamming
            (3, " ".join(f"z{i}" for i in range(60))),  # unrelated
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=3, portable=True
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(k == (1, 2) for k in pairs)


def test_degenerate_inputs_yield_null_not_error(spark, tmp_path):
    """ANSI-mode division guards: zero-variance correlation and
    zero-span TWAP produce NULL (matching oracle-engine semantics)
    instead of DIVIDE_BY_ZERO errors; empty intervals match nothing."""
    from real_time_data_pipeline_spark.operators.aggregates import (
        time_weighted_avg,
    )
    from real_time_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )
    from real_time_data_pipeline_spark.queries.analytics_ext import (
        q_value_correlation,
    )

    # All observations at one instant: interval rows exist (dt=0) but
    # there is no time to average over.
    rows = [("u", _ts(0), 1, 100), ("u", _ts(0), 2, 200), ("u", _ts(0), 3, 300)]
    df = spark.createDataFrame(rows, "u string, ts timestamp, seq int, v long")
    out = time_weighted_avg(df, ["u"], "ts", "seq", "v").collect()[0]
    assert out.span_us == 0 and out.twap_c is None

    # Constant daily series: zero variance, correlation undefined.
    ev = []
    for i, day in enumerate([1, 2, 3]):
        ts = dt.datetime(2024, 3, day, 12, 0)
        ev.append((2 * i, ts, 1, "flat", 50.0, "{}"))
        ev.append((2 * i + 1, ts, 1, "moving", 50.0 * (i + 1), "{}"))
    d = _write_events(spark, tmp_path, ev)
    out = q_value_correlation(spark, d).collect()
    assert len(out) == 1 and out[0].corr_bp is None

    # A start>end row is an empty interval: matches nothing, even
    # against an interval spanning its reversed bounds.
    bad = spark.createDataFrame([(1, 10, 5)], "id long, s long, e long")
    good = spark.createDataFrame([(2, 4, 11)], "id long, s long, e long")
    got = interval_overlap_join(
        bad, good, ("id", "s", "e"), ("id", "s", "e"), bucket_width=3
    ).collect()
    assert got == []


def test_wasserstein_single_bin_group_reports_zero(spark):
    """A group whose whole mass (both windows) sits in one bin must
    report w1_cents = 0 — not vanish from the report (zero drift and
    no data have to stay distinguishable)."""
    from real_time_data_pipeline_spark.operators.quality import (
        wasserstein_drift,
    )

    ref = spark.createDataFrame([("g", 100), ("g", 200)], "g string, cents long")
    cur = spark.createDataFrame([("g", 150)], "g string, cents long")
    out = wasserstein_drift(ref, cur, "g", "cents", bin_width_cents=1000)
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0].n_ref, rows[0].n_cur, rows[0].w1_cents) == (2, 1, 0)


@pytest.mark.slow
@settings(max_examples=10, deadline=None)
@given(
    deltas=st.lists(st.integers(-500, 500), min_size=1, max_size=20),
)
def test_skorokhod_reflection_equals_sequential_floor(spark, deltas):
    """The closed-form floored close C_n - min(0, min_j C_j) must equal
    the sequential max(0, s + delta) recursion it replaces... for the
    SINGLE-floor-at-the-end semantics the query documents — and the
    drawdown identity must match brute force."""
    import os

    rows = [
        (i + 1, dt.datetime(2024, 1, 1, 0, i), 1,
         "purchase" if d >= 0 else "error", abs(d) / 100.0, "{}")
        for i, d in enumerate(deltas)
    ]
    # closed-form expectations — through the SAME FLOOR(value*100)
    # cents projection the query applies (0.57*100 floors to 56: the
    # projection is deliberately IEEE-consistent, not round-trip-exact)
    import math

    eff = [
        (1 if d >= 0 else -1) * math.floor((abs(d) / 100.0) * 100)
        for d in deltas
    ]
    c, peak, min_c, max_dd = 0, -10**18, 0, 0
    for d in eff:
        c += d
        peak = max(peak, c)
        max_dd = max(max_dd, peak - c)
        min_c = min(min_c, c)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        from real_time_data_pipeline_spark.queries.analytics_ext import (
            q_user_balance_audit,
        )

        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(td, "events.parquet")
        )
        out = q_user_balance_audit(spark, td).collect()[0]
    assert out.closing_c == c
    assert out.max_drawdown_c == max_dd
    assert out.floored_closing_c == c - min(0, min_c)


def test_rolling_median_even_frame_exact_x2(spark):
    """Even-count frames interpolate (a+b)/2; the ×2 emission must be
    the exact integer a+b, including for odd cent sums where /2 is
    fractional."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 101), (2, 104), (3, 107), (4, 200)], "i int, v long"
    )
    w = Window.orderBy("i").rowsBetween(-1, 0)
    out = df.select(
        "i",
        F.round(F.expr("percentile(v, 0.5)").over(w) * 2)
        .cast("bigint")
        .alias("m2"),
    ).collect()
    assert [(r.i, r.m2) for r in sorted(out)] == [
        (1, 202), (2, 205), (3, 211), (4, 307),
    ]


def test_group_quartiles_x4_interpolation_exact(spark):
    """(n−1)·p fractional ranks {¼, ½, ¾} scale to exact BIGINT at ×4:
    4 values → p25 rank 0.75 → a + 0.75(b−a) → ×4 = 4a + 3(b−a)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(v,) for v in (100, 101, 105, 117)], "v long"
    )
    out = df.agg(
        F.round(F.expr("percentile(v, 0.25)") * 4).cast("bigint").alias("p25"),
        F.round(F.expr("percentile(v, 0.5)") * 4).cast("bigint").alias("p50"),
        F.round(F.expr("percentile(v, 0.75)") * 4).cast("bigint").alias("p75"),
    ).collect()[0]
    # ranks: p25 -> 0.75 between 100,101 = 100.75; p50 -> 1.5 between
    # 101,105 = 103; p75 -> 2.25 between 105,117 = 108
    assert (out.p25, out.p50, out.p75) == (403, 412, 432)


def test_error_recovery_pattern_exclusion(spark, tmp_path):
    """The exclusion clause is the point: an error followed by a purchase
    within 30 m is NOT recovered if another error lands inside the span;
    the purchase then recovers the SECOND error only."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        # user 1: error@0m, error@5m, purchase@10m -> first error excluded
        (1, t0, 1, "error", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=5), 1, "error", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=10), 1, "purchase", 1.0, "{}"),
        # user 2: error@0m, purchase@40m -> outside window, unrecovered
        (4, t0, 2, "error", 0.0, "{}"),
        (5, t0 + dt.timedelta(minutes=40), 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    from real_time_data_pipeline_spark.queries.analytics_ext import (
        q_error_recovery_pattern,
    )

    out = {r.user_id: r for r in q_error_recovery_pattern(spark, str(tmp_path)).collect()}
    assert out[1].n_errors == 2 and out[1].n_recovered == 1
    assert out[1].min_recovery_us == 5 * 60 * 1_000_000
    assert out[2].n_errors == 1 and out[2].n_recovered == 0
    assert out[2].min_recovery_us is None
