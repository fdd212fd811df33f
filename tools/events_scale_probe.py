"""Events-side 10× scale probe — the analytics-tier companion of
``tools/sf1_probe.py`` (which scales documents/embeddings): replicate
the sf0.1 events table 10× with a user-id offset per replica, run the
round-5 analytics/extension queries end-to-end at both scales, and
report the wall-time ratio.

Replication by user offset preserves the per-user structure (session
lengths, inter-event gaps, value distributions) while multiplying the
user population — exactly how an event corpus actually grows — so:

* per-user windows (TWAP, sessions) get 10× more keys, same depth;
* per-type daily aggregates (OHLC, CUSUM, correlation, W1 drift) get
  10× the rows per group;
* the banded session-overlap join gets ~100× candidate pressure in
  every time bucket (users overlap across replicas) — the one probe
  here whose OUTPUT grows quadratically by construction, reported but
  not held to the linear band (the operator's work is proportional to
  its output).

Timestamps are NOT shifted: event-time density is the scale axis a
single cluster actually experiences (more concurrent users), and
shifting replicas in time would leave every time bucket at sf0.1
density, measuring nothing.

Usage: python tools/events_scale_probe.py [--queries q1 q2 ...]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from real_time_data_pipeline_spark.operators import cache  # noqa: E402
from real_time_data_pipeline_spark.schemas import load_table  # noqa: E402
from real_time_data_pipeline_spark.session import get_spark  # noqa: E402

FACTOR = 10
USER_OFFSET = 1_000_000  # replica i's users live at [i*OFFSET, ...)
DEFAULT_QUERIES = [
    "ohlc_bars",
    "time_weighted_avg",
    "cusum_shift",
    "value_correlation",
    "wasserstein_drift",
    "cdc_apply_incremental",
    "stream_cdc_apply",  # r6 (VERDICT r5 #7): streaming upsert at 10x events
    "session_overlap",
    # r6 statistics tier (events-grain)
    "user_type_diversity",
    "interval_merge",
    # r6 late additions: zero-clamped ledger recurrence (per-user
    # windows: 10x keys, same depth) and FIFO lot matching (per-key
    # prefix sums + overlap join)
    "clamped_balance",
    "fifo_attribution",
]
# Output itself grows superlinearly by construction (cross-replica
# session pairs): ratio reported, not held to the band.
QUADRATIC_OK = {"session_overlap"}
LINEAR_BAND = 14.0  # ≤ ~12x wall at 10x rows, plus container noise


def build_scaled(spark, sf_dir: str, out_dir: str) -> str:
    dst = f"{out_dir}/events10x"
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    parts = [ev]
    for i in range(1, FACTOR):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * n_events)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * USER_OFFSET)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    scaled.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/events.parquet"
    )
    _link_missing_tables(sf_dir, dst)
    return dst


def _link_missing_tables(sf_dir: str, dst: str) -> None:
    """Symlink every source table the builder did not scale into the
    probe dir, so ANY registry query runs against it (the scaled axis
    is whatever the builder rewrote; everything else keeps its sf0.1
    size — which is the honest shape of a probe that scales one
    table)."""
    import os

    for entry in os.listdir(sf_dir):
        if not entry.endswith(".parquet"):
            continue
        target = os.path.join(dst, entry)
        if not os.path.exists(target):
            os.symlink(os.path.join(sf_dir, entry), target)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", nargs="+", default=DEFAULT_QUERIES)
    ap.add_argument("--keep-dir", default=None)
    ap.add_argument(
        "--orders",
        action="store_true",
        help="probe the orders-grain queries on 10x orders/customers",
    )
    args = ap.parse_args()
    if args.orders and args.queries == DEFAULT_QUERIES:
        args.queries = ORDERS_QUERIES

    import __spark_entry__ as entrymod

    spark = get_spark("events_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out_dir = args.keep_dir or tempfile.mkdtemp(prefix="events_probe_")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    def timed(fn):
        cache.release_all()
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn()
        return time.monotonic() - t0

    failures = 0
    try:
        scaled_dir = (
            build_scaled_orders(spark, args.sf_dir, out_dir)
            if args.orders
            else build_scaled(spark, args.sf_dir, out_dir)
        )
        try:  # warm codegen/worker pools off the billed clock
            force(qs["ohlc_bars"](spark, "/root/testdata/sf0.001"))
        except Exception as e:  # noqa: BLE001
            print(f"# warmup skipped: {e}", file=sys.stderr)

        for name in args.queries:
            fn = qs[name]
            w01 = timed(lambda: force(fn(spark, args.sf_dir)))
            w10 = timed(lambda: force(fn(spark, scaled_dir)))
            ratio = w10 / w01
            verdict = (
                "quadratic-by-construction"
                if name in QUADRATIC_OK
                else ("near-linear" if ratio <= LINEAR_BAND else "SUPERLINEAR")
            )
            if verdict == "SUPERLINEAR":
                failures += 1
            print(
                json.dumps(
                    {
                        "query": name,
                        "sf0.1_s": round(w01, 2),
                        "10x_s": round(w10, 2),
                        "ratio_at_10x_rows": round(ratio, 2),
                        "verdict": verdict,
                    }
                )
            )
    finally:
        if not args.keep_dir:
            shutil.rmtree(out_dir, ignore_errors=True)
    return 1 if failures else 0




# ---- orders-side extension (python tools/events_scale_probe.py --orders)
#
# Replicates orders (and customer, which the geo rollup joins) 10x by
# key offset, preserving per-customer structure, and probes the
# orders-grain extension queries.  lineitem-dependent queries
# (triangle_count) are excluded: replicating lineitem multiplies the
# co-supply graph's density, not its size — the graph-model scaling
# axis is nation count, not row count.

ORDERS_QUERIES = [
    "cube_order_stats",
    "rollup_geo_revenue",
    "order_rank_profile",
    "revenue_concentration",
    "benford_audit",
    # r6 (VERDICT r5 #7): streaming Δ-join view maintenance at 10x orders
    "stream_join_view_incremental",
    # r6 statistics tier (orders/lineitem-grain)
    "winsorized_price_stats",
    "order_skyline",
    "itemset_lift",
    "order_proration",
    "weighted_median_price",
    # r6 late additions (orders-grain; distinct-value-grain prefix sums
    # and domain-grain contingency/mode aggregates)
    "rank_sum_test",
    "ks_price_drift",
    "priority_status_chi2",
    "segment_mode",
    # bucketed layout write+join cycle at 10x orders/customers
    "bucketed_revenue_join",
]
ORDER_OFFSET = 100_000_000


def build_scaled_orders(spark, sf_dir: str, out_dir: str) -> str:
    dst = f"{out_dir}/orders10x"
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n_cust_off = 10_000_000
    o_parts, c_parts = [orders], [cust]
    for i in range(1, FACTOR):
        o_parts.append(
            orders.select(
                (F.col("o_orderkey") + F.lit(i * ORDER_OFFSET)).alias(
                    "o_orderkey"
                ),
                (F.col("o_custkey") + F.lit(i * n_cust_off)).alias(
                    "o_custkey"
                ),
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
        )
        c_parts.append(
            cust.select(
                (F.col("c_custkey") + F.lit(i * n_cust_off)).alias(
                    "c_custkey"
                ),
                *[c for c in cust.columns if c != "c_custkey"],
            )
        )
    o_scaled = o_parts[0]
    for p in o_parts[1:]:
        o_scaled = o_scaled.unionByName(p)
    c_scaled = c_parts[0]
    for p in c_parts[1:]:
        c_scaled = c_scaled.unionByName(p)
    o_scaled.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/orders.parquet"
    )
    c_scaled.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/customer.parquet"
    )
    # r6: replicate lineitem with the SAME order-key offset (same
    # baskets, 10x of them; parts unscaled) so the basket-join tier
    # (itemset_lift) probes under linearly-grown pair pressure — the
    # honest growth mode for an order stream (more orders, same catalog).
    li = load_table(spark, sf_dir, "lineitem")
    li_parts = [li]
    for i in range(1, FACTOR):
        li_parts.append(
            li.select(
                (F.col("l_orderkey") + F.lit(i * ORDER_OFFSET)).alias(
                    "l_orderkey"
                ),
                *[c for c in li.columns if c != "l_orderkey"],
            )
        )
    li_scaled = li_parts[0]
    for p in li_parts[1:]:
        li_scaled = li_scaled.unionByName(p)
    li_scaled.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/lineitem.parquet"
    )
    _link_missing_tables(sf_dir, dst)
    return dst


if __name__ == "__main__":
    raise SystemExit(main())
