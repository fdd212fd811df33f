"""Stateful streaming operators (SURVEY.md §2.9 N1/N5/N6).

- ``stream_dedup``: exact dedup with watermark-bounded state
  (``dropDuplicatesWithinWatermark``) — the streaming twin of
  operators/dedup.exact_dedup; state is GC'd once the watermark passes,
  which is what makes it viable on an unbounded stream.
- ``sessionize``: session-window aggregate (built-in stateful merge).
- ``running_totals``: custom per-key state via ``applyInPandasWithState``
  — cumulative count/sum per account across micro-batches, the pattern
  for any custom stateful operator Spark lacks natively.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from real_time_data_pipeline_spark.operators.aggregates import session_agg


def stream_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_time",
    watermark: str = "30 minutes",
) -> DataFrame:
    """N1 streaming: drop duplicate keys arriving within the watermark.
    State per key is dropped once event time moves past the watermark —
    bounded memory on an unbounded stream."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def sessionize(
    df: DataFrame,
    ts_col: str = "event_time",
    key_col: str = "account_id",
    value_col: str = "amount",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """N5: watermarked session windows (stateful session merge)."""
    return session_agg(
        df, ts_col=ts_col, key_col=key_col, value_col=value_col, gap=gap, watermark=watermark
    )


RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("account_id", T.StringType()),
        T.StructField("n_txns", T.LongType()),
        T.StructField("total_amount", T.DoubleType()),
    ]
)

RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n_txns", T.LongType()),
        T.StructField("total_amount", T.DoubleType()),
    ]
)


def _running_totals_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch's rows into (count, sum) state and emit the
    updated running totals for the key."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["amount"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"account_id": [key[0]], "n_txns": [n], "total_amount": [total]}
    )


def running_totals(df: DataFrame, key_col: str = "account_id") -> DataFrame:
    """N6: arbitrary per-key state — cumulative count/sum per account.

    ``applyInPandasWithState`` feeds each key's micro-batch rows as Arrow
    batches to ``_running_totals_fn``; state lives in the state store
    (checkpointed, recoverable).  Output mode must be ``update``."""
    return df.groupBy(key_col).applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws(df: DataFrame, key_col: str = "account_id") -> DataFrame:
    """N6 on the Spark 4.x ``transformWithStateInPandas`` API — the
    successor to ``applyInPandasWithState`` with named state variables,
    TTL, and timers.  Same semantics as :func:`running_totals` (the test
    asserts both APIs produce identical totals) so users can migrate
    between the two stateful surfaces without behavior change.

    State here is one ``ValueState`` named ``totals``; at scale the state
    store shards by the grouping key exactly as the old API, but schema
    evolution and per-state TTLs are first-class.

    Requirements: the session must run the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider``)
    and the Python side needs ``google.protobuf`` for the state-server
    protocol (absent in this container — the integration test skips,
    mirroring the decode_image_real env-constraint policy; the legacy-API
    twin above is fully tested)."""
    from pyspark.sql.streaming import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState(
                "totals", "n_txns LONG, total_amount DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterable[pd.DataFrame]:
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["amount"].fillna(0.0).sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"account_id": [key[0]], "n_txns": [n], "total_amount": [total]}
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="update",
        timeMode="none",
    )


CLAMPED_BALANCE_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("final_balance_c", T.LongType()),
        T.StructField("peak_balance_c", T.LongType()),
        T.StructField("n_clamps", T.LongType()),
        T.StructField("min_cum_c", T.LongType()),
    ]
)

# (n_events, balance, peak, n_clamps, cum, min_cum, last_us, last_id):
# last_us/last_id pin the in-order-delivery guard — a batch whose first
# row is not strictly after the previously folded row fails LOUDLY
# instead of silently corrupting the sequential recurrence.
CLAMPED_BALANCE_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("balance", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("n_clamps", T.LongType()),
        T.StructField("cum", T.LongType()),
        T.StructField("min_cum", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("last_id", T.LongType()),
    ]
)

_ORDER_SENTINEL = -(2**62)


def _clamped_balance_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold time-ordered micro-batches of (us, event_id, delta_c) into
    the zero-clamped balance recurrence b = max(0, b + delta).

    Vectorized via the same closed form the batch operator uses
    (operators/statistics.clamped_running_balance): prepend the carried
    balance as a virtual first delta (b0 >= 0, so folding [b0, d1..dn]
    from 0 equals folding [d1..dn] from b0), then balance = cum minus
    its negative running floor over the virtual series — numpy cumsum +
    running min per Arrow batch, no per-row Python.

    The recurrence is ORDER-SENSITIVE: callers must deliver batches in
    (us, event_id) order per key (stage time-range-partitioned files).
    The state carries the last folded (us, event_id) and any
    out-of-order batch raises — loud failure, never silent corruption.
    """
    import numpy as np

    if state.exists:
        n, bal, peak, clamps, cum0, min_cum, last_us, last_id = state.get
    else:
        n, bal, peak, clamps, cum0, min_cum = 0, 0, 0, 0, 0, 0
        last_us, last_id = _ORDER_SENTINEL, _ORDER_SENTINEL

    pdf = pd.concat(list(batches), ignore_index=True)
    if len(pdf):
        pdf = pdf.sort_values(["us", "event_id"], ignore_index=True)
        first = (int(pdf["us"].iloc[0]), int(pdf["event_id"].iloc[0]))
        if first <= (last_us, last_id):
            raise ValueError(
                f"clamped_balance: out-of-order delivery for key {key}: "
                f"batch starts at {first}, state already folded "
                f"{(last_us, last_id)} — stage time-ordered files"
            )
        d = pdf["delta_c"].to_numpy(dtype="int64")
        # virtual series: carried balance, then this batch's deltas
        v = np.concatenate(([bal], d))
        vcum = np.cumsum(v)
        vfloor = np.minimum(np.minimum.accumulate(vcum), 0)
        vbal = vcum - vfloor
        # clamp events: vcum strictly below the PREVIOUS floor
        prev_floor = np.concatenate(([0], vfloor[:-1]))
        new_clamps = int((vcum[1:] < prev_floor[1:]).sum())
        # raw global cumulative (no clamp) rides the carried cum
        raw_cum = cum0 + np.cumsum(d)
        clamps += new_clamps
        peak = max(peak, int(vbal[1:].max()))
        bal = int(vbal[-1])
        # min_cum is the RAW cumulative minimum (can be positive — the
        # batch operator emits min(cum), not min(0, cum)): seed it from
        # the first folded batch, don't anchor it at 0.
        min_cum = (
            int(raw_cum.min())
            if n == 0
            else min(min_cum, int(raw_cum.min()))
        )
        n += len(d)
        cum0 = int(raw_cum[-1])
        last_us = int(pdf["us"].iloc[-1])
        last_id = int(pdf["event_id"].iloc[-1])

    state.update((n, bal, peak, clamps, cum0, min_cum, last_us, last_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "final_balance_c": [bal],
            "peak_balance_c": [peak],
            "n_clamps": [clamps],
            "min_cum_c": [min_cum],
        }
    )


def clamped_balance_stateful(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming twin of operators/statistics.clamped_running_balance:
    per-key zero-clamped running balance as applyInPandasWithState —
    the custom-stateful-operator shape (SURVEY.md §2.9 N6) for a
    recurrence Spark's built-in streaming aggregates cannot express
    (the clamp makes it non-associative, so it is genuinely per-key
    sequential state, not a mergeable partial).  Input must carry
    (key, us, event_id, delta_c) and arrive time-ordered per key."""
    return df.groupBy(key_col).applyInPandasWithState(
        _clamped_balance_fn,
        outputStructType=CLAMPED_BALANCE_OUTPUT,
        stateStructType=CLAMPED_BALANCE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
