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
