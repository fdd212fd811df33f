"""Tracked persist() — unpersist discipline for operator intermediates.

Several operators persist an intermediate that is consumed by more than
one downstream leg of the SAME returned plan (e.g. the exploded shingle
table feeding both sides of a pair join).  Because the result DataFrame
is lazy, the operator itself cannot ``unpersist`` in a ``finally`` —
the cache must outlive the call and die only after the CALLER has
evaluated the result.  Historically that was left to
``spark.catalog.clearCache()``, which works for a bench harness but
leaks cached blocks in a long-lived production session (and nukes any
caching the application itself set up).

This module is the explicit handle: operators route persists through
:func:`track`, and whoever evaluates the returned DataFrame calls
:func:`release_all` when done (bench.py and tools/parity.py do, after
every query).  ``release_all`` unpersists ONLY operator-tracked frames,
never the application's own caches.

Thread-safety: tracking appends under a lock; ``release_all`` swaps the
list atomically, so concurrent query runners release only what was
tracked before their call.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def track(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() the frame and register it for a later release_all()."""
    if storage_level is not None:
        df.persist(storage_level)
    else:
        df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    with _LOCK:
        frames, _TRACKED[:] = list(_TRACKED), []
    n = 0
    for df in frames:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


def n_tracked() -> int:
    with _LOCK:
        return len(_TRACKED)
