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
:func:`track`, and whoever evaluates the returned DataFrame releases
when done.  Two release modes:

* :func:`scoped` — a context manager giving PER-CALLER isolation.  While
  a scope is active on a thread, every frame tracked FROM THAT THREAD
  lands in the scope, and exiting the scope unpersists exactly those
  frames.  Concurrent query runners each open their own scope and can
  never release each other's in-use intermediates.  This is the correct
  tool for multi-threaded drivers.
* :func:`release_all` — unpersists EVERY globally tracked frame (those
  tracked outside any scope).  It never touches the application's own
  caches, but it is GLOBAL across threads: calling it while another
  thread's un-scoped query is still executing releases that query's
  intermediates too (a recompute hazard, not a correctness one —
  unpersist only drops cached blocks).  Single-threaded harnesses
  (bench.py, tools/parity.py) call it after every query; concurrent
  runners should use :func:`scoped` instead.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []
_LOCAL = threading.local()


def track(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() the frame and register it for a later release.

    If the calling thread has an active :func:`scoped` context, the
    frame is registered with that scope (released on scope exit);
    otherwise it lands in the global list released by
    :func:`release_all`."""
    if storage_level is not None:
        df.persist(storage_level)
    else:
        df.persist()
    stack = getattr(_LOCAL, "scopes", None)
    if stack:
        stack[-1].append(df)
    else:
        with _LOCK:
            _TRACKED.append(df)
    return df


@contextmanager
def scoped():
    """Per-caller release scope: frames tracked by THIS thread while the
    context is active are unpersisted on exit — isolation for concurrent
    query runners that release_all() cannot give.  Scopes nest (inner
    scope captures, releases first).  Yields the scope's frame list so
    callers can assert on it in tests."""
    stack = getattr(_LOCAL, "scopes", None)
    if stack is None:
        stack = _LOCAL.scopes = []
    frames: list[DataFrame] = []
    stack.append(frames)
    try:
        yield frames
    finally:
        stack.pop()
        for df in frames:
            try:
                df.unpersist()
            except Exception:  # session already stopped — nothing to free
                pass


def release_all() -> int:
    """Unpersist every GLOBALLY tracked frame (see module docstring for
    the multi-threaded caveat); returns how many were released.  Frames
    inside an active :func:`scoped` context are not touched."""
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


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the block-store blocks pinned by a ``localCheckpoint()``ed
    frame.

    ``DataFrame.unpersist()`` only consults the SQL cache manager, so
    the MEMORY_AND_DISK blocks a local checkpoint pins stay resident
    until the ContextCleaner happens to GC the underlying RDD — in an
    iterative loop (BPE merge rounds, CC/PageRank fixpoints) that is an
    unbounded accumulation of dead blocks.  This digs the checkpointed
    RDD out of the ``LogicalRDD`` plan node and unpersists it directly.

    Safe no-op for reliable ``checkpoint()`` frames (their LogicalRDD
    is backed by files, the RDD is simply not persisted) and for
    non-checkpoint plans (not a LogicalRDD).  The frame must NOT be
    used again: a local checkpoint's lineage is truncated, so once its
    blocks are dropped it cannot be recomputed.  Returns True when a
    LogicalRDD was found and unpersisted.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
            return True
    except Exception:
        pass
    return False
