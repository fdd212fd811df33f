"""Change-data-capture compaction: collapse an insert/update/delete
changelog into the current snapshot (the MERGE INTO / upsert-apply shape
every warehouse ingestion pipeline runs, and the incremental-corpus
update step of a training-data pipeline: re-crawled documents supersede
old versions, takedowns delete them).

The reference's warehouse tier appends immutably (SURVEY.md §2.1 S9);
this is the companion compaction the reference's users run downstream.

Scale notes: latest-per-key is ONE hash aggregate (``max_by`` over the
sequence key) — partial aggregation runs map-side, the shuffle carries
one candidate row per (key, input partition), and no per-key sort or
window materializes a key's full history anywhere.  That is the shape
that survives a 100 TB changelog with hot keys; a
``row_number() OVER (PARTITION BY key)`` twin would funnel each key
through one task AND sort it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(
    log: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Current snapshot of a changelog: per key, the row with the highest
    ``seq_cols`` (lexicographic) wins; keys whose winner is a delete are
    dropped.  ``seq_cols`` must be a total order per key (include a
    unique tiebreak — equal sequence values make "latest" ambiguous).

    Output: key columns, every non-key payload column of the winning row
    (original names), plus ``n_changes`` (changelog depth per key — the
    compaction-planning signal).
    """
    payload = [c for c in log.columns if c not in key_cols]
    snap = log.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in seq_cols]),
        ).alias("_last"),
        F.count("*").cast("bigint").alias("n_changes"),
    )
    return snap.filter(F.col(f"_last.{op_col}") != delete_op).select(
        *key_cols,
        *[F.col(f"_last.{c}").alias(c) for c in payload],
        "n_changes",
    )


def apply_changelog(
    base: DataFrame,
    log: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Merge an increment into a previous snapshot: the base rows carry
    their original sequence values (a snapshot built by
    :func:`latest_snapshot` retains them), so one union + one
    latest-per-key pass applies inserts, updates, and deletes in a
    single shuffle.  Idempotent: re-applying the same log is a no-op.

    Columns must match between ``base`` and ``log`` (same names/types,
    including ``op_col``); the base's ``n_changes`` column, if present,
    is dropped before the union and recomputed across base + increment.
    """
    b = base.drop("n_changes")
    if set(b.columns) != set(log.columns):
        raise ValueError(
            f"base/log column mismatch: {sorted(b.columns)} vs {sorted(log.columns)}"
        )
    return latest_snapshot(
        b.select(*log.columns).unionAll(log),
        key_cols,
        seq_cols,
        op_col,
        delete_op,
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Dataset-version diff: classify every key across two snapshots as
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (in both, any ``compare_cols`` differs — null-safe), or
    ``unchanged``.  The audit step between two corpus releases: what did
    the re-crawl / takedown pass actually change?

    One full-outer sort-merge join co-partitioned on the key — both
    sides shuffle once on ``key_cols`` and nothing else moves.  The
    null-safe compare uses ``<=>`` so NULL→value and value→NULL count
    as changes, matching SQL ``IS DISTINCT FROM``.

    Output: key columns, ``change_type``, and the old/new value of each
    compare column (``<col>_old`` / ``<col>_new``).
    """
    o = old.select(
        *[F.col(c).alias(f"_ko_{c}") for c in key_cols],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
    )
    n = new.select(
        *[F.col(c).alias(f"_kn_{c}") for c in key_cols],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_ko_{c}") == F.col(f"_kn_{c}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"_ko_{key_cols[0]}").isNotNull()
    in_new = F.col(f"_kn_{key_cols[0]}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        same = eq if same is None else same & eq
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"_kn_{c}"), F.col(f"_ko_{c}")).alias(c)
            for c in key_cols
        ],
        change.alias("change_type"),
        *[F.col(f"{c}_old") for c in compare_cols],
        *[F.col(f"{c}_new") for c in compare_cols],
    )


def latest_state(
    log: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    weight_col: str | None = None,
) -> DataFrame:
    """Mergeable CDC state: per key, the winning row by ``seq_cols``
    PLUS the accumulated changelog depth — and, unlike
    :func:`latest_snapshot`, delete winners are KEPT (a later update can
    resurrect a key, so dropping deletes loses merge information; filter
    ``op != 'D'`` only at the presentation edge).

    ``weight_col`` makes the summary re-mergeable: when the input rows
    are themselves state rows, pass their ``n_changes`` so depths add
    instead of resetting to row counts.  ``latest_state`` over any
    partition of the log, merged by :func:`merge_snapshot_state`, equals
    ``latest_state`` over the whole log — the associativity the
    streaming maintainer and its full-recompute oracle both rely on.
    """
    payload = [
        c for c in log.columns if c not in key_cols and c != weight_col
    ]
    w = F.col(weight_col) if weight_col else F.lit(1)
    summary = log.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in seq_cols]),
        ).alias("_last"),
        F.sum(w).cast("bigint").alias("n_changes"),
    )
    return summary.select(
        *key_cols,
        *[F.col(f"_last.{c}").alias(c) for c in payload],
        "n_changes",
    )


def merge_snapshot_state(
    state: DataFrame,
    increment_state: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
) -> DataFrame:
    """Fold one :func:`latest_state` summary into another: union the two
    state tables and re-reduce, weighting each row by its accumulated
    ``n_changes``.  One shuffle on the key; both inputs are already one
    row per key, so the shuffle volume is |keys|, independent of how
    much history each summary has absorbed — the steady-state cost a
    100 TB changelog maintainer needs.
    """
    cols = state.columns
    if set(cols) != set(increment_state.columns):
        raise ValueError(
            f"state column mismatch: {sorted(cols)} vs "
            f"{sorted(increment_state.columns)}"
        )
    unioned = state.select(*cols).unionAll(increment_state.select(*cols))
    return latest_state(unioned, key_cols, seq_cols, weight_col="n_changes")
