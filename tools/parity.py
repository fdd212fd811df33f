"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet directory, then
compares row count, sorted-by-name schema, and an order-insensitive value
hash.  Usage:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from real_time_data_pipeline_spark.operators import cache  # noqa: E402
from real_time_data_pipeline_spark.schemas import TESTDATA_TABLES  # noqa: E402
from real_time_data_pipeline_spark.session import get_spark  # noqa: E402


_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
_INT_DUCK = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def canon_spark_type(simple: str) -> str:
    """Collapse a Spark ``simpleString`` type to a cross-engine class.

    The driver's hash is type-aware: DuckDB ``SUM(int)`` yields HUGEINT
    (int128) which is NOT the same class as Spark's BIGINT, so the classes
    here must keep hugeint distinct while collapsing widths that both
    engines agree on (all <=64-bit ints are one class, floats are one
    class, timestamp tz/unit variants are one class).
    """
    s = simple.strip()
    if s.startswith("array<") and s.endswith(">"):
        return f"list<{canon_spark_type(s[6:-1])}>"
    if s in _INT_SPARK:
        return "int"
    if s in ("double", "float"):
        return "float"
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "boolean":
        return "bool"
    return s


def canon_duck_type(name: str) -> str:
    s = str(name).strip()
    if s.endswith("[]"):
        return f"list<{canon_duck_type(s[:-2])}>"
    u = s.upper()
    if u in _INT_DUCK:
        return "int"
    if u == "HUGEINT":
        return "hugeint"
    if u in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    if u in ("VARCHAR", "TEXT"):
        return "string"
    if u == "BOOLEAN":
        return "bool"
    if u == "BLOB":
        return "binary"
    return s.lower()


class ContainerCellError(TypeError):
    """An oracle-checked query exposed a top-level container column.

    The driver canonicalizes results via pandas ``sort_values``, which
    raises ``unhashable type`` on list/dict cells — such a query ERRORs
    red in CORRECTNESS regardless of value correctness.  Round 1 diverged
    from the driver on type classes, round 2 on containers (this function
    used to stringify them); raising here keeps local green ⇒ driver
    green."""


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, dict, set)):
        raise ContainerCellError(
            f"container-typed cell {type(v).__name__} — the driver's pandas"
            " canonicalizer cannot hash this; flatten the column"
            " (scalar per quantile, array_join, or explode)"
        )
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int], canon_types: list[str]) -> str:
    """Order-insensitive hash over (canonical dtypes, values).

    The dtype signature is hashed first so a value-identical result with a
    different type class (e.g. DuckDB HUGEINT vs Spark BIGINT) fails, the
    same way the driver's type-aware hash does.
    """
    h = hashlib.sha256()
    h.update("|".join(canon_types[i] for i in col_order).encode())
    h.update(b"\n--\n")
    lines = sorted(
        "|".join(_norm_cell(row[i]) for i in col_order) for row in rows
    )
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        cache.release_all()  # drop operator-tracked persists
        spark.catalog.clearCache()  # backstop for untracked caching
        scols = [f.name.lower() for f in sdf.schema.fields]
        stypes = [canon_spark_type(f.dataType.simpleString()) for f in sdf.schema.fields]
        sorder = sorted(range(len(scols)), key=lambda i: scols[i])
        if name not in oracles:
            # rows-only queries never reach the driver's hash, so container
            # columns are legal there (ann_* return neighbor arrays).
            print(f"{name:35s} rows={len(srows):7d}  (rows-only, no oracle)")
            continue
        try:
            shash = value_hash([tuple(r) for r in srows], sorder, stypes)
        except ContainerCellError as e:
            failures += 1
            print(f"{name:35s} FAIL  driver-unhashable: {e}")
            continue
        ddf = con.sql(oracles[name])
        dtypes = [canon_duck_type(t) for t in ddf.types]
        drows = ddf.fetchall()
        dcols = [c.lower() for c in ddf.columns]
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        try:
            dhash = value_hash(drows, dorder, dtypes)
        except ContainerCellError as e:
            failures += 1
            print(f"{name:35s} FAIL  oracle driver-unhashable: {e}")
            continue
        ok_rows = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        ok_hash = shash == dhash
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        schema_desc = "ok" if ok_schema else f"{sorted(scols)} vs {sorted(dcols)}"
        if ok_schema and not ok_hash:
            st = [stypes[i] for i in sorder]
            dt = [dtypes[i] for i in dorder]
            if st != dt:
                schema_desc = f"dtypes {st} vs {dt}"
        print(
            f"{name:35s} {status}  rows {len(srows)}/{len(drows)}"
            f"  schema={schema_desc}  hash {shash}/{dhash}"
        )
        if status == "FAIL" and not ok_hash and ok_rows and ok_schema:
            # show a few mismatching lines to debug
            sset = sorted("|".join(_norm_cell(tuple(r)[i]) for i in sorder) for r in srows)
            dset = sorted("|".join(_norm_cell(r[i]) for i in dorder) for r in drows)
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            for a, b in diff:
                print(f"    spark: {a}\n    duck : {b}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
