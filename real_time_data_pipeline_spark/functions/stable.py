"""Cross-engine-deterministic aggregate expressions.

Floating-point SUM/AVG are order-dependent: Spark's partial+final
aggregation tree and DuckDB's single-node sum can differ in the last bits,
which then flips `round(x, 2)` at `.xx5` boundaries.  For oracle-checkable
query outputs we therefore do money math in integer cents:

  cents    = CAST(ROUND(v * 100) AS BIGINT)       -- exact for 2-dec data
  sum      = SUM(cents) / 100.0                   -- exact int / exact 100
  avg(2dp) = FLOOR((2*SUM(cents) + CNT) / (2*CNT)) / 100.0
             -- round-half-up toward +inf, pure int/double ops that are
             -- IEEE-identical across engines (all ints < 2^53)

Every helper returns a Spark Column built from a SQL string so the SAME
text can be embedded in the DuckDB oracle — one source of truth.

This costs nothing at scale: the cast happens before the partial
aggregate, the shuffle still carries one bigint per group per partition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents_sql(value_expr: str) -> str:
    return f"CAST(ROUND(({value_expr}) * 100) AS BIGINT)"


def sum_money_sql(value_expr: str) -> str:
    """Exact 2-decimal SUM, emitted as DOUBLE.

    `1e2` (not `100.0`) because Spark parses `100.0` as DECIMAL, which
    would make the result DECIMAL; `1e2` is DOUBLE in both engines.
    """
    return f"SUM({cents_sql(value_expr)}) / 1e2"


def avg_money_sql(value_expr: str, count_expr: str = "COUNT(*)") -> str:
    """AVG rounded half-up to 2 decimals via integer arithmetic, as DOUBLE."""
    s = f"SUM({cents_sql(value_expr)})"
    c = f"({count_expr})"
    return f"CAST(FLOOR((2e0 * {s} + {c}) / (2e0 * {c})) AS BIGINT) / 1e2"


def sum_money(value_expr: str, alias: str) -> Column:
    return F.expr(sum_money_sql(value_expr)).alias(alias)


def avg_money(value_expr: str, alias: str, count_expr: str = "COUNT(*)") -> Column:
    return F.expr(avg_money_sql(value_expr, count_expr)).alias(alias)


def round2(col_expr: str, alias: str) -> Column:
    """Round a non-aggregated 2-ish-decimal double deterministically."""
    return F.expr(f"{cents_sql(col_expr)} / 1e2").alias(alias)


def round2_sql(col_expr: str) -> str:
    return f"{cents_sql(col_expr)} / 1e2"
