"""Shared helpers for oracle-parity (SURVEY.md §5.3 pitfalls).

Float aggregation is order-dependent: Spark and DuckDB sum partitions in
different orders, so ``sum(double)`` drifts in the last bits and can cross
a rounding boundary. The fix used everywhere: cast the operand to an exact
DECIMAL before aggregating (both engines do exact decimal arithmetic),
cast the exact result back to DOUBLE. Same trick spelled in the oracle SQL
(``dsum_sql``). Averages are derived as double(sum_dec)/count — a single
deterministic division.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Precision/scale chosen so products of two money columns stay inside
# DECIMAL(38): 18+18 = 36 digits, scale 6+6 = 12.
MONEY = "decimal(18,6)"


def dec(col: str | Column) -> Column:
    """Exact-decimal view of a double column (for order-independent sums)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent sum of a double column, returned as DOUBLE."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Order-independent average: double(exact sum) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def dec_sql(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,6))"


def dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
