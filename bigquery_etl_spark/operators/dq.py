"""Data-quality checks (BigQuery ``ASSERT`` statement analogue, plus
the expectation-suite idiom every production ETL grows).

The reference's only validation is its BigQuery load-job schema check
(main.py:169-177 — malformed rows fail the load); these operators give
the Spark engine the same gate and more, as declarative DataFrame
aggregates. Every check compiles into ONE aggregate over the table —
checks share the scan, nothing is collected per-row, and the result is
a single summary row, so a 100 TB table costs one pass regardless of
how many expectations are attached.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One-row report: for each named check (a boolean Column that
    should hold for every row), the count of violating rows. All checks
    evaluate in a single shared-scan aggregate."""
    aggs = [
        F.sum(F.when(~cond | cond.isNull(), 1).otherwise(0)).alias(name)
        for name, cond in checks.items()
    ]
    return df.agg(*aggs)


def assert_that(df: DataFrame, cond: Column, message: str) -> None:
    """BigQuery ``ASSERT <cond> AS '<message>'``: raise if any row
    violates ``cond``. One aggregate job; no rows collected."""
    n_bad = df.filter(~cond | cond.isNull()).limit(1).count()
    if n_bad:
        raise AssertionError(f"ASSERT failed: {message}")


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once (uniqueness expectation's
    witnesses): one hash aggregate on the key."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def orphan_rows(child: DataFrame, parent: DataFrame, on: list[tuple[str, str]]) -> DataFrame:
    """Referential-integrity violations: child rows with no parent
    (left anti join — the parent side carries only its key columns, so
    the probe is column-pruned and broadcastable when small)."""
    cond = None
    parent_keys = parent.select(*[p for _, p in on]).dropDuplicates()
    for c, p in on:
        clause = child[c] == parent_keys[p]
        cond = clause if cond is None else cond & clause
    return child.join(parent_keys, cond, "left_anti")
