"""Cost-based-optimizer statistics (SURVEY.md §8 gap "richer CBO stats").

BigQuery maintains table/column statistics automatically; on Spark the
equivalent lever is ``ANALYZE TABLE`` into the catalog plus
``spark.sql.cbo.enabled``. These helpers wrap the DDL and expose the
stats Catalyst will actually use (verified by tests/test_cbo_stats.py:
the optimized plan's row-count estimate follows the analyzed counts).

At 100 TB this is not optional: join reordering and broadcast selection
without row counts fall back to file-size heuristics, which over- or
under-broadcast by orders of magnitude on compressed columnar data.
Run ``analyze`` after large loads (it is one extra scan) and re-run when
a table changes materially.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def analyze(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """ANALYZE TABLE [FOR COLUMNS ...]: collect table row count/size and,
    when columns are given, per-column NDV/null-count/min/max histograms
    into the catalog."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def catalog_stats(spark: SparkSession, table: str) -> dict[str, int]:
    """Table-level stats as recorded in the catalog (bytes, rows)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    out: dict[str, int] = {}
    for r in rows:
        if r.col_name == "Statistics":
            # e.g. "12345 bytes, 6000 rows"
            for part in r.data_type.split(","):
                num, unit = part.strip().split(" ")[:2]
                out[unit] = int(num)
    return out


def column_stats(spark: SparkSession, table: str, column: str) -> dict[str, str]:
    """Column-level stats (distinct_count, num_nulls, min, max, ...)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table} {column}").collect()
    return {r.info_name: r.info_value for r in rows}


def plan_row_estimate(df) -> int | None:
    """Catalyst's row-count estimate for a DataFrame's optimized plan —
    what CBO join reordering and broadcast selection actually consume."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    opt = stats.rowCount()
    return int(opt.get()) if opt.isDefined() else None
