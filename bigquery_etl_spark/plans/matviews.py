"""Materialized-view declared queries (r6): CDF-maintained aggregate
state served through BigQuery-style smart rewrite.

Reference parity: the reference's users run their aggregates in
BigQuery (main.py:160-185 delegates everything analytic), where
materialized views + automatic rewrite are the standard answer to
"this dashboard aggregate re-scans the fact table every tick". Here the
view state lives in a VersionedTable, every DML commit folds its change
batch in (O(batch + touched groups)), and the final aggregate below is
answered from |groups| state rows — the oracle recomputes the same
answer relationally from scratch, so parity proves maintained ≡
recomputed through an insert + update + delete history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.plans._util import dec, scratch_build
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

_MV_CATS: dict = {}

_CREATE_SALES = (
    "CREATE MATERIALIZED VIEW mvq_sales AS "
    "SELECT o_orderstatus, o_orderpriority, SUM(price) AS sum_price, "
    "COUNT(*) AS n_orders, AVG(price) AS avg_price "
    "FROM mvq_base GROUP BY o_orderstatus, o_orderpriority"
)
_CREATE_EXTREMA = (
    "CREATE MATERIALIZED VIEW mvq_extrema AS "
    "SELECT o_orderstatus, MIN(price) AS min_price, "
    "MAX(price) AS max_price FROM mvq_base GROUP BY o_orderstatus"
)


def _mv_catalog(spark: SparkSession, sf_dir: str):
    """Process-cached: an orders-derived lake table with TWO
    materialized views (additive sum/count/avg by status+priority;
    min/max by status) declared BEFORE a 3-statement DML history
    (INSERT, UPDATE, DELETE) — so the state both queries serve from was
    maintained off the change feed (signed fold for the additive view,
    touched-group recompute for the extrema view), never rebuilt."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    key = f"matview:{sf_dir}"
    if key not in _MV_CATS:
        def _build(path: str) -> None:
            o = load(spark, sf_dir, "orders")
            base = o.filter(F.col("o_orderkey") % 2 == 0).select(
                "o_orderkey", "o_orderstatus", "o_orderpriority",
                dec("o_totalprice").alias("price"),
            )
            cat = LakeCatalog(spark, warehouse=path)
            cat.create_table("mvq_base", f"{path}/base", base)
            cat.sql(_CREATE_SALES)
            cat.sql(_CREATE_EXTREMA)
            ins = o.filter(
                (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 7 == 0)
            ).select(
                "o_orderkey", "o_orderstatus", "o_orderpriority",
                dec("o_totalprice").alias("price"),
            )
            ins.createOrReplaceTempView("mvq_ins_src")
            cat.sql("INSERT INTO mvq_base SELECT * FROM mvq_ins_src")
            cat.sql("UPDATE mvq_base SET price = price * 2 WHERE o_orderkey % 5 = 0")
            cat.sql("DELETE FROM mvq_base WHERE o_orderkey % 3 = 0")
            _MV_CATS[key] = cat

        scratch_build(key, "lake_mv_", _build)
        if key not in _MV_CATS:
            # scratch dir survives from a prior incarnation but the
            # catalog object is gone (new interpreter): re-register the
            # persisted base table and re-declare the views (state
            # recomputed from the committed snapshot — no warehouse, so
            # they land in fresh temp dirs)
            root = scratch_build(key, "lake_mv_", lambda p: None)
            cat = LakeCatalog(spark)
            cat.register("mvq_base", VersionedTable(spark, f"{root}/base"))
            cat.sql(_CREATE_SALES)
            cat.sql(_CREATE_EXTREMA)
            _MV_CATS[key] = cat
    return _MV_CATS[key]


_ORACLE_CTE = """
    WITH t0 AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,6)) AS price
        FROM orders
        WHERE o_orderkey % 2 = 0 OR o_orderkey % 7 = 0
    ), t1 AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 5 = 0 THEN CAST(price * 2 AS DECIMAL(18,6))
                    ELSE price END AS price
        FROM t0 WHERE o_orderkey % 3 <> 0
    )
"""


@query(
    "q_matview",
    sql=_ORACLE_CTE + """
    SELECT o_orderstatus,
           CAST(SUM(price) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_orders,
           CAST(SUM(price) AS DOUBLE) / COUNT(price) AS avg_price
    FROM t1 GROUP BY o_orderstatus
    """,
    tags=("lakehouse", "matview"),
)
def q_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the BASE table answered by smart rewrite from the
    additive materialized view — a roll-up, too: the view groups by
    (status, priority), the query by status alone, so the mergeable
    state re-aggregates (SUM of sums, SUM of counts, sum/count for
    avg). The state was maintained through INSERT + UPDATE + DELETE via
    the change-feed signed fold; the oracle recomputes the final answer
    from first principles, so a hash match proves maintained ≡
    recomputed AND rewrite ≡ direct. Serving cost is |groups| state
    rows — the fact table is not scanned (pinned in test_matview)."""
    cat = _mv_catalog(spark, sf_dir)
    out = cat.sql(
        "SELECT o_orderstatus, SUM(price) AS sum_price, "
        "COUNT(*) AS n_orders, AVG(price) AS avg_price "
        "FROM mvq_base GROUP BY o_orderstatus"
    )
    assert cat.last_mv_rewrite == "mvq_sales"
    return out.select(
        "o_orderstatus",
        F.col("sum_price").cast("double").alias("sum_price"),
        F.col("n_orders"),
        F.col("avg_price"),
    )


@query(
    "q_matview_minmax",
    sql=_ORACLE_CTE + """
    SELECT o_orderstatus,
           CAST(MIN(price) AS DOUBLE) AS min_price,
           CAST(MAX(price) AS DOUBLE) AS max_price
    FROM t1 GROUP BY o_orderstatus
    """,
    tags=("lakehouse", "matview"),
)
def q_matview_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX materialized view through the same DML history — the
    maintenance mode that CANNOT use a signed fold (retracting a
    group's extremum needs its rows): only groups touched by each
    change batch were recomputed, via one semi-join per commit. The
    oracle's from-scratch MIN/MAX must match exactly — including
    after the UPDATE doubled some prices (new maxima) and the DELETE
    removed rows that held old extrema."""
    cat = _mv_catalog(spark, sf_dir)
    out = cat.sql(
        "SELECT o_orderstatus, MIN(price) AS min_price, "
        "MAX(price) AS max_price FROM mvq_base GROUP BY o_orderstatus"
    )
    assert cat.last_mv_rewrite == "mvq_extrema"
    return out.select(
        "o_orderstatus",
        F.col("min_price").cast("double").alias("min_price"),
        F.col("max_price").cast("double").alias("max_price"),
    )
