"""Window-function operators (SURVEY.md §2 B29-B33).

One shuffle on the partition key + a per-partition sort; all ranking /
analytic / frame aggregates over the same window share that single
exchange (check .explain(): one Exchange, one Window node per distinct
(partition, order) spec — co-group windows deliberately).

Determinism: every orderBy includes a unique tiebreak column so rank
ties and frame contents are stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.plans._util import dec
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# B29 — ranking functions.
# ---------------------------------------------------------------------------


@query(
    "q_win_rank",
    sql="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rk,
           DENSE_RANK()   OVER w AS drk,
           NTILE(4)       OVER w AS nt,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five ranking functions over one shared window spec."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rk"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.ntile(4).over(w).cast("bigint").alias("nt"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


# ---------------------------------------------------------------------------
# B30 — analytic functions: lead / lag / first / last.
# ---------------------------------------------------------------------------


@query(
    "q_win_lead_lag",
    sql="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def q_win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag/first/last per user ordered by event time. NOTE last_value
    needs the full-partition frame — the default frame stops at the
    current row (identical trap in BigQuery/DuckDB/Spark)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


# ---------------------------------------------------------------------------
# B31 — running aggregates (ROWS frame).
# ---------------------------------------------------------------------------


@query(
    "q_win_running",
    sql="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM orders
    """,
    tags=("window",),
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer. Decimal-cast inside the window sum:
    window engines are free to aggregate the frame in any association
    order, so float running sums drift cross-engine (SURVEY.md §5.3)."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


# ---------------------------------------------------------------------------
# B32 — RANGE frames (value-based window extent).
# ---------------------------------------------------------------------------


@query(
    "q_win_range_frame",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_near,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_near
    FROM orders
    """,
    tags=("window",),
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: all orders within $10k below the current price.
    Value-based frames are insensitive to peer order, so no tiebreak
    column is needed for determinism."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("sum_near"),
    )


@query(
    "q_win_range_prefix",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_near,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_near
    FROM orders
    """,
    tags=("window",),
)
def q_win_range_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as q_win_range_frame via the SCALABLE rewrite
    (operators/range_frame.py): Spark's bounded sliding frames rebuild
    the aggregate buffer per row — O(rows x frame width) — while this
    prefix-sum + as-of-boundary form is O(rows log rows) with key-local
    shuffles only (4.2s -> ~0.6s at sf0.1, and the gap grows with frame
    width). The oracle is the ORIGINAL window SQL, so the driver checks
    the rewrite's equivalence, not just its stability."""
    from bigquery_etl_spark.operators.range_frame import bounded_range_sum

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", dec("o_totalprice").alias("__d")
    )
    out = bounded_range_sum(
        o, ["o_orderstatus"], "o_totalprice", 10000, "__d",
        sum_alias="__sum", cnt_alias="n_near",
    )
    return out.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "n_near",
        F.col("__sum").cast("double").alias("sum_near"),
    )


# ---------------------------------------------------------------------------
# B33 — top-k per group: the rank-then-filter idiom.
# ---------------------------------------------------------------------------


@query(
    "q_topk_per_group",
    sql="""
    SELECT c_mktsegment, o_orderkey, o_totalprice
    FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 5
    """,
    tags=("window",),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders per market segment. Spark pushes a per-partition
    top-k (WindowGroupLimit) below the shuffle since 3.5 — each map task
    keeps only k rows per group, so the exchange is k·|groups| rows."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )
