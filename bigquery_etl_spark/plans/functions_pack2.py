"""Second scalar-function pack: the rest of the BigQuery string/date
library, NULL semantics, and batch sessionization (SURVEY.md §2
B40-B41 continued; guide 'Common OLAP patterns').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.plans._util import dec
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# B40 continued — string functions round 2.
# ---------------------------------------------------------------------------


@query(
    "q_str_funcs2",
    sql="""
    SELECT p_partkey,
           ARRAY_TO_STRING(LIST_TRANSFORM(string_split(p_name, ' '),
                           x -> UPPER(SUBSTR(x,1,1)) || LOWER(SUBSTR(x,2))), ' ') AS name_cap,
           REVERSE(p_brand) AS brand_rev,
           TRANSLATE(p_type, 'AEIOU', 'aeiou') AS type_tr,
           SPLIT_PART(p_name, ' ', 1) AS word1,
           SPLIT_PART(p_name, ' ', 2) AS word2,
           REPEAT(p_brand, 2) AS brand2,
           LEFT(p_type, 4) AS type_l4,
           RIGHT(p_type, 3) AS type_r3,
           ASCII(p_name) AS first_code,
           CHR(CAST(65 + (p_partkey % 26) AS INTEGER)) AS letter,
           RTRIM(LTRIM('  ' || p_brand || '  ')) AS trimmed,
           CONTAINS(p_name, 'widget') AS has_widget,
           STARTS_WITH(p_type, 'PROMO') AS is_promo,
           ENDS_WITH(p_name, 'bolt') AS ends_bolt
    FROM part
    """,
    tags=("functions",),
)
def q_str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("name_cap"),
        F.reverse("p_brand").alias("brand_rev"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("word1"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("word2"),
        F.repeat("p_brand", 2).alias("brand2"),
        F.substring("p_type", 1, 4).alias("type_l4"),
        F.substring(F.col("p_type"), -3, 3).alias("type_r3"),
        F.ascii("p_name").alias("first_code"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26)).alias("letter"),
        F.rtrim(F.ltrim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  ")))).alias("trimmed"),
        F.contains("p_name", F.lit("widget")).alias("has_widget"),
        F.startswith("p_type", F.lit("PROMO")).alias("is_promo"),
        F.endswith("p_name", F.lit("bolt")).alias("ends_bolt"),
    )


# ---------------------------------------------------------------------------
# B41 continued — date/time round 2 (BigQuery TIMESTAMP_ADD/DIFF idioms).
# ---------------------------------------------------------------------------


@query(
    "q_date_funcs2",
    sql="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus3m,
           ROUND(CAST(DATEDIFF('day', TIMESTAMP '1996-01-01 00:00:00', o_orderdate) AS DOUBLE) / 30.0, 4) AS months_approx,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qtr,
           CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS wk,
           CAST(EXTRACT(HOUR FROM o_orderdate) AS INTEGER) AS hr,
           MAKE_DATE(CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER),
                     CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER), 1) AS month_first,
           DATE_TRUNC('week', o_orderdate) AS week_start,
           CAST(o_orderdate AS DATE) - 7 AS minus_week,
           GREATEST(CAST(o_orderdate AS DATE), DATE '1996-06-01') AS clamped
    FROM orders
    """,
    tags=("functions",),
)
def q_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date pack 2. date_trunc('week') starts Monday in both engines
    (SURVEY.md §5.3); months_between differs cross-engine so the
    portable form is day-diff/30."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(od.cast("date"), 3).alias("plus3m"),
        F.round(F.datediff(od, F.lit("1996-01-01").cast("timestamp")).cast("double") / 30.0, 4).alias(
            "months_approx"
        ),
        F.quarter(od).alias("qtr"),
        F.weekofyear(od).alias("wk"),
        F.hour(od).alias("hr"),
        F.make_date(F.year(od), F.month(od), F.lit(1)).alias("month_first"),
        F.date_trunc("week", od).alias("week_start"),
        F.date_sub(od.cast("date"), 7).alias("minus_week"),
        F.greatest(od.cast("date"), F.lit("1996-06-01").cast("date")).alias("clamped"),
    )


# ---------------------------------------------------------------------------
# NULL semantics pack: three-valued logic, null-skipping aggregates,
# null group keys, null-safe equality.
# ---------------------------------------------------------------------------


@query(
    "q_null_semantics",
    sql="""
    SELECT grp,
           COUNT(*) AS n_rows,
           COUNT(v) AS n_nonnull,
           CAST(COALESCE(SUM(CAST(v AS DECIMAL(18,6))), 0) AS DOUBLE) AS sum_v,
           COUNT(*) FILTER (WHERE v IS NULL) AS n_null,
           COUNT(*) FILTER (WHERE v IS NOT DISTINCT FROM 5.0) AS n_five
    FROM (
        SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS grp,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE CAST(o_orderkey % 7 AS DOUBLE) END AS v
        FROM orders
    )
    GROUP BY grp
    """,
    tags=("functions", "null"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLs end-to-end: COUNT(*) vs COUNT(col), SUM over all-null,
    NULL as a grouping key (its own group in both engines), and
    null-safe equality (<=> / IS NOT DISTINCT FROM)."""
    o = load(spark, sf_dir, "orders")
    derived = o.select(
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("grp"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise((F.col("o_orderkey") % 7).cast("double"))
        .alias("v"),
    )
    return derived.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        F.coalesce(F.sum(dec("v")), F.lit(0)).cast("double").alias("sum_v"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_null"),
        F.count(F.when(F.col("v").eqNullSafe(F.lit(5.0)), 1)).alias("n_five"),
    )


# ---------------------------------------------------------------------------
# Sessionization, batch form: lag + gap-flag + running sum (the window
# twin of streaming session_window; guide 'Sessionization').
# ---------------------------------------------------------------------------


@query(
    "q_sessionize",
    sql="""
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
            FROM events
        )
    )
    GROUP BY user_id, session_id
    """,
    tags=("window", "session"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user: lag → new-session flag →
    running sum as session id → per-session aggregate. One shuffle on
    user_id shared by both windows and the final groupBy."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # interval comparison is valid on TIMESTAMP and TIMESTAMP_NTZ alike —
    # epoch casts (`cast(ts as long)`) are LTZ-only and crashed round 1
    # when a fixture regeneration flipped the column to NTZ
    gap_ok = (F.col("ts") - F.lag("ts").over(w)) <= F.expr("INTERVAL 30 MINUTE")
    flagged = e.select(
        "user_id",
        "ts",
        F.when(gap_ok, 0).otherwise(1).alias("is_new"),
        "event_id",
    )
    with_session = flagged.select(
        "user_id",
        "ts",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("session_id"),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
