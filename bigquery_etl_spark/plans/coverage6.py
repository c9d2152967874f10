"""Sixth coverage pack: argmax aggregates, IGNORE NULLS windows, linear
regression aggregates, array/date generation (GENERATE_ARRAY /
GENERATE_DATE_ARRAY analogues), SAFE.* (try_*) expressions, the Spark 4
VARIANT type (BigQuery JSON type analogue), inline VALUES tables, and
printf-style formatting.

Reference parity: the reference delegates all of this to BigQuery
Standard SQL (main.py:21, 160-185); each query maps one BigQuery idiom
to its Spark primitive per SURVEY.md §2 Tier B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load, register_views

# ---------------------------------------------------------------------------
# B20 continued — argmax/argmin aggregates (BigQuery MAX_BY/MIN_BY, a.k.a.
# ANY_VALUE(x HAVING MAX y)). Ties on c_acctbal are broken by folding the
# unique c_custkey into the ordering key, so the argmax is deterministic
# on both engines: key = acctbal * 1e8 + custkey (acctbal has 2 decimals,
# custkey ≤ ~2e6 at sf100 — both terms exact in a double at fixture scale).
# ---------------------------------------------------------------------------


@query(
    "q_minmax_by",
    sql="""
    SELECT n_name,
           max_by(c_name, c_acctbal * 100000000 + c_custkey) AS richest,
           min_by(c_name, c_acctbal * 100000000 + c_custkey) AS poorest,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("agg", "argmax"),
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY/MIN_BY with a unique tiebreak key (map-side partial agg:
    argmax state is one (value, key) pair per group per partition)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    key = F.col("c_acctbal") * F.lit(100000000) + F.col("c_custkey")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", key).alias("richest"),
            F.min_by("c_name", key).alias("poorest"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


# ---------------------------------------------------------------------------
# B30 continued — IGNORE NULLS analytics (BigQuery LAST_VALUE(x IGNORE
# NULLS)): per-user last observed non-null value carried forward — the
# gap-fill / LOCF idiom. ROWS frame ordered by the unique event_id.
# ---------------------------------------------------------------------------


@query(
    "q_ignore_nulls",
    sql="""
    SELECT event_id, user_id,
           last_value(big_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_big,
           first_value(big_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_big,
           lag(event_type, 1, 'none') OVER (
               PARTITION BY user_id ORDER BY event_id) AS prev_type
    FROM (SELECT event_id, user_id, event_type,
                 CASE WHEN value > 50 THEN ROUND(value, 4) END AS big_val
          FROM events)
    """,
    tags=("window", "ignore_nulls"),
)
def q_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last/first IGNORE NULLS (LOCF carry-forward) + lag with default."""
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.when(F.col("value") > 50, F.round("value", 4)).alias("big_val"),
    )
    w = W.partitionBy("user_id").orderBy("event_id")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.last("big_val", ignorenulls=True).over(frame).alias("last_big"),
        F.first("big_val", ignorenulls=True).over(frame).alias("first_big"),
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
    )


# ---------------------------------------------------------------------------
# B20 continued — linear-regression aggregates (BigQuery/Spark REGR_SLOPE,
# REGR_INTERCEPT, REGR_R2). Hash-stability: the regr_* builtins reduce
# doubles in partition order, so the last bits drift between engines;
# instead both sides compute the closed-form moments over exact DECIMAL
# sums (order-independent), then do the same few double divisions.
# tests/test_sources_and_ops.py asserts the result matches Spark's own
# regr_slope/regr_intercept to 1e-9, so the builtins are covered too.
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n AS regr_count,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
    FROM m
"""


@query("q_regr_agg", sql=_REGR_ORACLE, tags=("agg", "stats"))
def q_regr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGR_SLOPE/INTERCEPT/R2/COUNT of extendedprice on quantity per
    returnflag, via order-independent decimal moments (see module doc)."""
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    # Products are computed in DOUBLE (IEEE — bit-identical across
    # engines) then cast to DECIMAL so the SUM is order-independent.
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(28,6)")).cast("double").alias("sxx"),
        F.sum((x * y).cast("decimal(28,6)")).cast("double").alias("sxy"),
        F.sum((y * y).cast("decimal(28,6)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        n.alias("regr_count"),
        F.round(slope, 4).alias("slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            4,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# B44 continued — GENERATE_DATE_ARRAY + LEFT JOIN: the calendar-spine
# gap-fill idiom (every month appears even with zero orders). The spine is
# a generated 84-row table — broadcast side of the join; the fact scan
# aggregates BEFORE joining so the join input is |months|, not |orders|.
# ---------------------------------------------------------------------------


@query(
    "q_gen_array",
    sql="""
    WITH spine AS (
        SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2001-12-01',
                                           INTERVAL 1 MONTH)) AS DATE) AS month
    ),
    per_month AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT s.month, COALESCE(p.n_orders, 0) AS n_orders,
           COALESCE(p.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN per_month p ON s.month = p.month
    """,
    tags=("generate", "join"),
)
def q_gen_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence() + explode calendar spine, left-joined to pre-aggregated
    monthly order stats (GENERATE_DATE_ARRAY gap-fill)."""
    o = load(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month")
    )
    per_month = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("revenue"),
    )
    return spine.join(per_month, "month", "left").select(
        "month",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# B10/B42 continued — SAFE.* expressions (BigQuery SAFE_CAST / SAFE_DIVIDE
# / SAFE_OFFSET): errors become NULL instead of failing the job. Spark 4
# runs ANSI-on, so the try_* family is the exact analogue.
# ---------------------------------------------------------------------------


@query(
    "q_try_ops",
    sql="""
    SELECT p_partkey,
           TRY_CAST(p_brand AS INTEGER) AS brand_num,
           TRY_CAST(substr(p_brand, 7) AS INTEGER) AS brand_id,
           CASE WHEN p_size - 10 = 0 THEN NULL
                ELSE ROUND(p_retailprice / (p_size - 10), 4) END AS price_per,
           string_split(p_type, ' ')[4] AS word4
    FROM part
    """,
    tags=("safe", "cast"),
)
def q_try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast / try_divide / try_element_at — SAFE.* semantics under
    ANSI mode ('Brand#13' → NULL, ÷0 → NULL, index-past-end → NULL)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_brand").try_cast("int").alias("brand_num"),
        F.expr("substr(p_brand, 7)").try_cast("int").alias("brand_id"),
        F.round(F.try_divide("p_retailprice", F.col("p_size") - 10), 4).alias("price_per"),
        F.try_element_at(F.split("p_type", " "), F.lit(4)).alias("word4"),
    )


# ---------------------------------------------------------------------------
# B43 continued — the Spark 4 VARIANT type (BigQuery JSON type analogue):
# parse once into a binary semi-structured value, then typed path access
# without re-parsing the text per extraction. Columnar win at scale: one
# parse, many variant_get's.
# ---------------------------------------------------------------------------


@query(
    "q_variant",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 10
    GROUP BY event_type
    """,
    tags=("json", "variant"),
)
def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion: parse_json(props) → variant_get('$.k') typed
    extraction, filter + aggregate on the extracted value."""
    e = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") > 10)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# B6 continued — inline VALUES table (BigQuery UNNEST-of-struct-literals
# idiom): a small literal dimension joined against a real table. The
# literal relation is a LocalRelation — Catalyst folds and broadcasts it.
# ---------------------------------------------------------------------------


@query(
    "q_values_inline",
    sql="""
    SELECT t.tier, COUNT(*) AS n_nations
    FROM nation n
    JOIN (VALUES (0, 'AMERICAS+'), (1, 'AMERICAS+'), (2, 'EURASIA'),
                 (3, 'EURASIA'), (4, 'MEA')) AS t(r_key, tier)
      ON n.n_regionkey = t.r_key
    GROUP BY t.tier
    """,
    tags=("sql", "values"),
)
def q_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES-literal dimension join via spark.sql (LocalRelation side)."""
    register_views(spark, sf_dir, ("nation",))
    return spark.sql(
        """
        SELECT t.tier, COUNT(*) AS n_nations
        FROM nation n
        JOIN (VALUES (0, 'AMERICAS+'), (1, 'AMERICAS+'), (2, 'EURASIA'),
                     (3, 'EURASIA'), (4, 'MEA')) AS t(r_key, tier)
          ON n.n_regionkey = t.r_key
        GROUP BY t.tier
        """
    )


# ---------------------------------------------------------------------------
# B40 continued — printf-style formatting (BigQuery FORMAT) and string
# distance (EDIT_DISTANCE → levenshtein), both JVM builtins.
# ---------------------------------------------------------------------------


@query(
    "q_format_strings",
    sql="""
    SELECT s_suppkey,
           printf('%s|%08d|%.2f', s_name, s_suppkey, s_acctbal) AS tag,
           levenshtein(s_name, upper(s_name)) AS dist_upper
    FROM supplier
    """,
    tags=("string", "format"),
)
def q_format_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_string (FORMAT) + levenshtein (EDIT_DISTANCE)."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.format_string("%s|%08d|%.2f", "s_name", "s_suppkey", "s_acctbal").alias("tag"),
        F.levenshtein("s_name", F.upper("s_name")).alias("dist_upper"),
    )
