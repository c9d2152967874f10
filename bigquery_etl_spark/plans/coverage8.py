"""Eighth coverage pack: Spark 4 SQL-surface parity features that
BigQuery also ships — pipe syntax (`|>`), SQL UDFs (CREATE TEMPORARY
FUNCTION ... RETURN expr), GROUP BY ALL — plus two pipeline staples:
time-series gap-fill (calendar spine + LOCF) and inverted-index term
search (BigQuery SEARCH() analogue).

Reference parity: all Tier B (the reference delegates SQL to BigQuery,
main.py:21, 160-185); gap-fill/search are the reporting idioms its
consumers would run over the loaded tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.plans._util import dec
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load, register_views

# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4 / BigQuery 2024 pipe syntax). The pipe form
# parses to the SAME logical plan as the classic form — the oracle twin
# is the classic spelling, so parity proves the equivalence.
# ---------------------------------------------------------------------------


@query(
    "q_pipe_syntax",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("sql", "pipe"),
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 core written in Spark 4 pipe syntax; Catalyst sees the
    identical aggregate plan as the classic form."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n, sum_qty
        """
    )


# ---------------------------------------------------------------------------
# SQL UDF — BigQuery CREATE TEMP FUNCTION analogue. The function body is
# a pure SQL expression, so Catalyst INLINES it at plan time: it runs
# codegen'd like any built-in, with none of the Python-UDF serialization
# tax (contrast q_udf_scalar). The oracle twin inlines the same
# expression by hand.
# ---------------------------------------------------------------------------


@query(
    "q_sql_udf",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS charged
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("sql", "udf"),
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TEMPORARY FUNCTION charge(...) RETURN <expr>; the call
    site inlines — EXPLAIN shows no PythonUDF node."""
    register_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge(
            price DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS DECIMAL(18,6)
        RETURN CAST(price * (1 - disc) * (1 + tax) AS DECIMAL(18,6))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(charge(l_extendedprice, l_discount, l_tax)) AS DOUBLE)
                   AS charged
        FROM lineitem GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL — supported by Spark 4, DuckDB, and
# BigQuery alike; the twin uses the same sugar on both engines.
# ---------------------------------------------------------------------------


@query(
    "q_group_by_all",
    sql="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders GROUP BY ALL
    """,
    tags=("sql", "agg"),
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL: every non-aggregate select item becomes a key."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM orders GROUP BY ALL
        """
    )


# ---------------------------------------------------------------------------
# Time-series gap-fill: per-user hourly calendar spine (sequence /
# generate_series between that user's first and last hour), left-joined
# observations, missing hours filled by LOCF (last_value IGNORE NULLS).
# Scale: the spine explodes from ONE row per user (no shuffle to build),
# the join and the LOCF window share the user_id shuffle key, and state
# per user is bounded by its own time span — the idiom survives 100 TB
# because nothing is keyed on the global calendar.
# ---------------------------------------------------------------------------


@query(
    "q_gap_fill",
    sql="""
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS hr, COUNT(*) AS n_obs,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(value) AS avg_value
        FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2
    ),
    spine AS (
        SELECT user_id, unnest(generate_series(min(hr), max(hr),
                                               INTERVAL 1 HOUR)) AS hr
        FROM obs GROUP BY user_id
    )
    SELECT s.user_id, s.hr,
           COALESCE(o.n_obs, 0) AS n_obs,
           ROUND(last_value(o.avg_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS locf_value
    FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.hr = o.hr
    """,
    tags=("timeseries", "gapfill", "tierc"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LOCF for every 10th user: spine from
    F.sequence (one array per user, exploded), observation join and
    fill window both keyed on user_id — a single shuffle key end to
    end. r13 opt (guide §2.4; the gap_fill-operator finding): the
    DataFrame form consumed ``obs`` twice (spine + join) and Catalyst
    inlined TWO copies of the events scan + hourly aggregate. The
    ``obs`` CTE is now pinned with a constant-true nondeterministic
    filter (planned once) and DISTRIBUTE BY user_id is its top node
    (so ReplaceCTERefWithRepartition adds no round-robin exchange):
    spine aggregate, join and fill window all ride ONE hash(user_id)
    exchange over ONE events pass. Result-identical (oracle-checked)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("__gf8_events")
    return spark.sql("""
        WITH __o AS (
            SELECT * FROM (
                SELECT user_id, DATE_TRUNC('hour', ts) AS hr,
                       COUNT(*) AS n_obs,
                       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                         / COUNT(value) AS avg_value
                FROM __gf8_events WHERE user_id % 10 = 0
                GROUP BY user_id, DATE_TRUNC('hour', ts)
            ) WHERE RAND() >= -1 DISTRIBUTE BY user_id
        ),
        __spine AS (
            SELECT user_id,
                   EXPLODE(SEQUENCE(MIN(hr), MAX(hr), INTERVAL 1 HOUR))
                       AS hr
            FROM __o GROUP BY user_id
        )
        SELECT user_id, hr, COALESCE(n_obs, 0) AS n_obs,
               ROUND(LAST(avg_value, TRUE) OVER (
                   PARTITION BY user_id ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   4) AS locf_value
        FROM __spine LEFT JOIN __o USING (user_id, hr)
    """)


# ---------------------------------------------------------------------------
# Inverted-index term search (BigQuery SEARCH() analogue): docs matching
# ALL query terms, via posting-list intersection spelled as
# count-distinct-terms == |query|. One explode + one aggregate — never a
# per-term self-join (which would be |query| shuffles). At 100 TB the
# posting build is the classic inverted-index map-reduce; the AND match
# is a HAVING on the grouped doc.
# ---------------------------------------------------------------------------


@query(
    "q_search_terms",
    sql="""
    WITH tok AS (
        SELECT DISTINCT doc_id, u.t AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(toks) AS u(t)
        WHERE u.t IN ('spark', 'merge', 'window')
    )
    SELECT d.doc_id, d.lang, d.source
    FROM (
        SELECT doc_id FROM tok GROUP BY doc_id HAVING COUNT(*) = 3
    ) m JOIN documents d ON m.doc_id = d.doc_id
    """,
    tags=("tierc", "text", "search"),
)
def q_search_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-search for {spark, merge, window}: explode -> filter to query
    terms (pushed before the distinct) -> per-doc distinct-term count
    == 3 -> semi-join back for doc metadata."""
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin("spark", "merge", "window"))
        .dropDuplicates(["doc_id", "term"])
    )
    matched = tok.groupBy("doc_id").agg(F.count("*").alias("nt")).filter(
        F.col("nt") == 3
    )
    return docs.join(matched, "doc_id", "left_semi").select(
        "doc_id", "lang", "source"
    )


# ---------------------------------------------------------------------------
# Data-quality report (BigQuery ASSERT analogue, expectation-suite
# form): uniqueness, referential integrity, null-rate, and range checks
# over the fixture star schema, all folded into single-pass aggregates
# (operators/dq.py). The orphan check anti-joins lineitem against the
# column-pruned orders key set.
# ---------------------------------------------------------------------------


@query(
    "q_dq_report",
    sql="""
    WITH dup AS (
        SELECT COUNT(*) AS dup_li_keys FROM (
            SELECT l_orderkey, l_linenumber FROM lineitem
            GROUP BY 1, 2 HAVING COUNT(*) > 1
        )
    ),
    orphans AS (
        SELECT COUNT(*) AS orphan_lineitems
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    ),
    checks AS (
        -- CAST: DuckDB SUM(int) returns HUGEINT which pandas renders as
        -- float64; the driver's value hash is dtype-strict, so an uncast
        -- twin hash-mismatches Spark's bigint (round-1 q_dq_report FAIL)
        SELECT
            CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS bad_quantity,
            CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS bad_discount,
            CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate
        FROM lineitem
    )
    SELECT dup.dup_li_keys, orphans.orphan_lineitems,
           checks.bad_quantity, checks.bad_discount, checks.null_shipdate
    FROM dup, orphans, checks
    """,
    tags=("dq", "tierb"),
)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row data-quality report: duplicate PKs, FK orphans, and
    row-level constraint violations — the load-time validation the
    reference delegates to BigQuery (main.py:169-177), as explicit
    Spark aggregates."""
    from bigquery_etl_spark.operators.dq import duplicate_keys, orphan_rows, violations

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    dup = duplicate_keys(li, ["l_orderkey", "l_linenumber"]).agg(
        F.count("*").alias("dup_li_keys")
    )
    orph = orphan_rows(li, orders, [("l_orderkey", "o_orderkey")]).agg(
        F.count("*").alias("orphan_lineitems")
    )
    checks = violations(
        li,
        {
            "bad_quantity": F.col("l_quantity") > 0,
            "bad_discount": F.col("l_discount").between(0, 1),
            "null_shipdate": F.col("l_shipdate").isNotNull(),
        },
    )
    return dup.crossJoin(orph).crossJoin(checks)
