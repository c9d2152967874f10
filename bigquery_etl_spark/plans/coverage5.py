"""Fifth coverage pack: interval RANGE frames over event time, regex
functions round 2, array functions round 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.plans._util import dec
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# B32 continued — RANGE frame with a time extent (sliding look-back per
# row, the 'events in the last hour' idiom).
# ---------------------------------------------------------------------------


@query(
    "q_win_time_range",
    sql="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_last_hour
    FROM events
    """,
    tags=("window", "range"),
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour stats: RANGE frame keyed on epoch
    MICROseconds (`unix_micros`) — the full precision of the stored
    timestamps. Keying on whole seconds looked equivalent until sf0.1,
    where two same-user events landed in the same second: second-level
    peers pulled a LATER event into the trailing frame while DuckDB's
    µs-precision INTERVAL range excluded it. Value-based frames are
    peer-insensitive only if the range key carries full precision."""
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_last_hour"),
    )


# ---------------------------------------------------------------------------
# B40 continued — regex round 2.
# ---------------------------------------------------------------------------


@query(
    "q_regex_funcs",
    sql="""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_words,
           CAST(LEN(regexp_extract_all(text, 'a[a-z]*')) AS INTEGER) AS n_a_words,
           regexp_matches(text, 'spark') AS mentions_spark,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(text, '\\s+', '_', 'g') AS snake
    FROM documents
    """,
    tags=("functions", "regex"),
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count/like/extract-group/replace-all. Spark regexp_count ==
    DuckDB len(regexp_extract_all); Spark rlike == regexp_matches."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[a-z]+")).cast("int").alias("n_words"),
        F.regexp_count("text", F.lit(r"a[a-z]*")).cast("int").alias("n_a_words"),
        F.col("text").rlike("spark").alias("mentions_spark"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace("text", r"\s+", "_").alias("snake"),
    )


# ---------------------------------------------------------------------------
# B44 continued — array functions round 2 (set ops, zip, position),
# serialized to scalars for representation-stable hashing.
# ---------------------------------------------------------------------------


@query(
    "q_array_funcs2",
    sql="""
    SELECT doc_id,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(string_split(text, ' '))), ',') AS uniq_sorted,
           ARRAY_TO_STRING(LIST_REVERSE_SORT(LIST_DISTINCT(string_split(text, ' '))), ',') AS uniq_desc,
           CAST(LIST_POSITION(string_split(text, ' '), 'the') AS INTEGER) AS the_pos,
           ARRAY_TO_STRING(LIST_CONCAT(LIST_SLICE(string_split(text, ' '), 1, 2),
                                       ['<END>']), ',') AS first2_tagged,
           CAST(LEN(LIST_DISTINCT(string_split(text, ' '))) AS INTEGER) AS n_uniq
    FROM documents
    """,
    tags=("functions", "array"),
)
def q_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_distinct/sort(desc)/position/concat/size. array_position
    and list_position agree on 0-for-missing."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    uniq = F.array_distinct(toks)
    return d.select(
        "doc_id",
        F.concat_ws(",", F.array_sort(uniq)).alias("uniq_sorted"),
        F.concat_ws(",", F.reverse(F.array_sort(uniq))).alias("uniq_desc"),
        F.array_position(toks, "the").cast("int").alias("the_pos"),
        F.concat_ws(",", F.concat(F.slice(toks, 1, 2), F.array(F.lit("<END>")))).alias(
            "first2_tagged"
        ),
        F.size(uniq).alias("n_uniq"),
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (wide → long; inverse of q_pivot in plans/extras.py).
# ---------------------------------------------------------------------------


@query(
    "q_unpivot",
    sql="""
    SELECT o_orderkey, 'o_totalprice' AS measure, o_totalprice AS val
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT o_orderkey, 'o_custkey_as_val' AS measure, CAST(o_custkey AS DOUBLE) AS val
    FROM orders WHERE o_orderkey % 100 = 0
    """,
    tags=("reshape",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via DataFrame.unpivot (BigQuery UNPIVOT; melt).
    The oracle twin is the dialect-safe UNION ALL expansion — same rows.
    Unpivot is a zero-shuffle projection (each input row fans to
    n_measures output rows map-side)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice"),
        F.col("o_custkey").cast("double").alias("o_custkey_as_val"),
    ).unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "o_custkey_as_val"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "q_grouping_sets",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg", "grouping"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (B25's general form; rollup/cube are the
    special cases, covered by q_rollup/q_cube). One scan, one expand —
    NOT one aggregation pass per set."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )
