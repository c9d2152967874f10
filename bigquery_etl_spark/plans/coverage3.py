"""Third coverage pack: remaining analytic window functions, statistical
aggregates, bit operations, GROUPING(), and struct-array UNNEST — the
last BigQuery Standard SQL corners (SURVEY.md §2 Tier B completion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.plans._util import dsum, dsum_sql
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# B29/B30 continued: nth_value, cume_dist.
# ---------------------------------------------------------------------------


@query(
    "q_win_analytic2",
    sql="""
    SELECT o_orderkey, o_custkey,
           NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price,
           ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice), 6) AS cd
    FROM orders
    """,
    tags=("window",),
)
def q_win_analytic2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a running frame + cume_dist. cume_dist is frame-
    insensitive (peer-based), so no tiebreak needed for determinism."""
    o = load(spark, sf_dir, "orders")
    w_run = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_peer = W.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w_run).alias("second_price"),
        F.round(F.cume_dist().over(w_peer), 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregates (corr/covar/stddev/var). Non-linear — the
# decimal trick doesn't apply; round(4) bounds cross-engine float drift.
# ---------------------------------------------------------------------------


@query(
    "q_stats_agg",
    sql="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
           ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qe,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS cov_qd,
           ROUND(SKEWNESS(l_extendedprice) * (COUNT(*) - 2)
                 / SQRT(COUNT(*) * (COUNT(*) - 1.0)), 4) AS skew_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. Cross-engine trap: Spark skewness is the
    population form g1, DuckDB's is the sample form G1 — the oracle
    converts (g1 = G1 * (n-2)/sqrt(n(n-1)))."""
    o = load(spark, sf_dir, "lineitem")
    return o.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qe"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qd"),
        F.round(F.skewness("l_extendedprice"), 4).alias("skew_price"),
    )


@query(
    "q_bool_agg",
    sql="""
    SELECT o_orderstatus,
           BOOL_AND(o_totalprice > 1000) AS all_over_1k,
           BOOL_OR(o_orderpriority LIKE '1%') AS any_urgent,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           ARG_MAX(o_orderkey, o_totalprice) AS priciest_order
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def q_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """every/any (BigQuery LOGICAL_AND/OR) + max_by (ARG_MAX)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_orderpriority").like("1%")).alias("any_urgent"),
        F.max("o_orderkey").alias("max_key"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
    )


# ---------------------------------------------------------------------------
# Bit operations.
# ---------------------------------------------------------------------------


@query(
    "q_bit_ops",
    sql="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 7 AS with_flags,
           xor(l_orderkey, l_partkey) AS xored,
           CAST(l_orderkey << 2 AS BIGINT) AS shl,
           l_orderkey >> 3 AS shr,
           BIT_COUNT(l_orderkey) AS popcount
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
    tags=("functions", "bits"),
)
def q_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(7)).alias("with_flags"),
        k.bitwiseXOR(F.col("l_partkey")).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).cast("int").alias("popcount"),
    )


# ---------------------------------------------------------------------------
# GROUPING() — distinguishing rollup subtotal rows from data NULLs.
# ---------------------------------------------------------------------------


@query(
    "q_grouping_fn",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
           {dsum_sql('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_grouping_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        dsum("l_quantity", "sum_qty"),
    ).select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty")


# ---------------------------------------------------------------------------
# UNNEST of an array of structs (BigQuery's repeated-record idiom; the
# A8 fan-out generalized).
# ---------------------------------------------------------------------------


@query(
    "q_unnest_structs",
    sql="""
    SELECT c_custkey, u.tag AS tag, u.score AS score
    FROM (
        SELECT c_custkey,
               [{'tag': c_mktsegment, 'score': CAST(c_acctbal AS DOUBLE)},
                {'tag': 'nation-' || CAST(c_nationkey AS VARCHAR), 'score': CAST(c_nationkey AS DOUBLE)}] AS recs
        FROM customer
    ), UNNEST(recs) AS t(u)
    """,
    tags=("functions", "array"),
)
def q_unnest_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-structs build + inline explode → one row per record with
    typed fields (BigQuery repeated STRUCT / UNNEST)."""
    c = load(spark, sf_dir, "customer")
    recs = F.array(
        F.struct(F.col("c_mktsegment").alias("tag"), F.col("c_acctbal").cast("double").alias("score")),
        F.struct(
            F.concat(F.lit("nation-"), F.col("c_nationkey").cast("string")).alias("tag"),
            F.col("c_nationkey").cast("double").alias("score"),
        ),
    )
    return (
        c.select("c_custkey", F.explode(recs).alias("u"))
        .select("c_custkey", F.col("u.tag").alias("tag"), F.col("u.score").alias("score"))
    )


# ---------------------------------------------------------------------------
# Frequent items (approx top-k) — rows-only.
# ---------------------------------------------------------------------------


@query(
    "q_freq_items",
    sql="SELECT TRUE AS returnflag_complete, TRUE AS qty_within_capacity",
    tags=("agg", "approx"),
    twin="invariant",
)
def q_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate frequent items per column (Karp et al. single-pass).

    Driver-checkable invariant form (the raw item arrays are engine-
    specific AND crash the driver's hasher): with support=0.2 the
    candidate buffer holds 1/0.2 = 5 slots, so (a) l_returnflag's 3
    distinct values can never be evicted — A/N/R must ALL be returned
    (Misra-Gries guarantees items with freq > support survive; with
    fewer distincts than slots, eviction never fires at all) — and (b)
    the l_quantity candidate list is capped at the 5-slot capacity."""
    li = load(spark, sf_dir, "lineitem")
    fi = li.freqItems(["l_returnflag", "l_quantity"], support=0.2)
    flags = F.array_sort(F.col("l_returnflag_freqItems"))
    return fi.select(
        (
            F.array_contains(flags, "A")
            & F.array_contains(flags, "N")
            & F.array_contains(flags, "R")
        ).alias("returnflag_complete"),
        (F.size("l_quantity_freqItems") <= 5).alias("qty_within_capacity"),
    )
