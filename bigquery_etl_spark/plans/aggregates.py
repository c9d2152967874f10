"""Aggregation operators (SURVEY.md §2 B20-B28).

The reference delegated all aggregation to BigQuery (ref main.py:21,
49-50, 160-185 — load-only client); these are the Spark-native
equivalents. Scale notes per query in docstrings: every groupBy here is a
hash aggregate with map-side partial aggregation (Spark does the
partial/final split automatically), so the shuffle carries one row per
(partition, group), not per input row — the pattern that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.plans._util import davg, davg_sql, dec, dsum, dsum_sql
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# B20 — hash group-by with partial+final agg. TPC-H Q1 shape; the flagship.
# ---------------------------------------------------------------------------


@query(
    "q_agg_hash",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice', 'sum_base_price')},
           {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))', 'sum_disc_price')},
           {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) * (1 + CAST(l_tax AS DECIMAL(18,6)))', 'sum_charge')},
           {davg_sql('l_quantity', 'avg_qty')},
           {davg_sql('l_extendedprice', 'avg_price')},
           {davg_sql('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: 2 group keys, 8 aggregates.

    Scale: filter pushes to the parquet scan; partial agg collapses each
    input partition to <=|groups| rows before the shuffle, so the exchange
    moves KBs regardless of input TBs.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount"))
    charge = disc_price * (1 + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# B21 — distinct aggregation.
# ---------------------------------------------------------------------------


@query(
    "q_agg_distinct",
    sql="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_dist_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM(DISTINCT). Spark plans distinct aggs as an expand +
    two-phase aggregate — still shuffle-bounded by distinct cardinality."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.sum_distinct(dec("l_quantity")).cast("double").alias("sum_dist_qty"),
    )


# ---------------------------------------------------------------------------
# B22/B23 — approximate aggregates (rows-only: non-deterministic vs oracle).
# ---------------------------------------------------------------------------


@query(
    "q_approx_distinct",
    sql="""
    SELECT l_returnflag, TRUE AS orders_within_5pct, TRUE AS parts_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
    twin="invariant",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROX_COUNT_DISTINCT (HLL++). Sketches merge associatively, so the
    shuffle carries fixed-size sketches, not values — the 100 TB path.

    Driver-checkable bound form: the sketch estimate can't hash-match an
    exact count, so the query asserts |approx - exact| <= 5% (rsd=0.02,
    so 5% is ~2.5 sigma) and emits booleans; the twin emits TRUE."""
    li = load(spark, sf_dir, "lineitem")

    # Sketches and exact distincts in SEPARATE sub-plans, joined on the
    # 3-row group key. Two distinct columns in one agg plan as Expand x3
    # (10.9s at sf0.1); even one approx + one countDistinct together is
    # worse — Spark's distinct rewrite then allocates an HLL buffer per
    # (flag, key) GROUP, i.e. ~150k sketches. Split: sketches build one
    # buffer per flag in a single scan; each exact distinct is the
    # standard two-level partial-distinct. (Production uses only the
    # sketch side — the exact branch exists for the bound check.)
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_o"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_p"),
    )
    exact_o = li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("e_o"))
    exact_p = li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("e_p"))
    agg = approx.join(exact_o, "l_returnflag").join(exact_p, "l_returnflag")
    within = lambda a, e, name: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= 0.05 * F.col(e)
    ).alias(name)
    return agg.select(
        "l_returnflag",
        within("a_o", "e_o", "orders_within_5pct"),
        within("a_p", "e_p", "parts_within_5pct"),
    )


@query(
    "q_hll_sketch",
    sql="""
    SELECT l_returnflag, TRUE AS roundtrip_within_5pct,
           TRUE AS reagg_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "dialect"),
    twin="invariant",
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery HLL_COUNT.* sketch surface (r6 C46) lowered onto
    Spark's Apache DataSketches builtins (sources/bq_dialect.py):
    INIT → hll_sketch_agg, MERGE_PARTIAL → hll_union_agg,
    MERGE/EXTRACT → estimate. The property under test is
    MERGEABILITY — per-(flag, status) sketches built once re-aggregate
    to per-flag counts without touching raw rows again: at 100 TB you
    persist fixed-size sketches per partition/day and roll them up
    later; the shuffle carries KB sketches, never values. Estimates
    can't hash-match an oracle, so the query asserts the re-aggregated
    estimate is within 5% of exact (lgConfigK=14 → rsd ~0.8%) and
    emits booleans; the twin emits TRUE (q_approx_distinct pattern)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("hll_li")
    cat = LakeCatalog(spark)
    # all four HLL_COUNT functions, two aggregation levels: INIT at
    # (flag, status), MERGE_PARTIAL+EXTRACT rolling up to flag, and
    # the single-level MERGE spelling as a cross-check
    approx = cat.bq_sql("""
        SELECT a.l_returnflag, a.n_rollup, b.n_direct FROM (
            SELECT l_returnflag,
                   HLL_COUNT.EXTRACT(HLL_COUNT.MERGE_PARTIAL(sketch))
                       AS n_rollup
            FROM (SELECT l_returnflag, l_linestatus,
                         HLL_COUNT.INIT(l_orderkey, 14) AS sketch
                  FROM hll_li GROUP BY l_returnflag, l_linestatus)
            GROUP BY l_returnflag
        ) a JOIN (
            SELECT l_returnflag, HLL_COUNT.MERGE(sketch2) AS n_direct
            FROM (SELECT l_returnflag, l_linestatus,
                         HLL_COUNT.INIT(l_orderkey, 14) AS sketch2
                  FROM hll_li GROUP BY l_returnflag, l_linestatus)
            GROUP BY l_returnflag
        ) b ON a.l_returnflag = b.l_returnflag
    """)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("e")
    )
    j = approx.join(exact, "l_returnflag")
    within = lambda a: (  # noqa: E731
        F.abs(F.col(a) - F.col("e")) <= 0.05 * F.col("e")
    )
    return j.select(
        "l_returnflag",
        within("n_rollup").alias("roundtrip_within_5pct"),
        within("n_direct").alias("reagg_within_5pct"),
    )


@query(
    "q_approx_quantile",
    sql="""
    SELECT l_linestatus, TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg", "approx"),
    twin="invariant",
)
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROX_QUANTILES via percentile_approx (GK sketch, mergeable).

    Driver-checkable bound form: a sketch result can't hash-match an
    exact oracle, so the query itself asserts |approx - exact| <= 5%
    per quartile and emits the booleans; the twin emits TRUE. (Arrays
    also crash the driver's pandas hasher — round-1 lesson: every
    driver-visible column must be scalar.)"""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_linestatus").agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000).alias("a"),
        F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").alias("e"),
    )

    def ok(i: int, name: str):
        a, e = F.col("a")[i], F.col("e")[i]
        return (F.abs(a - e) <= 0.05 * F.abs(e)).alias(name)

    return agg.select("l_linestatus", ok(0, "q25_ok"), ok(1, "q50_ok"), ok(2, "q75_ok"))


# ---------------------------------------------------------------------------
# B24 — exact percentile / median.
# ---------------------------------------------------------------------------


@query(
    "q_percentile",
    sql="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS p50_qty,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price,
           ROUND(MEDIAN(l_discount), 4) AS med_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile. Exact percentile requires the full
    group's values at one reducer — at 100 TB prefer q_approx_quantile."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.median("l_discount"), 4).alias("med_disc"),
    )


# ---------------------------------------------------------------------------
# B25 — ROLLUP / CUBE (grouping sets).
# ---------------------------------------------------------------------------


@query(
    "q_rollup",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', 'sum_qty')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: Spark plans grouping sets via Expand — one pass, no re-scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q_cube",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority,
           {dsum_sql('o_totalprice', 'sum_price')},
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over orders: all 4 grouping sets in one Expand pass."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        dsum("o_totalprice", "sum_price"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# B26 — filtered aggregation (COUNTIF / FILTER (WHERE ...)).
# ---------------------------------------------------------------------------


@query(
    "q_agg_filtered",
    sql=f"""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
           {dsum_sql('l_extendedprice', 'sum_all')},
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS sum_discounted
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg",),
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery COUNTIF / agg FILTER: conditional aggregates via when()."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        dsum("l_extendedprice", "sum_all"),
        F.sum(F.when(F.col("l_discount") > 0.05, dec("l_extendedprice")))
        .cast("double")
        .alias("sum_discounted"),
    )


# ---------------------------------------------------------------------------
# B27 — collect aggregates (ARRAY_AGG / STRING_AGG), sorted for determinism.
# ---------------------------------------------------------------------------


@query(
    "q_string_agg",
    sql="""
    SELECT c_nationkey,
           STRING_AGG(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           COUNT(*) AS n_cust
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg",),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING_AGG/ARRAY_AGG: collect_set + array_sort + concat_ws.

    collect_* is unordered in a distributed agg — always array_sort before
    serializing (SURVEY.md §5.3). Bounded here by distinct-segment count.
    """
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias("segments"),
        F.count(F.lit(1)).alias("n_cust"),
    )


# ---------------------------------------------------------------------------
# B28 — deterministic dedup on a key (the A12 exactly-once primitive,
# ref main.py:132-142: replayed ranges must collapse to one row per key).
# ---------------------------------------------------------------------------


@query(
    "q_dedup_key",
    sql="""
    SELECT user_id, event_type, event_id, ts
    FROM (
        SELECT user_id, event_type, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("agg", "dedup"),
)
def q_dedup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-event-per-(user,type): deterministic dropDuplicates.

    dropDuplicates() keeps an arbitrary row; for replay-idempotence
    (ref main.py:209-216 at-least-once bug) we need a *deterministic*
    survivor, so this is window row_number = 1 — one shuffle on the key.
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@query(
    "q_kll_sketch",
    sql="""
    SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS med_ok, TRUE AS p90_ok
    FROM orders GROUP BY o_orderstatus ORDER BY status
    """,
    tags=("agg", "approx", "dialect", "sketch"),
    twin="invariant",
)
def q_kll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery KLL_QUANTILES.* mergeable quantile sketches (r7 C55)
    lowered onto Spark's DataSketches KLL builtins (bq_dialect):
    INIT_INT64 → kll_sketch_agg_bigint, MERGE_PARTIAL_INT64 →
    kll_merge_agg_bigint, EXTRACT_POINT/COUNT → get_quantile/get_n.
    Same mergeability property as HLL (C46): per-(status, bucket)
    sketches built once roll up to per-status quantiles without
    re-touching raw rows — at 100 TB you persist KB-sized sketches per
    partition/day and answer any later quantile query from them.
    Invariant twin (sketch compaction is randomized): the sketch's n
    must equal the EXACT count (KLL never loses count), and the
    extracted median/p90 must land inside the exact ±2% rank window
    (k=2048 → normalized rank error ~0.6%, so the window is ~3 sigma);
    any merge/extract/typing bug lands outside and hash-mismatches."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("kll_orders")
    cat = LakeCatalog(spark)
    approx = cat.bq_sql("""
        SELECT o_orderstatus AS status,
               KLL_QUANTILES.COUNT_INT64(
                   KLL_QUANTILES.MERGE_PARTIAL_INT64(sk)) AS n_sk,
               KLL_QUANTILES.EXTRACT_POINT_INT64(
                   KLL_QUANTILES.MERGE_PARTIAL_INT64(sk), 0.5) AS med,
               KLL_QUANTILES.EXTRACT_POINT_INT64(
                   KLL_QUANTILES.MERGE_PARTIAL_INT64(sk), 0.9) AS p90
        FROM (SELECT o_orderstatus, o_orderkey % 8 AS b,
                     KLL_QUANTILES.INIT_INT64(o_orderkey, 2048) AS sk
              FROM kll_orders GROUP BY o_orderstatus, b)
        GROUP BY o_orderstatus
    """)
    # exact rank windows from the same data (percentile() is exact;
    # interpolation lies between the two bracketing order statistics,
    # so the window is conservative for a value-returning sketch)
    exact = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "percentile(o_orderkey, array(0.48, 0.52, 0.88, 0.92))"
        ).alias("q"),
    )
    j = approx.join(
        exact, approx.status == exact.o_orderstatus
    )
    return j.select(
        "status",
        F.col("n_sk").cast("long").alias("n"),
        (
            (F.col("n_sk") == F.col("n"))
            & (F.col("med") >= F.col("q")[0])
            & (F.col("med") <= F.col("q")[1])
        ).alias("med_ok"),
        (
            (F.col("p90") >= F.col("q")[2]) & (F.col("p90") <= F.col("q")[3])
        ).alias("p90_ok"),
    ).orderBy("status")
