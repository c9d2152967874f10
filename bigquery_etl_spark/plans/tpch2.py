"""TPC-H suite completion: the 13 query shapes not yet covered by
``plans/tpch.py`` / ``plans/coverage4.py`` (Q1≡q_agg_hash, Q3, Q5, Q6,
Q7, Q8, Q10, Q14, Q18 already exist), adapted to the fixture star schema
(FIXTURES.md §1 — no ``partsupp``, no ``l_commitdate/l_receiptdate/
l_shipmode``, no ``c_phone``). Each adaptation preserves the query's
*characteristic plan shape* — that's what these exercise:

- Q2  min-price supplier        — correlated-min subquery → join-vs-agg
- Q4  order priority check      — EXISTS semi-join with non-equi residual
- Q9  product-type profit       — 5-way join + per-row arithmetic agg
- Q11 important stock           — scalar-subquery fraction-of-total HAVING
- Q12 late shipments            — join + dual conditional counts
- Q13 customer distribution     — outer join w/ ON-filter, agg-of-agg
- Q15 top supplier              — agg view + scalar-max equality join
- Q16 supplier diversity        — NOT IN anti-join + count-distinct agg
- Q17 small-quantity revenue    — correlated avg threshold (decorrelated)
- Q19 disjunctive predicates    — OR-of-AND pushdown through a join
- Q20 promotion candidates      — nested IN subqueries (semi-join chain)
- Q21 waiting suppliers         — EXISTS + NOT EXISTS on the same fact
- Q22 dormant customers         — anti-join + scalar avg threshold

These are the BigQuery-delegated Tier-B surface (SURVEY.md §2) at its
most plan-diverse; the reference itself implements none of them
(reference delegates all analytics: /root/reference/main.py:21,49-50,
160-185).

Scale notes (100 TB): every scalar subquery here is a one-row broadcast
(crossJoin of an aggregate), never a driver collect; every semi/anti
join hashes on the fact's join key so it shuffles once; Q16's NOT IN
uses a broadcast anti-join (blacklist is tiny); Q21 reuses one shuffle
of lineitem by l_orderkey for the self-semi/anti pair under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.plans._util import dec, dec_sql, dsum, dsum_sql
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load


# --------------------------------------------------------------------------
# Q2 — min-price supplier per part (partsupp→lineitem adaptation).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q2",
    sql="""
    WITH eligible AS (
        SELECT l_partkey, l_extendedprice, s_suppkey, s_name, s_acctbal, n_name
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name, e.l_extendedprice AS min_price
    FROM part
    JOIN eligible e ON e.l_partkey = p_partkey
    WHERE p_size = 15 AND p_type = 'ECONOMY'
      AND e.l_extendedprice = (
          SELECT MIN(e2.l_extendedprice) FROM eligible e2 WHERE e2.l_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch", "subquery", "join"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each ECONOMY size-15 part, the EUROPE supplier(s)
    offering it at the minimum observed price. The correlated-min
    subquery decorrelates to a per-part aggregate joined back on
    (partkey, price) — one shuffle of the fact, dims broadcast."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    eligible = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "l_extendedprice", "s_name", "s_acctbal", "n_name")
    )
    min_per_part = eligible.groupBy(F.col("l_partkey").alias("mp_key")).agg(
        F.min("l_extendedprice").alias("mp_min")
    )
    return (
        eligible.join(
            min_per_part,
            (eligible.l_partkey == F.col("mp_key"))
            & (eligible.l_extendedprice == F.col("mp_min")),
        )
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("l_extendedprice").alias("min_price"),
        )
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q4 — order-priority checking (EXISTS semi-join).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q4",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch", "join", "semi"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS → left-semi join with a non-equi residual
    (l_shipdate > o_orderdate); the lateness column never leaves the
    join, so only the priority column survives to the aggregate.
    Adaptation: 'commit<receipt' lateness → 'shipped after order date'
    (fixtures carry no commit/receipt dates)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year.
# --------------------------------------------------------------------------


@query(
    "q_tpch_q9",
    sql=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           {dsum_sql("l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity", "sum_profit")}
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: 5-way join, profit arithmetic per row, agg by
    (nation, year). Adaptation: ps_supplycost → 0.5 * p_retailprice
    (no partsupp table). Per-row doubles are IEEE-identical across
    engines; the SUM goes through the exact-decimal pattern."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(dec(profit)).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q11 — important stock (fraction-of-total scalar subquery).
# --------------------------------------------------------------------------

_Q11_FRACTION = 0.001


@query(
    "q_tpch_q11",
    sql=f"""
    WITH part_value AS (
        SELECT l_partkey, {dsum_sql("l_extendedprice * (1 - l_discount)", "value")}
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_7', 'NATION_8')
        GROUP BY l_partkey
    )
    SELECT l_partkey, value
    FROM part_value
    WHERE value > {_Q11_FRACTION} * (SELECT SUM(value) FROM part_value)
    ORDER BY value DESC, l_partkey
    """,
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: grouped value per part, kept only where it exceeds a
    fraction of the grand total (scalar subquery). The total is a
    one-row aggregate broadcast into the filter — no driver collect.
    Adaptation: ps_supplycost*ps_availqty → lineitem revenue for two
    nations' suppliers."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_7", "NATION_8"))
    revenue = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    part_value = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(revenue).cast("double").alias("value"))
    )
    total = part_value.agg(F.sum(dec("value")).cast("double").alias("_total"))
    return (
        part_value.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.lit(_Q11_FRACTION) * F.col("_total"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# --------------------------------------------------------------------------
# Q12 — late shipments by line status (dual conditional counts).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q12",
    sql="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND datediff('day', o_orderdate, l_shipdate) > 30
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: fact-fact join with a residual date-lag predicate and
    two CASE-counting aggregates in one pass. Adaptation: shipmode
    groups → line status; receipt-vs-commit lateness → ship lag > 30
    days."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 30)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join with ON-filter).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q13",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: the filter lives in the outer join's ON clause (NOT a
    WHERE — customers with zero matching orders must survive with
    count 0), then an aggregate of an aggregate."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q15 — top supplier (scalar-max equality against an agg view).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q15",
    sql=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "total_revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the CREATE VIEW revenue + max-equality join, as a
    reused DataFrame: the revenue aggregate is computed once, its max
    broadcast back against it. Exact-decimal sums make the equality
    comparison deterministic across engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 — supplier diversity per part attribute (NOT IN + count-distinct).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q16",
    sql="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%000000009%'
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "anti", "agg"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: NOT IN blacklist → broadcast left-anti join (the
    blacklist is provably non-null here, so anti-join ≡ NOT IN), then
    count-distinct suppliers per (brand, type, size). Adaptation:
    partsupp → lineitem as the part-supplier relation; complaint-string
    supplier filter → name-pattern blacklist."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    blacklist = load(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%000000009%")
    ).select("s_suppkey")
    return (
        li.join(blacklist, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg threshold).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q17",
    sql=f"""
    SELECT CAST(SUM({dec_sql("l_extendedprice")}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated AVG threshold, decorrelated into a per-part
    aggregate joined back to the fact. The avg is exact across engines
    (integer-valued quantities sum exactly in doubles). The threshold
    aggregate scans ALL lineitems of the brand's parts — the semi-join
    into the avg must not be filtered by the brand predicate's fact
    side, so the avg is computed from its own scan, keyed by partkey."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("aq_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("aq_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("aq_key"))
        .filter(F.col("l_quantity") < F.col("aq_threshold"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q19 — disjunctive brand/size/quantity predicates.
# --------------------------------------------------------------------------


@query(
    "q_tpch_q19",
    sql=f"""
    SELECT {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("tpch", "join", "scan"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-AND predicates mixing columns from both join
    sides. Catalyst pushes the single-side conjuncts it can derive
    (l_quantity ranges union to [1,30]; p_size to [1,15]) below the
    join and keeps the disjunction as a residual."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & (q >= 20) & (q <= 30))
    )
    revenue = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q20 — promotion candidates (nested IN subqueries).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q20",
    sql="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING SUM(l_quantity) > 100
      )
    ORDER BY s_name
    """,
    tags=("tpch", "subquery", "semi"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: two nested IN subqueries — parts by name pattern feed
    a grouped-HAVING over lineitem, whose keys semi-join supplier.
    Adaptation: 'availqty > half of shipped' → 'shipped > 100 units of
    red parts in 1997' (no partsupp availqty). Quantity sums are
    integer-valued, exact in both engines."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_4", "NATION_5")
    )
    red_parts = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    heavy_shippers = (
        li.join(red_parts, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(heavy_shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q21",
    sql="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name IN ('NATION_1', 'NATION_2')
      AND datediff('day', o_orderdate, l1.l_shipdate) > 90
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND datediff('day', o3.o_orderdate, l3.l_shipdate) > 90
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("tpch", "join", "semi", "anti"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the same fact appears three times — base, EXISTS
    (another supplier participated), NOT EXISTS (no OTHER supplier was
    late) — as a semi- then anti-join, both hashed on l_orderkey so
    AQE can reuse one exchange. Adaptation: receipt>commit lateness →
    ship lag > 90 days."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")

    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    l1 = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .filter(late)
        .select("l_orderkey", "l_suppkey")
    )
    # Any-other-supplier participation on the same order (semi).
    l2 = li.select(F.col("l_orderkey").alias("x_okey"), F.col("l_suppkey").alias("x_skey"))
    # Any-other-supplier ALSO late on the same order (anti).
    l3 = l1.select(F.col("l_orderkey").alias("y_okey"), F.col("l_suppkey").alias("y_skey"))
    waiting = (
        l1.join(l2, (F.col("l_orderkey") == F.col("x_okey")) & (F.col("l_suppkey") != F.col("x_skey")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("y_okey")) & (F.col("l_suppkey") != F.col("y_skey")), "left_anti")
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# --------------------------------------------------------------------------
# Q22 — dormant high-balance customers (anti-join + scalar avg).
# --------------------------------------------------------------------------


@query(
    "q_tpch_q22",
    sql=f"""
    WITH candidates AS (
        SELECT right(c_name, 2) AS cntrycode, c_acctbal, c_custkey
        FROM customer
        WHERE right(c_name, 2) IN ('11', '17', '25', '31', '13', '23', '29')
    )
    SELECT cntrycode, COUNT(*) AS numcust, {dsum_sql("c_acctbal", "totacctbal")}
    FROM candidates
    WHERE c_acctbal > (
          SELECT CAST(SUM({dec_sql("c_acctbal")}) AS DOUBLE) / COUNT(c_acctbal)
          FROM candidates WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("tpch", "subquery", "anti", "agg"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: candidate slice → scalar above-average-balance
    threshold (exact-decimal avg, broadcast) → NOT EXISTS anti-join
    against orders → agg by country code. Adaptations: phone prefix →
    last two digits of c_name (fixtures have no c_phone); 'never
    ordered' → 'no orders since 2000' (every fixture customer has
    orders)."""
    c = load(spark, sf_dir, "customer").withColumn("cntrycode", F.expr("right(c_name, 2)"))
    cand = c.filter(F.col("cntrycode").isin("11", "17", "25", "31", "13", "23", "29"))
    avg_bal = cand.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("_avg_bal")
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cand.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .orderBy("cntrycode")
    )
