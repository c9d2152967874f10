"""Tenth coverage pack: spatial grid join (BigQuery GIS ST_DWITHIN
join analogue) and URL parsing (BigQuery NET.HOST / NET.PUBLIC_SUFFIX
family analogue via parse_url).

Reference parity: Tier B extensions of the delegated SQL surface
(main.py:21, 160-185). The spatial join is the bucket-then-refine
pattern (operators/geo.py) — the fixture tables carry no coordinates,
so deterministic lattice positions derive from the keys, placing one
supplier ~7.8 km from every customer whose custkey mod 360 equals a
supplier key (so the result is non-trivial at every scale factor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

RADIUS_KM = 200.0

# ---------------------------------------------------------------------------
# Nearest-supplier ranking uses an INTEGER surrogate metric, not the
# haversine double: both coordinates live on a 0.05-degree lattice, so
# 20*(Δlat) and 20*(Δlon) round to exact integers on any engine, and
# rank ties break on s_suppkey. Ranking by the haversine itself would be
# engine-dependent in the last ulp (libm vs JVM trig) whenever two
# suppliers are near-equidistant. The haversine is display-only,
# rounded to 1 km.
# ---------------------------------------------------------------------------


@query(
    "q_geo_join",
    sql=f"""
    WITH cust AS (
        SELECT c_custkey,
               CAST((c_custkey % 120) - 60 + 0.25 AS DOUBLE) AS lat,
               CAST((c_custkey % 360) - 180 + 0.25 AS DOUBLE) AS lon
        FROM customer
    ),
    supp AS (
        SELECT s_suppkey,
               CAST((s_suppkey % 120) - 60 + 0.3 AS DOUBLE) AS lat,
               CAST((s_suppkey % 360) - 180 + 0.3 AS DOUBLE) AS lon
        FROM supplier
    ),
    pairs AS (
        SELECT c.c_custkey, s.s_suppkey,
               2 * 6371.0088 * asin(sqrt(
                   pow(sin(radians(s.lat - c.lat) / 2), 2)
                   + cos(radians(c.lat)) * cos(radians(s.lat))
                     * pow(sin(radians(s.lon - c.lon) / 2), 2))) AS dist_km,
               CAST(round(20 * (s.lat - c.lat)) AS BIGINT) AS dy,
               CAST(round(20 * (s.lon - c.lon)) AS BIGINT) AS dx
        FROM cust c JOIN supp s
          ON abs(c.lat - s.lat) <= 2 AND abs(c.lon - s.lon) <= 4
        WHERE 2 * 6371.0088 * asin(sqrt(
                  pow(sin(radians(s.lat - c.lat) / 2), 2)
                  + cos(radians(c.lat)) * cos(radians(s.lat))
                    * pow(sin(radians(s.lon - c.lon) / 2), 2))) <= {RADIUS_KM}
    )
    SELECT c_custkey, s_suppkey AS nearest_supp,
           ROUND(dist_km, 1) AS dist_km, n_within
    FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY c_custkey) AS n_within,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey
                   ORDER BY dy*dy + dx*dx, s_suppkey) AS rk
        FROM pairs
    ) WHERE rk = 1
    """,
    tags=("geo", "join", "tierb"),
)
def q_geo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within 200 km per customer, via the grid-cell
    candidate join (operators/geo.py grid_join) — never a cross
    product; the oracle twin brute-forces the same pairs with a bbox
    theta join (fine at fixture scale, which is exactly why OUR side
    doesn't do it that way)."""
    from bigquery_etl_spark.operators.geo import grid_join

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 120) - 60 + 0.25).cast("double").alias("lat"),
        ((F.col("c_custkey") % 360) - 180 + 0.25).cast("double").alias("lon"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") % 120) - 60 + 0.3).cast("double").alias("lat"),
        ((F.col("s_suppkey") % 360) - 180 + 0.3).cast("double").alias("lon"),
    )
    # r13 (guide §2.4): keep_coords returns the pair's own lat/lon from
    # the candidate join, so the exact integer surrogate metric needs NO
    # re-join of the base tables (was: 2 extra scans + broadcast builds
    # purely to recover values the join already carried)
    pairs = grid_join(
        cust,
        supp,
        RADIUS_KM,
        left_cols=("c_custkey", "lat", "lon"),
        right_cols=("s_suppkey", "lat", "lon"),
        keep_coords=True,
    )
    # exact integer surrogate metric for cross-engine-stable ranking
    scored = (
        pairs
        .withColumn("dy", F.round(20 * (F.col("r_lat") - F.col("l_lat"))).cast("long"))
        .withColumn("dx", F.round(20 * (F.col("r_lon") - F.col("l_lon"))).cast("long"))
    )
    w = W.partitionBy("c_custkey")
    wrk = w.orderBy(
        (F.col("dy") * F.col("dy") + F.col("dx") * F.col("dx")).asc(), F.col("s_suppkey")
    )
    return (
        scored.withColumn("n_within", F.count("*").over(w))
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_supp"),
            F.round("dist_km", 1).alias("dist_km"),
            "n_within",
        )
    )


# ---------------------------------------------------------------------------
# URL parsing (NET.* / HOST/PATH/QUERY-param extraction). URLs are
# synthesized deterministically from doc_id; Spark uses the native
# parse_url (JVM, codegen'd), the oracle re-derives the same parts with
# RE2 regexes — parity proves the extraction semantics line up.
# ---------------------------------------------------------------------------


@query(
    "q_url_parse",
    sql=r"""
    WITH urls AS (
        SELECT doc_id,
               'https://sub' || CAST(doc_id % 5 AS VARCHAR) || '.example'
                 || CAST(doc_id % 7 AS VARCHAR) || '.com/p/'
                 || CAST(doc_id AS VARCHAR) || '?q=term' || CAST(doc_id % 3 AS VARCHAR)
                 || '&page=' || CAST(doc_id % 10 AS VARCHAR) AS url
        FROM documents
    ),
    parsed AS (
        SELECT doc_id,
               regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param
        FROM urls
    )
    SELECT host, q_param, COUNT(*) AS n, MIN(doc_id) AS min_doc
    FROM parsed
    GROUP BY host, q_param
    """,
    tags=("tierb", "url", "string"),
)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url(HOST/PATH/QUERY:key) over synthesized URLs, rolled up
    by (host, query param) — the domain-slice report every crawl
    pipeline runs. Narrow maps + one hash agg."""
    docs = load(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://sub"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".example"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?q=term"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("&page="),
            (F.col("doc_id") % 10).cast("string"),
        ).alias("url"),
    )
    parsed = urls.select(
        "doc_id",
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY', 'q')").alias("q_param"),
    )
    return parsed.groupBy("host", "q_param").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("min_doc")
    )


# ---------------------------------------------------------------------------
# Connected components (dedup-cluster assembly): near-dup detectors emit
# PAIRS; clustering them into components picks one survivor per group.
# Spark side: iterative min-label propagation (operators/components.py —
# O(diameter) keyed shuffles, lineage cut per sweep). Oracle: recursive
# CTE transitive closure + min-reachable aggregation — tractable only at
# fixture scale, which is the point: the oracle brute-forces what the
# operator does scalably. Edges derive deterministically from doc_ids
# (intra-decade chains + one long-range merge per century).
# ---------------------------------------------------------------------------


@query(
    "q_connected_components",
    sql="""
    WITH RECURSIVE edges AS (
        SELECT d1.doc_id AS a, d2.doc_id AS b
        FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
        WHERE d1.doc_id % 10 < 3
        UNION ALL
        SELECT d1.doc_id, d2.doc_id
        FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 40
        WHERE d1.doc_id % 100 = 0
    ),
    und AS (
        SELECT a, b FROM edges WHERE a <> b
        UNION
        SELECT b, a FROM edges WHERE a <> b
    ),
    reach AS (
        SELECT a AS n, b AS m FROM und
        UNION
        SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a
        WHERE r.n <> u.b
    ),
    comp AS (
        SELECT n AS node, LEAST(n, MIN(m)) AS component
        FROM reach GROUP BY n
    )
    SELECT component, COUNT(*) AS n_nodes,
           MIN(node) AS min_doc, MAX(node) AS max_doc
    FROM comp GROUP BY component
    """,
    tags=("tierc", "graph", "dedup"),
)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster summary: component id (min doc in cluster),
    size, and id range, from iterative min-label propagation."""
    from bigquery_etl_spark.operators.components import connected_components

    docs = load(spark, sf_dir, "documents").select("doc_id")
    d1, d2 = docs.alias("d1"), docs.alias("d2")
    chain = d1.join(
        d2, F.col("d2.doc_id") == F.col("d1.doc_id") + 1
    ).filter(F.col("d1.doc_id") % 10 < 3)
    merge = d1.join(
        d2, F.col("d2.doc_id") == F.col("d1.doc_id") + 40
    ).filter(F.col("d1.doc_id") % 100 == 0)
    edges = chain.union(merge).select(
        F.col("d1.doc_id").alias("src"), F.col("d2.doc_id").alias("dst")
    )
    comp = connected_components(edges)
    return comp.groupBy("component").agg(
        F.count("*").alias("n_nodes"),
        F.min("node").alias("min_doc"),
        F.max("node").alias("max_doc"),
    )
