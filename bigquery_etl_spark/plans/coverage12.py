"""Twelfth coverage pack (r8): the remaining everyday-BigQuery surface
from VERDICT r7 — the reference's users write BigQuery Standard SQL
(main.py:21, 160-185), and these are the highest-frequency gaps left:

- JSON_QUERY / JSON_EXTRACT subtree extraction, semantics-exact
  (quoted string leaves, 'null' for JSON nulls, order-preserving
  containers), plus the _ARRAY variants, JSON_TYPE and JSON typed
  literals (→ Spark VARIANT).
- TIME type + civil-time functions (EXTRACT(TIME), TIME_TRUNC/ADD/
  DIFF, FORMAT_TIME/PARSE_TIME).
- ARRAY_AGG(... ORDER BY key [DESC] LIMIT n) with arbitrary sort keys
  (struct-sort lowering).
- RANGE<DATE/TIMESTAMP> emulation (struct<lo,hi>) with
  RANGE_CONTAINS/RANGE_OVERLAPS/GENERATE_RANGE_ARRAY.
- GEOGRAPHY polygons, convex subset (ST_GEOGFROMTEXT POLYGON +
  ST_CONTAINS via codegen ray-casting).

Every query here runs VERBATIM BigQuery SQL through the dialect shim
(LakeCatalog.bq_sql) — the oracle twin recomputes the same values in
DuckDB's own dialect, so translation fidelity is what's adjudicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# One JSON document per orders row, built by IDENTICAL string concat on
# both engines, with deliberately UNSORTED object keys ("z" before "a"),
# a JSON null, a boolean, and a mixed-type array — the full set of cases
# the r7 verdict asked the twin to adjudicate.
_JSON_DOC_SPARK = (
    "'{\"id\": ' || CAST(o_orderkey AS STRING) || "
    "', \"status\": \"' || o_orderstatus || '\"' || "
    "', \"flag\": ' || CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END || "
    "', \"tags\": [\"a\", null, 3]' || "
    "', \"meta\": {\"z\": ' || CAST(o_orderkey % 7 AS STRING) || ', \"a\": \"x\"}' || "
    "', \"null_field\": null}'"
)
_JSON_DOC_DUCK = (
    "'{\"id\": ' || o_orderkey || "
    "', \"status\": \"' || o_orderstatus || '\"' || "
    "', \"flag\": ' || CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END || "
    "', \"tags\": [\"a\", null, 3]' || "
    "', \"meta\": {\"z\": ' || (o_orderkey % 7) || ', \"a\": \"x\"}' || "
    "', \"null_field\": null}'"
)


@query(
    "q_json_query",
    sql=f"""
    WITH j AS (
        SELECT o_orderkey AS k, {_JSON_DOC_DUCK} AS doc
        FROM orders WHERE o_orderkey % 8 = 1
    )
    SELECT k,
           json_extract(doc, '$.meta')::varchar AS obj,
           json_extract(doc, '$.tags')::varchar AS arr,
           json_extract(doc, '$.status')::varchar AS strq,
           json_extract(doc, '$.id')::varchar AS num,
           json_extract(doc, '$.flag')::varchar AS boolq,
           CASE WHEN json_type(doc::json, '$.null_field') = 'NULL'
                THEN 'null' ELSE json_extract(doc, '$.null_field')::varchar
           END AS jnull,
           json_extract(doc, '$.nope')::varchar AS missing,
           json_extract_string(doc, '$.status') AS scalar,
           CASE json_type(doc::json, '$.meta')
                WHEN 'OBJECT' THEN 'object' WHEN 'ARRAY' THEN 'array'
                WHEN 'VARCHAR' THEN 'string' WHEN 'BOOLEAN' THEN 'boolean'
                WHEN 'NULL' THEN 'null' ELSE 'number' END AS ty_obj,
           CASE json_type(doc::json, '$.tags[0]')
                WHEN 'OBJECT' THEN 'object' WHEN 'ARRAY' THEN 'array'
                WHEN 'VARCHAR' THEN 'string' WHEN 'BOOLEAN' THEN 'boolean'
                WHEN 'NULL' THEN 'null' ELSE 'number' END AS ty_str,
           CASE json_type(doc::json, '$.tags[1]')
                WHEN 'OBJECT' THEN 'object' WHEN 'ARRAY' THEN 'array'
                WHEN 'VARCHAR' THEN 'string' WHEN 'BOOLEAN' THEN 'boolean'
                WHEN 'NULL' THEN 'null' ELSE 'number' END AS ty_null,
           len(json_extract(doc, '$.tags[*]')) AS alen,
           json_extract('{{"k": [1, 2]}}', '$')::varchar AS jlit
    FROM j ORDER BY k
    """,
    tags=("dialect", "json"),
)
def q_json_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_QUERY/JSON_EXTRACT subtree extraction (r8, closing VERDICT
    r7 gap #1 — bq_dialect previously refused it): BigQuery SQL
    verbatim through the shim. The twin adjudicates every case the
    verdict named: object subtree with UNSORTED keys (order must be
    preserved — the variant-only lowering would sort), array subtree,
    quoted string leaf, number, boolean, JSON null (→ 'null', distinct
    from missing → NULL), missing path, JSON_VALUE unquoted scalar,
    JSON_TYPE vocabulary, JSON_ARRAY_LENGTH, and a JSON typed literal
    (→ PARSE_JSON → VARIANT → TO_JSON_STRING round-trip)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("jq_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql(f"""
        WITH j AS (
            SELECT o_orderkey AS k, {_JSON_DOC_SPARK} AS doc
            FROM jq_orders WHERE o_orderkey % 8 = 1
        )
        SELECT k,
               JSON_QUERY(doc, '$.meta') AS obj,
               JSON_EXTRACT(doc, '$.tags') AS arr,
               JSON_QUERY(doc, '$.status') AS strq,
               JSON_QUERY(doc, '$.id') AS num,
               JSON_QUERY(doc, '$.flag') AS boolq,
               JSON_QUERY(doc, '$.null_field') AS jnull,
               JSON_QUERY(doc, '$.nope') AS missing,
               JSON_VALUE(doc, '$.status') AS scalar,
               JSON_TYPE(doc, '$.meta') AS ty_obj,
               JSON_TYPE(doc, '$.tags[0]') AS ty_str,
               JSON_TYPE(doc, '$.tags[1]') AS ty_null,
               JSON_ARRAY_LENGTH(doc, '$.tags') AS alen,
               TO_JSON_STRING(JSON ' {{"k": [1, 2]}} ') AS jlit
        FROM j ORDER BY k
    """)


@query(
    "q_json_query_array",
    sql="""
    WITH j AS (
        SELECT o_orderkey AS k,
               '{"rows": [{"z": ' || o_orderkey || ', "a": 1}, "s", null, '
                   || (o_orderkey % 5) || ', true], "vals": ["x", null, '
                   || (o_orderkey % 3) || ']}' AS doc
        FROM orders WHERE o_orderkey % 16 = 1
    )
    SELECT k,
           array_to_string(
               [coalesce(x::varchar, 'null')
                for x in json_extract(doc, '$.rows[*]')], '|') AS qarr,
           array_to_string(
               [coalesce(x, '<null>')
                for x in json_extract_string(doc, '$.vals[*]')], '|') AS varr,
           len(json_extract(doc, '$.rows[*]')) AS n
    FROM j ORDER BY k
    """,
    tags=("dialect", "json"),
)
def q_json_query_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_QUERY_ARRAY / JSON_VALUE_ARRAY (r8): element-wise JSON
    encoding — container elements keep their key order (index-suffixed
    get_json_object route), string elements re-quote, JSON nulls →
    'null' text in the QUERY variant but NULL elements in the VALUE
    variant — both twinned against DuckDB's [*] extraction."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("jqa_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH j AS (
            SELECT o_orderkey AS k,
                   '{"rows": [{"z": ' || CAST(o_orderkey AS STRING)
                       || ', "a": 1}, "s", null, '
                       || CAST(o_orderkey % 5 AS STRING)
                       || ', true], "vals": ["x", null, '
                       || CAST(o_orderkey % 3 AS STRING) || ']}' AS doc
            FROM jqa_orders WHERE o_orderkey % 16 = 1
        )
        SELECT k,
               ARRAY_TO_STRING(JSON_QUERY_ARRAY(doc, '$.rows'), '|') AS qarr,
               ARRAY_TO_STRING(JSON_VALUE_ARRAY(doc, '$.vals'), '|',
                               '<null>') AS varr,
               JSON_ARRAY_LENGTH(doc, '$.rows') AS n
        FROM j ORDER BY k
    """)


@query(
    "q_time_type",
    sql="""
    WITH t AS (
        SELECT o_orderkey AS k,
               make_time((o_orderkey % 24)::int, (o_orderkey % 60)::int,
                         ((o_orderkey * 7) % 60)::double) AS tm,
               to_timestamp(1709600000 + o_orderkey) AS ts
        FROM orders WHERE o_orderkey % 8 = 1
    )
    SELECT k,
           tm::varchar AS tm,
           (ts::timestamp::TIME)::varchar AS t_ts,
           (ts::timestamp::TIME)::varchar AS t_ex,
           make_time(hour(tm), minute(tm), 0)::varchar AS t_min,
           make_time(hour(tm), 0, 0)::varchar AS t_hr,
           (tm + INTERVAL 45 MINUTE)::varchar AS t_add,
           (tm - INTERVAL 90 SECOND)::varchar AS t_sub,
           datediff('minute', TIME '12:00:00', tm) AS d_min,
           datediff('second', tm, TIME '23:59:59.25') AS d_sec,
           strftime(('1970-01-01 ' || tm::varchar)::timestamp,
                    '%H|%M|%S') AS fmt,
           strptime(
               lpad((k % 24)::varchar, 2, '0') || '-'
                   || lpad((k % 60)::varchar, 2, '0') || '-'
                   || lpad(((k * 7) % 60)::varchar, 2, '0'),
               '%H-%M-%S')::TIME::varchar AS parsed,
           (TIME '07:08:09.25')::varchar AS lit
    FROM t ORDER BY k
    """,
    tags=("dialect", "time"),
)
def q_time_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Civil TIME type + functions (r8, closing VERDICT r7 gap #3):
    BigQuery SQL verbatim through the shim. Spark 4.1's native TIME is
    only part-wired (CAST/EXTRACT/arithmetic raise
    UNSUPPORTED_TIME_TYPE), so the dialect lowers TIME onto canonical
    'HH:MM:SS[.ffffff]' strings — byte-identical to DuckDB's
    TIME::VARCHAR rendering, chronological under ORDER BY. Covered:
    TIME literals, TIME(h,m,s) and TIME(timestamp) constructors,
    EXTRACT(TIME FROM ts), TIME_TRUNC, TIME_ADD/TIME_SUB (mod-24h wrap,
    adjudicated by the +45min/-90s columns crossing midnight),
    TIME_DIFF boundary-crossing counts, FORMAT_TIME/PARSE_TIME %-codes
    — all twinned against DuckDB's native TIME."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("tt_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH t AS (
            SELECT o_orderkey AS k,
                   TIME(MOD(o_orderkey, 24), MOD(o_orderkey, 60),
                        MOD(o_orderkey * 7, 60)) AS tm,
                   TIMESTAMP_SECONDS(1709600000 + o_orderkey) AS ts
            FROM tt_orders WHERE o_orderkey % 8 = 1
        )
        SELECT k,
               tm,
               TIME(ts) AS t_ts,
               EXTRACT(TIME FROM ts) AS t_ex,
               TIME_TRUNC(tm, MINUTE) AS t_min,
               TIME_TRUNC(tm, HOUR) AS t_hr,
               TIME_ADD(tm, INTERVAL 45 MINUTE) AS t_add,
               TIME_SUB(tm, INTERVAL 90 SECOND) AS t_sub,
               TIME_DIFF(tm, TIME '12:00:00', MINUTE) AS d_min,
               TIME_DIFF(TIME '23:59:59.25', tm, SECOND) AS d_sec,
               FORMAT_TIME('%H|%M|%S', tm) AS fmt,
               PARSE_TIME('%H-%M-%S',
                   CONCAT(LPAD(CAST(MOD(k, 24) AS STRING), 2, '0'), '-',
                          LPAD(CAST(MOD(k, 60) AS STRING), 2, '0'), '-',
                          LPAD(CAST(MOD(k * 7, 60) AS STRING), 2, '0')))
                   AS parsed,
               TIME '07:08:09.250' AS lit
        FROM t ORDER BY k
    """)


@query(
    "q_array_agg_ordered",
    sql="""
    SELECT c_mktsegment,
           array_to_string(
               list(c_name ORDER BY c_acctbal DESC, c_name DESC)[1:3],
               '|') AS top3,
           array_to_string(
               list(DISTINCT c_nationkey::varchar
                    ORDER BY c_nationkey::varchar)[1:5], ',') AS nat5,
           array_to_string(
               list(c_custkey::varchar
                    ORDER BY c_acctbal DESC, c_custkey DESC)[1:2],
               '|') AS s2,
           len(list(c_name ORDER BY c_acctbal DESC, c_name DESC)[1:3])
               AS n3
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("dialect", "aggregate"),
)
def q_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_AGG / STRING_AGG with arbitrary ORDER BY keys and LIMIT
    (r8, closing VERDICT r7 gap #6 — the dialect previously refused
    non-self sort keys). Lowering: collect struct(keys…, value),
    sort_array (struct comparison is lexicographic), slice, transform
    — one hash-agg pass, no window, no shuffle beyond the group-by.
    The secondary DESC key makes ties deterministic on both engines;
    DISTINCT rides collect_set with BigQuery's own order-by-self
    restriction. Twin: DuckDB's native ordered list() aggregates with
    slicing."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("aao_cust")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        SELECT c_mktsegment,
               ARRAY_TO_STRING(
                   ARRAY_AGG(c_name ORDER BY c_acctbal DESC, c_name DESC
                             LIMIT 3), '|') AS top3,
               ARRAY_TO_STRING(
                   ARRAY_AGG(DISTINCT CAST(c_nationkey AS STRING)
                             ORDER BY CAST(c_nationkey AS STRING)
                             LIMIT 5), ',') AS nat5,
               STRING_AGG(CAST(c_custkey AS STRING), '|'
                          ORDER BY c_acctbal DESC, c_custkey DESC
                          LIMIT 2) AS s2,
               ARRAY_LENGTH(
                   ARRAY_AGG(c_name ORDER BY c_acctbal DESC, c_name DESC
                             LIMIT 3)) AS n3
        FROM aao_cust GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


@query(
    "q_range_type",
    sql="""
    WITH r AS (
        SELECT o_orderkey AS k,
               o_orderdate::date AS lo,
               o_orderdate::date + ((o_orderkey % 45) + 1)::int AS hi
        FROM orders WHERE o_orderkey % 8 = 1
    )
    SELECT k,
           lo::varchar AS r_start,
           hi::varchar AS r_end,
           (DATE '1995-06-15' >= lo AND DATE '1995-06-15' < hi)
               AS contains_d,
           (lo < DATE '1995-07-01' AND DATE '1995-06-01' < hi)
               AS overlaps_jun,
           CAST(ceil(date_diff('day', lo, hi) / 7.0) AS BIGINT) AS n_weeks,
           greatest(lo, DATE '1995-06-01')::varchar AS ix_lo,
           least(hi, DATE '1995-07-01')::varchar AS ix_hi
    FROM r ORDER BY k
    """,
    tags=("dialect", "range"),
)
def q_range_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE<DATE> emulation (r8, closing VERDICT r7 gap #8): BigQuery
    RANGE typed literals, RANGE() constructor, RANGE_START/END,
    RANGE_CONTAINS (half-open), RANGE_OVERLAPS, RANGE_INTERSECT and
    GENERATE_RANGE_ARRAY — lowered onto struct<lo,hi> (codegen
    comparisons, no UDF). n_weeks adjudicates GENERATE_RANGE_ARRAY's
    last-partial-subrange behavior against a closed-form ceil; the
    intersect columns adjudicate the struct algebra. The oracle
    recomputes every predicate from raw dates in DuckDB."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("rt_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH r AS (
            SELECT o_orderkey AS k,
                   RANGE(CAST(o_orderdate AS DATE),
                         DATE_FROM_UNIX_DATE(
                             UNIX_DATE(CAST(o_orderdate AS DATE))
                                 + MOD(o_orderkey, 45) + 1)) AS rng
            FROM rt_orders WHERE o_orderkey % 8 = 1
        )
        SELECT k,
               CAST(RANGE_START(rng) AS STRING) AS r_start,
               CAST(RANGE_END(rng) AS STRING) AS r_end,
               RANGE_CONTAINS(rng, DATE '1995-06-15') AS contains_d,
               RANGE_OVERLAPS(rng, RANGE<DATE> '[1995-06-01, 1995-07-01)')
                   AS overlaps_jun,
               CAST(ARRAY_LENGTH(
                   GENERATE_RANGE_ARRAY(rng, INTERVAL 7 DAY)) AS INT64)
                   AS n_weeks,
               CAST(RANGE_START(RANGE_INTERSECT(rng,
                   RANGE<DATE> '[1995-06-01, 1995-07-01)')) AS STRING)
                   AS ix_lo,
               CAST(RANGE_END(RANGE_INTERSECT(rng,
                   RANGE<DATE> '[1995-06-01, 1995-07-01)')) AS STRING)
                   AS ix_hi
        FROM r ORDER BY k
    """)


# Convex pentagon fence for q_gis_polygon — ONE vertex list generates
# both the BigQuery WKT (Spark side) and the DuckDB closed-form oracle,
# so the two engines evaluate the identical planar ray-cast +
# min-edge-distance formulas.
_PENTA = [(-30.0, -20.0), (30.0, -25.0), (45.0, 10.0), (0.0, 35.0),
          (-40.0, 15.0)]
_PENTA_WKT = (
    "POLYGON(("
    + ", ".join(f"{x} {y}" for x, y in _PENTA + [_PENTA[0]])
    + "))"
)


def _duck_geo_edge(
    ax: float, ay: float, bx: float, by: float,
    q3: tuple[float, float, float] | None = None,
) -> str:
    """One DuckDB edge struct carrying the r11 geodesic DISTANCE
    constants — u = n×A, v = B×n (unnormalized; the in-arc sign tests
    are scale-invariant) and n̂ — plus (r12) the geodesic CONTAINMENT
    constants for the S2 crossing predicate against reference point
    ``q3``: n, n·Q, Q×A, Q×B. All computed by the SAME Python helpers
    the Spark lowering uses (bq_dialect), so the constants embedded in
    the two engines' SQL are bit-identical."""
    import math

    from bigquery_etl_spark.sources.bq_dialect import _cross3, _unit3

    A, B = _unit3(ax, ay), _unit3(bx, by)
    n = _cross3(A, B)
    nn = math.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    nh = (n[0] / nn, n[1] / nn, n[2] / nn)
    u = _cross3(n, A)
    v = _cross3(B, n)
    q3 = q3 or (0.0, 0.0, -1.0)
    nq = n[0] * q3[0] + n[1] * q3[1] + n[2] * q3[2]
    qa = _cross3(q3, A)
    qb = _cross3(q3, B)
    return (
        f"{{'ax': {ax!r}, 'ay': {ay!r}, 'bx': {bx!r}, 'by': {by!r}, "
        f"'ux': {u[0]!r}, 'uy': {u[1]!r}, 'uz': {u[2]!r}, "
        f"'vx': {v[0]!r}, 'vy': {v[1]!r}, 'vz': {v[2]!r}, "
        f"'nhx': {nh[0]!r}, 'nhy': {nh[1]!r}, 'nhz': {nh[2]!r}, "
        f"'n1': {n[0]!r}, 'n2': {n[1]!r}, 'n3': {n[2]!r}, "
        f"'nq': {nq!r}, "
        f"'qax': {qa[0]!r}, 'qay': {qa[1]!r}, 'qaz': {qa[2]!r}, "
        f"'qbx': {qb[0]!r}, 'qby': {qb[1]!r}, 'qbz': {qb[2]!r}}}"
    )


def _duck_ring_edges(rings, polys=None) -> str:
    """Flattened edge structs for DuckDB. ``polys`` (r12) is the
    [[shell, hole, ...], ...] structure used to pick the SAME outside
    reference point as the Spark lowering; defaults to each ring as
    its own shell (matching _poly_contains's fallback)."""
    from bigquery_etl_spark.sources.bq_dialect import _pick_outside_q

    q3 = _pick_outside_q(polys if polys is not None
                         else [[r] for r in rings])
    return "[" + ", ".join(
        _duck_geo_edge(ax, ay, *ring[(i + 1) % len(ring)], q3=q3)
        for ring in rings
        for i, (ax, ay) in enumerate(ring)
    ) + "]"


def _duck_penta_edges() -> str:
    return _duck_ring_edges([_PENTA], polys=[[_PENTA]])


_DUCK_HAV = (
    "2.0 * 6371008.8 * asin(sqrt("
    "power(sin(radians(plat - ({cy})) / 2), 2) + "
    "cos(radians({cy})) * cos(radians(plat)) * "
    "power(sin(radians(plon - ({cx})) / 2), 2)))"
)

# the point's unit 3-vector (shared by the geodesic edge distance)
_DUCK_PX = "(cos(radians(plat)) * cos(radians(plon)))"
_DUCK_PY = "(cos(radians(plat)) * sin(radians(plon)))"
_DUCK_PZ = "(sin(radians(plat)))"

# r11 geodesic point-to-arc distance per edge — the DuckDB mirror of
# bq_dialect._seg_geo_sql: same constants, same closed form
_DUCK_GEO_EDGE_DIST = (
    "CASE WHEN (" + _DUCK_PX + " * __e.ux + " + _DUCK_PY + " * __e.uy + "
    + _DUCK_PZ + " * __e.uz) >= 0 AND ("
    + _DUCK_PX + " * __e.vx + " + _DUCK_PY + " * __e.vy + "
    + _DUCK_PZ + " * __e.vz) >= 0 "
    "THEN 6371008.8 * asin(least(1.0, abs("
    + _DUCK_PX + " * __e.nhx + " + _DUCK_PY + " * __e.nhy + "
    + _DUCK_PZ + " * __e.nhz))) "
    "ELSE least(" + _DUCK_HAV.format(cx="__e.ax", cy="__e.ay") + ", "
    + _DUCK_HAV.format(cx="__e.bx", cy="__e.by") + ") END"
)

# r12 geodesic even-odd cast — the DuckDB mirror of the Spark
# _poly_contains unroll: S2's 4-sign crossing predicate between each
# edge's minor arc and the arc point→Q, same folded constants. s and
# the three gates spell the identical sign algebra (s = −P·n; crossing
# iff s·(n·Q) > 0 ∧ s·(−P·(Q×B)) > 0 ∧ s·(P·(Q×A)) > 0).
_DUCK_S = (
    "(-(" + _DUCK_PX + " * __e.n1 + " + _DUCK_PY + " * __e.n2 + "
    + _DUCK_PZ + " * __e.n3))"
)
_DUCK_INSIDE = (
    "(list_sum(list_transform(edges, __e -> CASE WHEN "
    + _DUCK_S + " * __e.nq > 0 AND "
    + _DUCK_S + " * (-(" + _DUCK_PX + " * __e.qbx + "
    + _DUCK_PY + " * __e.qby + " + _DUCK_PZ + " * __e.qbz)) > 0 AND "
    + _DUCK_S + " * (" + _DUCK_PX + " * __e.qax + "
    + _DUCK_PY + " * __e.qay + " + _DUCK_PZ + " * __e.qaz) > 0 "
    "THEN 1 ELSE 0 END)) % 2 = 1)"
)

_DUCK_DIST = (
    "CASE WHEN " + _DUCK_INSIDE + " THEN 0.0 ELSE "
    "list_aggregate(list_transform(edges, __e -> "
    + _DUCK_GEO_EDGE_DIST
    + "), 'min') END"
)


@query(
    "q_gis_polygon",
    sql=f"""
    WITH pts AS (
        SELECT c_mktsegment,
               CAST(((c_custkey * 13) % 360) - 180 + 0.5 AS DOUBLE) AS plon,
               CAST(((c_custkey * 7) % 140) - 70 + 0.25 AS DOUBLE) AS plat,
               {_duck_penta_edges()} AS edges
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN {_DUCK_INSIDE} THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           CAST(SUM(CASE WHEN {_DUCK_DIST} <= 3000000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_near,
           CAST(SUM(CAST(round({_DUCK_DIST}) AS BIGINT)) AS BIGINT)
               AS total_m
    FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("dialect", "geo"),
)
def q_gis_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOGRAPHY polygons, convex subset (r8, closing VERDICT r7 gap
    #5): ST_GEOGFROMTEXT('POLYGON((…))') parses + convexity-checks the
    ring at translate time into array<struct<lon,lat>>; ST_CONTAINS is
    an even-odd ray cast and ST_DISTANCE/ST_DWITHIN(point, polygon)
    the min over edges of the haversine to the planar-projected
    closest segment point — all array-HOF folds inside whole-stage
    codegen, no UDF, no shuffle beyond the group-by. Edges are planar
    in lon/lat where BigQuery's are geodesics (documented divergence;
    the ORACLE applies the identical formula, so parity is exact where
    checked — same contract as C51's point algebra). Non-convex /
    multi-ring WKT refuses loudly at translate time."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("gp_cust")
    cat = LakeCatalog(spark)
    return cat.bq_sql(f"""
        WITH pts AS (
            SELECT c_mktsegment,
                   ST_GEOGPOINT(
                       CAST(MOD(c_custkey * 13, 360) - 180 + 0.5
                            AS FLOAT64),
                       CAST(MOD(c_custkey * 7, 140) - 70 + 0.25
                            AS FLOAT64)) AS pt
            FROM gp_cust
        )
        SELECT c_mktsegment,
               COUNTIF(ST_CONTAINS(
                   ST_GEOGFROMTEXT('{_PENTA_WKT}'), pt)) AS n_inside,
               COUNTIF(ST_DWITHIN(pt,
                   ST_GEOGFROMTEXT('{_PENTA_WKT}'), 3000000.0)) AS n_near,
               CAST(SUM(CAST(ROUND(ST_DISTANCE(pt,
                   ST_GEOGFROMTEXT('{_PENTA_WKT}'))) AS INT64)) AS INT64)
                   AS total_m
        FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


# r9 concave + hole fence for q_gis_polygon_concave: a 7-vertex star
# with a deep notch (concave at two vertices) and a square hole near
# the middle. One vertex table generates both the BigQuery WKT and the
# DuckDB closed-form oracle, same contract as the pentagon above —
# even-odd ray cast over ALL rings' edges IS the holes semantics.
_STAR = [(-35.0, -25.0), (0.0, -10.0), (35.0, -30.0), (20.0, 5.0),
         (40.0, 30.0), (0.0, 12.0), (-30.0, 28.0)]
_STAR_HOLE = [(-6.0, -4.0), (6.0, -4.0), (6.0, 4.0), (-6.0, 4.0)]
_STAR_WKT = "POLYGON(" + ", ".join(
    "(" + ", ".join(f"{x} {y}" for x, y in ring + [ring[0]]) + ")"
    for ring in (_STAR, _STAR_HOLE)
) + ")"


def _duck_star_edges() -> str:
    return _duck_ring_edges([_STAR, _STAR_HOLE], polys=[[_STAR, _STAR_HOLE]])


@query(
    "q_gis_polygon_concave",
    sql=f"""
    WITH pts AS (
        SELECT c_mktsegment,
               CAST(((c_custkey * 17) % 160) - 80 + 0.5 AS DOUBLE) AS plon,
               CAST(((c_custkey * 11) % 120) - 60 + 0.25 AS DOUBLE) AS plat,
               {_duck_star_edges()} AS edges
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN {_DUCK_INSIDE} THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           CAST(SUM(CASE WHEN {_DUCK_DIST} <= 2000000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_near,
           CAST(SUM(CAST(round({_DUCK_DIST}) AS BIGINT)) AS BIGINT)
               AS total_m
    FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("dialect", "geo"),
)
def q_gis_polygon_concave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOGRAPHY polygons, general simple rings (r9, closing VERDICT r8
    gap #3): the r8 convexity restriction is LIFTED — the even-odd ray
    cast never needed it — and holes land as nested ring arrays whose
    edges join the same parity count. ST_GEOGFROMTEXT validates at
    translate time: self-intersecting rings, degenerate (zero-area)
    rings, crossing rings and holes outside the shell all refuse
    loudly. Same planar-edge + haversine contract as q_gis_polygon; the
    ORACLE applies the identical formula over the identical edge list,
    so parity is exact. Cited reference surface: BigQuery ST_CONTAINS/
    ST_DISTANCE on GEOGRAPHY (delegated surface, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("gpc_cust")
    cat = LakeCatalog(spark)
    return cat.bq_sql(f"""
        WITH pts AS (
            SELECT c_mktsegment,
                   ST_GEOGPOINT(
                       CAST(MOD(c_custkey * 17, 160) - 80 + 0.5
                            AS FLOAT64),
                       CAST(MOD(c_custkey * 11, 120) - 60 + 0.25
                            AS FLOAT64)) AS pt
            FROM gpc_cust
        )
        SELECT c_mktsegment,
               COUNTIF(ST_CONTAINS(
                   ST_GEOGFROMTEXT('{_STAR_WKT}'), pt)) AS n_inside,
               COUNTIF(ST_DWITHIN(pt,
                   ST_GEOGFROMTEXT('{_STAR_WKT}'), 2000000.0)) AS n_near,
               CAST(SUM(CAST(ROUND(ST_DISTANCE(pt,
                   ST_GEOGFROMTEXT('{_STAR_WKT}'))) AS INT64)) AS INT64)
                   AS total_m
        FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


@query(
    "q_json_mutators",
    sql="""
    WITH j AS (
        SELECT o_orderkey AS k, o_orderkey % 5 AS m, o_orderkey % 9 AS n
        FROM orders WHERE o_orderkey % 16 = 1
    )
    SELECT k,
           '{"id":' || k || ',"a":{"x":' || m
               || ',"drop":null},"tags":[1,null,3]}' AS set1,
           '{"id":' || k
               || ',"a":{"x":1,"drop":null},"tags":[1,null,3],'
               || '"b":{"c":"hi"}}' AS set_new,
           '{"id":' || k || ',"a":{"x":1},"tags":[1,3]}' AS removed,
           '{"id":' || k || ',"a":{"x":1},"tags":[1,3]}' AS stripped,
           '{"id":' || k
               || ',"a":{"x":1,"drop":null},"tags":[1,null,3,null,true]}'
               AS padded,
           13 AS li_str,
           1 AS li_bool,
           12.7 AS lf,
           TRUE AS lb,
           n::varchar AS ls,
           CAST(NULL AS BIGINT) AS l_arr
    FROM j ORDER BY k
    """,
    tags=("dialect", "json"),
    # the oracle STATES the expected documents closed-form (DuckDB has
    # no json_set) — value-exact adjudication, but not comparable WORK,
    # so it stays out of the bench's DuckDB-matched ratio
    twin="invariant",
)
def q_json_mutators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON mutators + LAX conversions (r8): JSON_SET (in-place set,
    missing-path creation, array padding with nulls), JSON_REMOVE
    (multi-path), JSON_STRIP_NULLS (objects AND arrays, BigQuery
    defaults) — Arrow-batched mutator UDFs (the sanctioned fallback
    tier: Spark has no subtree-rewrite builtin; values cross as
    to_json(named_struct) so types survive exactly) — plus the pure-
    codegen LAX_INT64/LAX_FLOAT64/LAX_BOOL/LAX_STRING family (numeric
    strings convert, INT64 rounds half away from zero, booleans map,
    containers → NULL). The oracle states every expected document as a
    closed-form string and every LAX value as a constant — one
    serialization convention (minimal separators, insertion order) on
    both sides."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("jm_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH j AS (
            SELECT o_orderkey AS k,
                   '{ "id": ' || CAST(o_orderkey AS STRING)
                       || ', "a": {"x": 1, "drop": null}, '
                       || '"tags": [1, null, 3] }' AS doc,
                   '{"s": "12.7", "b": true, "t": "TRUE", "n": '
                       || CAST(o_orderkey % 9 AS STRING)
                       || ', "arr": [1]}' AS doc2,
                   o_orderkey % 5 AS m
            FROM jm_orders WHERE o_orderkey % 16 = 1
        )
        SELECT k,
               JSON_SET(doc, '$.a.x', m) AS set1,
               JSON_SET(doc, '$.b.c', 'hi') AS set_new,
               JSON_REMOVE(doc, '$.a.drop', '$.tags[1]') AS removed,
               JSON_STRIP_NULLS(doc) AS stripped,
               JSON_SET(doc, '$.tags[4]', TRUE) AS padded,
               LAX_INT64(doc2, '$.s') AS li_str,
               LAX_INT64(doc2, '$.b') AS li_bool,
               LAX_FLOAT64(doc2, '$.s') AS lf,
               LAX_BOOL(doc2, '$.t') AS lb,
               LAX_STRING(doc2, '$.n') AS ls,
               LAX_INT64(doc2, '$.arr') AS l_arr
        FROM j ORDER BY k
    """)


@query(
    "q_interval_type",
    sql="""
    WITH t AS (
        SELECT o_orderkey AS k,
               o_orderkey % 13 AS mm,
               o_orderkey % 50 AS dd,
               o_orderkey % 30 AS hh
        FROM orders WHERE o_orderkey % 16 = 1
    )
    SELECT k,
           CAST(TIMESTAMP '2024-01-31 00:00:00'
                + to_months(CAST(mm AS INT))
                + to_days(CAST(dd AS INT)) AS VARCHAR) AS ts_add,
           CAST(TIMESTAMP '2024-03-15 00:00:00'
                - to_months(CAST(mm AS INT)) AS VARCHAR) AS ts_sub,
           CAST(TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 MONTH
                + INTERVAL 2 DAY + INTERVAL 3 HOUR + INTERVAL 4 MINUTE
                + INTERVAL 5 SECOND AS VARCHAR) AS lit_add,
           CAST((dd + hh // 24) // 30 AS INT) AS jm,
           CAST((dd + hh // 24) % 30 AS INT) AS jd,
           CAST((hh % 24) * 3600000000 AS BIGINT) AS ju,
           CAST(mm * 12 + 2 AS INT) AS mk_months,
           CAST(dd AS INT) AS mk_days,
           CAST(hh * 3600000000 AS BIGINT) AS mk_micros
    FROM t ORDER BY k
    """,
    tags=("dialect", "types"),
)
def q_interval_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL surface (r9, VERDICT r8 gap #8): BigQuery's single
    (months, days, micros) interval mapped two ways — ARITHMETIC
    position lowers ``ts ± INTERVAL '…' PART TO PART`` and
    ``ts ± MAKE_INTERVAL(…)`` to chains of Spark's native YEAR-MONTH /
    DAY-TIME intervals (calendar-aware month math with end-of-month
    clamping stays in the JVM kernel, identical to DuckDB's), VALUE
    position carries struct<months,days,micros> (BigQuery's and
    DuckDB's own internal triple) with JUSTIFY_DAYS/HOURS/INTERVAL as
    exact integer codegen (DIV, no float division). The oracle
    restates the justify closed forms and runs the same native
    interval adds."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("iv_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH t AS (
            SELECT o_orderkey AS k,
                   MOD(o_orderkey, 13) AS mm,
                   MOD(o_orderkey, 50) AS dd,
                   MOD(o_orderkey, 30) AS hh
            FROM iv_orders WHERE MOD(o_orderkey, 16) = 1
        )
        SELECT k,
               CAST(TIMESTAMP '2024-01-31 00:00:00'
                    + MAKE_INTERVAL(month => mm, day => dd) AS STRING)
                   AS ts_add,
               CAST(TIMESTAMP '2024-03-15 00:00:00'
                    - MAKE_INTERVAL(month => mm) AS STRING) AS ts_sub,
               CAST(TIMESTAMP '2024-01-01 00:00:00'
                    + INTERVAL '0-1 2 3:4:5' YEAR TO SECOND AS STRING)
                   AS lit_add,
               JUSTIFY_INTERVAL(
                   MAKE_INTERVAL(day => dd, hour => hh)).months AS jm,
               JUSTIFY_INTERVAL(
                   MAKE_INTERVAL(day => dd, hour => hh)).days AS jd,
               JUSTIFY_INTERVAL(
                   MAKE_INTERVAL(day => dd, hour => hh)).micros AS ju,
               MAKE_INTERVAL(year => mm, month => 2).months AS mk_months,
               INTERVAL '0' DAY.days + CAST(dd AS INT64) AS mk_days,
               MAKE_INTERVAL(hour => hh).micros AS mk_micros
        FROM t
    """)


@query(
    "q_js_udf_subset",
    sql="""
    WITH t AS (
        SELECT o_orderkey AS k,
               o_orderkey % 100 AS n,
               'order-' || (o_orderkey % 7) AS s
        FROM orders WHERE o_orderkey % 16 = 1
    )
    SELECT k,
           CAST(n * 2 + 1 AS BIGINT) AS dbl,
           upper(trim(s)) || ':' || CAST(CAST(floor(n / 7.0 + 0.5)
               AS BIGINT) AS VARCHAR) AS fmt,
           CAST(CASE WHEN n > 50 THEN sqrt(n) ELSE n * n END
               AS DOUBLE) AS tern,
           CAST(strpos(s, '3') - 1 AS BIGINT) AS ix,
           CAST(n * (n + 1) * (n + 2) AS DOUBLE) AS p3,
           substr(s, 1, 1) || '-' || substr(s, 2, 1) || '-'
               || substr(s, 3, 1) || '-' AS mask,
           CAST(n - 1 AS DOUBLE) AS st_lo,
           CAST(n + 1 AS DOUBLE) AS st_hi
    FROM t ORDER BY k
    """,
    tags=("dialect", "udf"),
)
def q_js_udf_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JS UDF narrow subset (r9, VERDICT r8 gap #9): BigQuery
    ``LANGUAGE js`` bodies that are side-effect-free arithmetic/string
    expressions translate AT DDL TIME to SQL (sources/js_udf.py — a
    precedence-climbing JS-expression parser with a type tagger for
    the ``+`` add-vs-concat overload, JS half-up Math.round as
    FLOOR(x+0.5), JS -1-based indexOf via INSTR-1) and inline into
    Catalyst like any SQL-bodied function: zero runtime JS, zero
    Python, whole-stage codegen. Objects/closures/regex/.replace
    refuse loudly naming the construct (tested in test_bq_dialect).
    The oracle restates the identical arithmetic closed forms."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("js_orders")
    cat = LakeCatalog(spark)
    cat.bq_sql(
        'CREATE TEMP FUNCTION js_dbl(x INT64) RETURNS INT64 '
        'LANGUAGE js AS "return x * 2 + 1;";'
    )
    cat.bq_sql(
        "CREATE TEMP FUNCTION js_fmt(s STRING, n FLOAT64) "
        "RETURNS STRING LANGUAGE js AS "
        '"return s.trim().toUpperCase() + \':\' '
        '+ String(Math.round(n / 7));";'
    )
    cat.bq_sql(
        'CREATE TEMP FUNCTION js_tern(n FLOAT64) RETURNS FLOAT64 '
        'LANGUAGE js AS "return n > 50 ? Math.sqrt(n) : n * n;";'
    )
    cat.bq_sql(
        "CREATE TEMP FUNCTION js_ix(s STRING) RETURNS INT64 "
        'LANGUAGE js AS "return s.indexOf(\'3\');";'
    )
    # r13 legs (VERDICT r12 item 5): a literal-bound for loop that
    # UNROLLS at DDL time (accumulating product via reassignment), a
    # string-building loop over charAt, and an object-literal return
    # lowered to NAMED_STRUCT + CAST to the declared STRUCT type
    cat.bq_sql(
        "CREATE TEMP FUNCTION js_p3(n FLOAT64) RETURNS FLOAT64 "
        'LANGUAGE js AS "var p = 1; '
        "for (var i = 0; i < 3; i++) { p = p * (n + i); } "
        'return p;";'
    )
    cat.bq_sql(
        "CREATE TEMP FUNCTION js_mask(s STRING) RETURNS STRING "
        'LANGUAGE js AS "var m = \'\'; '
        "for (var i = 0; i < 3; i++) { m = m + s.charAt(i) + '-'; } "
        'return m;";'
    )
    cat.bq_sql(
        "CREATE TEMP FUNCTION js_band(n FLOAT64) "
        "RETURNS STRUCT<lo FLOAT64, hi FLOAT64> "
        'LANGUAGE js AS "return {lo: n - 1, hi: n + 1};";'
    )
    return cat.bq_sql("""
        WITH t AS (
            SELECT o_orderkey AS k,
                   MOD(o_orderkey, 100) AS n,
                   CONCAT('order-', CAST(MOD(o_orderkey, 7) AS STRING))
                       AS s
            FROM js_orders WHERE MOD(o_orderkey, 16) = 1
        )
        SELECT k,
               js_dbl(n) AS dbl,
               js_fmt(s, CAST(n AS FLOAT64)) AS fmt,
               js_tern(CAST(n AS FLOAT64)) AS tern,
               js_ix(s) AS ix,
               js_p3(CAST(n AS FLOAT64)) AS p3,
               js_mask(s) AS mask,
               js_band(CAST(n AS FLOAT64)).lo AS st_lo,
               js_band(CAST(n AS FLOAT64)).hi AS st_hi
        FROM t
    """)


from bigquery_etl_spark.functions import psl as _psl

_PSL_HOSTS = (
    "concat(lower(chr(97 + CAST(k % 17 AS INT))), '.', "
    "CASE CAST(k % 12 AS INT) "
    "WHEN 0 THEN 'example.co.uk' WHEN 1 THEN 'shop.com.au' "
    "WHEN 2 THEN 'foo.github.io' WHEN 3 THEN 'b.ck' "
    "WHEN 4 THEN 'www.ck' WHEN 5 THEN 'city.kawasaki.jp' "
    "WHEN 6 THEN 'x.kawasaki.jp' WHEN 7 THEN 'example.com' "
    "WHEN 8 THEN 'blog.blogspot.com' WHEN 9 THEN 'x.s3.amazonaws.com' "
    "WHEN 10 THEN 'gov.bd' ELSE 'site.org' END)"
)


@query(
    "q_net_psl",
    sql=f"""
    WITH t AS (
        SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 16 = 1
    ),
    h AS (SELECT k, {_PSL_HOSTS} AS host FROM t)
    SELECT k, host,
           {_psl.duckdb_public_suffix('host')} AS suffix,
           {_psl.duckdb_reg_domain('host')} AS reg
    FROM h ORDER BY k
    """,
    tags=("dialect", "net"),
)
def q_net_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NET.PUBLIC_SUFFIX / NET.REG_DOMAIN (r9, VERDICT r8 gap #6): the
    official PSL longest-match algorithm — exception rules prevail,
    then the longest normal/wildcard rule, then the implicit ``*``
    default — over a VENDORED version-pinned snapshot of the public
    suffix list (functions/psl.py, publicsuffix.org content). Both
    engines' expressions are GENERATED from the same RULES table:
    Spark gets SPLIT + SLICE + IN codegen (IN lists compile to O(1)
    InSet hash probes — no UDF, no join, no shuffle), the DuckDB
    oracle the identical closed form in its own syntax, so the twin is
    exact by construction. The host mix exercises wildcard (*.ck),
    exception (!www.ck, !city.kawasaki.jp), private-section
    (github.io, blogspot.com, s3.amazonaws.com), multi-level ccTLD and
    default-rule branches."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("psl_orders")
    cat = LakeCatalog(spark)
    host = _PSL_HOSTS.replace(
        "lower(chr(97 + CAST(k % 17 AS INT)))",
        "LOWER(CHAR(97 + CAST(MOD(k, 17) AS INT)))",
    ).replace("CAST(k % 12 AS INT)", "CAST(MOD(k, 12) AS INT)")
    return cat.bq_sql(f"""
        WITH t AS (
            SELECT o_orderkey AS k FROM psl_orders
            WHERE MOD(o_orderkey, 16) = 1
        ),
        h AS (SELECT k, {host} AS host FROM t)
        SELECT k, host,
               NET.PUBLIC_SUFFIX(host) AS suffix,
               NET.REG_DOMAIN(host) AS reg
        FROM h
    """)


@query(
    "q_bignumeric",
    sql="""
    WITH t AS (
        SELECT o_orderkey AS k,
               CAST(
                   (o_orderkey % 1000) || '.' ||
                   lpad((o_orderkey % 97)::VARCHAR, 19, '0')
                   AS DECIMAL(38,19)) AS d
        FROM orders WHERE o_orderkey % 16 = 1
    )
    SELECT k % 5 AS g,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS DOUBLE) AS total,
           CAST(SUM(d + d) AS DOUBLE) AS doubled,
           CAST(SUM(d - CAST('0.5' AS DECIMAL(38,19))) AS DOUBLE)
               AS shifted,
           CAST(SUM(CASE WHEN d > CAST('500' AS DECIMAL(38,9))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           MAX(CAST(d AS VARCHAR)) AS max_str
    FROM t GROUP BY g ORDER BY g
    """,
    tags=("dialect", "types"),
)
def q_bignumeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGNUMERIC (r9, VERDICT r8 gap #4): BigQuery's 76-digit decimal
    mapped to its EXACT DECIMAL(38,19) subset — 19 integer + 19
    fractional digits, enough for every financial-pipeline use that
    fits a signed 64-bit dollar range at 19 decimal places. Typed
    literals validate at translate time (out-of-subset digits refuse
    with a precise message, tested in test_bq_dialect), CAST targets
    map through the type table, NUMERIC literals round half-even past
    scale 9 exactly like BigQuery. Arithmetic stays in Spark's decimal
    kernel (ANSI overflow = loud runtime error, never silent wrap);
    the oracle runs the identical DECIMAL(38,19) closed form."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("bn_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH t AS (
            SELECT o_orderkey AS k,
                   CAST(CONCAT(CAST(MOD(o_orderkey, 1000) AS STRING),
                               '.',
                               LPAD(CAST(MOD(o_orderkey, 97) AS STRING),
                                    19, '0'))
                        AS BIGNUMERIC) AS d
            FROM bn_orders WHERE MOD(o_orderkey, 16) = 1
        )
        SELECT MOD(k, 5) AS g,
               COUNT(*) AS n,
               CAST(SUM(d) AS FLOAT64) AS total,
               CAST(SUM(d + d) AS FLOAT64) AS doubled,
               CAST(SUM(d - BIGNUMERIC '0.5') AS FLOAT64) AS shifted,
               COUNTIF(d > NUMERIC '500') AS n_big,
               MAX(CAST(d AS STRING)) AS max_str
        FROM t GROUP BY g ORDER BY g
    """)


@query(
    "q_sample_stratified",
    sql="""
    WITH tagged AS (
        SELECT lang,
               length(text) AS n_chars,
               ('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint
                   % 1000 AS bucket
        FROM documents
    ),
    sampled AS (
        SELECT * FROM tagged
        WHERE bucket < CASE lang WHEN 'en' THEN 200
                                 WHEN 'de' THEN 500
                                 ELSE 1000 END
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM sampled GROUP BY lang ORDER BY lang
    """,
    tags=("tierc", "sampling"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling (r8) — the
    domain-rebalancing step of a training-data mix: per-stratum keep
    rates (down-weight overrepresented languages) applied through a
    CONTENT-HASH bucket, not an RNG — so the sample is reproducible
    across engines, runs, and cluster sizes, composes with incremental
    ingestion (a doc's keep/drop never changes), and the oracle can
    recompute it EXACTLY (md5 is engine-independent where Spark's
    xxhash64/rand are not). One scan, one map-side-combined group-by:
    the 100 TB shape. The rates here (en 20%, de 50%, rest 100%) are
    the classic down-sample-the-head mix."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("bigint") % 1000
    )
    rate = (
        F.when(F.col("lang") == "en", 200)
        .when(F.col("lang") == "de", 500)
        .otherwise(1000)
    )
    return (
        docs.select("lang", F.length("text").alias("n_chars"),
                    bucket.alias("bucket"), rate.alias("rate"))
        .filter(F.col("bucket") < F.col("rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").cast("bigint").alias("n_chars"))
        .orderBy("lang")
    )


@query(
    "q_delta_interop",
    sql="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,9))) AS DOUBLE) AS bal
    FROM customer WHERE c_custkey % 3 = 0
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("sources", "interop"),
    # oracle reads the RAW parquet (DuckDB has no delta reader here) —
    # value-exact, not comparable work
    twin="invariant",
)
def q_delta_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta Lake interop round-trip (r8): a versioned-lake snapshot
    exports with its r7 _delta_log, then reads back through the
    pure-Python Delta READER (sources/delta_read.py — JSON action
    replay, no jars) and must aggregate identically to the original
    parquet the oracle reads. Proves both directions of the interop
    bridge against each other: the export's log is exactly what the
    reader's protocol subset consumes, and the data path stays the
    ordinary JVM parquet scan (explicit files + schema)."""
    import os

    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.delta_read import read_delta
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        src = load(spark, sf_dir, "customer").filter(
            F.col("c_custkey") % 3 == 0
        ).select("c_custkey", "c_mktsegment", "c_acctbal")
        t = VersionedTable(spark, os.path.join(path, "t"))
        t.create(src)
        t.export_snapshot(os.path.join(path, "export"))

    d = scratch_build(f"delta_interop:{sf_dir}", "delta-interop-", _build)
    df = read_delta(spark, os.path.join(d, "export"))
    return (
        df.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(38,9)"))
            .cast("double")
            .alias("bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_delta_dv_interop",
    sql="""
    WITH d AS (
        SELECT c_custkey, c_mktsegment, c_acctbal,
               ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS pos
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,9))) AS DOUBLE) AS bal
    FROM d WHERE pos % 7 <> 0
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("sources", "interop"),
    # oracle recomputes the DV semantics from raw parquet — value-exact,
    # not comparable work
    twin="invariant",
)
def q_delta_dv_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DELETION VECTORS + COLUMN MAPPING (r9, closing VERDICT r8
    gap #2): a hand-laid Delta table whose single add-action carries a
    reader-v3 protocol (readerFeatures deletionVectors+columnMapping),
    physical col-* parquet names, and a roaring-bitmap DV dropping
    every 7th row ordinal — written and decoded by the pure-Python
    Z85/RoaringBitmapArray codecs in sources/delta_read.py (public
    formats: Delta PROTOCOL.md, RoaringFormatSpec). The reader applies
    the DV as an anti-join on _metadata.row_index and re-attaches
    logical names; the oracle recomputes the identical drop rule over
    the raw parquet ordered the same way."""
    import os

    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.delta_read import (
        read_delta,
        write_dv_file,
    )

    def _build(path: str) -> None:
        import json as _json
        import shutil

        from pyspark.sql import types as T

        root = os.path.join(path, "dv")
        src = (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") % 3 == 0)
            .select(
                F.col("c_custkey").alias("col-k"),
                F.col("c_mktsegment").alias("col-m"),
                F.col("c_acctbal").alias("col-b"),
            )
        )
        tmp = os.path.join(root, "f1.dir")
        src.repartition(1).sortWithinPartitions("`col-k`") \
            .write.parquet(tmp)
        part = [x for x in os.listdir(tmp) if x.endswith(".parquet")][0]
        final = os.path.join(root, "f1.parquet")
        shutil.move(os.path.join(tmp, part), final)
        shutil.rmtree(tmp)
        n_rows = spark.read.parquet(final).count()
        dv = write_dv_file(
            os.path.join(root, "dv1.bin"), list(range(0, n_rows, 7))
        )
        fields = [
            T.StructField("c_custkey", T.LongType(), True,
                          {"delta.columnMapping.id": 1,
                           "delta.columnMapping.physicalName": "col-k"}),
            T.StructField("c_mktsegment", T.StringType(), True,
                          {"delta.columnMapping.id": 2,
                           "delta.columnMapping.physicalName": "col-m"}),
            T.StructField("c_acctbal", T.DoubleType(), True,
                          {"delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "col-b"}),
        ]
        os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
        with open(os.path.join(root, "_delta_log",
                               f"{0:020d}.json"), "w") as f:
            for a in [
                {"protocol": {"minReaderVersion": 3,
                              "minWriterVersion": 7,
                              "readerFeatures": [
                                  "deletionVectors", "columnMapping"]}},
                {"metaData": {
                    "id": "t",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": T.StructType(fields).json(),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "name"},
                }},
                {"add": {"path": "f1.parquet", "dataChange": True,
                         "deletionVector": dv}},
            ]:
                f.write(_json.dumps(a) + "\n")

    d = scratch_build(f"delta_dv:{sf_dir}", "delta-dv-", _build)
    df = read_delta(spark, os.path.join(d, "dv"))
    return (
        df.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(38,9)"))
            .cast("double")
            .alias("bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_iceberg_interop",
    sql="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(38,9))) AS DOUBLE) AS bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey % 2 = 0
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("sources", "interop"),
    # oracle reads the RAW parquet — value-exact, not comparable work
    twin="invariant",
)
def q_iceberg_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg interop (r8): a v2 table laid out by hand — metadata
    JSON, avro_py-written manifest list + manifest, parquet data files
    — opened by the pure-Python reader (sources/iceberg_read.py, zero
    jars) and joined/aggregated; the oracle recomputes from the raw
    parquet. The manifests are driver-side KB-sized metadata; the data
    scan is the ordinary distributed JVM parquet path with explicit
    files + schema."""
    import json
    import os
    import shutil

    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.avro_py import write_avro
    from bigquery_etl_spark.sources.iceberg_read import read_iceberg

    def _one_avro(df, out):
        d = out + ".dir"
        write_avro(df.coalesce(1), d)
        part = [x for x in os.listdir(d) if x.endswith(".avro")][0]
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.move(os.path.join(d, part), out)
        shutil.rmtree(d)

    def _build(path: str) -> None:
        root = os.path.join(path, "ice")
        src = load(spark, sf_dir, "supplier").filter(
            F.col("s_suppkey") % 2 == 0
        ).select("s_suppkey", "s_nationkey", "s_acctbal")
        dfile = os.path.join(root, "data", "s0")
        src.coalesce(1).write.parquet(dfile)
        part = [x for x in os.listdir(dfile) if x.endswith(".parquet")][0]
        final = os.path.join(root, "data", "s0.parquet")
        shutil.move(os.path.join(dfile, part), final)
        shutil.rmtree(dfile)
        m1 = os.path.join(root, "metadata", "m1.avro")
        _one_avro(
            spark.createDataFrame(
                [(1, {"content": 0, "file_path": final,
                      "file_format": "PARQUET", "record_count": 0})],
                "status int, data_file struct<content int, "
                "file_path string, file_format string, record_count long>",
            ),
            m1,
        )
        l1 = os.path.join(root, "metadata", "snap-1.avro")
        _one_avro(
            spark.createDataFrame(
                [(m1, 0)], "manifest_path string, content int"
            ),
            l1,
        )
        meta = {
            "format-version": 2,
            "schemas": [{
                "type": "struct", "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "s_suppkey", "required": True,
                     "type": "long"},
                    {"id": 2, "name": "s_nationkey", "required": True,
                     "type": "long"},
                    {"id": 3, "name": "s_acctbal", "required": False,
                     "type": "double"},
                ],
            }],
            "current-schema-id": 0,
            "current-snapshot-id": 1,
            "snapshots": [{"snapshot-id": 1, "manifest-list": l1}],
        }
        with open(os.path.join(root, "metadata",
                               "00001-q.metadata.json"), "w") as f:
            json.dump(meta, f)

    d = scratch_build(f"iceberg_interop:{sf_dir}", "ice-interop-", _build)
    sup = read_iceberg(spark, os.path.join(d, "ice"))
    nat = load(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nat),
                 sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("s_acctbal").cast("decimal(38,9)"))
            .cast("double").alias("bal"),
        )
        .orderBy("n_name")
    )


@query(
    "q_iceberg_deletes",
    sql="""
    WITH d1 AS (
        SELECT s_suppkey, s_acctbal,
               ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS pos
        FROM supplier WHERE s_suppkey % 2 = 0
    ),
    kept AS (
        SELECT s_suppkey, s_acctbal FROM d1
        WHERE pos >= 5 AND s_suppkey % 10 <> 0
        UNION ALL
        SELECT s_suppkey, s_acctbal + 1000
        FROM supplier WHERE s_suppkey % 10 = 0
    )
    SELECT s_suppkey % 5 AS g,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(38,9))) AS DOUBLE) AS bal
    FROM kept GROUP BY g ORDER BY g
    """,
    tags=("sources", "interop"),
    # oracle recomputes the merge-on-read semantics from raw parquet —
    # value-exact, not comparable work
    twin="invariant",
)
def q_iceberg_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 MERGE-ON-READ (r9, closing VERDICT r8 gap #2): a
    hand-laid table whose snapshot carries a POSITION delete file
    (ordinals 0-4 of the seq-1 data file) and an EQUALITY delete file
    (field id 1 = s_suppkey, keys % 10 = 0, seq 2) plus a seq-2
    RE-INSERT of those keys at +1000 — the Flink-CDC upsert pattern.
    read_iceberg applies position deletes by anti-join on
    (_metadata.file_path, _metadata.row_index) and equality deletes by
    anti-join on the equality columns scoped to STRICTLY OLDER data
    sequence numbers, so the re-inserted rows must survive. The oracle
    recomputes the identical semantics from the raw parquet in SQL.
    Spec: iceberg.apache.org/spec (delete formats, sequence-number
    inheritance)."""
    import json
    import os
    import shutil

    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.avro_py import write_avro
    from bigquery_etl_spark.sources.iceberg_read import read_iceberg

    def _one_avro(df, out):
        d = out + ".dir"
        write_avro(df.coalesce(1), d)
        part = [x for x in os.listdir(d) if x.endswith(".avro")][0]
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.move(os.path.join(d, part), out)
        shutil.rmtree(d)

    def _one_parquet(df, root, name):
        d = os.path.join(root, "data", name)
        df.repartition(1).sortWithinPartitions("s_suppkey") \
            .write.parquet(d)
        part = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        final = os.path.join(root, "data", f"{name}.parquet")
        shutil.move(os.path.join(d, part), final)
        shutil.rmtree(d)
        return final

    def _build(path: str) -> None:
        root = os.path.join(path, "ice")
        sup = load(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_acctbal"
        )
        d1 = _one_parquet(
            sup.filter(F.col("s_suppkey") % 2 == 0), root, "d1"
        )
        d2 = _one_parquet(
            sup.filter(F.col("s_suppkey") % 10 == 0).select(
                "s_suppkey",
                (F.col("s_acctbal") + 1000).alias("s_acctbal"),
            ),
            root,
            "d2",
        )
        pd = os.path.join(root, "data", "pd")
        spark.createDataFrame(
            [(d1, i) for i in range(5)], "file_path string, pos long"
        ).coalesce(1).write.parquet(pd)
        part = [x for x in os.listdir(pd) if x.endswith(".parquet")][0]
        pdf = os.path.join(root, "data", "pd.parquet")
        shutil.move(os.path.join(pd, part), pdf)
        shutil.rmtree(pd)
        ed = os.path.join(root, "data", "ed")
        sup.filter(F.col("s_suppkey") % 10 == 0).select(
            "s_suppkey"
        ).coalesce(1).write.parquet(ed)
        part = [x for x in os.listdir(ed) if x.endswith(".parquet")][0]
        edf = os.path.join(root, "data", "ed.parquet")
        shutil.move(os.path.join(ed, part), edf)
        shutil.rmtree(ed)
        m1 = os.path.join(root, "metadata", "m1.avro")
        entries = [
            (1, 1, {"content": 0, "file_path": d1,
                    "file_format": "PARQUET", "record_count": 0,
                    "equality_ids": None}),
            (1, 2, {"content": 0, "file_path": d2,
                    "file_format": "PARQUET", "record_count": 0,
                    "equality_ids": None}),
            (1, 2, {"content": 2, "file_path": edf,
                    "file_format": "PARQUET", "record_count": 0,
                    "equality_ids": [1]}),
            (1, 3, {"content": 1, "file_path": pdf,
                    "file_format": "PARQUET", "record_count": 0,
                    "equality_ids": None}),
        ]
        _one_avro(
            spark.createDataFrame(
                entries,
                "status int, sequence_number long, data_file "
                "struct<content int, file_path string, "
                "file_format string, record_count long, "
                "equality_ids array<int>>",
            ),
            m1,
        )
        l1 = os.path.join(root, "metadata", "snap-1.avro")
        _one_avro(
            spark.createDataFrame(
                [(m1, 0)], "manifest_path string, content int"
            ),
            l1,
        )
        meta = {
            "format-version": 2,
            "schemas": [{
                "type": "struct", "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "s_suppkey", "required": True,
                     "type": "long"},
                    {"id": 2, "name": "s_acctbal", "required": False,
                     "type": "double"},
                ],
            }],
            "current-schema-id": 0,
            "current-snapshot-id": 1,
            "snapshots": [{"snapshot-id": 1, "manifest-list": l1,
                           "sequence-number": 3}],
        }
        with open(os.path.join(root, "metadata",
                               "00001-q.metadata.json"), "w") as f:
            json.dump(meta, f)

    d = scratch_build(f"iceberg_deletes:{sf_dir}", "ice-del-", _build)
    t = read_iceberg(spark, os.path.join(d, "ice"))
    return (
        t.groupBy((F.col("s_suppkey") % 5).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("s_acctbal").cast("decimal(38,9)"))
            .cast("double").alias("bal"),
        )
        .orderBy("g")
    )


@query(
    "q_net_funcs",
    sql="""
    WITH t AS (
        SELECT o_orderkey AS k,
               ((o_orderkey % 223) + 10) AS a,
               ((o_orderkey * 7) % 256) AS b,
               ((o_orderkey * 13) % 256) AS c,
               ((o_orderkey % 254) + 1) AS d
        FROM orders WHERE o_orderkey % 16 = 1
    )
    SELECT k,
           a || '.' || b || '.' || c || '.' || d AS ip_str,
           lower(lpad(to_hex(a), 2, '0') || lpad(to_hex(b), 2, '0')
               || lpad(to_hex(c), 2, '0') || lpad(to_hex(d), 2, '0'))
               AS ip_hex,
           a * 16777216 + b * 65536 + c * 256 + d AS ip_int,
           lower(lpad(to_hex(a), 2, '0') || lpad(to_hex(b), 2, '0'))
               || '0000' AS trunc16_hex,
           'www.example.com' AS host1,
           'sub.domain.org' AS host2,
           CAST(NULL AS VARCHAR) AS host3,
           TRUE AS bad_ip_null,
           TRUE AS has_needle
    FROM t ORDER BY k
    """,
    tags=("dialect", "net"),
    # the oracle RESTATES expected values via closed-form arithmetic
    # (DuckDB does no IP parsing) — value-exact, not comparable work
    twin="invariant",
)
def q_net_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NET.* functions (r8): IPv4 int↔bytes round-trips (pure codegen
    hex algebra), NET.IP_FROM_STRING/IP_TO_STRING (exact stdlib-
    ipaddress Arrow UDFs, both address families), NET.IP_TRUNC (/16
    prefix), NET.SAFE_IP_FROM_STRING (NULL on garbage), NET.HOST URL
    parsing (scheme/userinfo stripped, stops at /:?#), and
    CONTAINS_SUBSTR. Bytes columns compare as hex strings; every
    expected value is a closed form the oracle restates."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("nf_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH t AS (
            SELECT o_orderkey AS k,
                   MOD(o_orderkey, 223) + 10 AS a,
                   MOD(o_orderkey * 7, 256) AS b,
                   MOD(o_orderkey * 13, 256) AS c,
                   MOD(o_orderkey, 254) + 1 AS d
            FROM nf_orders WHERE o_orderkey % 16 = 1
        ), ips AS (
            SELECT k,
                   CONCAT(CAST(a AS STRING), '.', CAST(b AS STRING), '.',
                          CAST(c AS STRING), '.', CAST(d AS STRING))
                       AS ip_str,
                   a * 16777216 + b * 65536 + c * 256 + d AS ip_int
            FROM t
        )
        SELECT k,
               NET.IP_TO_STRING(NET.IP_FROM_STRING(ip_str)) AS ip_str,
               LOWER(HEX(NET.IPV4_FROM_INT64(ip_int))) AS ip_hex,
               NET.IPV4_TO_INT64(NET.IP_FROM_STRING(ip_str)) AS ip_int,
               LOWER(HEX(NET.IP_TRUNC(NET.IP_FROM_STRING(ip_str), 16)))
                   AS trunc16_hex,
               NET.HOST('https://user:pw@www.example.com:8080/p?q=1')
                   AS host1,
               NET.HOST('sub.domain.org/path') AS host2,
               NET.HOST('') AS host3,
               NET.SAFE_IP_FROM_STRING('not-an-ip') IS NULL
                   AS bad_ip_null,
               CONTAINS_SUBSTR('The Quick Brown Fox', 'qUiCk bRoWn')
                   AS has_needle
        FROM ips ORDER BY k
    """)


@query(
    "q_unicode_funcs",
    sql="""
    WITH t AS (
        SELECT o_orderkey AS k,
               'Stra' || chr(223) || 'e-' || o_orderkey AS s,
               'e' || chr(769) || '-' || o_orderkey AS dec
        FROM orders WHERE o_orderkey % 16 = 1
    )
    SELECT k,
           nfc_normalize(dec) AS nfc,
           length(nfc_normalize(dec)) AS n_nfc,
           'strasse-' || k AS folded,
           97 AS cp0,
           'ok' AS cps_roundtrip
    FROM t ORDER BY k
    """,
    tags=("dialect", "unicode"),
    # the NFC leg IS comparable work (DuckDB nfc_normalize); casefold/
    # codepoint legs are restated closed-form — categorized invariant
    twin="invariant",
)
def q_unicode_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode pack (r8): NORMALIZE (stdlib-unicodedata, the exact
    UAX #15 algorithms), NORMALIZE_AND_CASEFOLD (Unicode case folding,
    ß→ss — lower() cannot do this), TO_CODE_POINTS /
    CODE_POINTS_TO_STRING round-trip. The NFC leg twins against
    DuckDB's native nfc_normalize; the rest restate closed forms."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("uni_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH t AS (
            SELECT o_orderkey AS k,
                   CONCAT('Stra', '\\u00df', 'e-',
                          CAST(o_orderkey AS STRING)) AS s,
                   CONCAT('e', '\\u0301', '-',
                          CAST(o_orderkey AS STRING)) AS dec
            FROM uni_orders WHERE o_orderkey % 16 = 1
        )
        SELECT k,
               NORMALIZE(dec) AS nfc,
               LENGTH(NORMALIZE(dec)) AS n_nfc,
               NORMALIZE_AND_CASEFOLD(s) AS folded,
               TO_CODE_POINTS('abc')[0] AS cp0,
               IF(CODE_POINTS_TO_STRING(TO_CODE_POINTS('ok')) = 'ok',
                  'ok', 'BROKEN') AS cps_roundtrip
        FROM t ORDER BY k
    """)
