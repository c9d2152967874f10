"""Sixteenth coverage pack (r13) — VERDICT r12's ranked list.

- ``q_ml_idf``: ``ML.IDF(tokens) OVER()`` (r12 item 7) — the df-only
  leg of the C91 two-pass corpus rewrite (bq_dialect
  ._rewrite_ml_tfidf_over, generalized): one entry per DISTINCT term
  of each token array, value = the smooth-idf factor
  LN((N+1)/(df+1)) + 1 alone. Same scale-safe plan as q_ml_tfidf:
  document frequencies aggregate once, vectors compute per distinct
  array, distributed prefix-sum vocabulary index, join back on the
  array value — no per-row corpus state.

Reference parity: the reference delegates its SQL surface to BigQuery
(reference main.py:21, 49-50, 160-185); these close gaps ranked in
VERDICT r12 "What's missing" / "Next round".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# LOG_ANALYZER token class, RE2 spelling (shared with the TF-IDF and
# TEXT_ANALYZE twins — the DuckDB side re-tokenizes independently)
_DUCK_TOKENS = r"[^\s\x00\[\]<>(){}|!;,''\"*&?+/:=@.$%\\_-]+"

# Identical vocabulary-index algebra as the Spark rewrite (r13
# distributed prefix-sum: bucket by the char polynomial, rank within
# bucket, add bucket offsets) so the index-weighted checksum is an
# exact cross-engine check.
_ML_IDF_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, lang,
           regexp_extract_all(lower(text), '{_DUCK_TOKENS}') AS toks
    FROM documents WHERE doc_id % 2 = 1
),
n AS (SELECT COUNT(*) AS n_docs FROM raw),
tl AS (
    SELECT DISTINCT doc_id, lang, t.term
    FROM raw, UNNEST(toks) AS t(term)
),
dfreq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tl GROUP BY term
),
vb AS (
    SELECT term, (ascii(substr(term, 1, 1)) * 961
        + ascii(substr(term, 2, 1)) * 31 + ascii(substr(term, 3, 1))
        + length(term)) % 1024 AS b
    FROM dfreq
),
lr AS (
    SELECT term, b,
           ROW_NUMBER() OVER (PARTITION BY b ORDER BY term) - 1 AS lr
    FROM vb
),
bo AS (
    SELECT b, COALESCE(SUM(c) OVER (PARTITION BY 1 ORDER BY b ROWS
        BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
    FROM (SELECT b, COUNT(*) AS c FROM vb GROUP BY b)
),
voc AS (
    SELECT term, off + lr AS idx FROM lr JOIN bo USING (b)
),
ent AS (
    SELECT tl.doc_id, tl.lang, voc.idx,
           CAST(ROUND((ln((n.n_docs + 1.0) / (dfreq.df + 1.0))
               + 1.0) * 10000) AS BIGINT) AS units
    FROM tl JOIN dfreq USING (term) JOIN voc USING (term) CROSS JOIN n
)
SELECT r.lang,
       CAST(COUNT(DISTINCT r.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(e.idx) AS BIGINT) AS n_entries,
       CAST(SUM(COALESCE(e.units, 0)) AS BIGINT) AS sum_units,
       CAST(SUM(COALESCE((e.idx + 1) * e.units, 0)) AS BIGINT)
           AS checksum
FROM raw r LEFT JOIN ent e ON e.doc_id = r.doc_id
GROUP BY r.lang ORDER BY r.lang
"""


@query(
    "q_ml_idf",
    sql=_ML_IDF_ORACLE,
    tags=("dialect", "text", "ml"),
)
def q_ml_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ML.IDF(tokens) OVER()`` (r13, VERDICT r12 item 7): the
    df-only leg of the two-pass corpus rewrite — per document, one
    ARRAY<STRUCT<index, value>> entry per DISTINCT term with the
    smooth-idf factor as value. The twin recomputes idf relationally
    in DuckDB from an independent tokenization, including the
    distributed-prefix-sum vocabulary index (verified through the
    index-weighted checksum). Per-entry values reduce to integer 1e-4
    units before summation so the comparison is order-independent.
    Reference: BigQuery text-preprocessing surface (delegated,
    main.py:21, 49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "documents").createOrReplaceTempView("idf_docs")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        SELECT lang,
               CAST(COUNT(*) AS INT64) AS n_docs,
               CAST(SUM(ARRAY_LENGTH(vec)) AS INT64) AS n_entries,
               CAST(SUM(AGGREGATE(vec, CAST(0 AS INT64), (__a, __e) ->
                   __a + CAST(ROUND(__e.value * 10000) AS INT64)))
                   AS INT64) AS sum_units,
               CAST(SUM(AGGREGATE(vec, CAST(0 AS INT64), (__a, __e) ->
                   __a + (__e.index + 1) *
                   CAST(ROUND(__e.value * 10000) AS INT64)))
                   AS INT64) AS checksum
        FROM (
            SELECT doc_id, lang,
                   ML.IDF(TEXT_ANALYZE(text)) OVER() AS vec
            FROM idf_docs WHERE MOD(doc_id, 2) = 1
        ) GROUP BY lang ORDER BY lang
    """)


# -- GEOMETRYCOLLECTION (r13, VERDICT r12 item 3) -----------------------------
#
# One literal collection exercises every member class: a POINT, an
# open LINESTRING, a donut POLYGON (shell + hole) and a MULTIPOLYGON
# member. The Spark side lowers through bq_dialect's per-member
# dispatch (min-over-members distance, OR-over-polygon containment,
# point-member equality in ST_INTERSECTS, constant-folded measures);
# the DuckDB twin evaluates the IDENTICAL per-member algebra with the
# shared geodesic edge fragments from coverage12, per member (each
# polygon member gets its own folded outside-Q edge list, exactly as
# the Spark lowering picks one per member).

_GC_PT = (20.0, 20.0)
_GC_LINE = [(-30.0, 0.0), (-10.0, 10.0), (0.0, 0.0)]
_GC_DONUT = [
    [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
    [(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0)],
]
_GC_SQUARE = [[(30.0, 30.0), (40.0, 30.0), (40.0, 40.0), (30.0, 40.0)]]

_GC_WKT = (
    "GEOMETRYCOLLECTION("
    f"POINT({_GC_PT[0]} {_GC_PT[1]}), "
    "LINESTRING(" + ", ".join(f"{x} {y}" for x, y in _GC_LINE) + "), "
    "POLYGON((" + ", ".join(
        f"{x} {y}" for x, y in _GC_DONUT[0] + [_GC_DONUT[0][0]]
    ) + "), (" + ", ".join(
        f"{x} {y}" for x, y in _GC_DONUT[1] + [_GC_DONUT[1][0]]
    ) + ")), "
    "MULTIPOLYGON(((" + ", ".join(
        f"{x} {y}" for x, y in _GC_SQUARE[0] + [_GC_SQUARE[0][0]]
    ) + "))))"
)


def _gc_line_length_py() -> float:
    """Independent haversine chain length (the coverage13 pattern)."""
    import math

    r = 6371008.8
    total = 0.0
    for (ax, ay), (bx, by) in zip(_GC_LINE, _GC_LINE[1:]):
        total += 2.0 * r * math.asin(math.sqrt(
            math.sin(math.radians(by - ay) / 2) ** 2
            + math.cos(math.radians(ay)) * math.cos(math.radians(by))
            * math.sin(math.radians(bx - ax) / 2) ** 2))
    return total


def _gc_ring_area_py(ring) -> float:
    """Independent spherical-excess ring area: the Van Oosterom–
    Strackee signed fan (2·atan2(det, 1+dots)) — a DIFFERENT closed
    form from bq_dialect's translate-time Girard excess, so the twin
    is a real differential check."""
    import math

    def u3(lon, lat):
        la, lo = math.radians(lat), math.radians(lon)
        return (
            math.cos(la) * math.cos(lo),
            math.cos(la) * math.sin(lo),
            math.sin(la),
        )

    a = u3(*ring[0])
    tot = 0.0
    for b, c in zip(ring[1:], ring[2:]):
        B, C = u3(*b), u3(*c)
        det = (
            a[0] * (B[1] * C[2] - B[2] * C[1])
            + a[1] * (B[2] * C[0] - B[0] * C[2])
            + a[2] * (B[0] * C[1] - B[1] * C[0])
        )
        dots = (
            a[0] * B[0] + a[1] * B[1] + a[2] * B[2]
            + B[0] * C[0] + B[1] * C[1] + B[2] * C[2]
            + C[0] * a[0] + C[1] * a[1] + C[2] * a[2]
        )
        tot += 2.0 * math.atan2(det, 1.0 + dots)
    return 6371008.8 * 6371008.8 * abs(tot)


def _gc_area_py() -> float:
    donut = _gc_ring_area_py(_GC_DONUT[0]) - _gc_ring_area_py(_GC_DONUT[1])
    return donut + _gc_ring_area_py(_GC_SQUARE[0])


def _gc_perimeter_py() -> float:
    import math

    r = 6371008.8
    total = 0.0
    for rings in (_GC_DONUT, _GC_SQUARE):
        for ring in rings:
            for (ax, ay), (bx, by) in zip(ring, ring[1:] + ring[:1]):
                total += 2.0 * r * math.asin(math.sqrt(
                    math.sin(math.radians(by - ay) / 2) ** 2
                    + math.cos(math.radians(ay))
                    * math.cos(math.radians(by))
                    * math.sin(math.radians(bx - ax) / 2) ** 2))
    return total


def _gc_oracle_sql() -> str:
    from bigquery_etl_spark.plans.coverage12 import (
        _DUCK_DIST,
        _DUCK_GEO_EDGE_DIST,
        _DUCK_HAV,
        _DUCK_INSIDE,
        _duck_geo_edge,
        _duck_ring_edges,
    )

    e_donut = _duck_ring_edges(_GC_DONUT, polys=[_GC_DONUT])
    e_square = _duck_ring_edges(_GC_SQUARE, polys=[_GC_SQUARE])
    e_line = "[" + ", ".join(
        _duck_geo_edge(ax, ay, bx, by)
        for (ax, ay), (bx, by) in zip(_GC_LINE, _GC_LINE[1:])
    ) + "]"
    in1 = _DUCK_INSIDE.replace("edges", "e1")
    in2 = _DUCK_INSIDE.replace("edges", "e2")
    d1 = _DUCK_DIST.replace("edges", "e1")
    d2 = _DUCK_DIST.replace("edges", "e2")
    dline = (
        "list_aggregate(list_transform(el, __e -> "
        + _DUCK_GEO_EDGE_DIST + "), 'min')"
    )
    dpt = _DUCK_HAV.format(cx=repr(_GC_PT[0]), cy=repr(_GC_PT[1]))
    dist = f"least({dpt}, {dline}, {d1}, {d2})"
    inside = f"({in1} OR {in2})"
    isect = (
        f"({inside} OR (plon = {_GC_PT[0]!r} AND plat = {_GC_PT[1]!r}))"
    )
    return f"""
    WITH pts AS (
        SELECT c_mktsegment,
               CAST(((c_custkey * 17) % 160) - 80 + 0.5 AS DOUBLE) AS plon,
               CAST(((c_custkey * 11) % 120) - 60 + 0.25 AS DOUBLE) AS plat,
               {e_donut} AS e1, {e_square} AS e2, {e_line} AS el
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN {inside} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inside,
           CAST(SUM(CASE WHEN {isect} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_isect,
           CAST(SUM(CAST(round({dist}) AS BIGINT)) AS BIGINT) AS total_m,
           CAST(16 AS BIGINT) AS np,
           CAST(round({_gc_area_py()!r} / 1e6) AS BIGINT) AS area_km2,
           CAST(round({_gc_line_length_py()!r}) AS BIGINT) AS len_m,
           CAST(round({_gc_perimeter_py()!r}) AS BIGINT) AS per_m
    FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


@query(
    "q_gis_collection",
    sql=_gc_oracle_sql(),
    tags=("dialect", "geo"),
)
def q_gis_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRYCOLLECTION (r13, VERDICT r12 item 3 — the parse refusal
    retired): a 4-member collection (point, open linestring, donut
    polygon, multipolygon member) lowered onto the per-member
    machinery — ST_DISTANCE is the min over members (each polygon
    member carries its own folded outside-Q crossing constants),
    ST_CONTAINS the OR over polygon-member interiors, ST_INTERSECTS
    adds exact point-member equality, and the measures fold at
    translate time (area/perimeter over polygon members, length over
    line members, vertex count over all). The twin re-evaluates the
    identical per-member algebra in DuckDB from the shared geodesic
    edge fragments plus INDEPENDENT Python closed forms for the
    constants (Van Oosterom fan vs the Spark side's Girard excess).
    Reference: BigQuery geography functions (delegated surface,
    main.py:21, 49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("gc_cust")
    cat = LakeCatalog(spark)
    gc = f"ST_GEOGFROMTEXT('{_GC_WKT}')"
    return cat.bq_sql(f"""
        WITH pts AS (
            SELECT c_mktsegment,
                   CAST(MOD(c_custkey * 17, 160) - 80 + 0.5 AS FLOAT64)
                       AS plon,
                   CAST(MOD(c_custkey * 11, 120) - 60 + 0.25 AS FLOAT64)
                       AS plat
            FROM gc_cust
        )
        SELECT c_mktsegment,
               CAST(COUNTIF(ST_CONTAINS({gc},
                   ST_GEOGPOINT(plon, plat))) AS INT64) AS n_inside,
               CAST(COUNTIF(ST_INTERSECTS({gc},
                   ST_GEOGPOINT(plon, plat))) AS INT64) AS n_isect,
               CAST(SUM(CAST(ROUND(ST_DISTANCE({gc},
                   ST_GEOGPOINT(plon, plat))) AS INT64)) AS INT64)
                   AS total_m,
               CAST(MIN(ST_NUMPOINTS({gc})) AS INT64) AS np,
               CAST(MIN(CAST(ROUND(ST_AREA({gc}) / 1e6) AS INT64))
                   AS INT64) AS area_km2,
               CAST(MIN(CAST(ROUND(ST_LENGTH({gc})) AS INT64))
                   AS INT64) AS len_m,
               CAST(MIN(CAST(ROUND(ST_PERIMETER({gc})) AS INT64))
                   AS INT64) AS per_m
        FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


# -- FORMAT() printf twin (r13, VERDICT r12 item 6) ---------------------------
@query(
    "q_format",
    sql="""
    WITH t AS (
        SELECT o_orderkey AS k,
               o_orderkey % 1000 - 500 AS n,
               o_totalprice AS p,
               o_orderpriority AS s
        FROM orders WHERE o_orderkey % 16 = 1
    )
    SELECT k,
           printf('%d|%05d|%+d', n, n, n) AS ints,
           printf('%x|%X|%o', k, k, k) AS hexes,
           printf('%.2f|%12.3f|%e', p, p, p) AS floats,
           printf('%10.4s|%-12s!', s, s) AS strs,
           printf('%.3f', (n + 0.5) / 8.0) AS tie,
           CASE WHEN s IS NULL THEN NULL
                ELSE printf('%s has %d', s, n) END AS mixed
    FROM t ORDER BY k
    """,
    tags=("dialect", "functions"),
)
def q_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FORMAT()`` C-printf semantics (r13, VERDICT r12 item 6 — the
    boundary fuzz found the r12 blind FORMAT_STRING rename crashed on
    float args and silently diverged on the C-vs-Java spec gap). The
    rewriter (bq_dialect._format_rewriter) emits per-spec
    FORMAT_STRING segments with DOUBLE casts for float conversions,
    BROUND pre-rounding for %f decimal ties (C/BigQuery round half to
    EVEN, Java HALF_UP), C inf/nan renderings, the ``'`` thousands
    flag mapped to Java's ``,``, %i to %d, %t to canonical to-string,
    and BigQuery's NULL-argument-nulls-the-result contract. The twin
    is DuckDB's printf — an independent C-printf (fmt library)
    evaluating the IDENTICAL specs over the same rows; the tie leg
    lands exactly on .xxx5 decimals every 4th row. Reference:
    BigQuery FORMAT spec (delegated surface, main.py:21, 49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("fmt_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH t AS (
            SELECT o_orderkey AS k,
                   MOD(o_orderkey, 1000) - 500 AS n,
                   o_totalprice AS p,
                   o_orderpriority AS s
            FROM fmt_orders WHERE MOD(o_orderkey, 16) = 1
        )
        SELECT k,
               FORMAT('%d|%05d|%+d', n, n, n) AS ints,
               FORMAT('%x|%X|%o', k, k, k) AS hexes,
               FORMAT('%.2f|%12.3f|%e', p, p, p) AS floats,
               FORMAT('%10.4s|%-12s!', s, s) AS strs,
               FORMAT('%.3f', (n + 0.5) / 8.0) AS tie,
               FORMAT('%s has %d', s, n) AS mixed
        FROM t
    """)
