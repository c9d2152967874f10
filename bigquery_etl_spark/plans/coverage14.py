"""Fourteenth coverage pack (r11) — VERDICT r10's ranked list:

- TreeSHAP explainability for boosted trees (``q_ml_explain_tree``):
  ML.EXPLAIN_PREDICT now covers the tree family with EXACT
  path-dependent TreeSHAP (operators/ml.py), attributions summing to
  prediction − baseline identically.
- Geodesic GEOGRAPHY distance/length + MULTIPOINT/MULTILINESTRING
  (``q_gis_geodesic``) — the haversine→geodesic fidelity upgrade.

Reference parity: the reference delegates its SQL surface to BigQuery
(reference main.py:21, 49-50, 160-185); these close the corresponding
delegated-surface gaps ranked in VERDICT r10 "What's missing".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load


# High-latitude route + scatter for q_gis_geodesic: long east-west
# edges at lat 70 are where great-circle arcs (BigQuery's edge
# semantics) diverge most from the old planar lon/lat projection —
# the arc from (-60 70) to (60 70) passes ~79.7°N, a >1000 km shift.
_GEO_MLS = [
    [(-60.0, 70.0), (60.0, 70.0)],
    [(100.0, 55.0), (160.0, 65.0), (179.0, 50.0)],
]
_GEO_MLS_WKT = "MULTILINESTRING(" + ", ".join(
    "(" + ", ".join(f"{x} {y}" for x, y in chain) + ")"
    for chain in _GEO_MLS
) + ")"
_GEO_MP = [(-150.0, 80.0), (0.0, 85.0), (90.0, 75.0)]
_GEO_MP_WKT = "MULTIPOINT(" + ", ".join(
    f"({x} {y})" for x, y in _GEO_MP
) + ")"


def _geodesic_oracle_sql() -> str:
    from bigquery_etl_spark.plans.coverage12 import (
        _DUCK_GEO_EDGE_DIST,
        _DUCK_HAV,
        _duck_geo_edge,
    )
    from bigquery_etl_spark.sources.bq_dialect import _chain_length_m

    edges = "[" + ", ".join(
        _duck_geo_edge(ax, ay, bx, by)
        for chain in _GEO_MLS
        for (ax, ay), (bx, by) in zip(chain, chain[1:])
    ) + "]"
    mls_dist = (
        "list_aggregate(list_transform(edges, __e -> "
        + _DUCK_GEO_EDGE_DIST + "), 'min')"
    )
    mp_dist = "least(" + ", ".join(
        _DUCK_HAV.format(cx=repr(x), cy=repr(y)) for x, y in _GEO_MP
    ) + ")"
    total_len = sum(_chain_length_m(c) for c in _GEO_MLS)
    return f"""
    WITH pts AS (
        SELECT c_mktsegment,
               CAST(((c_custkey * 29) % 360) - 180 + 0.5 AS DOUBLE) AS plon,
               CAST(((c_custkey * 13) % 40) + 50 + 0.25 AS DOUBLE) AS plat,
               {edges} AS edges
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN {mls_dist} <= 900000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_near,
           CAST(SUM(CAST(round({mls_dist}) AS BIGINT)) AS BIGINT)
               AS total_m,
           CAST(SUM(CAST(round({mp_dist}) AS BIGINT)) AS BIGINT)
               AS mp_m,
           CAST(round({total_len!r}) AS BIGINT) AS route_m
    FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


@query(
    "q_gis_geodesic",
    sql=_geodesic_oracle_sql(),
    tags=("dialect", "geo"),
)
def q_gis_geodesic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic GEOGRAPHY distances + MULTIPOINT/MULTILINESTRING (r11,
    closing VERDICT r10 gap #3): ST_DISTANCE(point, linestring/
    polygon) segments are now GREAT-CIRCLE ARCS — BigQuery's edge
    semantics (it models Earth as a sphere; S2 edges are geodesics) —
    via the closed 3-vector form in bq_dialect._seg_geo_sql, replacing
    the planar lon/lat projection of r8-r10. The high-latitude route
    here is the worst case for the old formula (the lat-70 east-west
    arc passes ~79.7°N, shifting distances by >1000 km). MULTIPOINT
    and MULTILINESTRING WKT now parse onto the point/linestring
    machinery (min over members; ST_LENGTH sums member chains);
    GEOMETRYCOLLECTION still refuses loudly. The ORACLE evaluates the
    IDENTICAL closed form with bit-identical precomputed edge
    constants (coverage12._duck_geo_edge shares the Python helpers),
    so parity is exact. All whole-stage codegen — constants broadcast
    in the plan, zero UDFs, zero extra shuffles. Reference: BigQuery
    GEOGRAPHY (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("gge_cust")
    cat = LakeCatalog(spark)
    return cat.bq_sql(f"""
        WITH pts AS (
            SELECT c_mktsegment,
                   ST_GEOGPOINT(
                       CAST(MOD(c_custkey * 29, 360) - 180 + 0.5
                            AS FLOAT64),
                       CAST(MOD(c_custkey * 13, 40) + 50 + 0.25
                            AS FLOAT64)) AS pt
            FROM gge_cust
        )
        SELECT c_mktsegment,
               COUNTIF(ST_DWITHIN(pt,
                   ST_GEOGFROMTEXT('{_GEO_MLS_WKT}'), 900000.0))
                   AS n_near,
               CAST(SUM(CAST(ROUND(ST_DISTANCE(pt,
                   ST_GEOGFROMTEXT('{_GEO_MLS_WKT}'))) AS INT64))
                   AS INT64) AS total_m,
               CAST(SUM(CAST(ROUND(ST_DISTANCE(pt,
                   ST_GEOGFROMTEXT('{_GEO_MP_WKT}'))) AS INT64))
                   AS INT64) AS mp_m,
               CAST(ROUND(ST_LENGTH(
                   ST_GEOGFROMTEXT('{_GEO_MLS_WKT}'))) AS INT64)
                   AS route_m
        FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


@query(
    "q_ml_explain_tree",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS attrs_sum_exact, TRUE AS matches_predict,
           TRUE AS inert_feature_zero, TRUE AS error_is_zero,
           TRUE AS global_inert_zero, TRUE AS global_order_ok
    FROM orders WHERE o_orderkey % 6 = 0
    """,
    tags=("ml", "dialect"),
    # invariant twin: tree internals live in engine float space; the
    # checks are exact algebraic identities of path-dependent TreeSHAP
    twin="invariant",
)
def q_ml_explain_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TreeSHAP for boosted trees (r11, closing VERDICT r10 gap #2):
    ``ML.EXPLAIN_PREDICT(MODEL boosted_tree_*, t)`` computes EXACT
    path-dependent TreeSHAP over the persisted histogram-GBDT
    (operators/ml.py _tree_shap_batch — the vectorized Arrow-batch
    form of the public TreeSHAP recursion; differential-fuzzed in the
    suite against brute-force Shapley over the paper's EXPVALUE game).
    Pinned identities: attributions + baseline == prediction_value to
    1e-9 on EVERY row; prediction_value == ML.PREDICT's output; a
    feature the label never depends on (never split on) attributes
    EXACTLY zero; approximation_error is 0 (the algorithm is exact,
    unlike BigQuery's sampled tree SHAP — documented improvement).
    Reference: BigQuery ML explainable AI (delegated, main.py:21,
    49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 6 == 0
    ).select(
        (F.col("o_orderkey") % 41).cast("double").alias("a"),
        (F.col("o_custkey") % 23).cast("double").alias("b"),
        (F.col("o_orderkey") % 3).cast("double").alias("inert"),
    ).withColumn(
        # y depends on a and b only — 'inert' must attribute 0 exactly
        "y",
        F.when(F.col("a") > 20.0, F.col("b") * 2.0).otherwise(
            -F.col("b")
        )
        + F.col("a"),
    ).createOrReplaceTempView("bte_pts")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL bte_m OPTIONS("
        "model_type='boosted_tree_regressor', input_label_cols=['y'], "
        "max_iterations=6, enable_global_explain=TRUE) "
        "AS SELECT * FROM bte_pts"
    )
    ep = cat.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL bte_m, "
        "(SELECT a, b, inert FROM bte_pts), "
        "STRUCT(3 AS top_k_features))"
    )
    pred = cat.sql(
        "SELECT a, b, inert, predicted_y AS p FROM ML.PREDICT("
        "MODEL bte_m, (SELECT DISTINCT a, b, inert FROM bte_pts))"
    )
    chk = ep.select(
        "a",
        "b",
        "inert",
        "prediction_value",
        (
            F.abs(
                F.col("baseline_prediction_value")
                + F.expr(
                    "aggregate(top_feature_attributions, 0.0D, "
                    "(acc, e) -> acc + e.attribution)"
                )
                - F.col("prediction_value")
            )
            < 1e-9
        ).alias("__sum_ok"),
        F.expr(
            "size(filter(top_feature_attributions, "
            "e -> e.feature = 'inert' AND e.attribution != 0.0D)) = 0"
        ).alias("__inert_ok"),
        (F.col("approximation_error") == 0.0).alias("__err_ok"),
    ).join(F.broadcast(pred), ["a", "b", "inert"])
    # ML.GLOBAL_EXPLAIN (r11): fit-time mean |TreeSHAP| — the inert
    # feature (never split on) must be EXACTLY zero, and the dominant
    # planted effect ('a' carries both the linear term and the gate)
    # must rank first
    ge = cat.sql("SELECT * FROM ML.GLOBAL_EXPLAIN(MODEL bte_m)")
    ge_chk = ge.agg(
        F.min(
            F.when(F.col("feature") == "inert",
                   F.col("attribution") == 0.0)
        ).alias("__g_inert"),
        (
            F.max(
                F.when(F.col("feature") == "a", F.col("attribution"))
            )
            == F.max("attribution")
        ).alias("__g_order"),
    )
    return chk.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("__sum_ok").alias("attrs_sum_exact"),
        F.min(
            (F.abs(F.col("prediction_value") - F.col("p")) < 1e-9)
        ).alias("matches_predict"),
        F.min("__inert_ok").alias("inert_feature_zero"),
        F.min("__err_ok").alias("error_is_zero"),
    ).crossJoin(ge_chk).select(
        "n_rows", "attrs_sum_exact", "matches_predict",
        "inert_feature_zero", "error_is_zero",
        F.col("__g_inert").alias("global_inert_zero"),
        F.col("__g_order").alias("global_order_ok"),
    )


# Literal-topology fences for q_gis_topology: convex pentagon ∩ convex
# quad (Sutherland–Hodgman at translate time), a disjoint union pair,
# and a 100 km point buffer — every derived constant is computed by the
# SAME bq_dialect Python helpers on both engines' SQL.
_TP_A = [(-20.0, -15.0), (18.0, -20.0), (30.0, 5.0), (5.0, 25.0),
         (-25.0, 12.0)]
_TP_B = [(0.0, -5.0), (45.0, -5.0), (45.0, 30.0), (0.0, 30.0)]
_TP_C = [(60.0, -10.0), (80.0, -10.0), (80.0, 10.0), (60.0, 10.0)]
_TP_WKT_A = "POLYGON((" + ", ".join(
    f"{x} {y}" for x, y in _TP_A + [_TP_A[0]]) + "))"
_TP_WKT_B = "POLYGON((" + ", ".join(
    f"{x} {y}" for x, y in _TP_B + [_TP_B[0]]) + "))"
_TP_WKT_C = "POLYGON((" + ", ".join(
    f"{x} {y}" for x, y in _TP_C + [_TP_C[0]]) + "))"
_TP_BUF_PT, _TP_BUF_M = (-60.0, 40.0), 900000.0


def _topology_oracle_sql() -> str:
    from bigquery_etl_spark.plans.coverage12 import (
        _DUCK_INSIDE,
        _duck_ring_edges,
    )
    from bigquery_etl_spark.sources.bq_dialect import (
        _emit_point,
        _emit_ring,
        _sh_clip,
        _st_area,
        _st_buffer,
        _parse_poly_rings,
    )

    inter = _sh_clip(_TP_A, _TP_B)
    a_inter = float(_st_area([_emit_ring(inter)]).rstrip("D"))
    a_union = float(_st_area([_emit_ring(_TP_A)]).rstrip("D")) + float(
        _st_area([_emit_ring(_TP_C)]).rstrip("D")
    )
    buf_ring = _parse_poly_rings(
        _st_buffer([_emit_point(*_TP_BUF_PT), repr(_TP_BUF_M)])
    )[0]
    inter_edges = _duck_ring_edges([inter])
    union_edges = _duck_ring_edges([_TP_A, _TP_C])
    buf_edges = _duck_ring_edges([buf_ring])
    inside = _DUCK_INSIDE
    return f"""
    WITH pts AS (
        SELECT c_mktsegment,
               CAST(((c_custkey * 31) % 200) - 100 + 0.5 AS DOUBLE) AS plon,
               CAST(((c_custkey * 17) % 120) - 60 + 0.25 AS DOUBLE) AS plat
        FROM customer
    ),
    j AS (
        SELECT c_mktsegment, plon, plat,
               {inter_edges} AS iedges,
               {union_edges} AS uedges,
               {buf_edges} AS bedges
        FROM pts
    )
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN {inside.replace("edges", "iedges")}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_inter,
           CAST(SUM(CASE WHEN {inside.replace("edges", "uedges")}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_union,
           CAST(SUM(CASE WHEN {inside.replace("edges", "bedges")}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_buf,
           CAST(round({a_inter!r}) AS BIGINT) AS a_inter,
           CAST(round({a_union!r}) AS BIGINT) AS a_union,
           TRUE AS ab_intersects, FALSE AS ac_intersects
    FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


@query(
    "q_gis_topology",
    sql=_topology_oracle_sql(),
    tags=("dialect", "geo"),
)
def q_gis_topology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal GEOGRAPHY topology (r11): ST_INTERSECTS /
    ST_INTERSECTION / ST_UNION / ST_BUFFER over translate-time
    constant geographies — the computational geometry (Sutherland–
    Hodgman convex clip, segment-crossing + even-odd overlap test,
    locally-scaled buffer ring) runs in PYTHON at translate time and
    folds to ordinary polygon literals, so the results compose with
    the whole existing surface (the ray casts below run per row in
    whole-stage codegen, zero runtime topology). Overlapping unions,
    concave/holed intersections, computed operands and empty results
    still refuse loudly. The ORACLE recomputes with the IDENTICAL
    Python helpers (shared constants), so the twin is exact.
    Reference: BigQuery GEOGRAPHY topology fns (delegated,
    main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("gtp_cust")
    cat = LakeCatalog(spark)
    return cat.bq_sql(f"""
        WITH pts AS (
            SELECT c_mktsegment,
                   ST_GEOGPOINT(
                       CAST(MOD(c_custkey * 31, 200) - 100 + 0.5
                            AS FLOAT64),
                       CAST(MOD(c_custkey * 17, 120) - 60 + 0.25
                            AS FLOAT64)) AS pt
            FROM gtp_cust
        )
        SELECT c_mktsegment,
               COUNTIF(ST_CONTAINS(ST_INTERSECTION(
                   ST_GEOGFROMTEXT('{_TP_WKT_A}'),
                   ST_GEOGFROMTEXT('{_TP_WKT_B}')), pt)) AS n_inter,
               COUNTIF(ST_INTERSECTS(ST_UNION(
                   ST_GEOGFROMTEXT('{_TP_WKT_A}'),
                   ST_GEOGFROMTEXT('{_TP_WKT_C}')), pt)) AS n_union,
               COUNTIF(ST_CONTAINS(ST_BUFFER(
                   ST_GEOGPOINT({_TP_BUF_PT[0]}, {_TP_BUF_PT[1]}),
                   {_TP_BUF_M}), pt)) AS n_buf,
               CAST(ROUND(ST_AREA(ST_INTERSECTION(
                   ST_GEOGFROMTEXT('{_TP_WKT_A}'),
                   ST_GEOGFROMTEXT('{_TP_WKT_B}')))) AS INT64)
                   AS a_inter,
               CAST(ROUND(ST_AREA(ST_UNION(
                   ST_GEOGFROMTEXT('{_TP_WKT_A}'),
                   ST_GEOGFROMTEXT('{_TP_WKT_C}')))) AS INT64)
                   AS a_union,
               ST_INTERSECTS(ST_GEOGFROMTEXT('{_TP_WKT_A}'),
                   ST_GEOGFROMTEXT('{_TP_WKT_B}')) AS ab_intersects,
               ST_INTERSECTS(ST_GEOGFROMTEXT('{_TP_WKT_A}'),
                   ST_GEOGFROMTEXT('{_TP_WKT_C}')) AS ac_intersects
        FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


@query(
    "q_streaming_matview",
    sql="""
    WITH t AS (
        SELECT o_orderkey AS k, o_orderpriority AS prio,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 9 = 0
    ),
    f AS (
        SELECT k, prio,
               CASE WHEN k % 7 = 0 THEN CAST(price * 2 AS DECIMAL(18,2))
                    ELSE price END AS price
        FROM t WHERE k % 5 != 0
    )
    SELECT prio, CAST(SUM(price) AS DOUBLE) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM f GROUP BY prio ORDER BY prio
    """,
    tags=("streaming", "lake", "dialect"),
)
def q_streaming_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized view from the CHANGES TVF (r11, VERDICT
    r10 item 8 — C80): ``CREATE STREAMING MATERIALIZED VIEW mv AS
    SELECT … FROM CHANGES(TABLE t, NULL, NULL) GROUP BY …`` subscribes
    the C23 epoch-fenced retracting fold to the table's own commit
    log; after a DELETE and a value-rewriting UPDATE land, reading the
    view (which drains the stream first — BigQuery's always-current MV
    semantics) must equal the ORACLE's closed-form recompute of the
    final state — insert, retraction and post-image paths all
    exercised. DECIMAL sums keep the fold exact through retractions
    (float drift never cancels — apply_change_feed's documented
    contract). The view and checkpoint persist under a scratch
    warehouse; each invocation re-attaches (epoch fence resumes) and
    DROPs its stream handle on exit, so re-runs are O(new commits)."""
    import os

    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(d: str) -> None:
        src = (
            load(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 9 == 0)
            .select(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderpriority").alias("prio"),
                F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            )
        )
        t = VersionedTable(spark, os.path.join(d, "tbl"))
        t.create(src)
        t.enable_change_feed(["k"])
        c = LakeCatalog(spark)
        c.register("smq_t", t)
        c.sql("DELETE FROM smq_t WHERE k % 5 = 0")
        c.sql(
            "UPDATE smq_t SET price = CAST(price * 2 AS DECIMAL(18,2)) "
            "WHERE k % 7 = 0"
        )

    root = scratch_build(f"smq_{sf_dir}", "smq_", _build)
    cat = LakeCatalog(spark, warehouse=os.path.join(root, "wh"))
    cat.register("smq_t", VersionedTable(spark, os.path.join(root, "tbl")))
    cat.sql(
        "CREATE STREAMING MATERIALIZED VIEW smq_mv AS "
        "SELECT prio, SUM(price) AS total, COUNT(*) AS n "
        "FROM CHANGES(TABLE smq_t, NULL, NULL) GROUP BY prio"
    )
    res = cat.sql(
        "SELECT prio, CAST(total AS DOUBLE) AS total, n FROM smq_mv "
        "ORDER BY prio"
    )
    # materialized state lives on disk — stopping the stream handle
    # keeps re-invocations (bench iterations) from stacking streams on
    # one checkpoint
    cat.sql("DROP STREAMING MATERIALIZED VIEW smq_mv")
    return res


# Fixed test keysets for q_aead_roundtrip (the keyset JSON surface of
# KEYS.KEYSET_FROM_JSON): _AEAD_KS1 is the encrypting keyset; _AEAD_KS2
# is KS1 after a rotation — a new primary (2002) prepended, the old key
# (1001) retained, so ciphertexts written under KS1 must still decrypt
# under KS2 via the Tink key-id prefix. Keys here are TEST VECTORS, not
# secrets.
_AEAD_KS1 = (
    '{"primaryKeyId":1001,"key":[{"keyId":1001,"status":"ENABLED",'
    '"type":"AES_GCM_256",'
    '"rawKey":"AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8="}]}'
)
_AEAD_KS2 = (
    '{"primaryKeyId":2002,"key":[{"keyId":2002,"status":"ENABLED",'
    '"type":"AES_GCM_256",'
    '"rawKey":"ICEiIyQlJicoKSorLC0uLzAxMjM0NTY3ODk6Ozw9Pj8="},'
    '{"keyId":1001,"status":"ENABLED","type":"AES_GCM_256",'
    '"rawKey":"AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8="}]}'
)


@query(
    "q_aead_roundtrip",
    sql="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_rt_ok,
           CAST(COUNT(*) AS BIGINT) AS n_rot_ok,
           CAST(SUM(33 + LENGTH(c_name)) AS BIGINT) AS total_ct_len,
           CAST(2 AS BIGINT) AS klen
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("dialect", "crypto"),
    twin="invariant",
)
def q_aead_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AEAD envelope encryption (r11, closing VERDICT r10 "What's
    missing" #6): BigQuery's AEAD.ENCRYPT / AEAD.DECRYPT_STRING /
    KEYS.* on Spark's BUILT-IN AES-256-GCM kernel (aes_encrypt /
    try_aes_decrypt — JVM-side javax.crypto, random 96-bit IV, 128-bit
    tag, AAD-authenticated). Per row: encrypt c_name under KS1 with the
    row key as additional_data, decrypt under KS1 (n_rt_ok) AND under
    the ROTATED keyset KS2 (n_rot_ok — the Tink key-id prefix routes to
    the retained old key), plus KEYS.ADD_KEY_FROM_RAW_BYTES →
    KEYSET_LENGTH on the key-management side. INVARIANT twin: the IV is
    random so ciphertexts are not comparable, but every decrypt must
    round-trip (n_rt_ok = n_rot_ok = n_rows) and GCM ciphertext length
    is deterministic (5-byte Tink prefix + 12 IV + len + 16 tag = 33 +
    len). Whole plan is ONE hash aggregate over pure Catalyst
    expressions — no UDFs, no extra shuffle; keyset JSON parse is
    constant-folded per literal. Reference: BigQuery AEAD functions
    (delegated surface, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("aead_cust")
    cat = LakeCatalog(spark)
    return cat.bq_sql(f"""
        WITH e AS (
            SELECT c_mktsegment, c_name,
                   AEAD.ENCRYPT(
                       KEYS.KEYSET_FROM_JSON('{_AEAD_KS1}'),
                       c_name, CAST(c_custkey AS STRING)) AS ct,
                   CAST(c_custkey AS STRING) AS aad
            FROM aead_cust
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS INT64) AS n_rows,
               COUNTIF(AEAD.DECRYPT_STRING(
                   KEYS.KEYSET_FROM_JSON('{_AEAD_KS1}'), ct, aad)
                   = c_name) AS n_rt_ok,
               COUNTIF(AEAD.DECRYPT_STRING(
                   KEYS.KEYSET_FROM_JSON('{_AEAD_KS2}'), ct, aad)
                   = c_name) AS n_rot_ok,
               CAST(SUM(LENGTH(ct)) AS INT64) AS total_ct_len,
               CAST(KEYS.KEYSET_LENGTH(KEYS.ADD_KEY_FROM_RAW_BYTES(
                   KEYS.KEYSET_FROM_JSON('{_AEAD_KS1}'), 'AES_GCM',
                   UNHEX('000102030405060708090A0B0C0D0E0F')))
                   AS INT64) AS klen
        FROM e GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


_GAP_FILL_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS TIMESTAMP) AS ts,
         CAST(SUM(o_totalprice) AS DOUBLE) AS total,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders
  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
    AND o_custkey % 19 = 0
  GROUP BY 1, 2),
bounds AS (SELECT prio, MIN(ts) AS lo, MAX(ts) AS hi FROM base
           GROUP BY prio),
grid AS (SELECT prio, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))
             AS ts FROM bounds),
j AS (SELECT g.prio, g.ts, base.total, base.cnt
      FROM grid g LEFT JOIN base
        ON base.prio = g.prio AND base.ts = g.ts),
f AS (
  SELECT prio, ts, total,
    last_value(CASE WHEN total IS NOT NULL THEN
        struct_pack(t := epoch_us(ts), v := total) END IGNORE NULLS)
      OVER (PARTITION BY prio ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
    first_value(CASE WHEN total IS NOT NULL THEN
        struct_pack(t := epoch_us(ts), v := total) END IGNORE NULLS)
      OVER (PARTITION BY prio ORDER BY ts
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt,
    last_value(cnt IGNORE NULLS)
      OVER (PARTITION BY prio ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
  FROM j)
SELECT prio, ts,
  CASE WHEN total IS NOT NULL THEN total
       WHEN prev IS NOT NULL AND nxt IS NOT NULL
       THEN prev.v + (nxt.v - prev.v) *
            ((epoch_us(ts) - prev.t) / CAST(nxt.t - prev.t AS DOUBLE))
       END AS total,
  cnt
FROM f ORDER BY prio, ts
"""


@query(
    "q_gap_fill_tvf",
    sql=_GAP_FILL_ORACLE,
    tags=("tvf", "timeseries"),
)
def q_gap_fill_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GAP_FILL`` TVF (r11): BigQuery's time-series gap filling —
    daily per-priority order totals over a sparse customer slice get a
    complete day grid per partition, 'linear' interpolation for the
    revenue column and 'locf' for the count column. Lowering
    (operators/gapfill.py): ONE bounds aggregate per partition, the
    grid expands via sequence()+explode INSIDE tasks (no driver
    collect — a 100 TB series only ever materializes its own
    partition's grid), one equi-join, and both fill windows share one
    sort (a single Window node in the plan). EXACT twin: the oracle
    recomputes the identical interpolation closed form (same epoch-
    micros arithmetic, same double division), so values are
    bit-identical. Reference: BigQuery GAP_FILL (delegated surface,
    main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("gf_orders")
    cat = LakeCatalog(spark)
    return cat.sql("""
        SELECT prio, ts, total, cnt
        FROM GAP_FILL(
            (SELECT o_orderpriority AS prio,
                    CAST(o_orderdate AS TIMESTAMP) AS ts,
                    CAST(SUM(o_totalprice) AS DOUBLE) AS total,
                    COUNT(*) AS cnt
             FROM gf_orders
             WHERE o_orderdate BETWEEN DATE '1995-01-01'
                                   AND DATE '1995-03-31'
               AND o_custkey % 19 = 0
             GROUP BY 1, 2),
            ts_column => 'ts',
            bucket_width => INTERVAL 1 DAY,
            partitioning_columns => ['prio'],
            value_columns => [('total', 'linear'), ('cnt', 'locf')])
        ORDER BY prio, ts
    """)


# DuckDB (RE2, no literal escape processing) spelling of the same
# LOG_ANALYZER token class bq_dialect emits for Spark (Java regex with
# literal escapes) — documented pair, keep in sync with
# bq_dialect._LOG_TOKEN_CLASS.
_DUCK_LOG_TOKEN_CLASS = (
    r"[^\s\x00\[\]<>(){}|!;,''\"*&?+/:=@.$%\\_-]+"
)

_TEXT_ANALYZE_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, lang,
           regexp_extract_all(lower(text), '{_DUCK_LOG_TOKEN_CLASS}')
               AS toks
    FROM documents
),
tf AS (
    SELECT doc_id, lang, t.term, COUNT(*) AS c
    FROM raw, UNNEST(toks) AS t(term) GROUP BY 1, 2, 3
),
per_doc AS (
    SELECT doc_id, lang, COUNT(*) AS n_terms, MAX(c) AS max_c
    FROM tf GROUP BY 1, 2
)
SELECT r.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(r.toks)) AS BIGINT) AS total_tokens,
       CAST(SUM(GREATEST(length(r.toks) - 1, 0)
                + GREATEST(length(r.toks) - 2, 0)) AS BIGINT)
           AS total_ngrams,
       CAST(SUM(COALESCE(p.n_terms, 0)) AS BIGINT) AS distinct_terms,
       CAST(MAX(COALESCE(p.max_c, 0)) AS BIGINT) AS max_tf
FROM raw r LEFT JOIN per_doc p ON p.doc_id = r.doc_id
GROUP BY r.lang ORDER BY r.lang
"""


@query(
    "q_text_analyze",
    sql=_TEXT_ANALYZE_ORACLE,
    tags=("dialect", "text"),
)
def q_text_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery text-analysis functions (r11): ``TEXT_ANALYZE`` (the
    LOG_ANALYZER tokenizer behind search indexes — lowercase, maximal
    runs of non-delimiters), ``ML.NGRAMS`` (position-major [2,3]-grams)
    and ``ML.BAG_OF_WORDS`` (per-document term/count structs), all
    pure-codegen lambda-HOF lowerings — zero UDFs, one hash aggregate,
    the scan reads only (doc_id, lang, text). EXACT twin: DuckDB
    re-tokenizes with the RE2 spelling of the identical token class and
    recomputes the n-gram count closed-form (L-1)+(L-2) while Spark
    counts the materialized ML.NGRAMS output — same numbers from
    independent routes. Reference: BigQuery TEXT_ANALYZE / ML.NGRAMS /
    ML.BAG_OF_WORDS (delegated surface, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "documents").createOrReplaceTempView("ta_docs")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH t0 AS (
            -- tokenize ONCE (r12): spelling TEXT_ANALYZE per consumer
            -- carried 6 regexp_extract_all evaluations through the
            -- optimized plan and a 24 s cold Janino compile on the
            -- duplicated HOF tree; a single-reference layer compiles
            -- the tokenizer once with byte-identical results
            SELECT doc_id, lang, TEXT_ANALYZE(text) AS toks
            FROM ta_docs
        ),
        tok AS (
            SELECT doc_id, lang, toks,
                   ML.BAG_OF_WORDS(toks) AS bag,
                   ML.NGRAMS(toks, [2, 3]) AS grams
            FROM t0
        )
        SELECT lang,
               CAST(COUNT(*) AS INT64) AS n_docs,
               CAST(SUM(ARRAY_LENGTH(toks)) AS INT64) AS total_tokens,
               CAST(SUM(ARRAY_LENGTH(grams)) AS INT64) AS total_ngrams,
               CAST(SUM(ARRAY_LENGTH(bag)) AS INT64) AS distinct_terms,
               CAST(MAX(COALESCE(ARRAY_MAX(TRANSFORM(bag,
                   __b -> __b.count)), 0)) AS INT64) AS max_tf
        FROM tok GROUP BY lang ORDER BY lang
    """)


_FUNCS_R11_ORACLE = """
WITH base AS (
    SELECT o_orderpriority AS prio, o_orderdate AS d,
           CAST(o_orderkey AS VARCHAR) AS okey, o_totalprice,
           strpos(CAST(o_orderkey AS VARCHAR), '0') AS p1
    FROM orders WHERE o_custkey % 31 = 0
)
SELECT prio,
       DATE '1950-01-01' + to_days(CAST(
           (date_diff('day', DATE '1950-01-01', d) // 14) * 14
           AS INTEGER)) AS bucket14,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(last_day(date_trunc('quarter', d) + INTERVAL 2 MONTH))
           AS q_end,
       MIN(d + to_days(CAST(6 - dayofweek(d) AS INTEGER))) AS w_end,
       MIN(make_timestamp(
           CAST(epoch_us(CAST(d AS TIMESTAMP)) -
                ((epoch_us(CAST(d AS TIMESTAMP)) - (-631152000000000))
                 % 43200000000) AS BIGINT))) AS tb,
       CAST(SUM(CASE WHEN p1 > 0 AND
                strpos(substr(okey, CAST(p1 + 1 AS INTEGER)), '0') > 0
                THEN p1 + strpos(substr(okey, CAST(p1 + 1 AS INTEGER)),
                                 '0')
                ELSE 0 END) AS BIGINT) AS instr_sum,
       MIN('{"p":"' || prio || '"}') AS j,
       CAST(SUM(CASE WHEN lower(upper(prio)) = lower(prio)
                THEN 1 ELSE 0 END) AS BIGINT) AS ci_n,
       CAST(MIN(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,9)))
           AS DOUBLE) AS min_price
FROM base GROUP BY 1, 2 ORDER BY 1, 2
"""


@query(
    "q_funcs_r11",
    sql=_FUNCS_R11_ORACLE,
    tags=("dialect", "functions"),
)
def q_funcs_r11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 misc function pack — BigQuery functions that previously
    leaked unknown-function errors, each exercised against a DuckDB
    closed-form recompute: DATE_BUCKET / TIMESTAMP_BUCKET (1950-01-01
    default origin, pmod-floor grid — the GROUP BY key here, so the
    bucket IS the aggregation grain), LAST_DAY(d, QUARTER/WEEK)
    (BigQuery weeks begin Sunday), 4-arg INSTR (nth-occurrence LOCATE
    chain), JSON_OBJECT (literal keys -> named-struct serialization),
    COLLATE('und:ci') case-insensitive comparison (Spark UTF8_LCASE
    collation), PARSE_NUMERIC (trim + HALF_UP decimal(38,9) cast). One
    hash aggregate, all pure codegen. Reference: BigQuery date/string/
    JSON function docs (delegated surface, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("fr_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        SELECT o_orderpriority AS prio,
               DATE_BUCKET(o_orderdate, INTERVAL 14 DAY) AS bucket14,
               CAST(COUNT(*) AS INT64) AS n,
               MIN(LAST_DAY(o_orderdate, QUARTER)) AS q_end,
               MIN(LAST_DAY(o_orderdate, WEEK)) AS w_end,
               MIN(TIMESTAMP_BUCKET(CAST(o_orderdate AS TIMESTAMP),
                   INTERVAL 12 HOUR)) AS tb,
               CAST(SUM(INSTR(CAST(o_orderkey AS STRING), '0', 1, 2)) AS INT64)
                   AS instr_sum,
               MIN(CAST(JSON_OBJECT('p', o_orderpriority) AS STRING))
                   AS j,
               COUNTIF(COLLATE(UPPER(o_orderpriority), 'und:ci')
                   = LOWER(o_orderpriority)) AS ci_n,
               CAST(MIN(PARSE_NUMERIC(CAST(o_totalprice AS STRING)))
                   AS FLOAT64) AS min_price
        FROM fr_orders WHERE MOD(o_custkey, 31) = 0
        GROUP BY 1, 2 ORDER BY 1, 2
    """)


def _funcs_r11b_oracle() -> str:
    from bigquery_etl_spark.sources.bq_dialect import geohash_sql

    gh = geohash_sql("lon", "lat", 5, "duck")
    return f"""
    WITH pts AS (
        SELECT c_mktsegment AS seg,
               CAST(((c_custkey * 29) % 360) - 180 + 0.5 AS DOUBLE) AS lon,
               CAST(((c_custkey * 13) % 170) - 85 + 0.25 AS DOUBLE) AS lat,
               CAST(c_acctbal AS DOUBLE) AS bal,
               c_name, c_custkey
        FROM customer
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(bal, 0.9) AS p90,
           quantile_disc(bal, 0.5) AS med_disc,
           CAST(COUNT(DISTINCT {gh}) AS BIGINT) AS n_cells,
           CAST(SUM(CASE WHEN strpos(substr(c_name, 3), '1') = 0 THEN 0
                    ELSE 2 + strpos(substr(c_name, 3), '1') END)
               AS BIGINT) AS ri_sum,
           CAST(2 * COUNT(*) AS BIGINT) AS cat_size,
           CAST(3 * SUM(c_custkey) AS BIGINT) AS cat_sum,
           MIN('x' || chr(65533)) AS safe_str
    FROM pts GROUP BY seg ORDER BY seg
    """


@query(
    "q_funcs_r11b",
    sql=_funcs_r11b_oracle(),
    tags=("dialect", "functions", "geo"),
)
def q_funcs_r11b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second r11 function batch: PERCENTILE_CONT / PERCENTILE_DISC
    (lowered onto Spark's interpolating PERCENTILE and the ANSI
    PERCENTILE_DISC WITHIN GROUP respelling; spelled in aggregate
    position since r14 — the r11 window form was partition-constant
    over the same key the consumer groups by, see the opt note below —
    the BigQuery window spelling itself stays exercised by
    test_bq_dialect), ST_GEOHASH (translate-time unrolled bit-interleave —
    the DuckDB oracle evaluates the SAME generated expression, shift
    for shift), ARRAY_CONCAT_AGG (flatten∘collect_list, checked via
    order-free size/sum reductions), positional REGEXP_INSTR, and
    SAFE_CONVERT_BYTES_TO_STRING (make_valid_utf8 — U+FFFD for
    malformed input, recomputed by the oracle as a chr(65533) literal).
    One window pass + one hash aggregate. Reference: BigQuery
    navigation/GIS/string function docs (delegated surface,
    main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("f2_cust")
    cat = LakeCatalog(spark)
    # r14 opt (guide §2.3, VERDICT r13 item 1): the window spelling
    # (PERCENTILE_x OVER (PARTITION BY seg), then MIN per group)
    # shuffled and SORTED every full pts row on hash(seg) just to stamp
    # a partition-constant value. The consumer groups by the same key,
    # so the grouped aggregate computes the identical value (same
    # Percentile expression over the same row multiset, order-
    # insensitive count-map buffer) with no window Sort, and partial
    # aggregation runs ahead of the exchange. The window spelling stays
    # covered by the dialect tests (test_bq_dialect) and the lowering
    # in _percentile_window_rewriter.
    return cat.bq_sql("""
        WITH pts AS (
            SELECT c_mktsegment AS seg,
                   CAST(MOD(c_custkey * 29, 360) - 180 + 0.5
                        AS FLOAT64) AS lon,
                   CAST(MOD(c_custkey * 13, 170) - 85 + 0.25
                        AS FLOAT64) AS lat,
                   CAST(c_acctbal AS FLOAT64) AS bal,
                   c_name, c_custkey
            FROM f2_cust
        )
        SELECT seg,
               CAST(COUNT(*) AS INT64) AS n,
               PERCENTILE_CONT(bal, 0.9) AS p90,
               PERCENTILE_DISC(bal, 0.5) AS med_disc,
               CAST(COUNT(DISTINCT ST_GEOHASH(ST_GEOGPOINT(lon, lat), 5))
                   AS INT64) AS n_cells,
               CAST(SUM(REGEXP_INSTR(c_name, '1', 3)) AS INT64)
                   AS ri_sum,
               CAST(ARRAY_LENGTH(ARRAY_CONCAT_AGG(
                   [c_custkey, c_custkey * 2])) AS INT64) AS cat_size,
               CAST(AGGREGATE(ARRAY_CONCAT_AGG(
                   [c_custkey, c_custkey * 2]), CAST(0 AS INT64),
                   (__a, __x) -> __a + __x) AS INT64) AS cat_sum,
               MIN(SAFE_CONVERT_BYTES_TO_STRING(
                   CONCAT(CAST('x' AS BYTES), FROM_HEX('FF'))))
                   AS safe_str
        FROM pts GROUP BY seg ORDER BY seg
    """)


@query(
    "q_ml_forest",
    sql="""
    SELECT (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0) AS n,
           TRUE AS reg_r2_ok, TRUE AS reg_mae_ok,
           TRUE AS cls_acc_ok, TRUE AS cls_logloss_ok,
           TRUE AS bagging_diverse
    """,
    tags=("ml", "bqml", "random_forest"),
    # invariant twin: forest structure lives in engine-float space;
    # the checks are fit-quality bounds on planted noiseless targets
    twin="invariant",
)
def q_ml_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML random forest (r11): ``CREATE MODEL … OPTIONS(model_type=
    'random_forest_regressor'|'random_forest_classifier',
    num_parallel_tree=…, subsample=…)`` then ``ML.EVALUATE`` /
    ``ML.PREDICT``. Each member is a single histogram tree
    (operators/ml.py fit_random_forest — one boosting step at
    learning_rate 1, so leaves are shrunk subsample means) on a
    deterministic hash subsample; prediction AVERAGES member margins
    (regression) or member sigmoids (classification) — bagging.
    Invariant twin: an axis-aligned step target must fit to r2 > 0.98
    / MAE < 1.5, the box-label classifier to accuracy > 0.97 with
    log-loss < 0.3, and the members must actually differ (bagging
    diversity: > 1 distinct member base score — a subsampling bug that
    trains every member on the full input collapses them). Reference:
    BigQuery ML random forest (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    pts = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 3 == 0
    ).select(
        (F.col("o_orderkey") % 19).cast("double").alias("x1"),
        (F.col("o_custkey") % 23).cast("double").alias("x2"),
    ).select(
        "x1",
        "x2",
        (
            F.when(F.col("x1") > 9, 10.0).otherwise(0.0)
            + F.when(F.col("x2") > 11, 5.0).otherwise(0.0)
        ).alias("y"),
        ((F.col("x1") > 8) & (F.col("x2") <= 15)).cast("int").alias("lbl"),
    )
    pts.createOrReplaceTempView("rf_pts")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL rfq_reg OPTIONS("
        "model_type='random_forest_regressor', input_label_cols=['y'], "
        "num_parallel_tree=8, max_tree_depth=4, subsample=0.7) "
        "AS SELECT x1, x2, y FROM rf_pts"
    )
    cat.sql(
        "CREATE OR REPLACE MODEL rfq_cls OPTIONS("
        "model_type='random_forest_classifier', input_label_cols=['lbl'], "
        "num_parallel_tree=8, max_tree_depth=4, subsample=0.7) "
        "AS SELECT x1, x2, lbl FROM rf_pts"
    )
    ev_r = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL rfq_reg, "
        "(SELECT x1, x2, y FROM rf_pts))"
    )
    ev_c = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL rfq_cls, "
        "(SELECT x1, x2, lbl FROM rf_pts))"
    )
    bases = {
        round(m["base_score"], 9)
        for m in cat.models["rfq_reg"]["members"]
    }
    n_df = pts.agg(F.count(F.lit(1)).alias("n"))
    return (
        n_df.crossJoin(ev_r)
        .crossJoin(
            ev_c.select(
                F.col("accuracy").alias("__acc"),
                F.col("log_loss").alias("__ll"),
            )
        )
        .select(
            F.col("n").cast("long").alias("n"),
            (F.col("r2_score") > 0.98).alias("reg_r2_ok"),
            (F.col("mean_absolute_error") < 1.5).alias("reg_mae_ok"),
            (F.col("__acc") > 0.97).alias("cls_acc_ok"),
            (F.col("__ll") < 0.3).alias("cls_logloss_ok"),
            F.lit(len(bases) > 1).alias("bagging_diverse"),
        )
    )


_FUNCS_R11C_ORACLE = """
WITH base AS (
    SELECT c_mktsegment AS seg, c_name,
           CAST(c_acctbal AS DOUBLE) AS bal,
           c_custkey,
           CAST(NULLIF(c_custkey % 10, 0) AS DOUBLE) AS v
    FROM customer
),
seg_avg AS (
    SELECT seg, AVG(v) AS av, SUM(v) AS sv,
           SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_null
    FROM base GROUP BY seg
)
SELECT b.seg,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_b32_rt,
       MIN('MZXW6YTBOI======') AS b32_const,
       MIN('spark-graft') AS proj,
       CAST(SUM(CAST(CASE WHEN c_custkey % 5 = 0 THEN 0
                WHEN b.bal / (c_custkey % 5) IS NULL THEN 0
                ELSE b.bal / (c_custkey % 5) END
                AS DECIMAL(38,9))) AS DOUBLE) AS safe_div_sum,
       CAST(SUM(CASE WHEN (c_custkey % 7) - 3 <= 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_log_null,
       CAST(SUM(CAST(COALESCE(b.v, s.av) AS DECIMAL(38,9)))
           AS DOUBLE) AS imputed_sum
FROM base b JOIN seg_avg s ON s.seg = b.seg
GROUP BY b.seg ORDER BY b.seg
"""


@query(
    "q_funcs_r11c",
    sql=_FUNCS_R11C_ORACLE,
    tags=("dialect", "functions"),
)
def q_funcs_r11c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third r11 function batch — the SAFE. prefix (BigQuery's general
    error-suppression prefix: TRY-lowered arithmetic, domain-guarded
    math, no-op on total functions), RFC 4648 base32
    (TO_BASE32/FROM_BASE32 — hex-boundary shift arithmetic, pinned
    against the RFC's published vectors in the suite), ML.IMPUTER
    window imputation, and @@project_id system-variable substitution.
    EXACT twin: the oracle recomputes SAFE.DIVIDE as its CASE closed
    form, SAFE.LOG's domain as a sign test, the mean-imputation as
    COALESCE against the per-group average, and the base32 round-trip
    count as COUNT(*) (the encode/decode pair must be the identity on
    every c_name). Decimal-cast sums keep the float tails identical.
    Reference: BigQuery SAFE prefix / conversion function docs
    (delegated surface, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("f3_cust")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH base AS (
            SELECT c_mktsegment AS seg, c_name,
                   CAST(c_acctbal AS FLOAT64) AS bal,
                   c_custkey,
                   CAST(NULLIF(MOD(c_custkey, 10), 0) AS FLOAT64) AS v
            FROM f3_cust
        ),
        w AS (
            SELECT seg, c_name, bal, c_custkey,
                   ML.IMPUTER(v, 'mean')
                       OVER(PARTITION BY seg) AS v_filled
            FROM base
        )
        SELECT seg,
               CAST(COUNT(*) AS INT64) AS n,
               COUNTIF(CAST(FROM_BASE32(TO_BASE32(CAST(c_name AS BYTES)))
                   AS STRING) = c_name) AS n_b32_rt,
               MIN(TO_BASE32(CAST('foobar' AS BYTES))) AS b32_const,
               MIN(@@project_id) AS proj,
               CAST(SUM(CAST(IFNULL(SAFE.DIVIDE(bal, MOD(c_custkey, 5)),
                   0) AS NUMERIC)) AS FLOAT64) AS safe_div_sum,
               COUNTIF(SAFE.LOG(MOD(c_custkey, 7) - 3) IS NULL)
                   AS n_log_null,
               CAST(SUM(CAST(v_filled AS NUMERIC)) AS FLOAT64)
                   AS imputed_sum
        FROM w GROUP BY seg ORDER BY seg
    """)


@query(
    "q_ml_kmeans_eval",
    sql="""
    SELECT (SELECT COUNT(*) FROM orders WHERE o_orderkey % 4 = 0) AS n,
           TRUE AS db_small, TRUE AS msd_bounded, TRUE AS msd_positive
    """,
    tags=("ml", "bqml", "kmeans"),
    # invariant twin: centroids live in engine-float space; the checks
    # bound the two public clustering metrics on planted blobs
    twin="invariant",
)
def q_ml_kmeans_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ML.EVALUATE(MODEL kmeans, t)`` (r11): BigQuery's clustering
    metrics — davies_bouldin_index and mean_squared_distance — from
    ONE distributed assign+aggregate pass (k rows to the driver, then
    k×k closed-form arithmetic; operators/ml.py evaluate_kmeans).
    Invariant twin: two planted blobs 30 apart with ≤1.4 of jitter
    must evaluate to DB < 0.1 (well-separated) and 0 < MSD < 1 (the
    within-blob jitter bound). Reference: BigQuery ML.EVALUATE for
    kmeans (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 4 == 0
    ).select(
        (
            F.when(F.col("o_orderkey") % 8 == 0, 0.0).otherwise(30.0)
            + (F.col("o_custkey") % 7).cast("double") / 7.0
        ).alias("x1"),
        ((F.col("o_custkey") % 5).cast("double") / 5.0).alias("x2"),
    ).createOrReplaceTempView("kme_pts")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL kme_m OPTIONS("
        "model_type='kmeans', num_clusters=2) "
        "AS SELECT x1, x2 FROM kme_pts"
    )
    ev = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL kme_m, "
        "(SELECT x1, x2 FROM kme_pts))"
    )
    n_df = spark.table("kme_pts").agg(F.count(F.lit(1)).alias("n"))
    return n_df.crossJoin(ev).select(
        F.col("n").cast("long").alias("n"),
        (F.col("davies_bouldin_index") < 0.1).alias("db_small"),
        (F.col("mean_squared_distance") < 1.0).alias("msd_bounded"),
        (F.col("mean_squared_distance") > 0.0).alias("msd_positive"),
    )


# DuckDB spellings of BigQuery's week anchors (unix-day arithmetic;
# anchors = first <weekday> on/after 1970-01-01, Thursday=0):
# SUNDAY=3, WEDNESDAY=6 — keep in sync with bq_dialect._WEEK_ANCHOR.
def _duck_week_start(expr: str, off: int) -> str:
    ud = f"date_diff('day', DATE '1970-01-01', {expr})"
    return f"({ud} - (({ud} - {off}) % 7))"


_DATE_BOUNDARIES_ORACLE = f"""
SELECT o_orderpriority AS prio,
       CAST(SUM(date_diff('month', DATE '1995-06-15', o_orderdate))
           AS BIGINT) AS m_sum,
       CAST(SUM(({_duck_week_start('o_orderdate', 3)}
                 - {_duck_week_start("DATE '1995-06-15'", 3)}) // 7)
           AS BIGINT) AS w_sum,
       CAST(SUM(date_diff('week', DATE '1995-06-15', o_orderdate))
           AS BIGINT) AS iw_sum,
       CAST(SUM(date_diff('quarter', DATE '1995-06-15', o_orderdate))
           AS BIGINT) AS q_sum,
       CAST(SUM(date_diff('year', DATE '1995-06-15', o_orderdate))
           AS BIGINT) AS y_sum,
       MIN(DATE '1970-01-01' + to_days(CAST(
           {_duck_week_start('o_orderdate', 3)} AS INTEGER)))
           AS w_start_min,
       MIN(date_trunc('week', o_orderdate)) AS iw_start_min,
       CAST(COUNT(DISTINCT {_duck_week_start('o_orderdate', 6)})
           AS BIGINT) AS n_wed_weeks
FROM orders GROUP BY prio ORDER BY prio
"""


@query(
    "q_date_boundaries",
    sql=_DATE_BOUNDARIES_ORACLE,
    tags=("dialect", "datetime"),
)
def q_date_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery date BOUNDARY semantics (r11 fix): ``DATE_DIFF`` counts
    part boundaries crossed — DATE_DIFF('2024-02-01', '2024-01-31',
    MONTH) = 1, where the old TIMESTAMPDIFF lowering counted elapsed
    whole units and returned 0 — and ``DATE_TRUNC(d, WEEK)`` anchors
    at SUNDAY (Spark's 'WEEK' is Monday; ISOWEEK previously fell
    through to Spark's unknown-format NULL). Every part here is
    recomputed by the ORACLE from its own boundary rules: DuckDB's
    date_diff is boundary-based for month/quarter/year/week(Monday),
    and the Sunday/Wednesday anchors use the identical unix-day shift
    arithmetic. WEEK(<WEEKDAY>) anchors are exercised via the
    Wednesday-week distinct count. Reference: BigQuery date function
    docs (delegated surface, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("db_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        SELECT o_orderpriority AS prio,
               CAST(SUM(DATE_DIFF(o_orderdate, DATE '1995-06-15',
                   MONTH)) AS INT64) AS m_sum,
               CAST(SUM(DATE_DIFF(o_orderdate, DATE '1995-06-15',
                   WEEK)) AS INT64) AS w_sum,
               CAST(SUM(DATE_DIFF(o_orderdate, DATE '1995-06-15',
                   ISOWEEK)) AS INT64) AS iw_sum,
               CAST(SUM(DATE_DIFF(o_orderdate, DATE '1995-06-15',
                   QUARTER)) AS INT64) AS q_sum,
               CAST(SUM(DATE_DIFF(o_orderdate, DATE '1995-06-15',
                   YEAR)) AS INT64) AS y_sum,
               MIN(CAST(DATE_TRUNC(o_orderdate, WEEK) AS DATE))
                   AS w_start_min,
               MIN(CAST(DATE_TRUNC(o_orderdate, ISOWEEK) AS DATE))
                   AS iw_start_min,
               CAST(COUNT(DISTINCT CAST(DATE_TRUNC(o_orderdate,
                   WEEK(WEDNESDAY)) AS DATE)) AS INT64) AS n_wed_weeks
        FROM db_orders GROUP BY prio ORDER BY prio
    """)
