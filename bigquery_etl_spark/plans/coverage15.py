"""Fifteenth coverage pack (r12) — VERDICT r11's ranked list:

- ``q_farm_fingerprint``: FARM_FINGERPRINT implemented for real
  (functions/farmhash.py — the exact public farmhashna::Fingerprint64
  as an Arrow-batched numpy kernel, differentially pinned against
  Guava's independent implementation). The DuckDB twin evaluates
  IDENTICAL values through the engine-neutral generated-constants
  pattern (C67/C85): every distinct input the query hashes is
  enumerable at plan-build time, so the oracle embeds the kernel's
  own outputs as literals — the comparison checks the SPARK plumbing
  (UDF registration, null passthrough, UTF-8 byte semantics, the
  MOD(ABS(...)) split idiom) against an independent relational
  recomputation.

Reference parity: the reference delegates its SQL surface to BigQuery
(reference main.py:21, 49-50, 160-185); these close gaps ranked in
VERDICT r11 "What's missing" / "Next round".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load


# LOG_ANALYZER token class, RE2 spelling (shared with coverage14's
# TEXT_ANALYZE twin — the DuckDB side re-tokenizes independently)
_DUCK_TOKENS = r"[^\s\x00\[\]<>(){}|!;,''\"*&?+/:=@.$%\\_-]+"

_ML_TFIDF_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, lang,
           regexp_extract_all(lower(text), '{_DUCK_TOKENS}') AS toks
    FROM documents WHERE doc_id % 2 = 0
),
n AS (SELECT COUNT(*) AS n_docs FROM raw),
tf AS (
    SELECT doc_id, lang, t.term, COUNT(*) AS tf
    FROM raw, UNNEST(toks) AS t(term) GROUP BY 1, 2, 3
),
dfreq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
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
    SELECT tf.doc_id, tf.lang, voc.idx,
           CAST(ROUND(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0))
               + 1.0) * 10000) AS BIGINT) AS units
    FROM tf JOIN dfreq USING (term) JOIN voc USING (term) CROSS JOIN n
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
    "q_ml_tfidf",
    sql=_ML_TFIDF_ORACLE,
    tags=("dialect", "text", "ml"),
)
def q_ml_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ML.TF_IDF(tokens) OVER()`` (r12, VERDICT r11 item 3): the
    corpus-window idiom rewrites at the STATEMENT level onto the
    scale-safe two-pass plan (bq_dialect._rewrite_ml_tfidf_over) —
    document frequencies aggregate over the base CTE, term frequencies
    per distinct token array, vectors join back on the array value.
    No per-row corpus state, no driver collection; shuffles keyed on
    term and on the token-array hash. The refusal is retired. The
    twin recomputes TF-IDF relationally in DuckDB from an independent
    tokenization, including the 0-based dense vocabulary index
    (r13: ordered by (bucket, term) via the distributed prefix-sum —
    no unpartitioned vocabulary sort; verified through the
    index-weighted checksum) and the documented smooth-idf closed
    form tf * (LN((N+1)/(df+1)) + 1). Per-entry
    values reduce to integer 1e-4 units before summation so the
    cross-engine comparison is order-independent. Reference: BigQuery
    ML.TF_IDF docs (delegated surface, main.py:21, 49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "documents").createOrReplaceTempView("tfi_docs")
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
                   ML.TF_IDF(TEXT_ANALYZE(text)) OVER() AS vec
            FROM tfi_docs WHERE MOD(doc_id, 2) = 0
        ) GROUP BY lang ORDER BY lang
    """)


def _farm_oracle_sql() -> str:
    """DuckDB twin for q_farm_fingerprint: the kernel's own values for
    the enumerable input domain, embedded as literal CASEs."""
    from bigquery_etl_spark.functions.farmhash import fingerprint64_signed

    prios = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    prio_case = "CASE o_orderpriority " + " ".join(
        f"WHEN '{p}' THEN CAST({fingerprint64_signed(p.encode())} "
        "AS BIGINT)"
        for p in prios
    ) + " END"
    key_case = "CASE (o_orderkey % 97) " + " ".join(
        f"WHEN {k} THEN CAST("
        f"{fingerprint64_signed(f'k{k}'.encode())} AS BIGINT)"
        for k in range(97)
    ) + " END"
    return f"""
    WITH h AS (
        SELECT o_orderpriority, {prio_case} AS h_prio,
               {key_case} AS h_key
        FROM orders
    )
    SELECT o_orderpriority AS prio,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(h_prio) AS h_prio,
           CAST(SUM(CASE WHEN abs(h_key) % 10 < 8 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_sampled,
           MIN(h_key) AS min_hash
    FROM h GROUP BY prio ORDER BY prio
    """


@query(
    "q_farm_fingerprint",
    sql=_farm_oracle_sql(),
    tags=("dialect", "functions", "hash"),
)
def q_farm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FARM_FINGERPRINT (r12, VERDICT r11 missing #1): the exact
    public farmhashna::Fingerprint64 (functions/farmhash.py), lowered
    from BigQuery SQL onto an Arrow-batched numpy kernel — rows
    grouped by branch class inside each Arrow batch, so the per-row
    cost is C-level array arithmetic, not Python. The query exercises
    the two idioms real BigQuery estates use it for: a deterministic
    content hash per value, and the ``MOD(ABS(FARM_FINGERPRINT(x)),
    N)`` sampling/split predicate. 100 TB shape: stateless scalar
    map over the scan, no shuffle beyond the final group. The twin
    embeds the kernel's outputs for the enumerable input domain as
    literals (generated-constants pattern, C67/C85); the kernel
    itself is pinned against Guava's independent farmHashFingerprint64
    in tests/test_farmhash.py. Reference: BigQuery hash function docs
    (delegated surface, main.py:21, 49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("ff_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH h AS (
            SELECT o_orderpriority,
                   FARM_FINGERPRINT(o_orderpriority) AS h_prio,
                   FARM_FINGERPRINT(CONCAT('k',
                       CAST(MOD(o_orderkey, 97) AS STRING))) AS h_key
            FROM ff_orders
        )
        SELECT o_orderpriority AS prio,
               CAST(COUNT(*) AS INT64) AS n,
               MIN(h_prio) AS h_prio,
               CAST(COUNTIF(MOD(ABS(h_key), 10) < 8) AS INT64)
                   AS n_sampled,
               MIN(h_key) AS min_hash
        FROM h GROUP BY prio ORDER BY prio
    """)


# -- q_gis_topology_computed (r12, VERDICT r11 item 6) ------------------------
# Topology over COMPUTED (column-valued) geometries: per-row points
# and per-row square polygons built from expressions, classified by
# the geodesic runtime HOF fold (S2 4-sign crossing predicate,
# Q = south pole), intersected (point-or-NULL), unioned (runtime
# multipoint dedup) and measured (Van Oosterom–Strackee spherical
# excess). The DuckDB twin evaluates the IDENTICAL edge algebra —
# same 3-vector trig, same sign products, same atan2 fan — spelled
# with list lambdas, so the two engines agree term for term.

# DuckDB 3-vector fragments for an arbitrary (lon, lat) pair
def _d3(lon: str, lat: str) -> tuple[str, str, str]:
    return (
        f"(cos(radians({lat})) * cos(radians({lon})))",
        f"(cos(radians({lat})) * sin(radians({lon})))",
        f"(sin(radians({lat})))",
    )


def _gis_computed_oracle() -> str:
    px, py, pz = _d3("plon", "plat")
    # square edges around (clon, clat), half-width 4 deg — as a list
    # of per-edge corner structs; the crossing predicate mirrors
    # bq_dialect._poly_contains's runtime fold exactly
    corners = [
        ("(clon - 4.0)", "(clat - 4.0)"),
        ("(clon + 4.0)", "(clat - 4.0)"),
        ("(clon + 4.0)", "(clat + 4.0)"),
        ("(clon - 4.0)", "(clat + 4.0)"),
    ]
    edge_structs = ", ".join(
        f"{{'alon': {ax}, 'alat': {ay}, 'blon': {bx}, 'blat': {by}}}"
        for (ax, ay), (bx, by) in zip(corners, corners[1:] + corners[:1])
    )
    ax3, ay3, az3 = _d3("__e.alon", "__e.alat")
    bx3, by3, bz3 = _d3("__e.blon", "__e.blat")
    n1 = f"({ay3} * {bz3} - {az3} * {by3})"
    n2 = f"({az3} * {bx3} - {ax3} * {bz3})"
    n3 = f"({ax3} * {by3} - {ay3} * {bx3})"
    pn = f"({px} * {n1} + {py} * {n2} + {pz} * {n3})"
    ta = f"({px} * {ay3} - {py} * {ax3})"
    tb = f"({px} * {by3} - {py} * {bx3})"
    s = f"(-{pn})"
    inside = (
        f"(list_sum(list_transform([{edge_structs}], __e -> "
        f"CASE WHEN {s} * (-{n3}) > 0 AND {s} * (-{tb}) > 0 AND "
        f"{s} * {ta} > 0 THEN 1 ELSE 0 END)) % 2 = 1)"
    )
    # spherical-excess area of the square: fan from corner 1 —
    # triangles (1,2,3) and (1,3,4), 2·atan2(det, 1 + dots) each,
    # the SAME term order as the Spark fold
    c3 = [_d3(x, y) for x, y in corners]

    def _tri(a, b, c):
        det = (
            f"({a[0]} * ({b[1]} * {c[2]} - {b[2]} * {c[1]}) + "
            f"{a[1]} * ({b[2]} * {c[0]} - {b[0]} * {c[2]}) + "
            f"{a[2]} * ({b[0]} * {c[1]} - {b[1]} * {c[0]}))"
        )
        dots = (
            f"(({a[0]} * {b[0]} + {a[1]} * {b[1]} + {a[2]} * {b[2]}) + "
            f"({b[0]} * {c[0]} + {b[1]} * {c[1]} + {b[2]} * {c[2]}) + "
            f"({c[0]} * {a[0]} + {c[1]} * {a[1]} + {c[2]} * {a[2]}))"
        )
        return f"2.0 * atan2({det}, 1.0 + {dots})"

    area = (
        f"(6371008.8 * 6371008.8 * abs({_tri(c3[0], c3[1], c3[2])} + "
        f"{_tri(c3[0], c3[2], c3[3])}))"
    )
    return f"""
    WITH pts AS (
        SELECT c_mktsegment,
               CAST(((c_custkey * 13) % 280) - 140 + 0.5 AS DOUBLE) AS plon,
               CAST(((c_custkey * 7) % 100) - 50 + 0.25 AS DOUBLE) AS plat,
               CAST(((c_custkey * 37) % 280) - 140 AS DOUBLE) AS clon,
               CAST(((c_custkey * 23) % 100) - 50 AS DOUBLE) AS clat
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN {inside} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inside,
           CAST(SUM(CASE WHEN {inside} THEN CAST(round(plon * 100)
               AS BIGINT) ELSE 0 END) AS BIGINT) AS inter_lon_units,
           CAST(SUM(CASE WHEN plon = clon AND plat = clat THEN 1
               ELSE 2 END) AS BIGINT) AS union_pts,
           CAST(SUM(CAST(round({area} / 10000.0) AS BIGINT))
               AS BIGINT) AS area_ha
    FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


@query(
    "q_gis_topology_computed",
    sql=_gis_computed_oracle(),
    tags=("dialect", "geo"),
)
def q_gis_topology_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topology on COMPUTED geometries (r12, VERDICT r11 item 6 —
    the literal-only restriction lifted): per row, a column-derived
    point and a column-derived square polygon (ARRAY of ST_GEOGPOINT
    structs). ST_INTERSECTS(square, point) runs the geodesic runtime
    HOF fold (S2 crossing predicate, Q = south pole — no literals
    anywhere); ST_INTERSECTION(square, point) returns the point when
    contained, NULL otherwise (NULL-for-empty, documented);
    ST_UNION(point, point) dedups at runtime into a multipoint;
    ST_AREA of the computed square evaluates the Van Oosterom–
    Strackee spherical-excess fan at runtime. One projection + one
    hash aggregate; the fold is O(edges) per row with no driver
    state — the 100 TB shape is a pure scalar map. The twin spells
    the IDENTICAL edge algebra with DuckDB list lambdas (same trig,
    same sign products, same atan2 fan). Reference: BigQuery
    geography functions (delegated surface, main.py:21, 49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("gtc_cust")
    cat = LakeCatalog(spark)
    square = (
        "ARRAY(ST_GEOGPOINT(clon - 4.0, clat - 4.0), "
        "ST_GEOGPOINT(clon + 4.0, clat - 4.0), "
        "ST_GEOGPOINT(clon + 4.0, clat + 4.0), "
        "ST_GEOGPOINT(clon - 4.0, clat + 4.0))"
    )
    return cat.bq_sql(f"""
        WITH pts AS (
            SELECT c_mktsegment,
                   CAST(MOD(c_custkey * 13, 280) - 140 + 0.5
                        AS FLOAT64) AS plon,
                   CAST(MOD(c_custkey * 7, 100) - 50 + 0.25
                        AS FLOAT64) AS plat,
                   CAST(MOD(c_custkey * 37, 280) - 140 AS FLOAT64)
                       AS clon,
                   CAST(MOD(c_custkey * 23, 100) - 50 AS FLOAT64)
                       AS clat
            FROM gtc_cust
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS INT64) AS n,
               CAST(COUNTIF(ST_INTERSECTS({square},
                   ST_GEOGPOINT(plon, plat))) AS INT64) AS n_inside,
               CAST(SUM(COALESCE(CAST(ROUND(ST_X(ST_INTERSECTION(
                   {square}, ST_GEOGPOINT(plon, plat))) * 100)
                   AS INT64), 0)) AS INT64) AS inter_lon_units,
               CAST(SUM(ST_NUMPOINTS(ST_UNION(
                   ST_GEOGPOINT(plon, plat),
                   ST_GEOGPOINT(clon, clat)))) AS INT64) AS union_pts,
               CAST(SUM(CAST(ROUND(ST_AREA({square}) / 10000.0)
                   AS INT64)) AS INT64) AS area_ha
        FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


# -- q_daead (r12, VERDICT r11 item 8) ----------------------------------------
# Deterministic AEAD: unlike GCM (random IV -> invariant twin only),
# AES-SIV ciphertext is a pure function of (key, plaintext, aad) — so
# the oracle can check EXACT CIPHERTEXT BYTES: the expected hex for
# the enumerable inputs embeds via the generated-constants pattern,
# computed at plan-build time by the same Python kernel the UDF runs.

_DAEAD_KEY = bytes(range(7, 71))  # fixed 64-byte key for the twin


def _daead_ks_json() -> str:
    import base64
    import json

    return json.dumps({
        "primaryKeyId": 11,
        "key": [{"keyId": 11, "status": "ENABLED",
                 "type": "AES_SIV_CMAC_256",
                 "rawKey": base64.b64encode(_DAEAD_KEY).decode()}],
    })


_DAEAD_SEGMENTS = [
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
]


def _daead_oracle() -> str:
    from bigquery_etl_spark.functions.daead import daead_encrypt

    ks = _daead_ks_json().encode()
    ct_case = "CASE c_mktsegment " + " ".join(
        "WHEN '{s}' THEN '{h}'".format(
            s=s,
            h=daead_encrypt(
                ks, f"seg-{s}".encode(), b"aad"
            ).hex(),
        )
        for s in _DAEAD_SEGMENTS
    ) + " END"
    return f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_rt,
           CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_ct,
           CAST(SUM(5 + 16 + length(c_name)) AS BIGINT) AS len_sum,
           MIN({ct_case}) AS seg_ct_hex
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


@query(
    "q_daead",
    sql=_daead_oracle(),
    tags=("dialect", "crypto"),
)
def q_daead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AEAD.DETERMINISTIC_ENCRYPT / _DECRYPT_STRING (r12, VERDICT r11
    item 8 — the last encryption-surface refusal retired): RFC 5297
    AES-SIV via the cryptography package's AESSIV in Arrow-batched
    pandas UDFs (functions/daead.py), Tink prefix semantics shared
    with the GCM family. Determinism is the POINT — and the proof:
    per-segment ciphertext of a fixed plaintext under the fixture
    keyset must equal the EXACT bytes the oracle embeds (computed at
    plan-build time by the same public algorithm, pinned to RFC 5297
    A.1 in tests/test_daead.py); per-row ciphertexts of c_name
    round-trip and their distinct count equals the distinct plaintext
    count (deterministic, collision-free). One projection + one hash
    aggregate; stateless scalar map at any scale. Reference: BigQuery
    AEAD docs (delegated surface, main.py:21, 49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("dae_cust")
    cat = LakeCatalog(spark)
    ksj = _daead_ks_json().replace("'", "''")
    return cat.bq_sql(f"""
        WITH e AS (
            SELECT c_mktsegment, c_name,
                   AEAD.DETERMINISTIC_ENCRYPT(
                       KEYS.KEYSET_FROM_JSON('{ksj}'),
                       c_name, c_mktsegment) AS ct,
                   AEAD.DETERMINISTIC_ENCRYPT(
                       KEYS.KEYSET_FROM_JSON('{ksj}'),
                       CONCAT('seg-', c_mktsegment), 'aad') AS seg_ct
            FROM dae_cust
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS INT64) AS n,
               CAST(COUNTIF(AEAD.DETERMINISTIC_DECRYPT_STRING(
                   KEYS.KEYSET_FROM_JSON('{ksj}'), ct, c_mktsegment)
                   = c_name) AS INT64) AS n_rt,
               CAST(COUNT(DISTINCT ct) AS INT64) AS n_ct,
               CAST(SUM(LENGTH(ct)) AS INT64) AS len_sum,
               MIN(TO_HEX(seg_ct)) AS seg_ct_hex
        FROM e GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)
