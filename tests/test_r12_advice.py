"""r12 ADVICE regressions (VERDICT r11 ADVICE.md, all five items):

1. DATETIME_DIFF counts part boundaries for DAY/HOUR/MINUTE/SECOND
   (TIMESTAMP_DIFF keeps elapsed-whole-unit semantics).
2. AEAD keyset keyIds carry no key-material bits (independent hash).
3. SAFE.POW maps Infinity results to NULL (unless an input was
   already infinite).
4. JSON_OBJECT escapes backslashes in key literals.
5. kmeans dispatches through the shared _evaluate_model (held-out
   split form), and the two ML.EVALUATE forms share one dispatch.
"""

from __future__ import annotations

import pytest

from bigquery_etl_spark.sources.bq_dialect import translate


def _one(spark, expr: str):
    return spark.sql(f"SELECT {translate(expr)} AS v").collect()[0].v


@pytest.mark.parametrize(
    "expr,want",
    [
        # BigQuery doc example: one DAY boundary crossed in 1 second
        ("DATETIME_DIFF(DATETIME '2017-10-15 00:00:00', "
         "DATETIME '2017-10-14 23:59:59', DAY)", 1),
        ("DATETIME_DIFF(DATETIME '2017-10-15 01:00:00', "
         "DATETIME '2017-10-15 00:59:59', HOUR)", 1),
        ("DATETIME_DIFF(DATETIME '2017-10-15 00:01:00', "
         "DATETIME '2017-10-15 00:00:59', MINUTE)", 1),
        ("DATETIME_DIFF(DATETIME '2017-10-15 00:00:01', "
         "DATETIME '2017-10-15 00:00:00.999999', SECOND)", 1),
        # sign follows (a - b)
        ("DATETIME_DIFF(DATETIME '2017-10-14 23:59:59', "
         "DATETIME '2017-10-15 00:00:00', DAY)", -1),
        # whole elapsed units within the same boundary stay counted
        ("DATETIME_DIFF(DATETIME '2017-10-15 11:00:00', "
         "DATETIME '2017-10-15 04:30:00', HOUR)", 7),
        # TIMESTAMP_DIFF stays ELAPSED whole units (BigQuery doc)
        ("TIMESTAMP_DIFF(TIMESTAMP '2017-10-15 00:00:00', "
         "TIMESTAMP '2017-10-14 23:59:59', DAY)", 0),
        ("TIMESTAMP_DIFF(TIMESTAMP '2017-10-15 01:00:00', "
         "TIMESTAMP '2017-10-14 23:00:01', HOUR)", 1),
    ],
)
def test_datetime_diff_boundary_semantics(spark, expr, want):
    assert _one(spark, expr) == want


def test_keyset_keyid_independent_of_key_bytes(spark):
    """The keyId must not be a substring/prefix function of the raw
    key bytes: AEAD.ENCRYPT writes the keyId in CLEARTEXT into every
    ciphertext's Tink prefix, so a keyId taken from the key's leading
    hex leaked 28 bits of key material (ADVICE item 2)."""
    import base64
    import json

    row = spark.sql(
        "SELECT " + translate("KEYS.NEW_KEYSET('AEAD_AES_GCM_256')")
        + " AS ks"
    ).collect()[0]
    ks = json.loads(bytes(row.ks).decode())
    key = ks["key"][0]
    raw_hex = base64.b64decode(key["rawKey"]).hex()
    kid_hex = format(int(key["keyId"]), "x")
    # the old derivation made kid == int(raw_hex[:7], 16)
    assert int(key["keyId"]) != int(raw_hex[:7], 16)
    assert kid_hex not in raw_hex  # no contiguous key-bit leak
    # roundtrip still works with the independent keyId
    out = spark.sql(
        "SELECT " + translate(
            "AEAD.DECRYPT_STRING(ks, AEAD.ENCRYPT(ks, 'msg', 'ad'), "
            "'ad')"
        ) + " AS pt FROM (SELECT " + translate(
            "KEYS.NEW_KEYSET('AEAD_AES_GCM_256')"
        ) + " AS ks)"
    ).collect()[0].pt
    assert out == "msg"


@pytest.mark.parametrize(
    "expr,want",
    [
        ("SAFE.POW(0, -1)", None),        # BigQuery POW errors -> NULL
        ("SAFE.POW(1e300, 2)", None),     # overflow -> NULL
        ("SAFE.POW(-1, 0.5)", None),      # NaN -> NULL (pre-existing)
        ("SAFE.POW(2, 10)", 1024.0),
        # inputs already infinite: a legal IEEE result, stays through
        ("SAFE.POW(CAST('Infinity' AS FLOAT64), 1)", float("inf")),
    ],
)
def test_safe_pow_infinity_guard(spark, expr, want):
    assert _one(spark, expr) == want


def test_json_object_backslash_key(spark):
    got = _one(spark, r"TO_JSON_STRING(JSON_OBJECT('a\b', 1))")
    import json

    assert json.loads(got) == {"a\\b": 1}
    # quote + quote-escape still intact
    got2 = _one(spark, "TO_JSON_STRING(JSON_OBJECT('k\"q', 2))")
    assert json.loads(got2) == {'k"q': 2}


def test_kmeans_shared_evaluate_dispatch(spark, tmp_path):
    """ML.EVALUATE's two forms now share ONE dispatch
    (_evaluate_model), which must include kmeans and name
    random_forest/kmeans in its refusal list (ADVICE item 5: the
    duplicated branch lists had drifted). kmeans + data_split_method
    still refuses at CREATE (BigQuery's own rule), so the shared path
    is exercised through the explicit-input form."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    lake = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    lake.spark.createDataFrame(
        [(float(i % 3) * 10 + j * 0.1, float(i % 3) * 10 - j * 0.1)
         for i in range(30) for j in range(3)],
        "x double, y double",
    ).createOrReplaceTempView("km_src")
    lake.bq_sql("""
        CREATE OR REPLACE MODEL km_m
        OPTIONS(model_type='kmeans', num_clusters=3)
        AS SELECT x, y FROM km_src
    """)
    row = lake.bq_sql(
        "SELECT * FROM ML.EVALUATE(MODEL km_m, "
        "(SELECT x, y FROM km_src))"
    ).collect()[0]
    assert row.davies_bouldin_index is not None
    assert row.mean_squared_distance is not None
    # the shared dispatch (split form's entry point) handles kmeans
    ev = lake._evaluate_model(spark.table("km_src"), lake.models["km_m"])
    assert ev.collect()[0].mean_squared_distance is not None
    # refusal list names every supported type
    with pytest.raises(ValueError, match="random_forest, kmeans"):
        lake._evaluate_model(
            spark.table("km_src"), {"model_type": "dnn_classifier"}
        )


def test_array_agg_null_element_semantics(spark):
    """r12: BigQuery ARRAY_AGG ERRORS on a NULL element without IGNORE
    NULLS — the long-documented drop divergence is retired."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    spark.sql(
        "SELECT * FROM VALUES (1,'a'),(1,NULL),(2,'b') AS t(g, v)"
    ).createOrReplaceTempView("aan_t")

    def run(sql):
        try:
            return [
                r.a for r in cat.bq_sql(sql).orderBy("g").collect()
            ]
        except Exception as exc:  # noqa: BLE001
            assert "NULL element" in str(exc)
            return "RAISED"

    base = "SELECT g, ARRAY_AGG({form}) AS a FROM aan_t GROUP BY g"
    assert run(base.format(form="v")) == "RAISED"
    assert run(base.format(form="v ORDER BY v")) == "RAISED"
    assert run(base.format(form="DISTINCT v")) == "RAISED"
    assert run(base.format(form="v IGNORE NULLS")) == [["a"], ["b"]]
    assert run(base.format(form="v RESPECT NULLS")) == [
        ["a", None], ["b"]
    ]
    # no nulls: every form still works
    assert run(
        "SELECT g, ARRAY_AGG(v) AS a FROM aan_t "
        "WHERE v IS NOT NULL GROUP BY g"
    ) == [["a"], ["b"]]
