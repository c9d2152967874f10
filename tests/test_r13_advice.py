"""Regression tests for the r12 ADVICE items fixed in r13.

1 (medium): ARRAY_AGG(x) OVER(w) — the null-raise TRANSFORM must wrap
   AROUND the windowed COLLECT_LIST, not sit between COLLECT_LIST and
   OVER (which failed analysis with MISSING_GROUP_BY).
2: FORMAT_DATE %% escapes must not read as %U/%W/%e specifiers.
3: ML.TF_IDF rewrite refuses bare * select items (internal-column leak).
4: _gate_token refuses to gate patterns whose trailing token is not
   mandatory (alternation/optional in the prefix).
5: daead keyset parse + AESSIV construction memoized per distinct
   keyset bytes.
"""
from __future__ import annotations

import pytest

from bigquery_etl_spark.sources.bq_dialect import (
    BQDialectError,
    _gate_token,
    translate,
)


# ---------------------------------------------------------------- ADVICE 1
def test_array_agg_over_translates_to_windowed_collect_list():
    out = translate(
        "SELECT ARRAY_AGG(x) OVER (PARTITION BY g ORDER BY t) AS a FROM t"
    )
    # TRANSFORM must wrap the whole windowed aggregate
    assert "COLLECT_LIST(NAMED_STRUCT('__v', x)) OVER (PARTITION BY g" in out
    assert "TRANSFORM(COLLECT_LIST" in out
    # the broken r12 shape: TRANSFORM(...) OVER — OVER applied to TRANSFORM
    assert ") OVER (" in out and "__s.__v)) OVER" not in out


def test_array_agg_over_ignore_nulls_is_native_collect_list():
    out = translate(
        "SELECT ARRAY_AGG(x IGNORE NULLS) OVER (PARTITION BY g) AS a FROM t"
    )
    assert "COLLECT_LIST(x) OVER (PARTITION BY g)" in out
    assert "TRANSFORM" not in out


def test_array_agg_over_modifiers_refuse():
    with pytest.raises(BQDialectError, match="analytic ARRAY_AGG"):
        translate("SELECT ARRAY_AGG(x ORDER BY y) OVER (PARTITION BY g) FROM t")
    with pytest.raises(BQDialectError, match="analytic ARRAY_AGG"):
        translate("SELECT ARRAY_AGG(DISTINCT x) OVER (PARTITION BY g) FROM t")


def test_string_agg_over_plain_native_and_modifiers_refuse():
    out = translate("SELECT STRING_AGG(t, ',') OVER (PARTITION BY g) FROM t")
    assert "STRING_AGG(t, ',') OVER (PARTITION BY g)" in out
    with pytest.raises(BQDialectError, match="analytic STRING_AGG"):
        translate(
            "SELECT STRING_AGG(t, ',' ORDER BY t) OVER (PARTITION BY g) FROM t"
        )


def test_array_agg_over_runs_on_spark(spark):
    spark.createDataFrame(
        [(1, "a", 10), (1, "b", None), (2, "c", 30)], "g int, t string, x int"
    ).createOrReplaceTempView("__r13_aaw")
    rows = spark.sql(
        translate(
            "SELECT g, t, ARRAY_AGG(x IGNORE NULLS) "
            "OVER (PARTITION BY g ORDER BY t) AS a FROM __r13_aaw"
        )
    ).collect()
    by = {(r.g, r.t): r.a for r in rows}
    assert by[(1, "a")] == [10] and by[(1, "b")] == [10]
    assert by[(2, "c")] == [30]
    # plain form raises on a NULL element (BigQuery semantics)
    with pytest.raises(Exception, match="NULL element"):
        spark.sql(
            translate(
                "SELECT ARRAY_AGG(x) OVER (PARTITION BY g) FROM __r13_aaw"
            )
        ).collect()
    # and succeeds when no NULLs are in frame
    ok = spark.sql(
        translate(
            "SELECT g, ARRAY_AGG(x) OVER (PARTITION BY g) AS a "
            "FROM __r13_aaw WHERE x IS NOT NULL"
        )
    ).collect()
    assert sorted((r.g, tuple(r.a)) for r in ok) == [(1, (10,)), (2, (30,))]


# ---------------------------------------------------------------- ADVICE 2
def test_fmt_double_percent_not_a_specifier():
    out = translate("SELECT FORMAT_DATE('100%%Usage', d) FROM t")
    assert "FLOOR" not in out  # no week-of-year math
    assert "100%Usage" in out


def test_fmt_double_percent_mixed_with_specifiers(spark):
    rows = spark.sql(
        translate("SELECT FORMAT_DATE('%%%U|%W|%e', DATE '2024-03-05') AS f")
    ).collect()
    assert rows[0].f == "%09|10| 5"


def test_fmt_dangling_percent_still_refuses():
    with pytest.raises(BQDialectError, match="dangling %"):
        translate("SELECT FORMAT_DATE('abc%', d) FROM t")


# ---------------------------------------------------------------- ADVICE 3
def test_tfidf_star_select_item_refuses():
    with pytest.raises(BQDialectError, match=r"\* select item"):
        translate("SELECT *, ML.TF_IDF(t) OVER() AS v FROM docs")
    with pytest.raises(BQDialectError, match=r"\* select item"):
        translate("SELECT d.*, ML.TF_IDF(t) OVER() AS v FROM docs d")


# ---------------------------------------------------------------- ADVICE 4
def test_gate_token_plain_and_dotted():
    assert _gate_token("ARRAY_AGG") == "ARRAY_AGG"
    assert _gate_token(r"ML\s*\.\s*NGRAMS") == "NGRAMS"


def test_gate_token_refuses_nonmandatory_tail():
    # top-level alternation: BAR is not mandatory — no gate
    assert _gate_token("FOO|BAR") == ""
    # optional group before the tail: conservatively no gate
    assert _gate_token(r"(?:FOO|BAR)BAZ") == ""
    # pattern ending in a metachar derives no gate at all
    assert _gate_token(r"(?:FOO|BAR)") == ""


# ---------------------------------------------------------------- ADVICE 5
def test_daead_keyset_parse_memoized():
    from bigquery_etl_spark.functions import daead as D

    ks = None
    # build a keyset through the KEYS surface to get real bytes
    from bigquery_etl_spark.sources.bq_dialect import translate as _t  # noqa

    import base64
    import json
    import os

    raw = base64.b64encode(os.urandom(64)).decode()
    ks = json.dumps(
        {
            "primaryKeyId": 1,
            "key": [
                {
                    "keyId": 1,
                    "status": "ENABLED",
                    "type": "AES_SIV_CMAC_256",
                    "rawKey": raw,
                }
            ],
        }
    ).encode()
    D._parse_keyset_cached.cache_clear()
    D._siv_for.cache_clear()
    ct = D.daead_encrypt(ks, b"pt", b"ad")
    for _ in range(10):
        assert D.daead_decrypt(ks, ct, b"ad") == b"pt"
    # one parse + one AESSIV build despite 11 calls
    assert D._parse_keyset_cached.cache_info().misses == 1
    assert D._parse_keyset_cached.cache_info().hits >= 10
    assert D._siv_for.cache_info().misses == 1


# ---------------------------------------------------------- VERDICT item 10
def test_spark_native_time_still_part_wired(spark):
    """C57 re-probe (r13): the canonical-string TIME lowering stays
    because Spark 4.1.2's native TIME is still only part-wired —
    literals parse, but CAST and EXTRACT raise UNSUPPORTED_TIME_TYPE.
    When this test FAILS (both statements succeed), swap the lowering
    to the native type and keep strings as the documented fallback."""
    import pytest as _pt

    assert spark.sql("SELECT TIME '12:34:56' AS t").collect()
    with _pt.raises(Exception, match="UNSUPPORTED_TIME_TYPE"):
        spark.sql("SELECT CAST('12:34:56' AS TIME)").collect()
    with _pt.raises(Exception, match="UNSUPPORTED_TIME_TYPE"):
        spark.sql("SELECT EXTRACT(HOUR FROM TIME '12:34:56')").collect()
