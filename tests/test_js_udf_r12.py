"""JS UDF multi-statement bodies (r12, VERDICT r11 missing #6): var
bindings, if-return chains, brace-normalized single-return blocks,
undefined-fall-through → NULL — all still inlined into Catalyst at
DDL time (zero runtime JS); reassignment / loops / unreachable code
refuse with the construct named."""

from __future__ import annotations

import pytest

from bigquery_etl_spark.sources.js_udf import JsUdfError, translate_js_body


def test_var_chain_and_if_return_chain(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    cat.bq_sql('''
      CREATE TEMP FUNCTION grade(score FLOAT64) RETURNS STRING
      LANGUAGE js AS """
        var pct = score / 100;
        var adj = pct * 1.1;
        if (adj >= 0.9) return 'A';
        if (adj >= 0.7) return 'B';
        if (adj >= 0.5) return 'C';
        return 'F';
      """
    ''')
    got = [
        r.g for r in spark.sql(
            "SELECT grade(x) AS g FROM VALUES (95.0),(70.0),(50.0),"
            "(10.0) AS t(x)"
        ).collect()
    ]
    assert got == ["A", "B", "C", "F"]


def test_brace_blocks_and_null_fallthrough(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    cat.bq_sql('''
      CREATE TEMP FUNCTION clip(x INT64) RETURNS INT64
      LANGUAGE js AS """
        if (x > 10) { return 10; }
        if (x >= 0) return x;
      """
    ''')
    got = [
        r.v for r in spark.sql(
            "SELECT clip(x) AS v FROM VALUES (55),(7),(-3) AS t(x)"
        ).collect()
    ]
    # JS falls through to undefined for -3 → NULL
    assert got == [10, 7, None]


def test_var_references_inline_with_string_ops():
    sql = translate_js_body(
        "var u = s.toUpperCase(); var n = u.length; "
        "return n > 3 ? u : s;",
        [("s", "STRING")],
    )
    assert "UPPER" in sql and "CASE" in sql or "IF" in sql.upper()


@pytest.mark.parametrize(
    "body,msg",
    [
        # r13: 'var y = x; var y = y + 1;' redeclaration now REBINDS
        # (sequential-rebinding semantics) — no longer a refusal case
        ("var x = 1; return x;", "shadows"),  # shadows a param
        ("return x; return x + 1;", "unreachable"),
        ("for (;;) return x;", None),  # any named refusal
        ("while (true) return x;", None),
        ("x = x + 1; return x;", None),  # bare assignment
        ("if (x > 0) x = 1; return x;", None),
    ],
)
def test_refusals(body, msg):
    with pytest.raises(JsUdfError) as exc:
        translate_js_body(body, [("x", "INT64")])
    if msg:
        assert msg in str(exc.value)
