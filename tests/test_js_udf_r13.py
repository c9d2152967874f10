"""r13 JS UDF widening (VERDICT r12 item 5): literal-bound for-loop
unrolling, straight-line reassignment via sequential rebinding, and
object-literal returns as NAMED_STRUCT. Refusals stay loud for the
shapes that have no faithful unrolled form."""
from __future__ import annotations

import pytest

from bigquery_etl_spark.sources.js_udf import JsUdfError, translate_js_body

P = [("x", "FLOAT64"), ("t", "STRING")]


def _sql(body, params=P):
    return translate_js_body(body, params)


# ---------------------------------------------------------------- loops
def test_loop_accumulation_unrolls():
    out = _sql(
        "var a = 0; for (var i = 0; i < 4; i++) { a = a + x; } return a;"
    )
    assert out.count("x") == 4 and "for" not in out


def test_loop_counter_inlines_as_literal():
    out = _sql(
        "var a = 0; for (var i = 1; i <= 3; i++) { a += i * x; } return a;"
    )
    for lit in ("1", "2", "3"):
        assert f"(({lit}) * x)" in out
    # JS: the counter survives the loop with its first failing value
    out2 = _sql("for (var i = 0; i < 5; i++) {} return i;")
    assert out2 == "(5)"


def test_nested_loops_share_budget():
    out = _sql(
        "var a = 0; for (var i = 0; i < 2; i++) { "
        "for (var j = 0; j < 3; j++) { a += x; } } return a;"
    )
    assert out.count("x") == 6
    with pytest.raises(JsUdfError, match="budget"):
        _sql(
            "var a = 0; for (var i = 0; i < 20; i++) { "
            "for (var j = 0; j < 20; j++) { a += x; } } return a;"
        )


def test_loop_step_increment():
    out = _sql(
        "var a = 0; for (var i = 0; i < 10; i += 5) { a += i; } return a;"
    )
    assert "(5)" in out and "(0)" in out and "10" not in out.replace("(10)", "")


def test_loop_refusals_named():
    with pytest.raises(JsUdfError, match="computed loop bounds|integer literal"):
        _sql("var a=0; for (var i = 0; i < x; i++) { a += 1; } return a;")
    with pytest.raises(JsUdfError, match="inside a loop"):
        _sql("for (var i = 0; i < 3; i++) { if (x > i) return i; } return 0;")
    with pytest.raises(JsUdfError, match="while"):
        _sql("var a = 0; while (a < 3) { a += 1; } return a;")
    with pytest.raises(JsUdfError, match="positive"):
        _sql("var a=0; for (var i = 0; i < 3; i += 0) { a += 1; } return a;")


def test_empty_loop_range():
    assert _sql("var a = 7; for (var i = 3; i < 3; i++) { a += 1; } "
                "return a + i;") == "((7) + (3))"


# ------------------------------------------------------------ reassignment
def test_straight_line_reassignment_rebinds_sequentially():
    out = _sql("var a = 1; a = a + x; a += 2; return a;")
    assert out == "(((((1) + x)) + (2)))"


def test_reassignment_before_declaration_refuses():
    with pytest.raises(JsUdfError, match="before declaration"):
        _sql("a = 1; return a;")


def test_assign_to_parameter_refuses():
    with pytest.raises(JsUdfError, match="parameter"):
        _sql("x = 1; return x;")


def test_conditional_assignment_refuses():
    with pytest.raises(JsUdfError, match="if"):
        _sql("var a = 0; if (x > 0) { a = 1; } return a;")


def test_branch_captures_binding_at_program_point():
    out = _sql("var a = 1; if (x > 0) return a; a = 2; return a;")
    assert out == "(CASE WHEN (x > 0) THEN (1) ELSE (2) END)"


# ------------------------------------------------------------ object literals
def test_object_literal_lowers_to_named_struct():
    out = _sql("return {a: x + 1, b: t.toUpperCase()};")
    assert out == "NAMED_STRUCT('a', (x + 1), 'b', UPPER(t))"


def test_object_literal_with_ternary_value():
    out = _sql("return {m: x > 0 ? x : 0};")
    assert out.startswith("NAMED_STRUCT('m', CASE WHEN")


def test_object_literal_in_if_branch():
    out = _sql("if (x > 0) return {a: 1}; return {a: 2};")
    assert out == (
        "(CASE WHEN (x > 0) THEN NAMED_STRUCT('a', 1) "
        "ELSE NAMED_STRUCT('a', 2) END)"
    )


def test_arrays_still_refuse():
    with pytest.raises(JsUdfError, match="arrays"):
        _sql("return [1, 2];")


def test_empty_object_refuses():
    with pytest.raises(JsUdfError, match="empty object"):
        _sql("return {};")


# ------------------------------------------------------------ DDL plumbing
def test_struct_returns_type_cast(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    cat.bq_sql(
        "CREATE TEMP FUNCTION __r13_band(n FLOAT64) "
        "RETURNS STRUCT<lo FLOAT64, hi FLOAT64> "
        'LANGUAGE js AS "return {lo: n - 1, hi: n + 1};";'
    )
    row = spark.sql(
        "SELECT __r13_band(5.0).lo AS lo, __r13_band(5.0).hi AS hi"
    ).collect()[0]
    assert (row.lo, row.hi) == (4.0, 6.0)


def test_loop_udf_runs_on_spark(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    cat.bq_sql(
        "CREATE TEMP FUNCTION __r13_p3(n FLOAT64) RETURNS FLOAT64 "
        'LANGUAGE js AS "var p = 1; '
        "for (var i = 0; i < 3; i++) { p = p * (n + i); } "
        'return p;";'
    )
    assert spark.sql("SELECT __r13_p3(2.0) AS v").collect()[0].v == 24.0


def test_var_redeclaration_rebinds():
    # r12 refused this as non-SSA; r13 rebinding makes it faithful
    out = _sql("var y = x; var y = y + 1; return y;")
    assert out == "(((x) + 1))"
