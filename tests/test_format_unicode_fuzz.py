"""Boundary fuzz for FORMAT() printf codes and unicode string
functions (r13, VERDICT r12 item 6 — the C94 method applied to the
next families). The FORMAT reference is Python's ``%`` operator,
which implements C printf (BigQuery's spec); unicode SUBSTR/LENGTH/
INSTR are pinned against Python's code-point semantics (BigQuery
counts code points)."""
from __future__ import annotations

import math

import pytest

from bigquery_etl_spark.sources.bq_dialect import BQDialectError, translate


def _run(spark, bq):
    """Through the product path (LakeCatalog) so session kernels like
    the C float-format UDF register on their markers."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    return LakeCatalog(spark).bq_sql(bq).collect()[0]

# ---------------------------------------------------------------- FORMAT grid
_INT_VALS = [0, 5, -5, 42, -1, 123456, -987654, 2**31, -(2**31) - 1]
_FLT_VALS = [0.0, 1.5, -1.5, 3.14159, -0.0625, 12345.678, 1e-4, -2.5e6]
_INT_SPECS = [
    "%d", "%5d", "%-5d|", "%05d", "%+d", "% d", "%x", "%X", "%o",
    "%#x", "%10d", "%i",
]
_FLT_SPECS = [
    "%f", "%.2f", "%10.3f", "%-12.4f|", "%+.1f", "%e", "%E", "%.3e",
    "%015.6f", "% .2f",
]
_STR_SPECS = ["%s", "%10s|", "%-10s|", "%.3s"]


def _py_ref(spec: str, val) -> str:
    # strip the trailing literal '|' (kept to expose right-padding)
    tail = ""
    if spec.endswith("|"):
        spec, tail = spec[:-1], "|"
    # C prints %x/%X/%o as the UNSIGNED conversion of the 64-bit value
    # (two's complement for negatives) — Python's % alone would print
    # a signed '-5'; mask to recover the C/BigQuery behavior
    if isinstance(val, int) and val < 0 and spec[-1] in "xXo":
        val &= (1 << 64) - 1
    return (spec % (val,)) + tail


@pytest.fixture(scope="module")
def fmt_rows(spark):
    """One Spark job evaluates the whole grid (per-case jobs would be
    300 jobs); returns {case_label: value}."""
    items = []
    labels = []
    for spec in _INT_SPECS:
        for v in _INT_VALS:
            labels.append(f"{spec}!{v}")
            items.append(f"FORMAT('{spec}', CAST({v} AS INT64))")
    for spec in _FLT_SPECS:
        for v in _FLT_VALS:
            labels.append(f"{spec}!{v}")
            items.append(f"FORMAT('{spec}', CAST({v!r} AS FLOAT64))")
    for spec in _STR_SPECS:
        for v in ("ab", "hello world", ""):
            labels.append(f"{spec}!{v}")
            items.append(f"FORMAT('{spec}', '{v}')")
    row = _run(
        spark,
        "SELECT " + ", ".join(
            f"{e} AS c{i}" for i, e in enumerate(items)
        ),
    )
    return dict(zip(labels, row))


def test_format_int_specs_match_c_printf(fmt_rows):
    bad = []
    for spec in _INT_SPECS:
        ref_spec = {"%i": "%d"}.get(spec, spec)
        for v in _INT_VALS:
            want = _py_ref(ref_spec, v)
            got = fmt_rows[f"{spec}!{v}"]
            if got != want:
                bad.append((spec, v, got, want))
    assert not bad, bad[:10]


def test_format_float_specs_match_c_printf(fmt_rows):
    bad = []
    for spec in _FLT_SPECS:
        for v in _FLT_VALS:
            want = _py_ref(spec, v)
            got = fmt_rows[f"{spec}!{v}"]
            if got != want:
                bad.append((spec, v, got, want))
    assert not bad, bad[:10]


def test_format_string_specs_match_c_printf(fmt_rows):
    bad = []
    for spec in _STR_SPECS:
        for v in ("ab", "hello world", ""):
            want = _py_ref(spec, v)
            got = fmt_rows[f"{spec}!{v}"]
            if got != want:
                bad.append((spec, v, got, want))
    assert not bad, bad[:10]


def test_format_nonfinite_c_renderings(spark):
    """C printf (BigQuery): inf/nan lowercase, sign flags honored,
    space-padded to width (never zero-padded); Java alone would print
    'Infinity'/'NaN'."""
    r = _run(
        spark,
        "SELECT FORMAT('%f', CAST('inf' AS FLOAT64)) AS a, "
        "FORMAT('%+.2f', CAST('-inf' AS FLOAT64)) AS b, "
        "FORMAT('%8.2f', CAST('nan' AS FLOAT64)) AS c, "
        "FORMAT('%-8F|', CAST('inf' AS FLOAT64)) AS d, "
        "FORMAT('%08f', CAST('inf' AS FLOAT64)) AS e",
    )
    assert r.a == "inf"
    assert r.b == "-inf"
    assert r.c == "     nan"
    assert r.d == "INF     |"
    assert r.e == "     inf"  # zero-padding suppressed for inf (C)


def test_format_null_semantics(spark):
    # any NULL non-%t argument nulls the WHOLE result; %t prints NULL
    r = _run(
        spark,
        "SELECT FORMAT('%s-%d', CAST(NULL AS STRING), 5) AS a, "
        "FORMAT('%t', CAST(NULL AS STRING)) AS b, "
        "FORMAT('x%ty', DATE '2024-01-02') AS c",
    )
    assert r.a is None and r.b == "NULL" and r.c == "x2024-01-02y"


def test_format_thousands_flag(spark):
    assert _run(spark, "SELECT FORMAT('%''d', 1234567) AS v").v == \
        "1,234,567"


def test_format_named_refusals():
    for q in (
        "SELECT FORMAT('%g', 1.5)",
        "SELECT FORMAT('%T', 1)",
        "SELECT FORMAT('%*d', 10, 5)",
        "SELECT FORMAT('%d %d', 1)",
    ):
        with pytest.raises(BQDialectError):
            translate(q)


# ------------------------------------------------------- unicode code points
# astral plane (surrogate pairs in UTF-16), combining marks, BMP CJK
_UNI = "a\U0001F600b́c世"  # a, emoji, b, combining acute, c, CJK


def test_unicode_length_substr_instr_code_points(spark):
    """BigQuery counts CODE POINTS (an astral char is 1); pin Spark's
    kernels against Python's code-point semantics."""
    lit = _UNI
    sql = translate(
        f"SELECT LENGTH('{lit}') AS n, "
        f"SUBSTR('{lit}', 2, 1) AS s2, "
        f"SUBSTR('{lit}', 4, 2) AS s42, "
        f"SUBSTR('{lit}', -2) AS stail, "
        f"INSTR('{lit}', 'c') AS ic, "
        f"STRPOS('{lit}', '世') AS pc, "
        f"REVERSE(SUBSTR('{lit}', 1, 2)) AS rev, "
        f"BYTE_LENGTH('{lit}') AS bl"
    )
    r = spark.sql(sql).collect()[0]
    assert r.n == len(_UNI) == 6
    assert r.s2 == _UNI[1]              # the astral char, whole
    assert r.s42 == _UNI[3:5]
    assert r.stail == _UNI[-2:]
    assert r.ic == _UNI.index("c") + 1
    assert r.pc == _UNI.index("世") + 1
    assert r.rev == _UNI[:2][::-1]
    assert r.bl == len(_UNI.encode("utf-8"))


def test_unicode_upper_lower_astral_safe(spark):
    sql = translate(
        f"SELECT UPPER('{_UNI}') AS u, LOWER(UPPER('straße')) AS l"
    )
    r = spark.sql(sql).collect()[0]
    assert r.u == _UNI.upper()
    # LOWER(UPPER('straße')) keeps the code-point count stable only if
    # UPPER expands ß -> SS (Java and Python agree)
    assert r.l == "strasse"


def test_numeric_literal_scale_boundaries(spark):
    """NUMERIC parse/round boundaries: BigQuery NUMERIC is
    DECIMAL(38, 9), round-half-away at scale 9 — Spark's decimal CAST
    uses HALF_UP (same for positive halves; check both signs)."""
    sql = translate(
        "SELECT CAST(CAST('1.0000000005' AS NUMERIC) AS STRING) AS a, "
        "CAST(CAST('-1.0000000005' AS NUMERIC) AS STRING) AS b, "
        "CAST(CAST('0.9999999995' AS NUMERIC) AS STRING) AS c"
    )
    r = spark.sql(sql).collect()[0]
    assert r.a == "1.000000001"   # half-away from zero (BigQuery)
    assert r.b == "-1.000000001"
    assert r.c == "1.000000000"


def test_cfmt_kernel_differential_vs_duckdb_printf():
    """The float kernel (functions/cfmt.py) vs DuckDB's independent C
    printf over a random-ish grid of specs x values — no Spark
    session needed, so the grid can be wide."""
    import duckdb

    from bigquery_etl_spark.functions.cfmt import cfmt_float

    specs = ["%f", "%.1f", "%.3f", "%e", "%.2E", "%12.4f", "%-12.4f",
             "%+.5f", "% .3e", "%F"]
    # magnitudes stay below ~1e17: beyond the round-trip digit count
    # DuckDB's fmt zero-fills where glibc/Python (and BigQuery's C
    # printf) print the EXACT binary expansion — the kernel follows
    # glibc, so the huge-magnitude tail is out of the differential
    vals = [0.0, -0.0, 1.0, -1.0, 0.265, -0.0625, 131048.45,
            1.0 / 3.0, 2**-40, -9.87654321e12, 5e-324, 1.5e15]
    con = duckdb.connect()
    bad = []
    for spec in specs:
        for v in vals:
            want = con.execute(
                "SELECT printf(?, ?::DOUBLE)", [spec, v]
            ).fetchone()[0]
            got = cfmt_float(spec, v)
            if got != want:
                bad.append((spec, v, got, want))
    con.close()
    assert not bad, bad[:8]


def test_cfmt_kernel_nonfinite_glibc():
    from bigquery_etl_spark.functions.cfmt import cfmt_float

    inf, nan = float("inf"), float("nan")
    assert cfmt_float("%f", inf) == "inf"
    assert cfmt_float("%+f", inf) == "+inf"
    assert cfmt_float("% f", nan) == " nan"
    assert cfmt_float("%F", -inf) == "-INF"
    assert cfmt_float("%8.2f", nan) == "     nan"
    assert cfmt_float("%-8f", inf) == "inf     "
    assert cfmt_float("%08f", inf) == "     inf"  # 0 flag suppressed
    assert cfmt_float("%E", nan) == "NAN"
    assert cfmt_float("%f", None) is None
