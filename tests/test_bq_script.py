"""BigQuery procedural scripting (r6): DECLARE/SET variables,
IF/WHILE/LOOP control flow, EXECUTE IMMEDIATE — every leaf statement
running through bq_sql so the whole catalog surface composes.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def cat(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    c = LakeCatalog(spark, warehouse=str(tmp_path))
    df = spark.createDataFrame(
        [(i, ["A", "B"][i % 2], float(i)) for i in range(1, 11)],
        "id long, grp string, val double",
    )
    c.create_table("t", str(tmp_path / "t"), df)
    return c


def _run(cat, text):
    from bigquery_etl_spark.sources.bq_script import run_script

    return run_script(cat, text)


def test_declare_set_and_final_select(cat):
    out = _run(cat, """
        DECLARE threshold FLOAT64 DEFAULT 5;
        DECLARE label STRING DEFAULT 'hot';
        SET threshold = threshold * 2;
        SELECT COUNT(*) AS n, label AS tag FROM t WHERE val < threshold;
    """)
    row = out.collect()[0]
    assert (row.n, row.tag) == (9, "hot")


def test_while_loop_accumulates(cat):
    out = _run(cat, """
        DECLARE i INT64 DEFAULT 1;
        DECLARE total INT64 DEFAULT 0;
        WHILE i <= 4 DO
            SET total = total + (SELECT COUNT(*) FROM t WHERE id <= i);
            SET i = i + 1;
        END WHILE;
        SELECT CAST(total AS INT64) AS total, CAST(i AS INT64) AS i;
    """)
    # 1 + 2 + 3 + 4
    assert [tuple(r) for r in out.collect()] == [(10, 5)]


def test_if_elseif_else(cat):
    script = """
        DECLARE n INT64 DEFAULT (SELECT COUNT(*) FROM t);
        DECLARE verdict STRING;
        IF n > 100 THEN SET verdict = 'big';
        ELSEIF n > 5 THEN SET verdict = 'medium';
        ELSE SET verdict = 'small';
        END IF;
        SELECT verdict AS v;
    """
    assert _run(cat, script).collect()[0].v == "medium"


def test_nested_if_inside_while_with_break(cat):
    out = _run(cat, """
        DECLARE i INT64 DEFAULT 0;
        LOOP
            SET i = i + 1;
            IF i >= 3 THEN BREAK;
            END IF;
        END LOOP;
        SELECT CAST(i AS INT64) AS i;
    """)
    assert out.collect()[0].i == 3


def test_continue_skips(cat):
    out = _run(cat, """
        DECLARE i INT64 DEFAULT 0;
        DECLARE odd_sum INT64 DEFAULT 0;
        WHILE i < 6 DO
            SET i = i + 1;
            IF MOD(i, 2) = 0 THEN CONTINUE;
            END IF;
            SET odd_sum = odd_sum + i;
        END WHILE;
        SELECT CAST(odd_sum AS INT64) AS s;
    """)
    assert out.collect()[0].s == 1 + 3 + 5


def test_script_runs_dml_and_dialect(cat):
    """Leaf statements are full catalog statements: BigQuery-dialect
    functions AND lake DML commit for real from inside a script."""
    out = _run(cat, """
        DECLARE cutoff INT64 DEFAULT 8;
        DELETE FROM t WHERE id > cutoff;
        SELECT COUNTIF(grp = 'A') AS n_a, COUNT(*) AS n FROM t;
    """)
    row = out.collect()[0]
    assert (row.n_a, row.n) == (4, 8)
    assert cat.tables["t"].read().count() == 8


def test_execute_immediate_into(cat):
    out = _run(cat, """
        DECLARE q STRING DEFAULT 'SELECT MAX(id) FROM t';
        DECLARE top INT64;
        EXECUTE IMMEDIATE q INTO top;
        SELECT CAST(top AS INT64) AS top_id;
    """)
    assert out.collect()[0].top_id == 10


def test_string_values_quote_safely(cat):
    out = _run(cat, """
        DECLARE needle STRING DEFAULT 'A';
        SELECT COUNT(*) AS n FROM t WHERE grp = needle;
    """)
    assert out.collect()[0].n == 5


def test_errors(cat):
    from bigquery_etl_spark.sources.bq_script import ScriptError

    with pytest.raises(ScriptError, match="already declared"):
        _run(cat, "DECLARE x INT64; DECLARE x INT64;")
    with pytest.raises(ScriptError, match="undeclared"):
        _run(cat, "SET nope = 1;")
    with pytest.raises(ScriptError, match="ended inside"):
        _run(cat, "WHILE TRUE DO SELECT 1;")


def test_runaway_loop_capped(cat):
    from bigquery_etl_spark.sources import bq_script
    from bigquery_etl_spark.sources.bq_script import ScriptError

    orig = bq_script.MAX_STEPS
    bq_script.MAX_STEPS = 50
    try:
        with pytest.raises(ScriptError, match="exceeded"):
            _run(cat, """
                DECLARE i INT64 DEFAULT 0;
                LOOP
                    SET i = i + 1;
                END LOOP;
            """)
    finally:
        bq_script.MAX_STEPS = orig


def test_for_in_loop_row_fields(cat):
    out = _run(cat, """
        DECLARE acc INT64 DEFAULT 0;
        FOR rec IN (SELECT grp, COUNT(*) AS n FROM t GROUP BY grp ORDER BY grp) DO
            SET acc = acc + rec.n * (SELECT COUNT(*) FROM t WHERE grp = rec.grp);
        END FOR;
        SELECT CAST(acc AS INT64) AS acc;
    """)
    assert out.collect()[0].acc == 5 * 5 + 5 * 5


def test_for_break_and_var_restored(cat):
    out = _run(cat, """
        DECLARE seen INT64 DEFAULT 0;
        FOR r IN (SELECT id FROM t ORDER BY id) DO
            SET seen = seen + 1;
            IF r.id >= 3 THEN BREAK;
            END IF;
        END FOR;
        SELECT CAST(seen AS INT64) AS seen;
    """)
    assert out.collect()[0].seen == 3


def test_exception_handler_and_error_message(cat):
    out = _run(cat, """
        DECLARE msg STRING DEFAULT 'clean';
        BEGIN
            SET msg = (SELECT grp FROM nonexistent_tbl_xyz LIMIT 1);
            SET msg = 'unreachable';
        EXCEPTION WHEN ERROR THEN
            SET msg = 'caught';
        END;
        SELECT msg AS m, @@error.message IS NOT NULL AS has_err;
    """)
    row = out.collect()[0]
    assert row.m == "caught" and row.has_err


def test_raise_with_message(cat):
    import pytest as _pytest

    from bigquery_etl_spark.sources.bq_script import ScriptError

    with _pytest.raises(ScriptError, match="boom-7"):
        _run(cat, """
            DECLARE k INT64 DEFAULT 7;
            RAISE USING MESSAGE = CONCAT('boom-', CAST(k AS STRING));
        """)


def test_exception_block_without_handler_propagates(cat):
    import pytest as _pytest

    with _pytest.raises(Exception):
        _run(cat, """
            BEGIN
                SELECT undefined_col_xyz FROM t;
            END;
        """)


def test_procedure_call_in_out(cat):
    out = _run(cat, """
        CREATE PROCEDURE count_grp(IN g STRING, OUT n INT64)
        BEGIN
            SET n = (SELECT COUNT(*) FROM t WHERE grp = g);
        END;
        DECLARE n_a INT64 DEFAULT -1;
        DECLARE n_b INT64 DEFAULT -1;
        CALL count_grp('A', n_a);
        CALL count_grp('B', n_b);
        SELECT CAST(n_a AS INT64) AS a, CAST(n_b AS INT64) AS b;
    """)
    assert [tuple(r) for r in out.collect()] == [(5, 5)]


def test_procedure_scope_isolated_and_or_replace(cat):
    from bigquery_etl_spark.sources.bq_script import ScriptError
    import pytest as _pytest

    # caller's variable `x` is NOT visible inside the procedure
    with _pytest.raises(Exception):
        _run(cat, """
            DECLARE x INT64 DEFAULT 1;
            CREATE PROCEDURE leaky()
            BEGIN
                SET x = 2;
            END;
            CALL leaky();
        """)
    _run(cat, """
        CREATE PROCEDURE p1() BEGIN SELECT 1; END;
        CREATE OR REPLACE PROCEDURE p1() BEGIN SELECT 2; END;
    """)
    with _pytest.raises(ScriptError, match="already exists"):
        _run(cat, "CREATE PROCEDURE p1() BEGIN SELECT 3; END;")


def test_procedure_returns_result_set(cat):
    out = _run(cat, """
        CREATE OR REPLACE PROCEDURE top_rows(IN k INT64)
        BEGIN
            SELECT id, grp FROM t ORDER BY id LIMIT k;
        END;
        CALL top_rows(3);
    """)
    assert [r.id for r in out.collect()] == [1, 2, 3]


def test_execute_immediate_using_positional_and_named(cat):
    out = _run(cat, """
        DECLARE cutoff INT64 DEFAULT 4;
        DECLARE label STRING DEFAULT 'x? -- not a placeholder';
        EXECUTE IMMEDIATE
            'SELECT COUNT(*) AS n FROM t WHERE id > ? AND grp <> @g'
            USING cutoff, 'Z' AS g;
    """)
    assert out.collect()[0].n == 6
    # placeholders inside string literals of the dynamic SQL are data
    out = _run(cat, """
        EXECUTE IMMEDIATE 'SELECT ''?@x'' AS s, ? AS v' USING 7;
    """)
    row = out.collect()[0]
    assert row.s == "?@x" and row.v == 7
    import pytest as _p

    from bigquery_etl_spark.sources.bq_script import ScriptError

    with _p.raises(ScriptError, match="unbound parameter"):
        _run(cat, "EXECUTE IMMEDIATE 'SELECT @missing' USING 1 AS other;")
    with _p.raises(ScriptError, match="fewer"):
        _run(cat, "EXECUTE IMMEDIATE 'SELECT 1' USING 1, 2;")


def test_execute_immediate_into_multiple(cat):
    out = _run(cat, """
        DECLARE a INT64;
        DECLARE b FLOAT64;
        EXECUTE IMMEDIATE
            'SELECT COUNT(*), SUM(val) FROM t' INTO a, b;
        SELECT a AS n, b AS s;
    """)
    row = out.collect()[0]
    assert row.n == 10 and abs(row.s - 55.0) < 1e-9


def test_create_temp_table_in_script(cat, spark):
    out = _run(cat, """
        CREATE TEMP TABLE hot AS SELECT * FROM t WHERE val > 5;
        DELETE FROM hot WHERE id % 2 = 0;
        CREATE OR REPLACE TEMP TABLE hot AS SELECT * FROM hot WHERE id > 7;
        SELECT COUNT(*) AS n FROM hot;
    """)
    assert out.collect()[0].n == 1  # ids 6..10 with val>5 -> odd -> 7,9 -> >7 -> 9
    # temp table is gone after the script
    assert "hot" not in cat.tables
    import pytest as _p

    with _p.raises(Exception):
        cat.sql("SELECT * FROM hot")


def test_repeat_until(cat):
    """REPEAT … UNTIL: post-condition loop — body runs at least once."""
    out = _run(cat, """
        DECLARE n INT64 DEFAULT 0;
        DECLARE s INT64 DEFAULT 0;
        REPEAT
          SET n = n + 1;
          SET s = s + n;
        UNTIL n >= 5
        END REPEAT;
        SELECT n AS n, s AS s;
    """)
    r = out.collect()[0]
    assert (r.n, r.s) == (5, 15)
    # at-least-once: condition true up front still runs the body once
    out2 = _run(cat, """
        DECLARE n INT64 DEFAULT 99;
        REPEAT
          SET n = n + 1;
        UNTIL TRUE
        END REPEAT;
        SELECT n AS n;
    """)
    assert out2.collect()[0].n == 100
