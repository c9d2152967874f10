"""Differential DML fuzzing (r7 — extends the §5.2 property strategy
from read-only queries to the WRITE path): seeded random sequences of
UPDATE / DELETE / INSERT statements run against a LakeCatalog
versioned table AND against DuckDB applying the IDENTICAL statements
to an identical starting table; the final table contents must match
exactly. Statements draw from the grammar both engines share —
arithmetic and CASE expressions reading the OLD row, IN lists,
BETWEEN, AND/OR/NOT predicates — with comments sprinkled at statement
heads/tails (the r7 tokenizer surface). Deterministic seeds, so
failures reproduce.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from bigquery_etl_spark.oracle import compare
from bigquery_etl_spark.sources.lake_sql import LakeCatalog

N_ROWS = 400


def _pred(rng: random.Random) -> str:
    def atom() -> str:
        c = rng.random()
        if c < 0.3:
            return f"id % {rng.randint(2, 9)} = {rng.randint(0, 1)}"
        if c < 0.5:
            lo = rng.randint(0, N_ROWS)
            return f"id BETWEEN {lo} AND {lo + rng.randint(5, 80)}"
        if c < 0.7:
            vals = ", ".join(
                f"'{g}'" for g in rng.sample(["a", "b", "c", "d"], rng.randint(1, 3))
            )
            return f"g IN ({vals})"
        return f"v {rng.choice(['<', '<=', '>', '>='])} {round(rng.uniform(0, 800), 2)}"

    parts = [atom() for _ in range(rng.randint(1, 3))]
    pred = rng.choice([" AND ", " OR "]).join(parts)
    if rng.random() < 0.25:
        pred = f"NOT ({pred})"
    return pred


def _set_expr(rng: random.Random) -> str:
    return rng.choice(
        [
            "v + 1.5",
            "v * 2.0",
            f"v + id * {rng.randint(1, 3)}",
            "CASE WHEN id % 2 = 0 THEN v + 10.0 ELSE v - 10.0 END",
            f"{round(rng.uniform(0, 100), 2)}",
        ]
    )


def _statements(rng: random.Random, n: int = 6) -> list[str]:
    out = []
    for _ in range(n):
        kind = rng.random()
        comment = rng.choice(["", " -- note WHERE 1=1\n", " /* c ' c */ "])
        if kind < 0.45:
            sets = ", ".join(
                f"{c} = {_set_expr(rng)}" for c in rng.sample(["v"], 1)
            )
            out.append(f"UPDATE fz SET {sets}{comment} WHERE {_pred(rng)}")
        elif kind < 0.7:
            out.append(f"DELETE FROM fz{comment} WHERE {_pred(rng)}")
        else:
            base = rng.randint(10_000, 20_000)
            k = rng.randint(1, 4)
            vals = ", ".join(
                f"({base + j}, '{rng.choice('abcd')}', "
                f"{round(rng.uniform(0, 500), 2)})"
                for j in range(k)
            )
            out.append(f"INSERT INTO fz VALUES {vals}")
    return out


@pytest.mark.parametrize("seed", range(10))
def test_dml_sequence_matches_duckdb(spark, tmp_path, seed):
    rng = random.Random(7000 + seed)
    rows = [
        (i, "abcd"[i % 4], round((i * 37 % 997) * 0.83, 2))
        for i in range(N_ROWS)
    ]
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "fz",
        str(tmp_path / "fz"),
        spark.createDataFrame(rows, "id long, g string, v double"),
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE fz (id BIGINT, g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO fz VALUES (?, ?, ?)", rows)

    stmts = _statements(rng)
    for s in stmts:
        cat.sql(s)
        con.execute(s)

    got = cat.sql("SELECT id, g, v FROM fz").toPandas()
    want = con.execute(
        "SELECT id, g, CAST(v AS DOUBLE) AS v FROM fz"
    ).fetchdf()
    errs = compare(got, want)
    assert not errs, f"seed={seed} stmts={stmts!r}: " + "; ".join(errs)


def test_dml_fuzz_on_partitioned_table(spark, tmp_path):
    """Same differential check with the table PARTITIONED on g — the
    partition-scoped DML rewrite path must produce byte-identical
    content to DuckDB's full-table semantics for every statement."""
    rng = random.Random(424242)
    rows = [
        (i, "abcd"[i % 4], round((i * 61 % 1013) * 0.59, 2))
        for i in range(N_ROWS)
    ]
    spark.createDataFrame(rows, "id long, g string, v double") \
        .createOrReplaceTempView("fz_src")
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql("CREATE TABLE fz PARTITION BY g AS SELECT * FROM fz_src")
    con = duckdb.connect()
    con.execute("CREATE TABLE fz (id BIGINT, g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO fz VALUES (?, ?, ?)", rows)
    # force partition-pinning predicates into the mix
    stmts = [
        "UPDATE fz SET v = v + 5.0 WHERE g = 'a'",
        "DELETE FROM fz WHERE g IN ('b', 'c') AND id % 3 = 0",
        "UPDATE fz SET v = CASE WHEN v > 300 THEN v - 300.0 ELSE v END "
        "WHERE g = 'd' OR id < 50",
    ] + _statements(rng, n=4)
    for s in stmts:
        cat.sql(s)
        con.execute(s)
    got = cat.sql("SELECT id, g, v FROM fz").toPandas()
    want = con.execute(
        "SELECT id, g, CAST(v AS DOUBLE) AS v FROM fz"
    ).fetchdf()
    errs = compare(got, want)
    assert not errs, f"stmts={stmts!r}: " + "; ".join(errs)
