"""r7 shared SQL tokenizer (VERDICT r6 item 3 / "What's missing" #2):
every textual scanner in the front-end — _top_level_find,
_split_top_level, _matching_paren, bq_dialect's _map_literal_aware and
_call_sites — skips the same lexical islands: 'strings' with ''
escapes, `backtick` and "double-quoted" identifiers, -- line comments,
/* block comments */. Users paste commented SQL constantly; a WHERE
inside a comment must not start a predicate and a keyword inside a
quoted identifier must not split a statement.

Includes a seeded differential fuzz: statements decorated with random
comments/escaped literals at token boundaries run through bq_sql and
DuckDB (which lexes the same islands natively); results must match.
"""

from __future__ import annotations

import random
import re

import pytest

from bigquery_etl_spark.oracle import compare, run_duckdb
from bigquery_etl_spark.sources import load
from bigquery_etl_spark.sources.lake_sql import (
    LakeCatalog,
    _matching_paren,
    _skip_island,
    _split_top_level,
    _top_level_find,
)


# -- unit level ---------------------------------------------------------------


def test_skip_island_forms():
    t = "'a''b' x"
    assert _skip_island(t, 0) == 6  # '' escape consumed in one island
    assert _skip_island("`od``d` x", 0) == 4  # backtick: to next backtick
    assert _skip_island('"w x" y', 0) == 5
    assert _skip_island("-- note\nSELECT", 0) == 8
    assert _skip_island("/* c ' c */ x", 0) == 11
    assert _skip_island("a - b", 2) == 2  # lone minus is not a comment
    assert _skip_island("'unterminated", 0) == 13  # extends to EOT
    assert _skip_island("/* open", 0) == 7


def test_top_level_find_skips_comments_and_identifiers():
    assert _top_level_find("UPDATE t SET a = 1 -- WHERE note", r"\bWHERE\b") == []
    assert _top_level_find("SELECT /* WHERE */ 1 WHERE x", r"\bWHERE\b") == [21]
    assert _top_level_find('SELECT "WHERE col" FROM t', r"\bWHERE\b") == []
    assert _top_level_find("SELECT `WHERE` FROM t", r"\bWHERE\b") == []
    # '' escape must not desync: the second WHERE is top-level
    t = "SELECT 'O''Brien WHERE' AS s WHERE x = 1"
    assert _top_level_find(t, r"\bWHERE\b") == [t.index("WHERE x")]


def test_split_and_match_paren_through_islands():
    parts = _split_top_level("a, 'x,y', `c,d`, f(g, h) -- ,tail")
    assert parts == ["a", "'x,y'", "`c,d`", "f(g, h) -- ,tail"]
    t = "fn(a /* ) */, ') ' , b)"
    assert t[_matching_paren(t, 2)] == ")" and _matching_paren(t, 2) == len(t) - 1


def test_map_literal_aware_keeps_islands_verbatim():
    from bigquery_etl_spark.sources.bq_dialect import _map_literal_aware

    up = lambda seg: seg.upper()  # noqa: E731
    out = _map_literal_aware(
        "select 'keep me' , `keep too` -- and me\nfrom t /* me2 */", up
    )
    assert "'keep me'" in out and "`keep too`" in out
    assert "-- and me" in out and "/* me2 */" in out
    assert out.startswith("SELECT") and "FROM T" in out


def test_call_sites_ignore_comments():
    from bigquery_etl_spark.sources.bq_dialect import _call_sites

    rx = re.compile(r"(?i)\bNEEDLE\s*\(")
    t = "-- NEEDLE(1)\n/* NEEDLE(2) */ 'NEEDLE(3)' NEEDLE(4) `NEEDLE(5)`"
    sites = _call_sites(t, rx)
    assert len(sites) == 1 and t[sites[0][0] :].startswith("NEEDLE(4)")


# -- statement level ----------------------------------------------------------


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.create_table(
        "tok_t",
        str(tmp_path / "tok_t"),
        spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(10)],
            "id long, note string, amt double",
        ),
    )
    return c


def test_update_with_trailing_line_comment_hits_all_rows(cat):
    """The r6 misparse: `-- WHERE note` must not become a predicate."""
    cat.sql("UPDATE tok_t SET amt = -1.0 -- WHERE id = 3\n")
    got = {r.id: r.amt for r in cat.sql("SELECT id, amt FROM tok_t").collect()}
    assert all(v == -1.0 for v in got.values())


def test_dml_with_block_comments_and_quoted_where(cat):
    cat.sql(
        "UPDATE tok_t /* set everything? no: */ "
        "SET note = 'has WHERE and -- inside' WHERE id >= 8"
    )
    got = {r.id: r.note for r in cat.sql("SELECT id, note FROM tok_t").collect()}
    assert got[9] == "has WHERE and -- inside" and got[0] == "n0"
    cat.sql("DELETE FROM tok_t WHERE id IN (8, 9) /* AND id = 0 */")
    left = {r.id for r in cat.sql("SELECT id FROM tok_t").collect()}
    assert left == set(range(8))


def test_merge_with_comments(cat, spark):
    spark.createDataFrame(
        [(1, "u1", 100.0), (99, "new", 9.0)], "id long, note string, amt double"
    ).createOrReplaceTempView("tok_src")
    cat.sql(
        "MERGE INTO tok_t t USING tok_src s\n"
        "ON t.id = s.id -- match on key\n"
        "WHEN MATCHED THEN UPDATE SET note = s.note /* only note */\n"
        "WHEN NOT MATCHED THEN INSERT (id, note, amt) "
        "VALUES (s.id, s.note, s.amt)"
    )
    got = {r.id: r.note for r in cat.sql("SELECT id, note FROM tok_t").collect()}
    assert got[1] == "u1" and got[99] == "new" and len(got) == 11


def test_bq_sql_keyword_bearing_backtick_identifier(cat, spark):
    spark.createDataFrame(
        [(1, 5.0)], "id long, `where from` double"
    ).createOrReplaceTempView("kw_src")
    out = cat.bq_sql(
        "SELECT id, `where from` AS w FROM kw_src -- WHERE id = 0\n"
    ).collect()
    assert [(r.id, r.w) for r in out] == [(1, 5.0)]


# -- seeded differential fuzz -------------------------------------------------

_COMMENTS = ["-- c%d\n", "/* c%d */", "/* nested ' quote %d */", ""]


def _decorate(sql: str, rng: random.Random) -> str:
    """Insert random comments at whitespace boundaries (never inside a
    token or literal: split on single spaces of the template, which
    the templates guarantee are token boundaries)."""
    parts = sql.split(" ")
    out = []
    for k, p in enumerate(parts):
        out.append(p)
        if k < len(parts) - 1 and rng.random() < 0.4:
            c = rng.choice(_COMMENTS)
            if c:
                out.append(c % k)
    return " ".join(out)


_TEMPLATES = [
    "SELECT o_orderkey AS k, o_totalprice AS p FROM orders "
    "WHERE o_totalprice > {v} AND o_orderstatus = '{s}' ORDER BY k LIMIT 50",
    "SELECT o_orderstatus AS s, COUNT(*) AS n, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS t "
    "FROM orders WHERE o_orderkey % {m} = 1 GROUP BY s ORDER BY s",
    "SELECT k, p FROM ( SELECT o_orderkey AS k, o_totalprice AS p , "
    "'it''s {s}' AS tag FROM orders WHERE o_orderkey % {m} = 0 ) "
    "WHERE p < {v} ORDER BY k LIMIT 40",
]


@pytest.mark.parametrize("seed", range(8))
def test_comment_fuzz_matches_duckdb(spark, sf_dir, seed):
    rng = random.Random(1000 + seed)
    tpl = rng.choice(_TEMPLATES)
    sql = tpl.format(
        v=round(rng.uniform(1000, 200000), 2),
        s=rng.choice(["F", "O", "P"]),
        m=rng.randint(2, 9),
    )
    decorated = _decorate(sql, rng)
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    cat = LakeCatalog(spark)
    got = cat.bq_sql(decorated).toPandas()
    want = run_duckdb(decorated, sf_dir)  # DuckDB lexes the same islands
    errs = compare(got, want)
    assert not errs, f"{decorated!r}: " + "; ".join(errs)


# -- property-based invariants (hypothesis) ------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _ATOMS = st.sampled_from(
        [
            "SELECT", "WHERE", "FROM", "x", "y1", ",", "(", ")", " ",
            "\n", "+", "=", "1", "2.5",
            "'a b'", "'it''s'", "`od d`", '"q w"',
            "-- c WHERE ,\n", "/* ( ' WHERE */",
        ]
    )

    def _balanced(tokens: list[str]) -> str:
        """Close any unbalanced parens so _matching_paren terminates."""
        depth = 0
        out = []
        for t in tokens:
            if t == "(":
                depth += 1
            elif t == ")":
                if depth == 0:
                    continue
                depth -= 1
            out.append(t)
        return "".join(out) + ")" * depth

    @given(st.lists(_ATOMS, min_size=0, max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_map_literal_aware_identity_roundtrip(tokens):
        """fn=identity must reassemble the EXACT input — any byte lost
        or duplicated at an island boundary corrupts rewritten SQL."""
        from bigquery_etl_spark.sources.bq_dialect import _map_literal_aware

        text = _balanced(tokens)
        assert _map_literal_aware(text, lambda s: s) == text

    def _island_spans(text: str) -> list[tuple[int, int]]:
        """Reference scan: spans _skip_island claims, walked
        left-to-right (the only way the scanners ever call it)."""
        from bigquery_etl_spark.sources.lake_sql import _skip_island

        spans, i = [], 0
        while i < len(text):
            j = _skip_island(text, i)
            if j != i:
                assert j > i  # progress: scanners must never loop
                spans.append((i, j))
                i = j
            else:
                i += 1
        return spans

    @given(st.lists(_ATOMS, min_size=0, max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_top_level_find_never_inside_islands(tokens):
        from bigquery_etl_spark.sources.lake_sql import _top_level_find

        text = _balanced(tokens)
        spans = _island_spans(text)
        for pos in _top_level_find(text, r"\bWHERE\b"):
            assert not any(a <= pos < b for a, b in spans), (text, pos, spans)

    @given(st.lists(_ATOMS, min_size=0, max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_split_top_level_reassembles(tokens):
        """Joining the split parts with the separator must reproduce the
        input up to outer whitespace and empty segments (all the
        splitter is allowed to normalize)."""
        from bigquery_etl_spark.sources.lake_sql import _split_top_level

        text = _balanced(tokens)
        parts = _split_top_level(text)
        # every part must appear in order in the original text
        i = 0
        for p in parts:
            j = text.find(p, i)
            assert j >= 0, (text, parts, p)
            i = j + len(p)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
