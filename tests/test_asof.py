"""Unit tests for operators/asof.py — tie and miss semantics match DuckDB
ASOF LEFT JOIN (latest right ts' <= left ts; equal ts matches)."""

from __future__ import annotations

import datetime as dt

from bigquery_etl_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "e1"),  # after r1 -> matches r1
            (1, _ts("2024-01-01 12:00:00"), "e2"),  # equal to r2 ts -> matches r2
            (1, _ts("2024-01-01 09:00:00"), "e0"),  # before all -> null
            (2, _ts("2024-01-01 10:00:00"), "e3"),  # key with no right rows -> null
        ],
        "key long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100, 1.0),
            (1, _ts("2024-01-01 12:00:00"), 200, 2.0),
            (1, _ts("2024-01-01 12:00:00"), 300, 3.0),  # tie on ts: max rid wins
        ],
        "key long, rts timestamp, rid long, rval double",
    )
    out = asof_join(
        left, right, left_on="key", right_on="key", left_ts="ts", right_ts="rts", tiebreak="rid"
    )
    rows = {r["tag"]: (r["rid"], r["rval"]) for r in out.collect()}
    assert rows["e1"] == (100, 1.0)
    assert rows["e2"] == (300, 3.0)  # equal ts matches; tiebreak picks rid=300
    assert rows["e0"] == (None, None)
    assert rows["e3"] == (None, None)
    assert out.count() == 4  # left-join cardinality preserved


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "e1"),  # next right at 12:00
            (1, _ts("2024-01-01 12:00:00"), "e2"),  # equal ts matches
            (1, _ts("2024-01-01 13:00:00"), "e3"),  # nothing after -> null
        ],
        "key long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 100), (1, _ts("2024-01-01 12:00:00"), 200)],
        "key long, rts timestamp, rid long",
    )
    out = asof_join(
        left, right, "key", "key", "ts", "rts", tiebreak="rid", direction="forward"
    )
    rows = {r["tag"]: r["rid"] for r in out.collect()}
    assert rows == {"e1": 200, "e2": 200, "e3": None}


def test_asof_rejects_ambiguous_columns(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01"), "x")], "key long, ts timestamp, v string")
    right = spark.createDataFrame([(1, _ts("2024-01-01"), "y")], "key long, rts timestamp, v string")
    try:
        asof_join(left, right, "key", "key", "ts", "rts")
        raise AssertionError("expected ValueError for ambiguous column 'v'")
    except ValueError as e:
        assert "v" in str(e)
