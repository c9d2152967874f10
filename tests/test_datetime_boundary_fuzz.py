"""Datetime boundary differential fuzz (r12, VERDICT r11 item 5 —
"boundary-probe the remaining function packs the C89 way").

DATE_DIFF was silently wrong for ten rounds because no twin crossed a
part boundary. This suite sweeps the OTHER datetime families with
boundary-adjacent inputs against an INDEPENDENT pure-Python reference
implementing BigQuery's documented semantics (datetime module — not
the SQL lowering's algebra):

- TIMESTAMP_DIFF: elapsed whole units (truncation toward zero);
- DATETIME_DIFF: part boundaries crossed, every part;
- TIME_DIFF: part boundaries on civil times;
- LAST_DAY with MONTH/QUARTER/YEAR/WEEK(<WEEKDAY>)/ISOWEEK parts;
- DATE_TRUNC WEEK(<WEEKDAY>) anchors across all seven weekdays;
- FORMAT_DATE %-codes (%j/%U/%W/%e/%a/%b) at year/leap boundaries;
- PARSE_DATE round-trips at era/leap edges.

Inputs cluster within ±2 units of midnight, month/quarter/year starts,
the 2024-02-29 leap day, and week anchors — exactly where elapsed-unit
and boundary-count semantics disagree.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from bigquery_etl_spark.sources.bq_dialect import translate

SEED = 20260816


def _batch(spark, exprs: list[str]):
    sel = ", ".join(
        f"({translate(e)}) AS c{i}" for i, e in enumerate(exprs)
    )
    row = spark.sql(f"SELECT {sel}").collect()[0]
    return [row[f"c{i}"] for i in range(len(exprs))]


def _boundary_datetimes(rng, n):
    """Datetime pairs hugging part boundaries."""
    anchors = [
        dt.datetime(2024, 2, 29, 0, 0, 0),
        dt.datetime(2024, 3, 1, 0, 0, 0),
        dt.datetime(2023, 12, 31, 23, 59, 59),
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 6, 30, 23, 0, 0),
        dt.datetime(2024, 7, 1, 1, 0, 0),
        dt.datetime(2024, 4, 1, 0, 0, 1),
        dt.datetime(1999, 12, 31, 23, 59, 59),
        dt.datetime(2000, 1, 1, 0, 0, 0),
        dt.datetime(2024, 9, 30, 12, 0, 0),
    ]
    out = []
    for _ in range(n):
        a = rng.choice(anchors) + dt.timedelta(
            seconds=rng.randint(-90, 90),
            microseconds=rng.choice([0, 1, 999_999]),
        )
        b = rng.choice(anchors) + dt.timedelta(
            days=rng.randint(-40, 40),
            seconds=rng.randint(-90, 90),
        )
        out.append((a, b))
    return out


def _ref_datetime_diff(a: dt.datetime, b: dt.datetime, part: str) -> int:
    """BigQuery DATETIME_DIFF: boundaries crossed."""
    if part == "YEAR":
        return a.year - b.year
    if part == "QUARTER":
        return (a.year * 4 + (a.month - 1) // 3) - (
            b.year * 4 + (b.month - 1) // 3
        )
    if part == "MONTH":
        return (a.year * 12 + a.month) - (b.year * 12 + b.month)
    if part == "WEEK":  # Sunday-anchored
        def wk(d):
            days = (d.date() - dt.date(1970, 1, 1)).days
            return (days - 3) // 7  # 1970-01-04 was the first Sunday
        return wk(a) - wk(b)
    if part == "DAY":
        return (a.date() - b.date()).days
    us = {"HOUR": 3_600_000_000, "MINUTE": 60_000_000,
          "SECOND": 1_000_000}[part]
    epoch = dt.datetime(1970, 1, 1)

    def units(d):
        delta = d - epoch
        total_us = (delta.days * 86_400_000_000
                    + delta.seconds * 1_000_000 + delta.microseconds)
        return total_us // us

    return units(a) - units(b)


def _ref_timestamp_diff(a: dt.datetime, b: dt.datetime, part: str) -> int:
    """BigQuery TIMESTAMP_DIFF: elapsed whole units, truncate to 0."""
    us_total = round((a - b).total_seconds() * 1_000_000)
    us = {"DAY": 86_400_000_000, "HOUR": 3_600_000_000,
          "MINUTE": 60_000_000, "SECOND": 1_000_000}[part]
    return int(us_total / us) if us_total >= 0 else -int(-us_total / us)


@pytest.mark.parametrize(
    "part", ["YEAR", "QUARTER", "MONTH", "WEEK", "DAY", "HOUR",
             "MINUTE", "SECOND"]
)
def test_datetime_diff_boundaries(spark, part):
    rng = random.Random(SEED)
    pairs = _boundary_datetimes(rng, 24)
    exprs = [
        f"DATETIME_DIFF(DATETIME '{a.isoformat(sep=' ')}', "
        f"DATETIME '{b.isoformat(sep=' ')}', {part})"
        for a, b in pairs
    ]
    got = _batch(spark, exprs)
    for (a, b), g in zip(pairs, got):
        assert g == _ref_datetime_diff(a, b, part), (a, b, part)


@pytest.mark.parametrize("part", ["DAY", "HOUR", "MINUTE", "SECOND"])
def test_timestamp_diff_elapsed(spark, part):
    rng = random.Random(SEED + 1)
    pairs = _boundary_datetimes(rng, 24)
    exprs = [
        f"TIMESTAMP_DIFF(TIMESTAMP '{a.isoformat(sep=' ')}+00', "
        f"TIMESTAMP '{b.isoformat(sep=' ')}+00', {part})"
        for a, b in pairs
    ]
    got = _batch(spark, exprs)
    for (a, b), g in zip(pairs, got):
        assert g == _ref_timestamp_diff(a, b, part), (a, b, part)


@pytest.mark.parametrize("part", ["HOUR", "MINUTE", "SECOND"])
def test_time_diff_boundaries(spark, part):
    rng = random.Random(SEED + 2)
    times = []
    for _ in range(24):
        base = rng.choice([0, 3600, 3599, 43200, 86399, 59, 60, 61])
        t1 = dt.time((base // 3600) % 24, (base // 60) % 60, base % 60,
                     rng.choice([0, 999_999]))
        s2 = max(0, min(86399, base + rng.randint(-90, 90)))
        t2 = dt.time(s2 // 3600, (s2 // 60) % 60, s2 % 60)
        times.append((t1, t2))
    exprs = [
        f"TIME_DIFF(TIME '{t1.isoformat()}', TIME '{t2.isoformat()}', "
        f"{part})"
        for t1, t2 in times
    ]
    got = _batch(spark, exprs)
    div = {"HOUR": 3600, "MINUTE": 60, "SECOND": 1}[part]
    for (t1, t2), g in zip(times, got):
        s1 = t1.hour * 3600 + t1.minute * 60 + t1.second
        s2 = t2.hour * 3600 + t2.minute * 60 + t2.second
        assert g == s1 // div - s2 // div, (t1, t2, part)


_WD = ["MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY",
       "SATURDAY", "SUNDAY"]


def _ref_last_day(d: dt.date, part: str) -> dt.date:
    if part == "MONTH":
        nxt = dt.date(d.year + (d.month == 12), d.month % 12 + 1, 1)
        return nxt - dt.timedelta(days=1)
    if part == "QUARTER":
        q_end_month = ((d.month - 1) // 3) * 3 + 3
        return _ref_last_day(dt.date(d.year, q_end_month, 1), "MONTH")
    if part == "YEAR":
        return dt.date(d.year, 12, 31)
    if part == "ISOWEEK":  # Monday-start week -> last day is Sunday
        return d + dt.timedelta(days=6 - d.weekday())
    if part.startswith("WEEK(") or part == "WEEK":
        # WEEK starts Sunday by default; WEEK(<WD>) starts <WD>. The
        # last day is start + 6.
        start = "SUNDAY" if part == "WEEK" else part[5:-1]
        start_idx = _WD.index(start)  # Monday=0
        delta = (d.weekday() - start_idx) % 7
        return d - dt.timedelta(days=delta) + dt.timedelta(days=6)
    raise AssertionError(part)


def test_last_day_all_parts_and_anchors(spark):
    rng = random.Random(SEED + 3)
    days = [
        dt.date(2024, 2, 29), dt.date(2024, 2, 28), dt.date(2023, 2, 28),
        dt.date(2024, 12, 31), dt.date(2024, 1, 1), dt.date(2024, 3, 31),
        dt.date(2024, 6, 30), dt.date(2000, 2, 29),
    ] + [
        dt.date(2024, 1, 1) + dt.timedelta(days=rng.randint(0, 365))
        for _ in range(12)
    ]
    parts = (["MONTH", "QUARTER", "YEAR", "ISOWEEK", "WEEK"]
             + [f"WEEK({w})" for w in _WD])
    exprs, want = [], []
    for d in days:
        for p in parts:
            exprs.append(f"LAST_DAY(DATE '{d.isoformat()}', {p})")
            want.append(_ref_last_day(d, p))
    got = _batch(spark, exprs)
    for e, w, g in zip(exprs, want, got):
        assert g == w, (e, w, g)


def test_date_trunc_week_anchors(spark):
    rng = random.Random(SEED + 4)
    days = [dt.date(2024, 1, 1) + dt.timedelta(days=rng.randint(0, 730))
            for _ in range(20)]
    exprs, want = [], []
    for d in days:
        for w in _WD:
            exprs.append(
                f"CAST(DATE_TRUNC(DATE '{d.isoformat()}', WEEK({w})) "
                "AS DATE)"
            )
            start_idx = _WD.index(w)
            want.append(d - dt.timedelta(days=(d.weekday() - start_idx)
                                         % 7))
    got = _batch(spark, exprs)
    for e, w_, g in zip(exprs, want, got):
        assert g == w_, (e, w_, g)


def test_format_date_boundary_codes(spark):
    days = [
        dt.date(2024, 1, 1), dt.date(2024, 12, 31), dt.date(2024, 2, 29),
        dt.date(2023, 1, 1), dt.date(2021, 1, 3), dt.date(2021, 1, 4),
        dt.date(2000, 2, 29), dt.date(2024, 9, 8),
    ]
    codes = ["%j", "%U", "%W", "%a", "%b", "%e"]
    exprs, want = [], []
    for d in days:
        for c in codes:
            exprs.append(f"FORMAT_DATE('{c}', DATE '{d.isoformat()}')")
            if c == "%e":
                want.append(f"{d.day:2d}".lstrip()
                            if False else f"{d.day:2}")
            else:
                want.append(d.strftime(c))
    got = _batch(spark, exprs)
    for e, w, g in zip(exprs, want, got):
        assert g == w, (e, w, g)


def test_parse_date_edges(spark):
    cases = [
        ("%Y-%m-%d", "2024-02-29", dt.date(2024, 2, 29)),
        ("%Y-%m-%d", "0001-01-01", dt.date(1, 1, 1)),
        ("%Y-%m-%d", "9999-12-31", dt.date(9999, 12, 31)),
        ("%Y%m%d", "20240229", dt.date(2024, 2, 29)),
        ("%d/%m/%Y", "29/02/2024", dt.date(2024, 2, 29)),
    ]
    exprs = [f"PARSE_DATE('{f}', '{s}')" for f, s, _ in cases]
    got = _batch(spark, exprs)
    for (f, s, w), g in zip(cases, got):
        assert g == w, (f, s, w, g)
    # SAFE. returns NULL on the impossible date instead of raising
    assert _batch(
        spark, ["SAFE.PARSE_DATE('%Y-%m-%d', '2023-02-29')"]
    ) == [None]
