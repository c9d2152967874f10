"""operators/range_frame.py: prefix-sum RANGE-frame rewrite equals the
direct window form on edge-heavy data (peers, boundary-exact values,
nulls in the aggregated column, single-row partitions)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.operators.range_frame import bounded_range_sum


def _direct(df, delta):
    # SQL form: the DataFrame rangeBetween API only takes int offsets
    frame = f"RANGE BETWEEN {delta} PRECEDING AND CURRENT ROW"
    over = f"OVER (PARTITION BY g ORDER BY v {frame})"
    return df.selectExpr(
        "id",
        f"sum(x) {over} AS range_sum",
        f"count(x) {over} AS range_cnt",
    )


def _rewrite(df, delta):
    return bounded_range_sum(df, ["g"], "v", delta, "x").select(
        "id", "range_sum", "range_cnt"
    )


def _cmp(df, delta):
    a = {r.id: (r.range_sum, r.range_cnt) for r in _direct(df, delta).collect()}
    b = {r.id: (r.range_sum, r.range_cnt) for r in _rewrite(df, delta).collect()}
    assert a == b, {k: (a[k], b[k]) for k in a if a[k] != b[k]}


def test_peers_and_exact_boundary(spark):
    # peers at v=10 and v=20; v=20's frame with delta=10 must include
    # BOTH v=10 peers (boundary inclusive) and its own peer
    df = spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "a", 10.0, 2), (3, "a", 20.0, 4),
         (4, "a", 20.0, 8), (5, "a", 35.0, 16), (6, "b", 5.0, 32)],
        "id long, g string, v double, x long",
    )
    _cmp(df, 10.0)
    _cmp(df, 0.0)        # frame = peers only
    _cmp(df, 1000.0)     # frame = whole partition


def test_nulls_in_agg_col(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0, None), (2, "a", 2.0, 10), (3, "a", 3.0, None),
         (4, "a", 4.0, 7)],
        "id long, g string, v double, x int",
    )
    _cmp(df, 1.5)


def test_single_row_partitions_and_negative_values(spark):
    df = spark.createDataFrame(
        [(1, "a", -5.0, 3), (2, "b", 0.0, 4), (3, "c", 7.5, 5)],
        "id long, g string, v double, x long",
    )
    _cmp(df, 2.0)


def test_multi_key_partitions(spark):
    # two partition columns exercise the composite-key as-of path
    df = spark.createDataFrame(
        [(1, "a", "x", 1.0, 1), (2, "a", "x", 2.0, 2), (3, "a", "y", 1.5, 4),
         (4, "b", "x", 1.0, 8), (5, "b", "x", 3.0, 16), (6, "b", "y", 3.0, 32)],
        "id long, g string, h string, v double, x long",
    )
    frame = "RANGE BETWEEN 1.0 PRECEDING AND CURRENT ROW"
    over = f"OVER (PARTITION BY g, h ORDER BY v {frame})"
    a = {
        r.id: (r.range_sum, r.range_cnt)
        for r in df.selectExpr(
            "id", f"sum(x) {over} AS range_sum", f"count(x) {over} AS range_cnt"
        ).collect()
    }
    b = {
        r.id: (r.range_sum, r.range_cnt)
        for r in bounded_range_sum(df, ["g", "h"], "v", 1.0, "x")
        .select("id", "range_sum", "range_cnt")
        .collect()
    }
    assert a == b


def test_null_order_values(spark):
    """NULL order rows take their NULL peer group as the frame (SQL
    RANGE rule) and must not leak into non-null rows' value frames —
    both directions were wrong before the split fix."""
    df = spark.createDataFrame(
        [(1, "a", None, 10), (2, "a", None, 5), (3, "a", 1.0, 1),
         (4, "a", 2.0, 2), (5, "a", 4.0, 4), (6, "b", None, 7),
         (7, "b", None, None), (8, "c", 3.0, 9)],
        "id long, g string, v double, x int",
    )
    _cmp(df, 2.0)
    _cmp(df, 0.0)


def test_fuzz_random_frames(spark):
    """Seeded random corpora (dup-heavy values to stress peers and
    boundary-exact cases, NULLs in BOTH the order and agg columns) x
    random deltas: rewrite == direct window."""
    import random

    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(5, 60)
        rows = [
            (
                i,
                rng.choice(["a", "b", "c"]),
                # coarse grid => many peers and exact v-delta collisions;
                # occasional NULL order value exercises the peer-group path
                rng.choice([None] + [float(v) for v in range(13)]),
                rng.choice([None, rng.randint(-5, 5)]),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double, x int")
        delta = float(rng.choice([0, 1, 2, 3, 5]))
        _cmp(df, delta)


def test_matches_direct_on_fixture(spark, sf_dir):
    from bigquery_etl_spark.registry import all_queries

    reg = all_queries()
    direct = {
        r.o_orderkey: (r.n_near, r.sum_near)
        for r in reg["q_win_range_frame"].fn(spark, sf_dir).collect()
    }
    rewrite = {
        r.o_orderkey: (r.n_near, r.sum_near)
        for r in reg["q_win_range_prefix"].fn(spark, sf_dir).collect()
    }
    assert direct == rewrite
