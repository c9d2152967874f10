"""Differential fuzzing (SURVEY.md §5.2 property-based): seeded random
filters and aggregations run on Spark and DuckDB over the same parquet;
results must match. Deterministic (seed=42) so failures reproduce.
"""

from __future__ import annotations

import random

import pytest

from bigquery_etl_spark.oracle import compare, run_duckdb
from bigquery_etl_spark.sources import load

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
GROUP_COLS = ["l_returnflag", "l_linestatus"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]

rng = random.Random(42)


def _rand_pred() -> str:
    def atom() -> str:
        if rng.random() < 0.7:
            col = rng.choice(NUM_COLS)
            lo, hi = {"l_quantity": (1, 50), "l_extendedprice": (1000, 100000),
                      "l_discount": (0, 0.1), "l_tax": (0, 0.08)}[col]
            v = round(rng.uniform(lo, hi), 3)
            return f"{col} {rng.choice(OPS)} {v}"
        col = rng.choice(KEY_COLS)
        return f"{col} % {rng.randint(2, 13)} = {rng.randint(0, 1)}"

    n = rng.randint(1, 3)
    parts = [atom() for _ in range(n)]
    joiner = rng.choice([" AND ", " OR "])
    pred = joiner.join(parts)
    if rng.random() < 0.3:
        pred = f"NOT ({pred})"
    return pred


CASES = []
for i in range(20):
    pred = _rand_pred()
    if rng.random() < 0.5:
        CASES.append((f"filter_{i}", f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {pred}"))
    else:
        g = rng.choice(GROUP_COLS)
        c = rng.choice(NUM_COLS)
        CASES.append(
            (
                f"agg_{i}",
                f"SELECT {g}, COUNT(*) AS n, "
                f"CAST(SUM(CAST({c} AS DECIMAL(18,6))) AS DOUBLE) AS s "
                f"FROM lineitem WHERE {pred} GROUP BY {g}",
            )
        )


# Join / subquery / window shapes (SQL shared verbatim by both dialects:
# semi/anti spelled as EXISTS / NOT EXISTS, which both engines plan as
# semi/anti joins).
for i in range(12):
    pred = _rand_pred()
    shape = i % 4
    if shape == 0:
        CASES.append(
            (
                f"join_{i}",
                "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
                f"JOIN lineitem ON o_orderkey = l_orderkey WHERE {pred} "
                "GROUP BY o_orderpriority",
            )
        )
    elif shape == 1:
        CASES.append(
            (
                f"exists_{i}",
                "SELECT o_orderkey FROM orders WHERE EXISTS "
                f"(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND {pred})",
            )
        )
    elif shape == 2:
        CASES.append(
            (
                f"notexists_{i}",
                "SELECT o_orderkey FROM orders WHERE NOT EXISTS "
                f"(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND {pred})",
            )
        )
    else:
        CASES.append(
            (
                f"window_{i}",
                "SELECT l_orderkey, l_linenumber, "
                "ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn "
                f"FROM lineitem WHERE {pred}",
            )
        )


# --- window-spec fuzz: random analytic functions over random specs ------
# Same SQL text runs on both engines. Order keys always end in the
# unique (l_orderkey, l_linenumber) pair so every function is
# deterministic; frame sums use an integer expression so float
# summation order can't drift.

_WFN = [
    "ROW_NUMBER()",
    "RANK()",
    "DENSE_RANK()",
    "LAG(l_linenumber, 1, -1)",
    "LEAD(l_linenumber, 2, -1)",
    "SUM(l_orderkey % 97)",
    "MIN(l_quantity)",
    "COUNT(*)",
]
_WFRAME = [
    "",
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
    " ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
]
for i in range(6):
    part = rng.choice(["l_returnflag", "l_linestatus", "l_orderkey % 11"])
    okey = rng.choice(["l_quantity", "l_extendedprice", "l_shipdate"])
    fns = rng.sample(_WFN, 3)
    cols = []
    for j, fn in enumerate(fns):
        frame = "" if "(" in fn and fn.endswith(")") and "SUM" not in fn and "MIN" not in fn and "COUNT" not in fn else rng.choice(_WFRAME)
        expr = f"{fn} OVER (PARTITION BY {part} ORDER BY {okey}, l_orderkey, l_linenumber{frame})"
        if fn.startswith("SUM"):
            # DuckDB SUM(int) yields HUGEINT (-> pandas float64); pin
            # both engines to BIGINT so the dtype-strict compare holds
            expr = f"CAST({expr} AS BIGINT)"
        cols.append(f"{expr} AS w{j}")
    CASES.append(
        (
            f"winfuzz_{i}",
            "SELECT l_orderkey, l_linenumber, " + ", ".join(cols) + " FROM lineitem",
        )
    )


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_random_query_parity(spark, sf_dir, case):
    _, sql = case
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark_pdf = spark.sql(sql).toPandas()
    oracle_pdf = run_duckdb(sql, sf_dir)
    errs = compare(spark_pdf, oracle_pdf)
    assert not errs, f"{sql}: " + "; ".join(errs)


@pytest.mark.parametrize("seed", [7, 21, 1337])
def test_change_feed_roundtrip_fuzz(spark, seed):
    """CDF algebra, fuzzed: for random keyed snapshots (with NULL keys'
    values, value collisions, disjoint/overlapping key ranges),
    (1) applying snapshot_diff(old, new) to old reconstructs new
        exactly (delete preimages+deletes, add postimages+inserts);
    (2) folding the diff into the per-group aggregate of old equals
        the aggregate recomputed from new (apply_change_feed)."""
    import random as _r

    from pyspark.sql import functions as F

    from bigquery_etl_spark.operators.incremental_agg import (
        apply_change_feed,
        partial_agg,
    )
    from bigquery_etl_spark.operators.merge import snapshot_diff

    rnd = _r.Random(seed)

    def table():
        rows = []
        for k in rnd.sample(range(50), rnd.randint(10, 40)):
            g = rnd.choice(["a", "b", "c", None])
            v = rnd.choice([None, rnd.randint(-5, 5)])
            rows.append((k, g, v))
        return spark.createDataFrame(rows, "k long, g string, v long")

    old, new = table(), table()
    diff = snapshot_diff(old, new, ["k"])

    # (1) reconstruct: old - (delete ∪ update_preimage) + (insert ∪ update_postimage)
    minus = diff.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).drop("_change_type")
    plus = diff.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    rebuilt = old.exceptAll(minus).unionByName(plus)
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )

    # (2) view maintenance == recompute — INCLUDING NULL measure rows
    # (r4: the __nn companion makes all-NULL groups maintain SUM=NULL
    # exactly, so the old fillna(0) workaround is gone; n_rows counts
    # every row via count(1))
    state = old.groupBy("g").agg(
        F.sum("v").alias("total"),
        F.count("v").cast("bigint").alias("total__nn"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    maintained = apply_change_feed(
        state, diff, ["g"], {"total": "v"}, "n_rows"
    ).select("g", "total", "n_rows")
    recomputed = (
        new.groupBy("g")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 0)
    )
    got = sorted(map(tuple, maintained.collect()), key=lambda r: (str(r[0]),))
    want = sorted(map(tuple, recomputed.collect()), key=lambda r: (str(r[0]),))
    assert got == want
