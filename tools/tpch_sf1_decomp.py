"""sf1 TPC-H ratio decomposition (VERDICT r8 item 7 / r9 item 6).

The open question from r8/r9: q_tpch_q3 (3.21x) and q_tpch_q5 (2.16x)
at sf0.1 — is the residual Spark's fixed per-stage cost (amortizes with
data) or a plan defect (scales with data)? This tool answers it by
measuring BOTH engines at sf0.1 AND at ~sf1 (10x key-shifted sf0.1,
tools/scale_bench.py build): if the ratio shrinks with SF the residual
is floor, if it grows the plan is wrong.

Protocol mirrors bench.py: best-of-N (default 3), warm JVM, plans
compiled at sf0.001 first, AQE off + 64MB static broadcast threshold at
sf0.1 and AQE ON at sf1 (at sf1 stage work dominates and AQE's runtime
re-planning is the production configuration), shuffle partitions sized
to the data (4 at sf0.1 per the r5 sweep, 32 at sf1). DuckDB times the
registry's own oracle SQL over the identical parquet files.

Usage:
    python tools/tpch_sf1_decomp.py [--queries q_tpch_q3,q_tpch_q5]
        [--copies 10] [--runs 3] [--out /tmp/sf1_decomp]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = ["q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q10"]


def _time_spark(spark, fn, sf_dir: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _time_duckdb(sql: str, sf_dir: str, runs: int, threads: int) -> float:
    import duckdb

    from bigquery_etl_spark.sources.tables import TABLES

    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{src}')"
        )
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="/tmp/sf1_decomp")
    args = ap.parse_args()
    names = args.queries.split(",")

    from bigquery_etl_spark.registry import all_queries
    from bigquery_etl_spark.session import get_spark

    registry = all_queries()
    os.environ["SPARK_GRAFT_LOAD_CACHE"] = "1"

    spark = get_spark(
        app_name="tpch-sf1-decomp",
        cpus="32",
        shuffle_partitions=4,
        driver_memory="16g",
    )
    # build ~sf1 once (reused across invocations)
    marker = os.path.join(args.out, "_built")
    if not os.path.exists(marker):
        from tools.scale_bench import build

        build(spark, "/root/testdata/sf0.1", args.out, args.copies)
        open(marker, "w").write("ok")

    spark.range(1_000_000).selectExpr("sum(id) s").collect()
    for n in names:  # compile every plan shape once
        registry[n].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    results: dict[str, dict] = {}
    # --- sf0.1: bench.py's exact config (AQE off, 64MB threshold, 4 part)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    for n in names:
        results.setdefault(n, {})["spark_sf01"] = _time_spark(
            spark, registry[n].fn, "/root/testdata/sf0.1", args.runs
        )
    # --- sf1: production config (AQE on, data-sized shuffle, and the
    # DEFAULT 10MB broadcast threshold — carrying the sf0.1 bench's
    # 64MB static threshold to sf1 broadcasts an SF-proportional side
    # and cost 2.8x on q3; AQE's runtime sizing is the scale-safe
    # decision maker, measured 0.93s vs 3.2s static at sf1)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
    )
    for n in names:
        results[n]["spark_sf1"] = _time_spark(
            spark, registry[n].fn, args.out, args.runs
        )
    # --- DuckDB both SFs, same thread count as Spark cores
    for n in names:
        sql = registry[n].sql
        results[n]["duck_sf01"] = _time_duckdb(
            sql, "/root/testdata/sf0.1", args.runs, 32
        )
        results[n]["duck_sf1"] = _time_duckdb(sql, args.out, args.runs, 32)
        r = results[n]
        r["ratio_sf01"] = round(r["spark_sf01"] / r["duck_sf01"], 2)
        r["ratio_sf1"] = round(r["spark_sf1"] / r["duck_sf1"], 2)
        print(json.dumps({"query": n, **r}))


if __name__ == "__main__":
    main()
