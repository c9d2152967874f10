"""Scale-out probe: run headline queries at ~10x sf0.1 (≈ sf1).

/root/testdata stops at sf0.1; this tool synthesizes a larger scale
factor under /tmp by unioning KEY-SHIFTED copies of sf0.1 — every key
column (and its foreign-key references) shifts by copy_index * stride,
so join fan-outs, key cardinalities, and group counts grow linearly
like a real scale factor instead of multiplying duplicate keys.
Text/doc tables shift ids but keep text, so dedup workloads see a
corpus where ~90% of docs are true duplicates — the realistic shape for
a crawl corpus.

Usage:
    python tools/scale_bench.py [--copies 10] [--queries q_agg_hash,...]

Prints one JSON line per query: {"query", "sec", "rows"} and a summary.
This is a dev/profiling tool, not part of the driver contract
(bench.py stays the per-round artifact).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key columns per table; every column listed shifts by i * stride so
# cross-table references stay consistent (same stride for a key family).
KEY_FAMILIES: dict[str, dict[str, str]] = {
    # table -> {column: family}
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "doc"},
    # region/nation are dimension constants — copied once, never shifted
    "region": {},
    "nation": {},
}

DEFAULT_QUERIES = [
    "q_agg_hash",
    "q_join_inner",
    "q_join_broadcast",
    "q_topk_per_group",
    "q_dedup_key",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_text_tokens",
    "q_quality_gopher",
    "q_tpch_q3",
    "q_tpch_q6",
    "q_gap_fill",
]


def build(spark, src_dir: str, out_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    from bigquery_etl_spark.sources import load

    strides: dict[str, int] = {}

    def stride_for(family: str, df, col: str) -> int:
        if family not in strides:
            hi = df.agg(F.max(col)).collect()[0][0] or 0
            strides[family] = int(hi) + 1
        return strides[family]

    for table, keys in KEY_FAMILIES.items():
        src = load(spark, src_dir, table)
        if not keys:
            src.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
            continue
        parts = []
        for i in range(copies):
            df = src
            for col, family in keys.items():
                s = stride_for(family, src, col)
                df = df.withColumn(col, (F.col(col) + F.lit(i * s)).cast("long"))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # several output files so downstream scans parallelize (the
        # driver fixtures are single-file/single-row-group on purpose;
        # at real scale the lake has many files)
        out.repartition(8).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--queries", type=str, default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--src", type=str, default="/root/testdata/sf0.1")
    ap.add_argument("--out", type=str, default="/tmp/spark_graft_scale")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument(
        "--profile",
        action="store_true",
        help="also report per-query spill / peak-memory / shuffle-write "
        "(executes via the plan instance so metrics are readable)",
    )
    args = ap.parse_args()

    from bigquery_etl_spark.registry import all_queries
    from bigquery_etl_spark.session import get_spark

    # local-mode JVM defaults to 1g heap — size it like a real executor
    # (the container has 128 GiB; 16g covers the widest shuffle here)
    spark = get_spark(
        app_name="scale_bench",
        shuffle_partitions=32,
        driver_memory=os.environ.get("SPARK_GRAFT_SCALE_MEM", "16g"),
    )
    marker = os.path.join(args.out, f"_built_{args.copies}")
    if args.rebuild or not os.path.exists(marker):
        t0 = time.perf_counter()
        build(spark, args.src, args.out, args.copies)
        open(marker, "w").close()
        print(
            json.dumps(
                {"phase": "build", "copies": args.copies, "sec": round(time.perf_counter() - t0, 1)}
            )
        )

    registry = all_queries()
    total = 0.0
    results = {}
    for name in args.queries.split(","):
        spec = registry.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        try:
            if args.profile:
                from tools.profile_query import metrics_summary

                plan = spec.fn(spark, args.out)._jdf.queryExecution().executedPlan()
                plan.execute().count()
                extra = {
                    k: round(v / 1e6, 1) for k, v in metrics_summary(plan).items()
                }
                extra = {k.replace("_bytes", "_mb"): v for k, v in extra.items()}
            else:
                spec.fn(spark, args.out).write.format("noop").mode("overwrite").save()
                extra = {}
        except Exception as e:  # record and continue — one failure must not hide the rest
            print(json.dumps({"query": name, "error": str(e)[:200]}))
            continue
        sec = round(time.perf_counter() - t0, 2)
        total += sec
        results[name] = sec
        print(json.dumps({"query": name, "sec": sec, **extra}))
    print(
        json.dumps(
            {"phase": "total", "copies": args.copies, "sec": round(total, 2), "queries": results}
        )
    )


if __name__ == "__main__":
    main()
