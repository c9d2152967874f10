"""Per-query decomposition of the bench wall: fn() (Python-side plan
construction, dominated by py4j round-trips) vs save() (JVM analyze +
optimize + codegen + execute through the noop sink).

Replicates bench.py's session/config/warmup protocol exactly, then for
each headline query times the two halves separately (best-of-N each, on
the managed layout). Optionally dumps explain("formatted") per query.

Usage:
    python tools/fn_save_decomp.py [--runs 3] [--plans plans/r13 --suffix _before]
    python tools/fn_save_decomp.py --queries q_agg_hash,q_ml_tfidf
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    runs = 3
    plans_dir = None
    suffix = "_before"
    only = None
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--runs":
            runs = int(args[i + 1])
        elif a == "--plans":
            plans_dir = args[i + 1]
        elif a == "--suffix":
            suffix = args[i + 1]
        elif a == "--queries":
            only = args[i + 1].split(",")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_LOAD_CACHE"] = "1"

    import bench
    from bigquery_etl_spark.registry import all_queries
    from bigquery_etl_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(
        app_name="fn-save-decomp",
        cpus=cpus,
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4")),
        driver_memory=os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
    )
    if os.environ.get("SPARK_GRAFT_AQE", "0") != "1":
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    names = only or bench.HEADLINE
    spark.range(1_000_000).selectExpr("sum(id) s").collect()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        spec = registry.get(name)
        if spec is None:
            continue
        try:
            spec.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"WARMFAIL {name}: {exc}", file=sys.stderr)

    query_dir, _ = bench.ingest(spark, sf_dir)

    rows = []
    for name in names:
        spec = registry.get(name)
        if spec is None:
            continue
        fn_best = save_best = float("inf")
        df = None
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                df = spec.fn(spark, query_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                fn_best = min(fn_best, t1 - t0)
                save_best = min(save_best, t2 - t1)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            continue
        rows.append((name, round(fn_best, 3), round(save_best, 3)))
        if plans_dir and df is not None:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))

    rows.sort(key=lambda r: -(r[1] + r[2]))
    tot_fn = sum(r[1] for r in rows)
    tot_save = sum(r[2] for r in rows)
    print(f"{'query':<28}{'fn':>8}{'save':>8}{'total':>8}")
    for name, fn_t, save_t in rows:
        print(f"{name:<28}{fn_t:>8.3f}{save_t:>8.3f}{fn_t + save_t:>8.3f}")
    print(f"{'TOTAL':<28}{tot_fn:>8.3f}{tot_save:>8.3f}{tot_fn + tot_save:>8.3f}")
    print(json.dumps({"fn_total": round(tot_fn, 3),
                      "save_total": round(tot_save, 3),
                      "n": len(rows)}))


if __name__ == "__main__":
    main()
