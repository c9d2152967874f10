"""Decompose a declared query's save() wall into Catalyst phases vs
execution: parse/analysis/optimization/planning from Spark's
QueryPlanningTracker, plus job count and total job wall from a
SparkListener. Bench protocol (same session/conf/warmup as bench.py).

Usage: python tools/phase_probe.py q_tpch_q6 q_time_type ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_LOAD_CACHE"] = "1"

    import bench
    from bigquery_etl_spark.registry import all_queries
    from bigquery_etl_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(
        app_name="phase-probe",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4")),
        driver_memory=os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
    )
    if os.environ.get("SPARK_GRAFT_AQE", "0") != "1":
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    spark.range(1_000_000).selectExpr("sum(id) s").collect()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        registry[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    query_dir, _ = bench.ingest(spark, sf_dir)

    sc = spark.sparkContext
    stats = sc._jvm.org.apache.spark.status.api.v1  # noqa: F841 (touch jvm)

    print(f"{'query':<26}{'fn':>7}{'plan':>7}{'exec':>7}{'analys':>7}"
          f"{'optim':>7}{'plann':>7}{'jobs':>5}")
    for name in names:
        spec = registry[name]
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = spec.fn(spark, query_dir)
            t1 = time.perf_counter()
            qe = df._jdf.queryExecution()
            qe.executedPlan()  # force analysis + optimization + planning
            t2 = time.perf_counter()
            jsc = sc._jsc.sc()
            jobs0 = jsc.dagScheduler().nextJobId().get() if hasattr(jsc.dagScheduler().nextJobId(), "get") else jsc.dagScheduler().nextJobId()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            jobs1 = jsc.dagScheduler().nextJobId().get() if hasattr(jsc.dagScheduler().nextJobId(), "get") else jsc.dagScheduler().nextJobId()
            phases = {}
            it = qe.tracker().phases().iterator()
            while it.hasNext():
                kv = it.next()
                ph = kv._2()
                phases[kv._1()] = (ph.endTimeMs() - ph.startTimeMs()) / 1000.0
            row = (t1 - t0, t2 - t1, t3 - t2,
                   phases.get("analysis", 0.0), phases.get("optimization", 0.0),
                   phases.get("planning", 0.0), jobs1 - jobs0)
            if best is None or row[1] + row[2] < best[1] + best[2]:
                best = row
        fn_t, plan_t, exec_t, an, op, pl, nj = best
        # NOTE: the noop write wraps df in a FRESH QueryExecution, so the
        # exec column still re-pays analysis+optimization+planning of the
        # write tree — plan_t is how much of that is pure Catalyst.
        print(f"{name:<26}{fn_t:>7.3f}{plan_t:>7.3f}{exec_t:>7.3f}{an:>7.3f}"
              f"{op:>7.3f}{pl:>7.3f}{nj:>5d}")


if __name__ == "__main__":
    main()
