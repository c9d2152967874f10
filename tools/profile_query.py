"""Per-operator metrics profile for any declared query.

Executes a registered query's PHYSICAL plan once and walks the executed
plan tree printing every node's SQL metrics — output rows, spill sizes,
peak memory, shuffle bytes, broadcast sizes. This is the local stand-in
for the Spark UI's SQL tab (the UI is disabled in this container) and
the tool behind PERF.md's spill/memory claims.

Usage:
    python tools/profile_query.py q_agg_hash [sf_dir]
    python tools/profile_query.py q_dedup_minhash /root/testdata/sf0.1

Notes: the plan executes via ``plan.execute().count()`` so the metrics
land on THIS plan instance (a ``df.write`` wraps the query in a fresh
QueryExecution whose metrics we'd never see). AQE wrapper nodes
(AdaptiveSparkPlan, *QueryStage) are unwrapped in place.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERESTING = (
    "numOutputRows",
    "spillSize",
    "peakMemory",
    "dataSize",
    "shuffleBytesWritten",
    "bytesRead",
    "numFiles",
    "buildTime",
    "aggTime",
    "numPartitions",
)


def walk(node, depth: int = 0, lines: list[str] | None = None) -> list[str]:
    lines = lines if lines is not None else []
    name = node.nodeName()
    it = node.metrics().iterator()
    parts = []
    while it.hasNext():
        kv = it.next()
        k, v = kv._1(), kv._2().value()
        if k in INTERESTING and v != 0:
            parts.append(f"{k}={v:,}")
    lines.append("  " * depth + name + ("  [" + " ".join(sorted(parts)) + "]" if parts else ""))
    if name == "AdaptiveSparkPlan":
        walk(node.executedPlan(), depth + 1, lines)
        return lines
    if "QueryStage" in name:
        walk(node.plan(), depth + 1, lines)
        return lines
    for i in range(node.children().length()):
        walk(node.children().apply(i), depth + 1, lines)
    return lines


def metrics_summary(plan) -> dict[str, int]:
    """Whole-plan rollup of the metrics that matter for memory sizing:
    total spill (bytes hitting disk), max per-operator peak memory
    (the number that must fit an executor), total shuffle write."""
    agg = {"spill_bytes": 0, "peak_mem_bytes": 0, "shuffle_write_bytes": 0}

    def visit(node):
        name = node.nodeName()
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            k, v = kv._1(), kv._2().value()
            if k == "spillSize":
                agg["spill_bytes"] += max(v, 0)
            elif k == "peakMemory":
                agg["peak_mem_bytes"] = max(agg["peak_mem_bytes"], v)
            elif k == "shuffleBytesWritten":
                agg["shuffle_write_bytes"] += max(v, 0)
        if name == "AdaptiveSparkPlan":
            visit(node.executedPlan())
            return
        if "QueryStage" in name:
            visit(node.plan())
            return
        for i in range(node.children().length()):
            visit(node.children().apply(i))

    visit(plan)
    return agg


def profile(name: str, sf_dir: str) -> None:
    from bigquery_etl_spark.registry import all_queries
    from bigquery_etl_spark.session import get_spark

    spec = all_queries().get(name)
    if spec is None:
        raise SystemExit(f"unknown query {name!r}")
    spark = get_spark(app_name=f"profile-{name}")
    df = spec.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan()
    n = plan.execute().count()
    print(f"# {name} @ {sf_dir}: {n:,} output rows\n")
    print("\n".join(walk(plan)))


if __name__ == "__main__":
    q = sys.argv[1] if len(sys.argv) > 1 else "q_agg_hash"
    d = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    profile(q, d)
