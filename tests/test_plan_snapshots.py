"""Optimized-plan digest snapshots for the bench headline queries
(VERDICT r3 item 8): plan regressions — a defeated ReuseExchange, a
join strategy flip, a lost pushdown — are caught by DIFF at test time
instead of by profiling after the bench moves.

Each headline query's optimizer output is canonicalized (expression
ids, plan ids, scratch paths, codegen ids stripped) and hashed; the
digests live in ``tests/plan_snapshots.json``. When a change is
INTENTIONAL, regenerate with::

    SPARK_GRAFT_UPDATE_SNAPSHOTS=1 python -m pytest tests/test_plan_snapshots.py

and commit the new file — the diff of digests names exactly which
queries' plans moved, so the reviewer sees the blast radius.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import pytest

SNAP_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshots.json")
UPDATE = os.environ.get("SPARK_GRAFT_UPDATE_SNAPSHOTS") == "1"


def _headline() -> list[str]:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.HEADLINE


def canonical_plan(df) -> str:
    text = df._jdf.queryExecution().optimizedPlan().toString()
    text = re.sub(r"#\d+L?", "#", text)          # expression ids
    text = re.sub(r"plan_id=\d+", "plan_id=", text)
    text = re.sub(r"cachedcount=\d+", "cachedcount=", text)
    # scratch/fixture paths: mkdtemp suffixes, commit uuids, tmp roots
    text = re.sub(r"/tmp/[^\s,\]\)]+", "/tmp/_", text)
    text = re.sub(r"[0-9a-f]{32}", "_uuid_", text)
    # parquet file lists vary in count at different SFs — keep location
    # kind, drop the enumeration
    text = re.sub(r"InMemoryFileIndex\([^)]*\)\[[^\]]*\]", "InMemoryFileIndex[_]", text)
    text = re.sub(r"\[file:[^\]]*\]", "[file:_]", text)
    return text


def digest(df) -> str:
    return hashlib.sha256(canonical_plan(df).encode()).hexdigest()[:16]


def _load() -> dict[str, str]:
    if os.path.exists(SNAP_PATH):
        with open(SNAP_PATH) as f:
            return json.load(f)
    return {}


def test_headline_plan_snapshots(spark, sf_dir):
    from bigquery_etl_spark.registry import all_queries

    registry = all_queries()
    names = [n for n in _headline() if n in registry]
    got = {}
    for name in names:
        got[name] = digest(registry[name].fn(spark, sf_dir))

    if UPDATE:
        with open(SNAP_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip(f"snapshots regenerated for {len(got)} queries")

    want = _load()
    if not want:
        pytest.fail(
            "tests/plan_snapshots.json missing — generate with "
            "SPARK_GRAFT_UPDATE_SNAPSHOTS=1"
        )
    changed = {
        n: (want.get(n), got[n]) for n in got if want.get(n) != got[n]
    }
    removed = sorted(set(want) - set(got))
    assert not changed and not removed, (
        f"optimized plans changed for {sorted(changed)} (removed: {removed}). "
        "If intentional, regenerate: SPARK_GRAFT_UPDATE_SNAPSHOTS=1 "
        "python -m pytest tests/test_plan_snapshots.py && commit the diff"
    )
