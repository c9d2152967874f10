"""Optimized-plan digest snapshots for the bench headline queries
(VERDICT r3 item 8): plan regressions — a defeated ReuseExchange, a
join-strategy flip, a lost pushdown — are caught by DIFF at test time
instead of by profiling after the bench moves.

Digests are computed by ``tools/plan_digests.py`` in a SUBPROCESS:
Catalyst's expression-id counter is process-global and at least one
rewrite (RewriteDistinctAggregates' gid ordering) is sensitive to it,
so planning the same query after other tests can reorder the printed
plan. A fresh interpreter building the headline plans in a fixed order
is reproducible; the snapshots live in ``tests/plan_snapshots.json``.

When a change is INTENTIONAL, regenerate with::

    SPARK_GRAFT_UPDATE_SNAPSHOTS=1 python -m pytest tests/test_plan_snapshots.py

and commit the new file — the diff of digests names exactly which
queries' plans moved, so the reviewer sees the blast radius.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAP_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshots.json")
UPDATE = os.environ.get("SPARK_GRAFT_UPDATE_SNAPSHOTS") == "1"


def _compute(sf_dir: str) -> dict[str, str]:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plan_digests.py"), sf_dir],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"plan_digests failed:\n{proc.stderr[-3000:]}"
    # last JSON blob on stdout (spark logs may precede it)
    text = proc.stdout
    start = text.index("{")
    return json.loads(text[start:])


def test_headline_plan_snapshots(sf_dir):
    got = _compute(sf_dir)
    assert got, "no digests produced"

    if UPDATE:
        with open(SNAP_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip(f"snapshots regenerated for {len(got)} queries")

    if not os.path.exists(SNAP_PATH):
        pytest.fail(
            "tests/plan_snapshots.json missing — generate with "
            "SPARK_GRAFT_UPDATE_SNAPSHOTS=1"
        )
    with open(SNAP_PATH) as f:
        want = json.load(f)
    changed = {n: (want.get(n), got[n]) for n in got if want.get(n) != got[n]}
    removed = sorted(set(want) - set(got))
    assert not changed and not removed, (
        f"optimized plans changed for {sorted(changed)} (removed: {removed}). "
        "If intentional, regenerate: SPARK_GRAFT_UPDATE_SNAPSHOTS=1 "
        "python -m pytest tests/test_plan_snapshots.py && commit the diff"
    )
