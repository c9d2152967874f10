"""PointerStore: atomic-pointer snapshot commits are safe for a reader
concurrent with a stream of upserts (the staged-swap protocol's one
remaining gap, VERDICT r2 item 4)."""

from __future__ import annotations

import threading

import pytest

from bigquery_etl_spark.sources.pointer_store import PointerStore


def _stamp_df(spark, stamp: int, n: int = 50):
    return spark.range(n).selectExpr("id AS k", f"CAST({stamp} AS LONG) AS stamp")


def test_basic_upsert_roundtrip(spark, tmp_path):
    st = PointerStore(spark, str(tmp_path / "t"))
    st.upsert(_stamp_df(spark, 1, 10), ["k"])
    assert st.read().count() == 10
    # upsert half the keys + two new ones
    upd = spark.range(8, 12).selectExpr("id AS k", "CAST(2 AS LONG) AS stamp")
    st.upsert(upd, ["k"])
    rows = {r.k: r.stamp for r in st.read().collect()}
    assert len(rows) == 12
    assert all(s == (2 if k >= 8 else 1) for k, s in rows.items())


def test_gc_retains_keep_snapshots(spark, tmp_path):
    st = PointerStore(spark, str(tmp_path / "t"), keep=3)
    for i in range(1, 8):
        st.overwrite(_stamp_df(spark, i, 5))
    snaps = st._snapshots()
    assert len(snaps) == 3
    assert st.current_snapshot() == snaps[-1]
    assert {r.stamp for r in st.read().collect()} == {7}


def test_recover_removes_debris(spark, tmp_path):
    import os

    root = str(tmp_path / "t")
    st = PointerStore(spark, root)
    st.overwrite(_stamp_df(spark, 1, 5))
    cur = st.current_snapshot()
    # simulate a died writer: complete orphan newer than pointer,
    # incomplete dir, tmp pointer
    orphan = os.path.join(root, "snap-00000099-deadbeef")
    os.makedirs(orphan)
    open(os.path.join(orphan, "_SUCCESS"), "w").close()
    half = os.path.join(root, "snap-00000098-cafebabe")
    os.makedirs(half)
    open(os.path.join(root, ".ptr-junk"), "w").close()
    removed = st.recover()
    assert sorted(removed) == [
        ".ptr-junk", "snap-00000098-cafebabe", "snap-00000099-deadbeef"
    ]
    assert st.current_snapshot() == cur
    assert st.read().count() == 5


def test_concurrent_reader_never_sees_mixed_version(spark, tmp_path):
    """A reader polling through a stream of upserts must always see one
    complete committed snapshot: constant rowcount, a single stamp value
    per read, stamps non-decreasing across reads, and never an error."""
    st = PointerStore(spark, str(tmp_path / "t"), keep=4)
    n_commits = 100
    st.overwrite(_stamp_df(spark, 0))

    errors: list[Exception] = []
    seen: list[int] = []
    done = threading.Event()

    def reader():
        last = -1
        while not done.is_set():
            try:
                rows = st.read().collect()
                stamps = {r.stamp for r in rows}
                assert len(rows) == 50, f"partial snapshot: {len(rows)} rows"
                assert len(stamps) == 1, f"mixed versions in one read: {stamps}"
                s = stamps.pop()
                assert s >= last, f"time went backwards: {s} < {last}"
                last = s
                seen.append(s)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)
                done.set()
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for i in range(1, n_commits + 1):
            # upsert-all: every committed state has exactly one stamp
            st.upsert(_stamp_df(spark, i), ["k"])
            if errors:
                break
    finally:
        done.set()
        t.join(timeout=60)
    assert not errors, errors[:3]
    assert len(seen) >= 5, "reader starved — test proved nothing"
    assert max(seen) > 0


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    """OPTIMIZE analogue: many small files -> few, same rows, committed
    as a new snapshot (old one stays live for in-flight readers until
    GC lag expires)."""
    st = PointerStore(spark, str(tmp_path / "t"))
    st.overwrite(_stamp_df(spark, 1, 1000).repartition(24))
    before_snap = st.current_snapshot()
    n_before, n_after = st.compact(target_file_mb=128)
    assert n_before >= 24 and n_after < n_before
    rows = {r.k for r in st.read().collect()}
    assert rows == set(range(1000))
    assert st.current_snapshot() != before_snap  # new snapshot, not in-place


def test_commit_meta_atomic_with_snapshot(spark, tmp_path):
    from bigquery_etl_spark.sources.pointer_store import PointerStore

    st = PointerStore(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    st.overwrite(df, meta={"batch_id": 0})
    assert st.current_meta() == {"batch_id": 0}
    # append carries its own meta; the PREVIOUS snapshot keeps its own
    st.append(df.withColumn("k", df.k + 1), meta={"batch_id": 1})
    assert st.current_meta() == {"batch_id": 1}
    # a commit without meta yields None (no stale carry-over from the
    # hard-linked prior snapshot)
    st.append(df.withColumn("k", df.k + 10))
    assert st.current_meta() is None
