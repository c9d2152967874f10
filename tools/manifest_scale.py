"""Measure the r7 O(change) commit protocol at 100k-file table size
(VERDICT r6 "Next round" #2 done-criterion).

Fabricates a VersionedTable whose checkpoint manifest references 100k
synthetic file entries (commits are manifest-level; no data I/O is
needed to measure the protocol), then measures:

- per-APPEND commit cost + manifest bytes (must be O(new files) and
  FLAT in table size — the old protocol serialized all 100k entries
  per append);
- the forced CHECKPOINT cost at the same size (the O(table) write the
  protocol now pays once per CHECKPOINT_EVERY commits instead of every
  commit);
- cold resolver cost (checkpoint + max-length delta tail replay).

Usage: python tools/manifest_scale.py [--files 100000] [--appends 25]
Prints one JSON line per phase; paste the summary into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_entries(n: int, start: int = 0) -> list[dict]:
    return [
        {
            "path": f"data/synth/{start + i:08d}.parquet",
            "rows": 1000,
            "bytes": 128 * 1024 * 1024,
            "stats": {"id": [start + i, start + i + 999]},
        }
        for i in range(n)
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100_000)
    ap.add_argument("--appends", type=int, default=25)
    ap.add_argument("--per-append", type=int, default=8)
    args = ap.parse_args()

    from bigquery_etl_spark.sources import versioned
    from bigquery_etl_spark.sources.versioned import VersionedTable

    root = tempfile.mkdtemp(prefix="manifest_scale_")
    try:
        tbl = VersionedTable(spark=None, root=root)  # manifest ops only
        schema = json.dumps({"type": "struct", "fields": []})

        t0 = time.perf_counter()
        tbl._commit("create", synth_entries(args.files), schema)
        create_sec = time.perf_counter() - t0
        ckpt_bytes = os.path.getsize(tbl._manifest_path(1))
        print(json.dumps({
            "phase": "checkpoint_write", "n_files": args.files,
            "sec": round(create_sec, 4), "manifest_bytes": ckpt_bytes,
        }))

        times, sizes = [], []
        nxt = args.files
        for i in range(args.appends):
            add = synth_entries(args.per_append, start=nxt)
            nxt += args.per_append
            t0 = time.perf_counter()
            v = tbl._commit("append", add, schema)
            times.append(time.perf_counter() - t0)
            m = tbl._load_manifest(v)
            sizes.append(
                (os.path.getsize(tbl._manifest_path(v)),
                 m.get("files") is not None)
            )
        delta_sizes = [s for s, full in sizes if not full]
        full_sizes = [s for s, full in sizes if full]
        print(json.dumps({
            "phase": "appends", "n": args.appends,
            "files_per_append": args.per_append,
            "delta_manifest_bytes_max": max(delta_sizes),
            "append_sec_median": round(sorted(times)[len(times) // 2], 5),
            "append_sec_max": round(max(times), 5),
            "periodic_checkpoints": len(full_sizes),
            "checkpoint_bytes": full_sizes,
            "ratio_ckpt_to_delta_bytes": round(
                ckpt_bytes / max(delta_sizes), 1
            ),
        }))

        versioned._FILES_CACHE.clear()
        t0 = time.perf_counter()
        n_live = len(tbl._files(tbl.latest_version()))
        cold_sec = time.perf_counter() - t0
        versioned._FILES_CACHE.clear()
        # worst-case tail: resolve the version just before a checkpoint
        worst_v = None
        for v in range(tbl.latest_version(), 1, -1):
            if tbl._load_manifest(v).get("files") is None:
                worst_v = v
                break
        t0 = time.perf_counter()
        tbl._files(worst_v)
        tail_sec = time.perf_counter() - t0
        print(json.dumps({
            "phase": "cold_resolve", "live_files": n_live,
            "latest_sec": round(cold_sec, 4),
            "delta_tail_sec": round(tail_sec, 4),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
