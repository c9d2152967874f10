"""Pointer-committed parquet snapshots: concurrent-reader-safe upserts
without table-format jars.

The staged-swap protocol in ``operators.merge.merge_upsert`` is crash-
recoverable but NOT safe for concurrent readers: between its two
renames the table path briefly does not exist, and a reader that
resolved the old directory listing can observe files vanishing under
it. This store closes that window — the one piece of the Delta/Iceberg
story a plain filesystem can express (ref bug class: the reference
loads + advances its cursor non-atomically, main.py:209-216):

Layout::

    <root>/_current                    pointer file: name of live snapshot
    <root>/snap-<seq>-<uuid>/part-*.parquet   immutable snapshot dirs

- **Read** resolves the pointer (one small file read), then scans that
  snapshot dir. Snapshot dirs are immutable, so a read is consistent
  even if a commit lands mid-scan.
- **Commit** writes a complete new snapshot dir (Spark ``_SUCCESS``
  marker = complete), then atomically replaces the pointer
  (``os.replace`` — readers see the old or the new name, never a torn
  value, never a missing table).
- **GC** keeps the ``keep`` most recent snapshots, so a reader that
  resolved the pointer just before a commit keeps a live directory for
  ``keep-1`` further commits (lag tolerance; object-store deployments
  would use time-based retention like Delta's VACUUM).
- **Crash windows**: a died writer leaves either an incomplete snapshot
  dir (no ``_SUCCESS``) or a complete-but-unreferenced one; neither is
  reachable via the pointer, so readers are unaffected. ``recover()``
  deletes them. A torn pointer write is impossible (tmp + fsync +
  atomic replace).

Single-writer, like the reference's deployment (ref app.yaml:14-15);
for multi-writer optimistic concurrency, use ``VersionedTable``'s
put-if-absent manifest protocol instead.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class PointerStore:
    def __init__(self, spark: SparkSession, root: str, keep: int = 4):
        if keep < 2:
            raise ValueError("keep must be >= 2 (current + reader lag)")
        self.spark = spark
        self.root = root
        self.keep = keep
        self._pointer = os.path.join(root, "_current")

    # -- pointer resolution --------------------------------------------------

    def current_snapshot(self) -> str | None:
        """Name of the live snapshot dir, or None for an empty table."""
        try:
            with open(self._pointer) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _seq(self, snap: str) -> int:
        return int(snap.split("-")[1])

    def _snapshots(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            (n for n in os.listdir(self.root) if n.startswith("snap-")),
            key=self._seq,
        )

    # -- read path -----------------------------------------------------------

    def read(self) -> DataFrame:
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"{self.root}: empty table")
        path = os.path.join(self.root, snap)
        schema = self._snapshot_schema(snap)
        if schema is not None:
            # explicit schema: files missing an evolved column null-fill
            # it; never depends on WHICH footer the reader samples
            return self.spark.read.schema(schema).parquet(path)
        return self.spark.read.parquet(path)

    def _snapshot_schema(self, snap: str):
        """The snapshot's committed schema (sidecar `_schema.json`), or
        None for pre-evolution snapshots (single-schema by the append
        check, so footer inference is safe there)."""
        from pyspark.sql.types import StructType

        sidecar = os.path.join(self.root, snap, "_schema.json")
        if os.path.exists(sidecar):
            import json

            with open(sidecar) as f:
                return StructType.fromJson(json.load(f))
        return None

    def _write_schema(self, snap_path: str, schema) -> None:
        with open(os.path.join(snap_path, "_schema.json"), "w") as f:
            f.write(schema.json())

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    def current_meta(self) -> dict | None:
        """Commit metadata of the live snapshot (``meta=`` passed to
        overwrite/append), or None. Because the meta sidecar is written
        into the snapshot dir BEFORE the pointer flip, data and meta
        commit atomically — the epoch-fencing hook for transactional
        foreachBatch sinks (read the committed batch id, skip replays)."""
        snap = self.current_snapshot()
        if snap is None:
            return None
        path = os.path.join(self.root, snap, "_meta.json")
        if not os.path.exists(path):
            return None
        import json

        with open(path) as f:
            return json.load(f)

    def _write_meta(self, snap_path: str, meta: dict | None) -> None:
        if meta is not None:
            import json

            with open(os.path.join(snap_path, "_meta.json"), "w") as f:
                json.dump(meta, f)

    # -- commit protocol -----------------------------------------------------

    def _commit(self, df: DataFrame, meta: dict | None = None) -> str:
        os.makedirs(self.root, exist_ok=True)
        cur = self.current_snapshot()
        seq = (self._seq(cur) + 1) if cur else 1
        snap = f"snap-{seq:08d}-{uuid.uuid4().hex[:8]}"
        df.write.parquet(os.path.join(self.root, snap))
        self._write_schema(os.path.join(self.root, snap), df.schema)
        self._write_meta(os.path.join(self.root, snap), meta)
        return self._flip_pointer(snap)

    def _flip_pointer(self, snap: str) -> str:
        """Atomic pointer replace — THE commit point (tmp + fsync +
        os.replace, so readers see old or new, never torn/missing) —
        followed by GC. Shared by _commit and append: the commit
        protocol must exist exactly once."""
        tmp = os.path.join(self.root, f".ptr-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(snap)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer)
        self._gc(snap)
        return snap

    def _gc(self, current: str) -> None:
        """Delete all but the ``keep`` newest snapshots. The current
        snapshot is always among the survivors (it is the newest)."""
        snaps = self._snapshots()
        for snap in snaps[: max(0, len(snaps) - self.keep)]:
            if snap != current:
                shutil.rmtree(os.path.join(self.root, snap), ignore_errors=True)

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> str:
        return self._commit(df, meta)

    def append(
        self, df: DataFrame, evolve: bool = False, meta: dict | None = None
    ) -> str:
        """O(new data) append: the new snapshot directory hard-links the
        current snapshot's parquet files (a metadata op per FILE, no
        data copied or rewritten) and adds freshly written part files
        for ``df``. This is the filesystem-native version of a
        table-format ADD-FILES commit — without it, every commit
        rewrites the whole table, which is absurd at 100 TB for an
        append-mostly corpus. Old snapshots stay valid (hard links
        share inodes; GC's rmtree just drops link counts).

        ``df``'s columns must match the stored table (name + type,
        order-insensitive) unless ``evolve=True``, which unions the
        schemas (added/removed nullable columns OK; TYPE conflicts on a
        shared name always raise). Enforced HERE, loudly: parquet reads
        sample ONE footer for the schema, so a mixed-schema snapshot
        silently drops or null-fills columns depending on which file
        gets sampled. Every commit stores its schema as a
        ``_schema.json`` sidecar and read() applies it explicitly, so
        evolved snapshots read deterministically (Delta-style schema
        tracking, filesystem edition); each snapshot keeps ITS schema —
        time-travel reads of old snapshots are unaffected."""
        cur = self.current_snapshot()
        if cur is None:
            return self._commit(df, meta)
        stored = self._snapshot_schema(cur) or self.spark.read.parquet(
            os.path.join(self.root, cur)
        ).schema
        ours = {f.name: f.dataType for f in df.schema.fields}
        theirs = {f.name: f.dataType for f in stored.fields}
        conflicts = sorted(
            n for n in ours.keys() & theirs.keys() if ours[n] != theirs[n]
        )
        if conflicts:
            raise ValueError(
                f"append type conflict on {conflicts}: "
                f"new {[(n, str(ours[n])) for n in conflicts]} vs "
                f"stored {[(n, str(theirs[n])) for n in conflicts]}"
            )
        snap_schema = stored
        if ours.keys() != theirs.keys():
            if not evolve:
                raise ValueError(
                    f"append schema mismatch: new-only "
                    f"{sorted(ours.keys() - theirs.keys())}, missing "
                    f"{sorted(theirs.keys() - ours.keys())} "
                    f"(pass evolve=True to union the schemas)"
                )
            # evolved schema = stored order + new-only columns appended;
            # files on either side null-fill what they lack (read() uses
            # the sidecar schema explicitly, never a sampled footer)
            from pyspark.sql.types import StructField, StructType

            snap_schema = StructType(
                list(stored.fields)
                + [
                    StructField(f.name, f.dataType, True)
                    for f in df.schema.fields
                    if f.name not in theirs
                ]
            )
        os.makedirs(self.root, exist_ok=True)
        staging = os.path.join(self.root, f".append-{uuid.uuid4().hex}")
        df.write.parquet(staging)  # _SUCCESS marks the write complete

        seq = self._seq(cur) + 1
        snap = f"snap-{seq:08d}-{uuid.uuid4().hex[:8]}"
        snap_path = os.path.join(self.root, snap)
        os.makedirs(snap_path)
        cur_path = os.path.join(self.root, cur)
        for name in os.listdir(cur_path):
            if name.endswith(".parquet"):
                os.link(os.path.join(cur_path, name), os.path.join(snap_path, name))
        for name in os.listdir(staging):
            if name.endswith(".parquet"):
                # seq prefix guarantees no collision with linked names
                os.link(
                    os.path.join(staging, name),
                    os.path.join(snap_path, f"add-{seq:08d}-{name}"),
                )
        self._write_schema(snap_path, snap_schema)
        self._write_meta(snap_path, meta)
        open(os.path.join(snap_path, "_SUCCESS"), "w").close()
        self._flip_pointer(snap)
        shutil.rmtree(staging, ignore_errors=True)
        return snap

    def upsert(self, updates: DataFrame, keys: list[str]) -> str:
        """MERGE: same-key rows replaced, others carried forward; one
        anti-join shuffle on the keys plus the snapshot write — same
        scale profile as merge_upsert, plus reader safety."""
        from bigquery_etl_spark.operators.merge import upsert_dataframe

        if self.exists():
            merged = upsert_dataframe(self.read(), updates, keys)
        else:
            merged = updates
        return self._commit(merged)

    # -- maintenance ---------------------------------------------------------

    def compact(self, target_file_mb: int = 128) -> tuple[int, int]:
        """Reader-safe small-file compaction (the OPTIMIZE analogue):
        rewrite the live snapshot into ~target-sized files as a NEW
        snapshot and flip the pointer. Unlike
        ``operators.layout.compact_parquet_dir`` (bare directories,
        single writer, brief not-exists window), readers mid-scan keep
        their immutable old snapshot. Returns (files_before, after).

        Streaming sinks drip micro-batch-sized files; each costs a task
        + footer read per query. Run this on a maintenance cadence."""
        import math

        from bigquery_etl_spark.operators.layout import dir_file_stats

        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"{self.root}: empty table")
        path = os.path.join(self.root, snap)
        n_before, total = dir_file_stats(path)
        n_target = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
        # coalesce, not repartition: no shuffle, preserves row order
        new = self._commit(self.spark.read.parquet(path).coalesce(n_target))
        return n_before, dir_file_stats(os.path.join(self.root, new))[0]

    def recover(self) -> list[str]:
        """Remove crash debris: tmp pointer files, incomplete snapshot
        dirs (no _SUCCESS), and complete-but-never-committed dirs newer
        than the pointer. Returns removed names. The pointer itself is
        never touched — the committed snapshot stays live throughout."""
        removed = []
        if not os.path.isdir(self.root):
            return removed
        cur = self.current_snapshot()
        cur_seq = self._seq(cur) if cur else 0
        for name in os.listdir(self.root):
            full = os.path.join(self.root, name)
            if name.startswith(".ptr-"):
                os.unlink(full)
                removed.append(name)
            elif name.startswith(".append-"):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(name)
            elif name.startswith("snap-") and name != cur:
                incomplete = not os.path.exists(os.path.join(full, "_SUCCESS"))
                orphan = self._seq(name) > cur_seq
                if incomplete or orphan:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(name)
        return removed
