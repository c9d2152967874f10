"""Pure-Python Delta Lake READER (r8) — the interop complement to
``VersionedTable.export_snapshot``'s ``_delta_log`` writer (r7).

Opens a Delta table directory with zero jars: the transaction log is
JSON lines (protocol / metaData / add / remove actions), checkpoints
are plain parquet, and ``schemaString`` IS Spark's own schema JSON — so
replaying the log needs nothing but the filesystem, and the DATA reads
through the ordinary JVM parquet scan (explicit file list + explicit
schema → full pushdown/pruning, the same hot path as
``VersionedTable.read``). Partitioned tables reconstruct their
partition columns from each add-action's ``partitionValues`` (Delta
does not store partition columns in the data files), grouped so one
``spark.read`` happens per distinct partition tuple.

Supported: reader protocol 1 (plus protocol-2-with-no-invariants logs,
which read identically), JSON commits, ``_last_checkpoint`` + parquet
checkpoints (single-file; multi-part checkpoints refuse loudly),
``versionAsOf`` time travel. Deletion vectors / column mapping refuse
loudly — a wrong read is worse than no read.

Cited shape: Delta transaction log protocol (public spec at
delta.io); the action vocabulary here is the minimal subset the
protocol guarantees for reader v1.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DeltaReadError(ValueError):
    pass


def _log_entries(log_dir: str) -> list[tuple[int, str]]:
    out = []
    for name in os.listdir(log_dir):
        m = re.match(r"^(\d{20})\.json$", name)
        if m:
            out.append((int(m.group(1)), os.path.join(log_dir, name)))
    return sorted(out)


def _checkpoint_for(log_dir: str, up_to: int) -> tuple[int, str] | None:
    """The newest single-file checkpoint at or below ``up_to``."""
    best: tuple[int, str] | None = None
    for name in os.listdir(log_dir):
        m = re.match(r"^(\d{20})\.checkpoint\.parquet$", name)
        if m and int(m.group(1)) <= up_to:
            v = int(m.group(1))
            if best is None or v > best[0]:
                best = (v, os.path.join(log_dir, name))
        elif re.match(r"^\d{20}\.checkpoint\.\d+\.\d+\.parquet$", name):
            raise DeltaReadError(
                "multi-part Delta checkpoints are unsupported (single-file "
                "checkpoints and JSON commits read fine)"
            )
    return best


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Open a Delta table as a DataFrame at ``version`` (default: the
    latest committed version)."""
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise DeltaReadError(f"{path}: no _delta_log directory")
    entries = _log_entries(log_dir)
    ckpt = _checkpoint_for(
        log_dir, version if version is not None else 1 << 62
    )
    if not entries and ckpt is None:
        raise DeltaReadError(f"{path}: empty Delta log")
    latest = max(
        [v for v, _ in entries] + ([ckpt[0]] if ckpt else [])
    )
    v = latest if version is None else version
    if version is not None and version > latest:
        raise DeltaReadError(
            f"{path}: version {version} > latest committed {latest}"
        )

    live: dict[str, dict] = {}  # path -> add action
    meta: dict | None = None
    protocol_checked = False

    def _apply(action: dict) -> None:
        nonlocal meta, protocol_checked
        if "protocol" in action:
            p = action["protocol"]
            if p.get("minReaderVersion", 1) > 2:
                raise DeltaReadError(
                    f"Delta minReaderVersion {p['minReaderVersion']} "
                    "unsupported (reader 1/2 logs only)"
                )
            protocol_checked = True
        elif "metaData" in action:
            meta = action["metaData"]
            fmt = meta.get("format", {}).get("provider", "parquet")
            if fmt != "parquet":
                raise DeltaReadError(f"Delta format {fmt!r} unsupported")
            conf = meta.get("configuration", {}) or {}
            if conf.get("delta.columnMapping.mode", "none") != "none":
                raise DeltaReadError("Delta column mapping unsupported")
        elif "add" in action:
            a = action["add"]
            if a.get("deletionVector"):
                raise DeltaReadError("Delta deletion vectors unsupported")
            live[a["path"]] = a
        elif "remove" in action:
            live.pop(action["remove"]["path"], None)

    if ckpt is not None and (version is None or ckpt[0] <= v):
        for row in spark.read.parquet(ckpt[1]).collect():
            d = row.asDict(recursive=True)
            for key in ("protocol", "metaData", "add", "remove"):
                if d.get(key) is not None:
                    _apply({key: d[key]})
        start = ckpt[0] + 1
    else:
        start = 0
    # Commit versions must be CONTIGUOUS from the checkpoint (or 0) up
    # to the requested version — a missing/cleaned intermediate commit
    # silently skipped would yield a stale or inconsistent snapshot.
    expected = start
    for ver, fp in entries:
        if ver < start or ver > v:
            continue
        if ver != expected:
            raise DeltaReadError(
                f"{path}: Delta log gap — expected commit {expected:020d}"
                f".json, found {ver:020d}.json (log cleaned past the "
                "newest checkpoint?)"
            )
        expected = ver + 1
        with open(fp) as f:
            for line in f:
                if line.strip():
                    _apply(json.loads(line))
    if expected <= v and expected > start:
        raise DeltaReadError(
            f"{path}: Delta log ends at commit {expected - 1} but "
            f"version {v} was requested"
        )
    if meta is None:
        raise DeltaReadError(f"{path}: no metaData action in the log")
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns", []) or []
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    if not live:
        return spark.createDataFrame([], schema)
    if not part_cols:
        files = [os.path.join(path, p) for p in live]
        return spark.read.schema(data_schema).parquet(*files)
    # partition columns live in the log, not the files: one read per
    # distinct partition tuple, partition values re-attached as typed
    # literal columns (cast through the declared schema)
    by_vals: dict[tuple, list[str]] = {}
    for p, a in live.items():
        key = tuple(
            (a.get("partitionValues", {}) or {}).get(c) for c in part_cols
        )
        by_vals.setdefault(key, []).append(os.path.join(path, p))
    parts = []
    for vals, files in sorted(by_vals.items()):
        df = spark.read.schema(data_schema).parquet(*files)
        for c, raw in zip(part_cols, vals):
            typ = schema[c].dataType
            df = df.withColumn(
                c,
                (F.lit(None) if raw is None else F.lit(raw)).cast(typ),
            )
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out
