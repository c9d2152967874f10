"""Pure-Python Apache Iceberg READER (r8) — open an Iceberg v1/v2
table with zero jars, the third leg of the interop bridge (r7 exported
Delta logs, r8 reads them back; this reads the other mainstream table
format).

Everything needed is already in the tree: Iceberg's metadata is JSON,
its manifest lists and manifests are Avro OCF — which avro_py decodes
spec-level — and the data files are parquet read through the ordinary
JVM scan with an explicit file list + schema (full pushdown/pruning,
the same hot path as VersionedTable.read). Manifests are driver-side
decodes: they are METADATA, sized in KBs per snapshot — the data scan
stays distributed.

Supported: format-version 1 and 2, parquet data files,
``version-hint.text`` or newest ``*.metadata.json`` discovery,
``snapshot_id`` time travel, identity partitioning (Iceberg data files
carry ALL columns, so nothing needs reconstruction). Refused loudly:
v2 delete files (merge-on-read tables need compaction first),
non-parquet data files, unsupported types. Layout per the public
Iceberg table spec (iceberg.apache.org/spec)."""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class IcebergReadError(ValueError):
    pass


def _read_avro_dicts(path: str) -> list[dict]:
    """Driver-side decode of one Avro OCF file into plain dicts
    (avro_py internals — manifests are small metadata files)."""
    from bigquery_etl_spark.sources.avro_py import (
        CODECS,
        _decoder,
        _r_long,
        _read_header,
        _spark_type,
    )

    with open(path, "rb") as fh:
        mv = memoryview(fh.read())
    meta, sync, pos = _read_header(mv)
    schema, _ = _spark_type(json.loads(meta["avro.schema"].decode()))
    codec = (meta.get("avro.codec", b"null") or b"null").decode()
    if codec not in CODECS:
        raise IcebergReadError(f"manifest avro codec {codec!r} unsupported")
    decs = [(f.name, _decoder(f.dataType, f.nullable)) for f in schema.fields]
    rows: list[dict] = []
    n_total = len(mv)
    while pos < n_total:
        n, pos = _r_long(mv, pos)
        size, pos = _r_long(mv, pos)
        block = mv[pos : pos + size]
        pos += size
        if codec != "null":
            block = memoryview(CODECS[codec][1](bytes(block)))
        bpos = 0
        for _ in range(n):
            row = {}
            for name, dec in decs:
                row[name], bpos = dec(block, bpos)
            rows.append(row)
        pos += 16  # sync marker
    return rows


_PRIMS = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
}


def _iceberg_type(t) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIMS:
            return _PRIMS[t]
        if t.startswith("decimal("):
            p, s = t[8:-1].split(",")
            return T.DecimalType(int(p), int(s))
        if t.startswith("fixed["):
            return T.BinaryType()
        raise IcebergReadError(f"Iceberg type {t!r} unsupported")
    kind = t.get("type")
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _iceberg_type(f["type"]),
                    not f.get("required", False),
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return T.ArrayType(
            _iceberg_type(t["element"]),
            not t.get("element-required", False),
        )
    if kind == "map":
        return T.MapType(
            _iceberg_type(t["key"]),
            _iceberg_type(t["value"]),
            not t.get("value-required", False),
        )
    raise IcebergReadError(f"Iceberg type {t!r} unsupported")


def _latest_metadata(table_path: str) -> str:
    mdir = os.path.join(table_path, "metadata")
    if not os.path.isdir(mdir):
        raise IcebergReadError(f"{table_path}: no metadata directory")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        for cand in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            p = os.path.join(mdir, cand)
            if os.path.exists(p):
                return p
    # Sort NUMERICALLY, not lexicographically: v9.metadata.json would
    # otherwise sort after v10.metadata.json and open a stale snapshot.
    # Handles both vN.metadata.json and NNNNN-uuid.metadata.json names.
    def _version_key(name: str) -> tuple[int, str]:
        m = re.match(r"^v?(\d+)", name)
        return (int(m.group(1)) if m else -1, name)

    cands = [n for n in os.listdir(mdir) if n.endswith(".metadata.json")]
    if not cands:
        raise IcebergReadError(f"{table_path}: no *.metadata.json")
    return os.path.join(mdir, max(cands, key=_version_key))


def _resolve(table_path: str, p: str) -> str:
    p = p.removeprefix("file:")
    if os.path.isabs(p):
        return p
    return os.path.join(table_path, p)


def read_iceberg(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Open an Iceberg table directory as a DataFrame at
    ``snapshot_id`` (default: the current snapshot)."""
    with open(_latest_metadata(table_path)) as f:
        meta = json.load(f)
    fv = meta.get("format-version", 1)
    if fv not in (1, 2):
        raise IcebergReadError(f"Iceberg format-version {fv} unsupported")
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        schema_json = next(
            s for s in meta["schemas"] if s.get("schema-id", 0) == sid
        )
    else:
        schema_json = meta["schema"]
    schema = _iceberg_type(schema_json)
    snaps = meta.get("snapshots", [])
    if not snaps:
        return spark.createDataFrame([], schema)
    sid = (
        snapshot_id
        if snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    snap = next(
        (s for s in snaps if s.get("snapshot-id") == sid), None
    )
    if snap is None:
        raise IcebergReadError(
            f"{table_path}: snapshot {sid} not found "
            f"(have {[s.get('snapshot-id') for s in snaps]})"
        )
    files: list[str] = []
    if "manifest-list" in snap:
        mlist = _read_avro_dicts(_resolve(table_path, snap["manifest-list"]))
        manifests = []
        for m in mlist:
            if m.get("content", 0) not in (0, None):
                raise IcebergReadError(
                    "v2 DELETE manifests present — merge-on-read tables "
                    "must be compacted before this reader opens them"
                )
            manifests.append(_resolve(table_path, m["manifest_path"]))
    else:  # v1 inline manifests list
        manifests = [_resolve(table_path, p) for p in snap["manifests"]]
    for mpath in manifests:
        for entry in _read_avro_dicts(mpath):
            if entry.get("status", 1) == 2:  # DELETED
                continue
            df_meta = entry["data_file"]
            d = df_meta.asDict() if hasattr(df_meta, "asDict") else dict(df_meta)
            if d.get("content", 0) not in (0, None):
                raise IcebergReadError(
                    "v2 delete files present — compact before reading"
                )
            fmt = (d.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise IcebergReadError(
                    f"Iceberg data file format {fmt!r} unsupported"
                )
            files.append(_resolve(table_path, d["file_path"]))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)
