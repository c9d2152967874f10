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
carry ALL columns, so nothing needs reconstruction), and — r9, closing
VERDICT r8 gap #2 — v2 merge-on-read DELETE FILES: position deletes
anti-join on (_metadata.file_path, _metadata.row_index) and equality
deletes anti-join on their equality_ids columns, both scoped by the
spec's sequence-number rules (position applies to data seq <= delete
seq; equality to data seq STRICTLY < delete seq). Tables without
deletes keep the plain zero-overhead parquet scan. Refused loudly:
non-parquet data/delete files, unsupported types. Layout per the
public Iceberg table spec (iceberg.apache.org/spec)."""

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
    snap_seq = snap.get("sequence-number", 0) or 0
    # (manifest_path, manifest_seq) pairs; v1 manifests carry seq 0
    if "manifest-list" in snap:
        mlist = _read_avro_dicts(_resolve(table_path, snap["manifest-list"]))
        manifests = [
            (
                _resolve(table_path, m["manifest_path"]),
                m.get("sequence_number")
                if m.get("sequence_number") is not None
                else snap_seq,
            )
            for m in mlist
        ]
    else:  # v1 inline manifests list
        manifests = [(_resolve(table_path, p), 0) for p in snap["manifests"]]

    data_files: list[tuple[str, int]] = []  # (path, data sequence number)
    pos_deletes: list[tuple[str, int]] = []
    eq_deletes: list[tuple[str, int, list[int]]] = []
    for mpath, mseq in manifests:
        for entry in _read_avro_dicts(mpath):
            if entry.get("status", 1) == 2:  # DELETED
                continue
            df_meta = entry["data_file"]
            d = df_meta.asDict() if hasattr(df_meta, "asDict") else dict(df_meta)
            fmt = (d.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise IcebergReadError(
                    f"Iceberg data file format {fmt!r} unsupported"
                )
            # spec inheritance: a null entry sequence number inherits
            # the manifest's (which inherited the snapshot's on commit)
            seq = entry.get("sequence_number")
            if seq is None:
                seq = mseq
            path = _resolve(table_path, d["file_path"])
            content = d.get("content", 0) or 0
            if content == 0:
                data_files.append((path, int(seq)))
            elif content == 1:  # position deletes
                pos_deletes.append((path, int(seq)))
            elif content == 2:  # equality deletes
                ids = d.get("equality_ids") or []
                if not ids:
                    raise IcebergReadError(
                        "equality delete file without equality_ids"
                    )
                eq_deletes.append((path, int(seq), [int(i) for i in ids]))
            else:
                raise IcebergReadError(
                    f"Iceberg data_file content {content} unsupported"
                )
    if not data_files:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(*[p for p, _ in data_files])
    if not pos_deletes and not eq_deletes:
        return df
    return _apply_deletes(
        spark, df, schema, schema_json, table_path,
        data_files, pos_deletes, eq_deletes,
    )


def _norm_path(col):
    """Normalize 'file:///x', 'file:/x' and '/x' spellings so delete
    file_path references match Spark's _metadata.file_path URIs."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, "^file:/+", "/")


def _apply_deletes(
    spark: SparkSession,
    df: DataFrame,
    schema: T.StructType,
    schema_json: dict,
    table_path: str,
    data_files: list[tuple[str, int]],
    pos_deletes: list[tuple[str, int]],
    eq_deletes: list[tuple[str, int, list[int]]],
) -> DataFrame:
    """Merge-on-read: apply v2 position/equality delete files as ANTI
    JOINS against the data scan. Each row learns its (file, ordinal)
    from Spark's hidden ``_metadata`` column — the exact position the
    spec's position deletes address — and its data sequence number from
    a broadcast (file -> seq) lookup sized by file COUNT, not rows. The
    delete sides are metadata-scale scans; the big side shuffles only
    for the anti-join hash probes (broadcast when small, which delete
    files virtually always are)."""
    from pyspark.sql import functions as F

    seq_df = F.broadcast(
        spark.createDataFrame(
            [(p.removeprefix("file:"), s) for p, s in data_files],
            "__path string, __fseq long",
        ).withColumn("__path", _norm_path(F.col("__path")))
    )
    cols = [f.name for f in schema.fields]
    work = (
        df.select(
            *cols,
            _norm_path(F.col("_metadata.file_path")).alias("__path"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        .join(seq_df, "__path", "left")
    )
    if pos_deletes:
        parts = []
        for p, dseq in pos_deletes:
            parts.append(
                spark.read.schema(
                    "file_path string, pos long"
                ).parquet(p).select(
                    _norm_path(F.col("file_path")).alias("__dpath"),
                    F.col("pos").alias("__dpos"),
                    F.lit(int(dseq)).alias("__dseq"),
                )
            )
        pos_df = parts[0]
        for extra in parts[1:]:
            pos_df = pos_df.unionByName(extra)
        work = work.join(
            F.broadcast(pos_df),
            (F.col("__path") == F.col("__dpath"))
            & (F.col("__pos") == F.col("__dpos"))
            & (F.col("__fseq") <= F.col("__dseq")),
            "left_anti",
        )
    if eq_deletes:
        id_to_name = {
            f["id"]: f["name"] for f in schema_json["fields"]
        }
        by_ids: dict[tuple[int, ...], list[tuple[str, int]]] = {}
        for p, dseq, ids in eq_deletes:
            by_ids.setdefault(tuple(ids), []).append((p, dseq))
        for ids, group in sorted(by_ids.items()):
            try:
                names = [id_to_name[i] for i in ids]
            except KeyError as e:
                raise IcebergReadError(
                    f"equality_ids reference unknown field id {e}"
                ) from None
            eq_schema = T.StructType(
                [schema[n] for n in names]
            )
            parts = []
            for p, dseq in group:
                parts.append(
                    spark.read.schema(eq_schema).parquet(p).select(
                        *[
                            F.col(n).alias(f"__d_{n}")
                            for n in names
                        ],
                        F.lit(int(dseq)).alias("__dseq"),
                    )
                )
            eq_df = parts[0]
            for extra in parts[1:]:
                eq_df = eq_df.unionByName(extra)
            cond = F.col("__fseq") < F.col("__dseq")
            for n in names:
                # null-safe equality: the spec deletes on value match,
                # and a NULL key in the delete row matches NULL data
                cond = cond & F.col(n).eqNullSafe(F.col(f"__d_{n}"))
            work = work.join(F.broadcast(eq_df), cond, "left_anti")
    return work.select(*cols)
