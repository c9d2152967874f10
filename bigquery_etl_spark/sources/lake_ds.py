"""`versioned_lake` — the VersionedTable manifest store mounted as a
Spark 4 Python Data Source WITH FILTER-PUSHDOWN FILE SKIPPING.

``VersionedTable.read(prune=...)`` skips files from manifest min/max
stats, but the caller must thread the predicate by hand.  Mounting the
manifest as a data source moves that decision into query planning:

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedLakeDataSource)
    (spark.read.format("versioned_lake")
          .option("path", root).option("version", 3)   # version optional
          .load()
          .where("ts >= 100 AND ts < 200"))            # ← prunes files

Catalyst hands the conjuncts to ``pushFilters`` (Spark 4.1 Python
Data Source API); every file whose stats interval is provably disjoint
from a pushed range never becomes an InputPartition — the executor
never opens it.  All filters are RETURNED to Spark for post-scan
evaluation (min/max skipping is sound but not exact), so semantics are
identical with or without stats.

This is the Delta/Iceberg data-skipping design re-expressed in the
public Python DataSource API: planning reads ONE manifest (no object
listing), partitions = surviving files, and each partition streams
Arrow record batches.  Schema evolution (versioned.add_columns /
append-merge) is honored: files older than a column yield typed NULL
arrays for it, exactly like the explicit-schema JVM read path.

At 100 TB the JVM parquet scan (``VersionedTable.read``) remains the
hot path — this source trades scan throughput (Python/Arrow bridge)
for planner-integrated skipping, which wins precisely when predicates
kill most files (incremental loads keyed on monotonic ids/timestamps,
the reference's cursor pattern, ref main.py:197-216).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _latest_version(root: str) -> int:
    mdir = os.path.join(root, "_manifests")
    versions = [
        int(f[1:9])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    if not versions:
        raise FileNotFoundError(f"{root}: empty versioned table")
    return max(versions)


def _load_manifest(root: str, version: int | None) -> dict:
    if version is None:
        version = _latest_version(root)
    with open(os.path.join(root, "_manifests", f"v{version:08d}.json")) as f:
        return json.load(f)


def _manifest_files(root: str, manifest: dict) -> list[dict]:
    """Live file entries under the r7 O(change) log protocol: full
    ``files`` when the manifest is a checkpoint, else checkpoint +
    delta-tail replay (sources/versioned.py resolve_manifest_files)."""
    from bigquery_etl_spark.sources.versioned import resolve_manifest_files

    return resolve_manifest_files(manifest, lambda v: _load_manifest(root, v))


def _file_survives(entry: dict, filters: list[Filter]) -> bool:
    """False only if some pushed filter is provably disjoint from the
    file's [min, max] interval — absent stats always survive."""
    for flt in filters:
        st = entry.get("stats", {}).get(flt.attribute[0])
        if st is None:
            continue
        lo, hi = st
        try:
            if not _disjoint(flt, lo, hi):
                continue
        except TypeError:  # incomparable literal vs footer stats type
            continue
        return False
    return True


def _disjoint(flt: Filter, lo, hi) -> bool:
    """True iff the filter can match NOTHING inside [lo, hi]."""
    if isinstance(flt, EqualTo):
        return flt.value < lo or flt.value > hi
    if isinstance(flt, GreaterThan):
        return hi <= flt.value
    if isinstance(flt, GreaterThanOrEqual):
        return hi < flt.value
    if isinstance(flt, LessThan):
        return lo >= flt.value
    if isinstance(flt, LessThanOrEqual):
        return lo > flt.value
    if isinstance(flt, In):
        return all(v < lo or v > hi for v in flt.value)
    return False


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


_PRUNABLE = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In)


class VersionedLakeReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.root = options["path"]
        v = options.get("version")
        self.manifest = _load_manifest(self.root, int(v) if v is not None else None)
        self.schema = schema
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:  # noqa: F821
        """Record single-column comparisons on stats columns for file
        skipping; hand EVERY filter back for exact post-scan eval."""
        for flt in filters:
            if (
                isinstance(flt, _PRUNABLE)
                and len(flt.attribute) == 1
                and not isinstance(flt.value, (list, dict))
            ):
                self.pushed.append(flt)
        return filters  # min/max skipping is conservative, never exact

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _FilePartition(os.path.join(self.root, e["path"]))
            for e in _manifest_files(self.root, self.manifest)
            if _file_survives(e, self.pushed)
        ]

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        present = set(pq.read_schema(partition.path).names)
        tbl = pq.read_table(
            partition.path,
            columns=[f.name for f in self.schema.fields if f.name in present],
        )
        cols = []
        for f in self.schema.fields:
            at = to_arrow_type(f.dataType)
            if f.name in tbl.schema.names:
                cols.append(tbl.column(f.name).cast(at))
            else:  # schema evolution: column younger than this file
                cols.append(pa.nulls(tbl.num_rows, type=at))
        yield from pa.table(cols, names=[f.name for f in self.schema.fields]).to_batches()


def _opt(options: dict, name: str, default=None):
    """Python DataSource options arrive through a case-insensitive map
    whose exact casing differs by call path — accept both spellings."""
    v = options.get(name)
    if v is None:
        v = options.get(name.lower())
    return default if v is None else v


CHANGE_FIELDS = [
    StructField("_change_type", StringType(), False),
    StructField("_commit_version", LongType(), False),
]


def _change_schema(root: str, version: int) -> StructType:
    m = _load_manifest(root, version)
    base = StructType.fromJson(json.loads(m["schema"]))
    return StructType(list(base.fields) + CHANGE_FIELDS)


class _ChangePartition(InputPartition):
    """One CDF parquet file (or one appended data file) of one commit.
    ``const_type`` is set for append/create files (every row is an
    insert); None means the file carries its own ``_change_type``
    column (write-time captured diff)."""

    def __init__(self, path: str | None, version: int, const_type: str | None):
        self.path = path
        self.version = version
        self.const_type = const_type


def _change_partitions(root: str, v_lo: int, v_hi: int) -> list[_ChangePartition]:
    """Plan file partitions for commits v_lo..v_hi inclusive — manifest
    reads only, no data I/O, no join: appends contribute their added
    files as inserts, rewrites contribute their captured ``_changes``
    files, metadata-only commits contribute nothing."""
    from bigquery_etl_spark.sources.versioned import ChangeFeedUnavailable

    parts: list[_ChangePartition] = []
    for v in range(v_lo, v_hi + 1):
        m = _load_manifest(root, v)
        if m["kind"] in ("create", "append"):
            if m.get("log") is not None:  # r7 delta manifest: the
                added = m["log"]["add"]  # added set IS the log
            else:
                parent_paths = (
                    {
                        e["path"]
                        for e in _manifest_files(
                            root, _load_manifest(root, m["parent"])
                        )
                    }
                    if m.get("parent")
                    else set()
                )
                added = [
                    e for e in m["files"] if e["path"] not in parent_paths
                ]
            parts.extend(
                _ChangePartition(os.path.join(root, e["path"]), v, "insert")
                for e in added
            )
        elif m.get("changes") is not None:
            parts.extend(
                _ChangePartition(os.path.join(root, e["path"]), v, None)
                for e in m["changes"]
            )
        elif m["kind"] != "alter":
            raise ChangeFeedUnavailable(
                f"{root}: v{v} is a {m['kind']} commit with no captured "
                "change set (enable_change_feed was off when it committed)"
            )
    return parts


def _read_change_partition(partition: _ChangePartition, schema: StructType):
    """Executor-side: stream one change file as Arrow batches padded to
    the stream schema (older files NULL-fill younger columns, exactly
    like the snapshot reader)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type

    if partition.path is None:  # planner sentinel for an empty range
        return
    present = set(pq.read_schema(partition.path).names)
    table_fields = [f for f in schema.fields if f.name not in
                    ("_change_type", "_commit_version")]
    tbl = pq.read_table(
        partition.path,
        columns=[f.name for f in table_fields if f.name in present]
        + (["_change_type"] if partition.const_type is None else []),
    )
    cols = []
    for f in table_fields:
        at = to_arrow_type(f.dataType)
        if f.name in tbl.schema.names:
            cols.append(tbl.column(f.name).cast(at))
        else:
            cols.append(pa.nulls(tbl.num_rows, type=at))
    n = tbl.num_rows
    if partition.const_type is not None:
        ct = pa.chunked_array([pa.array([partition.const_type] * n)])
    else:
        ct = tbl.column("_change_type").cast(pa.string())
    cols.append(ct)
    cols.append(pa.chunked_array([pa.array([partition.version] * n, type=pa.int64())]))
    yield from pa.table(
        cols, names=[f.name for f in table_fields] + ["_change_type", "_commit_version"]
    ).to_batches()


class VersionedLakeChangesBatchReader(DataSourceReader):
    """Batch ``readChangeFeed``: options startingVersion (default 1),
    endingVersion (default latest)."""

    def __init__(self, options: dict, schema: StructType):
        self.root = _opt(options, "path")
        self.schema = schema
        self.v_lo = int(_opt(options, "startingVersion", 1))
        self.v_hi = int(_opt(options, "endingVersion", _latest_version(self.root)))

    def partitions(self) -> Sequence[InputPartition]:
        return _change_partitions(self.root, self.v_lo, self.v_hi) or [
            _ChangePartition(None, 0, None)
        ]

    def read(self, partition: _ChangePartition):
        yield from _read_change_partition(partition, self.schema)


class VersionedLakeStreamReader(DataSourceStreamReader):
    """Streaming change feed: offsets are TABLE VERSIONS; each
    micro-batch is the change rows of the commits in (start, end].

    This is the reference's poll loop (ref main.py:197-216) done right:
    instead of re-querying for "new rows since cursor", consumers
    subscribe to the commit log itself — restarts replay from the
    checkpointed version exactly-once (same offsets → same manifests →
    same immutable files), and each micro-batch fans out as one task
    per change file, no driver-side data movement.

    options: startingVersion — first version to emit (default: the
    version AFTER the latest at stream start, i.e. only new commits,
    Delta's default)."""

    def __init__(self, options: dict, schema: StructType):
        self.root = _opt(options, "path")
        self.schema = schema
        sv = _opt(options, "startingVersion")
        if sv is None:
            try:
                self.start_after = _latest_version(self.root)
            except FileNotFoundError:
                self.start_after = 0
        else:
            self.start_after = int(sv) - 1

    def initialOffset(self) -> dict:
        return {"version": self.start_after}

    def latestOffset(self) -> dict:
        try:
            head = _latest_version(self.root)
        except FileNotFoundError:
            head = self.start_after
        return {"version": max(head, self.start_after)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return _change_partitions(
            self.root, int(start["version"]) + 1, int(end["version"])
        ) or [_ChangePartition(None, 0, None)]

    def read(self, partition: _ChangePartition):
        yield from _read_change_partition(partition, self.schema)

    def commit(self, end: dict) -> None:
        pass


class VersionedLakeDataSource(DataSource):
    """format("versioned_lake"): options path (required), version.

    The version is resolved ONCE per load (here, not in the reader):
    ``schema()`` and ``reader()`` would otherwise each resolve "latest"
    independently, and a commit landing between the two calls could pair
    one version's schema with another version's file list."""

    @classmethod
    def name(cls) -> str:
        return "versioned_lake"

    def _pinned_version(self) -> int:
        if not hasattr(self, "_pinned"):
            v = self.options.get("version")
            self._pinned = (
                int(v) if v is not None else _latest_version(self.options["path"])
            )
        return self._pinned

    def _read_changes(self) -> bool:
        return str(_opt(self.options, "readChangeFeed", "false")).lower() == "true"

    def schema(self) -> StructType:
        if self._read_changes():
            # ADVICE r5: an explicit endingVersion serves the range under
            # THAT version's schema (Delta semantics) — pinning to latest
            # would silently drop columns the schema later narrowed, and
            # surface later-widened columns as all-NULL on old rows.
            ev = _opt(self.options, "endingVersion")
            v = int(ev) if ev is not None else self._pinned_version()
            return _change_schema(_opt(self.options, "path"), v)
        m = _load_manifest(_opt(self.options, "path"), self._pinned_version())
        return StructType.fromJson(json.loads(m["schema"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        opts = dict(self.options, version=self._pinned_version())
        if self._read_changes():
            return VersionedLakeChangesBatchReader(opts, schema)
        return VersionedLakeReader(opts, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        """readStream.format("versioned_lake"): the change-feed stream.
        Requires ``option("readChangeFeed", "true")`` (same spelling as
        Delta) so the planned schema carries the change columns —
        snapshot streaming is not offered: a stream over a versioned
        table IS its commit log."""
        if not self._read_changes():
            raise ValueError(
                "versioned_lake streaming requires .option('readChangeFeed', "
                "'true'): the stream emits per-commit change rows "
                "(_change_type, _commit_version), not snapshots"
            )
        return VersionedLakeStreamReader(self.options, schema)
