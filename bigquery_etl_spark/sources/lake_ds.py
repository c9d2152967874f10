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
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


def _load_manifest(root: str, version: int | None) -> dict:
    mdir = os.path.join(root, "_manifests")
    if version is None:
        versions = [
            int(f[1:9])
            for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        ]
        if not versions:
            raise FileNotFoundError(f"{root}: empty versioned table")
        version = max(versions)
    with open(os.path.join(mdir, f"v{version:08d}.json")) as f:
        return json.load(f)


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
            for e in self.manifest["files"]
            if _file_survives(e, self.pushed)
        ]

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        tbl = pq.read_table(
            partition.path,
            columns=[
                f.name
                for f in self.schema.fields
                if f.name in pq.read_schema(partition.path).names
            ],
        )
        cols = []
        for f in self.schema.fields:
            at = to_arrow_type(f.dataType)
            if f.name in tbl.schema.names:
                cols.append(tbl.column(f.name).cast(at))
            else:  # schema evolution: column younger than this file
                cols.append(pa.nulls(tbl.num_rows, type=at))
        yield from pa.table(cols, names=[f.name for f in self.schema.fields]).to_batches()


class VersionedLakeDataSource(DataSource):
    """format("versioned_lake"): options path (required), version."""

    @classmethod
    def name(cls) -> str:
        return "versioned_lake"

    def schema(self) -> StructType:
        m = _load_manifest(
            self.options["path"],
            int(self.options["version"]) if "version" in self.options else None,
        )
        return StructType.fromJson(json.loads(m["schema"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        return VersionedLakeReader(self.options, schema)
