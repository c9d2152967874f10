"""Declared-query registry.

Every operator from SURVEY.md §2 that claims "done" registers here with
(a) a Spark builder ``(spark, sf_dir) -> DataFrame`` and (b) where
SQL-expressible, a DuckDB oracle twin. ``__spark_entry__.py`` exposes the
registry to the driver; ``tests/test_oracle_parity.py`` runs the same
comparison locally so failures are caught before the driver does.

Column-name contract: every computed column is aliased identically in the
Spark builder and the oracle SQL — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None = None  # DuckDB oracle twin; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    # "exact": the twin recomputes the same result (value-hash adjudicates
    # the computation). "invariant": the twin states checkable properties
    # (bounds, planted-copy booleans) because the result depends on an
    # engine-specific hash/float space — it adjudicates correctness but is
    # NOT comparable work, so bench.py excludes it from the DuckDB
    # baseline comparison.
    twin: str = "exact"


def query(
    name: str,
    sql: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
    twin: str = "exact",
):
    """Decorator: register a declared query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query: {name}")
        if twin not in ("exact", "invariant"):
            # a typo here would silently drop the query from bench.py's
            # DuckDB baseline (it checks twin != "exact")
            raise ValueError(f"{name}: twin must be 'exact' or 'invariant', got {twin!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            sql=sql,
            tags=tags,
            doc=doc or (fn.__doc__ or ""),
            twin=twin,
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all plan modules (side effect: registration) and return the registry."""
    from bigquery_etl_spark import plans  # noqa: F401  (imports submodules)

    return REGISTRY
