"""Declared-query builders (SURVEY.md §2).

Importing this package registers every declared query into
``bigquery_etl_spark.registry.REGISTRY``.
"""

from bigquery_etl_spark.plans import (  # noqa: F401
    aggregates,
    behavioral,
    cdc,
    coverage3,
    coverage4,
    coverage5,
    coverage6,
    coverage7,
    coverage8,
    coverage9,
    coverage10,
    coverage11,
    coverage12,
    coverage13,
    coverage14,
    coverage15,
    coverage16,
    extras,
    functions_pack,
    functions_pack2,
    joins,
    lateral,
    matviews,
    ml_queries,
    partitioned,
    pipeline_e2e,
    pipeline_queries,
    relational,
    subqueries,
    tierc,
    tierc2,
    tpch,
    tpch2,
    udfs,
    windows,
)
