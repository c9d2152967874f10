from bigquery_etl_spark.sources.tables import TABLES, load, register_views

__all__ = ["TABLES", "load", "register_views"]
