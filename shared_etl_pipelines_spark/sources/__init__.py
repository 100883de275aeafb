"""Sources & sinks: table loaders, ingestion (download/extract), multimodal."""

from shared_etl_pipelines_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
