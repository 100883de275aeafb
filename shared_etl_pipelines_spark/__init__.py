"""shared_etl_pipelines_spark — a PySpark-native analytics/ETL engine.

Re-expresses, Spark-first, the pipeline-language and data-processing
semantics of the reference repo ``josephweaver/shared-etl-pipelines``
(declarative YAML ETL pipelines over climate/agriculture rasters and
tabular data), plus the LLM-training-data operators (dedup, similarity
search, text analysis, multimodal columns) a 100 TB pipeline needs.

Layout:
    engine        SparkSession factory tuned for local[N] and cluster mode
    sources       table loaders, download/extract ingestion, multimodal assets
    operators     pure DataFrame -> DataFrame operator library
    functions     scalar/column helpers (expr.*, text, vectors)
    plans         the YAML pipeline language: templates, spec, runner, registry
    streaming     Structured Streaming forms of the incremental cadence
"""

from shared_etl_pipelines_spark.engine import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
