"""Streaming sources: the reference's incremental-append cadence as
Structured Streaming file sources.

The reference has no literal streaming, but its operational pattern IS a
stream (SURVEY.md §2.5): new PRISM day-files land in a date-named drop
directory, skip-if-exists + conditional_get make re-scans incremental
(L7/P2), and event time is recoverable from the filename
(``day_from_filename_regex "(\\d{8})"``,
pipelines/prism/prism-mi-corn-ppt-county.yml:82). A file-source stream
with filename-derived event time reproduces exactly that, with
checkpointed exactly-once state instead of directory probing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_drop_dir(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    path_glob: str | None = None,
    max_files_per_trigger: int | None = None,
    date_regex: str | None = r"(\d{8})",
    date_col: str = "event_date",
    **options: str,
) -> DataFrame:
    """Stream a drop directory; optionally derive an event-date column
    from the file name (the reference's date-in-filename convention).

    At scale: the file source tracks seen files in the checkpoint — the
    streaming analog of skip-if-exists — and maxFilesPerTrigger bounds
    per-batch work so backfills of years of daily files don't produce one
    giant micro-batch.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(path)
    if date_regex:
        df = df.withColumn(
            date_col,
            F.to_date(
                F.regexp_extract(F.input_file_name(), date_regex, 1), "yyyyMMdd"
            ),
        )
    return df
