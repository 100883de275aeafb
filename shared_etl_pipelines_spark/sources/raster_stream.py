"""`geotiff_stream`: incremental drop-directory GeoTIFF source.

The reference's ingestion cadence is one raster file per day appended to
a directory, with skip-if-exists memoization making re-runs incremental
(SURVEY.md §2.4 L7, §2.5 streaming note). This is exactly a streaming
file source, but Spark's built-in file stream formats don't decode TIFF
— so this Python streaming DataSource (Spark 4 API) does:

    spark.dataSource.register(GeoTiffStreamDataSource)
    px = (spark.readStream.format("geotiff_stream")
          .option("path", "/data/prism/daily")
          .load())
    # px: day (ISO string), y, x, value — feed watermarks/windows after
    # to_date/to_timestamp

Offsets are a count into the directory's FILENAME-SORTED listing — the
daily convention (``prism_ppt_us_30s_YYYYMMDD.tif``) makes name order
arrival order, so a restart from a checkpoint re-reads exactly the files
a failed batch covered (exactly-once from the source contract; files
must be immutable once dropped, append-only by name). Each file is one
input partition: a year's backlog decodes 365-way parallel on first
start, then each daily micro-batch is a single-file decode.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("day", StringType()),  # ISO date from the filename regex
        StructField("y", IntegerType()),
        StructField("x", IntegerType()),
        StructField("value", DoubleType()),
    ]
)


@dataclass
class _FilePartition(InputPartition):
    path: str


class GeoTiffStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("geotiff_stream requires .option('path', <directory>)")
        self.glob_suffix = options.get("suffix", ".tif")
        self.date_regex = options.get("date_regex", r"(\d{8})")
        self.drop_nodata = options.get("drop_nodata", "true").lower() in ("true", "1")

    def _listing(self) -> list[str]:
        try:
            names = sorted(
                n for n in os.listdir(self.dir) if n.endswith(self.glob_suffix)
            )
        except FileNotFoundError:
            names = []
        return names

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        # No rate limiting here: a per-batch cap would need the restored
        # offset after a checkpoint restart, which this API doesn't expose
        # to the reader — clamping without it can wedge a resumed query.
        # Per-file input partitions already bound per-task work.
        return {"n": len(self._listing())}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        names = self._listing()
        lo, hi = start["n"], min(end["n"], len(names))
        return [
            _FilePartition(os.path.join(self.dir, n)) for n in names[lo:hi]
        ] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:
            return
        from shared_etl_pipelines_spark.sources.raster import (
            date_from_path,
            decode_geotiff,
        )

        with open(partition.path, "rb") as f:
            arr, meta = decode_geotiff(f.read())
        day = date_from_path(partition.path, self.date_regex)
        day_iso = day.isoformat() if day else None
        h, w = arr.shape
        nodata = meta["nodata"] if self.drop_nodata else None
        for y in range(h):
            row = arr[y]
            for x in range(w):
                v = float(row[x])
                if nodata is not None and v == nodata:
                    continue
                yield (day_iso, y, x, v)

    def commit(self, end: dict) -> None:
        pass  # listing is append-only by contract; nothing to prune


class GeoTiffStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "geotiff_stream"

    def schema(self) -> StructType:
        return SCHEMA

    def streamReader(self, schema: StructType) -> GeoTiffStreamReader:
        return GeoTiffStreamReader(dict(self.options))
