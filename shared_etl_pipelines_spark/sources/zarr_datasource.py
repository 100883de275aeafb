"""Native Spark Python DataSource for Zarr v2 arrays:
``spark.read.format("zarr").option("path", ...)``.

The DSv2-style integration upgrade over zarrstore.scan_zarr: the chunk
GRID becomes the partition plan — one InputPartition per surviving
chunk, so a ``bbox`` option prunes files at PLANNING time (the scan
never lists, opens, or schedules tasks for pruned chunks), and Spark's
scheduler sees the true unit of parallelism. Cell-level bbox filtering
happens inside ``read`` (exact semantics; the chunk prune is the
coarse pass, like parquet row-group stats + residual filter).

Options: ``path`` (array directory, required), ``bbox``
("r0,c0,r1,c1" half-open, optional). Schema: (row int, col int,
value double). 2-D arrays only, matching scan_zarr's raster scope.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from shared_etl_pipelines_spark.sources.zarrstore import (
    chunks_for_bbox,
    decode_chunk,
    read_zarray,
)

SCHEMA = StructType(
    [
        StructField("row", IntegerType()),
        StructField("col", IntegerType()),
        StructField("value", DoubleType()),
    ]
)


@dataclass
class _Chunk(InputPartition):
    key: str


class ZarrReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("zarr source requires .option('path', <array dir>)")
        self.meta = read_zarray(self.path)
        if len(self.meta["shape"]) != 2:
            raise ValueError("zarr source is 2-D (raster) scoped")
        bbox = options.get("bbox")
        if bbox:
            r0, c0, r1, c1 = (int(x) for x in bbox.split(","))
            self.bbox = ((r0, c0), (r1, c1))
        else:
            self.bbox = ((0, 0), tuple(self.meta["shape"]))

    def partitions(self) -> list[InputPartition]:
        # chunk-grid pruning AT PLANNING TIME: pruned chunks never
        # become tasks
        keys = chunks_for_bbox(
            self.meta, list(self.bbox[0]), list(self.bbox[1])
        )
        return [_Chunk(k) for k in keys] or [_Chunk("")]

    def read(self, partition: _Chunk) -> Iterator[tuple]:
        if not partition.key:
            return
        ci, cj = (int(x) for x in partition.key.split("."))
        ch_r, ch_c = self.meta["chunks"]
        n_r, n_c = self.meta["shape"]
        (r0, c0), (r1, c1) = self.bbox
        p = os.path.join(self.path, partition.key)
        blob = open(p, "rb").read() if os.path.exists(p) else None
        vals = decode_chunk(self.meta, partition.key, blob)
        for i in range(ch_r):
            r = ci * ch_r + i
            if r >= n_r:
                break
            if not r0 <= r < r1:
                continue
            base = i * ch_c
            for j in range(ch_c):
                c = cj * ch_c + j
                if c >= n_c:
                    break
                if c0 <= c < c1:
                    yield (r, c, float(vals[base + j]))


class ZarrDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "zarr"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> ZarrReader:
        return ZarrReader(dict(self.options))
