"""`stac_items`: a Spark Python DataSource for STAC catalogs (S5, native).

The ingest-task form of S5 (`sources/ingest.py stac_asset_download`,
reference invocation pipelines/sentinel/download-sentinel2-l2a-
michigan.yml:43-59) downloads assets driver-side. This is the
*query-side* complement: STAC items exposed directly as a DataFrame via
Spark 4's Python DataSource API —

    spark.dataSource.register(StacItemsDataSource)
    df = (spark.read.format("stac_items")
          .option("path", "/path/to/catalog.json")   # or items list JSON
          .option("collection", "sentinel-2-l2a")
          .option("query_json", '{"eo:cloud_cover": {"lt": 20}}')
          .option("asset_keys", "B02,SCL")
          .load())

One output row per (item, asset): the multimodal asset table of
SURVEY.md §1.3 (`item_id, band, href, bytes, metadata`), minus the raw
bytes (join through the binaryFile reader or the multimodal decode
operators to attach content). The S5 predicates — collection equality,
`query_json` property comparisons (lt/lte/gt/gte/eq), bbox
intersection, datetime range — are applied inside each partition's
read, i.e. at the source, matching the reference's server-side STAC
query pushdown.

Scale posture: `partitions()` splits the feature list into fixed-size
slices; each executor parses and filters only its slice (the catalog
path would be an object-store listing / static API page set at real
scale). No driver-side materialization beyond the partition count.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("item_id", StringType()),
        StructField("collection", StringType()),
        StructField("item_datetime", StringType()),
        StructField("bbox", ArrayType(DoubleType())),
        StructField("properties_json", StringType()),
        StructField("asset_key", StringType()),
        StructField("asset_href", StringType()),
    ]
)

_OPS = {
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "eq": lambda a, b: a == b,
}


def _matches(feat: dict, collection: str | None, query: dict,
             bbox: Sequence[float] | None, dt_range: str | None) -> bool:
    if collection and feat.get("collection") != collection:
        return False
    props = feat.get("properties", {})
    for prop, conds in query.items():
        val = props.get(prop)
        if val is None:
            return False
        conds = conds if isinstance(conds, dict) else {"eq": conds}
        for op, rhs in conds.items():
            fn = _OPS.get(op)
            if fn is None or not fn(val, rhs):
                return False
    if bbox is not None:
        fb = feat.get("bbox")
        if not fb:
            return False
        # 2-D intersection test
        if fb[2] < bbox[0] or fb[0] > bbox[2] or fb[3] < bbox[1] or fb[1] > bbox[3]:
            return False
    if dt_range:
        item_dt = props.get("datetime", "")
        lo, _, hi = dt_range.partition("/")
        if lo and lo != ".." and item_dt < lo:
            return False
        if hi and hi != ".." and item_dt > hi:
            return False
    return True


@dataclass
class _Slice(InputPartition):
    start: int
    end: int


class StacItemsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("stac_items requires .option('path', <catalog json>)")
        self.collection = options.get("collection")
        self.query = json.loads(options.get("query_json", "{}") or "{}")
        bbox = options.get("bbox")
        self.bbox = [float(x) for x in bbox.split(",")] if bbox else None
        self.dt_range = options.get("datetime")
        keys = options.get("asset_keys")
        self.asset_keys = [k.strip() for k in keys.split(",")] if keys else None
        self.slice_size = int(options.get("slice_size", "256"))

    def _features(self) -> list[dict]:
        with open(self.path) as f:
            doc = json.load(f)
        return doc.get("features", doc if isinstance(doc, list) else [])

    def partitions(self) -> list[InputPartition]:
        n = len(self._features())
        size = max(1, self.slice_size)
        return [_Slice(s, min(s + size, n)) for s in range(0, n, size)] or [_Slice(0, 0)]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        feats = self._features()[partition.start : partition.end]
        for feat in feats:
            if not _matches(feat, self.collection, self.query, self.bbox, self.dt_range):
                continue
            props = feat.get("properties", {})
            base = (
                feat.get("id"),
                feat.get("collection"),
                props.get("datetime"),
                [float(x) for x in feat.get("bbox", [])] or None,
                json.dumps(props, sort_keys=True),
            )
            for key, asset in sorted(feat.get("assets", {}).items()):
                if self.asset_keys and key not in self.asset_keys:
                    continue
                yield (*base, key, asset.get("href"))


class StacItemsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stac_items"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> StacItemsReader:
        return StacItemsReader(dict(self.options))
