"""``ownparquet``: a Spark Python DataSource running the repo's OWN
parquet reader as the scan engine (r13).

    spark.dataSource.register(OwnParquetDataSource)
    df = (spark.read.format("ownparquet")
          .option("path", "/data/shards/*.parquet").load())

The scan has the shape a native parquet source has, expressed through
the Python DataSource API:

- **schema inference** from the first file's footer (the repo's Thrift
  compact walk, sources/parquet_footer.py) — flat INT64 / DOUBLE /
  UTF8 / BOOLEAN columns; anything else refuses loudly;
- **partitions = row groups**: the driver reads only footers
  (metadata-scale) and emits one InputPartition per (file, row group),
  exactly how a distributed scan shards;
- **filter pushdown** (``pushFilters``, Spark 4.1): comparison and
  equality predicates on int64 columns are CONSUMED — row groups whose
  footer min/max stats cannot match are never scheduled, and the
  residual rows are filtered exactly inside ``read`` so consuming the
  filter is sound. Everything else is handed back to Spark;
- **executor-side decode**: each task seeks to its row group's
  column-chunk byte spans (sources/parquet_pages.read_column_ranged —
  dictionary, PLAIN, delta and BSS encodings, snappy/zstd codecs all
  via the repo's own implementations) and yields rows.
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SPARK_TYPES = {
    "INT64": LongType(),
    "DOUBLE": DoubleType(),
    "BYTE_ARRAY": StringType(),
    "BOOLEAN": BooleanType(),
}


def _files(path: str) -> list[str]:
    out = sorted(_glob.glob(path))
    if not out:
        raise ValueError(f"ownparquet: no files match {path!r} — quarantine")
    return out


def _footer_schema(path: str) -> list[tuple[str, str]]:
    from shared_etl_pipelines_spark.sources.parquet_footer import (
        read_footer_ranged,
    )

    cols: list[tuple[str, str]] = []
    for s in read_footer_ranged(path)["schema"]:
        if s.get("num_children"):
            if s["name"] == "schema":
                continue
            raise ValueError(
                "ownparquet: nested columns unsupported — quarantine"
            )
        t = s.get("type")
        if t not in _SPARK_TYPES:
            raise ValueError(
                f"ownparquet: physical type {t} unsupported — quarantine"
            )
        cols.append((s["name"], t))
    return cols


@dataclass
class _RowGroup(InputPartition):
    path: str
    rg: int


# (column, op, value) — op names match the closures in _OPS
_OPS = {
    "eq": lambda v, x: v == x,
    "gt": lambda v, x: v > x,
    "gte": lambda v, x: v >= x,
    "lt": lambda v, x: v < x,
    "lte": lambda v, x: v <= x,
}
# can a row group with [mn, mx] stats contain a matching value?
_RG_MAY_MATCH = {
    "eq": lambda mn, mx, x: mn <= x <= mx,
    "gt": lambda mn, mx, x: mx > x,
    "gte": lambda mn, mx, x: mx >= x,
    "lt": lambda mn, mx, x: mn < x,
    "lte": lambda mn, mx, x: mn <= x,
}


class OwnParquetReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("ownparquet requires .option('path', <glob>)")
        self.paths = _files(path)
        self.cols = _footer_schema(self.paths[0])
        self.pushed: list[tuple[str, str, int]] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        kinds = dict(self.cols)
        ops = {
            EqualTo: "eq", GreaterThan: "gt", GreaterThanOrEqual: "gte",
            LessThan: "lt", LessThanOrEqual: "lte",
        }
        for f in filters:
            op = ops.get(type(f))
            col = f.attribute[-1] if op else None
            if (
                op is not None
                and len(f.attribute) == 1
                and kinds.get(col) == "INT64"
                and isinstance(f.value, int)
            ):
                # consumed: stats-skip in partitions(), exact in read()
                self.pushed.append((col, op, f.value))
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        from shared_etl_pipelines_spark.sources.parquet_footer import (
            read_footer_ranged,
        )

        out: list[InputPartition] = []
        for p in self.paths:
            foot = read_footer_ranged(p)
            for gi, rg in enumerate(foot["row_groups"]):
                stats = {
                    c["path"]: c.get("stats") or {} for c in rg["columns"]
                }
                keep = True
                for col, op, x in self.pushed:
                    st = stats.get(col) or {}
                    mn, mx = st.get("min"), st.get("max")
                    if (
                        mn is not None and mx is not None
                        and not _RG_MAY_MATCH[op](mn, mx, x)
                    ):
                        keep = False
                        break
                if keep:
                    out.append(_RowGroup(p, gi))
        # an all-pruned scan still needs one empty partition
        return out or [_RowGroup(self.paths[0], -1)]

    def read(self, partition: _RowGroup) -> Iterator[tuple]:
        if partition.rg < 0:
            return
        from shared_etl_pipelines_spark.sources.parquet_footer import (
            read_footer_ranged,
        )
        from shared_etl_pipelines_spark.sources.parquet_pages import (
            read_column_ranged,
        )

        foot = read_footer_ranged(partition.path)
        data = []
        for name, kind in self.cols:
            vals = read_column_ranged(partition.path, foot, partition.rg, name)
            if kind == "BYTE_ARRAY":
                vals = [
                    v.decode("utf-8") if v is not None else None
                    for v in vals
                ]
            data.append(vals)
        idx = {name: i for i, (name, _k) in enumerate(self.cols)}
        for row in zip(*data):
            ok = True
            for col, op, x in self.pushed:
                v = row[idx[col]]
                if v is None or not _OPS[op](v, x):
                    ok = False
                    break
            if ok:
                yield row


class OwnParquetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ownparquet"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("ownparquet requires .option('path', <glob>)")
        return StructType(
            [
                StructField(n, _SPARK_TYPES[t])
                for n, t in _footer_schema(_files(path)[0])
            ]
        )

    def reader(self, schema: StructType) -> OwnParquetReader:
        return OwnParquetReader(dict(self.options))
