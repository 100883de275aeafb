"""`event_replay`: a Python streaming DataSource with explicit offsets.

The drop-dir file source (streaming/sources.py) covers the reference's
daily-append cadence; this adds the OTHER streaming source shape — an
offset-tracked replayable log (the Kafka-like contract) — using Spark
4's DataSourceStreamReader API:

    spark.dataSource.register(EventReplayDataSource)
    df = (spark.readStream.format("event_replay")
          .option("path", ".../events.parquet")
          .option("batch_rows", "5000")
          .load())

Offsets are row positions into the (immutable) file: `initialOffset` is
row 0, `latestOffset` is the current row count, and each micro-batch's
[start, end) range is split into ``slice_rows`` input partitions read
independently via pyarrow row slicing. Because offsets
are pure row ranges over immutable input, replay after failure
re-produces byte-identical batches — the exactly-once story rests on the
source contract, not sink dedup. `commit` is a no-op (nothing to prune;
a log-backed source would truncate its upstream cursor there).

Timestamps are emitted as ISO strings (the parquet nanos/µs and session
zone concerns stay in one place — the batch loader; stream consumers
cast with to_timestamp as needed).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("ts_iso", StringType()),
    ]
)


@dataclass
class _RowRange(InputPartition):
    start: int
    end: int


class EventReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("event_replay requires .option('path', <parquet file>)")
        self.batch_rows = int(options.get("batch_rows", "10000"))
        self.slice_rows = int(options.get("slice_rows", str(self.batch_rows // 4 or 1)))
        self._n_rows: int | None = None

    def _total(self) -> int:
        if self._n_rows is None:
            import pyarrow.parquet as pq

            self._n_rows = pq.ParquetFile(self.path).metadata.num_rows
        return self._n_rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        return {"row": self._total()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # cover [start, end) exactly — a batch's range is fixed by the
        # engine; slicing only controls read parallelism within it
        lo, hi = start["row"], end["row"]
        step = max(1, self.slice_rows)
        return [
            _RowRange(s, min(s + step, hi)) for s in range(lo, hi, step)
        ] or [_RowRange(lo, lo)]

    def read(self, partition: _RowRange) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        n = partition.end - partition.start
        if n <= 0:
            return
        table = pq.read_table(
            self.path, columns=["event_id", "user_id", "event_type", "value", "ts"]
        ).slice(partition.start, n)
        for batch in table.to_batches():
            ids = batch.column(0).to_pylist()
            users = batch.column(1).to_pylist()
            types = batch.column(2).to_pylist()
            vals = batch.column(3).to_pylist()
            tss = batch.column(4).to_pylist()
            for row in zip(ids, users, types, vals, tss):
                ts = row[4]
                yield (*row[:4], ts.isoformat() if ts is not None else None)

    def commit(self, end: dict) -> None:
        pass  # offsets are positions into immutable input; nothing to prune


class EventReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "event_replay"

    def schema(self) -> StructType:
        return SCHEMA

    def streamReader(self, schema: StructType) -> EventReplayStreamReader:
        return EventReplayStreamReader(dict(self.options))
