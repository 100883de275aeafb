"""ownparquet Python DataSource: schema inference from the own footer
walk, row-group partitions, stats-driven filter pushdown, exact
residual filtering, and refusal boundaries."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    LessThanOrEqual,
    StringStartsWith,
)

from shared_etl_pipelines_spark.sources.ownparquet_datasource import (
    OwnParquetDataSource,
    OwnParquetReader,
)
from shared_etl_pipelines_spark.sources.parquet_write import write_parquet


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ownpq")
    for s in range(4):
        keys = list(range(s * 1000, s * 1000 + 600))
        blob = write_parquet(
            [
                ("k", "int64", keys),
                ("tag", "utf8", [f"t{k % 5}" for k in keys]),
                ("x", "double", [k / 4.0 for k in keys]),
                ("b", "boolean", [k % 2 == 0 for k in keys]),
            ],
            compression="SNAPPY", row_group_size=200, use_dictionary=True,
        )
        (root / f"shard_{s}.parquet").write_bytes(blob)
    return str(root)


def test_scan_matches_direct_decode(spark, shard_dir):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OwnParquetDataSource)
    df = (
        spark.read.format("ownparquet")
        .option("path", os.path.join(shard_dir, "shard_*.parquet"))
        .load()
    )
    assert [f.name for f in df.schema.fields] == ["k", "tag", "x", "b"]
    assert df.count() == 2400
    got = (
        df.filter((F.col("k") >= 500) & (F.col("k") <= 1499))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("ks"),
            F.round(F.sum("x"), 4).alias("xs"),
        )
        .collect()[0]
    )
    keys = [k for k in list(range(500, 600)) + list(range(1000, 1500))]
    assert got["n"] == len(keys)
    assert got["ks"] == sum(keys)
    assert got["xs"] == round(sum(k / 4.0 for k in keys), 4)


def test_pushdown_skips_row_groups_and_keeps_exactness(shard_dir):
    gl = os.path.join(shard_dir, "shard_*.parquet")
    r_all = OwnParquetReader({"path": gl})
    n_all = len(r_all.partitions())
    assert n_all == 4 * 3  # 600 rows / rg 200 per shard

    r = OwnParquetReader({"path": gl})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("k",), 500),
                LessThanOrEqual(("k",), 1499),
                StringStartsWith(("tag",), "t"),  # not consumable
            ]
        )
    )
    assert len(leftover) == 1 and isinstance(leftover[0], StringStartsWith)
    pruned = len(r.partitions())
    assert pruned < n_all
    # rows from partially-matching row groups re-filter exactly
    rows = [row for p in r.partitions() for row in r.read(p)]
    ks = sorted(row[0] for row in rows)
    assert ks == list(range(500, 600)) + list(range(1000, 1500))

    # equality on a non-int64 column is NOT consumed
    r2 = OwnParquetReader({"path": gl})
    left2 = list(r2.pushFilters([EqualTo(("x",), 4)]))
    assert len(left2) == 1


def test_all_pruned_scan_yields_empty(shard_dir):
    r = OwnParquetReader({"path": os.path.join(shard_dir, "shard_*.parquet")})
    list(r.pushFilters([GreaterThanOrEqual(("k",), 10_000_000)]))
    parts = r.partitions()
    assert len(parts) == 1
    assert list(r.read(parts[0])) == []


def test_refusals(tmp_path):
    with pytest.raises(ValueError, match="no files match"):
        OwnParquetReader({"path": str(tmp_path / "nope_*.parquet")})
    p = tmp_path / "lists.parquet"
    p.write_bytes(
        write_parquet([("arr", "list<int64>", [[1, 2], None])])
    )
    with pytest.raises(ValueError, match="nested"):
        OwnParquetReader({"path": str(p)})
