"""JDBC source/sink: the reference's Postgres surface (SURVEY.md §1.3).

The reference reaches Postgres through ``ETL_DATABASE_URL`` with an
optional loopback SSH tunnel override (``ETL_DB_TUNNEL_HOST`` /
``ETL_DB_TUNNEL_PORT`` rewrite the URL's host:port —
scripts/testdb/check_psql_connection.py:10-40). Here the same contract
feeds ``spark.read/write.jdbc``; partitioned parallel reads are exposed
so a big table scan fans out across executors instead of one connection.

No database exists in CI, so tests cover the pure URL logic; the Spark
calls are thin pass-throughs.
"""

from __future__ import annotations

import os
import re
from typing import Any
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def resolve_db_url(
    url: str | None = None,
    tunnel_host: str | None = None,
    tunnel_port: str | int | None = None,
) -> str:
    """Resolve the database URL with the reference's tunnel-rewrite
    convention: explicit args > ETL_DB_TUNNEL_* env > URL as-is."""
    url = url or os.environ.get("ETL_DATABASE_URL", "")
    if not url:
        raise ValueError("no database URL (arg or ETL_DATABASE_URL)")
    th = tunnel_host or os.environ.get("ETL_DB_TUNNEL_HOST")
    tp = tunnel_port or os.environ.get("ETL_DB_TUNNEL_PORT")
    if th or tp:
        u = urlparse(url if "//" in url else f"//{url}")
        host = th or u.hostname
        port = tp or u.port
        netloc = u.netloc
        auth = f"{u.username}:{u.password}@" if u.username else ""
        new_netloc = f"{auth}{host}" + (f":{port}" if port else "")
        url = url.replace(netloc, new_netloc, 1)
    return url


def to_jdbc_url(url: str) -> str:
    """postgres[ql]:// URLs -> jdbc:postgresql:// (Spark's expected form);
    already-jdbc URLs pass through."""
    if url.startswith("jdbc:"):
        return url
    return re.sub(r"^postgres(ql)?://", "jdbc:postgresql://", url)


def read_jdbc(
    spark: SparkSession,
    table: str,
    url: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: Any = None,
    upper_bound: Any = None,
    **options: str,
) -> DataFrame:
    """Read a table/query; with ``partition_column`` + bounds the scan is
    split into ``num_partitions`` parallel range queries."""
    reader = (
        spark.read.format("jdbc")
        .option("url", to_jdbc_url(resolve_db_url(url)))
        .option("dbtable", table)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    table: str,
    url: str | None = None,
    mode: str = "append",
    **options: str,
) -> None:
    writer = (
        df.write.format("jdbc")
        .option("url", to_jdbc_url(resolve_db_url(url)))
        .option("dbtable", table)
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
