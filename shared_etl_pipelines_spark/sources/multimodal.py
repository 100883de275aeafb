"""Multimodal columns: opaque binary assets + typed metadata.

Generalizes the reference's STAC asset table (item JSON + per-band COG
assets, pipelines/sentinel/download-sentinel2-l2a-michigan.yml:15-35,58):
an asset row is (id, media_type, blob BINARY, meta STRUCT). Decode /
feature-extract runs as Arrow-batched mapInPandas — the only sane way to
touch bytes at scale (whole-partition batches, zero-copy into pandas).

The image/audio codecs are NOT in this container, so decode_assets uses
a clearly-marked deterministic fake (byte stats standing in for pixel
stats) behind the same plumbing: schema, partitioning, batch shape, and
UDF signature are production-real; only the codec call is stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, checksum bigint, "
    "fake_width int, fake_height int"
)


def to_asset_table(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Build a multimodal asset table from any payload column: binary blob
    + typed metadata struct. With real media, blob comes from
    spark.read.format('binaryFile') and meta from the sidecar JSON."""
    return df.select(
        F.col(id_col),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(payload_col), "UTF-8").alias("blob"),
        F.struct(
            F.octet_length(F.col(payload_col)).alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
        ).alias("meta"),
    )


def _fake_decode(blob: bytes) -> tuple[int, int, int, int]:
    """STUB codec: deterministic byte statistics in place of a real
    image/audio decode (codec libs not installed in this environment).
    A real implementation would `PIL.Image.open(io.BytesIO(blob))` here;
    everything around this call is production plumbing.
    """
    n = len(blob)
    text = blob.decode("utf-8", errors="replace")
    checksum = sum(ord(c) for c in text[:16]) % 997
    return n, checksum, (n % 64) + 1, ((n // 64) % 64) + 1


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the asset table."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": [d[0] for d in decoded],
                    "checksum": [d[1] for d in decoded],
                    "fake_width": [d[2] for d in decoded],
                    "fake_height": [d[3] for d in decoded],
                }
            )

    return assets.mapInPandas(batches, schema=DECODED_SCHEMA)
