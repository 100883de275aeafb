"""Parquet footer walk from raw bytes — the PUBLIC parquet-format spec
(github.com/apache/parquet-format: PAR1 framing + parquet.thrift IDL)
over the repo's own Thrift compact-protocol decoder
(sources/thrift_compact.py).

Every other tool in this repo that inspects parquet structure goes
through pyarrow; this module is the independent path — footer-length
word, FileMetaData, SchemaElement tree, RowGroup -> ColumnChunk ->
ColumnMetaData (codec, encodings, sizes, page offsets), and column
Statistics (min/max/null_count) — which makes pyarrow-written files a
true cross-implementation check of the walker.

Field-id mapping is parquet.thrift verbatim (subset):

    FileMetaData:   1 version, 2 schema, 3 num_rows, 4 row_groups,
                    6 created_by
    SchemaElement:  1 type, 3 repetition_type, 4 name, 5 num_children
    RowGroup:       1 columns, 2 total_byte_size, 3 num_rows
    ColumnChunk:    2 file_offset, 3 meta_data
    ColumnMetaData: 1 type, 2 encodings, 3 path_in_schema, 4 codec,
                    5 num_values, 6 total_uncompressed_size,
                    7 total_compressed_size, 9 data_page_offset,
                    11 dictionary_page_offset, 12 statistics
    Statistics:     3 null_count, 5 max_value, 6 min_value

Truncated framing, a bad magic, or a footer that overruns the file
refuse with ValueError.
"""

from __future__ import annotations

import struct

from shared_etl_pipelines_spark.sources.thrift_compact import decode_struct

__all__ = ["parse_parquet_footer", "PHYSICAL_TYPES", "CODECS"]

PHYSICAL_TYPES = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}
CODECS = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO", 4: "BROTLI",
    5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}
ENCODINGS = {
    0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE", 4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED", 6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY", 8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT",
}


def _decode_stats(raw: dict, ptype: int) -> dict:
    def plain(v):
        if v is None:
            return None
        if ptype == 1:
            return struct.unpack("<i", v)[0]
        if ptype == 2:
            return struct.unpack("<q", v)[0]
        if ptype == 5:
            return struct.unpack("<d", v)[0]
        if ptype == 6:
            return v.decode("utf-8", "replace")
        return v.hex()

    return {
        "null_count": raw.get(3),
        "min": plain(raw.get(6)),
        "max": plain(raw.get(5)),
    }


def parse_parquet_footer(blob: bytes) -> dict:
    """Footer -> {version, created_by, num_rows, schema, row_groups}."""
    if len(blob) < 12 or blob[:4] != b"PAR1" or blob[-4:] != b"PAR1":
        raise ValueError("parquet: bad magic framing — quarantine")
    (flen,) = struct.unpack_from("<I", blob, len(blob) - 8)
    start = len(blob) - 8 - flen
    if start < 4:
        raise ValueError("parquet: footer overruns file — quarantine")
    fmd, _ = decode_struct(blob[start : len(blob) - 8])
    schema = []
    for el in fmd.get(2, []):
        schema.append(
            {
                "name": el.get(4, b"").decode("utf-8"),
                "type": PHYSICAL_TYPES.get(el.get(1), None),
                "num_children": el.get(5, 0),
                "repetition": el.get(3),
            }
        )
    row_groups = []
    for rg in fmd.get(4, []):
        cols = []
        for cc in rg.get(1, []):
            md = cc.get(3, {})
            ptype = md.get(1)
            cols.append(
                {
                    "path": ".".join(
                        b.decode("utf-8") for b in md.get(3, [])
                    ),
                    "type": PHYSICAL_TYPES.get(ptype),
                    "codec": CODECS.get(md.get(4), f"UNKNOWN({md.get(4)})"),
                    "encodings": sorted(
                        ENCODINGS.get(e, str(e)) for e in md.get(2, [])
                    ),
                    "num_values": md.get(5),
                    "total_compressed_size": md.get(7),
                    "total_uncompressed_size": md.get(6),
                    "data_page_offset": md.get(9),
                    "dictionary_page_offset": md.get(11),
                    "stats": _decode_stats(md.get(12, {}), ptype),
                    # page-index spans (ColumnChunk fields 4-7) — None
                    # when the writer emitted no page indexes
                    "offset_index_offset": cc.get(4),
                    "offset_index_length": cc.get(5),
                    "column_index_offset": cc.get(6),
                    "column_index_length": cc.get(7),
                }
            )
        row_groups.append(
            {
                "num_rows": rg.get(3),
                "total_byte_size": rg.get(2),
                "columns": cols,
            }
        )
    return {
        "version": fmd.get(1),
        "created_by": fmd.get(6, b"").decode("utf-8", "replace"),
        "num_rows": fmd.get(3),
        "schema": schema,
        "row_groups": row_groups,
    }


def read_footer_ranged(path: str) -> dict:
    """Parse the footer with two ranged reads (8-byte tail, then the
    footer span) — never the data pages.  What a scan planner holds is
    the metadata, not the file."""
    import os

    size = os.path.getsize(path)
    if size < 12:
        raise ValueError("parquet: file too small — quarantine")
    with open(path, "rb") as fh:
        fh.seek(size - 8)
        tail = fh.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError("parquet: bad magic framing — quarantine")
        (flen,) = struct.unpack_from("<I", tail, 0)
        if flen + 12 > size:
            raise ValueError("parquet: footer overruns file — quarantine")
        fh.seek(size - 8 - flen)
        footer = fh.read(flen)
    # reconstruct the minimal framing parse_parquet_footer expects
    return parse_parquet_footer(b"PAR1" + footer + tail)
