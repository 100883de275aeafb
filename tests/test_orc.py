"""ORC tail codec: encode/parse roundtrip per orc.apache.org, chunked
ZLIB footers, and every structural refusal the audit relies on."""

import pytest

from shared_etl_pipelines_spark.sources import orc as O


def test_roundtrip_none_and_zlib():
    for comp in ("NONE", "ZLIB"):
        blob = O.encode_orc(
            [("id", "long"), ("text", "string"), ("score", "double")],
            [40, 40, 20],
            id_min=7,
            compression=comp,
        )
        o = O.parse_orc_layout(blob)
        assert o["compression"] == comp
        assert o["n_rows"] == 100 and o["n_stripes"] == 3
        assert o["column_kinds"] == ["struct", "long", "string", "double"]
        assert o["field_names"] == ["id", "text", "score"]
        assert o["stats"][1]["int_min"] == 7
        assert o["stats"][1]["int_max"] == 106
        assert o["format_versions"] == [0, 12]
        # stripe extents tile the content region contiguously
        off = 3
        for s in o["stripes"]:
            assert s["offset"] == off and s["rows"] in (40, 20)
            off += s["data"]


def test_zlib_chunk_framing_is_spec_shaped():
    # incompressible body -> the isOriginal escape bit
    import os as _os

    body = _os.urandom(64)
    framed = O._zlib_chunks(body)
    head = int.from_bytes(framed[:3], "little")
    assert head & 1 == 1 and (head >> 1) == 64 and framed[3:] == body
    # compressible body -> DEFLATE chunk
    framed = O._zlib_chunks(b"a" * 1000)
    head = int.from_bytes(framed[:3], "little")
    assert head & 1 == 0 and (head >> 1) == len(framed) - 3


def test_structural_refusals():
    b = O.encode_orc([("id", "long")], [5], 0)
    with pytest.raises(ValueError, match="header magic"):
        O.parse_orc_layout(b"XXX" + b[3:])
    with pytest.raises(ValueError, match="postscript"):
        O.parse_orc_layout(b[:-1] + bytes([250]))
    with pytest.raises(ValueError, match="truncated"):
        O.parse_orc_layout(b[:10] + b[12:])  # hole in a stripe
    # postscript magic mismatch
    with pytest.raises(ValueError, match="magic"):
        O.parse_orc_layout(b.replace(b"ORC", b"ORX", 2)[:3].replace(b"ORX", b"ORC") + b[3:].replace(b"ORC", b"ORX"))
    # row-count lie: flip numberOfRows stat is hard to patch blind, so
    # rebuild with a mismatching footer via the private encoder path
    # (ZSTD gained an in-repo encoder in r12; LZO stays the boundary)
    with pytest.raises(ValueError, match="no in-repo encoder"):
        O.encode_orc([("id", "long")], [5], 0, compression="LZO")


def test_unsupported_codec_refuses_by_name():
    # SNAPPY/LZ4 gained in-repo codecs in r11; LZO (3) remains the
    # refuse-by-name boundary
    b = bytearray(O.encode_orc([("id", "long")], [5], 0))
    ps_len = b[-1]
    ps = bytes(b[len(b) - 1 - ps_len : len(b) - 1])
    # field 2 varint: tag byte 0x10 followed by value
    idx = ps.index(b"\x10\x00")
    patched = ps[:idx] + b"\x10\x03" + ps[idx + 2 :]
    blob = bytes(b[: len(b) - 1 - ps_len]) + patched + bytes([ps_len])
    with pytest.raises(ValueError, match="LZO"):
        O.parse_orc_layout(blob)


def test_snappy_lz4_footers_roundtrip():
    for codec in ("SNAPPY", "LZ4"):
        lay = O.parse_orc_layout(
            O.encode_orc([("id", "long"), ("n", "long")], [100, 50], 7,
                         compression=codec)
        )
        assert lay["compression"] == codec
        assert lay["n_rows"] == 150 and lay["n_stripes"] == 2
