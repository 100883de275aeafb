"""Bencode + torrent metainfo (sources/bencode.py)."""
import pytest

from shared_etl_pipelines_spark.sources import bencode as B


@pytest.mark.parametrize(
    "v",
    [0, -7, 12345, b"", b"bytes", [1, b"a", [2]],
     {b"a": 1, b"b": [b"x"]}, {b"k": {b"n": -1}}],
)
def test_roundtrip(v):
    assert B.bdecode(B.bencode(v)) == v


def test_torrent_single_and_multi_file():
    t1 = B.bencode(
        {b"announce": b"http://tr.test/a",
         b"info": {b"length": 4000, b"name": b"data.bin",
                   b"piece length": 1024, b"pieces": b"\x11" * 80}}
    )
    o = B.parse_torrent(t1)
    assert o["n_pieces"] == 4 and o["total_length"] == 4000
    assert o["n_files"] == 1 and o["private"] == 0
    t2 = B.bencode(
        {b"announce": b"http://tr.test/a",
         b"info": {b"files": [{b"length": 10, b"path": [b"a"]},
                              {b"length": 30, b"path": [b"b"]}],
                   b"name": b"dir", b"piece length": 16384,
                   b"pieces": b"\x22" * 20, b"private": 1}}
    )
    o = B.parse_torrent(t2)
    assert o["total_length"] == 40 and o["n_files"] == 2
    assert o["private"] == 1 and o["name"] == "dir"


def test_canonicality_refusals():
    with pytest.raises(ValueError):
        B.bdecode(b"d1:b1:x1:a1:ye")  # unsorted dict keys
    with pytest.raises(ValueError):
        B.bdecode(b"d1:a1:x1:a1:ye")  # duplicate key (not strictly >)
    with pytest.raises(ValueError):
        B.bdecode(b"i007e")
    with pytest.raises(ValueError):
        B.bdecode(b"i-0e")
    with pytest.raises(ValueError):
        B.bdecode(b"03:abc")
    with pytest.raises(ValueError):
        B.bdecode(b"i1e2:xx")  # trailing bytes
    with pytest.raises(ValueError):
        B.bdecode(b"5:ab")  # truncated string
    with pytest.raises(ValueError):
        B.bdecode(b"di1e1:xe")  # integer dict key
    with pytest.raises(ValueError):
        B.bencode({b"b": 1, b"a": 2})  # encoder demands sorted input


def test_torrent_refusals():
    with pytest.raises(ValueError):
        B.parse_torrent(B.bencode({b"no": b"info"}))
    bad_pieces = B.bencode(
        {b"info": {b"length": 1, b"name": b"x", b"piece length": 1,
                   b"pieces": b"\x01" * 19}}
    )
    with pytest.raises(ValueError):
        B.parse_torrent(bad_pieces)
    no_len = B.bencode(
        {b"info": {b"name": b"x", b"piece length": 1, b"pieces": b""}}
    )
    with pytest.raises(ValueError):
        B.parse_torrent(no_len)


def test_depth_bomb_quarantines_not_recursionerror():
    # ADVICE r9: 3000 nested lists must raise ValueError (the quarantine
    # path), never RecursionError (which escapes except-ValueError
    # wrappers and kills the executor task).
    with pytest.raises(ValueError, match="depth"):
        B.bdecode(b"l" * 3000 + b"e" * 3000)
    with pytest.raises(ValueError, match="depth"):
        B.bdecode(b"d1:a" * 3000 + b"i0e" + b"e" * 3000)
    # 64 levels of nesting still decode fine
    ok = b"l" * 60 + b"i7e" + b"e" * 60
    v = B.bdecode(ok)
    for _ in range(60):
        v = v[0]
    assert v == 7
