"""MessagePack codec (sources/msgpack.py)."""
import pytest

from shared_etl_pipelines_spark.sources import msgpack as M


@pytest.mark.parametrize(
    "v",
    [
        None, True, False,
        0, 1, 127, 128, 255, 256, 65535, 65536, 2 ** 32, 2 ** 63 - 1,
        -1, -32, -33, -129, -(2 ** 31), -(2 ** 63),
        1.625, -0.5,
        "", "short", "x" * 31, "x" * 32, "x" * 300, "ünïcode",
        b"", b"\x00\xff", b"b" * 300,
        [], [1, "a", None, [2.5, {"k": -7}]], list(range(20)),
        {}, {"tag": "app.log", "n": 3, "nested": {"a": [1, 2]}},
        {f"k{i}": i for i in range(20)},  # map16
    ],
)
def test_roundtrip(v):
    assert M.decode_msgpack(M.encode_msgpack(v)) == v


def test_fluentd_stream_framing():
    ev = [["app.log", 1755302400, {"msg": "hello"}],
          ["db.slow", 1755302401, {"ms": 2500}]]
    blob = b"".join(M.encode_msgpack(e) for e in ev)
    assert M.decode_stream(blob) == ev
    with pytest.raises(ValueError):
        M.decode_stream(blob[:-2])


def test_refusals():
    with pytest.raises(ValueError):
        M.decode_msgpack(b"\xc1")  # reserved
    with pytest.raises(ValueError):
        M.decode_msgpack(b"\xd6\x01\x00\x00\x00\x00")  # fixext
    with pytest.raises(ValueError):
        M.decode_msgpack(b"\xa5abc")  # truncated fixstr
    with pytest.raises(ValueError):
        M.decode_msgpack(b"\x81\x01\x01")  # int map key
    with pytest.raises(ValueError):
        M.decode_msgpack(M.encode_msgpack("x") + b"\x01")  # trailing
    with pytest.raises(ValueError):
        M.decode_msgpack(b"\xa2\xff\xfe")  # invalid UTF-8
    with pytest.raises(ValueError):
        M.encode_msgpack(2 ** 64)  # uint overflow
    with pytest.raises(ValueError):
        M.encode_msgpack({1: "x"})  # non-string key
    with pytest.raises(ValueError):
        M.encode_msgpack(object())


def test_depth_bomb_quarantines_not_recursionerror():
    # ADVICE r9: 3000 nested fixarray headers must raise ValueError,
    # never RecursionError.
    with pytest.raises(ValueError, match="depth"):
        M.decode_msgpack(b"\x91" * 3000 + b"\xc0")
    with pytest.raises(ValueError, match="depth"):
        M.decode_msgpack(b"\x81\xa1a" * 3000 + b"\xc0")
    ok = b"\x91" * 60 + b"\x07"
    v = M.decode_msgpack(ok)
    for _ in range(60):
        v = v[0]
    assert v == 7
