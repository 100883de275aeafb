"""safetensors + npy/npz containers (sources/tensors.py)."""
import io
import json
import struct

import numpy as np
import pytest

from shared_etl_pipelines_spark.sources import tensors as TS


def test_safetensors_roundtrip_and_order():
    t = [
        ("emb", "F32", [2, 3], np.arange(6, dtype="<f4").tobytes()),
        ("ids", "I64", [4], np.arange(4, dtype="<i8").tobytes()),
        ("flag", "BOOL", [], b"\x01"),
    ]
    out = TS.parse_safetensors(TS.encode_safetensors(t, metadata={"f": "pt"}))
    assert out["metadata"] == {"f": "pt"}
    assert [x["name"] for x in out["tensors"]] == ["emb", "ids", "flag"]
    assert out["tensors"][0]["n_bytes"] == 24
    assert out["tensors"][2]["shape"] == []


def test_safetensors_offset_validation():
    blob = TS.encode_safetensors(
        [("a", "F32", [2], np.zeros(2, "<f4").tobytes())]
    )
    with pytest.raises(ValueError):
        TS.parse_safetensors(blob + b"x")  # buffer longer than offsets
    with pytest.raises(ValueError):
        TS.parse_safetensors(blob[:-1])  # shorter
    with pytest.raises(ValueError):
        TS.parse_safetensors(blob[:4])  # truncated prefix
    # overlapping offsets refuse
    hdr = {
        "a": {"dtype": "F32", "shape": [2], "data_offsets": [0, 8]},
        "b": {"dtype": "F32", "shape": [2], "data_offsets": [4, 12]},
    }
    hj = json.dumps(hdr).encode()
    with pytest.raises(ValueError):
        TS.parse_safetensors(struct.pack("<Q", len(hj)) + hj + b"\x00" * 12)
    # shape/extent mismatch refuses
    hdr = {"a": {"dtype": "F32", "shape": [3], "data_offsets": [0, 8]}}
    hj = json.dumps(hdr).encode()
    with pytest.raises(ValueError):
        TS.parse_safetensors(struct.pack("<Q", len(hj)) + hj + b"\x00" * 8)
    with pytest.raises(ValueError):
        TS.encode_safetensors([("a", "F32", [3], b"\x00" * 8)])


def test_npy_numpy_interop_both_directions():
    arr = np.arange(12, dtype="<i4").reshape(3, 4)
    buf = io.BytesIO()
    np.save(buf, arr)
    o = TS.parse_npy(buf.getvalue())
    assert (o["descr"], o["shape"], o["fortran_order"]) == ("<i4", [3, 4], False)
    assert np.frombuffer(o["data"], "<i4").reshape(3, 4).tolist() \
        == arr.tolist()
    mine = TS.encode_npy("<i4", [3, 4], arr.tobytes())
    assert np.load(io.BytesIO(mine)).tolist() == arr.tolist()
    fort = io.BytesIO()
    np.save(fort, np.asfortranarray(arr))
    assert TS.parse_npy(fort.getvalue())["fortran_order"] is True


def test_npz_both_directions_and_refusals():
    arr = np.arange(12, dtype="<i4").reshape(3, 4)
    npz = TS.encode_npz(
        {"x": ("<i4", [3, 4], arr.tobytes()),
         "y": ("<f8", [2], np.array([1.5, -2.0]).tobytes())}
    )
    loaded = np.load(io.BytesIO(npz))
    assert loaded["x"].tolist() == arr.tolist()
    assert loaded["y"].tolist() == [1.5, -2.0]
    buf = io.BytesIO()
    np.savez(buf, x=arr)
    assert TS.parse_npz(buf.getvalue())["x"]["shape"] == [3, 4]
    with pytest.raises(ValueError):
        TS.parse_npz(b"not a zip")
    with pytest.raises(ValueError):
        TS.parse_npy(b"\x93NUMPY\x09\x00xxxx")  # bad version
    with pytest.raises(ValueError):
        TS.parse_npy(b"\x93NUMPY\x01\x00\xff\xffshort")  # header overrun
    # npz with a foreign member refuses
    bio = io.BytesIO()
    import zipfile

    with zipfile.ZipFile(bio, "w") as z:
        z.writestr("readme.txt", "hi")
    with pytest.raises(ValueError):
        TS.parse_npz(bio.getvalue())


def test_malformed_shapes_refuse_not_crash():
    """Self-review (r9-continued): header-supplied shapes are attacker
    data — non-int or negative entries must refuse as ValueError."""
    hdr = {"a": {"dtype": "F32", "shape": "8", "data_offsets": [0, 8]}}
    hj = json.dumps(hdr).encode()
    with pytest.raises(ValueError):
        TS.parse_safetensors(struct.pack("<Q", len(hj)) + hj + b"\x00" * 8)
    hdr = {"a": {"dtype": "F32", "shape": [-2], "data_offsets": [0, 8]}}
    hj = json.dumps(hdr).encode()
    with pytest.raises(ValueError):
        TS.parse_safetensors(struct.pack("<Q", len(hj)) + hj + b"\x00" * 8)
    bad_npy = TS.encode_npy("<i4", [2], b"\x00" * 8).replace(
        b"'shape': (2,)", b"'shape': ('x')"
    )
    with pytest.raises(ValueError):
        TS.parse_npy(bad_npy)
