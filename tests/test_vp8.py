"""VP8 (RFC 6386) keyframe decode: boolean-coder roundtrips, pixel
expectations of every skip-MB intra mode, and the documented refusal
boundaries (interframe, bad start code, B_PRED, residual tokens)."""

import random

import pytest

from shared_etl_pipelines_spark.sources import vp8 as V


def test_bool_coder_roundtrip_random_and_carry_heavy():
    rng = random.Random(42)
    for trial in range(120):
        n = rng.randrange(1, 400)
        if trial % 3 == 0:  # carry-heavy: long runs of likely ones
            seq = [(254, 1)] * n
        elif trial % 7 == 0:
            seq = [(1, 0)] * n
        else:
            seq = [(rng.randrange(1, 255), rng.randrange(2)) for _ in range(n)]
        e = V.BoolEncoder()
        for p, b in seq:
            e.put(p, b)
        d = V.BoolDecoder(e.flush())
        assert [d.get(p) for p, _ in seq] == [b for _, b in seq]


def test_literal_signed_tree_roundtrip():
    e = V.BoolEncoder()
    e.literal(7, 99)
    e.signed(4, -13)
    e.signed(4, 5)
    e.tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS, V.TM_PRED)
    e.tree(V.UV_MODE_TREE, V.KF_UV_MODE_PROBS, V.H_PRED)
    d = V.BoolDecoder(e.flush())
    assert d.literal(7) == 99
    assert d.signed(4) == -13 and d.signed(4) == 5
    assert d.tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS) == V.TM_PRED
    assert d.tree(V.UV_MODE_TREE, V.KF_UV_MODE_PROBS) == V.H_PRED


@pytest.mark.parametrize(
    "mode,expect",
    [(V.DC_PRED, 128), (V.V_PRED, 127), (V.H_PRED, 129), (V.TM_PRED, 129)],
)
def test_skip_keyframe_reconstructs_exact_uniform(mode, expect):
    out = V.decode_keyframe(V.encode_keyframe_skip(48, 32, y_mode=mode))
    assert (out["width"], out["height"]) == (48, 32)
    assert set(out["y"]) == {expect}
    assert set(out["u"]) == {128} and set(out["v"]) == {128}
    assert len(out["y"]) == 48 * 32 and len(out["u"]) == 24 * 16
    assert set(out["modes"]) == {V.MODE_NAMES[mode]}


def test_header_fields_decode():
    out = V.decode_keyframe(V.encode_keyframe_skip(16, 16))
    h = out["header"]
    assert h["y_ac_qi"] == 0
    assert h["mb_no_coeff_skip"] == 1
    assert h["n_coeff_updates"] == 0  # all 1056 flags read, none set
    assert h["filter_level"] == 0 and h["log2_partitions"] == 0


def test_refusals_interframe_startcode_bpred_residual():
    good = V.encode_keyframe_skip(16, 16)
    with pytest.raises(ValueError, match="not a keyframe"):
        V.decode_keyframe(bytes([good[0] | 1]) + good[1:])
    bad_sc = good[:3] + b"\x00\x01\x2a" + good[6:]
    with pytest.raises(ValueError, match="start code"):
        V.decode_keyframe(bad_sc)
    with pytest.raises(ValueError, match="truncated"):
        V.decode_keyframe(good[:8])

    # hand-build streams that hit the documented table boundaries
    def frame(body_fn):
        e = V.BoolEncoder()
        V._encode_header(e, 30)
        body_fn(e)
        first = e.flush()
        tag = (1 << 4) | (len(first) << 5)
        return (
            bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
            + b"\x9d\x01\x2a" + bytes((16, 0, 16, 0)) + first
        )

    def bpred(e):
        e.put(30, 1)  # skip
        e.tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS, V.B_PRED)

    with pytest.raises(ValueError, match="B_PRED"):
        V.decode_keyframe(frame(bpred))

    # r13: non-skipped MBs now DECODE their residual tokens; the moved
    # boundary is the dequant table — any quantizer index != 0 refuses
    e = V.BoolEncoder()
    e.literal(1, 0)
    e.literal(1, 0)
    e.literal(1, 0)  # segmentation off
    e.literal(1, 0)  # filter type
    e.literal(6, 0)
    e.literal(3, 0)
    e.literal(1, 0)
    e.literal(2, 0)  # one partition
    e.literal(7, 5)  # y_ac_qi = 5: beyond the transcribed dequant row
    for _ in range(5):
        e.literal(1, 0)
    e.literal(1, 1)  # refresh entropy
    V._encode_coeff_updates_and_skip(e, 30)
    e.put(30, 0)  # NOT skipped -> residual decode needs dequant
    e.tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS, V.DC_PRED)
    e.tree(V.UV_MODE_TREE, V.KF_UV_MODE_PROBS, V.DC_PRED)
    first = e.flush()
    tag = (1 << 4) | (len(first) << 5)
    qframe = (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a" + bytes((16, 0, 16, 0)) + first + b"\x00" * 8
    )
    with pytest.raises(ValueError, match="dequant"):
        V.decode_keyframe(qframe)


def test_dc_only_available_neighbors_rule():
    """DC prediction averages only AVAILABLE neighbors (never the
    127/129 buffers) and falls back to 128 at the top-left — pin the
    rule with a two-MB-wide frame where the second MB sees only its
    left neighbor."""
    out = V.decode_keyframe(V.encode_keyframe_skip(32, 16, y_mode=V.DC_PRED))
    assert set(out["y"]) == {128}


def test_webm_bridge_and_quarantine(spark, sf_dir):
    from shared_etl_pipelines_spark.sources.multimodal import (
        sample_video_frames,
        synthetic_vp8_webm_assets,
    )
    from shared_etl_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    assets = synthetic_vp8_webm_assets(docs)
    rows = sample_video_frames(assets, stride=2).collect()
    assert rows and all(r["is_real_decode"] for r in rows)
    # a webm whose VP8 payload is filler (the old header-only stub
    # class) must degrade to the stub row, never crash the scan
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources import mkv

    stub = mkv.encode_mkv(
        tracks=[{"number": 1, "uid": 7, "type": "video",
                 "codec_id": "V_VP8", "width": 32, "height": 32}],
        clusters=[(0, [(1, 0, True,
                        mkv.encode_vp8_keyframe(32, 32, 4, b"\xde\xad\xbe\xef"))])],
        doc_type="webm",
    )
    one = spark.createDataFrame(
        [(99, "video/webm", bytearray(stub))],
        "doc_id bigint, media_type string, blob binary",
    )
    out = sample_video_frames(one).collect()
    assert len(out) == 1 and not out[0]["is_real_decode"]


def test_interframe_roundtrip_modes_and_refs():
    from shared_etl_pipelines_spark.sources import vp8

    w, h = 48, 32
    key = vp8.encode_keyframe_skip(w, h, y_mode=vp8.V_PRED)
    p1 = vp8.encode_interframe(w, h, [("last", 2, -4)] * 6)
    p2 = vp8.encode_interframe(w, h, [("golden", 0, 0)] * 6)
    p3 = vp8.encode_interframe(w, h, [("altref", -6, 2)] * 6)
    f0, f1, f2, f3 = vp8.decode_sequence([key, p1, p2, p3])
    # uniform keyframe => every MC result is the same uniform plane
    assert f1["y"] == f0["y"] and f2["y"] == f0["y"] and f3["y"] == f0["y"]
    # first MB has no neighbors -> NEWMV; the rest predict -> NEARESTMV
    assert [m[1] for m in f1["mvs"]] == ["NEW"] + ["NEAREST"] * 5
    assert all(m[1] == "ZERO" for m in f2["mvs"])
    assert {m[0] for m in f3["mvs"]} == {"altref"}
    assert all((m[2], m[3]) == (8, -16) for m in f1["mvs"])  # 2px,-4px * 4


def test_interframe_mc_exact_on_gradient_reference():
    from shared_etl_pipelines_spark.sources import vp8

    w, h = 48, 32
    grad = [[(r * 5 + c) % 256 for c in range(w)] for r in range(h)]
    ref = {
        "width": w, "height": h, "_y2d": grad,
        "_u2d": [[(r + c) % 256 for c in range(24)] for r in range(16)],
        "_v2d": [[(r * 2 + c) % 256 for c in range(24)] for r in range(16)],
    }
    refs = {"last": ref, "golden": ref, "altref": ref}
    f = vp8.decode_interframe(
        vp8.encode_interframe(w, h, [("last", 4, 2)] * 6), refs
    )
    exp = bytes(
        grad[min(max(r + 2, 0), h - 1)][min(max(c + 4, 0), w - 1)]
        for r in range(h) for c in range(w)
    )
    assert f["y"] == exp  # border replication included
    eu = bytes(
        ref["_u2d"][min(max(r + 1, 0), 15)][min(max(c + 2, 0), 23)]
        for r in range(16) for c in range(24)
    )
    assert f["u"] == eu  # chroma at half the luma offset


def test_mvcomponent_full_range_roundtrip():
    from shared_etl_pipelines_spark.sources import vp8

    for v in list(range(-72, 73, 8)) + [-1016, 1016, -520, 520]:
        e = vp8.BoolEncoder()
        vp8._encode_mvcomponent(e, vp8.MVC_STUB_PROBS, v)
        vp8._encode_mvcomponent(e, vp8.MVC_STUB_PROBS, -v)
        d = vp8.BoolDecoder(e.flush())
        assert vp8._decode_mvcomponent(d, vp8.MVC_STUB_PROBS) == v
        assert vp8._decode_mvcomponent(d, vp8.MVC_STUB_PROBS) == -v


def test_interframe_refusals():
    import pytest

    from shared_etl_pipelines_spark.sources import vp8

    w, h = 32, 32
    key = vp8.decode_keyframe(vp8.encode_keyframe_skip(w, h))
    refs = {"last": key, "golden": key, "altref": key}
    with pytest.raises(ValueError, match="even ints"):
        vp8.encode_interframe(w, h, [("last", 3, 0)] * 4)
    with pytest.raises(ValueError, match="mbs length"):
        vp8.encode_interframe(w, h, [("last", 0, 0)] * 3)
    with pytest.raises(ValueError, match="keyframe"):
        vp8.decode_interframe(vp8.encode_keyframe_skip(w, h), refs)
    with pytest.raises(ValueError, match="interframe decoder|not a keyframe"):
        vp8.decode_keyframe(vp8.encode_interframe(w, h, [("last", 0, 0)] * 4))


# ----------------------------------------------------------------------
# r13: residual coefficients (VERDICT r12 task #5)
# ----------------------------------------------------------------------
def test_token_block_codec_roundtrip_fuzz():
    """Every level array the encoder accepts must decode back
    bit-exactly through the token tree, categories, signs, and the
    no-EOB-after-ZERO rule — including zeros between nonzeros, cat6
    extremes, and a nonzero in the last position."""
    import random

    rng = random.Random(17)
    cases = []
    for _ in range(200):
        lv = [0] * 16
        for p in range(rng.randrange(0, 16)):
            if rng.random() < 0.5:
                lv[rng.randrange(16)] = rng.choice(
                    [1, -1, 2, 4, 5, 6, 7, 10, 11, 18, 19, 34, 35, 66,
                     67, 100, 2114, -2114, -500]
                )
        cases.append((lv, rng.randrange(0, 2)))
    cases.append(([0] * 16, 0))                       # all-zero -> EOB
    cases.append(([0] * 15 + [3], 0))                 # last pos nonzero
    cases.append(([1] + [0] * 14 + [-2114], 0))       # zero run inside
    for lv, first in cases:
        if first:
            lv = [0] + lv[1:]
        e = V.BoolEncoder()
        V._encode_block_coeffs(e, lv, first, 0)
        d = V.BoolDecoder(e.flush())
        got = V._decode_block_coeffs(d, first, 0)
        assert got == lv, (lv, first, got)


def test_keyframe_dc_only_residuals_closed_form():
    """DC-only residuals make every plane flat with exact closed-form
    deltas: luma rides Y2 (IWHT (8L+3)>>3 then IDCT (dc+4)>>3), chroma
    is direct ((4M)+4)>>3; prediction chains on RECONSTRUCTED
    neighbors."""
    Ls = [3, 5, 0, 12]
    mbs = []
    for L in Ls:
        y2 = [0] * 16
        y2[0] = L
        u = [[0] * 16 for _ in range(4)]
        v = [[0] * 16 for _ in range(4)]
        for b in range(4):
            u[b][0] = 2
            v[b][0] = 1
        mbs.append({"ymode": V.DC_PRED, "uvmode": V.DC_PRED,
                    "y2": y2, "u": u, "v": v})
    d = V.decode_keyframe(V.encode_keyframe_coeffs(32, 32, mbs))

    def dy(L):
        return (((8 * L + 3) >> 3) + 4) >> 3

    v00 = 128 + dy(Ls[0])
    v01 = v00 + dy(Ls[1])
    v10 = v00 + dy(Ls[2])
    v11 = ((v01 + v10 + 1) >> 1) + dy(Ls[3])
    y = d["y"]

    def flat(plane, W, r, c, size):
        return {plane[(r * size + i) * W + (c * size + j)]
                for i in range(size) for j in range(size)}

    assert flat(y, 32, 0, 0, 16) == {v00}
    assert flat(y, 32, 0, 1, 16) == {v01}
    assert flat(y, 32, 1, 0, 16) == {v10}
    assert flat(y, 32, 1, 1, 16) == {v11}
    assert flat(d["u"], 16, 0, 0, 8) == {128 + ((4 * 2 + 4) >> 3)}
    assert flat(d["v"], 16, 0, 0, 8) == {128 + ((4 * 1 + 4) >> 3)}


def test_keyframe_ac_residuals_deterministic_and_mixed_skip():
    """General AC coefficients (cat tokens, negatives, V/TM modes,
    skipped MBs interleaved with coefficient MBs so the cross-MB
    nonzero contexts and the skip context reset both exercise) decode
    deterministically and differ from pure prediction."""
    import random

    rng = random.Random(3)
    mbs = []
    for k in range(4):
        if k == 2:
            mbs.append({"ymode": V.DC_PRED, "uvmode": V.DC_PRED})  # skip
            continue
        y2 = [0] * 16
        y2[0] = rng.randrange(-10, 11)
        y2[3] = 2
        yb = []
        for _sb in range(16):
            b = [0] * 16
            b[1] = rng.choice([0, 1, -1, 5, 37, -70, 120])
            b[5] = rng.choice([0, 0, 3])
            b[15] = rng.choice([0, 2])
            yb.append(b)
        u = [[0] * 16 for _ in range(4)]
        u[0][2] = -4
        u[3][0] = 68
        mbs.append({"ymode": [V.DC_PRED, V.V_PRED, None, V.TM_PRED][k],
                    "uvmode": V.DC_PRED, "y2": y2, "y": yb, "u": u})
    f = V.encode_keyframe_coeffs(32, 32, mbs)
    d1 = V.decode_keyframe(f)
    d2 = V.decode_keyframe(f)
    assert d1["y"] == d2["y"] and d1["u"] == d2["u"]
    skip_only = V.decode_keyframe(V.encode_keyframe_skip(32, 32))
    assert d1["y"] != skip_only["y"]  # texture, not just prediction
    # encoder determinism (fixture contract)
    assert V.encode_keyframe_coeffs(32, 32, mbs) == f


def test_coeff_level_and_partition_refusals():
    big = [0] * 16
    big[0] = V.MAX_COEF_LEVEL + 1
    with pytest.raises(ValueError, match="cat6"):
        V.encode_keyframe_coeffs(16, 16, [{"y2": big}])
    bad_y = [[0] * 16 for _ in range(16)]
    bad_y[0][0] = 1  # position 0 rides Y2
    with pytest.raises(ValueError, match="rides the Y2"):
        V.encode_keyframe_coeffs(16, 16, [{"y": bad_y, "y2": [1] + [0] * 15}])
