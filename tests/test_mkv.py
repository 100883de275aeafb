"""Matroska/WebM EBML walk (sources/mkv.py): roundtrips, streaming
forms, VP8 keyframe headers, loud quarantines."""
import pytest

from shared_etl_pipelines_spark.sources import mkv


def _tracks():
    return [
        dict(number=1, uid=11, type="video", codec_id="V_VP8",
             width=320, height=176),
        dict(number=2, uid=12, type="audio", codec_id="A_OPUS",
             sample_hz=48000, channels=2),
    ]


def _clusters():
    f0 = mkv.encode_vp8_keyframe(320, 176, part_size=10, filler=b"\x01\x02")
    f1 = mkv.encode_vp8_interframe(part_size=5, filler=b"\x03")
    f2 = mkv.encode_vp8_keyframe(320, 176, part_size=12, filler=b"\x04")
    return [
        (0, [(1, 0, True, f0), (1, 40, False, f1), (2, 0, True, b"aaaa")]),
        (80, [(1, 0, True, f2), (2, -40, True, b"bbbb")]),
    ]


@pytest.mark.parametrize("unk_seg", [False, True])
@pytest.mark.parametrize("unk_clu", [False, True])
@pytest.mark.parametrize("bg", [False, True])
def test_roundtrip_all_structural_forms(unk_seg, unk_clu, bg):
    blob = mkv.encode_mkv(
        _tracks(), _clusters(), doc_type="webm", duration_ms=120,
        unknown_size_segment=unk_seg, unknown_size_clusters=unk_clu,
        block_groups=bg,
    )
    info = mkv.parse_mkv(blob, collect_frames=True)
    assert info["doc_type"] == "webm"
    assert info["timestamp_scale"] == 1_000_000
    assert info["duration_ms"] == 120
    v, a = info["tracks"]
    assert (v["track_id"], v["track_type"], v["codec_id"]) == (1, "video", "V_VP8")
    assert (v["width"], v["height"]) == (320, 176)
    assert (v["n_blocks"], v["n_keyframes"]) == (3, 2)
    assert (a["track_type"], a["codec_id"]) == ("audio", "A_OPUS")
    assert (a["sample_hz"], a["channels"]) == (48000, 2)
    assert (a["n_blocks"], a["n_keyframes"]) == (2, 2)
    # frame payloads survive both SimpleBlock and BlockGroup forms
    assert [k for _, k, _ in v["frames"]] == [True, False, True]
    assert [p for _, _, p in a["frames"]] == [b"aaaa", b"bbbb"]


def test_matroska_doctype_and_blockgroup_keyframe_semantics():
    blob = mkv.encode_mkv(
        _tracks(), _clusters(), doc_type="matroska", duration_ms=120,
        block_groups=True,
    )
    info = mkv.parse_mkv(blob)
    assert info["doc_type"] == "matroska"
    # BlockGroup with a ReferenceBlock is NOT a keyframe
    assert info["tracks"][0]["n_keyframes"] == 2


def test_vp8_header_parse_and_refusals():
    kf = mkv.encode_vp8_keyframe(640, 360, part_size=99, filler=b"xy")
    hdr = mkv.parse_vp8_frame(kf)
    assert hdr == {
        "keyframe": True, "version": 0, "show_frame": True,
        "part_size": 99, "width": 640, "height": 360,
    }
    inter = mkv.parse_vp8_frame(mkv.encode_vp8_interframe(part_size=7))
    assert inter["keyframe"] is False and inter["part_size"] == 7
    with pytest.raises(ValueError):
        mkv.parse_vp8_frame(b"\x00\x01")  # truncated tag
    with pytest.raises(ValueError):
        mkv.parse_vp8_frame(b"\x00" * 10)  # bad start code
    with pytest.raises(ValueError):
        mkv.encode_vp8_keyframe(0x4000, 10, part_size=1)  # >14-bit dims


def test_quarantines():
    blob = mkv.encode_mkv(_tracks(), _clusters(), duration_ms=120)
    with pytest.raises(ValueError):
        mkv.parse_mkv(b"RIFFxxxx")  # not EBML
    with pytest.raises(ValueError):
        mkv.parse_mkv(blob[:-5])  # truncated segment child
    with pytest.raises(ValueError):
        mkv.parse_mkv(blob[:30])  # truncated header region
    # unsupported DocType refuses
    bad = blob.replace(b"webm", b"flv!")
    with pytest.raises(ValueError):
        mkv.parse_mkv(bad)
    # block referencing an unknown track refuses
    blob2 = mkv.encode_mkv(
        _tracks()[:1], [(0, [(9, 0, True, b"zz")])], duration_ms=40
    )
    with pytest.raises(ValueError):
        mkv.parse_mkv(blob2)
    # laced blocks refuse loudly (flags lacing bits set)
    with pytest.raises(ValueError):
        mkv._parse_block(b"\x81\x00\x00\x06zz", 0, 6)


def test_encoder_refusals():
    with pytest.raises(ValueError):
        mkv.encode_mkv([], [], duration_ms=0)
    with pytest.raises(ValueError):
        mkv.encode_mkv(_tracks(), [(0, [])], duration_ms=0)


def test_default_centroid_free_duration_and_scale():
    # no Duration element -> 0; custom timestamp scale respected
    blob = mkv.encode_mkv(
        _tracks(), _clusters(), timestamp_scale=500_000, duration_ms=None
    )
    info = mkv.parse_mkv(blob)
    assert info["duration_ms"] == 0
    assert info["timestamp_scale"] == 500_000
    blob = mkv.encode_mkv(
        _tracks(), _clusters(), timestamp_scale=500_000, duration_ms=120
    )
    assert mkv.parse_mkv(blob)["duration_ms"] == 120


def test_subtitle_cues_roundtrip():
    tracks = [
        dict(number=1, uid=1, type="video", codec_id="V_VP8",
             width=64, height=48),
        dict(number=3, uid=3, type="subtitle", codec_id="S_TEXT/UTF8"),
    ]
    f0 = mkv.encode_vp8_keyframe(64, 48, part_size=3)
    clusters = [
        (0, [(1, 0, True, f0), (3, 500, True, "hello cue".encode(), 300)]),
        (2000, [(3, -500, True, "söndag".encode(), 410)]),  # abs ts 1500
    ]
    for unk in (False, True):
        blob = mkv.encode_mkv(tracks, clusters, duration_ms=3000,
                              unknown_size_clusters=unk)
        info = mkv.parse_mkv(blob, collect_frames=True)
        sub = [t for t in info["tracks"] if t["track_type"] == "subtitle"][0]
        assert sub["codec_id"] == "S_TEXT/UTF8"
        assert (sub["n_blocks"], sub["n_keyframes"]) == (2, 2)
        cues = [(ts, d, p.decode()) for ts, d, p in sub["cues"]]
        assert cues == [(500, 300, "hello cue"), (1500, 410, "söndag")]


def test_unknown_track_type_refused_by_encoder():
    with pytest.raises(ValueError):
        mkv.encode_mkv(
            [dict(number=1, uid=1, type="logo", codec_id="X")],
            [(0, [(1, 0, True, b"z")])],
        )
