"""WAV codec round trips + the Spark audio decode dispatch."""

import numpy as np
import pytest

from shared_etl_pipelines_spark.sources.wav import decode_wav, encode_wav, is_wav

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("n", [1, 17, 1000])
def test_round_trip(channels, n):
    s = RNG.integers(-32768, 32768, size=(n, channels), dtype=np.int16)
    data = encode_wav(s, 22050)
    assert is_wav(data)
    got, info = decode_wav(data)
    np.testing.assert_array_equal(got, s)
    assert info == {"sample_rate": 22050, "channels": channels, "bits": 16,
                    "format_tag": 1, "n_samples": n}


def test_mono_1d_input_and_odd_data_padding():
    s = np.array([1, -2, 3], dtype=np.int16)  # 6 data bytes (even), add 1 sample
    got, info = decode_wav(encode_wav(s))
    np.testing.assert_array_equal(got[:, 0], s)
    assert info["channels"] == 1 and info["sample_rate"] == 16000


def test_rejects_bad_inputs():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG not audio")
    data = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    data[20] = 3  # format tag -> IEEE float
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(data))


def test_decode_audio_dispatch(spark):
    from shared_etl_pipelines_spark.sources.multimodal import decode_audio

    s = np.array([100, -200, 300], dtype=np.int16)
    rows = [
        (1, "audio/wav", bytearray(encode_wav(s, 8000))),
        (2, "application/octet-stream", bytearray(b"noise")),
    ]
    assets = spark.createDataFrame(rows, "doc_id long, media_type string, blob binary")
    got = {r["doc_id"]: r for r in decode_audio(assets).collect()}
    assert got[1]["is_real_decode"] is True
    assert got[1]["sample_rate"] == 8000
    assert got[1]["n_samples"] == 3
    assert got[1]["amp_sum"] == 600
    assert got[2]["is_real_decode"] is False


def test_audio_spectral_profile_recovers_planted_tones(spark):
    """The rfft profile must invert the two-tone fixtures exactly:
    dominant bin k1 = 3 + d%13, secondary k2 = 20 + d%9, amplitude
    4000 + (d%7)*500 — through the real RIFF encode/decode. A corrupt
    blob quarantines instead of failing the batch."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.multimodal import (
        audio_spectral_profile,
        synthetic_tone_wav_assets,
    )

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    assets = synthetic_tone_wav_assets(docs)
    got = {
        r["doc_id"]: (r["dominant_bin"], r["second_bin"], r["amp_est"], r["n_frames"])
        for r in audio_spectral_profile(assets).collect()
    }
    for d in range(40):
        assert got[d] == (3 + d % 13, 20 + d % 9, 4000 + (d % 7) * 500, 4)

    corrupt = assets.select(
        "doc_id",
        "media_type",
        F.when(F.col("doc_id") == 0, F.lit(b"nota wav"))
        .otherwise(F.col("blob"))
        .alias("blob"),
    )
    prof = {r["doc_id"]: r["is_real_decode"]
            for r in audio_spectral_profile(corrupt).collect()}
    assert prof[0] is False and prof[1] is True


def test_mulaw_encoder_matches_scalar_g711_reference_full_domain():
    """The vectorized compander must agree with the canonical scalar
    G.711 algorithm on every int16 value."""
    from shared_etl_pipelines_spark.sources.wav import mulaw_compress

    def ref_encode(x: int) -> int:
        bias, clip = 0x84, 32635
        sign = 0x80 if x < 0 else 0
        m = min(abs(x), clip) + bias
        exp, mask = 7, 0x4000
        while exp > 0 and not (m & mask):
            exp -= 1
            mask >>= 1
        mant = (m >> (exp + 3)) & 0x0F
        return ~(sign | (exp << 4) | mant) & 0xFF

    xs = np.arange(-32768, 32768, dtype=np.int64)
    got = mulaw_compress(xs)
    want = np.array([ref_encode(int(v)) for v in xs], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


def test_mulaw_codepoints_round_trip_exactly():
    """decode(encode(x)) == x on all 255 mu-law codepoint magnitudes."""
    from shared_etl_pipelines_spark.sources.wav import (
        mulaw_compress,
        mulaw_expand,
    )

    vals = []
    for e in range(8):
        for m in range(16):
            mag = (((m << 3) + 0x84) << e) - 0x84
            vals += [mag, -mag]
    xs = np.array(vals, dtype=np.int16)
    np.testing.assert_array_equal(mulaw_expand(mulaw_compress(xs)), xs)


def test_mulaw_wav_container_round_trip():
    from shared_etl_pipelines_spark.sources.wav import encode_wav_mulaw

    s = np.array([8316, -8316, 0, 132 * 8 + 132 - 132], dtype=np.int16)
    blob = encode_wav_mulaw(s, 8000)
    assert is_wav(blob)
    got, info = decode_wav(blob)
    assert info["format_tag"] == 7 and info["bits"] == 8
    assert info["sample_rate"] == 8000 and info["channels"] == 1
    # 8316 is a codepoint -> exact; quantization is monotone near others
    assert got[0, 0] == 8316 and got[1, 0] == -8316


def test_mulaw_quantization_error_bounded_by_segment_width():
    """|decode(encode(x)) - clip(x)| < one mu-law step of x's segment."""
    from shared_etl_pipelines_spark.sources.wav import (
        mulaw_compress,
        mulaw_expand,
    )

    xs = RNG.integers(-32768, 32768, size=20000).astype(np.int16)
    d = mulaw_expand(mulaw_compress(xs)).astype(np.int64)
    x = np.clip(np.abs(xs.astype(np.int64)), 0, 32635) * np.sign(xs.astype(np.int64))
    seg = np.maximum((np.abs(x) + 0x84) >> 4, 8)  # step = 2^(exp+3) <= (mag+bias)/16
    assert (np.abs(d - x) <= seg).all()


def test_adpcm_nibble_arithmetic_matches_scalar_reference():
    """All 16 nibble values against an independent scalar walk, across
    every step index."""
    from shared_etl_pipelines_spark.sources.wav import (
        _IMA_INDEX_DELTA,
        _IMA_STEPS,
        _ima_decode_nibble,
    )

    for index in range(89):
        for n in range(16):
            step = int(_IMA_STEPS[index])
            diff = (step >> 3)
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            if n & 8:
                diff = -diff
            want_p = max(-32768, min(32767, 1000 + diff))
            want_i = max(0, min(88, index + int(_IMA_INDEX_DELTA[n & 7])))
            assert _ima_decode_nibble(1000, index, n) == (want_p, want_i)


def test_adpcm_encoder_decoder_track_signal():
    """The compressing encoder's output decodes back close to the
    input (bounded quantization error on a band-limited signal), with
    exact block-header samples."""
    from shared_etl_pipelines_spark.sources.wav import (
        decode_wav,
        encode_wav_adpcm,
    )

    t = np.arange(2000)
    sig = (3000 * np.sin(t / 30.0) + 500 * np.sin(t / 7.0)).astype(np.int16)
    arr, info = decode_wav(encode_wav_adpcm(sig, 8000, block_align=64))
    assert info["format_tag"] == 0x11 and info["n_samples"] == 2000
    d = arr[:, 0].astype(np.int64)
    # block headers carry the sample verbatim
    spb = (64 - 4) * 2 + 1
    np.testing.assert_array_equal(d[::spb], sig[::spb].astype(np.int64))
    assert np.abs(d - sig.astype(np.int64)).mean() < 200


def test_adpcm_planted_blocks_decode_exactly():
    from shared_etl_pipelines_spark.sources.wav import (
        _ima_decode_nibble,
        decode_wav,
        encode_wav_adpcm_blocks,
    )

    blocks = [(1000, 20, [0] * 16), (-500, 5, [4, 8, 15, 0] * 4)]
    arr, info = decode_wav(encode_wav_adpcm_blocks(blocks))
    want = []
    for pred, idx, nibs in blocks:
        want.append(pred)
        p, i = pred, idx
        for n in nibs:
            p, i = _ima_decode_nibble(p, i, n)
            want.append(p)
    assert list(arr[:, 0]) == want
    assert info["bits"] == 4 and info["channels"] == 1


def test_alaw_all_codes_identity_and_reference():
    """G.711 A-law: expand->compress is the identity over ALL 256
    codes, the table matches the scalar public-domain g711.c reference
    over the full int16 domain, and the WAV tag-6 container round
    trips."""
    import numpy as np

    from shared_etl_pipelines_spark.sources.wav import (
        alaw_compress,
        alaw_expand,
        decode_wav,
        encode_wav_alaw,
    )

    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(alaw_compress(alaw_expand(codes)), codes)

    seg_end = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]

    def ref_compress(x):  # scalar g711.c linear2alaw
        pcm = x >> 3
        if pcm >= 0:
            mask = 0xD5
        else:
            mask = 0x55
            pcm = -pcm - 1
        seg = next((i for i, e in enumerate(seg_end) if pcm <= e), 8)
        if seg >= 8:
            return 0x7F ^ mask
        aval = seg << 4
        aval |= (pcm >> (1 if seg < 2 else seg)) & 0x0F
        return aval ^ mask

    xs = np.arange(-32768, 32768, 7, dtype=np.int64)
    want = np.array([ref_compress(int(v)) for v in xs], dtype=np.uint8)
    assert np.array_equal(alaw_compress(xs), want)

    # container round trip on exact codepoint amplitudes
    s = np.full(50, ((5 % 16) * 16 + 264) << 3, dtype=np.int16)
    dec, info = decode_wav(encode_wav_alaw(s))
    assert info["format_tag"] == 6
    assert np.array_equal(dec[:, 0], s)
