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
                    "n_samples": n}


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
