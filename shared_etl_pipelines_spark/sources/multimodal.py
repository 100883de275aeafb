"""Multimodal columns: opaque binary assets + typed metadata.

Generalizes the reference's STAC asset table (item JSON + per-band COG
assets, pipelines/sentinel/download-sentinel2-l2a-michigan.yml:15-35,58):
an asset row is (id, media_type, blob BINARY, meta STRUCT). Decode /
feature-extract runs as Arrow-batched mapInPandas — the only sane way to
touch bytes at scale (whole-partition batches, zero-copy into pandas).

PNG, GIF, BMP and baseline JPEG decoding are REAL (sources/{png,gif,
bmp,jpeg}.py — pure-python codecs): decode_images dispatches on the
container signature and emits actual width/height/pixel stats. Formats
without an in-container codec still use the clearly-marked
deterministic fake in decode_assets — schema, partitioning, batch
shape, and UDF signature are production-real; only that codec call is
stubbed.
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


def synthetic_png_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-PNG fixtures from any (id, payload) table: for
    payload byte-length n, a (n//16 % 16 + 1) x (n % 16 + 1) grayscale
    image with pixel i = (id*31 + i) % 256, encoded with scanline filter
    id % 5 — so a corpus sweeps all five PNG filter types — and ODD ids
    as Adam7 INTERLACED streams (the progressive layout web exporters
    emit; same pixels, different scanline order, so every oracle is
    unchanged). Pixel stats are a closed-form function of (id, n), which
    lets a SQL oracle check the full encode->decode round trip without
    any image library."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import png

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(str(payload).encode("utf-8"))
                w = n % 16 + 1
                h = (n // 16) % 16 + 1
                i = np.arange(w * h, dtype=np.int64)
                arr = ((int(doc_id) * 31 + i) % 256).astype(np.uint8).reshape(h, w)
                ids.append(doc_id)
                blobs.append(
                    png.encode_png(
                        arr,
                        filter_type=int(doc_id) % 5,
                        interlace=int(doc_id) % 2 == 1,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "image/png", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_gif_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-GIF fixtures: same (id, n)-derived dimensions
    and pixel formula as synthetic_png_assets, but encoded as GIF87a by
    sources/gif.py — so the PNG closed-form oracle applies verbatim to
    the GIF container + LZW codec path. ODD doc_ids encode 4-pass
    INTERLACED (r8 — the progressive layout real crawled GIFs use;
    same pixels, so the oracle is untouched)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import gif

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(str(payload).encode("utf-8"))
                w = n % 16 + 1
                h = (n // 16) % 16 + 1
                i = np.arange(w * h, dtype=np.int64)
                arr = ((int(doc_id) * 31 + i) % 256).astype(np.uint8).reshape(h, w)
                ids.append(doc_id)
                blobs.append(
                    gif.encode_gif(arr, interlaced=int(doc_id) % 2 == 1)
                )
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "image/gif", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_jpeg_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-JPEG fixtures riding the codec's exactness
    contract (sources/jpeg.py): for payload byte-length n, a grayscale
    image of (n//4 % 4 + 1) x (n % 4 + 1) aligned 8x8 blocks, block k
    CONSTANT at (id*31 + k) % 256, all-ones quantization table — the
    encode->decode round trip is bit-exact, so px_sum is the closed form
    64 * sum_k((id*31 + k) % 256). doc_id % 3 sweeps the restart
    interval (0 = none), exercising DRI/RSTn across the corpus the way
    the PNG fixtures sweep scanline filters. ODD doc_ids encode
    PROGRESSIVE (SOF2, successive-approximation depth doc_id%3): real
    crawl corpora are heavily progressive, so the corpus pins both
    entropy codings against the same closed-form oracle — the exactness
    contract holds identically for both (sources/jpeg.py)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import jpeg

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                bw = n % 4 + 1
                bh = (n // 4) % 4 + 1
                k = np.arange(bw * bh, dtype=np.int64)
                blocks = ((d * 31 + k) % 256).astype(np.uint8).reshape(bh, bw)
                arr = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                ids.append(d)
                if d % 2:
                    blobs.append(
                        jpeg.encode_jpeg_progressive(
                            arr, restart_interval=d % 3, al=d % 3
                        )
                    )
                else:
                    blobs.append(jpeg.encode_jpeg(arr, restart_interval=d % 3))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "image/jpeg", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


IMAGE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "is_real_decode boolean, width int, height int, channels int, "
    "px_sum bigint"
)


def decode_images(assets: DataFrame) -> DataFrame:
    """Arrow-batched image decode with a REAL PNG path.

    Blobs carrying the PNG signature are decoded by sources/png.py
    (width/height/channels and the exact pixel sum — integer, so the
    stat is reproducible bit-for-bit); anything else falls back to the
    byte-stat stand-in with is_real_decode=false. One mapInPandas pass
    either way: at scale this is a full-scan columnar batch job, no
    shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import bmp, gif, jpeg, png

        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "media_type", "n_bytes", "is_real_decode",
                    "width", "height", "channels", "px_sum",
                )
            }
            for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["blob"]):
                blob = bytes(blob)
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["n_bytes"].append(len(blob))
                # corrupt blobs must NOT kill the scan task: a bad file in
                # a 100 TB corpus degrades to the stub row, never an abort
                arr = info = None
                try:
                    if png.is_png(blob):
                        arr, info = png.decode_png(blob)
                    elif bmp.is_bmp(blob):
                        arr, info = bmp.decode_bmp(blob)
                    elif jpeg.is_jpeg(blob):
                        arr, info = jpeg.decode_jpeg(blob)
                    elif gif.is_gif(blob):
                        arr = gif.decode_gif(blob)
                        info = {
                            "width": arr.shape[1],
                            "height": arr.shape[0],
                            "channels": 1,
                        }
                except Exception:  # struct/zlib/Value errors from bad bytes
                    arr = info = None
                if info is not None:
                    rows["is_real_decode"].append(True)
                    rows["width"].append(info["width"])
                    rows["height"].append(info["height"])
                    rows["channels"].append(info["channels"])
                    rows["px_sum"].append(int(arr.astype("int64").sum()))
                else:
                    n, checksum, fw, fh = _fake_decode(blob)
                    rows["is_real_decode"].append(False)
                    rows["width"].append(fw)
                    rows["height"].append(fh)
                    rows["channels"].append(1)
                    rows["px_sum"].append(checksum)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=IMAGE_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "is_real_decode boolean, sample_rate int, channels int, "
    "n_samples bigint, amp_sum bigint"
)


def synthetic_wav_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-WAV fixtures: for payload byte-length n, a mono
    16 kHz clip of (n % 256 + 16) samples with sample i =
    ((id*7 + i*13) % 4001) - 2000 — closed-form amplitude stats let a
    SQL oracle pin the encode->decode round trip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import wav

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(str(payload).encode("utf-8")) % 256 + 16
                i = np.arange(n, dtype=np.int64)
                s = ((int(doc_id) * 7 + i * 13) % 4001) - 2000
                ids.append(doc_id)
                blobs.append(wav.encode_wav(s.astype("<i2"), 16000))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/wav", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_animated_gif_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic GIF89a ANIMATION fixtures: doc d gets an
    (8 + d%9) x (8 + d%7) canvas, 2 + d%3 frames — frame 0 full at
    constant (d*31)%256, each later frame j overwriting the fixed
    (1,1, w//2 x h//2) rectangle with (d*31 + j*53)%256, disposal 1
    (leave), per-frame delay (d+j)%50 + 1 cs. Composed per-frame pixel
    sums are closed-form in (d, j), so a SQL oracle pins the full
    multi-frame decode + composition."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import gif

        for pdf in it:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = 8 + d % 9, 8 + d % 7
                v0 = (d * 31) % 256
                frames = [(0, 0, np.full((h, w), v0, dtype=np.uint8))]
                delays = [(d + 0) % 50 + 1]
                for j in range(1, 2 + d % 3):
                    vj = (d * 31 + j * 53) % 256
                    frames.append(
                        (1, 1, np.full((h // 2, w // 2), vj, dtype=np.uint8))
                    )
                    delays.append((d + j) % 50 + 1)
                ids.append(doc_id)
                blobs.append(gif.encode_gif_animated(frames, delays_cs=delays))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "image/gif", "blob": blobs}
            )

    return df.select(F.col(id_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def gif_frame_stats(assets: DataFrame) -> DataFrame:
    """Arrow-batched multi-frame GIF decode: one output row per
    COMPOSED frame (disposal applied, transparency respected) with its
    delay and exact pixel sum — the frame-sampling primitive for the
    large crawled-GIF slice of "video" data. Corrupt blobs quarantine
    as a single is_real_decode=false row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import gif

        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "frame_idx", "is_real_decode", "delay_cs", "px_sum"
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                try:
                    frames = gif.decode_gif_frames(blob) if gif.is_gif(blob) else None
                except Exception:
                    frames = None
                if frames is None:
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(-1)
                    rows["is_real_decode"].append(False)
                    rows["delay_cs"].append(0)
                    rows["px_sum"].append(0)
                    continue
                for j, (canvas, delay) in enumerate(frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(j)
                    rows["is_real_decode"].append(True)
                    rows["delay_cs"].append(int(delay))
                    rows["px_sum"].append(int(canvas.astype(np.int64).sum()))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, frame_idx int, is_real_decode boolean, "
        "delay_cs int, px_sum bigint",
    )


def synthetic_adpcm_wav_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic IMA ADPCM fixtures (format tag 0x11): doc d gets
    ONE block with planted header (first sample 100 + (d*37)%2000,
    step index d%41) and 2*(8 + d%32) ALL-ZERO nibbles. A zero nibble
    adds exactly step[i]>>3 and walks the index down by one, so every
    decoded sample — and therefore the amplitude sum — is a closed-form
    function of (d) over the public step table, which the SQL oracle
    embeds as a literal array. The nibble arithmetic for all 16 nibble
    values is pinned against the scalar reference in tests."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import wav

        for pdf in it:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                amp = 100 + (d * 37) % 2000
                s0 = d % 41
                m = 2 * (8 + d % 32)
                blob = wav.encode_wav_adpcm_blocks([(amp, s0, [0] * m)], 8000)
                ids.append(doc_id)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/adpcm", "blob": blobs}
            )

    return df.select(F.col(id_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_mulaw_wav_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic G.711 mu-law telephony fixtures (format tag 7,
    8 kHz mono): doc d gets 80 + d%100 samples of the CONSTANT
    amplitude (((d%16)*8 + 132) << (d%8)) - 132, sign-flipped on odd d.
    Every amplitude is an exact mu-law codepoint magnitude, so
    compand->expand is the identity and a SQL oracle computes the
    decoded |sample| sum in closed form from doc_id alone."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import wav

        for pdf in it:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = 80 + d % 100
                amp = ((((d % 16) * 8) + 132) << (d % 8)) - 132
                if d % 2 == 1:
                    amp = -amp
                s = np.full(n, amp, dtype=np.int16)
                ids.append(doc_id)
                blobs.append(wav.encode_wav_mulaw(s, 8000))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/basic", "blob": blobs}
            )

    return df.select(F.col(id_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def decode_audio(assets: DataFrame) -> DataFrame:
    """Arrow-batched audio decode with a REAL WAV path (sources/wav.py);
    non-WAV blobs fall back to the byte-stat stub with
    is_real_decode=false. amp_sum = exact sum of |sample| — an integer,
    reproducible bit-for-bit."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import wav

        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "media_type", "n_bytes", "is_real_decode",
                    "sample_rate", "channels", "n_samples", "amp_sum",
                )
            }
            for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["blob"]):
                blob = bytes(blob)
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["n_bytes"].append(len(blob))
                arr = info = None
                try:
                    if wav.is_wav(blob):
                        arr, info = wav.decode_wav(blob)
                except Exception:  # corrupt container degrades to stub
                    arr = info = None
                if info is not None:
                    rows["is_real_decode"].append(True)
                    rows["sample_rate"].append(info["sample_rate"])
                    rows["channels"].append(info["channels"])
                    rows["n_samples"].append(info["n_samples"])
                    rows["amp_sum"].append(int(np.abs(arr.astype("int64")).sum()))
                else:
                    n, checksum, _, _ = _fake_decode(blob)
                    rows["is_real_decode"].append(False)
                    rows["sample_rate"].append(0)
                    rows["channels"].append(1)
                    rows["n_samples"].append(n)
                    rows["amp_sum"].append(checksum)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=AUDIO_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, media_type string, blob binary, "
    "orig_bytes bigint, resized_bytes bigint, stride int"
)


def resize_assets(assets: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize/downsample each asset to ~``target_bytes`` via mapInPandas,
    returning a real (smaller) binary column plus size metadata.

    STUB resampler: fixed-stride byte subsampling (``blob[::stride]`` with
    stride = ceil(n/target)) standing in for a real image resize
    (``PIL.Image.resize``) or audio downsample — the binary-in/binary-out
    plumbing, Arrow batching, and schema are production-real; only the
    resample kernel is stubbed.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "media_type", "blob", "orig_bytes", "resized_bytes", "stride"
            )}
            for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["blob"]):
                n = len(blob)
                stride = max(1, -(-n // target_bytes))
                out = bytes(blob[::stride])
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["blob"].append(out)
                rows["orig_bytes"].append(n)
                rows["resized_bytes"].append(len(out))
                rows["stride"].append(stride)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset bigint, frame_len bigint"


def sample_frames(
    assets: DataFrame, frame_bytes: int = 100, max_frames: int = 3
) -> DataFrame:
    """Frame sampling over video-like blobs: 1->N row expansion inside
    mapInPandas (the real plumbing for per-frame work). STUB sampler:
    frames are fixed-stride byte windows — a real one would seek keyframes
    via the codec; the fan-out shape, schema and batching are identical.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in ("doc_id", "frame_idx", "frame_offset", "frame_len")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n = len(blob)
                n_frames = min(max_frames, n // frame_bytes + 1)
                for i in range(n_frames):
                    off = i * frame_bytes
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_len"].append(min(frame_bytes, n - off))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: blob -> fixed-dim float vector via mapInPandas.
    STUB featurizer (deterministic byte-length arithmetic standing in for
    an embedding model); output column is array<float> so the result
    plugs straight into operators.similarity (brute_force_topk etc.).
    """
    schema = "doc_id bigint, features array<float>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                [((len(b) * (j + 1)) % 251) / 251.0 for j in range(dim)]
                for b in pdf["blob"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "features": feats})

    return assets.mapInPandas(batches, schema=schema)


def synthetic_bmp_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-BMP fixtures: for payload byte-length n, an RGB
    (n%6+2) x ((n//6)%5+2) image with flat pixel byte j = (id*13 + j) % 256
    (RGB, rows top-down) — closed-form stats for the SQL oracle, padded
    DIB rows and the vertical flip exercised on every asset."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import bmp

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(str(payload).encode("utf-8"))
                w, h = n % 6 + 2, (n // 6) % 5 + 2
                j = np.arange(w * h * 3, dtype=np.int64)
                arr = ((int(doc_id) * 13 + j) % 256).astype(np.uint8).reshape(h, w, 3)
                ids.append(doc_id)
                blobs.append(bmp.encode_bmp(arr))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "image/bmp", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_avi_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-AVI fixtures: n%3+2 frames of RGB (n%6+2) x
    ((n//6)%5+2), frame f flat pixel byte j = (id*31 + f*11 + j) % 256 —
    the whole container (RIFF lists, avih/strh/strf, '00db' DIB frames)
    is written by sources/avi.py, so decoding exercises a real parse."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import avi

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(str(payload).encode("utf-8"))
                nf, w, h = n % 3 + 2, n % 6 + 2, (n // 6) % 5 + 2
                f = np.arange(nf, dtype=np.int64)[:, None]
                j = np.arange(w * h * 3, dtype=np.int64)[None, :]
                px = ((int(doc_id) * 31 + f * 11 + j) % 256).astype(np.uint8)
                ids.append(doc_id)
                blobs.append(avi.encode_avi(px.reshape(nf, h, w, 3), fps=10))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "video/avi", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_mjpeg_avi_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic MJPEG-only AVI fixtures (VERDICT r9 task #3): the
    dominant real-world AVI flavor, one baseline JPEG per '00dc' chunk
    (sources/jpeg.py bridged through sources/avi.py). n%4+2 FLAT frames
    of RGB (n%6+2) x ((n//6)%5+2); frame f's every pixel byte is
    (id*37) % 200 + f*7 (max 199 + 4*7 = 227 < 256 — never wraps).
    Flat frames are one constant <=8x8 block per MCU, so the lossy
    JPEG path (all-ones quantization tables) is BIT-EXACT and a SQL
    oracle replays px_sum = w*h*3 * value in closed form. doc_id%3==0
    additionally strips DHT — the format's notorious default-table
    convention (decoder falls back to the Annex K tables)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import avi

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                nf, w, h = n % 4 + 2, n % 6 + 2, (n // 6) % 5 + 2
                v = np.array(
                    [(d * 37) % 200 + f * 7 for f in range(nf)],
                    dtype=np.uint8,
                )
                px = np.repeat(v[:, None], w * h * 3, axis=1).reshape(
                    nf, h, w, 3
                )
                ids.append(doc_id)
                blobs.append(
                    avi.encode_avi(
                        px, fps=10, codec="MJPG", omit_dht=(d % 3 == 0)
                    )
                )
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "video/avi", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_vp8_webm_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic VP8-in-WebM fixtures (VERDICT r10 task #5): real
    entropy-coded skip-MB keyframes (sources/vp8.py) in a real WebM
    container (sources/mkv.py). Per doc: n%3+1 keyframes of
    16*(d%3+2) x 16*(d%2+2); frame f's luma mode rotates with
    (d+f)%4 over DC/V/H/TM, whose skip-MB reconstructions are the
    exact uniforms 128/127/129/129 (chroma DC = 128), so a SQL oracle
    replays every pixel sum in closed form."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mkv, vp8

        modes = (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED)
        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                nf = n % 3 + 1
                w, h = 16 * (d % 3 + 2), 16 * (d % 2 + 2)
                frames = [
                    (1, f * 33, True,
                     vp8.encode_keyframe_skip(w, h, y_mode=modes[(d + f) % 4]))
                    for f in range(nf)
                ]
                blob = mkv.encode_mkv(
                    tracks=[{
                        "number": 1, "uid": d + 1, "type": "video",
                        "codec_id": "V_VP8", "width": w, "height": h,
                    }],
                    clusters=[(0, frames)],
                    doc_type="webm",
                )
                ids.append(doc_id)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "video/webm", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_vp8_pframe_webm_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """VP8 sequences WITH inter frames (r12, VERDICT r11 task #4): one
    skip-MB keyframe (uniform plane 128/127/129/129 by d%4 mode
    rotation) followed by n%3+2 motion-compensated P-frames — frame f
    references ['last','golden','altref'][(d+f)%3] with global even-pel
    motion (2*((d+f)%5-2), 2*((d+f)%3-1)), all MBs skipped, so every
    pixel and every decoded MV replays in closed form."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mkv, vp8

        modes = (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED)
        refs = ("last", "golden", "altref")
        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                w, h = 16 * (d % 3 + 2), 16 * (d % 2 + 2)
                n_mb = (w // 16) * (h // 16)
                frames = [
                    (1, 0, True,
                     vp8.encode_keyframe_skip(w, h, y_mode=modes[d % 4]))
                ]
                for f in range(1, n % 3 + 3):
                    dx = 2 * ((d + f) % 5 - 2)
                    dy = 2 * ((d + f) % 3 - 1)
                    frames.append(
                        (1, f * 33, False,
                         vp8.encode_interframe(
                             w, h, [(refs[(d + f) % 3], dx, dy)] * n_mb
                         ))
                    )
                blob = mkv.encode_mkv(
                    tracks=[{
                        "number": 1, "uid": d + 1, "type": "video",
                        "codec_id": "V_VP8", "width": w, "height": h,
                    }],
                    clusters=[(0, frames)],
                    doc_type="webm",
                )
                ids.append(doc_id)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "video/webm", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, is_real_decode boolean, "
    "width int, height int, px_sum bigint"
)


def sample_video_frames(assets: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling with REAL container paths: every ``stride``-th
    frame of an uncompressed/MJPEG AVI (sources/avi.py) or an
    MJPEG-in-MP4 (sources/mp4.py, r8) is decoded and reduced to
    per-frame pixel stats — the 1->N fan-out a video pipeline feeds to
    a vision encoder. Blobs with no decodable path (non-container
    bytes, corrupt containers, MP4 video codecs without an in-repo
    decoder like avc1/H.264) keep the documented byte-window stub
    (is_real_decode=false) — mp4_keyframe_stats is the loud-reason
    variant of that quarantine. One Arrow-batched mapInPandas pass, no
    shuffle; at 100 TB this is a full-scan columnar batch job whose
    parallelism is the input partitioning."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import avi, mkv, mp4, vp8

        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "frame_idx", "is_real_decode",
                    "width", "height", "px_sum",
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                frames = info = None
                try:
                    if avi.is_avi(blob):
                        frames, info = avi.decode_avi(blob)
                    elif mp4.is_mp4(blob):
                        dec, minfo = mp4.decode_mp4_frames(
                            blob, keyframes_only=False
                        )
                        frames = [a for _, a in dec]
                        vt = [
                            t for t in minfo["tracks"]
                            if t["handler"] == "vide"
                        ][0]
                        info = {
                            "width": vt["width"],
                            "height": vt["height"],
                            "n_frames": len(frames),
                        }
                    elif mkv.is_mkv(blob):
                        # WebM/Matroska VP8 keyframes: real pixel decode
                        # via sources/vp8.py (skip-MB streams; anything
                        # else raises and degrades to the stub below)
                        parsed = mkv.parse_mkv(blob, collect_frames=True)
                        vt = [
                            t for t in parsed["tracks"]
                            if t.get("codec_id") == "V_VP8"
                            and t["track_type"] == "video"
                        ][0]
                        # full sequence decode (r12): keyframes AND
                        # motion-compensated inter frames, reference
                        # buffers maintained per the refresh semantics
                        decoded = vp8.decode_sequence(
                            [p for _bi, _key, p in vt["frames"]]
                        )
                        frames = [
                            np.frombuffer(
                                out["y"] + out["u"] + out["v"],
                                dtype=np.uint8,
                            )
                            for out in decoded
                        ]
                        info = {
                            "width": vt["width"],
                            "height": vt["height"],
                            "n_frames": len(frames),
                        }
                except Exception:  # corrupt/undecodable degrades to stub
                    frames = info = None
                if info is not None:
                    for idx in range(0, info["n_frames"], stride):
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(idx)
                        rows["is_real_decode"].append(True)
                        rows["width"].append(info["width"])
                        rows["height"].append(info["height"])
                        rows["px_sum"].append(int(frames[idx].astype("int64").sum()))
                else:
                    n, checksum, fw, fh = _fake_decode(blob)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(0)
                    rows["is_real_decode"].append(False)
                    rows["width"].append(fw)
                    rows["height"].append(fh)
                    rows["px_sum"].append(checksum)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)


RESIZED_IMAGE_SCHEMA = (
    "doc_id bigint, media_type string, is_real_resize boolean, "
    "out_width int, out_height int, px_sum bigint, blob binary"
)


def resize_images(assets: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """REAL image resize for formats with an in-repo codec (PNG, BMP):
    decode -> nearest-neighbor resample to (out_h, out_w) -> re-encode in
    the same format. Source pixel for target (ty, tx) is
    (ty*h // out_h, tx*w // out_w) — pure integer math, so a SQL oracle
    can recompute the resized pixel sum in closed form. Non-decodable
    formats keep the documented byte-stride stub (is_real_resize=false,
    stats from the stub path). One Arrow-batched mapInPandas pass."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import bmp, png

        def nn(arr):
            h, w = arr.shape[:2]
            ys = (np.arange(out_h) * h) // out_h
            xs = (np.arange(out_w) * w) // out_w
            return arr[np.ix_(ys, xs)]

        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "media_type", "is_real_resize",
                    "out_width", "out_height", "px_sum", "blob",
                )
            }
            for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["blob"]):
                blob = bytes(blob)
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                small = None
                try:
                    if png.is_png(blob):
                        arr, _ = png.decode_png(blob)
                        small = nn(arr)
                        out = png.encode_png(small.astype("uint8"))
                    elif bmp.is_bmp(blob):
                        arr, _ = bmp.decode_bmp(blob)
                        small = nn(arr)
                        out = bmp.encode_bmp(small.astype("uint8"))
                except Exception:  # corrupt image degrades to the stub
                    small = None
                if small is None:
                    n = len(blob)
                    stride = max(1, -(-n // (out_w * out_h)))
                    out = bytes(blob[::stride])
                if small is not None:
                    rows["is_real_resize"].append(True)
                    rows["out_width"].append(out_w)
                    rows["out_height"].append(out_h)
                    rows["px_sum"].append(int(small.astype("int64").sum()))
                else:
                    rows["is_real_resize"].append(False)
                    rows["out_width"].append(0)
                    rows["out_height"].append(0)
                    rows["px_sum"].append(len(out))
                rows["blob"].append(out)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=RESIZED_IMAGE_SCHEMA)


def synthetic_patterned_png_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL-PNG fixtures with PLANTED near-duplicates for perceptual
    hashing: 16x16 grayscale, pixel i = ((i+1)*(2*(id//8)+17) +
    (id%8)*3) % 251 — docs in the same group of 8 share a base pattern
    with a tiny brightness shift (graded small Hamming distances), and
    the per-group multiplier over a prime modulus makes cross-group
    hashes disjoint (measured: 826 within / 0 cross pairs at Hamming<=3
    on the sf0.01 corpus). Encoded through sources/png.py sweeping all
    five scanline filters, so the hash pipeline exercises the real
    codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import png

        for pdf in it:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                i = np.arange(256, dtype=np.int64)
                arr = (
                    ((i + 1) * (2 * (d // 8) + 17) + (d % 8) * 3) % 251
                ).astype(np.uint8).reshape(16, 16)
                ids.append(d)
                blobs.append(png.encode_png(arr, filter_type=d % 5))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "image/png", "blob": blobs}
            )

    return df.select(F.col(id_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_patterned_jpeg_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL-JPEG fixtures with PLANTED near-duplicates for perceptual
    hashing: a 64x64 grayscale image of 8x8 CONSTANT blocks, block k =
    ((k+1)*(2*(id//8)+17) + (id%8)*3) % 251 — the same group-of-8
    brightness-shift structure as the PNG patterned corpus. Because
    ahash_images samples pixel (8y, 8x) of a 64x64 image — exactly one
    pixel per block — and the lossy codec is bit-exact on block-constant
    input (all-ones qtable), the aHash closed form over the block values
    applies verbatim to the JPEG path: Huffman + DCT included. ODD
    doc_ids encode PROGRESSIVE (SOF2) — the dominant real-crawl flavor —
    so near-dup pairs routinely span a baseline and a progressive blob,
    exactly as a re-crawled image pair does in the wild."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import jpeg

        for pdf in it:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                k = np.arange(64, dtype=np.int64)
                blocks = (
                    ((k + 1) * (2 * (d // 8) + 17) + (d % 8) * 3) % 251
                ).astype(np.uint8).reshape(8, 8)
                arr = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                ids.append(d)
                if d % 2:
                    blobs.append(
                        jpeg.encode_jpeg_progressive(
                            arr, restart_interval=d % 3, al=d % 3
                        )
                    )
                else:
                    blobs.append(jpeg.encode_jpeg(arr, restart_interval=d % 3))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "image/jpeg", "blob": blobs}
            )

    return df.select(F.col(id_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def ahash_images(assets: DataFrame) -> DataFrame:
    """64-bit average-hash per image from REAL decoded pixels: nearest-
    neighbor 8x8 resample, bit = sample*64 >= sum(samples) (pure integer
    compare — no FP mean), packed as two 32-bit halves so the values
    stay positive BIGINTs in every engine. Corrupt blobs degrade to the
    all-zero hash with is_real_decode=false, never an aborted task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import bmp, jpeg, png

        for pdf in it:
            rows = {k: [] for k in ("doc_id", "is_real_decode", "h_lo", "h_hi")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                arr = None
                try:
                    if png.is_png(blob):
                        arr, _ = png.decode_png(blob)
                    elif bmp.is_bmp(blob):
                        arr, _ = bmp.decode_bmp(blob)
                    elif jpeg.is_jpeg(blob):
                        arr, _ = jpeg.decode_jpeg(blob)
                except Exception:
                    arr = None
                rows["doc_id"].append(doc_id)
                if arr is None:
                    rows["is_real_decode"].append(False)
                    rows["h_lo"].append(0)
                    rows["h_hi"].append(0)
                    continue
                if arr.ndim == 3:  # first channel of color images
                    arr = arr[:, :, 0]
                h, w = arr.shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(8) * w) // 8
                samp = arr[np.ix_(ys, xs)].astype(np.int64).reshape(-1)
                bits = (samp * 64 >= samp.sum()).astype(np.int64)
                lo = int((bits[:32] << np.arange(32)).sum())
                hi = int((bits[32:] << np.arange(32)).sum())
                rows["is_real_decode"].append(True)
                rows["h_lo"].append(lo)
                rows["h_hi"].append(hi)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches, "doc_id bigint, is_real_decode boolean, h_lo long, h_hi long"
    )


def synthetic_patterned_wav_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL-WAV fixtures with PLANTED near-duplicate waveforms: 640
    int16 samples, sample i = ((i+1)*(2*(id//8)+23) + (id%8)*5) % 401
    - 200 — docs in a group of 8 share an energy envelope with a small
    amplitude shift. Encoded as real RIFF/PCM by sources/wav.py."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import wav

        for pdf in it:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                i = np.arange(640, dtype=np.int64)
                s = ((i + 1) * (2 * (d // 8) + 23) + (d % 8) * 5) % 401 - 200
                ids.append(d)
                blobs.append(wav.encode_wav(s.astype(np.int16)))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/wav", "blob": blobs}
            )

    return df.select(F.col(id_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def audio_fingerprints(assets: DataFrame, n_frames: int = 64) -> DataFrame:
    """64-bit energy fingerprint per audio blob from REAL decoded
    samples: the stream splits into n_frames equal frames, bit f =
    frame_abs_energy * n_frames >= total_abs_energy (integer-exact
    threshold), packed as two 32-bit halves. Corrupt blobs degrade to
    the zero hash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import wav

        for pdf in it:
            rows = {k: [] for k in ("doc_id", "is_real_decode", "h_lo", "h_hi")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                arr = None
                try:
                    if wav.is_wav(blob):
                        arr, _ = wav.decode_wav(blob)
                except Exception:
                    arr = None
                rows["doc_id"].append(doc_id)
                if arr is None or arr.size < n_frames:
                    rows["is_real_decode"].append(False)
                    rows["h_lo"].append(0)
                    rows["h_hi"].append(0)
                    continue
                mono = np.abs(arr.astype(np.int64)).reshape(len(arr), -1)[:, 0]
                fl = len(mono) // n_frames
                frames = mono[: fl * n_frames].reshape(n_frames, fl).sum(axis=1)
                bits = (frames * n_frames >= frames.sum()).astype(np.int64)
                rows["is_real_decode"].append(True)
                rows["h_lo"].append(int((bits[:32] << np.arange(32)).sum()))
                rows["h_hi"].append(int((bits[32:] << np.arange(32)).sum()))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches, "doc_id bigint, is_real_decode boolean, h_lo long, h_hi long"
    )


def synthetic_scene_avi_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """REAL-AVI fixtures with PLANTED scene cuts for keyframe
    detection: n%3+4 frames of RGB (n%6+2) x ((n//6)%5+2); frame f flat
    pixel byte j = (id*31 + j) % 120 + f*11 + (f//3)*60 — consecutive
    frames inside a scene brighten by +11, every third transition
    (f=2->3) jumps an extra +60 (the cut). Values peak at
    119 + 55 + 60 = 234 < 256, so deltas NEVER wrap: within-scene
    |delta| is exactly 11 per pixel and a cut exactly 71 — the
    threshold argument in video_keyframe_detect is unconditional. Same
    closed-form-oracle discipline as synthetic_avi_assets.

    ODD doc_ids are MJPEG ('00dc' chunks, the dominant real container —
    doc_id%4==1 additionally strips DHT, the format's notorious
    default-table convention): their frames drop the per-byte term
    (byte value = (id*31)%120 + f*11 + (f//3)*60 — FLAT frames, i.e.
    one constant <=8x8 block), so the lossy JPEG path is bit-exact and
    the same closed-form delta/mean oracle applies with base_sum =
    np * ((id*31)%120)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import avi

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                nf, w, h = n % 3 + 4, n % 6 + 2, (n // 6) % 5 + 2
                f = np.arange(nf, dtype=np.int64)[:, None]
                j = np.arange(w * h * 3, dtype=np.int64)[None, :]
                if d % 2:
                    px = (
                        (d * 31) % 120 + 0 * j + f * 11 + (f // 3) * 60
                    ).astype(np.uint8)
                else:
                    px = (
                        (d * 31 + j) % 120 + f * 11 + (f // 3) * 60
                    ).astype(np.uint8)
                ids.append(doc_id)
                blobs.append(
                    avi.encode_avi(
                        px.reshape(nf, h, w, 3),
                        fps=10,
                        codec="MJPG" if d % 2 else "DIB",
                        omit_dht=(d % 4 == 1),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "video/avi", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


DELTA_SCHEMA = "doc_id bigint, frame_idx int, mean_px double, mean_delta double"


def frame_deltas(assets: DataFrame) -> DataFrame:
    """Per-transition statistics from REAL decoded AVI frames — the
    signal behind keyframe/scene-cut extraction (a frame whose delta to
    its predecessor exceeds a threshold starts a new scene; curation
    pipelines sample one frame per scene instead of every Nth). One
    decode per video inside mapInPandas, all arithmetic vectorized
    numpy; emits ``(doc_id, frame_idx, mean_px, mean_delta)`` for
    frame_idx >= 1 — ``mean_px`` (the frame's mean pixel value) pins
    decoded VALUES, ``mean_delta`` the transition structure. Corrupt
    blobs are quarantined (dropped) like the image decoders."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import avi

        for pdf in it:
            rows: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "mean_px": [], "mean_delta": []
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    frames, _ = avi.decode_avi(bytes(blob))
                except Exception:
                    continue
                a = frames.astype(np.int64)
                d = np.abs(a[1:] - a[:-1]).mean(axis=(1, 2, 3))
                m = a.mean(axis=(1, 2, 3))
                for i, dv in enumerate(d, start=1):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(i)
                    rows["mean_px"].append(float(m[i]))
                    rows["mean_delta"].append(float(dv))
            yield pd.DataFrame(rows)

    return assets.select("doc_id", "blob").mapInPandas(batches, DELTA_SCHEMA)


def synthetic_tone_wav_assets(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL-WAV two-tone fixtures with closed-form spectra: doc_id d
    gets 1024 samples of A1*sin(2*pi*k1*i/256) + A2*sin(2*pi*k2*i/256)
    rounded to int16, with k1 = 3 + d%13 cycles/frame (the dominant
    tone, A1 = 4000 + (d%7)*500), k2 = 20 + d%9 (the secondary tone,
    A2 = 1500). Both k are integers, so over a 256-sample rectangular
    frame each tone lands EXACTLY in its own DFT bin: |X[k]| = A*N/2 in
    exact arithmetic, and int16 rounding perturbs any bin magnitude by
    at most ~sqrt(N)/2 << A*N/2 — dominant/secondary bin and
    round(2*|X[k1]|/N) == A1 are all hash-stable integers a SQL oracle
    computes straight from doc_id."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import wav

        i = np.arange(1024, dtype=np.float64)
        for pdf in it:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                k1, k2 = 3 + d % 13, 20 + d % 9
                a1 = 4000 + (d % 7) * 500
                s = a1 * np.sin(2 * np.pi * k1 * i / 256.0) + 1500.0 * np.sin(
                    2 * np.pi * k2 * i / 256.0
                )
                ids.append(d)
                blobs.append(wav.encode_wav(np.round(s).astype(np.int16), 16000))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/wav", "blob": blobs}
            )

    return df.select(F.col(id_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def audio_spectral_profile(assets: DataFrame, frame_len: int = 256) -> DataFrame:
    """REAL spectral analysis over decoded WAV samples: each clip is
    split into rectangular ``frame_len`` frames, the magnitude spectrum
    (numpy rfft) is averaged across frames, and the profile emits the
    dominant and secondary non-DC bins plus the dominant tone's
    amplitude estimate round(2*|X[dom]|/N) — the textbook sinusoid
    inversion, integer-exact for int16 tones (see
    synthetic_tone_wav_assets for the error budget). Corrupt or
    too-short blobs quarantine as is_real_decode=false rows instead of
    failing the batch. Arrow-batched mapInPandas; per-row cost is
    O(samples log frame_len), no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import wav

        for pdf in it:
            rows = {
                k: []
                for k in (
                    "doc_id", "is_real_decode", "n_frames",
                    "dominant_bin", "second_bin", "amp_est",
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                arr = None
                try:
                    if wav.is_wav(blob):
                        arr, _ = wav.decode_wav(blob)
                except Exception:
                    arr = None
                rows["doc_id"].append(doc_id)
                if arr is None or len(arr) < frame_len:
                    rows["is_real_decode"].append(False)
                    rows["n_frames"].append(0)
                    rows["dominant_bin"].append(-1)
                    rows["second_bin"].append(-1)
                    rows["amp_est"].append(0)
                    continue
                mono = arr.astype(np.float64).reshape(len(arr), -1)[:, 0]
                nf = len(mono) // frame_len
                frames = mono[: nf * frame_len].reshape(nf, frame_len)
                mag = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)
                mag[0] = 0.0  # exclude DC from peak picking
                dom = int(np.argmax(mag))
                amp = int(round(2.0 * mag[dom] / frame_len))
                mag[dom] = 0.0
                second = int(np.argmax(mag))
                rows["is_real_decode"].append(True)
                rows["n_frames"].append(nf)
                rows["dominant_bin"].append(dom)
                rows["second_bin"].append(second)
                rows["amp_est"].append(amp)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, is_real_decode boolean, n_frames int, "
        "dominant_bin int, second_bin int, amp_est int",
    )


def synthetic_commented_jpeg_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """REAL-JPEG fixtures for header triage: same closed-form geometry
    as synthetic_jpeg_assets (payload byte-length n -> (n//4%4+1) x
    (n%4+1) blocks), plus a COM segment 'cam-{d%5}' on every blob.
    Even doc_ids encode baseline (SOF0, DRI = d%3), odd PROGRESSIVE
    (SOF2, Al = d%3, no DRI) whose scan script for grayscale is exactly
    3 + 2*Al scans — every header field a closed form in doc_id."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import jpeg

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                bw = n % 4 + 1
                bh = (n // 4) % 4 + 1
                k = np.arange(bw * bh, dtype=np.int64)
                blocks = ((d * 31 + k) % 256).astype(np.uint8).reshape(bh, bw)
                arr = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                com = f"cam-{d % 5}".encode()
                ids.append(d)
                if d % 2:
                    blobs.append(
                        jpeg.encode_jpeg_progressive(arr, al=d % 3, comment=com)
                    )
                else:
                    blobs.append(
                        jpeg.encode_jpeg(arr, restart_interval=d % 3, comment=com)
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "image/jpeg", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def jpeg_metadata_profile(assets: DataFrame) -> DataFrame:
    """Header-only triage over JPEG blobs (sources/jpeg.py scan_markers
    — NO entropy decode): frame type, geometry, scan count, restart
    interval, first comment. The pass a crawl pipeline runs over
    billions of images before deciding what to decode — a few hundred
    header bytes each instead of the DCT pipeline. Corrupt headers
    quarantine as is_jpeg=false rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import jpeg

        for pdf in it:
            rows = {
                k: []
                for k in (
                    "doc_id", "is_jpeg", "sof", "width", "height",
                    "n_scans", "restart_interval", "comment",
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                rows["doc_id"].append(doc_id)
                try:
                    m = jpeg.scan_markers(bytes(blob))
                except Exception:
                    m = None
                if m is None or m["sof"] is None:
                    rows["is_jpeg"].append(False)
                    rows["sof"].append("")
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["n_scans"].append(0)
                    rows["restart_interval"].append(0)
                    rows["comment"].append("")
                else:
                    rows["is_jpeg"].append(True)
                    rows["sof"].append(m["sof"])
                    rows["width"].append(m["width"])
                    rows["height"].append(m["height"])
                    rows["n_scans"].append(m["n_scans"])
                    rows["restart_interval"].append(m["restart_interval"])
                    rows["comment"].append(m["comment"] or "")
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, is_jpeg boolean, sof string, width int, height int, "
        "n_scans int, restart_interval int, comment string",
    )


def synthetic_mp4_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-MP4 fixtures (sources/mp4.py): for payload
    byte-length n, nf = n%3+2 frames of (n//4%4+1) x (n%4+1) aligned
    8x8 blocks, frame f block k CONSTANT at (id*31 + f*11 + k) % 256 —
    the MJPEG-in-MP4 exactness contract (all-ones qtable). doc_id%3==0
    blobs carry an 'avc1' video track instead (deterministic pseudo-NAL
    payloads, 24 + id%8 + i bytes each) with a REAL avcC/SPS record —
    profile cycling 66/77/100 by (id//3)%3, level 30+(id//3)%4 — so the
    container SCANS fine and yields stream parameters, but frame decode
    must quarantine loudly. ODD doc_ids add a stub 'mp4a' audio track
    with n%2+1 samples and an esds AudioSpecificConfig (AAC-LC, rate
    index 3+(id//2)%8, channels (id//4)%2+1). Keyframes every 2nd
    sample, chunks of 3 samples (multi-entry stco + two-run stsc on
    4-frame docs)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import mp4

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                nf = n % 3 + 2
                bw, bh = n % 4 + 1, (n // 4) % 4 + 1
                w, h = 8 * bw, 8 * bh
                audio = (
                    [b"a" * (10 + i) for i in range(n % 2 + 1)]
                    if d % 2
                    else None
                )
                aac = (
                    (
                        mp4._AAC_RATES[3 + (d // 2) % 8],
                        (d // 4) % 2 + 1,
                    )
                    if d % 2
                    else None
                )
                if d % 3 == 0:
                    samples = [
                        bytes(
                            (d + i * 7 + j) % 256
                            for j in range(24 + d % 8 + i)
                        )
                        for i in range(nf)
                    ]
                    blob = mp4.encode_mp4(
                        samples, w, h, fps=10, codec=b"avc1",
                        keyframe_interval=2, samples_per_chunk=3,
                        audio_samples=audio,
                        avc_params=(
                            (66, 77, 100)[(d // 3) % 3],
                            30 + (d // 3) % 4,
                        ),
                        aac_params=aac,
                    )
                else:
                    k = np.arange(bw * bh, dtype=np.int64)
                    frames = []
                    for f in range(nf):
                        blocks = (
                            ((d * 31 + f * 11 + k) % 256)
                            .astype(np.uint8)
                            .reshape(bh, bw)
                        )
                        frames.append(np.repeat(np.repeat(blocks, 8, 0), 8, 1))
                    blob = mp4.encode_mp4_mjpeg(
                        np.stack(frames), fps=10, keyframe_interval=2,
                        samples_per_chunk=3, audio_samples=audio,
                        aac_params=aac,
                    )
                ids.append(d)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "video/mp4", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def mp4_track_scan(assets: DataFrame) -> DataFrame:
    """Arrow-batched ISO-BMFF container scan: one row per track with
    handler, codec fourcc, dimensions, sample/keyframe counts and
    duration — the metadata pass a crawl video pipeline runs over
    EVERY mp4 before deciding what to decode. Works for codecs we
    cannot decode (avc1/H.264 tracks scan fine); corrupt containers
    quarantine as a single handler='corrupt' row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mp4

        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "track_id", "handler", "codec", "width",
                    "height", "n_samples", "n_keyframes", "duration_ms",
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                try:
                    info = mp4.parse_mp4(blob) if mp4.is_mp4(blob) else None
                except Exception:
                    info = None
                if info is None:
                    rows["doc_id"].append(doc_id)
                    rows["track_id"].append(-1)
                    rows["handler"].append("corrupt")
                    rows["codec"].append("")
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["n_samples"].append(0)
                    rows["n_keyframes"].append(0)
                    rows["duration_ms"].append(0)
                    continue
                for t in info["tracks"]:
                    rows["doc_id"].append(doc_id)
                    rows["track_id"].append(int(t["track_id"]))
                    rows["handler"].append(t["handler"])
                    rows["codec"].append(t["codec"])
                    rows["width"].append(int(t["width"] or 0))
                    rows["height"].append(int(t["height"] or 0))
                    rows["n_samples"].append(int(t["n_samples"]))
                    rows["n_keyframes"].append(int(t["n_keyframes"]))
                    rows["duration_ms"].append(int(t["duration_ms"]))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, track_id int, handler string, codec string, "
        "width int, height int, n_samples int, n_keyframes int, "
        "duration_ms bigint",
    )


def mp4_codec_params(assets: DataFrame) -> DataFrame:
    """Codec STREAM parameters from stsd extradata (r9, VERDICT r8
    item 1): avc1/avc3 tracks decode their avcC AVCDecoderConfiguration
    record — exp-Golomb SPS parse to profile/level/bit-depth/chroma and
    the DISPLAY size (mb-aligned coded frame minus the crop rectangle,
    which the fixtures deliberately exercise so the parse can't echo
    container dims); mp4a tracks decode their esds AudioSpecificConfig
    to object-type/sample-rate/channels. Tracks without parseable
    extradata emit has_params=false rows — the scan never guesses. One
    mapInPandas pass, no shuffle; per-file parallelism."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mp4

        cols = (
            "doc_id", "track_id", "handler", "codec", "has_params",
            "profile_idc", "level_idc", "chroma_format", "bit_depth",
            "sps_width", "sps_height", "aac_object_type",
            "aac_sample_rate", "aac_channels", "reason",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}

            def emit(doc_id, track_id, handler, codec, params):
                rows["doc_id"].append(doc_id)
                rows["track_id"].append(track_id)
                rows["handler"].append(handler)
                rows["codec"].append(codec)
                p = params or {}
                err = p.get("error")
                ok = bool(p) and err is None and (
                    "profile_idc" in p or "sample_rate" in p
                )
                rows["has_params"].append(ok)
                rows["profile_idc"].append(int(p.get("profile_idc", 0)))
                rows["level_idc"].append(int(p.get("level_idc", 0)))
                rows["chroma_format"].append(
                    int(p.get("chroma_format_idc", 0))
                )
                rows["bit_depth"].append(int(p.get("bit_depth", 0)))
                rows["sps_width"].append(int(p.get("width", 0)))
                rows["sps_height"].append(int(p.get("height", 0)))
                rows["aac_object_type"].append(int(p.get("object_type", 0)))
                rows["aac_sample_rate"].append(int(p.get("sample_rate", 0)))
                rows["aac_channels"].append(int(p.get("channels", 0)))
                rows["reason"].append(
                    err if err else ("ok" if ok else "no_extradata")
                )

            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                try:
                    info = mp4.parse_mp4(blob) if mp4.is_mp4(blob) else None
                except Exception:
                    info = None
                if info is None:
                    emit(doc_id, -1, "corrupt", "", {"error": "corrupt"})
                    continue
                for t in info["tracks"]:
                    emit(
                        doc_id, int(t["track_id"]), t["handler"],
                        t["codec"], t.get("codec_params"),
                    )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, track_id int, handler string, codec string, "
        "has_params boolean, profile_idc int, level_idc int, "
        "chroma_format int, bit_depth int, sps_width int, sps_height "
        "int, aac_object_type int, aac_sample_rate int, aac_channels "
        "int, reason string",
    )


def mp4_keyframe_stats(assets: DataFrame) -> DataFrame:
    """Keyframe sampling with a REAL MP4 path: every stss sync sample
    of the first video track decodes (MJPEG-in-MP4 via sources/jpeg.py)
    to per-frame pixel stats. Video codecs without an in-repo decoder
    (avc1/H.264) quarantine LOUDLY as one is_real_decode=false row
    carrying the codec fourcc in ``reason`` — never fabricated pixels.
    One mapInPandas pass, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import mp4

        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "frame_idx", "is_real_decode", "width",
                    "height", "px_sum", "reason",
                )
            }

            def quarantine(doc_id, reason):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(-1)
                rows["is_real_decode"].append(False)
                rows["width"].append(0)
                rows["height"].append(0)
                rows["px_sum"].append(0)
                rows["reason"].append(reason)

            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                if not mp4.is_mp4(blob):
                    quarantine(doc_id, "not_mp4")
                    continue
                try:
                    frames, info = mp4.decode_mp4_frames(
                        blob, keyframes_only=True
                    )
                except ValueError as e:
                    # loud codec quarantine: surface the fourcc, not pixels
                    vids = []
                    try:
                        vids = [
                            t for t in mp4.parse_mp4(blob)["tracks"]
                            if t["handler"] == "vide"
                        ]
                    except Exception:
                        pass
                    reason = (
                        f"codec:{vids[0]['codec']}" if vids else "corrupt"
                    )
                    del e
                    quarantine(doc_id, reason)
                    continue
                except Exception:
                    quarantine(doc_id, "corrupt")
                    continue
                for idx, arr in frames:
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["is_real_decode"].append(True)
                    rows["width"].append(int(arr.shape[1]))
                    rows["height"].append(int(arr.shape[0]))
                    rows["px_sum"].append(int(arr.astype(np.int64).sum()))
                    rows["reason"].append("ok")
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, frame_idx int, is_real_decode boolean, "
        "width int, height int, px_sum bigint, reason string",
    )


def synthetic_pdf_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-PDF fixtures (sources/pdf.py): for payload
    byte-length n, n%3+1 pages; page p carries (n+p)%3+1 text lines,
    line j = 'doc-{d}-p{p}-l{j}-' + 'w' x ((n+j)%5), shown through a
    mix of Tj / split-TJ / ' operators inside FlateDecode content
    streams behind a classic xref table. doc_id%7==0 blobs are
    TRUNCATED (startxref cut off) — the malformed-PDF quarantine
    class."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import pdf

        for pdf_batch in it:
            ids, blobs = [], []
            for doc_id, payload in zip(
                pdf_batch[id_col], pdf_batch[payload_col]
            ):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                pages = [
                    [
                        f"doc-{d}-p{p}-l{j}-" + "w" * ((n + j) % 5)
                        for j in range((n + p) % 3 + 1)
                    ]
                    for p in range(n % 3 + 1)
                ]
                blob = pdf.encode_pdf(pages)
                if d % 7 == 0:
                    blob = blob[:-30]  # cuts startxref: malformed
                ids.append(d)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "application/pdf", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def pdf_text_rows(assets: DataFrame) -> DataFrame:
    """Arrow-batched PDF text extraction: one row per page with the
    extracted text (xref walk -> page tree -> Flate content streams ->
    Tj/TJ/' operators — sources/pdf.py). Malformed/encrypted/
    out-of-scope PDFs quarantine as a single is_extracted=false row;
    the page text feeds the same curation funnel as WARC/HTML/XML
    ingestion."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import pdf

        for pdf_batch in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "page_idx", "is_extracted", "text",
                    "n_lines", "n_chars",
                )
            }
            for doc_id, blob in zip(pdf_batch["doc_id"], pdf_batch["blob"]):
                blob = bytes(blob)
                try:
                    texts = (
                        pdf.parse_pdf_pages(blob)
                        if pdf.is_pdf(blob)
                        else None
                    )
                except Exception:
                    texts = None
                if texts is None:
                    rows["doc_id"].append(doc_id)
                    rows["page_idx"].append(-1)
                    rows["is_extracted"].append(False)
                    rows["text"].append("")
                    rows["n_lines"].append(0)
                    rows["n_chars"].append(0)
                    continue
                for p, t in enumerate(texts):
                    rows["doc_id"].append(doc_id)
                    rows["page_idx"].append(p)
                    rows["is_extracted"].append(True)
                    rows["text"].append(t)
                    rows["n_lines"].append(t.count("\n") + 1 if t else 0)
                    rows["n_chars"].append(len(t))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, page_idx int, is_extracted boolean, text string, "
        "n_lines int, n_chars bigint",
    )


def synthetic_flac_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-FLAC fixtures (sources/flac.py): mono 16-bit
    8 kHz, 200 + (n%3)*100 samples in 128-sample frames. doc_id%4
    sweeps the subframe family — CONSTANT (all samples A), VERBATIM,
    FIXED order 2, LPC order 1 — over the closed-form signal
    s(t) = A + B*t + ((d+t)%5 - 2) with A=(d*13)%1000, B=d%7-3.
    doc_id%9==0 blobs get one bit flipped mid-stream: the CRC-16/MD5
    integrity quarantine class."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import flac

        modes = {0: "CONSTANT", 1: "VERBATIM", 2: "FIXED2", 3: "LPC1"}
        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                n_s = 200 + (n % 3) * 100
                a, b = (d * 13) % 1000, d % 7 - 3
                t = np.arange(n_s, dtype=np.int64)
                if d % 4 == 0:
                    s = np.full(n_s, a, dtype=np.int64)
                else:
                    s = a + b * t + ((d + t) % 5 - 2)
                blob = flac.encode_flac(
                    s, sample_rate=8000, bps=16, block_size=128,
                    mode=modes[d % 4],
                )
                if d % 9 == 0:
                    ba = bytearray(blob)
                    ba[len(ba) // 2] ^= 0x40
                    blob = bytes(ba)
                ids.append(d)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/flac", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def flac_audio_stats(assets: DataFrame) -> DataFrame:
    """Arrow-batched FLAC decode to per-blob audio stats: stream
    parameters, frame/subframe census and exact sample aggregates.
    All channel assignments decode, including left/right/mid-side
    stereo decorrelation; integrity failures (CRC-8/CRC-16/MD5
    mismatch), reserved codes, and truncated streams quarantine as
    is_real_decode=false rows — never wrong samples."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import flac

        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "is_real_decode", "sample_rate", "channels",
                    "bps", "n_samples", "n_frames", "subframe_types",
                    "sum_samples", "min_sample", "max_sample",
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                try:
                    arr, info = (
                        flac.decode_flac(blob)
                        if flac.is_flac(blob)
                        else (None, None)
                    )
                    # compute the aggregates INSIDE the try so a
                    # degenerate decode quarantines instead of killing
                    # the task mid-row (review r8 #2)
                    if info is not None:
                        stats = (
                            int(arr.astype(np.int64).sum()),
                            int(arr.min()),
                            int(arr.max()),
                        )
                except Exception:
                    arr = info = None
                rows["doc_id"].append(doc_id)
                if info is None:
                    rows["is_real_decode"].append(False)
                    rows["sample_rate"].append(0)
                    rows["channels"].append(0)
                    rows["bps"].append(0)
                    rows["n_samples"].append(0)
                    rows["n_frames"].append(0)
                    rows["subframe_types"].append("")
                    rows["sum_samples"].append(0)
                    rows["min_sample"].append(0)
                    rows["max_sample"].append(0)
                    continue
                rows["is_real_decode"].append(True)
                rows["sample_rate"].append(info["sample_rate"])
                rows["channels"].append(info["channels"])
                rows["bps"].append(info["bps"])
                rows["n_samples"].append(info["n_samples"])
                rows["n_frames"].append(info["n_frames"])
                rows["subframe_types"].append(info["subframe_types"])
                rows["sum_samples"].append(stats[0])
                rows["min_sample"].append(stats[1])
                rows["max_sample"].append(stats[2])
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, is_real_decode boolean, sample_rate int, "
        "channels int, bps int, n_samples int, n_frames int, "
        "subframe_types string, sum_samples bigint, min_sample bigint, "
        "max_sample bigint",
    )


def synthetic_mp3_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic MP3 fixtures (sources/mp3.py): MPEG1 Layer III
    CBR streams of n%4+3 frames, bitrate index d%14+1, sample-rate
    index d%3, mono on odd ids; d%5==0 prepends an ID3v2 tag of
    20+d%30 payload bytes; d%11==0 truncates the last frame (scan
    reports truncated=true); d%13==0 is non-MPEG garbage (quarantine
    class, wins over the others)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mp3

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                if d % 13 == 0:
                    blob = f"not-an-mpeg-stream-{d}".encode()
                else:
                    blob = mp3.encode_mp3_frames(
                        n % 4 + 3,
                        bitrate_index=d % 14 + 1,
                        sample_rate_index=d % 3,
                        mono=d % 2 == 1,
                        id3_size=20 + d % 30 if d % 5 == 0 else 0,
                    )
                    if d % 11 == 0:
                        blob = blob[:-10]
                ids.append(d)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/mpeg", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def mp3_stream_scan(assets: DataFrame) -> DataFrame:
    """Arrow-batched MP3 frame-header scan (sources/mp3.py): duration,
    bitrate range (VBR visible), channel mode, frame census, ID3 size
    and the truncation flag — everything a crawl pipeline thresholds
    on without decoding audio. Non-MPEG bytes, free-format streams and
    mid-stream parameter changes quarantine as is_scanned=false rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mp3

        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "is_scanned", "version", "sample_rate",
                    "channel_mode", "n_frames", "bitrate_kbps_min",
                    "bitrate_kbps_max", "duration_ms", "id3_bytes",
                    "truncated",
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                try:
                    info = mp3.scan_mp3(blob) if mp3.is_mp3(blob) else None
                except Exception:
                    info = None
                rows["doc_id"].append(doc_id)
                if info is None:
                    rows["is_scanned"].append(False)
                    rows["version"].append("")
                    rows["sample_rate"].append(0)
                    rows["channel_mode"].append("")
                    rows["n_frames"].append(0)
                    rows["bitrate_kbps_min"].append(0)
                    rows["bitrate_kbps_max"].append(0)
                    rows["duration_ms"].append(0)
                    rows["id3_bytes"].append(0)
                    rows["truncated"].append(False)
                    continue
                rows["is_scanned"].append(True)
                rows["version"].append(info["version"])
                rows["sample_rate"].append(info["sample_rate"])
                rows["channel_mode"].append(info["channel_mode"])
                rows["n_frames"].append(info["n_frames"])
                rows["bitrate_kbps_min"].append(info["bitrate_kbps_min"])
                rows["bitrate_kbps_max"].append(info["bitrate_kbps_max"])
                rows["duration_ms"].append(info["duration_ms"])
                rows["id3_bytes"].append(info["id3_bytes"])
                rows["truncated"].append(info["truncated"])
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, is_scanned boolean, version string, "
        "sample_rate int, channel_mode string, n_frames int, "
        "bitrate_kbps_min int, bitrate_kbps_max int, duration_ms bigint, "
        "id3_bytes int, truncated boolean",
    )


def synthetic_alaw_wav_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic G.711 A-law telephony fixtures (format tag 6,
    8 kHz mono — the European twin of the mu-law corpus): doc d gets
    80 + d%100 samples of the CONSTANT amplitude
    ((d%16)*16 + 264) << (d%7), sign-flipped on odd d. Every amplitude
    is an exact A-law codepoint magnitude (segment 1-7), so
    compand->expand is the identity and the oracle computes the
    decoded |sample| sum in closed form."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from shared_etl_pipelines_spark.sources import wav

        for pdf in it:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = 80 + d % 100
                amp = ((d % 16) * 16 + 264) << (d % 7)
                if d % 2 == 1:
                    amp = -amp
                s = np.full(n, amp, dtype=np.int16)
                ids.append(doc_id)
                blobs.append(wav.encode_wav_alaw(s, 8000))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/basic", "blob": blobs}
            )

    return df.select(F.col(id_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def synthetic_ogg_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-OGG fixtures (sources/ogg.py), Vorbis and
    Opus mixed: for payload byte-length n and doc_id d — codec is OPUS
    when d%3==1, Vorbis otherwise; channels d%2+1, informational rate
    [8000,16000,22050,44100][(d//2)%4], n%5+2 audio packets of length
    180+(d+13i)%300 (Vorbis first packet 300+d%100 and SPLIT across a
    page boundary when d%5==0 — exercises the continued-flag path),
    d%3+1 comments 'k{j}=v{(d+j)%10}', vendor 'spark-graft-0.9'.
    Vorbis granule = d%1000+1000 on the codec rate; Opus granule =
    samples + pre-skip (312+d%100) on the 48 kHz clock with samples =
    d%1000+1000. d%7==0 blobs get their final payload byte flipped:
    the page CRC must catch it and the row quarantines."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import ogg

        rates = (8000, 16000, 22050, 44100)
        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                n_audio = n % 5 + 2
                is_opus = d % 3 == 1
                split = d % 5 == 0 and not is_opus
                pkts = []
                for i in range(n_audio):
                    if i == 0 and split:
                        ln = 300 + d % 100
                    else:
                        ln = 180 + (d + 13 * i) % 300
                    pkts.append(bytes((d + i * 7 + j) % 256 for j in range(ln)))
                comments = [f"k{j}=v{(d + j) % 10}" for j in range(d % 3 + 1)]
                if is_opus:
                    pre_skip = 312 + d % 100
                    blob = ogg.encode_ogg_opus(
                        channels=d % 2 + 1,
                        input_sample_rate=rates[(d // 2) % 4],
                        pre_skip=pre_skip,
                        vendor="spark-graft-0.9",
                        comments=comments,
                        audio_packets=pkts,
                        total_granule=d % 1000 + 1000 + pre_skip,
                    )
                else:
                    blob = ogg.encode_ogg_vorbis(
                        channels=d % 2 + 1,
                        sample_rate=rates[(d // 2) % 4],
                        vendor="spark-graft-0.9",
                        comments=comments,
                        audio_packets=pkts,
                        total_granule=d % 1000 + 1000,
                        split_first_audio=split,
                    )
                if d % 7 == 0:
                    ba = bytearray(blob)
                    ba[-1] ^= 0xFF
                    blob = bytes(ba)
                ids.append(d)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/ogg", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def ogg_page_scan(assets: DataFrame) -> DataFrame:
    """Arrow-batched OGG container scan (r9, VERDICT r8 item 7): page
    census with per-page CRC validation, packet reassembly through the
    lacing chain (spanning packets included), Vorbis ident/comment
    header decode, granule-position duration. Audio packets are
    censused, never decoded (Vorbis MDCT is out of scope — the same
    honest boundary as avc1 in the MP4 walk). Malformed streams
    quarantine as is_valid=false rows with a stable reason class. One
    mapInPandas pass, per-file parallelism, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import ogg

        cols = (
            "doc_id", "is_valid", "codec", "n_pages", "n_packets",
            "channels", "sample_rate", "duration_ms", "pre_skip",
            "vendor", "n_comments", "audio_bytes", "reason",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                try:
                    info = ogg.parse_ogg(blob)
                except ValueError as e:
                    msg = str(e)
                    if "CRC" in msg:
                        reason = "crc_mismatch"
                    elif "OggS" in msg or "capture" in msg:
                        reason = "not_ogg"
                    else:
                        reason = "malformed"
                    rows["doc_id"].append(doc_id)
                    rows["is_valid"].append(False)
                    rows["codec"].append("")
                    rows["n_pages"].append(0)
                    rows["n_packets"].append(0)
                    rows["channels"].append(0)
                    rows["sample_rate"].append(0)
                    rows["duration_ms"].append(0)
                    rows["pre_skip"].append(0)
                    rows["vendor"].append("")
                    rows["n_comments"].append(0)
                    rows["audio_bytes"].append(0)
                    rows["reason"].append(reason)
                    continue
                rows["doc_id"].append(doc_id)
                rows["is_valid"].append(True)
                rows["codec"].append(info["codec"])
                rows["n_pages"].append(int(info["n_pages"]))
                rows["n_packets"].append(int(info["n_packets"]))
                rows["channels"].append(int(info["channels"]))
                rows["sample_rate"].append(int(info["sample_rate"]))
                rows["duration_ms"].append(int(info["duration_ms"]))
                rows["pre_skip"].append(int(info["pre_skip"]))
                rows["vendor"].append(info["vendor"])
                rows["n_comments"].append(len(info["comments"]))
                rows["audio_bytes"].append(int(info["audio_bytes"]))
                rows["reason"].append("ok")
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, is_valid boolean, codec string, n_pages int, "
        "n_packets int, channels int, sample_rate int, duration_ms "
        "bigint, pre_skip int, vendor string, n_comments int, "
        "audio_bytes bigint, reason string",
    )


def synthetic_mp3_tagged_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic ID3v2-tagged MP3 fixtures (r9): real MPEG1 Layer
    III frame streams prefixed with a REAL ID3v2 tag — v2.4 syncsafe
    frame sizes on even doc_ids, v2.3 plain 32-bit sizes on odd ones,
    text encoding rotating latin-1/utf-16/utf-16be/utf-8 by d%4, frames
    TIT2='doc-{d}', TPE1='artist-{d%50}', TALB='album-{d%20}',
    TRCK=str(d%12+1). d%11==0 blobs carry a frame whose declared size
    overruns the tag (must quarantine); d%7==0 blobs are untagged
    (bare frame stream)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mp3

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                audio = mp3.encode_mp3_frames(
                    n % 3 + 2,
                    bitrate_index=d % 14 + 1,
                    sample_rate_index=d % 3,
                    mono=d % 2 == 1,
                )
                if d % 11 == 0:
                    tag = bytearray(
                        mp3.encode_id3v2({"TIT2": f"doc-{d}"}, 4, 3)
                    )
                    tag[14] = 0x7F  # frame size now overruns the tag
                    blob = bytes(tag) + audio
                elif d % 7 == 0:
                    blob = audio  # untagged class
                else:
                    tag = mp3.encode_id3v2(
                        {
                            "TIT2": f"doc-{d}",
                            "TPE1": f"artist-{d % 50}",
                            "TALB": f"album-{d % 20}",
                            "TRCK": str(d % 12 + 1),
                        },
                        major=4 if d % 2 == 0 else 3,
                        encoding=d % 4,
                    )
                    blob = tag + audio
                ids.append(d)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "audio/mpeg", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def mp3_id3_tags(assets: DataFrame) -> DataFrame:
    """ID3v2 text-frame census (r9): title/artist/album/track from the
    tag prefix of crawled MP3s — the metadata half the structural scan
    (mp3_stream_scan) cannot see, and what an audio-corpus audit
    groups/filters on. Untagged files surface is_tagged=false;
    structurally damaged tags quarantine with reason 'tag_malformed'
    (never a guessed string). One mapInPandas pass, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mp3

        cols = (
            "doc_id", "is_tagged", "id3_version", "n_frames", "title",
            "artist", "album", "track", "reason",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}

            def emit(doc_id, tagged, ver, nf, fr, reason):
                rows["doc_id"].append(doc_id)
                rows["is_tagged"].append(tagged)
                rows["id3_version"].append(ver)
                rows["n_frames"].append(nf)
                rows["title"].append(fr.get("TIT2", ""))
                rows["artist"].append(fr.get("TPE1", ""))
                rows["album"].append(fr.get("TALB", ""))
                rows["track"].append(fr.get("TRCK", ""))
                rows["reason"].append(reason)

            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                try:
                    info = mp3.parse_id3v2(blob)
                except ValueError as e:
                    if "no ID3v2 tag" in str(e):
                        emit(doc_id, False, 0, 0, {}, "untagged")
                    else:
                        emit(doc_id, False, 0, 0, {}, "tag_malformed")
                    continue
                emit(
                    doc_id, True, int(info["version"]),
                    int(info["n_frames"]), info["frames"], "ok",
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, is_tagged boolean, id3_version int, n_frames "
        "int, title string, artist string, album string, track string, "
        "reason string",
    )


def synthetic_exif_jpeg_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic EXIF-tagged JPEG fixtures (r9): real baseline
    JPEGs with an APP1 EXIF segment spliced after SOI — byte order II
    on even doc_ids, MM on odd; orientation d%8+1, make 'maker-{d%7}',
    model 'model-{d%13}', datetime '2023:01:0{d%9+1} 12:00:00'. GPS
    rationals present when d%3!=0: lat (d%90, d%60, (d*37)%6000,
    N/S by d%4<2), lon (d%180, (d//2)%60, (d*53)%6000, E/W by d%8<4).
    d%5==0 carries no EXIF at all; d%17==0 has an IFD entry count that
    overruns the segment (must quarantine). The GPS class is the PII
    surface a curation pass must see to strip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as np

        from shared_etl_pipelines_spark.sources import exif, jpeg

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                frame = np.full(
                    (8, 8), (d * 31) % 256, dtype=np.uint8
                )
                base = jpeg.encode_jpeg(frame)
                if d % 5 == 0:
                    blobs.append(base)
                    ids.append(d)
                    continue
                gps = None
                if d % 3 != 0:
                    gps = (
                        d % 90, d % 60, (d * 37) % 6000,
                        "N" if d % 4 < 2 else "S",
                        d % 180, (d // 2) % 60, (d * 53) % 6000,
                        "E" if d % 8 < 4 else "W",
                    )
                app1 = exif.encode_exif_app1(
                    make=f"maker-{d % 7}",
                    model=f"model-{d % 13}",
                    orientation=d % 8 + 1,
                    datetime=f"2023:01:0{d % 9 + 1} 12:00:00",
                    gps=gps,
                    big_endian=d % 2 == 1,
                )
                if d % 17 == 0:
                    ba = bytearray(app1)
                    # IFD0 entry count lives right after the 8-byte
                    # TIFF header (offset 6 + 8)
                    _struct.pack_into(
                        ">H" if d % 2 == 1 else "<H", ba, 14, 9999
                    )
                    app1 = bytes(ba)
                seg = b"\xff\xe1" + _struct.pack(">H", len(app1) + 2) + app1
                blobs.append(base[:2] + seg + base[2:])
                ids.append(d)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "image/jpeg", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def jpeg_exif_scan(assets: DataFrame) -> DataFrame:
    """EXIF/GPS census over crawled JPEGs (r9): the camera-metadata and
    PII-audit pass — embedded GPS rationals geolocate the photographer,
    so curation must SEE them to strip or quarantine. Walks the JPEG
    marker stream for the APP1 EXIF segment, parses IFD0 identity tags
    and the GPS IFD in raw integer components (exactly replayable, no
    float). Untagged images surface has_exif=false; structurally
    damaged EXIF quarantines as exif_malformed. One mapInPandas pass,
    no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        from shared_etl_pipelines_spark.sources import exif

        cols = (
            "doc_id", "has_exif", "orientation", "make", "model",
            "datetime", "has_gps", "lat_deg", "lat_min", "lat_sec_centi",
            "lat_ref", "lon_deg", "lon_min", "lon_sec_centi", "lon_ref",
            "reason",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}

            def emit(doc_id, has_exif, info, reason):
                rows["doc_id"].append(doc_id)
                rows["has_exif"].append(has_exif)
                rows["orientation"].append(int(info.get("orientation", 0)))
                rows["make"].append(info.get("make", ""))
                rows["model"].append(info.get("model", ""))
                rows["datetime"].append(info.get("datetime", ""))
                rows["has_gps"].append(bool(info.get("has_gps", False)))
                for k in (
                    "lat_deg", "lat_min", "lat_sec_centi", "lon_deg",
                    "lon_min", "lon_sec_centi",
                ):
                    rows[k].append(int(info.get(k, 0)))
                rows["lat_ref"].append(info.get("lat_ref", ""))
                rows["lon_ref"].append(info.get("lon_ref", ""))
                rows["reason"].append(reason)

            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                # marker walk for APP1/Exif (0xFFE1)
                app1 = None
                pos = 2 if blob[:2] == b"\xff\xd8" else None
                while pos is not None and pos + 4 <= len(blob):
                    if blob[pos] != 0xFF:
                        break
                    marker = blob[pos + 1]
                    if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                        pos += 2
                        continue
                    (seglen,) = _struct.unpack_from(">H", blob, pos + 2)
                    if marker == 0xE1 and blob[
                        pos + 4 : pos + 10
                    ] == b"Exif\x00\x00":
                        app1 = blob[pos + 4 : pos + 2 + seglen]
                        break
                    if marker == 0xDA:
                        break  # entropy data: no APP1 before scan start
                    pos += 2 + seglen
                if app1 is None:
                    emit(doc_id, False, {}, "no_exif")
                    continue
                try:
                    info = exif.parse_exif_app1(app1)
                except ValueError:
                    emit(doc_id, False, {}, "exif_malformed")
                    continue
                emit(doc_id, True, info, "ok")
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, has_exif boolean, orientation int, make string, "
        "model string, datetime string, has_gps boolean, lat_deg int, "
        "lat_min int, lat_sec_centi int, lat_ref string, lon_deg int, "
        "lon_min int, lon_sec_centi int, lon_ref string, reason string",
    )


def synthetic_caption_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic caption-sidecar fixtures (r9; +TTML r9-continued):
    WebVTT on doc_id%4==0 (with a NOTE block the parser must skip),
    TTML on doc_id%4==2 (W3C timed text, <br/> line breaks), SRT on odd
    ids; n%4+2 cues, cue i spanning [d%1000 + 2000i, +1200 + (d%5)*100]
    ms, text 'line-{d}-{i}' with a second line 'cont-{i}' on odd cues.
    d%9==0 sidecars malform (a '-->'-less timing line; truncated XML
    for TTML) and must quarantine."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import captions

        for pdf in it:
            ids, fmts, payloads = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                cues = []
                for i in range(n % 4 + 2):
                    start = d % 1000 + 2000 * i
                    end = start + 1200 + (d % 5) * 100
                    text = f"line-{d}-{i}" + (f"\ncont-{i}" if i % 2 else "")
                    cues.append((start, end, text))
                fmt = (
                    "vtt" if d % 4 == 0
                    else "ttml" if d % 4 == 2
                    else "srt"
                )
                body = {
                    "vtt": captions.encode_webvtt,
                    "srt": captions.encode_srt,
                    "ttml": captions.encode_ttml,
                }[fmt](cues)
                if d % 9 == 0:
                    body = (
                        body[:-10] if fmt == "ttml"
                        else body.replace("-->", "->", 1)
                    )
                ids.append(d)
                fmts.append(fmt)
                payloads.append(body)
            yield pd.DataFrame(
                {"doc_id": ids, "fmt": fmts, "payload": payloads}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, fmt string, payload string"
    )


def caption_cue_rows(assets: DataFrame) -> DataFrame:
    """Caption extraction (r9): WebVTT/SRT sidecars -> one row per cue
    with exact millisecond timings and the joined text — the transcript
    documents a crawl-video corpus actually ships. Malformed sidecars
    (broken timings, reversed ranges, renumbered SRT indices)
    quarantine as one cue_idx=-1 row; a sheared alignment is worse
    than a dropped file. One mapInPandas pass, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import captions

        cols = (
            "doc_id", "fmt", "cue_idx", "start_ms", "end_ms", "text",
            "n_chars", "reason",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                try:
                    cues = {
                        "vtt": captions.parse_webvtt,
                        "srt": captions.parse_srt,
                        "ttml": captions.parse_ttml,
                    }[fmt](payload)
                except ValueError:
                    rows["doc_id"].append(doc_id)
                    rows["fmt"].append(fmt)
                    rows["cue_idx"].append(-1)
                    rows["start_ms"].append(0)
                    rows["end_ms"].append(0)
                    rows["text"].append("")
                    rows["n_chars"].append(0)
                    rows["reason"].append("malformed")
                    continue
                for idx, start, end, text in cues:
                    rows["doc_id"].append(doc_id)
                    rows["fmt"].append(fmt)
                    rows["cue_idx"].append(idx)
                    rows["start_ms"].append(start)
                    rows["end_ms"].append(end)
                    rows["text"].append(text)
                    rows["n_chars"].append(len(text))
                    rows["reason"].append("ok")
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, fmt string, cue_idx int, start_ms bigint, "
        "end_ms bigint, text string, n_chars int, reason string",
    )


# ---------------------------------------------------------------------------
# Matroska / WebM (sources/mkv.py) — r9-continued: the OTHER dominant
# crawl-video container next to ISO-BMFF. Same contract as the mp4
# trio: deterministic real-container fixtures, an Arrow-batched track
# scan that works for codecs we cannot decode, and a bitstream-level
# parse (VP8 keyframe headers) where the public spec allows one.
# ---------------------------------------------------------------------------
def synthetic_mkv_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-WebM/Matroska fixtures: for payload byte
    length n, nf = n%3+2 video frames of (n%4+1)*16 x ((n//4)%4+1)*16;
    doc_id%3==0 carries V_AV1 with a REAL av1C CodecPrivate (profile 0,
    level cycling 0/4/8/12, 10-bit on odd ids; pseudo block payloads —
    the scan and CodecPrivate parse are real, frame decode must
    quarantine), else V_VP8 with REAL RFC 6386 keyframe headers
    (keyframe every 2nd frame, part_size 10+f). ODD doc_ids add
    an audio track — A_OPUS@48kHz when doc_id%4==1 else A_VORBIS@44.1kHz,
    n%2+1 channels-agnostic blocks, channels n%2+1. Structure variety:
    DocType 'matroska' on doc_id%5==0 (else webm), BlockGroup+
    ReferenceBlock form on doc_id%7==3, unknown-size (streaming-muxer)
    Segment on doc_id%11==5 and Clusters on doc_id%11==7. doc_id%4==2
    adds an S_TEXT/UTF8 subtitle track (n%2+2 timed cues as BlockGroup
    + BlockDuration at 500 ms spacing, 300+10*i ms long, UTF-8
    non-ASCII text on doc_id%8==2). Duration nf*40 ms at the default
    1 ms timestamp scale; two clusters when nf > 2 (cluster 1 at
    ts 80)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mkv

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                nf = n % 3 + 2
                w, h = (n % 4 + 1) * 16, ((n // 4) % 4 + 1) * 16
                vtrack = dict(
                    number=1, uid=d * 2 + 1, type="video",
                    codec_id="V_AV1" if d % 3 == 0 else "V_VP8",
                    width=w, height=h,
                )
                if d % 3 == 0:
                    # V_AV1 CodecPrivate IS an av1C record (Matroska
                    # codec mapping) — real stream params in WebM too
                    from shared_etl_pipelines_spark.sources import av1

                    obu = av1.encode_av1_seq_header(
                        w, h, profile=0,
                        level=(0, 4, 8, 12)[d % 4],
                        tier=1 if (0, 4, 8, 12)[d % 4] > 7 and d % 8 >= 4
                        else 0,
                        bit_depth=10 if d % 2 else 8,
                    )
                    vtrack["codec_private"] = av1.encode_av1c(
                        obu, av1.parse_av1_seq_header(obu)
                    )
                tracks = [vtrack]
                if d % 2 == 1:
                    tracks.append(
                        dict(
                            number=2, uid=d * 2 + 2, type="audio",
                            codec_id="A_OPUS" if d % 4 == 1 else "A_VORBIS",
                            sample_hz=48000 if d % 4 == 1 else 44100,
                            channels=n % 2 + 1,
                        )
                    )
                nc = n % 2 + 2 if d % 4 == 2 else 0
                if nc:
                    tracks.append(
                        dict(
                            number=3, uid=d * 2 + 3, type="subtitle",
                            codec_id="S_TEXT/UTF8",
                        )
                    )
                frames = []
                for f in range(nf):
                    if d % 3 == 0:
                        payload_b = bytes(
                            (d + f * 7 + j) % 256
                            for j in range(12 + d % 5 + f)
                        )
                        key = f % 2 == 0
                    elif f % 2 == 0:
                        payload_b = mkv.encode_vp8_keyframe(
                            w, h, part_size=10 + f,
                            filler=bytes(
                                (d * 17 + f * 5 + j) % 256 for j in range(8)
                            ),
                        )
                        key = True
                    else:
                        payload_b = mkv.encode_vp8_interframe(
                            part_size=5,
                            filler=bytes((d + f * 3 + j) % 256 for j in range(5)),
                        )
                        key = False
                    frames.append((f, key, payload_b))
                na = n % 2 + 1 if d % 2 == 1 else 0
                c0 = [(1, 40 * f, k, p) for f, k, p in frames if f < 2]
                c1 = [(1, 40 * f - 80, k, p) for f, k, p in frames if f >= 2]
                if na >= 1:
                    c0.append((2, 0, True, b"a" * 10))
                if na >= 2:
                    (c1 if nf > 2 else c0).append(
                        (2, 40 - (80 if nf > 2 else 0), True, b"a" * 11)
                    )
                for i in range(nc):
                    cue = f"cue {d}-{i}" + (" ß" if d % 8 == 2 else "")
                    c0.append(
                        (3, 500 * i, True, cue.encode("utf-8"), 300 + 10 * i)
                    )
                clusters = [(0, c0)] + ([(80, c1)] if c1 else [])
                blob = mkv.encode_mkv(
                    tracks, clusters,
                    doc_type="matroska" if d % 5 == 0 else "webm",
                    duration_ms=nf * 40,
                    unknown_size_segment=d % 11 == 5,
                    unknown_size_clusters=d % 11 == 7,
                    block_groups=d % 7 == 3,
                )
                ids.append(d)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "video/webm", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def mkv_track_scan(assets: DataFrame) -> DataFrame:
    """Arrow-batched Matroska/WebM container scan: one row per track
    with type, codec id, dimensions / audio parameters, block +
    keyframe census (SimpleBlock flag bit; BlockGroup keyframe = no
    ReferenceBlock) and container duration — the audit pass a crawl
    video pipeline runs over every .webm/.mkv before deciding what to
    decode. Corrupt containers quarantine as a track_type='corrupt'
    row. One mapInPandas pass, no shuffle, per-file parallelism."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mkv

        cols = (
            "doc_id", "doc_type", "track_id", "track_type", "codec_id",
            "width", "height", "sample_hz", "channels", "n_blocks",
            "n_keyframes", "duration_ms",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = bytes(blob)
                try:
                    info = mkv.parse_mkv(blob)
                except ValueError:
                    rows["doc_id"].append(doc_id)
                    rows["doc_type"].append("corrupt")
                    rows["track_id"].append(-1)
                    rows["track_type"].append("corrupt")
                    rows["codec_id"].append("")
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["sample_hz"].append(0)
                    rows["channels"].append(0)
                    rows["n_blocks"].append(0)
                    rows["n_keyframes"].append(0)
                    rows["duration_ms"].append(0)
                    continue
                for t in info["tracks"]:
                    rows["doc_id"].append(doc_id)
                    rows["doc_type"].append(info["doc_type"])
                    rows["track_id"].append(int(t["track_id"]))
                    rows["track_type"].append(t["track_type"])
                    rows["codec_id"].append(t["codec_id"])
                    rows["width"].append(int(t["width"]))
                    rows["height"].append(int(t["height"]))
                    rows["sample_hz"].append(int(t["sample_hz"]))
                    rows["channels"].append(int(t["channels"]))
                    rows["n_blocks"].append(int(t["n_blocks"]))
                    rows["n_keyframes"].append(int(t["n_keyframes"]))
                    rows["duration_ms"].append(int(info["duration_ms"]))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, doc_type string, track_id int, track_type string, "
        "codec_id string, width int, height int, sample_hz int, "
        "channels int, n_blocks int, n_keyframes int, duration_ms bigint",
    )


def webm_vp8_keyframes(assets: DataFrame) -> DataFrame:
    """Bitstream-level VP8 keyframe-header parse over every video block
    of V_VP8 tracks (RFC 6386 §9.1): coded width/height, partition size
    and show_frame per keyframe — REAL dimensions from the codec
    payload, not the container (a corpus-audit cross-check: mismatched
    container-vs-bitstream dims flag re-muxed/corrupt crawl video).
    Non-VP8 video tracks surface as one quarantine row with
    reason='codec:<id>' — scan what you cannot decode, loudly."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mkv

        cols = (
            "doc_id", "frame_idx", "is_real_parse", "width", "height",
            "part_size", "reason",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}

            def emit(doc_id, idx, ok, w, h, ps, reason):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["is_real_parse"].append(ok)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["part_size"].append(ps)
                rows["reason"].append(reason)

            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    info = mkv.parse_mkv(bytes(blob), collect_frames=True)
                except ValueError:
                    emit(doc_id, -1, False, 0, 0, 0, "corrupt")
                    continue
                video = [
                    t for t in info["tracks"] if t["track_type"] == "video"
                ]
                for t in video:
                    if t["codec_id"] != "V_VP8":
                        emit(
                            doc_id, -1, False, 0, 0, 0,
                            f"codec:{t['codec_id']}",
                        )
                        continue
                    for idx, key, payload in t["frames"]:
                        if not key:
                            continue
                        try:
                            hdr = mkv.parse_vp8_frame(payload)
                        except ValueError:
                            emit(doc_id, idx, False, 0, 0, 0, "bad-vp8")
                            continue
                        emit(
                            doc_id, idx, True, hdr["width"], hdr["height"],
                            hdr["part_size"], "ok",
                        )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, frame_idx int, is_real_parse boolean, width int, "
        "height int, part_size int, reason string",
    )


def synthetic_hevc_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic hev1-track MP4 fixtures (r9-continued: the H.265
    half of the codec-params story). Display size is deliberately OFF
    the 8-pel coding grid — (n%4+1)*16 + 2*(d%3) wide, ((n//4)%4+1)*16
    + 2*((d//3)%3) tall — so the conformance window is real and a
    parser echoing container dims fails. Profile cycles Main/Main10/
    MainSP by d%3 (Main10 implies 10-bit), level cycles
    90/93/120/123 by d%4, tier alternates by (d//2)%2. doc_id%9==8
    blobs truncate and must quarantine. Pseudo-NAL payloads: the scan
    and extradata parse are the subject, frame decode is not."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mp4

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                w = (n % 4 + 1) * 16 + 2 * (d % 3)
                h = ((n // 4) % 4 + 1) * 16 + 2 * ((d // 3) % 3)
                nf = n % 3 + 2
                samples = [
                    bytes((d + i * 5 + j) % 256 for j in range(20 + i))
                    for i in range(nf)
                ]
                blob = mp4.encode_mp4(
                    samples, w, h, fps=10, codec=b"hev1",
                    keyframe_interval=2, samples_per_chunk=3,
                    hevc_params=(
                        d % 3 + 1,
                        (90, 93, 120, 123)[d % 4],
                        (d // 2) % 2,
                    ),
                )
                if d % 9 == 8:
                    blob = blob[:40]  # structural break -> quarantine
                ids.append(d)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "video/mp4", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def mkv_subtitle_cues(assets: DataFrame) -> DataFrame:
    """Timed-text extraction from Matroska S_TEXT/UTF8 subtitle tracks:
    one row per cue with absolute start/end (cluster timestamp + block
    relative + BlockDuration, all on the ms timestamp scale) and the
    UTF-8 cue text — embedded subtitles are transcript documents a
    crawl-video corpus ships INSIDE the container, the third caption
    source next to standalone WebVTT/SRT (caption_cue_rows). Corrupt
    containers quarantine as a cue_idx=-1 row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mkv

        cols = (
            "doc_id", "track_id", "cue_idx", "start_ms", "end_ms",
            "text", "n_chars", "reason",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}

            def emit(d, tid, idx, s, e, txt, reason):
                rows["doc_id"].append(d)
                rows["track_id"].append(tid)
                rows["cue_idx"].append(idx)
                rows["start_ms"].append(s)
                rows["end_ms"].append(e)
                rows["text"].append(txt)
                rows["n_chars"].append(len(txt))
                rows["reason"].append(reason)

            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    info = mkv.parse_mkv(bytes(blob), collect_frames=True)
                except ValueError:
                    emit(doc_id, -1, -1, 0, 0, "", "corrupt")
                    continue
                for t in info["tracks"]:
                    if t["track_type"] != "subtitle":
                        continue
                    if t["codec_id"] != "S_TEXT/UTF8":
                        emit(
                            doc_id, int(t["track_id"]), -1, 0, 0, "",
                            f"codec:{t['codec_id']}",
                        )
                        continue
                    for idx, (ts, dur, payload) in enumerate(t["cues"]):
                        try:
                            txt = payload.decode("utf-8", "strict")
                        except UnicodeDecodeError:
                            emit(
                                doc_id, int(t["track_id"]), idx, 0, 0,
                                "", "bad-utf8",
                            )
                            continue
                        emit(
                            doc_id, int(t["track_id"]), idx,
                            int(ts), int(ts + dur), txt, "ok",
                        )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, track_id int, cue_idx int, start_ms bigint, "
        "end_ms bigint, text string, n_chars int, reason string",
    )


def synthetic_av1_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Deterministic av01-track MP4 fixtures (r9-continued: the AV1
    third of the codec-params story). Dims are arbitrary values —
    (n%4+1)*100 + d%7 wide, ((n//4)%4+1)*90 + (d//7)%5 tall — coded in
    the spec's variable-bit-width fields so a parser guessing widths
    desyncs. Profile cycles 0/1/2 by d%3 (professional implies
    10/12-bit, 4:4:4 on profile 1, 4:2:2 on profile 2); level cycles
    0/4/8/12 by d%4 with tier on d%8>=4 when the level carries one;
    monochrome on d%10==4 (profiles 0/2 only); the reduced
    still-picture header form on d%11==6; explicit timing_info on
    d%7==5 (non-reduced). doc_id%9==8 blobs truncate and must
    quarantine."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import mp4

        for pdf in it:
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                n = len(str(payload).encode("utf-8"))
                w = (n % 4 + 1) * 100 + d % 7
                h = ((n // 4) % 4 + 1) * 90 + (d // 7) % 5
                profile = d % 3
                level = (0, 4, 8, 12)[d % 4]
                reduced = d % 11 == 6
                tier = 1 if level > 7 and d % 8 >= 4 and not reduced else 0
                bd = (
                    (12 if d % 2 else 10) if profile == 2
                    else (10 if d % 2 else 8)
                )
                params = dict(
                    profile=profile, level=level, tier=tier, bit_depth=bd,
                    mono=profile != 1 and d % 10 == 4,
                    reduced_still_picture=reduced,
                )
                if d % 7 == 5 and not reduced:
                    params["timing_info"] = (1000 + d % 5, 90000, d % 3)
                nf = n % 3 + 2
                samples = [
                    bytes((d + i * 3 + j) % 256 for j in range(18 + i))
                    for i in range(nf)
                ]
                blob = mp4.encode_mp4(
                    samples, w, h, fps=10, codec=b"av01",
                    keyframe_interval=2, samples_per_chunk=3,
                    av1_params=params,
                )
                if d % 9 == 8:
                    blob = blob[:40]
                ids.append(d)
                blobs.append(blob)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": "video/mp4", "blob": blobs}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, "doc_id bigint, media_type string, blob binary"
    )


def webm_codec_params(assets: DataFrame) -> DataFrame:
    """Stream parameters from Matroska CodecPrivate: V_AV1 tracks carry
    an av1C record verbatim (the Matroska codec mapping), parsed with
    the same record-vs-OBU cross-check as the MP4 path. V_VP8 carries
    no CodecPrivate by design (its params live in keyframe headers —
    webm_vp8_keyframes) and surfaces has_params=false; corrupt
    containers quarantine."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shared_etl_pipelines_spark.sources import av1, mkv

        cols = (
            "doc_id", "track_id", "codec_id", "has_params", "profile_idc",
            "level_idc", "tier_flag", "chroma_format", "bit_depth",
            "cp_width", "cp_height", "reason",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}

            def emit(d, tid, cid, ok, p, lvl, t, cf, bd, w, h, reason):
                rows["doc_id"].append(d)
                rows["track_id"].append(tid)
                rows["codec_id"].append(cid)
                rows["has_params"].append(ok)
                rows["profile_idc"].append(p)
                rows["level_idc"].append(lvl)
                rows["tier_flag"].append(t)
                rows["chroma_format"].append(cf)
                rows["bit_depth"].append(bd)
                rows["cp_width"].append(w)
                rows["cp_height"].append(h)
                rows["reason"].append(reason)

            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    info = mkv.parse_mkv(bytes(blob))
                except ValueError:
                    emit(doc_id, -1, "", False, 0, 0, 0, 0, 0, 0, 0,
                         "corrupt")
                    continue
                for t in info["tracks"]:
                    if t["track_type"] != "video":
                        continue
                    if t["codec_id"] == "V_AV1" and t["codec_private"]:
                        try:
                            p = av1.parse_av1c(t["codec_private"])
                        except ValueError as exc:
                            emit(
                                doc_id, int(t["track_id"]), t["codec_id"],
                                False, 0, 0, 0, 0, 0, 0, 0, str(exc),
                            )
                            continue
                        emit(
                            doc_id, int(t["track_id"]), t["codec_id"], True,
                            int(p["profile_idc"]), int(p["level_idc"]),
                            int(p["tier_flag"]), int(p["chroma_format_idc"]),
                            int(p["bit_depth"]), int(p["width"]),
                            int(p["height"]), "ok",
                        )
                    else:
                        emit(
                            doc_id, int(t["track_id"]), t["codec_id"],
                            False, 0, 0, 0, 0, 0, 0, 0, "no_codec_private",
                        )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        batches,
        "doc_id bigint, track_id int, codec_id string, has_params boolean, "
        "profile_idc int, level_idc int, tier_flag int, chroma_format int, "
        "bit_depth int, cp_width int, cp_height int, reason string",
    )
