"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

Decode is REAL for the uncompressed container formats that need no codec
library — PPM (P6) / PGM (P5) / BMP (BI_RGB 24/32-bit) images and RIFF
PCM WAV audio are pure struct parsing over numpy.  Compressed codecs
(JPEG/PNG/MP3/H.264) raise a **clearly-marked NotImplementedError**: the
libraries are not in this container; deployments swap ``decode_image`` /
``decode_wav`` bodies for PIL/torchaudio/pyav with the SAME signatures —
the Spark plumbing (schema, Arrow batching, column pruning) is unchanged
and tested either way.  ``fake=True`` keeps the deterministic hash-derived
stand-in features so downstream similarity/dedup operators can be
exercised on any payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "width int, height int, duration_ms int, codec string"
)

FEATURE_DIM = 8
FEATURES_SCHEMA = "asset_id long, kind string, n_bytes int, feature array<double>"


def synth_assets(spark: SparkSession, docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake asset table from the documents table:
    payload = utf-8 bytes of the text, kind round-robins image/audio/video.
    Real pipelines read (path, payload) from object storage instead."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col(id_col) % 10000).cast("int").alias("duration_ms"),
        F.lit("synthetic").alias("codec"),
    )


def _parse_pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) for P5/P6; '#' comments
    and arbitrary whitespace per the netpbm spec."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        if i >= len(payload):
            raise ValueError("truncated PNM header")
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    i += 1  # single whitespace after maxval, then binary data
    return tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3]), i


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an uncompressed image payload to an (H, W, 3) uint8 array.

    Real decode, no codec libraries: PPM ``P6`` / PGM ``P5`` (netpbm
    binary) and BMP with BITMAPINFOHEADER, 24/32-bit, BI_RGB (bottom-up
    or top-down, row padding honored).  Compressed formats raise
    NotImplementedError — libjpeg/libpng are not in this container;
    deployments replace this body, same signature.
    """
    if payload[:2] in (b"P6", b"P5"):
        magic, w, h, maxval, off = _parse_pnm_header(payload)
        ch = 3 if magic == b"P6" else 1
        n = w * h * ch
        if maxval > 255:
            # 2-byte big-endian samples per the netpbm spec
            data = np.frombuffer(payload, dtype=">u2", count=n, offset=off)
        else:
            data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
        img = data.reshape(h, w, ch)
        if maxval != 255:
            img = (img.astype(np.float64) * (255.0 / maxval)).astype(np.uint8)
        if ch == 1:
            img = np.repeat(img, 3, axis=2)
        return np.ascontiguousarray(img)
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if compression != 0 or bpp not in (24, 32):
            raise NotImplementedError(
                f"BMP compression={compression} bpp={bpp} needs a codec library"
            )
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        rows = []
        top_down = h < 0
        h = abs(h)
        for r in range(h):
            start = off + r * stride
            row = np.frombuffer(payload, dtype=np.uint8, count=w * nch, offset=start)
            rows.append(row.reshape(w, nch))
        img = np.stack(rows if top_down else rows[::-1])
        return img[:, :, [2, 1, 0]]  # BGR(A) → RGB, alpha dropped
    raise NotImplementedError(
        "only PPM/PGM/BMP(BI_RGB) decode without codec libraries; "
        "JPEG/PNG need libjpeg/libpng — use fake=True or swap this body"
    )


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Decode RIFF PCM WAV to (sample_rate, float64 samples in [-1, 1),
    channels averaged to mono).  16-bit PCM only; other encodings raise
    NotImplementedError (no audio codec libraries in this container)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format={audio_format} bits={bits} needs an audio codec library"
        )
    samples = np.frombuffer(
        data, dtype="<i2", count=len(data) // 2
    ).astype(np.float64) / 32768.0
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return rate, samples


def resize_nearest(img: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resize (the index-grid classic), pure numpy."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: "np.ndarray") -> "np.ndarray":
    """8 content features: per-channel mean and std (RGB), gray mean/std."""
    x = img.astype(np.float64) / 255.0
    gray = x.mean(axis=2)
    return np.array(
        [
            x[..., 0].mean(), x[..., 1].mean(), x[..., 2].mean(),
            x[..., 0].std(), x[..., 1].std(), x[..., 2].std(),
            gray.mean(), gray.std(),
        ]
    )


def audio_features(rate: int, samples: "np.ndarray") -> "np.ndarray":
    """8 content features: duration, rms, zero-crossing rate, peak + rms
    of 4 equal time segments (a codec-free fbank stand-in)."""
    n = len(samples)
    if n == 0:
        return np.zeros(8)
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
    segs = np.array_split(samples, 4)
    seg_rms = [float(np.sqrt(np.mean(s**2))) if len(s) else 0.0 for s in segs]
    return np.array([n / rate, rms, zcr, float(np.abs(samples).max()), *seg_rms])


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-content embedding: sha256 of
    the payload chopped into ``dim`` uniform floats in [0, 1)."""
    h = hashlib.sha256(payload or b"").digest()
    vals = [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]
    return np.asarray(vals, dtype=np.float64)


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """assets → (asset_id, kind, n_bytes, feature array<double>).

    One Arrow-batched ``mapInPandas`` pass; only (asset_id, kind, payload)
    reach Python, everything else is pruned at the scan.  Batches arrive
    as whole pandas frames, so a real decoder can vectorize across the
    batch (e.g. torch stack) instead of per-row work.

    ``fake=False`` runs the real decoders: payloads are sniffed by magic
    bytes — PNM/BMP → ``decode_image`` + ``image_features``, RIFF/WAVE →
    ``decode_wav`` + ``audio_features``; anything else raises the decoder's
    NotImplementedError (compressed codecs are not in this container).
    """
    slim = assets.select("asset_id", "kind", "payload")

    def one(payload: bytes) -> np.ndarray:
        if fake:
            return _fake_features(payload)
        head = bytes(payload[:4]) if payload else b""
        if head[:2] in (b"P6", b"P5", b"BM"):
            return image_features(decode_image(bytes(payload)))
        if head == b"RIFF":
            return audio_features(*decode_wav(bytes(payload)))
        raise NotImplementedError(
            "unrecognized payload magic; only PNM/BMP images and PCM WAV "
            "decode without codec libraries"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [one(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return slim.mapInPandas(kernel, FEATURES_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (JVM-side explode of the sample grid — the decode of each
    frame would then run through ``extract_features``-style kernels)."""
    video = assets.filter(F.col("kind") == "video")
    grid = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return video.select(
        "asset_id",
        F.explode(grid).alias("frame_ms"),
    )
