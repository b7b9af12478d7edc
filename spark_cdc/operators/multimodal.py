"""Multimodal (image/audio/video) column plumbing + pure-numpy codecs.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages so each task processes whole record batches
(the only sane shape for multi-MB blobs — row-at-a-time Python would
serialize each blob separately).

Real decoding is implemented for the container-less formats — binary
PPM (P6) / PGM (P5) images and PCM-16 WAV audio — entirely with numpy
(:func:`decode_media`); formats that need external codec libraries
(JPEG/MP3/H.264) surface per-row as ``decode_error`` instead of
failing the job, which is the behaviour you want at corpus scale where
a few malformed blobs must not kill a 10^9-row decode stage. The
``fake`` feature mode (digest-derived vectors) remains for plumbing
tests and as a stand-in where only the pipeline shape matters.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        # digest of the lowercase-hex encoding of the payload (hex is
        # injective so this is still content-addressing); kept separate
        # from the raw-byte sha256 because cross-engine oracles
        # (DuckDB sha256 is VARCHAR-only) can recompute it
        T.StructField("content_digest", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats
    derived from the blob digest. Replace with PIL/ffmpeg decoding on
    a real cluster — the surrounding plumbing does not change."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


# ------------------------------------------------------ pure-numpy codecs
def _parse_pnm(b: bytes):
    """Binary PPM (P6) / PGM (P5) → (width, height, channels, uint8
    pixel array). Header: magic, then width/height/maxval tokens
    separated by whitespace, '#'-comments allowed, one whitespace byte
    before the raster. Raises ValueError on malformed input."""
    magic = b[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        if i >= len(b):
            raise ValueError("truncated PNM header")
        c = b[i:i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            j = b.find(b"\n", i)
            i = len(b) if j == -1 else j + 1
        else:
            j = i
            while j < len(b) and b[j:j + 1] not in b" \t\r\n":
                j += 1
            toks.append(int(b[i:j]))
            i = j
    i += 1  # single whitespace byte separating header from raster
    w, h, maxval = toks
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ValueError(f"unsupported PNM geometry {toks}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(b) - i < need:
        raise ValueError("truncated PNM raster")
    data = np.frombuffer(b, dtype=np.uint8, count=need, offset=i)
    return w, h, ch, data.reshape(h, w, ch)


def _parse_wav(b: bytes):
    """PCM-16 RIFF/WAVE → (n_channels, sample_rate, int16 samples).
    Walks the chunk list (fmt /data may be preceded by LIST etc.).
    Raises ValueError on non-PCM16 or malformed input."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    sr = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16 or n_ch < 1 or sr <= 0:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return n_ch, sr, samples


def _grid_features(gray: np.ndarray) -> np.ndarray:
    """FEATURE_DIM floats: 4×4 grid of mean pixel intensities / 255 —
    the classic thumbnail descriptor, resolution-independent."""
    h, w = gray.shape
    ys = np.linspace(0, h, 5).astype(int)
    xs = np.linspace(0, w, 5).astype(int)
    out = np.zeros(FEATURE_DIM, dtype=np.float64)
    for yi in range(4):
        for xi in range(4):
            block = gray[ys[yi]:max(ys[yi + 1], ys[yi] + 1),
                         xs[xi]:max(xs[xi + 1], xs[xi] + 1)]
            out[yi * 4 + xi] = block.mean() if block.size else 0.0
    return (out / 255.0).astype(np.float32)


def _window_rms_features(samples: np.ndarray) -> np.ndarray:
    """FEATURE_DIM floats: RMS energy over 16 equal time windows,
    normalized to [0, 1] by int16 full scale."""
    if samples.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    idx = np.linspace(0, samples.size, FEATURE_DIM + 1).astype(int)
    x = samples.astype(np.float64) / 32768.0
    out = np.array([
        np.sqrt(np.mean(x[a:max(b, a + 1)] ** 2)) if a < samples.size else 0.0
        for a, b in zip(idx[:-1], idx[1:])
    ])
    return out.astype(np.float32)


def _decode_real(payload: bytes) -> dict:
    """Sniff + decode one blob. Returns the DECODED_SCHEMA field dict;
    unknown/malformed payloads yield decode_error instead of raising
    (one bad blob must not fail a corpus-scale decode stage)."""
    out: dict = {
        "format": None, "width": None, "height": None, "channels": None,
        "sample_rate": None, "n_samples": None, "duration_ms": None,
        "mean_value": None, "features": None, "decode_error": None,
    }
    try:
        if payload is None:
            raise ValueError("null payload")
        if payload[:2] in (b"P5", b"P6"):
            w, h, ch, px = _parse_pnm(payload)
            out.update(
                format="ppm" if ch == 3 else "pgm",
                width=w, height=h, channels=ch,
                mean_value=float(px.mean()),
                features=_grid_features(px.mean(axis=2)).tolist(),
            )
        elif payload[:4] == b"RIFF":
            n_ch, sr, samples = _parse_wav(payload)
            out.update(
                format="wav", channels=n_ch, sample_rate=sr,
                n_samples=int(samples.size // n_ch),
                duration_ms=int(round(samples.size / n_ch / sr * 1000)),
                # RMS in raw int16 units (exact for integer-valued fills,
                # which keeps the cross-engine oracle bit-stable)
                mean_value=float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                if samples.size else 0.0,
                features=_window_rms_features(samples).tolist(),
            )
        else:
            raise ValueError("unsupported format (no pure-numpy codec)")
    except (ValueError, struct.error) as e:
        out["decode_error"] = str(e)
    return out


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("mean_value", T.DoubleType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Real decode over a media table: PPM/PGM images and PCM-16 WAV
    audio parsed with numpy inside Arrow-batched ``mapInPandas``.
    Per-row ``decode_error`` instead of task failure for undecodable
    blobs. Scale shape: stateless per-batch map, no shuffle; the
    decoded columns are tiny next to the payload, so project the
    payload away immediately downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_real(p) for p in pdf["payload"]]
            base = pd.DataFrame(
                {"media_id": pdf["media_id"].values, "kind": pdf["kind"].values}
            )
            yield pd.concat(
                [base, pd.DataFrame(decoded, index=base.index)], axis=1
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


def extract_features(media: DataFrame, decode_fn: str = "fake") -> DataFrame:
    """Batch feature extraction over a media table via ``mapInPandas``.

    ``decode_fn='real'`` derives features from actual decoded content
    (grid intensities for PNM images, windowed RMS for WAV audio; see
    :func:`decode_media`) with ``features=None`` for blobs no
    pure-numpy codec covers; ``'fake'`` derives them from the blob
    digest (plumbing tests / codec-less stand-in)."""
    if decode_fn not in ("fake", "real"):
        raise ValueError(f"decode_fn must be 'fake' or 'real', got {decode_fn!r}")

    def feats(b):
        if b is None:
            return None
        if decode_fn == "real":
            d = _decode_real(b)
            return d["features"]
        return _fake_decode_features(b).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "content_digest": payloads.map(
                        lambda b: hashlib.sha256(b.hex().encode()).hexdigest()
                        if b is not None
                        else None
                    ),
                    "features": payloads.map(feats),
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def wav_bytes(sample_rate: int, samples: np.ndarray, n_channels: int = 1) -> bytes:
    """Minimal PCM-16 RIFF/WAVE encoder (the write twin of
    :func:`_parse_wav`) — enough to round-trip fixtures and export
    decoded audio without codec libraries."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * 2 * n_channels, 2 * n_channels, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def generate_decodable_media_fixture(spark, n: int = 200) -> DataFrame:
    """Deterministic REAL-format media fixture: every payload is a
    valid binary PNM image or PCM-16 WAV whose geometry and content
    are closed-form functions of the id — so a cross-engine oracle can
    predict what decoding must recover without itself decoding:

    - id % 3 == 0 → P6 PPM, width 4+id%13, height 3+id%7, every pixel
      byte = id % 251  (decoded mean_value == id % 251 exactly);
    - id % 3 == 2 → P5 PGM, same geometry/fill;
    - id % 3 == 1 → WAV mono PCM-16 @ 8 kHz, 400·(1+id%5) samples of
      constant amplitude id % 10000  (duration_ms == 50·(1+id%5), RMS
      == id % 10000 exactly — integer-valued, so bit-stable across
      engines).

    Wall-clock-free and seedless by design (pure function of id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["id"]:
                mid = int(raw)
                m = mid % 3
                if m == 1:
                    sr, nsamp, amp = 8000, 400 * (1 + mid % 5), mid % 10000
                    payload = wav_bytes(sr, np.full(nsamp, amp, dtype="<i2"))
                    kind = "audio"
                else:
                    w, h, v = 4 + mid % 13, 3 + mid % 7, mid % 251
                    if m == 0:
                        payload = f"P6\n{w} {h}\n255\n".encode() + bytes([v]) * (w * h * 3)
                    else:
                        payload = f"P5\n{w} {h}\n255\n".encode() + bytes([v]) * (w * h)
                    kind = "image"
                rows.append(
                    {"media_id": mid, "kind": kind, "payload": payload, "meta": None}
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def generate_media_fixture(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary fixture: payload bytes derived from
    the id (no RNG), mixed kinds, plausible metadata."""
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
            ).alias("kind"),
            F.unhex(F.sha2(F.concat(F.lit(f"seed{seed}-"), F.col("id")), 256)).alias("payload"),
            F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.lit(64).alias("width"),
                F.lit(64).alias("height"),
                (F.pmod(F.col("id"), F.lit(5000)) + 1000).cast("int").alias("duration_ms"),
            ).alias("meta"),
        )
    )
    return df
