"""Deterministic image codecs + PSNR + phash (numpy/zlib only — the sandbox
has no PIL/ffmpeg, SURVEY.md §7.7).

The payload layer of the engine: per BASELINE.json ``input_hint`` the payload
table is image+caption rows ``(image_id, bytes, w, h, fmt, caption, phash)``.
Three formats, mirroring the reference's validated-blob semantics
(SHA-1-checked metainfo, maga/downloader.py:91-103):

* ``raw``  — w*h*3 uint8 row-major RGB; lossless.
* ``rlez`` — zlib-compressed raw; lossless.
* ``q8``   — 6-bit-per-channel quantized then zlib; lossy with
  PSNR >= 40 dB by construction (quantization step 4 → RMSE ≈ 1.17 →
  PSNR ≈ 46.8 dB; note FIXTURES.md originally sketched 3-bit, which cannot
  meet the input_hint's 40 dB bar — 6-bit does).

These are plain-python/numpy functions; the Spark engine only ever calls
them from inside Arrow-batched UDFs (maga_spark.functions.payload).
"""

from __future__ import annotations

import zlib

import numpy as np

FORMATS = ("raw", "rlez", "q8")
_Q8_STEP = 4  # 256/64 levels → 6 bits per channel


def encode(px: np.ndarray, fmt: str) -> bytes:
    """px: (h, w, 3) uint8 → payload bytes."""
    assert px.dtype == np.uint8 and px.ndim == 3 and px.shape[2] == 3
    if fmt == "raw":
        return px.tobytes()
    if fmt == "rlez":
        return zlib.compress(px.tobytes(), 6)
    if fmt == "q8":
        q = (px.astype(np.int32) // _Q8_STEP).astype(np.uint8)
        return zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """payload bytes → (h, w, 3) uint8. Raises on malformed input — callers
    treat that as the reference's discard-on-bad-hash (maga/downloader.py:
    94-101)."""
    if fmt == "raw":
        a = np.frombuffer(data, dtype=np.uint8)
    elif fmt == "rlez":
        a = np.frombuffer(zlib.decompress(data), dtype=np.uint8)
    elif fmt == "q8":
        q = np.frombuffer(zlib.decompress(data), dtype=np.uint8).astype(np.int32)
        # dequantize to bin centers
        a = np.clip(q * _Q8_STEP + _Q8_STEP // 2, 0, 255).astype(np.uint8)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    if a.size != h * w * 3:
        raise ValueError(f"size mismatch: {a.size} != {h * w * 3}")
    return a.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(px: np.ndarray) -> int:
    """Average-hash: grayscale → 8×8 block-mean downsample → bit per cell
    (1 = above mean), packed row-major MSB-first into a signed int64."""
    g = px.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # block-mean resample to 8x8 (h, w are multiples of 8 in fixtures; pad
    # otherwise by edge-cropping to the largest multiple)
    hh, ww = (h // 8) * 8, (w // 8) * 8
    g = g[:hh, :ww].reshape(8, hh // 8, 8, ww // 8).mean(axis=(1, 3))
    bits = (g > g.mean()).astype(np.uint64).ravel()
    v = np.uint64(0)
    for bit in bits:
        v = (v << np.uint64(1)) | bit
    iv = int(v)
    return iv - (1 << 64) if iv >= (1 << 63) else iv


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic per-image pixels: seeded by xxh64 of the image_id —
    no wall-clock, no os.urandom (SURVEY.md §7.6)."""
    from maga_spark.xxh64 import xxh64

    rng = np.random.Generator(np.random.PCG64(xxh64(image_id.encode("utf-8"))))
    base = rng.integers(0, 256, size=(h, w, 3))
    # smooth gradient + noise so q8 quantization error is well-distributed
    gy = np.linspace(0, 64, h)[:, None, None]
    gx = np.linspace(0, 64, w)[None, :, None]
    return ((base * 0.5 + gy + gx) % 256).astype(np.uint8)
