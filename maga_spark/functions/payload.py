"""O-52 ★: payload decode + validate, Arrow-vectorized.

The reference validates fetched blobs with a SHA-1 + size check
(maga/downloader.py:91-103) and decodes video via PyAV
(screenshot_system/video.py:12-17). Generalized per BASELINE.json
``input_hint``: decode ``bytes`` by ``fmt``, require PSNR >= 40 dB vs the
reference pixels for the lossy format (exact for lossless), and caption
byte-equality. Implemented as a single Arrow-batched pandas UDF — numpy
decode inside the batch, no row-at-a-time Python UDF (input_hint: "no
per-row Python" means no per-row *serialization*; variable-length blob
decode is inherently per-element but stays inside one Arrow batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maga_spark import codec

PSNR_MIN_DB = 40.0

VALIDATE_STRUCT = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("err", T.StringType()),
    ]
)


@F.pandas_udf(VALIDATE_STRUCT)
def _validate_batch(
    data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series, truth: pd.Series
) -> pd.DataFrame:
    import numpy as np

    oks, psnrs, errs = [], [], []
    for d, wi, hi, f, t in zip(data, w, h, fmt, truth):
        try:
            px = codec.decode(d, int(wi), int(hi), f)
            ref = np.frombuffer(t, dtype=np.uint8).reshape(int(hi), int(wi), 3)
            p = codec.psnr(px, ref)
            if f in ("raw", "rlez"):
                ok = bool(np.array_equal(px, ref))
                err = None if ok else "lossless mismatch"
            else:
                ok = p >= PSNR_MIN_DB
                err = None if ok else f"psnr {p:.2f} < {PSNR_MIN_DB}"
            oks.append(ok)
            psnrs.append(min(p, 999.0))
            errs.append(err)
        except Exception as e:  # malformed payload → reject, never crash
            oks.append(False)
            psnrs.append(0.0)
            errs.append(f"decode: {e}")
    return pd.DataFrame({"ok": oks, "psnr_db": psnrs, "err": errs})


def validate_payloads(
    df: DataFrame,
    data: str = "bytes",
    w: str = "w",
    h: str = "h",
    fmt: str = "fmt",
    truth_px: str = "px_npy",
    caption: str = "caption",
    caption_expected: Column | None = None,
) -> DataFrame:
    """Append ``valid: boolean, psnr_db: double, invalid_reason: string``.

    Pixel check via the Arrow UDF; caption byte-equality as a codegen'd
    expression (the cheap predicate stays JVM-side — early-abort ordering,
    SURVEY.md §4.1)."""
    v = _validate_batch(F.col(data), F.col(w), F.col(h), F.col(fmt), F.col(truth_px))
    out = df.withColumn("_v", v)
    cap_ok = (
        F.lit(True)
        if caption_expected is None
        else (F.col(caption) == caption_expected)
    )
    return (
        out.withColumn("valid", F.col("_v.ok") & cap_ok)
        .withColumn("psnr_db", F.col("_v.psnr_db"))
        .withColumn(
            "invalid_reason",
            F.when(~F.col("_v.ok"), F.col("_v.err")).when(
                ~cap_ok, F.lit("caption mismatch")
            ),
        )
        .drop("_v")
    )


def byte_stats(
    bytes_col: Column, brightness_col: str = "brightness", contrast_col: str = "contrast"
) -> dict[str, Column]:
    """Byte-level payload statistics as PURE expressions — the zero-Python
    twin of ``multimodal.extract_features`` for pipelines that only need
    scan-time quality gates (mean byte value ~ brightness, population
    variance ~ contrast for the ``raw`` codec, where bytes ARE pixels).

    The blob is hex-encoded and parsed two chars at a time with
    ``transform`` + ``conv`` — whole-stage-codegen'd, no Arrow transfer,
    and exactly re-derivable in SQL engines (the DuckDB oracle uses
    ``('0x' || substr(...))::INT``). All arithmetic stays integer-exact:
    sums of <= 255·n and squares < 2^53, divisions by the byte count only
    at the end. NULL/empty payloads yield NULL stats.
    """
    hx = F.hex(bytes_col)
    n = F.length(bytes_col)
    px = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.conv(hx.substr(i * 2 + 1, F.lit(2)), 16, 10).cast("long"),
    )
    s = F.aggregate(px, F.lit(0).cast("long"), lambda acc, v: acc + v)
    s2 = F.aggregate(px, F.lit(0).cast("long"), lambda acc, v: acc + v * v)
    mean = F.when(n > 0, s / n)
    var = F.when(n > 0, s2 / n - (s / n) * (s / n))
    return {brightness_col: mean, contrast_col: var}


def sniff_format(bytes_col: Column) -> Column:
    """Magic-byte container sniff as a PURE expression — the scan-time
    twin of the declared ``fmt`` column in BASELINE.json's input_hint
    table. A 100-TB image ingest cannot trust upstream metadata: a blob
    labelled ``png`` that actually holds JPEG bytes poisons every decoder
    downstream, so the declared/actual cross-check belongs in the first
    scan, inside whole-stage codegen, not in a Python decode attempt per
    row (the reference trusts its wire framing the same way it trusts
    sha1 — maga/downloader.py:91-103; here the container signature IS the
    cheap integrity bit).

    Recognizes the public file signatures: PNG (\\x89PNG\\r\\n\\x1a\\n),
    JPEG (\\xff\\xd8\\xff), GIF (GIF87a/GIF89a), BMP (BM), WEBP
    (RIFF....WEBP), TIFF (II*\\0 / MM\\0*). Unknown/short/NULL → NULL.
    Only the first 12 bytes are hexed — the blob itself is never copied
    or shipped."""
    hx = F.hex(F.substring(bytes_col, 1, 12))
    return (
        F.when(hx.startswith("89504E470D0A1A0A"), F.lit("png"))
        .when(hx.startswith("FFD8FF"), F.lit("jpeg"))
        .when(hx.startswith("474946383761") | hx.startswith("474946383961"), F.lit("gif"))
        .when(
            hx.startswith("52494646") & (hx.substr(17, 8) == "57454250"), F.lit("webp")
        )
        .when(hx.startswith("424D"), F.lit("bmp"))
        .when(hx.startswith("49492A00") | hx.startswith("4D4D002A"), F.lit("tiff"))
        .otherwise(F.lit(None).cast("string"))
    )
