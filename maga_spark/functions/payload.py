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


def header_dims(bytes_col: Column) -> dict[str, Column]:
    """Actual (width, height) read straight out of the container HEADER as
    pure expressions — ``{"hdr_fmt", "hdr_w", "hdr_h"}`` columns, NULL
    where the blob is not a recognized/complete header.

    This is the second scan-time integrity bit after ``sniff_format``: the
    input_hint table declares ``w``/``h`` columns, and at 100 TB the
    cheapest way to catch corrupt or mislabeled geometry is to read the
    dimensions the CONTAINER itself claims — fixed-offset header fields,
    no decode, no Python, only the first 26 bytes ever hexed (the blob is
    never copied or shuffled). Mismatch rows route to the dead-letter
    channel before any decoder allocates w·h buffers for a lying header
    (the reference's analog trust boundary: length-prefix and sha1 checks
    before accepting a payload, maga/downloader.py:91-103).

    Formats with fixed-offset dims (public specs): PNG (IHDR big-endian
    u32 pair at bytes 17-24), GIF (logical-screen little-endian u16 pair
    at bytes 7-10), BMP (BITMAPINFOHEADER little-endian i32 pair at bytes
    19-26; negative height = top-down row order, reported as |h|). JPEG
    dims live in a variable-position SOF marker — not a fixed-offset
    read, so JPEG reports NULL dims here and keeps its validation in the
    decode stage. All arithmetic runs on ONE hex string of the 26-byte
    prefix, identically re-runnable in the DuckDB oracle."""
    hx = F.hex(F.substring(bytes_col, 1, 26))
    n = F.length(hx)  # 2 chars per byte present

    def be32(byte_pos: int) -> Column:  # 1-indexed byte offset
        return F.conv(F.substring(hx, byte_pos * 2 - 1, 8), 16, 10).cast("long")

    def le16(byte_pos: int) -> Column:
        return F.conv(
            F.concat(
                F.substring(hx, byte_pos * 2 + 1, 2), F.substring(hx, byte_pos * 2 - 1, 2)
            ),
            16,
            10,
        ).cast("long")

    def le32(byte_pos: int) -> Column:
        return F.conv(
            F.concat(
                F.substring(hx, byte_pos * 2 + 5, 2),
                F.substring(hx, byte_pos * 2 + 3, 2),
                F.substring(hx, byte_pos * 2 + 1, 2),
                F.substring(hx, byte_pos * 2 - 1, 2),
            ),
            16,
            10,
        ).cast("long")

    def i32(c: Column) -> Column:  # two's-complement i32 from the u32 read
        return F.when(c >= F.lit(1 << 31), c - F.lit(1 << 32)).otherwise(c)

    fmt = sniff_format(bytes_col)
    png_ok = (fmt == "png") & (n >= 48)
    gif_ok = (fmt == "gif") & (n >= 20)
    bmp_ok = (fmt == "bmp") & (n >= 52)
    w = (
        F.when(png_ok, be32(17))
        .when(gif_ok, le16(7))
        .when(bmp_ok, i32(le32(19)))
        .otherwise(F.lit(None).cast("long"))
    )
    h = (
        F.when(png_ok, be32(21))
        .when(gif_ok, le16(9))
        .when(bmp_ok, F.abs(i32(le32(23))))
        .otherwise(F.lit(None).cast("long"))
    )
    return {"hdr_fmt": fmt, "hdr_w": w, "hdr_h": h}


def geometry_check(
    images: DataFrame,
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Declared-vs-header geometry gate over the input_hint table shape:
    appends ``hdr_fmt``/``hdr_w``/``hdr_h`` and a ``geometry_ok`` verdict —
    true iff the container header exists and agrees with the declared
    (fmt, w, h); NULL (unknown/unparseable header, e.g. JPEG) when there
    is nothing to check, false on any disagreement. Pure expressions;
    composes with scan pushdown ahead of the decode stage."""
    d = header_dims(F.col(bytes_col))
    agree = (
        (d["hdr_fmt"] == F.col(fmt_col))
        & (d["hdr_w"] == F.col(w_col).cast("long"))
        & (d["hdr_h"] == F.col(h_col).cast("long"))
    )
    return (
        images.withColumn("hdr_fmt", d["hdr_fmt"])
        .withColumn("hdr_w", d["hdr_w"])
        .withColumn("hdr_h", d["hdr_h"])
        .withColumn(
            "geometry_ok",
            F.when(F.col("hdr_w").isNull(), F.lit(None).cast("boolean")).otherwise(agree),
        )
    )
