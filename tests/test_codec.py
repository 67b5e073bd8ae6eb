"""Codec + payload validation (SURVEY.md §7.7, input_hint invariants)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maga_spark import codec
from maga_spark.functions.payload import PSNR_MIN_DB, validate_payloads


@pytest.mark.parametrize("fmt", codec.FORMATS)
@pytest.mark.parametrize("w,h", [(16, 16), (24, 32)])
def test_roundtrip(fmt, w, h):
    px = codec.gen_pixels(f"img-{fmt}-{w}x{h}", w, h)
    data = codec.encode(px, fmt)
    back = codec.decode(data, w, h, fmt)
    if fmt in ("raw", "rlez"):
        assert np.array_equal(back, px)
    else:
        p = codec.psnr(back, px)
        assert p >= PSNR_MIN_DB, f"q8 psnr {p}"


def test_decode_rejects_malformed():
    with pytest.raises(Exception):
        codec.decode(b"short", 16, 16, "raw")
    with pytest.raises(Exception):
        codec.decode(b"not-zlib", 16, 16, "rlez")


def test_psnr_identical_is_inf():
    a = codec.gen_pixels("x", 16, 16)
    assert codec.psnr(a, a) == float("inf")


def test_phash_is_stable_and_locality():
    a = codec.gen_pixels("img-a", 32, 32)
    assert codec.phash64(a) == codec.phash64(a)
    # a tiny perturbation keeps hamming distance small
    b = a.copy()
    b[0, 0, 0] = (int(b[0, 0, 0]) + 3) % 256
    d = bin((codec.phash64(a) ^ codec.phash64(b)) & ((1 << 64) - 1)).count("1")
    assert d <= 4


def test_validate_payloads_spark(spark):
    rows = []
    for i, fmt in enumerate(codec.FORMATS):
        iid = f"img{i}"
        px = codec.gen_pixels(iid, 16, 16)
        rows.append((iid, codec.encode(px, fmt), 16, 16, fmt, f"img {iid}", px.tobytes()))
    # one corrupted payload → valid=false with decode reason
    px = codec.gen_pixels("bad", 16, 16)
    rows.append(("bad", b"\x00\x01", 16, 16, "rlez", "img bad", px.tobytes()))
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("caption", T.StringType()),
            T.StructField("px_npy", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = validate_payloads(
        df, caption_expected=F.concat(F.lit("img "), F.col("image_id"))
    ).collect()
    by_id = {r["image_id"]: r for r in out}
    for i, fmt in enumerate(codec.FORMATS):
        r = by_id[f"img{i}"]
        assert r["valid"], (fmt, r["invalid_reason"])
        assert r["psnr_db"] >= PSNR_MIN_DB
    assert not by_id["bad"]["valid"]
    assert "decode" in by_id["bad"]["invalid_reason"]
