"""Deduplication family for web-scale training-data pipelines.

Five strategies over a ``documents(doc_id, text, ...)`` table, each chosen by
the scale/precision trade:

* exact            — hash groupBy; bit-exact duplicates only.
* minhash LSH      — shingle → minhash signature → band buckets → candidate
                     pairs → exact Jaccard verify. Near-dup at 10^9 docs:
                     only same-bucket pairs are compared (the classic
                     Broder/LSH construction), all as built-in expressions.
* simhash          — 64-bit charikar fingerprint via one Arrow UDF; hamming
                     ≤ r pairs via band-exact-match pre-join (pigeonhole).
* n-gram Jaccard   — exact pairwise similarity via shingle explode +
                     equi-join (for candidate sets small enough to verify).
* embedding cosine — near-dup by cosine ≥ τ over an embedding column.

Everything is deterministic; the portable hash (md5-prefix → int64) is used
where the DuckDB oracle must reproduce values, xxhash64 elsewhere.
The reference's only dedup is the canonical-key anti-join pattern
(screenshot_system/io_adapter.py:65-69, maga/crawler.py:216-223); these
operators generalize it to content identity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def portable_hash64(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit positive int64 reproducible in DuckDB as
    ``('0x' || substr(md5(salt || x), 1, 15))::BIGINT``."""
    salted = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each exact-content group."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def word_shingles(text_col: Column, k: int = 3) -> Column:
    """Lower-cased word k-gram shingles as array<string> (may be empty)."""
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.size(words)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )


def minhash_signature(shingles: Column, num_hashes: int, portable: bool = True) -> Column:
    """array<long> minhash signature: per seed i, min over shingles of
    hash(i || shingle). Empty shingle set → nulls (filtered by callers)."""
    def one(i: int) -> Column:
        if portable:
            h = lambda s: portable_hash64(s, salt=f"mh{i}:")  # noqa: E731
        else:
            h = lambda s: F.xxhash64(F.lit(f"mh{i}:"), s)  # noqa: E731
        return F.array_min(F.transform(shingles, h))

    return F.array(*[one(i) for i in range(num_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs (a_id < b_id) that collide in ≥1 LSH band.

    Scale shape: explode to (band, band_hash) — one shuffle groups collisions;
    no all-pairs comparison ever happens."""
    rows_per_band = num_hashes // bands
    sig = (
        df.select(F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_k).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes, portable))
    )
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.hash(F.concat_ws(",", F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ))).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle
    (a_id < b_id, jaccard >= threshold). Shuffle key = shingle — pairs that
    share nothing are never materialized."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("id").alias("a_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("b_id"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a_id")
        .join(nb, "b_id")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


SIMHASH_BITS = 64


@F.pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """Charikar simhash over lower-cased word tokens, xxh64 token hashes,
    vectorized per Arrow batch."""
    import numpy as np

    from maga_spark.xxh64 import xxh64

    out = []
    for t in texts:
        toks = (t or "").lower().split()
        if not toks:
            out.append(0)
            continue
        hs = np.array([xxh64(w.encode("utf-8")) for w in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        sig = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out, dtype="int64")


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Pairs with simhash hamming distance ≤ max_hamming.

    Pigeonhole pre-join: split 64 bits into n_bands blocks; any pair within
    distance < n_bands must agree exactly on ≥1 block — equi-join per block,
    then exact ``bit_count(a^b)`` verify. Requires max_hamming < n_bands."""
    assert max_hamming < n_bands
    width = SIMHASH_BITS // n_bands
    sh = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim"))
    blocks = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("sim"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bits"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sim", F.col("bb.blk").alias("blk"), F.col("bb.bits").alias("bits"))
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.bits") == F.col("b.bits")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs (a_id < b_id) with cosine ≥ threshold — brute force O(n²) verify
    (the exactness baseline; LSH-bucketed path in operators.similarity)."""
    n = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(
            F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
        ).alias("norm"),
    )
    a, b = n.alias("a"), n.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            (dot / (F.col("a.norm") * F.col("b.norm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def phash_near_dups(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-dup by perceptual-hash hamming distance (input_hint phash
    column): ``bit_count(a ^ b) <= r`` (SURVEY.md §7.7)."""
    a = images.select(F.col("image_id").alias("a_id"), F.col("phash").alias("pa"))
    b = images.select(F.col("image_id").alias("b_id"), F.col("phash").alias("pb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
