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

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def dedup_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """Corpus-global line-level exact dedup (the C4/RefinedWeb rule): every
    line keeps only its FIRST occurrence across the whole corpus, ordered
    by (doc id, position); later occurrences — including repeats inside
    the same document — are dropped, and documents are reassembled from
    their surviving lines in original order.

    Scale shape: two hash aggregations, both map-side combinable, and NO
    window over the exploded lines — the keeper of each line group is
    ``min(struct(id, pos))`` computed by groupBy, so a boilerplate line
    with 10^9 occurrences collapses in the combiners instead of landing on
    one window partition. Docs whose every line was seen earlier come back
    with empty ``text`` and ``n_kept = 0`` (they stay countable for the
    drop report).
    """
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(delim))).alias("_pos", "line"),
    )
    keepers = lines.groupBy("line").agg(
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("k")
    )
    rebuilt = (
        keepers.select(F.col("k._id").alias("_id"), F.col("k._pos").alias("_pos"), "line")
        .groupBy("_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("_pos", "line"))).alias("arr"),
        )
        .select(
            "_id",
            F.concat_ws(delim, F.transform("arr", lambda s: s["line"])).alias("text_dedup"),
            F.size("arr").alias("n_kept"),
        )
    )
    n_total = docs.select(
        F.col(id_col).alias("_id"),
        F.size(F.split(F.col(text_col), _re.escape(delim))).alias("n_lines"),
    )
    return (
        n_total.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "n_lines",
        )
    )


def word_shingles(text_col: Column, k: int = 3) -> Column:
    """Lower-cased word k-gram shingles as array<string> (may be empty).
    The token array is ``let_``-bound: HOF lambdas re-evaluate outer
    expressions per element, so the un-bound form re-splits the whole
    text once per shingle — O(words·chars) per row."""
    from maga_spark.functions.scalar import let_

    def build(words: Column) -> Column:
        n = F.size(words)
        idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
            F.array().cast("array<int>")
        )
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
        )

    return let_(F.split(F.lower(F.trim(text_col)), r"\s+"), build)


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


def minhash_band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    portable: bool = True,
) -> DataFrame:
    """``(id, band, bh)`` LSH band rows — the shared banding unit of the
    self-join candidate generator AND the incremental near-dup index (one
    definition, so stored indexes can never diverge from the ad-hoc path).
    ``bh`` hashes the band's signature slice: a Spark ``hash`` in fast
    mode, the canonical comma-joined value string in portable mode (exact
    band equality, bit-reproducible in DuckDB)."""
    rows_per_band = num_hashes // bands
    sig = (
        df.select(F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_k).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes, portable))
    )

    def _bh(b):
        joined = F.concat_ws(",", F.transform(
            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
            lambda v: v.cast("string"),
        ))
        return joined if portable else F.hash(joined).cast("string")

    return sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.cast("int").alias("band"), _bh(b).alias("bh")),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


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
    banded = minhash_band_rows(df, id_col, text_col, num_hashes, bands, shingle_k, portable)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def build_minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Materialize the corpus's LSH band rows as a STORED near-dup index —
    the incremental-state analog of ``update_shard_blooms`` /
    ``append_to_ivf_index`` for dedup: a growing corpus dedupes each NEW
    ingest batch against this index (``query_minhash_index``) in
    O(batch-bands ⋈ index) instead of re-running the corpus×corpus
    self-join every batch. Persist with ``.write.partitionBy("band")`` so
    serving prunes to the probed bands; at cluster scale, bucket on
    ``bh`` for a shuffle-free probe join."""
    return minhash_band_rows(df, id_col, text_col, num_hashes, bands, shingle_k, portable)


def append_to_minhash_index(
    index: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Index ∪ the new batch's band rows — cost O(batch), no touch of the
    existing rows (append-only partitions on disk). The result is
    row-identical to ``build_minhash_index`` over the full corpus: banding
    is per-document, so incremental == from-scratch (tested)."""
    rows = minhash_band_rows(new_docs, id_col, text_col, num_hashes, bands, shingle_k, portable)
    return index.unionByName(rows)


def query_minhash_index(
    index: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Near-dup candidate pairs between a NEW ingest batch and the indexed
    corpus: ``(batch_id, index_id)`` distinct, self-matches dropped. The
    banding params MUST match the index's build params (band strings only
    collide within the same scheme). One equi-join on ``(band, bh)`` —
    the batch side shuffles O(batch); never all-pairs, never a corpus
    rescan."""
    qb = minhash_band_rows(batch, id_col, text_col, num_hashes, bands, shingle_k, portable)
    return (
        qb.alias("q")
        .join(index.alias("x"), ["band", "bh"])
        .filter(F.col("q.id") != F.col("x.id"))
        .select(F.col("q.id").alias("batch_id"), F.col("x.id").alias("index_id"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle
    (a_id < b_id, jaccard >= threshold). Shuffle key = shingle — pairs that
    share nothing are never materialized.

    ``max_doc_freq`` caps the self-join blowup: a shingle appearing in n
    docs contributes n²/2 join rows, so one stop-shingle ("of the and")
    present in 10⁶ docs would materialize ~10¹² pairs in a single group.
    Shingles with document frequency > ``max_doc_freq`` are dropped from
    the INTERSECTION join only (standard MinHash/SimHash-era practice:
    such shingles carry ~no Jaccard signal). Set sizes keep every shingle,
    so scores shift only for pairs whose sole shared shingles were hot —
    pairs that were far below any useful threshold anyway.

    The default is ``None`` — exact all-shingle semantics (the contract a
    caller of "exact Jaccard" expects; ADVICE r3). OPT IN to the cap at
    scale: any corpus large enough to contain a genuinely hot shingle must
    pass e.g. ``max_doc_freq=1000`` (the engine/bench call sites do)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    joinable = sh
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        # hot set is tiny by construction (few shingles exceed the cap) —
        # broadcast anti-join, no extra shuffle of the shingle stream
        joinable = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a, b = joinable.alias("a"), joinable.alias("b")
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


SIMHASH_BITS = 64  # xxhash64 mode; portable (md5-60-bit) mode uses 60


def _band_blocks(total_bits: int, n_bands: int) -> list[tuple[int, int]]:
    """Partition [0, total_bits) into n_bands contiguous (start, width)
    blocks of near-equal width (covers every bit — required for the
    pigeonhole guarantee)."""
    base, rem = divmod(total_bits, n_bands)
    blocks, start = [], 0
    for w in [base + 1] * rem + [base] * (n_bands - rem):
        blocks.append((start, w))
        start += w
    return blocks


def hamming_band_pairs(
    keyed: DataFrame,
    max_hamming: int,
    n_bands: int,
    total_bits: int,
    id_col: str = "id",
    key_col: str = "k",
) -> DataFrame:
    """EXACT hamming ≤ r pair generation with no crossJoin (pigeonhole):
    split the key's bits into n_bands blocks; any pair within distance
    r < n_bands must agree exactly on ≥1 block → per-block equi-join on
    (blk, bits) is a complete candidate generator; ``bit_count(a^b)``
    verifies survivors. One shuffle keyed by (blk, bits) — at 10^9 rows
    only same-block-value groups ever meet, never all-pairs."""
    assert max_hamming < n_bands, "pigeonhole needs max_hamming < n_bands"
    blocks = _band_blocks(total_bits, n_bands)
    exploded = keyed.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("k"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col(key_col), s)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("bits"),
                    )
                    for i, (s, w) in enumerate(blocks)
                ]
            )
        ).alias("bb"),
    ).select("id", "k", F.col("bb.blk").alias("blk"), F.col("bb.bits").alias("bits"))
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.bits") == F.col("b.bits")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(F.col("a.k").bitwiseXOR(F.col("b.k"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


import pandas as _pd
from pyspark.sql import types as _T


@F.pandas_udf(_T.LongType())
def simhash64_arrow(texts: "_pd.Series") -> "_pd.Series":
    """Charikar simhash via an Arrow-batched numpy bit-vote — the FAST path.

    Measured (local[32], best-of-2 after warm-up): 50k docs × 40 tokens —
    0.93s vs 1.95s for the exploded-token JVM aggregation below; 5k docs ×
    1000 tokens — 1.79s vs 2.17s. The numpy batch beats the explode +
    64-sum-agg shuffle in both regimes, so this stays the default despite
    the per-token Python ``xxh64`` call. Produces identical fingerprints to
    ``simhash_signatures(portable=False)`` (same hash: the repo's xxh64
    uses Spark's seed)."""
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
    return _pd.Series(out, dtype="int64")


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Charikar simhash per doc as (id, sim) — 100% built-in expressions:
    explode word tokens, hash each on the JVM, bit-vote with one groupBy
    carrying per-bit sum columns, then repack the sign bits.

    Use this when (a) the DuckDB-reproducible fingerprint is needed
    (portable=True → md5-60-bit token hashes the oracle recomputes
    value-for-value) or (b) Python workers must stay out of the plan
    (executor python-memory pressure at high parallelism). For raw
    throughput ``simhash64_arrow`` measured faster in both short- and
    long-document regimes (numbers on its docstring) — identical
    fingerprints in non-portable mode.

    Token weights follow term frequency (duplicates kept, as in the
    reference Charikar construction); docs with no tokens get sim = 0."""
    bits = 60 if portable else SIMHASH_BITS
    tok = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok")
    toks = df.select(F.col(id_col).alias("id"), tok).filter(F.col("tok") != "")
    hv = portable_hash64(F.col("tok")) if portable else F.xxhash64(F.col("tok"))
    hashed = toks.select("id", hv.alias("hv"))
    votes = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.shiftrightunsigned("hv", b).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        # bit 63 is the sign bit: OR (not +) keeps ANSI mode overflow-free
        one = -(1 << 63) if b == 63 else 1 << b
        term = F.when(F.col(f"v{b}") > 0, F.lit(one).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig.bitwiseOR(term)
    signed = votes.select("id", sig.alias("sim"))
    # empty/whitespace-only docs vote on nothing → sim = 0 (UDF-era contract)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(signed, "id", "left")
        .select("id", F.coalesce("sim", F.lit(0).cast("long")).alias("sim"))
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
    portable: bool = False,
    impl: str = "arrow",
    cache_signatures: bool = False,
) -> DataFrame:
    """Pairs with simhash hamming distance ≤ max_hamming; exact pair
    generation via the pigeonhole band join (``hamming_band_pairs``).

    impl='arrow' (default, measured faster — see simhash64_arrow) or
    'sql' (zero-Python plan). portable=True forces 'sql' (md5 hashes,
    DuckDB-reproducible). Fingerprints are identical across impls in
    non-portable mode."""
    bits = 60 if portable else SIMHASH_BITS
    if portable or impl == "sql":
        sh = simhash_signatures(df, id_col, text_col, portable=portable)
    else:
        sh = df.select(F.col(id_col).alias("id"), simhash64_arrow(F.col(text_col)).alias("sim"))
    if cache_signatures:
        # the band self-join consumes sh on BOTH sides; without a cache each
        # side re-runs the full per-bit vote aggregation over the corpus
        # (opt-in: one (id, sim) row per doc is tiny next to recomputing)
        sh = sh.persist()
    return hamming_band_pairs(
        sh, max_hamming=max_hamming, n_bands=n_bands, total_bits=bits, id_col="id", key_col="sim"
    )


def _cos_prep(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(
            F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
        ).alias("norm"),
    )


def _pair_cosine() -> Column:
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col("a.norm") * F.col("b.norm"))


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs (a_id < b_id) with cosine ≥ threshold — brute force O(n²).

    TEST-ORACLE BASELINE ONLY: the production path at scale is
    ``embedding_near_dups_banded`` (sign-LSH candidate generation, no
    crossJoin); this exact form exists to measure its recall."""
    n = _cos_prep(emb, id_col, vec_col)
    a, b = n.alias("a"), n.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            _pair_cosine().alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def sign_bands(
    vec_col: Column, n_bands: int, band_width: int, planes=None
) -> list[Column]:
    """n_bands packed sign-bit bucket columns over an ``array<float>``.

    planes=None → axis-aligned: bit j of band i = (v[i*w + j] > 0). No
    arithmetic at all — the sign of a stored float is bit-exact across any
    engine (this is what makes the banded near-dup DuckDB-oracle-able).
    planes=ndarray (n_bands*band_width, dim) → random-hyperplane signs
    (``similarity.hyperplanes``), the classic SRP-LSH used at scale."""
    bands = []
    for i in range(n_bands):
        packed = F.lit(0).cast("long")
        for j in range(band_width):
            if planes is None:
                proj = F.get(vec_col, i * band_width + j).cast("double")
            else:
                p = planes[i * band_width + j]
                proj = F.aggregate(
                    F.zip_with(
                        vec_col,
                        F.array(*[F.lit(float(x)) for x in p]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            packed = packed.bitwiseOR(
                F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
            )
        bands.append(packed)
    return bands


def embedding_near_dups_banded(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bands: int = 8,
    band_width: int = 8,
    planes=None,
) -> DataFrame:
    """Near-dup pairs by sign-LSH banding: candidates = pairs agreeing on
    ≥1 full band of sign bits (equi-join on (band, bucket) — one shuffle,
    never all-pairs), then exact cosine ≥ threshold verify on survivors.

    Approximate by construction (recall < 1 possible; measured ≥0.95 vs the
    brute-force baseline in tests/test_operators.py at 10^4 vectors). With
    planes=None the candidate generation itself is deterministic float-sign
    reads, reproducible in the DuckDB oracle."""
    prep = _cos_prep(emb, id_col, vec_col)
    bands = sign_bands(F.col("v"), n_bands, band_width, planes)
    banded = prep.select(
        "id",
        "v",
        "norm",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), bexpr.alias("bucket"))
                    for i, bexpr in enumerate(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "v", "norm", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            _pair_cosine().alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .groupBy("a_id", "b_id")
        .agg(F.first("cosine").alias("cosine"))
    )


def phash_near_dups(images: DataFrame, max_hamming: int = 6, n_bands: int | None = None) -> DataFrame:
    """Image near-dup by perceptual-hash hamming distance (input_hint phash
    column): exact ``bit_count(a ^ b) <= r`` pairs via the pigeonhole band
    equi-join (round-2 rewrite of the round-1 all-pairs crossJoin — the
    banding is EXACT, not approximate: r < n_bands guarantees every
    qualifying pair shares a block)."""
    if n_bands is None:
        n_bands = max_hamming + 1
    keyed = images.select(F.col("image_id").alias("id"), F.col("phash").alias("k"))
    return hamming_band_pairs(
        keyed, max_hamming=max_hamming, n_bands=n_bands, total_bits=64, id_col="id", key_col="k"
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    min_containment: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Directional contained-duplicate detection via shared winnowing
    fingerprints (the MOSS construction, Schleimer et al. SIGMOD'03) —
    (u, v, shared, fp_u, containment) where containment = |fp(u)∩fp(v)| /
    |fp(u)|: how much of document u reappears inside v.

    Jaccard/minhash near-dup misses the quote-and-extend case (a short
    doc wholly embedded in a long one has tiny Jaccard but containment
    ≈ 1) — for training-data curation that case is exactly the boilerplate
    /ToS/license-block class worth stripping. Winnowing guarantees any
    shared run of ≥ w+k-1 chars leaves at least one common fingerprint,
    so containment over fingerprint sets tracks containment over text.

    Scale shape: explode fingerprints → equi-join on the fingerprint
    value → groupBy(u, v) count — the same never-all-pairs banding shape
    as minhash_lsh_candidates. ``max_doc_freq`` drops corpus-hot
    fingerprints (stop-boilerplate) from the self-join before it can
    build n²/2 hot groups, like jaccard_pairs' cap; the cap is a
    broadcast anti-join on the small hot-fingerprint list. Both
    directions of every qualifying pair are emitted (containment is
    directional). Pure expressions end-to-end."""
    from maga_spark.operators.text import winnow_fingerprint_portable

    fps = docs.select(
        F.col(id_col), winnow_fingerprint_portable(F.col(text_col), k, w).alias("fp")
    )
    # explode_outer + h-not-null instead of plain explode — value-identical
    # (fp never holds NULL elements: every element is conv(md5(non-null
    # gram)), and a NULL/short text yields fp = [], which both forms drop)
    # but it stops InferFiltersFromGenerate injecting `size(fp) > 0 AND
    # isnotnull(fp)` into the scan-side Filter, where codegen subexpression
    # elimination evaluates the ENTIRE winnow expression EAGERLY on every
    # scanned row BEFORE the short-circuiting id predicate (guide §7.2
    # "duplicated UDF evaluation" in expression form; measured 119 s →
    # 1.4 s on the driver bench fixture at sf1.0, where only 202 of 50k
    # scanned rows survive the pushed id filter).
    ex = fps.select(F.col(id_col), F.explode_outer("fp").alias("h")).filter(
        F.col("h").isNotNull()
    )
    # |fp(u)| from the exploded rows (fp is already distinct), BEFORE the
    # doc-freq cap — one fewer evaluation of the winnow expression than
    # size(fp) on a separate branch; empty-fp docs drop out of `ex` but
    # can never reach `shared` anyway
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("fp_n"))
    if max_doc_freq is not None:
        hot = (
            ex.groupBy("h")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("h")
        )
        ex = ex.join(F.broadcast(hot), "h", "left_anti")
    a = ex.select(F.col(id_col).alias("u"), "h")
    b = ex.select(F.col(id_col).alias("v"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        shared.join(sizes.select(F.col(id_col).alias("u"), "fp_n"), "u")
        .withColumn("containment", F.col("shared") / F.col("fp_n"))
        .filter(F.col("containment") >= min_containment)
        .select("u", "v", "shared", F.col("fp_n").alias("fp_u"), "containment")
    )


def build_fingerprint_index(
    docs: DataFrame,
    table: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Materialize winnowing fingerprints ONCE into a bucketed index table
    ``(doc_id, h)`` — bucketed AND sorted by the fingerprint value ``h``.

    The ad-hoc ``containment_pairs`` recomputes the winnow expression on
    every branch that references it (self-join sides, hot-list, sizes —
    Spark has no cross-branch expression CSE without materialization),
    which is the right trade for one exploratory query but not for a
    corpus that is fingerprinted once and mined repeatedly. Storing the
    exploded fingerprints bucketed by ``h`` pays the hash ONCE at ingest
    and makes every later sharing join bucket-aligned: the self-join in
    ``containment_pairs_from_index`` runs with ZERO Exchange — both sides
    are the same catalog table, already co-partitioned and sorted on the
    join key (plan-pinned in test_bucketstore). Same storage idiom as the
    bucketed seen set (plans/bucketstore.py) and the minhash band index
    (build_minhash_index): state tables carry their partitioning on disk.
    ``mode='append'`` absorbs new documents per-bucket without rewriting
    history."""
    from maga_spark.operators.text import winnow_fingerprint_portable

    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(winnow_fingerprint_portable(F.col(text_col), k, w)).alias("h"),
    )
    (
        ex.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, "h")
        .sortBy("h")
        .option("path", path)
        .saveAsTable(table)
    )


def containment_pairs_from_index(
    spark,
    table: str,
    min_shared: int = 2,
    min_containment: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """``containment_pairs`` served from a ``build_fingerprint_index``
    table: identical output contract (u, v, shared, fp_u, containment),
    but the expensive winnow hash is never recomputed and the sharing
    self-join is bucket-aligned — no Exchange on either side (the only
    shuffles left are the small (u, v) aggregation and the doc-size
    aggregate). ``max_doc_freq`` drops corpus-hot fingerprints via the
    same broadcast anti-join as the ad-hoc path."""
    ex = spark.table(table)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("fp_n"))
    if max_doc_freq is not None:
        hot = (
            ex.groupBy("h")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("h")
        )
        ex = ex.join(F.broadcast(hot), "h", "left_anti")
    a = ex.alias("A")
    b = ex.alias("B")
    shared = (
        a.join(b.hint("merge"), F.col("A.h") == F.col("B.h"))
        .filter(F.col("A.doc_id") != F.col("B.doc_id"))
        .select(F.col("A.doc_id").alias("u"), F.col("B.doc_id").alias("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        shared.join(sizes.select(F.col("doc_id").alias("u"), "fp_n"), "u")
        .withColumn("containment", F.col("shared") / F.col("fp_n"))
        .filter(F.col("containment") >= min_containment)
        .select("u", "v", "shared", F.col("fp_n").alias("fp_u"), "containment")
    )


def semantic_dedup(
    emb: DataFrame,
    qcents,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau_num: int = 4,
    tau_den: int = 5,
    quant: int = 1000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) as one Spark plan:
    assign every vector to its nearest coarse centroid (pure-expression
    argmin, same construction as similarity._cid_expr), then look for
    semantic duplicates ONLY within a cluster — the candidate join is an
    equi-join on ``cid`` whose group size is the cluster size, never a
    global all-pairs. The cosine gate is similarity.alignment_gate's
    BIGINT squared-inequality (dot ≥ 0 ∧ dot²·τden² ≥ τnum²·|a|²·|b|²)
    over floor(x·quant) integer coordinates, so every verdict is
    bit-reproducible across engines (and DuckDB-oracle-able).

    ``qcents``: centroid matrix ALREADY quantized with the same ``quant``
    (integer-valued floats) — callers derive it portably (md5-pivot picks,
    as the driver query does) or from similarity.ivf_train output via
    ``floor(c·quant)``.

    Returns (cid, keep_id, drop_id, dot_q, na_q, nb_q): for each
    qualifying pair the smaller id is the keeper — the paper keeps one
    representative per duplicate group; this keep-lowest-id rule is the
    deterministic greedy pairwise variant. Consumers wanting the
    transitive-closure grouping feed (keep_id, drop_id) edges to
    graph.connected_components and keep each component's min id.

    100-TB shape: ONE shuffle (hash on cid); the per-cluster quadratic
    term is governed by the centroid count — SemDeDup §3 runs ~11k
    clusters over 2B embeddings precisely so cluster size stays a knob,
    not a property of the data. Skewed (over-dense) clusters surface as
    large join groups and are split by raising n_lists, exactly like the
    paper's re-clustering knob.
    """
    from maga_spark.operators.similarity import _dot, alignment_gate, quantize_vec_col

    qcents = list(qcents)
    if not qcents:
        raise ValueError("semantic_dedup needs at least one centroid")
    qe = quantize_vec_col(F.col(vec_col), float(quant))
    scores = F.array(
        *[
            2.0 * _dot(qe, F.array(*[F.lit(float(x)) for x in c]))
            - float(sum(float(x) * float(x) for x in c))
            for c in qcents
        ]
    )
    cid = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    assigned = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), cid.alias("cid")
    )
    a = assigned.select("cid", F.col("id").alias("keep_id"), F.col("v").alias("_va"))
    b = assigned.select("cid", F.col("id").alias("drop_id"), F.col("v").alias("_vb"))
    pairs = a.join(b, "cid").filter(F.col("keep_id") < F.col("drop_id"))
    gated = alignment_gate(
        pairs, a_col="_va", b_col="_vb", tau_num=tau_num, tau_den=tau_den, quant=quant
    )
    return gated.filter(F.col("aligned")).select(
        "cid", "keep_id", "drop_id", "dot_q", "na_q", "nb_q"
    )
