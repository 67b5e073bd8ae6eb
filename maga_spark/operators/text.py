"""Text-analysis operators for training-data curation over ``documents``.

All hot-path logic is built-in expressions (codegen'd); only the winnowing
fingerprint needs an Arrow UDF. Each operator has a DuckDB-expressible
twin registered in __spark_entry__ where SQL can express it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny deterministic stopword profiles for the n-gram/stopword language ID
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "que", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "por", "con", "para"],
}


def tokens_of(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def language_scores(text_col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    toks = tokens_of(text_col)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_PROFILES.items()
    }


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Argmax language with deterministic tie-break by language code;
    'und' when no profile matches at all."""
    scores = language_scores(F.col(text_col))
    ordered = sorted(scores.keys())
    pairs = F.array(*[F.struct((-scores[lg]).alias("neg"), F.lit(lg).alias("lang")) for lg in ordered])
    best = F.array_min(pairs)
    pred = F.when(-best["neg"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def token_count(text_col: Column) -> Column:
    """Whitespace token count (0 for blank text)."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_piece_count(text_col: Column) -> Column:
    """BPE-ish subword proxy: count of letter-runs, digit-runs, and
    punctuation singletons (a cheap, deterministic token-budget estimator)."""
    return F.regexp_count(text_col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio / mean-word-length features +
    a composite [0,1] quality score (heuristics in the C4/Gopher-rule
    family, expressed as pure column arithmetic)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_stop = F.size(
        F.array_intersect(tokens_of(t), F.array(*[F.lit(w) for w in LANG_PROFILES["en"]]))
    )
    mean_wl = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(1.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.2
        + F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.1
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("mean_word_len", mean_wl)
        .withColumn("quality", score)
    )


def winnow_fingerprint_portable(text_col: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing fingerprint as 100% built-in expressions with the portable
    md5-60-bit k-gram hash — value-for-value reproducible in DuckDB
    (list_transform/generate_series twin in __spark_entry__), unlike the
    Arrow-UDF variant below whose poly-257 rolling hash SQL can't express.

    Same construction: char k-grams → hash → min per length-w window →
    distinct set. Guards: <k chars → empty; ≤w grams → single global min.
    (Spark's ``sequence(1, 0)`` DESCENDS — both sequences are when-guarded.)"""
    from maga_spark.operators.dedup import portable_hash64

    t = F.lower(text_col)
    n = F.length(t)
    grams = F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - (k - 1)), lambda i: t.substr(i, F.lit(k))),
    ).otherwise(F.array().cast("array<string>"))
    hs = F.transform(grams, lambda g: portable_hash64(g))
    ng = F.size(hs)
    mins = (
        F.when(ng == 0, F.array().cast("array<long>"))
        .when(ng <= w, F.array(F.array_min(hs)))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), ng - (w - 1)), lambda j: F.array_min(F.slice(hs, j, w))
            )
        )
    )
    return F.array_sort(F.array_distinct(mins))


@F.pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprint(texts: pd.Series) -> pd.Series:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03): char
    5-gram rolling hashes, window-4 minima, deduplicated — a compact
    sketch for plagiarism/near-dup detection. Arrow-batched numpy."""
    import numpy as np

    K, W = 5, 4
    out = []
    for t in texts:
        s = (t or "").lower().encode("utf-8")
        if len(s) < K:
            out.append([])
            continue
        a = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
        h = np.zeros(len(a) - K + 1, dtype=np.uint64)
        for i in range(K):  # K=5 constant — vectorized over the doc
            h = h * np.uint64(257) + a[i : len(a) - K + 1 + i]
        if len(h) <= W:
            mins = {int(h.min())}
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, W)
            mins = set(win.min(axis=1).astype(np.int64).tolist())
        out.append(sorted(int(m) - (1 << 64) if m >= (1 << 63) else int(m) for m in mins))
    return pd.Series(out)
