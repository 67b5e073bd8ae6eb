"""★ The sharded URL-seen set — the engine's core custom operator
(SURVEY.md §7.4; reference analog: piece-request dedup anti-join,
screenshot_system/io_adapter.py:65-69, and the infohash-dedup left to user
code, maga/crawler.py:216-223).

Representation: ``seen(shard int, url_hash long)`` with
``shard = pmod(url_hash, nshards)`` — hash-partitioned so membership tests
co-locate per shard and the final set compares bit-for-bit as per-shard
sorted hash arrays (BASELINE.json parity).

Two membership paths, one contract (both yield the exact set — the bloom
has false positives only, corrected by the exact residual anti-join; never
false negatives):

* ``anti_join_exact`` — plain ``left_anti`` on ``url_hash``; Spark's runtime
  bloom-filter join injection (enabled in the session factory) already
  prefilters the shuffle at scale.
* ``anti_join_bloom`` — explicit per-shard numpy Bloom prefilter built with
  ``applyInPandas``, shipped to executors as a broadcast dict, probed by a
  vectorized Arrow UDF, then the surviving minority exact-anti-joined.
  This is the 10^10-row design: the bloom (bits sized per shard) filters
  ~all of the candidate stream without shuffling the full seen table.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# xxh64-style avalanche-mixed probe hashes, vectorized over uint64 numpy
_MIX1 = np.uint64(0x9E3779B185EBCA87)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _probe_positions(hashes: np.ndarray, n_probes: int, m_bits: int) -> np.ndarray:
    """(n, n_probes) bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher) — deterministic, no Python loop over rows."""
    h = hashes.astype(np.uint64)
    h1 = (h * _MIX1) ^ (h >> np.uint64(33))
    h2 = ((h * _MIX2) ^ (h >> np.uint64(29))) | np.uint64(1)
    i = np.arange(n_probes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def build_shard_blooms(
    seen: DataFrame, bits_per_key: int = 10, n_probes: int = 7, min_bits: int = 1 << 12
) -> DataFrame:
    """seen(shard, url_hash) → (shard, m_bits, bloom binary), one row/shard."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        n = len(pdf)
        m_bits = max(min_bits, 1 << math.ceil(math.log2(max(1, n * bits_per_key))))
        bitset = np.zeros(m_bits // 8, dtype=np.uint8)
        pos = _probe_positions(pdf["url_hash"].to_numpy().astype(np.int64).view(np.uint64), n_probes, m_bits)
        np.bitwise_or.at(bitset, pos.ravel() >> 3, np.uint8(1) << (pos.ravel() & 7).astype(np.uint8))
        return pd.DataFrame({"shard": [shard], "m_bits": [m_bits], "bloom": [bitset.tobytes()]})

    return seen.groupBy("shard").applyInPandas(_build, "shard int, m_bits long, bloom binary")


def anti_join_exact(candidates: DataFrame, seen: DataFrame, key: str = "url_hash") -> DataFrame:
    """candidates ∖ seen, exact."""
    return candidates.join(seen.select(key), key, "left_anti")


def anti_join_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_hash",
    n_probes: int = 7,
    nshards: int | None = None,
    temps: list | None = None,
) -> DataFrame:
    """candidates ∖ seen with per-shard Bloom prefilter.

    The prefilter is a broadcast dict {shard: (m_bits, bitset)} probed ONCE
    per candidate row by a vectorized pandas UDF (the probe column is
    persisted, then split); only ``might_contain`` survivors reach the exact
    anti-join. Result is identical to ``anti_join_exact`` (no false
    negatives).

    ``nshards`` MUST be the modulus used to build the seen table. It is
    required whenever ``seen.shard`` may not populate its top shard id
    (small/sparse sets): inferring ``max(shard)+1`` from the data would
    bucket candidates with the wrong modulus, probe the wrong Bloom, and
    misclassify genuinely-seen rows as definitely-new. The inference remains
    only as a convenience for ad-hoc use and is asserted consistent.

    ``temps``: optional list collecting the persisted intermediate so the
    caller (e.g. CrawlEngine epoch cleanup) can unpersist it after the
    consuming action."""
    spark = candidates.sparkSession
    blooms = {
        r["shard"]: (r["m_bits"], np.frombuffer(bytes(r["bloom"]), dtype=np.uint8))
        for r in build_shard_blooms(seen, n_probes=n_probes).collect()
    }
    bc = spark.sparkContext.broadcast(blooms)
    if nshards is None:
        nshards = (max(blooms) if blooms else 0) + 1
    assert not blooms or max(blooms) < nshards, (
        f"seen table has shard {max(blooms)} >= nshards {nshards}"
    )

    @F.pandas_udf(T.BooleanType())
    def might_contain(shards: pd.Series, hashes: pd.Series) -> pd.Series:
        table = bc.value
        out = np.zeros(len(shards), dtype=bool)
        sh = shards.to_numpy()
        hs = hashes.to_numpy().astype(np.int64).view(np.uint64)
        for s in np.unique(sh):
            entry = table.get(int(s))
            if entry is None:
                continue  # empty shard → definitely unseen
            m_bits, bitset = entry
            idx = np.nonzero(sh == s)[0]
            pos = _probe_positions(hs[idx], n_probes, m_bits)
            hit = np.ones(len(idx), dtype=bool)
            for j in range(n_probes):
                p = pos[:, j]
                hit &= (bitset[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
            out[idx] = hit
        return pd.Series(out)

    # evaluate the probe UDF exactly once per row: materialize the boolean,
    # persist, then split on the stored column (two unpersisted filters
    # would re-scan candidates and re-run the UDF — the engine's hottest
    # prefilter would cost double)
    marked = candidates.withColumn(
        "_maybe", might_contain(F.pmod(F.col(key), F.lit(nshards)), F.col(key))
    ).persist()
    if temps is not None:
        temps.append(marked)
    maybe = marked.filter(F.col("_maybe")).drop("_maybe")
    definitely_new = marked.filter(~F.col("_maybe")).drop("_maybe")
    survivors = anti_join_exact(maybe, seen, key)
    return definitely_new.unionByName(survivors)
