"""★ Sharded cuckoo-filter URL-seen set — the second approximate-membership
backend BASELINE.json names ("a partitioned cuckoo/bloom URL-seen set").

Same state shape and same contract as the bloom path (operators/seen.py):
one filter row per ``shard = pmod(url_hash, nshards)``, probed EXECUTOR-SIDE
via a shard-cogroup ``applyInPandas``, false positives corrected by an exact
residual anti-join, never false negatives — so ``anti_join_cuckoo`` returns
exactly ``anti_join_exact``'s rows. What the cuckoo filter adds over the
bloom (the reason the design brief names both): **deletion**. A bloom bitset
can only grow; a cuckoo table stores per-key fingerprints that
``delete_from_shard_cuckoo`` removes individually — the re-crawl primitive
(expire a URL from seen so the frontier can re-enqueue it) that a pure
bloom mode cannot express without a full rebuild.

Algorithm: partial-key cuckoo hashing per the public cuckoo-filter paper
(Fan, Andersen, Kaminsky, Mitzenmacher, "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014) — ``fp_bits``-bit fingerprints in ``bucket_size``
slots per bucket, candidate buckets ``i1 = H(key)`` and
``i2 = i1 XOR G(fp)`` (an involution, so a stored fingerprint's alternate
bucket is computable without the key), evictions bounded by ``max_kicks``.
All hot paths are vectorized numpy over the Arrow batch: insertion places
whole contention-resolved rounds at once (per-item Python only on the rare
eviction tail), probe and delete are pure array ops — no per-row Python in
the Spark sense (input_hint).

Invariants the code maintains and relies on:
* occupied slots form a PREFIX of each bucket row (inserts append at the
  occupancy point, deletes compact) — lets the round-placer assign slots as
  ``occupancy + within-batch rank`` without scanning for holes;
* inserts RAISE on overflow instead of dropping a key (a dropped key is a
  false negative — it would break the engine's bit-for-bit seen parity);
  size ``nbuckets`` with headroom (build default targets 0.84 load);
* deletes RAISE when no matching fingerprint exists in either candidate
  bucket: deleting a never-inserted key is the one operation the paper
  forbids (it could strip another key's fingerprint). Same-fp keys sharing
  a bucket pair are indistinguishable by design; deleting one copy per
  deleted key keeps the multiset count right, so survivors keep their
  no-false-negative guarantee.

Reference analog: the reference keeps its dedup set as an in-memory Python
set the user code mutates (maga/crawler.py:216-223) — deletion is free
there; this module is what that mutability costs at 10^10 keys.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maga_spark.operators.seen import (
    _hashes_u64,
    _out_ddl,
    anti_join_exact,
    salted_shard_cogroup,
)

CUCKOO_SCHEMA = "shard int, nbuckets long, fp_bits int, bucket_size int, table binary"

# splitmix64-style avalanche constants (public domain mixers) — distinct
# from seen.py's bloom probe constants so the two filters are independent
_FP_MIX = np.uint64(0xBF58476D1CE4E5B9)
_IDX_MIX = np.uint64(0x94D049BB133111EB)
_ALT_MIX = np.uint64(0x9E3779B97F4A7C15)


def _fps(h: np.ndarray, fp_bits: int) -> np.ndarray:
    """uint64 hashes → uint16 fingerprints; 0 is the empty-slot sentinel so
    a zero fingerprint is remapped to 1 (a 2^-fp_bits bias, irrelevant)."""
    x = h * _FP_MIX
    x = x ^ (x >> np.uint64(33))
    fp = (x & np.uint64((1 << fp_bits) - 1)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _i1(h: np.ndarray, nbuckets: int) -> np.ndarray:
    x = h * _IDX_MIX
    x = x ^ (x >> np.uint64(29))
    return (x & np.uint64(nbuckets - 1)).astype(np.int64)


def _alt(idx: np.ndarray, fp: np.ndarray, nbuckets: int) -> np.ndarray:
    """Alternate bucket: i XOR G(fp) — self-inverse, key-free (the filter
    can relocate a stored fingerprint without ever knowing its key)."""
    x = fp.astype(np.uint64) * _ALT_MIX
    x = x ^ (x >> np.uint64(27))
    return (idx.view(np.uint64) ^ (x & np.uint64(nbuckets - 1))).view(np.int64)


def _key_buckets(h: np.ndarray, nbuckets: int, fp_bits: int):
    fp = _fps(h, fp_bits)
    b1 = _i1(h, nbuckets)
    return fp, b1, _alt(b1, fp, nbuckets)


def _place_round(table: np.ndarray, fps: np.ndarray, buckets: np.ndarray) -> np.ndarray:
    """One contention-resolved vectorized placement round: items targeting
    the same bucket are ranked (stable sort) and claim slots
    ``occupancy + rank``; ranks past the bucket's free space lose and stay
    pending. Returns the placed mask. Relies on the prefix invariant."""
    n = len(fps)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(buckets, kind="stable")
    b = buckets[order]
    first = np.r_[True, b[1:] != b[:-1]]
    rank = np.arange(n) - np.maximum.accumulate(np.where(first, np.arange(n), 0))
    slot = (table[b] != 0).sum(axis=1) + rank
    ok = slot < table.shape[1]
    table[b[ok], slot[ok]] = fps[order][ok]
    placed = np.zeros(n, dtype=bool)
    placed[order[ok]] = True
    return placed


def _kick_insert(table: np.ndarray, fp: int, b1: int, b2: int, max_kicks: int) -> None:
    """Per-item eviction chain for the rare both-buckets-full case.
    Deterministic victim choice (fingerprint- and round-derived — no RNG,
    SURVEY.md §7.6 determinism rule). Raises instead of dropping the key."""
    nbuckets, bucket_size = table.shape
    for b in (b1, b2):  # a prior kick may have freed a slot since the rounds ran
        free = np.flatnonzero(table[b] == 0)
        if len(free):
            table[b, free[0]] = fp
            return
    cur_fp, cur_b = np.uint16(fp), b1
    for k in range(max_kicks):
        slot = (int(cur_fp) * 40503 + k) % bucket_size
        victim = table[cur_b, slot]
        table[cur_b, slot] = cur_fp
        cur_fp = victim
        cur_b = int(_alt(np.array([cur_b], dtype=np.int64), np.array([cur_fp]), nbuckets)[0])
        free = np.flatnonzero(table[cur_b] == 0)
        if len(free):
            table[cur_b, free[0]] = cur_fp
            return
    raise ValueError(
        f"cuckoo filter over capacity: eviction chain exceeded {max_kicks} kicks "
        f"at {int((table != 0).sum())}/{table.size} slots — size nbuckets for "
        "<=~0.95 load (a dropped key would be a false negative)"
    )


def _insert_hashes(table: np.ndarray, h: np.ndarray, fp_bits: int, max_kicks: int = 500) -> None:
    """Insert a batch of uint64 hashes. Callers sort the batch first so the
    table layout is a pure function of the key SET (Arrow row order is not
    deterministic across shuffles)."""
    nbuckets, _ = table.shape
    fp, b1, b2 = _key_buckets(h, nbuckets, fp_bits)
    placed = _place_round(table, fp, b1)
    rem = np.flatnonzero(~placed)
    if len(rem):
        placed2 = _place_round(table, fp[rem], b2[rem])
        rem = rem[~placed2]
    for j in rem:  # eviction tail — empty at build-default load
        _kick_insert(table, int(fp[j]), int(b1[j]), int(b2[j]), max_kicks)


def _contains(table: np.ndarray, h: np.ndarray, fp_bits: int) -> np.ndarray:
    nbuckets, _ = table.shape
    fp, b1, b2 = _key_buckets(h, nbuckets, fp_bits)
    w = fp[:, None]
    return (table[b1] == w).any(axis=1) | (table[b2] == w).any(axis=1)


def _clear_pass(table: np.ndarray, fp: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Clear up to one slot matching (bucket, fp) per item, duplicate-safe:
    items in the same (bucket, fp) group get distinct ranks and clear the
    rank-th matching slot — concurrent clears never collide. Returns the
    cleared mask (False = no rank-th match in this bucket)."""
    n = len(fp)
    if n == 0:
        return np.zeros(0, dtype=bool)
    gkey = b.astype(np.int64) * np.int64(1 << 17) + fp.astype(np.int64)
    order = np.argsort(gkey, kind="stable")
    gs = gkey[order]
    first = np.r_[True, gs[1:] != gs[:-1]]
    rank = np.arange(n) - np.maximum.accumulate(np.where(first, np.arange(n), 0))
    match = table[b[order]] == fp[order][:, None]
    sel = match & (match.cumsum(axis=1) == (rank + 1)[:, None])  # rank-th match, one-hot
    hit = sel.any(axis=1)
    table[b[order][hit], sel.argmax(axis=1)[hit]] = 0
    cleared = np.zeros(n, dtype=bool)
    cleared[order[hit]] = True
    return cleared


def _compact(table: np.ndarray, buckets: np.ndarray) -> None:
    """Restore the occupied-prefix invariant in the touched buckets: stable-
    sort each row by emptiness (occupied slots keep their relative order)."""
    ub = np.unique(buckets)
    rows = table[ub]
    order = np.argsort(rows == 0, axis=1, kind="stable")
    table[ub] = np.take_along_axis(rows, order, axis=1)


def _delete_hashes(table: np.ndarray, h: np.ndarray, fp_bits: int) -> None:
    nbuckets, _ = table.shape
    fp, b1, b2 = _key_buckets(h, nbuckets, fp_bits)
    cleared = _clear_pass(table, fp, b1)
    rem = np.flatnonzero(~cleared)
    if len(rem):
        cleared2 = _clear_pass(table, fp[rem], b2[rem])
        if not cleared2.all():
            missing = len(rem) - int(cleared2.sum())
            raise ValueError(
                f"cuckoo delete: {missing} key(s) have no stored fingerprint in "
                "either candidate bucket — deleting a never-inserted key is "
                "forbidden (it would strip another key's fingerprint and create "
                "a false negative)"
            )
    _compact(table, np.concatenate([b1, b2]))


def _state_arrays(fpdf: pd.DataFrame, shard: int):
    if len(fpdf) > 1:
        # one filter row per shard is the state invariant — probing or
        # updating only the first would silently drop the others' keys
        # (false negatives), mirroring the bloom-path guard (ADVICE r3)
        raise ValueError(f"{len(fpdf)} cuckoo rows for shard {shard}; expected 1")
    nb = int(fpdf["nbuckets"].iloc[0])
    fb = int(fpdf["fp_bits"].iloc[0])
    bs = int(fpdf["bucket_size"].iloc[0])
    table = np.frombuffer(bytes(fpdf["table"].iloc[0]), dtype=np.uint16).reshape(nb, bs)
    return table, nb, fb, bs


def _row(shard: int, nb: int, fb: int, bs: int, table: np.ndarray) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "shard": [shard],
            "nbuckets": [nb],
            "fp_bits": [fb],
            "bucket_size": [bs],
            "table": [table.tobytes()],
        }
    )


def build_shard_cuckoo(
    seen: DataFrame,
    fp_bits: int = 16,
    bucket_size: int = 4,
    load_target: float = 0.84,
    min_buckets: int = 1 << 8,
    nbuckets: int | None = None,
) -> DataFrame:
    """seen(shard, url_hash) → one cuckoo-filter row per shard.

    Default sizing is adaptive (next pow2 with slots ≥ n/load_target per
    shard — 0.84 leaves eviction headroom; the paper's (2,4) table is
    stable to ~0.95). Pass a fixed ``nbuckets`` when the result will grow
    via ``update_shard_cuckoo`` — bucket indices depend on the size, so
    incremental inserts require it stable (same rule as the blooms'
    ``m_bits``)."""
    if not (4 <= fp_bits <= 16):
        raise ValueError("fp_bits must be in [4, 16] (uint16 slots)")
    if nbuckets and nbuckets & (nbuckets - 1):
        # _i1/_alt index with & (nbuckets-1): a non-pow2 size would silently
        # address only 2^popcount(mask) buckets and blow the eviction chain
        # far below the configured capacity
        raise ValueError(f"nbuckets must be a power of two (got {nbuckets})")

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        nb = nbuckets or max(
            min_buckets,
            1 << math.ceil(math.log2(max(1, math.ceil(len(pdf) / (bucket_size * load_target))))),
        )
        table = np.zeros((nb, bucket_size), dtype=np.uint16)
        _insert_hashes(table, np.sort(_hashes_u64(pdf["url_hash"])), fp_bits)
        return _row(shard, nb, fp_bits, bucket_size, table)

    return seen.groupBy("shard").applyInPandas(_build, CUCKOO_SCHEMA)


def update_shard_cuckoo(
    filters: DataFrame,
    new_hashes: DataFrame,
    nbuckets: int = 1 << 16,
    fp_bits: int = 16,
    bucket_size: int = 4,
) -> DataFrame:
    """Insert a batch of new keys into per-shard cuckoo tables — the
    incremental build: O(batch + nshards·table bytes) per call, independent
    of how many keys the filters already hold. ``filters`` may be empty;
    shards appearing only in ``new_hashes`` get fresh ``nbuckets``-sized
    tables, existing shards keep their stored geometry. Filter bytes never
    visit the driver (cogroup applyInPandas, like update_shard_blooms)."""
    if not (4 <= fp_bits <= 16):
        raise ValueError("fp_bits must be in [4, 16] (uint16 slots)")
    if nbuckets < 1 or nbuckets & (nbuckets - 1):
        # same pow2 contract as build_shard_cuckoo: fresh shards created
        # here index with & (nbuckets-1), so a non-pow2 size would silently
        # address only 2^popcount(mask) buckets
        raise ValueError(f"nbuckets must be a power of two (got {nbuckets})")

    def _upd(key: tuple, hpdf: pd.DataFrame, fpdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        if len(fpdf):
            table, nb, fb, bs = _state_arrays(fpdf, shard)
            table = table.copy()
        else:
            nb, fb, bs = nbuckets, fp_bits, bucket_size
            table = np.zeros((nb, bs), dtype=np.uint16)
        if len(hpdf):
            _insert_hashes(table, np.sort(_hashes_u64(hpdf["url_hash"])), fb)
        return _row(shard, nb, fb, bs, table)

    return (
        new_hashes.groupBy("shard").cogroup(filters.groupBy("shard")).applyInPandas(
            _upd, CUCKOO_SCHEMA
        )
    )


def delete_from_shard_cuckoo(filters: DataFrame, del_hashes: DataFrame) -> DataFrame:
    """Remove previously-inserted keys — the operation blooms cannot do and
    the reason the design brief says "cuckoo/bloom". del_hashes(shard,
    url_hash) must contain only keys currently in the filter (one delete
    per prior insert); violations raise rather than corrupt. Use case:
    re-crawl scheduling — expire URLs from seen so the next absorb
    re-enqueues them, without rebuilding the filter from the seen table."""

    def _del(key: tuple, hpdf: pd.DataFrame, fpdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        if not len(fpdf):
            raise ValueError(f"cuckoo delete: no filter state for shard {shard}")
        table, nb, fb, bs = _state_arrays(fpdf, shard)
        table = table.copy()
        if len(hpdf):
            _delete_hashes(table, np.sort(_hashes_u64(hpdf["url_hash"])), fb)
        return _row(shard, nb, fb, bs, table)

    return (
        del_hashes.groupBy("shard").cogroup(filters.groupBy("shard")).applyInPandas(
            _del, CUCKOO_SCHEMA
        )
    )


def anti_join_cuckoo(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_hash",
    nshards: int | None = None,
    temps: list | None = None,
    filters: DataFrame | None = None,
    probe_salt: int = 4,
) -> DataFrame:
    """candidates ∖ seen with an executor-side per-shard cuckoo prefilter —
    drop-in for ``anti_join_bloom`` with identical semantics: rows the
    filter rejects are definitely new; only the ``might_contain`` minority
    reaches the exact residual anti-join, so the result equals
    ``anti_join_exact`` for ANY filter contents with no false negatives
    (this also makes deletion safe end-to-end: a deleted key probes
    negative and re-enters as new; an fp-collision survivor just pays the
    residual join). ``nshards`` must be the seen table's shard modulus;
    ``temps`` collects the persisted probe intermediate for caller-managed
    unpersist; ``probe_salt`` sub-splits shards exactly as in
    ``anti_join_bloom`` (the table row is read-only in the probe)."""
    if nshards is None:
        mx = seen.agg(F.max("shard").alias("m")).first()["m"]
        nshards = (int(mx) if mx is not None else 0) + 1
    if filters is None:
        filters = build_shard_cuckoo(seen)
    ns = int(nshards)

    marked = _probe_cogroup(candidates, filters, key, ns, probe_salt).persist()
    if temps is not None:
        temps.append(marked)
    maybe = marked.filter(F.col("_maybe")).drop("_maybe")
    definitely_new = marked.filter(~F.col("_maybe")).drop("_maybe")
    return definitely_new.unionByName(anti_join_exact(maybe, seen, key))


def _probe_cogroup(
    candidates: DataFrame, filters: DataFrame, key: str, ns: int, salt: int = 1
) -> DataFrame:
    """(shard, salt)-cogroup cuckoo probe appending ``_maybe`` — same
    partitioning scheme as seen.py's bloom probe (one candidate shuffle,
    filter replicated per salt slice in-plan)."""
    cand_cols = list(candidates.columns)
    out_schema = _out_ddl(candidates, "_maybe boolean")

    def _probe(key_t: tuple, cpdf: pd.DataFrame, fpdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key_t[0])
        if shard >= ns or shard < 0:
            raise ValueError(
                f"seen-set cuckoo shard {shard} outside [0, {ns}): the seen table "
                "was sharded with a different modulus than nshards"
            )
        out = cpdf[cand_cols].copy()
        if not len(cpdf):
            out["_maybe"] = pd.Series([], dtype=bool)
            return out
        if not len(fpdf):
            out["_maybe"] = False  # empty shard → definitely unseen
            return out
        table, _nb, fb, _bs = _state_arrays(fpdf, shard)
        out["_maybe"] = _contains(table, _hashes_u64(cpdf[key]), fb)
        return out

    return salted_shard_cogroup(candidates, filters, key, ns, salt, _probe, out_schema)
