"""The authoritative crawl semantics — ONE spec, TWO implementations.

This module defines the pure, deterministic rules shared by the plain-Python
reference simulator (maga_spark.sim — the oracle) and the distributed Spark
engine (maga_spark.plans.frontier). Parity between the two is the project's
headline correctness requirement (BASELINE.json north_rule: "matching the
reference's crawl ordering and URL-seen set under the same seed list +
politeness budget").

Semantics, generalized from the reference crawler (SURVEY.md §3.1):

* identity      — ``url_hash = xxh64(url_canon)`` (canonicalization ≙
                  ``proper_infohash``, maga/utils.py:7-11)
* per-epoch target — ``epoch_target(e)`` replaces the reference's random
                  find_node target (maga/crawler.py:203-205) with a
                  hash-derived value (determinism, SURVEY.md §7.6)
* priority      — signed-int64 XOR distance to the epoch target, total order
                  ``(xor_dist, url_hash)`` (Kademlia ordering, O-40)
* enqueue       — canonicalize → in-batch dedup → anti-join seen → robots
                  gate (blocked URLs enter *seen* but never the frontier) →
                  append to frontier; seen = "ever enqueued or blocked"
                  (the seen-set pattern, O-23)
* schedule      — refill per-host token buckets (``tokens = min(burst,
                  tokens + rate)``), then walk candidates in priority order
                  granting while the host has tokens and the global budget K
                  is unspent. Equivalent set form (provably identical, see
                  tests/test_parity.py): host-eligible = per-host rank ≤
                  tokens; granted = first K host-eligible by priority.
* fetch         — granted ⋈ links ⋈ images; payload validated per
                  input_hint (PSNR/caption); missing link row = dead-letter
                  (O-7), URL still consumed
* outputs       — ordering rows ``(epoch, rank, url_canon)`` with rank =
                  1-based position in the granted priority order; final seen
                  as per-shard sorted hashes; per-epoch metrics.
"""

from __future__ import annotations

from dataclasses import dataclass

from maga_spark.xxh64 import xxh64_str

M64 = (1 << 64) - 1


@dataclass(frozen=True)
class CrawlConfig:
    epochs: int = 8
    global_k: int = 64  # per-epoch global fetch budget (reference analog: the 1 s sweep rate, maga/crawler.py:73)
    nshards: int = 8  # seen-set shards: shard = pmod(url_hash, nshards)
    default_rate: int = 2  # hosts missing from the politeness table
    default_burst: int = 4
    salt_buckets: int = 8  # skew salting factor for the per-host rank at scale
    # bloom mode: fixed per-shard bitset size (bits). Fixed because the
    # bitsets grow INCREMENTALLY across epochs (operators/seen.py
    # update_shard_blooms) — size from the projected frontier: ~10 bits/key
    # at the target per-shard key count. FP-rate-only knob; results are
    # exact at any value.
    bloom_m_bits: int = 1 << 20
    # bloom mode: probe-stage sub-split factor (operators/seen.py
    # anti_join_bloom probe_salt) — probe parallelism = nshards·salt
    # (cuckoo mode reuses the same salt)
    bloom_probe_salt: int = 4
    # cuckoo mode: fixed per-shard bucket count (power of two; capacity =
    # nbuckets × 4 slots). Fixed for the same reason as bloom_m_bits —
    # bucket indices depend on the size, so incremental inserts
    # (operators/cuckoo.py update_shard_cuckoo) need it stable. Size for
    # ≤~0.95 load at the projected per-shard key count; the default holds
    # 2^17 keys/shard at 0.5 load. Results are exact at any (sufficient)
    # value; an overflow raises rather than dropping a key.
    cuckoo_nbuckets: int = 1 << 16
    cuckoo_fp_bits: int = 16
    # host-keyed state joins (politeness / robots_agg / host_state): with
    # the default 0, NO broadcast hint is ever forced — AQE picks the join
    # strategy from actual runtime sizes (it still auto-broadcasts small
    # host tables; at real-web ~10^8 hosts it shuffles on host, which the
    # salted grant tolerates). A positive value forces the hint below that
    # host count — measured a dead heat at 16M URLs / 125k hosts
    # (BENCH.md host-join A/B), so the forced hint buys nothing even where
    # it is safe, and only the AQE path survives the target scale
    # (VERDICT r3 #1). Results identical either way.
    broadcast_host_limit: int = 0
    # scheduler skew guard: fall back to the sampled range-partitioner
    # top-K for subsequent epochs when one uniform-bucket slice holds more
    # than skew_factor× the fair 1/shuffle-partitions share of candidates
    # (a straggler guard — ranks are exact either way; VERDICT r3 #4)
    topk_skew_factor: float = 4.0
    # volume floor for the skew guard: epochs smaller than this can't
    # produce a straggler worth avoiding, but trivially "skew" (1 candidate
    # = 100% in one bucket) — without the floor, a near-drained frontier
    # flips the engine onto the sampled two-driver-job top-K path FOREVER,
    # exactly the overhead the uniform path exists to avoid (found by the
    # drained-frontier metrics test, round 5)
    topk_skew_min_rows: int = 1024


def epoch_target(epoch: int) -> int:
    """Deterministic per-epoch XOR target (signed int64)."""
    return xxh64_str(f"epoch-target:{epoch}")


def xor_dist_signed(a: int, b: int) -> int:
    """Signed-int64 XOR — bit-identical to Spark's ``bigint ^ bigint``."""
    u = (a & M64) ^ (b & M64)
    return u - (1 << 64) if u >= (1 << 63) else u


def shard_of(url_hash: int, nshards: int) -> int:
    """pmod(url_hash, nshards) — matches Spark's ``pmod`` on negative longs."""
    return url_hash % nshards
