"""Single-process reference simulator — the golden oracle (SURVEY.md §5.3).

Faithfully executes the crawl semantics of maga_spark.crawlspec in plain
sequential Python (pyarrow reads + dicts; no Spark anywhere). The Spark
engine (maga_spark.plans.frontier) must reproduce this simulator's fetch
ordering row-for-row and its final URL-seen set bit-for-bit — the parity
requirement of BASELINE.json. ~200 LoC, mirroring the reference crawler's
sequential event loop (maga/crawler.py:93-182) with hash-derived determinism
(SURVEY.md §7.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow.parquet as pq

from maga_spark import codec, urlnorm
from maga_spark.crawlspec import CrawlConfig, epoch_target, shard_of, xor_dist_signed
from maga_spark.functions.payload import PSNR_MIN_DB
from maga_spark.xxh64 import xxh64_str


@dataclass
class SimResult:
    ordering: list  # (epoch, rank, url_canon) — rank 1-based within epoch
    seen: dict  # shard -> sorted list of url_hash
    metrics: list  # per-epoch dicts
    host_tokens: dict  # final (host -> (tokens, epoch)) state
    fetched_valid: int = 0
    fetched_invalid: int = 0
    golden: dict = field(default_factory=dict)


def _load(fixtures_dir: str):
    t = lambda name: pq.read_table(f"{fixtures_dir}/{name}.parquet").to_pydict()  # noqa: E731
    links_t = t("links")
    links = {
        u: (outs, iid)
        for u, outs, iid in zip(links_t["url_canon"], links_t["out_links"], links_t["image_id"])
    }
    img_t = t("images")
    images = {
        iid: (b, w, h, fmt, cap)
        for iid, b, w, h, fmt, cap in zip(
            img_t["image_id"], img_t["bytes"], img_t["w"], img_t["h"], img_t["fmt"], img_t["caption"]
        )
    }
    truth_t = t("images_truth")
    truth = dict(zip(truth_t["image_id"], truth_t["px_npy"]))
    rob_t = t("robots")
    robots: dict[str, list[str]] = {}
    for h, p in zip(rob_t["host"], rob_t["disallow_prefix"]):
        robots.setdefault(h, []).append(p)
    pol_t = t("politeness")
    politeness = {
        h: (int(r), int(b))
        for h, r, b in zip(pol_t["host"], pol_t["rate_per_epoch"], pol_t["burst"])
    }
    seeds = t("seeds")["url"]
    return links, images, truth, robots, politeness, seeds


def _validate(images, truth, image_id) -> bool:
    import numpy as np

    if image_id not in images:
        return False
    b, w, h, fmt, cap = images[image_id]
    if cap != f"img {image_id} {w}x{h} {fmt}":
        return False
    try:
        px = codec.decode(b, w, h, fmt)
    except Exception:
        return False
    ref = np.frombuffer(truth[image_id], dtype=np.uint8).reshape(h, w, 3)
    if fmt in ("raw", "rlez"):
        return bool(np.array_equal(px, ref))
    return codec.psnr(px, ref) >= PSNR_MIN_DB


def run(fixtures_dir: str, cfg: CrawlConfig = CrawlConfig()) -> SimResult:
    links, images, truth, robots, politeness, seeds = _load(fixtures_dir)

    seen: set[int] = set()
    frontier: dict[int, tuple[str, str, str]] = {}  # url_hash -> (canon, host, path)
    tokens: dict[str, tuple[int, int]] = {}  # host -> (tokens_post, epoch)
    ordering: list = []
    metrics: list = []

    def rate_burst(host: str) -> tuple[int, int]:
        return politeness.get(host, (cfg.default_rate, cfg.default_burst))

    def avail(host: str, e: int) -> int:
        rate, burst = rate_burst(host)
        if host in tokens:
            t, ep = tokens[host]
            return min(burst, t + rate * (e - ep))
        return min(burst, rate * (e + 1))

    def absorb(raw_urls: list[str]) -> tuple[int, int]:
        """Enqueue a discovery batch: canonicalize → dedup → anti-join seen →
        robots gate → frontier append. Returns (enqueued, blocked)."""
        batch: dict[int, str] = {}
        for u in raw_urls:
            c = urlnorm.canonicalize(u)
            if c is None:
                continue  # malformed-drop (maga/crawler.py:33-36)
            hsh = xxh64_str(c)
            if hsh not in batch:
                batch[hsh] = c
        enq = blocked = 0
        for hsh, c in batch.items():
            if hsh in seen:
                continue
            seen.add(hsh)
            host, path = urlnorm.host_of(c), urlnorm.path_of(c)
            if any(path.startswith(p) for p in robots.get(host, ())):
                blocked += 1
                continue
            frontier[hsh] = (c, host, path)
            enq += 1
        return enq, blocked

    pending: list[str] = list(seeds)
    for e in range(cfg.epochs):
        enqueued, blocked = absorb(pending)
        pending = []

        target = epoch_target(e)
        cands = sorted(
            ((xor_dist_signed(h, target), h, c, host) for h, (c, host, _p) in frontier.items())
        )
        # host-eligible: per-host rank (in global priority order) <= avail
        hosts_here = {host for _d, _h, _c, host in cands}
        av = {h: avail(h, e) for h in hosts_here}
        taken: dict[str, int] = {}
        eligible = []
        for d, hsh, c, host in cands:
            k = taken.get(host, 0)
            if k < av[host]:
                taken[host] = k + 1
                eligible.append((d, hsh, c, host))
        granted = eligible[: cfg.global_k]

        # token commit: every candidate host becomes dirty state
        g_by_host: dict[str, int] = {}
        for _d, _h, _c, host in granted:
            g_by_host[host] = g_by_host.get(host, 0) + 1
        for host in hosts_here:
            tokens[host] = (av[host] - g_by_host.get(host, 0), e)

        # fetch + validate + discover
        n_valid = n_invalid = 0
        for rank, (_d, hsh, c, _host) in enumerate(granted, start=1):
            ordering.append((e, rank, c))
            del frontier[hsh]
            if c in links:
                outs, iid = links[c]
                if _validate(images, truth, iid):
                    n_valid += 1
                else:
                    n_invalid += 1
                pending.extend(outs)
            else:
                n_invalid += 1  # dead-letter: no link row (O-7)

        metrics.append(
            {
                "epoch": e,
                "enqueued": enqueued,
                "blocked_robots": blocked,
                "candidates": len(cands),
                "deferred_politeness": len(cands) - len(eligible),
                "capped_global": len(eligible) - len(granted),
                "scheduled": len(granted),
                "fetched": n_valid,
                "fetch_invalid": n_invalid,
            }
        )

    shards: dict[int, list[int]] = {}
    for h in seen:
        shards.setdefault(shard_of(h, cfg.nshards), []).append(h)
    for s in shards:
        shards[s].sort()

    return SimResult(
        ordering=ordering,
        seen=shards,
        metrics=metrics,
        host_tokens=tokens,
        fetched_valid=sum(m["fetched"] for m in metrics),
        fetched_invalid=sum(m["fetch_invalid"] for m in metrics),
    )
