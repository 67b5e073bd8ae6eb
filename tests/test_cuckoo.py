"""Cuckoo-filter seen set (operators/cuckoo.py): anti-join ≡ exact,
incremental ≡ from-scratch (result-level), deletion (the re-crawl
primitive blooms lack), and the state-invariant guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from maga_spark.operators.cuckoo import (
    anti_join_cuckoo,
    build_shard_cuckoo,
    delete_from_shard_cuckoo,
    update_shard_cuckoo,
)
from maga_spark.operators.seen import anti_join_exact

NSHARDS = 8


def _seen_df(spark, hashes):
    return spark.createDataFrame(
        [(int(h),) for h in hashes], "url_hash long"
    ).select(F.pmod("url_hash", F.lit(NSHARDS)).cast("int").alias("shard"), "url_hash")


def _cand_df(spark, hashes, dup_first=False):
    vals = [int(h) for h in hashes]
    if dup_first and vals:
        vals = vals + [vals[0], vals[0]]  # duplicate keys must all survive together
    return spark.createDataFrame(
        [(v, f"u{v}") for v in vals], "url_hash long, payload string"
    )


@pytest.fixture(scope="module")
def keysets():
    rng = np.random.default_rng(42)
    allk = np.unique(rng.integers(-(2**62), 2**62, size=6000, dtype=np.int64))
    return allk[:2500], allk[2500:4000], allk[4000:]  # seen_a, seen_b, never_seen


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_anti_join_cuckoo_equals_exact(spark, keysets):
    seen_a, seen_b, fresh = keysets
    seen = _seen_df(spark, np.concatenate([seen_a, seen_b]))
    cands = _cand_df(spark, np.concatenate([seen_a[:300], fresh[:700]]), dup_first=True)
    got = anti_join_cuckoo(cands, seen, nshards=NSHARDS)
    want = anti_join_exact(cands, seen)
    assert _sorted_rows(got) == _sorted_rows(want)
    assert len(_sorted_rows(got)) >= 700  # the fresh keys (plus dups) all survived


def test_incremental_update_equals_scratch_results(spark, keysets):
    """update_shard_cuckoo(build(A), B) must yield the same anti-join results
    as build(A ∪ B) — layouts may differ (insert order), results may not."""
    seen_a, seen_b, fresh = keysets
    df_a = _seen_df(spark, seen_a)
    df_ab = _seen_df(spark, np.concatenate([seen_a, seen_b]))
    scratch = build_shard_cuckoo(df_ab, nbuckets=1 << 11)
    incr = update_shard_cuckoo(
        build_shard_cuckoo(df_a, nbuckets=1 << 11),
        _seen_df(spark, seen_b),
        nbuckets=1 << 11,
    )
    cands = _cand_df(spark, np.concatenate([seen_b[:200], fresh[:500]]))
    want = _sorted_rows(anti_join_exact(cands, df_ab))
    for filters in (scratch, incr):
        got = anti_join_cuckoo(cands, df_ab, nshards=NSHARDS, filters=filters)
        assert _sorted_rows(got) == want


def test_delete_enables_recrawl(spark, keysets):
    """The cuckoo USP: delete B from the filter (and seen), and B's URLs
    come back as definitely-crawlable — no rebuild, no false negatives on
    the surviving A keys."""
    seen_a, seen_b, fresh = keysets
    df_ab = _seen_df(spark, np.concatenate([seen_a, seen_b]))
    df_a = _seen_df(spark, seen_a)
    filters = build_shard_cuckoo(df_ab, nbuckets=1 << 11)
    after_del = delete_from_shard_cuckoo(filters, _seen_df(spark, seen_b))
    cands = _cand_df(spark, np.concatenate([seen_a[:200], seen_b[:400], fresh[:200]]))
    got = anti_join_cuckoo(cands, df_a, nshards=NSHARDS, filters=after_del)
    want = anti_join_exact(cands, df_a)
    assert _sorted_rows(got) == _sorted_rows(want)
    # and the deleted keys really are in the result (re-crawlable)
    got_keys = {r["url_hash"] for r in got.collect()}
    assert set(int(h) for h in seen_b[:400]) <= got_keys


def test_delete_never_inserted_raises(spark, keysets):
    seen_a, _seen_b, fresh = keysets
    filters = build_shard_cuckoo(_seen_df(spark, seen_a), nbuckets=1 << 11)
    bad = delete_from_shard_cuckoo(filters, _seen_df(spark, fresh[:50]))
    with pytest.raises(Exception, match="never-inserted"):
        bad.collect()


def test_duplicate_state_rows_raise(spark, keysets):
    seen_a, seen_b, _fresh = keysets
    f1 = build_shard_cuckoo(_seen_df(spark, seen_a), nbuckets=1 << 11)
    doubled = f1.unionByName(f1)
    cands = _cand_df(spark, seen_b[:100])
    with pytest.raises(Exception, match="expected 1"):
        anti_join_cuckoo(
            cands, _seen_df(spark, seen_a), nshards=NSHARDS, filters=doubled
        ).collect()


def test_overflow_raises_not_drops(spark, keysets):
    """A too-small table must fail loudly: silently dropping a key would be
    a false negative — a seen URL re-enqueued, a parity break."""
    seen_a, _b, _f = keysets
    with pytest.raises(Exception, match="over capacity"):
        build_shard_cuckoo(_seen_df(spark, seen_a), nbuckets=8).collect()


@pytest.mark.parametrize("mode", ["exact", "cuckoo", "bloom"])
def test_engine_expire_recrawl(spark, tmp_path, mode):
    """Re-crawl end-to-end: expire fetched URLs from seen and the next
    absorb re-enqueues and re-grants them. Exercises the deletion path the
    cuckoo backend exists for (exact/bloom modes take their documented
    removal/rebuild paths, same result)."""
    from maga_spark.crawlspec import CrawlConfig
    from maga_spark.plans.frontier import CrawlEngine
    from maga_spark.sources.fixtures import generate

    d = str(tmp_path / f"fx_{mode}")
    generate(d, n_urls=400, n_seeds=10)
    cfg = CrawlConfig(epochs=3, global_k=200, nshards=8)
    eng = CrawlEngine(spark, d, cfg, seen_mode=mode)
    res1 = eng.run(collect_ordering=True)
    assert len(res1.ordering) > 20
    seen_before = eng.seen.count()

    # pick crawled URLs on distinct hosts (politeness grants a few per host)
    by_host: dict[str, str] = {}
    for _e, _r, url in res1.ordering:
        by_host.setdefault(url.split("/")[2], url)
        if len(by_host) == 4:
            break
    urls = sorted(by_host.values())
    expired = eng.expire_urls(spark.createDataFrame([(u,) for u in urls], "url string"))
    assert expired == len(urls)
    assert eng.seen.count() == seen_before - len(urls)
    # idempotent: expiring again is a no-op (keys no longer in seen)
    assert eng.expire_urls(spark.createDataFrame([(u,) for u in urls], "url string")) == 0

    # feed the expired URLs back as the next discovery batch: every one
    # must re-enter the crawl — re-granted already, or re-enqueued and
    # waiting on priority/politeness like any first-time URL
    eng._pending = spark.createDataFrame([(u,) for u in urls], "url string")
    res2 = eng.run(epochs=1, collect_ordering=True)
    regranted = {u for (_e, _r, u) in res2.ordering}
    queued = {r["url_canon"] for r in eng.frontier.select("url_canon").collect()}
    assert set(urls) <= regranted | queued, f"lost: {set(urls) - regranted - queued}"
    assert regranted & set(urls), "expiry re-granted nothing"
    assert eng.seen.count() == seen_before  # re-absorbed into seen


def test_update_validates_geometry(spark):
    """ADVICE r4: update_shard_cuckoo applies the same pow2/fp_bits checks
    as build_shard_cuckoo — fresh shards index with & (nbuckets-1), so a
    non-pow2 size would silently address a fraction of the table."""
    import pytest as _pytest

    from maga_spark.operators.cuckoo import update_shard_cuckoo

    with _pytest.raises(ValueError, match="power of two"):
        update_shard_cuckoo(None, None, nbuckets=1000)
    with _pytest.raises(ValueError, match="fp_bits"):
        update_shard_cuckoo(None, None, fp_bits=3)


def test_expire_reenqueue_identical_across_modes(spark, tmp_path):
    """VERDICT r4 #5: the re-crawl cycle (crawl → expire → re-discover)
    must be bit-identical across seen backends — same post-expiry
    re-grant ordering and same final per-shard seen digests in exact,
    bloom, and cuckoo modes, even though each takes a different removal
    path (anti-join / rebuild / per-key delete)."""
    from pyspark.sql import functions as F

    from maga_spark.crawlspec import CrawlConfig
    from maga_spark.plans.frontier import CrawlEngine
    from maga_spark.sources.fixtures import generate

    d = str(tmp_path / "fx")
    generate(d, n_urls=300, n_seeds=8)
    cfg = CrawlConfig(epochs=2, global_k=64, nshards=8)

    results = {}
    for mode in ("exact", "bloom", "cuckoo"):
        eng = CrawlEngine(spark, d, cfg, seen_mode=mode)
        res1 = eng.run(collect_ordering=True)
        urls = sorted({u for (_e, _r, u) in res1.ordering})[:10]
        n = eng.expire_urls(spark.createDataFrame([(u,) for u in urls], "url string"))
        assert n == len(urls)
        eng._pending = spark.createDataFrame([(u,) for u in urls], "url string")
        res2 = eng.run(epochs=1, collect_ordering=True)
        digs = {
            int(r["shard"]): int(r["dig"])
            for r in eng.seen.groupBy("shard")
            .agg(
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.array_sort(F.collect_list("url_hash")),
                            lambda x: x.cast("string"),
                        ),
                    )
                ).alias("dig")
            )
            .collect()
        }
        results[mode] = (res1.ordering, res2.ordering, digs)

    assert results["exact"] == results["bloom"] == results["cuckoo"]
    assert len(results["exact"][1]) > 0  # the re-crawl epoch granted rows
