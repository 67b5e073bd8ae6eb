"""Skew-guard end-to-end exercise at bench scale (VERDICT r4 #6).

The scheduler's uniform top-K (operators/topk.global_topk_uniform_ranked)
assumes the leading key ``xor_d = xxhash64(url_canon) ^ epoch_target`` is
uniform — true by construction for organic inputs, but an adversary (or a
pathological upstream filter) can concentrate the candidate set into one
1/4096 key slice and turn the bucket-local window into one straggler task.
The engine's guard (plans/frontier.py run()) observes per-bucket counts
in-plan, WARNS, and flips the NEXT epoch to the sampled range-partitioner
top-K — ranks are exact on both paths, so skew costs time, never
correctness.

This tool manufactures that adversary FOR REAL and records the evidence:

1. rejection-samples >=150k canonical URLs of the fixture's own shape
   whose xor_d (vs the true epoch-0 target) all land in ONE top-12-bit
   bucket — a genuinely concentrated key set, not a threshold trick;
2. operator A/B at that scale: uniform-bucket top-K (skew Observation
   firing) vs sampled top-K — asserts bit-identical (rank, key) output,
   reports both walls and the observed bucket share;
3. engine end-to-end: a fixture whose SEEDS are those URLs — engine A
   (default guard) must emit the skew warning at epoch 0 and fall back at
   epoch 1; engine B (fallback forced from epoch 0) must produce the
   bit-identical ordering for both epochs.

Prints one JSON line; append the table to BENCH.md via --bench-md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from maga_spark.crawlspec import CrawlConfig, epoch_target  # noqa: E402
from maga_spark.functions.scalar import url_canonicalize  # noqa: E402
from maga_spark.operators.topk import (  # noqa: E402
    global_topk_ranked,
    global_topk_uniform_ranked,
)
from maga_spark.session import get_spark  # noqa: E402

N_ROWS = 150_000  # adversarial candidate count (the VERDICT asks 150k+)
K = 120_000
SLICE = 1234  # the one top-12-bit bucket every key is forced into
UNIVERSE = 800_000_000  # rejection-sampling pool (~195k expected hits)


def adversarial_urls(spark, target: int):
    """>= N_ROWS canonical URLs whose xxhash64 ^ target all share the same
    top-12 bits — Spark-side rejection sampling over the fixture URL shape
    (hosts h2..h14 exist in any generate() fixture with >= 1664 URLs).
    The synthesized shape is already canonical, so the 10^8-row sampling
    scan pays only the hash, not the regex canonicalizer; canonicality is
    asserted on the surviving rows (cheap) so the engine's absorb cannot
    re-hash them differently."""
    ids = spark.range(0, UNIVERSE, 1, 64)
    urls = ids.select(
        F.concat(
            F.lit("http://h"),
            (F.col("id") % 13 + 2).cast("string"),
            F.lit(".test/skew/"),
            F.col("id").cast("string"),
        ).alias("url")
    )
    xd = F.expr(f"xxhash64(url) ^ {target}L")
    bucket = (F.shiftright(xd, 52) + F.lit(1 << 11)).cast("int")
    out = urls.filter(bucket == SLICE).limit(N_ROWS).localCheckpoint(True)
    n_noncanon = out.filter(url_canonicalize(F.col("url")) != F.col("url")).count()
    assert n_noncanon == 0, f"{n_noncanon} sampled URLs not canonical"
    return out


def operator_ab(spark, urls, target: int) -> dict:
    cand = (
        urls.select(F.xxhash64("url").alias("url_hash"))
        .withColumn("xor_d", F.expr(f"url_hash ^ {target}L"))
        .localCheckpoint(True)
    )
    order = [F.col("xor_d").asc(), F.col("url_hash").asc()]

    stats: dict = {}
    t0 = time.perf_counter()
    a = global_topk_uniform_ranked(
        cand, order, K, uniform_key="xor_d", rank_name="rank", skew_stats=stats
    )
    rows_a = sorted((r["rank"], r["url_hash"]) for r in a.collect())
    wall_uniform = time.perf_counter() - t0
    m = stats["_skew_obs"].get
    share = int(m["max_bucket_n"]) / int(m["total_n"])

    t0 = time.perf_counter()
    b = global_topk_ranked(cand, order, K, rank_name="rank")
    rows_b = sorted((r["rank"], r["url_hash"]) for r in b.collect())
    wall_sampled = time.perf_counter() - t0

    assert rows_a == rows_b and len(rows_a) == K, "top-K paths diverged"
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return {
        "n_rows": cand.count(),
        "bucket_share": round(share, 4),
        "fair_share": round(1 / npart, 4),
        "guard_fires": share > CrawlConfig().topk_skew_factor / npart,
        "wall_uniform_sec": round(wall_uniform, 2),
        "wall_sampled_sec": round(wall_sampled, 2),
        "identical_output": True,
    }


def engine_ab(spark, urls, tmp_dir: str) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from maga_spark.plans.frontier import CrawlEngine
    from maga_spark.sources.fixtures import generate

    d = os.path.join(tmp_dir, "skew_fixture")
    if not os.path.exists(os.path.join(d, "politeness.parquet")):
        # rate_boost makes every adversarial seed politeness-eligible at
        # epoch 0, so the FULL 150k-row set reaches the top-K stage
        generate(d, n_urls=2000, n_seeds=2, rate_boost=200_000)
    rows = urls.collect()
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "host": pa.array(
                    [r["url"].split("/")[2] for r in rows], pa.string()
                ),
            }
        ),
        os.path.join(d, "seeds.parquet"),
    )

    cfg = CrawlConfig(epochs=2, global_k=K, nshards=8)
    out: dict = {}

    eng_a = CrawlEngine(spark, d, cfg)  # default guard
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        t0 = time.perf_counter()
        res_a = eng_a.run(collect_ordering=True)
        out["wall_guarded_sec"] = round(time.perf_counter() - t0, 2)
    skew_warns = [w for w in caught if "bucket skew" in str(w.message)]
    out["warn_fired"] = len(skew_warns) > 0
    out["fallback_active_after"] = eng_a.topk_fallback_active

    eng_b = CrawlEngine(spark, d, cfg)
    eng_b.topk_fallback_active = True  # sampled path from epoch 0
    t0 = time.perf_counter()
    res_b = eng_b.run(collect_ordering=True)
    out["wall_forced_sampled_sec"] = round(time.perf_counter() - t0, 2)

    out["ordering_identical"] = res_a.ordering == res_b.ordering
    out["ordering_rows"] = len(res_a.ordering)
    assert out["warn_fired"], "skew warning did not fire"
    assert out["fallback_active_after"], "guard did not flip the fallback"
    assert out["ordering_identical"], "engine orderings diverged"
    return out


def main() -> None:
    spark = get_spark(
        app_name="bench_skew",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    target = epoch_target(0)
    urls = adversarial_urls(spark, target)
    n = urls.count()
    assert n >= N_ROWS, f"rejection sampling found only {n} rows"

    res = {"target": target, "slice": SLICE}
    res["operator"] = operator_ab(spark, urls, target)
    res["engine"] = engine_ab(spark, urls, os.path.join(os.path.dirname(__file__), "..", ".bench_cache"))
    print(json.dumps(res))

    if "--bench-md" in sys.argv:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        o, e = res["operator"], res["engine"]
        with open(os.path.join(repo, "BENCH.md"), "a") as f:
            f.write(
                f"""
## Skew-guard end-to-end exercise (round 5)

Adversarial input manufactured by rejection sampling: {o['n_rows']:,}
canonical fixture-shaped URLs whose `xor_d` vs the REAL epoch-0 target all
share one top-12-bit slice (bucket share {o['bucket_share']:.1%} vs fair
share {o['fair_share']:.2%} — the guard threshold is 4x fair share).

| path | wall (s) | output |
| --- | --- | --- |
| operator: uniform-bucket top-K (skewed) | {o['wall_uniform_sec']} | {K:,} rows |
| operator: sampled range-partitioner top-K | {o['wall_sampled_sec']} | bit-identical |
| engine A: guard warns at epoch 0, falls back epoch 1 | {e['wall_guarded_sec']} | {e['ordering_rows']:,} ordering rows |
| engine B: sampled path forced from epoch 0 | {e['wall_forced_sampled_sec']} | bit-identical |

Engine A emitted the skew warning ({e['warn_fired']}), flipped
`topk_fallback_active` ({e['fallback_active_after']}), and produced an
ordering bit-equal to engine B's ({e['ordering_identical']}) — the guard
costs one skewed epoch of straggler time and zero correctness, exactly as
designed (frontier.py run(); VERDICT r3 #4 / r4 #6).
"""
            )
    spark.stop()


if __name__ == "__main__":
    main()
