"""IVF recall-vs-nprobe curve + append→compact maintenance (VERDICT r4 #7).

Runs the full index lifecycle on the driver testdata embeddings
(`$SPARK_GRAFT_SF_DIR/embeddings.parquet`): train+build on 75% of the
corpus, APPEND the remaining 25% with the stored centroids, COMPACT the
accreted small files (operators/similarity.compact_ivf_index), then sweep
``nprobe`` and report recall@10 against exact brute-force cosine over the
grown corpus. Prints one JSON line; ``--bench-md`` appends the table to
BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from maga_spark.operators.similarity import (  # noqa: E402
    append_to_ivf_index,
    brute_force_topk,
    build_ivf_index,
    compact_ivf_index,
    ivf_topk,
)
from maga_spark.session import get_spark  # noqa: E402

K = 10
N_QUERIES = 25
N_LISTS = 16
NPROBES = [1, 2, 4, 8, 16]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="bench_recall",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n = emb.count()
    cut = int(n * 0.75)
    base = emb.filter(F.col("vec_id") < cut)
    grow = emb.filter(F.col("vec_id") >= cut)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        "ivf_recall_index",
    )
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    t0 = time.perf_counter()
    cents = build_ivf_index(base, path, n_lists=N_LISTS, iters=2)
    build_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    for part in range(5):  # five append batches → small-file accretion
        append_to_ivf_index(
            grow.filter(F.pmod("vec_id", F.lit(5)) == part), path, cents
        )
    append_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    compact_report = compact_ivf_index(spark, path)
    compact_sec = time.perf_counter() - t0

    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.pmod("vec_id", F.lit(max(1, n // N_QUERIES))) == 0)
        .limit(N_QUERIES)
        .collect()
    ]
    truth = {}
    t0 = time.perf_counter()
    for qid, q in queries:
        truth[qid] = {r["id"] for r in brute_force_topk(emb, q, k=K).collect()}
    brute_sec = (time.perf_counter() - t0) / len(queries)

    curve = []
    for nprobe in NPROBES:
        hits = tot = 0
        t0 = time.perf_counter()
        for qid, q in queries:
            got = {r["id"] for r in ivf_topk(spark, path, cents, q, k=K, nprobe=nprobe).collect()}
            hits += len(got & truth[qid])
            tot += K
        wall = (time.perf_counter() - t0) / len(queries)
        curve.append(
            {"nprobe": nprobe, "recall_at_10": round(hits / tot, 4), "sec_per_query": round(wall, 3)}
        )

    res = {
        "n_vectors": n,
        "n_lists": N_LISTS,
        "build_sec": round(build_sec, 2),
        "append_sec": round(append_sec, 2),
        "compact": compact_report,
        "compact_sec": round(compact_sec, 2),
        "brute_sec_per_query": round(brute_sec, 3),
        "curve": curve,
    }
    print(json.dumps(res))

    if "--bench-md" in sys.argv:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        rows = "\n".join(
            f"| {c['nprobe']} | {c['recall_at_10']:.2%} | {c['sec_per_query']} |"
            for c in curve
        )
        with open(os.path.join(repo, "BENCH.md"), "a") as f:
            f.write(
                f"""
## IVF maintenance + recall-vs-nprobe (round 5)

Lifecycle on {n:,} driver-testdata embeddings ({N_LISTS} inverted lists):
build on 75% ({res['build_sec']} s) → five append batches for the rest
({res['append_sec']} s, stored centroids, no retrain) → compact
{compact_report['files_before']} small files → {compact_report['files_after']}
({res['compact_sec']} s, results bit-identical — test_ivf_compact_after_append).
Exact brute-force baseline: {res['brute_sec_per_query']} s/query.

| nprobe | recall@10 | sec/query |
| --- | --- | --- |
{rows}

Reading the curve: nprobe is the accuracy/cost dial — each probed list is
one partition-pruned parquet read, so cost grows linearly in nprobe while
recall saturates; at 100 TB the same curve governs how many of the
O(√n)-sized lists a query touches.
"""
            )
    spark.stop()


if __name__ == "__main__":
    main()
