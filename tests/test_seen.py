"""Seen-set membership operator (SURVEY.md §7.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from maga_spark.operators.seen import anti_join_bloom, anti_join_exact, build_shard_blooms


def _mk(spark, n_seen=500, n_cand=300, nshards=8):
    seen = (
        spark.range(n_seen)
        .select(F.xxhash64("id").alias("url_hash"))
        .withColumn("shard", F.pmod("url_hash", F.lit(nshards)).cast("int"))
        .select("shard", "url_hash")
    )
    # candidates: half overlap with seen, half new
    cand = spark.range(n_seen - n_cand // 2, n_seen + n_cand // 2).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("payload")
    )
    return seen, cand


def test_bloom_equals_exact(spark):
    seen, cand = _mk(spark)
    exact = {r["url_hash"] for r in anti_join_exact(cand, seen).collect()}
    bloom = {r["url_hash"] for r in anti_join_bloom(cand, seen).collect()}
    assert bloom == exact
    assert len(exact) == 150  # exactly the new half


def test_bloom_no_false_negatives_small_filter(spark):
    """Force a dense (high-FP) bloom — result must STILL be exact."""
    seen, cand = _mk(spark, n_seen=2000, n_cand=1000)
    from maga_spark.operators import seen as seen_mod

    blooms = build_shard_blooms(seen, bits_per_key=2, min_bits=256).collect()
    assert all(len(bytes(r["bloom"])) * 8 == r["m_bits"] for r in blooms)
    exact = {r["url_hash"] for r in anti_join_exact(cand, seen).collect()}
    bloom = {r["url_hash"] for r in seen_mod.anti_join_bloom(cand, seen).collect()}
    assert bloom == exact


def test_empty_seen(spark):
    seen, cand = _mk(spark, n_seen=0, n_cand=100)
    got = anti_join_bloom(cand, seen).count()
    assert got == cand.count()


def test_bloom_sparse_seen_unpopulated_top_shard(spark):
    """ADVICE round-1 regression: a seen set whose top shard ids are empty
    must not be probed with an inferred (wrong) modulus. With nshards=8 but
    all rows landing in shards 0-2, every seen candidate must still be
    dropped."""
    # shard = pmod(url_hash, 8); shards 3..7 unpopulated → the old
    # max(shard)+1 inference would use modulus 3 and probe hash 10 in
    # shard 10%3=1 (a bloom that doesn't hold it) → false negative.
    rows = [(0, 8), (1, 9), (2, 10)]
    seen = spark.createDataFrame(rows, "shard int, url_hash long")
    cand = spark.createDataFrame([(8,), (9,), (10,), (999,)], "url_hash long")
    out = {
        r["url_hash"]
        for r in anti_join_bloom(cand, seen, nshards=8).collect()
    }
    assert out == {999}


def test_bloom_rejects_inconsistent_nshards(spark):
    seen = spark.createDataFrame([(5, 42)], "shard int, url_hash long")
    cand = spark.createDataFrame([(42,)], "url_hash long")
    import pytest

    with pytest.raises(AssertionError):
        anti_join_bloom(cand, seen, nshards=4).collect()


def test_bloom_single_udf_pass(spark):
    """The probe column must be evaluated once: the split branches read the
    persisted `_maybe` boolean, so exactly one InMemoryRelation scan pair
    appears and no branch re-plans the pandas UDF."""
    seen, cand = _mk(spark)
    out = anti_join_bloom(cand, seen, nshards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both branches must read the cached relation, not re-run ArrowEvalPython
    assert plan.count("ArrowEvalPython") == 0 or plan.count("InMemoryTableScan") >= 2
