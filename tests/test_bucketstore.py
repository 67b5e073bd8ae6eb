"""Bucketed seen-set storage: the stored side of the membership anti-join
must come out of the catalog pre-hashed (no Exchange / no Sort above its
scan), appends must preserve the layout, and results must be bit-equal to
the plain exact anti-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from maga_spark.plans.bucketstore import (
    anti_join_seen_bucketed,
    append_seen_bucketed,
    write_seen_bucketed,
)


@pytest.fixture()
def seen_table(spark, tmp_path):
    name = "seen_bucketed_test"
    yield name, str(tmp_path / "seen_tbl")
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _seen_scan_section(plan: str) -> str:
    # the FileScan line for the bucketed table reports its bucket layout
    return "\n".join(ln for ln in plan.splitlines() if "seen_tbl" in ln or "Bucketed" in ln)


def test_bucketed_anti_join_no_exchange_on_seen_side(spark, seen_table):
    name, path = seen_table
    seen = spark.range(0, 20000).select(F.xxhash64("id").alias("url_hash"))
    write_seen_bucketed(seen, name, path, n_buckets=8)

    cand = spark.range(15000, 30000).select(F.xxhash64("id").alias("url_hash"))
    out = anti_join_seen_bucketed(cand, spark, name)
    plan = out._jdf.queryExecution().executedPlan().toString()

    assert "SortMergeJoin" in plan and "LeftAnti" in plan
    # the bucketed scan is consumed directly: exactly ONE Exchange in the
    # whole plan (the candidate side), none above the seen-table scan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Bucketed: true" in plan
    # bit-equal to the plain anti-join
    want = sorted(
        r.url_hash
        for r in cand.join(spark.read.parquet(path), "url_hash", "left_anti").collect()
    )
    assert sorted(r.url_hash for r in out.collect()) == want


def test_bucketed_append_preserves_layout_and_semantics(spark, seen_table):
    name, path = seen_table
    e1 = spark.range(0, 5000).select(F.xxhash64("id").alias("url_hash"))
    write_seen_bucketed(e1, name, path, n_buckets=8)
    e2 = spark.range(5000, 9000).select(F.xxhash64("id").alias("url_hash"))
    append_seen_bucketed(e2, name)

    cand = spark.range(0, 12000).select(F.xxhash64("id").alias("url_hash"))
    out = anti_join_seen_bucketed(cand, spark, name)
    # both epochs' keys are seen; only 9000..11999 survive
    assert out.count() == 3000
    # layout survived the append: still bucket-aligned, single Exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Bucketed: true" in plan


def test_append_to_unbucketed_table_raises(spark, tmp_path):
    df = spark.range(5).select(F.xxhash64("id").alias("url_hash"))
    df.write.mode("overwrite").option("path", str(tmp_path / "plain")).saveAsTable(
        "plain_seen_test"
    )
    try:
        with pytest.raises(ValueError, match="not bucketed"):
            append_seen_bucketed(df, "plain_seen_test")
    finally:
        spark.sql("DROP TABLE IF EXISTS plain_seen_test")


def test_fingerprint_index_matches_adhoc_and_is_exchange_free(spark, tmp_path):
    """build_fingerprint_index + containment_pairs_from_index: identical
    results to the ad-hoc containment_pairs, with the sharing self-join
    consuming BOTH sides from the bucketed catalog table — zero Exchange
    under the join (winnow hashes computed once at ingest, never again)."""
    from maga_spark.operators.dedup import (
        build_fingerprint_index,
        containment_pairs,
        containment_pairs_from_index,
    )

    small = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = [(1, small), (2, "padding before. " + small + " padding after with more words"),
            (3, "entirely different content with no shared phrasing at all here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    try:
        build_fingerprint_index(df, "fp_idx_test", str(tmp_path / "fp_idx"), n_buckets=4)
        out = containment_pairs_from_index(spark, "fp_idx_test", min_containment=0.3)
        want = containment_pairs(df, min_containment=0.3)
        got_rows = sorted(((r.u, r.v, r.shared, r.fp_u, round(r.containment, 9)) for r in out.collect()))
        want_rows = sorted(((r.u, r.v, r.shared, r.fp_u, round(r.containment, 9)) for r in want.collect()))
        assert got_rows == want_rows and got_rows  # same pairs, non-empty

        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the h-keyed self-join takes both sides straight from buckets: the
        # only hash Exchanges left belong to the (u,v) and size aggregates
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning(h" not in join_part
        assert "Bucketed: true" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS fp_idx_test")


def test_fingerprint_index_append_and_doc_freq_cap(spark, tmp_path):
    from maga_spark.operators.dedup import (
        build_fingerprint_index,
        containment_pairs_from_index,
    )

    boiler = "standard legal boilerplate notice applies to this document entirely"
    batch1 = spark.createDataFrame(
        [(i, f"unique content number {i} about topic {i * 7} " * 3 + boiler) for i in range(10)],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(i, f"unique content number {i} about topic {i * 7} " * 3 + boiler) for i in range(10, 20)],
        "doc_id long, text string",
    )
    try:
        build_fingerprint_index(batch1, "fp_idx_app", str(tmp_path / "fp_app"), n_buckets=4)
        base = containment_pairs_from_index(spark, "fp_idx_app", min_containment=0.2).count()
        build_fingerprint_index(batch2, "fp_idx_app", str(tmp_path / "fp_app"), mode="append", n_buckets=4)
        grown = containment_pairs_from_index(spark, "fp_idx_app", min_containment=0.2).count()
        assert grown > base  # new docs share the boilerplate with everyone
        capped = containment_pairs_from_index(
            spark, "fp_idx_app", min_containment=0.2, max_doc_freq=10
        ).count()
        assert capped == 0  # nothing but the boilerplate is shared
    finally:
        spark.sql("DROP TABLE IF EXISTS fp_idx_app")
