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
