"""Re-crawl freshness backoff and largest-remainder budget apportionment
(operators/scheduling.py), checked against hand-computed oracles."""

from __future__ import annotations

import pytest

from maga_spark.operators.scheduling import fair_share, revisit_schedule


def _sched(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, epoch long, content_hash string")
    return {r.url: r for r in revisit_schedule(df, **kw).collect()}


def test_revisit_backoff_and_reset(spark):
    rows = (
        # a: never changes over 4 fetches → streak 3 → interval 8
        [("a", e, "x") for e in (1, 2, 3, 4)]
        # b: changes at the last fetch → streak 0 → interval 1 (reset)
        + [("b", 1, "x"), ("b", 2, "x"), ("b", 3, "y")]
        # c: change mid-history then 2 stable → streak 2 → interval 4
        + [("c", 1, "x"), ("c", 2, "y"), ("c", 3, "y"), ("c", 4, "y")]
        # d: single fetch → streak 0 → interval 1
        + [("d", 7, "x")]
    )
    out = _sched(spark, rows, base_interval=1, max_interval=64)
    a = out["a"]
    assert (a.n_fetches, a.n_changes, a.unchanged_streak, a.next_interval, a.next_epoch) == (4, 0, 3, 8, 12)
    b = out["b"]
    assert (b.n_changes, b.unchanged_streak, b.next_interval, b.next_epoch) == (1, 0, 1, 4)
    c = out["c"]
    assert (c.n_changes, c.unchanged_streak, c.next_interval) == (1, 2, 4)
    d = out["d"]
    assert (d.n_fetches, d.unchanged_streak, d.next_interval, d.next_epoch) == (1, 0, 1, 8)


def test_revisit_interval_cap(spark):
    rows = [("a", e, "x") for e in range(1, 12)]  # streak 10 → 2^10 uncapped
    out = _sched(spark, rows, base_interval=1, max_interval=16)
    assert out["a"].next_interval == 16
    assert out["a"].next_epoch == 11 + 16


def test_fair_share_exact_apportionment(spark):
    # budget 10 over pending 5/3/2 → exact thirds: floors 5,3,2, no leftover
    df = spark.createDataFrame([("a", 50), ("b", 30), ("c", 20)], "host string, pending long")
    got = {r.host: r.quota for r in fair_share(df, budget=10).collect()}
    assert got == {"a": 5, "b": 3, "c": 2}


def test_fair_share_largest_remainder_and_cap(spark):
    # budget 10 over 1/1/1: floors 3,3,3, leftover 1 → smallest host name wins the tie
    df = spark.createDataFrame([("a", 7), ("b", 7), ("c", 7)], "host string, pending long")
    got = {r.host: r.quota for r in fair_share(df, budget=10).collect()}
    assert got == {"a": 4, "b": 3, "c": 3}
    assert sum(got.values()) == 10
    # cap binds: a host is never granted more than it has pending
    df2 = spark.createDataFrame([("a", 2), ("b", 100)], "host string, pending long")
    got2 = {r.host: r.quota for r in fair_share(df2, budget=51).collect()}
    assert got2["a"] <= 2
    assert got2["b"] <= 100
    assert sum(got2.values()) <= 51


def test_fair_share_budget_validation(spark):
    df = spark.createDataFrame([("a", 1)], "host string, pending long")
    with pytest.raises(ValueError):
        fair_share(df, budget=-1)


def test_revisit_no_shiftleft_overflow(spark):
    """ADVICE r4: streak >= 63 must clamp to max_interval, never wrap to
    Long.MIN_VALUE and schedule the most-stable URLs into the past."""
    rows = [("a", e, "x") for e in range(70)]  # streak 69
    out = _sched(spark, rows, base_interval=1, max_interval=64)
    assert out["a"].next_interval == 64
    assert out["a"].next_epoch == 69 + 64
    # base > 1 overflows earlier (base=2 at streak 62) — same clamp applies
    out2 = _sched(rows=rows, spark=spark, base_interval=2, max_interval=1 << 40)
    assert out2["a"].next_interval == 1 << 40
    assert out2["a"].next_epoch == 69 + (1 << 40)


def test_revisit_parameter_validation(spark):
    rows = [("a", 1, "x")]
    df = spark.createDataFrame(rows, "url string, epoch long, content_hash string")
    with pytest.raises(ValueError):
        revisit_schedule(df, base_interval=0)
    with pytest.raises(ValueError):
        revisit_schedule(df, base_interval=8, max_interval=4)


def test_fair_share_all_drained_frontier(spark):
    """ADVICE r4: sum(pending) == 0 must grant zero quotas, not raise
    DIVIDE_BY_ZERO under ANSI mode and fail the epoch."""
    df = spark.createDataFrame([("a", 0), ("b", 0)], "host string, pending long")
    got = {r.host: r.quota for r in fair_share(df, budget=10).collect()}
    assert got == {"a": 0, "b": 0}
