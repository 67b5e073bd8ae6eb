"""As-of join (SURVEY.md O-25) — the keyframe-seek pattern
(screenshot_system/orchestrator.py:38-39: seek to nearest keyframe ≤ target)
as a distributed operator Spark lacks natively.

Implementation: union the two sides tagged by origin, one window pass per
partition key ordered by (ts, origin) with ``last(right_value,
ignorenulls=True)`` — O(n log n) in the shuffle, no range-join explosion,
no per-group pandas. ``tolerance`` optionally bounds staleness (the
reference's 1 s look-ahead bound, orchestrator.py:54-55, mirrored
backward)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row of the same ``on`` key
    with ``right_ts <= left_ts`` (backward as-of). Right columns come back
    null when nothing precedes. Ties on equal ts: right row sorts first
    (right value at ts T is visible to a left row at the same T)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    l_tag = left.withColumn("_ts", F.col(left_ts).cast("double")).withColumn("_o", F.lit(1))
    r_tag = (
        right.select(
            on,
            F.col(right_ts).cast("double").alias("_ts"),
            F.struct(
                F.col(right_ts).cast("double").alias("_rts"), *[F.col(c) for c in right_cols]
            ).alias("_rv"),
        )
        .withColumn("_o", F.lit(0))
    )
    merged = l_tag.unionByName(r_tag.withColumns({c: F.lit(None) for c in l_tag.columns if c not in r_tag.columns}), allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_o").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        merged.withColumn("_last", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_o") == 1)
    )
    if tolerance is not None:
        out = out.withColumn(
            "_last",
            F.when(F.col("_ts") - F.col("_last._rts") <= tolerance, F.col("_last")),
        )
    for c in right_cols:
        out = out.withColumn(c, F.col(f"_last.{c}"))
    return out.withColumn("asof_ts", F.col("_last._rts")).drop("_ts", "_o", "_rv", "_last")
