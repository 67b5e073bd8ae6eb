"""Skew-safe per-group top-K (SURVEY.md O-40/§4.2.4).

A crawl frontier's host distribution is power-law: a plain
``Window.partitionBy(host)`` puts a hot host's millions of candidate rows in
one task. The two-phase salted form keeps the exact same result with bounded
partition sizes:

  phase 1 — rank within (group, salt) where salt = pmod(key, S); keep rank <= k.
            Each (group, salt) bucket's local top-k is a superset of the
            group's global top-k members that fall in that bucket, so no
            survivor is lost (no false negatives).
  phase 2 — exact rank within group over the <= S*k survivors.

``k`` may be a per-row column (constant within each group) — the politeness
grant uses the host's refilled token count as k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: Column,
    salt_key: str,
    rank_name: str = "group_rank",
    salt_buckets: int = 8,
) -> DataFrame:
    """Exact per-group top-k with salted pre-pruning; appends ``rank_name``.

    ``order_cols`` must be a total order within each group (deterministic
    tie-break required for parity — SURVEY.md §7.6b).
    """
    salted = df.withColumn("_salt", F.pmod(F.col(salt_key), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    pre = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return pre.withColumn(rank_name, F.row_number().over(w2)).filter(F.col(rank_name) <= k)


def global_topk(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Exact global top-k: ``orderBy().limit()`` compiles to
    TakeOrderedAndProject — per-partition heaps + driver merge, no global
    sort shuffle. Deterministic iff ``order_cols`` is a total order."""
    return df.orderBy(*order_cols).limit(k)
