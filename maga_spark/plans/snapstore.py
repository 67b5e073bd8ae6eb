"""Snapshot store — atomic epoch commits with per-partition lineage
(SURVEY.md §7.5; north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

No Iceberg/Delta jars exist in this sandbox (verified against the PySpark
4.1.2 install), so the table layer is parquet + an atomically-renamed
snapshot directory: every epoch's state (frontier, seen, host_state, pending
discoveries, ordering) is written into ``_tmp.epoch=N`` along with a
``manifest.json`` carrying per-shard row counts and bit_xor value-hashes,
then the directory is renamed to ``epoch=N`` — readers only ever see
complete snapshots (the reference analog: graceful shutdown commits state
before the loop stops, maga/crawler.py:106-111). On Iceberg-equipped
clusters the same interface maps onto snapshot commits.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_TABLES = ("frontier", "seen", "host_state", "pending", "ordering")


def _lineage(df: DataFrame, key: str, nshards: int) -> list[dict]:
    """Per-shard row count + order-insensitive bit_xor hash — the lineage
    record that makes two snapshots comparable without reading the data."""
    rows = (
        df.groupBy(F.pmod(F.xxhash64(key), F.lit(nshards)).cast("int").alias("shard"))
        .agg(F.count("*").alias("rows"), F.bit_xor(F.xxhash64(key)).alias("vhash"))
        .orderBy("shard")
        .collect()
    )
    return [{"shard": r["shard"], "rows": r["rows"], "vhash": r["vhash"]} for r in rows]


def commit_epoch(engine, epoch: int, metrics: dict | None = None, ordering: DataFrame | None = None) -> str:
    """Atomically persist the engine's post-epoch state. Returns final path."""
    root = engine.snapshot_dir
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f"_tmp.epoch={epoch}")
    final = os.path.join(root, f"epoch={epoch}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(final):
        shutil.rmtree(final)

    tables = {
        "frontier": engine.frontier,
        "seen": engine.seen,
        "host_state": engine.host_state,
        "pending": engine._pending,
    }
    if ordering is not None:
        tables["ordering"] = ordering
    manifest: dict = {"epoch": epoch, "metrics": metrics or {}, "tables": {}}
    for name, df in tables.items():
        if df is None:
            continue
        df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        key = "url_hash" if "url_hash" in df.columns else df.columns[0]
        manifest["tables"][name] = {
            "rows": df.count(),
            "columns": df.columns,
            "lineage": _lineage(df, key, engine.cfg.nshards),
        }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, final)  # the commit point
    return final


def list_epochs(root: str) -> list[int]:
    """Committed (manifest-complete) epochs, ascending."""
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        if d.startswith("epoch=") and os.path.exists(os.path.join(root, d, "manifest.json")):
            out.append(int(d.split("=")[1]))
    return sorted(out)


def read_manifest(root: str, epoch: int) -> dict:
    with open(os.path.join(root, f"epoch={epoch}", "manifest.json")) as f:
        return json.load(f)


def resume(spark: SparkSession, root: str, fixtures_dir: str, cfg, seen_mode: str = "exact", epoch: int | None = None):
    """Rebuild a CrawlEngine from the latest (or given) committed snapshot;
    the next ``run()`` continues at epoch+1. Partial (un-renamed) snapshot
    dirs are invisible — kill-at-any-point safe (tests/test_snapstore.py)."""
    from maga_spark.plans.frontier import CrawlEngine

    epochs = list_epochs(root)
    if not epochs:
        raise FileNotFoundError(f"no committed snapshots under {root}")
    epoch = epochs[-1] if epoch is None else epoch
    base = os.path.join(root, f"epoch={epoch}")
    eng = CrawlEngine(spark, fixtures_dir, cfg, seen_mode=seen_mode, snapshot_dir=root)
    eng.frontier = spark.read.parquet(os.path.join(base, "frontier"))
    eng.seen = spark.read.parquet(os.path.join(base, "seen"))
    eng.host_state = spark.read.parquet(os.path.join(base, "host_state"))
    eng._pending = spark.read.parquet(os.path.join(base, "pending"))
    if seen_mode == "bloom":
        # blooms are derived state (exactly the seen key set) — rebuild
        # once from the restored seen table rather than snapshotting the
        # bitsets; subsequent epochs grow them incrementally again
        from maga_spark.operators.seen import build_shard_blooms

        eng.blooms = build_shard_blooms(eng.seen, m_bits=cfg.bloom_m_bits)
    elif seen_mode == "cuckoo":
        # same derived-state rule as the blooms; the stored geometry must
        # match the config the engine will keep inserting with
        from maga_spark.operators.cuckoo import build_shard_cuckoo

        eng.cuckoo = build_shard_cuckoo(
            eng.seen, nbuckets=cfg.cuckoo_nbuckets, fp_bits=cfg.cuckoo_fp_bits
        )
    eng._start_epoch = epoch + 1
    return eng


def verify_snapshot(spark: SparkSession, root: str, epoch: int, nshards: int) -> dict:
    """Iceberg-style snapshot audit: re-read every table of a committed
    epoch and recompute the per-shard lineage (row counts + bit_xor value
    hashes) against the manifest written at commit time. Detects bit rot /
    partial rewrites without trusting anything but the parquet bytes.

    Returns {"ok": bool, "tables": {name: {"ok": bool, "expect": [...],
    "actual": [...]}}} — callers gate resume on ``ok``.
    """
    manifest = read_manifest(root, epoch)
    base = os.path.join(root, f"epoch={epoch}")
    out: dict = {"ok": True, "tables": {}}
    for name, meta in manifest["tables"].items():
        df = spark.read.parquet(os.path.join(base, name))
        key = "url_hash" if "url_hash" in df.columns else df.columns[0]
        actual = _lineage(df, key, nshards)
        ok = actual == meta["lineage"] and df.count() == meta["rows"]
        out["tables"][name] = {"ok": ok, "expect": meta["lineage"], "actual": actual}
        out["ok"] = out["ok"] and ok
    return out


def read_table(spark: SparkSession, root: str, table: str, epoch: int | None = None) -> DataFrame:
    """Time-travel reader — the Iceberg ``VERSION AS OF`` analog: read any
    committed state table at any committed epoch (default: the latest).
    Only manifest-complete snapshots are visible, so a reader can never
    observe a torn commit; combine with ``verify_snapshot`` to gate on
    bit-level integrity first."""
    epochs = list_epochs(root)
    if not epochs:
        raise FileNotFoundError(f"no committed snapshots under {root}")
    epoch = epochs[-1] if epoch is None else epoch
    if epoch not in epochs:
        raise FileNotFoundError(f"epoch {epoch} not committed (have {epochs})")
    manifest = read_manifest(root, epoch)
    if table not in manifest["tables"]:
        raise KeyError(f"table {table!r} not in epoch {epoch} (have {sorted(manifest['tables'])})")
    return spark.read.parquet(os.path.join(root, f"epoch={epoch}", table))


def _parquet_file_count(path: str) -> int:
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def compact_snapshot(
    spark: SparkSession, root: str, epoch: int, target_files: int = 1
) -> dict:
    """Iceberg ``rewrite_data_files`` analog: rewrite every table of a
    COMMITTED epoch down to ``target_files`` parquet files per table. A
    long crawl accretes one file per shuffle partition per table per epoch
    — small-file pressure that degrades every later scan; compaction
    ``coalesce``s (narrow, no shuffle) and re-commits through the same
    tmp-dir + rename protocol, carrying the ORIGINAL manifest: lineage is
    per-shard counts + order-insensitive bit_xor hashes, invariant under
    file rewrites, so ``verify_snapshot`` must stay green afterwards
    (tested). The old directory is renamed aside before the swap and
    removed last — a crash mid-swap leaves either the old or the new data
    recoverable on disk, never a half-written table visible.

    Returns {"tables": {name: {"files_before": n, "files_after": m}}}."""
    if epoch not in list_epochs(root):
        raise FileNotFoundError(f"epoch {epoch} not committed under {root}")
    manifest = read_manifest(root, epoch)
    final = os.path.join(root, f"epoch={epoch}")
    tmp = os.path.join(root, f"_tmp.epoch={epoch}.compact")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    report: dict = {"tables": {}}
    for name in manifest["tables"]:
        src = os.path.join(final, name)
        before = _parquet_file_count(src)
        spark.read.parquet(src).coalesce(max(1, target_files)).write.parquet(
            os.path.join(tmp, name)
        )
        report["tables"][name] = {
            "files_before": before,
            "files_after": _parquet_file_count(os.path.join(tmp, name)),
        }
    manifest.setdefault("compactions", []).append(
        {"target_files": target_files, "at": time.time()}
    )
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    trash = os.path.join(root, f"_tmp.epoch={epoch}.precompact")
    if os.path.exists(trash):
        shutil.rmtree(trash)
    os.rename(final, trash)
    os.rename(tmp, final)  # the commit point
    shutil.rmtree(trash)
    return report


def expire_snapshots(root: str, keep_last: int, tmp_grace_sec: float = 3600.0) -> list[int]:
    """Iceberg ``expire_snapshots`` analog: drop all but the newest
    ``keep_last`` committed epochs (resume/time-travel window), returning
    the expired epoch numbers. Un-renamed ``_tmp.*`` turds are swept too —
    they were never visible to readers — but ONLY when older than
    ``tmp_grace_sec``: a retention sweep run concurrently with a crawl (the
    natural cron usage) must not rmtree the ``_tmp.epoch=N`` workdir of a
    commit currently in flight, which would abort that epoch's rename and
    defeat the kill-safe commit design. ``tmp_grace_sec=0`` restores the
    unconditional sweep for offline cleanup. ``keep_last`` must be ≥ 1
    (the latest snapshot is the resume point and can never expire)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    epochs = list_epochs(root)
    expired = epochs[:-keep_last] if len(epochs) > keep_last else []
    for e in expired:
        shutil.rmtree(os.path.join(root, f"epoch={e}"))
    if os.path.isdir(root):
        now = time.time()
        for d in os.listdir(root):
            if d.startswith("_tmp."):
                p = os.path.join(root, d)
                try:
                    age = now - os.path.getmtime(p)
                except OSError:
                    continue  # raced with a concurrent commit's rename
                if age >= tmp_grace_sec:
                    shutil.rmtree(p, ignore_errors=True)
    return expired


def load_ordering(spark: SparkSession, root: str) -> list:
    """Union the per-epoch ordering tables of all committed snapshots into
    the full (epoch, rank, url_canon) crawl order."""
    rows = []
    for e in list_epochs(root):
        p = os.path.join(root, f"epoch={e}", "ordering")
        if os.path.exists(p):
            for r in spark.read.parquet(p).orderBy("epoch", "rank").collect():
                rows.append((r["epoch"], r["rank"], r["url_canon"]))
    return rows


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    cmp_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level changelog between two snapshots of the same table — the
    audit a re-crawl epoch answers with ("what did this sweep add, drop,
    or change?") before anyone diffs terabytes by eye: per key,
    ``status ∈ added | removed | changed`` (``unchanged`` only when
    ``include_unchanged``), plus both sides' md5 digests of the compared
    columns so a follow-up query can fetch exactly the changed payloads.

    The digest is md5 over the compared columns, each prefixed with a
    null/value flag byte: a bare concat_ws SKIPS nulls (aliasing
    ('a', NULL) with (NULL, 'a')), and an in-band NULL sentinel would
    alias NULL with a value equal to the sentinel — the flag byte is
    out-of-band for both. Reproducible in DuckDB, so the whole changelog
    value-hashes.

    Scale shape: each side reduces to (keys, digest) — the payload never
    moves — then ONE full-outer hash equi-join on the keys. At 10^10 rows
    that is the minimal possible diff: two scans + one shuffle, no window,
    no Python. Snapshots from ``read_table(..., epoch=…)`` at two epochs
    slot straight in."""
    if not key_cols or not cmp_cols:
        raise ValueError("key_cols and cmp_cols must be non-empty")
    digest = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.when(F.col(c).isNull(), F.lit("n")).otherwise(
                    F.concat(F.lit("v"), F.col(c).cast("string"))
                )
                for c in cmp_cols
            ],
        )
    )
    oj = old.select(*key_cols, digest.alias("old_digest"))
    nj = new.select(*key_cols, digest.alias("new_digest"))
    j = oj.join(nj, key_cols, "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(*key_cols, status.alias("status"), "old_digest", "new_digest")
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
