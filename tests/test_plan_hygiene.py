"""Plan-hygiene gate over the driver contract: filters must reach the
parquet scans, expression-only queries must stay Python-free, and no query
may plan a cartesian product (the banded near-dup rewrites exist precisely
to kill those)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.001"

# queries whose plans must contain no Python evaluation node at all
PURE_EXPRESSION = [
    "canonicalize",
    "xor_topk",
    "politeness_grant",
    "anti_join_seen",
    "frontier_union",
    "robots_gate",
    "token_of",
    "implied_port",
    "frame_sampling",
    "argmin_frame",
    "ordered_reassembly",
    "integrity_filter",
    "sequence_check",
    "tpch_q1",
    "broadcast_join_agg",
    "window_running",
    "sessionize",
    "tumbling_agg",
    "exact_dedup",
    "jaccard_chargram",
    "minhash_banding",
    "minhash_index_query",  # incremental index probe must stay pure + equi-join
    "phash_hamming",
    "embedding_near_dups",
    "language_id",
    "text_quality",
    "token_budget",
    "doc_repetition",  # Gopher repetition stats: in-row expressions only
    "line_dedup",  # groupBy-min keeper + reassembly: no Python, no window
    "tfidf_terms",
    "corpus_curate",  # the composed pipeline must stay pure end-to-end
    "image_curate",  # image-payload composed pipeline: pure end-to-end too
    "robots_rfc",  # RFC 9309 longest-match gate: the per-URL hot path is pure
    "frame_codec",
    "handshake_gate",
    "embedded_int",
    "piece_range",
    "winnow_fingerprint",
    "simhash_near_dups",  # portable mode is the zero-UDF sql path
    "lsh_ann",  # round-3 quantized buckets: pure expressions end-to-end
    "ivf_assign",  # quantized argmin assignment: pure expressions
    "pq_codes",  # PQ subspace argmin encode: pure expressions
    "pq_adc",  # ADC lookup-table scoring reads only code columns
    "image_stats",  # hex-chunk byte stats inside whole-stage codegen
    "dup_clusters",  # star rounds are joins+aggs; final plan Python-free
    "link_extract",  # href scan + RFC 3986 resolution: pure expressions
    "pagerank",  # integer-exact rank rounds: joins+aggs, Python-free
    "redirect_resolve",  # pointer-doubling rounds: equi-joins only
    "containment_pairs",  # winnow explode + equi-join: pure expressions
    "mime_sniff",  # 12-byte hex prefix cases inside codegen
    "stratified_sample",  # md5 hash key + per-stratum window: Python-free
    "sitemap_parse",  # regexp_extract_all + explode inside codegen
    "html_text",  # regexp_replace chain inside codegen
    "rank_blend",  # pagerank rounds + host window: joins/aggs only
    "geometry_check",  # 26-byte hex-prefix header parse inside codegen
    "revisit_schedule",  # per-url windows + integer backoff: Python-free
    "budget_share",  # floor/mod apportionment + remainder rank: Python-free
    "caption_align",  # quantized BIGINT cosine gate: pure expressions
    "robots_sitemaps",  # Sitemap-line extraction: regexp + explode
    "anchor_profile",  # element scan + per-target aggregation: Python-free
    "mixture_report",  # integer gates + one combinable groupBy
    "bm25_search",  # query-term filter + broadcast stats + TakeOrdered
    "trap_detect",  # template rewrite + one combinable groupBy
    "kmv_distinct",  # hash dedup + TakeOrdered bottom-k: Python-free
]

# queries with a doc_id/vec_id/orderkey cap that must be PUSHED to the scan
PUSHDOWN = {
    "jaccard_chargram": "doc_id",
    "simhash_near_dups": "doc_id",
    "phash_hamming": "doc_id",
    "winnow_fingerprint": "doc_id",
    "embedding_near_dups": "vec_id",
    "frame_sampling": "o_orderkey",
    "ordered_reassembly": "l_orderkey",
    "containment_pairs": "doc_id",
    "sitemap_parse": "doc_id",
    "html_text": "doc_id",
    "revisit_schedule": "doc_id",
    "anchor_profile": "doc_id",
}

# every query must be free of cartesian products
NO_CARTESIAN_EXEMPT = {"robots_gate"}  # 1-row broadcast crossJoin by design


def _plan(spark, name):
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", PURE_EXPRESSION)
def test_no_python_in_plan(spark, name):
    assert "EvalPython" not in _plan(spark, name), name


@pytest.mark.parametrize("name", sorted(PUSHDOWN))
def test_filter_pushed_to_scan(spark, name):
    plan = _plan(spark, name)
    key = PUSHDOWN[name]
    assert "PushedFilters: [" in plan and key in plan.split("PushedFilters: [", 1)[1][:200], name


def test_no_cartesian_products(spark):
    qs = entrymod.queries()
    for name in qs:
        if name in NO_CARTESIAN_EXEMPT or name == "crawl_epoch":
            continue
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
