"""Deterministic sampling, sitemap parsing, HTML text extraction, and
authority-blended frontier ordering — round-4 curation/discovery additions.
Each checked against an independent in-Python oracle."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from maga_spark.operators.graph import authority_blend, pagerank
from maga_spark.operators.links import parse_sitemap, xml_unescape
from maga_spark.operators.sampling import hash_sample, sample_key, sample_per_stratum
from maga_spark.operators.text import html_to_text


def _h60(s: str, salt: str = "smp:") -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


def test_hash_sample_rate_and_monotonicity(spark):
    df = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    q = {r.doc_id for r in hash_sample(df, 1, 4, id_col="doc_id").collect()}
    e = {r.doc_id for r in hash_sample(df, 1, 8, id_col="doc_id").collect()}
    # statistically ~1000/~500; the md5 hash is uniform enough for ±20%
    assert 800 < len(q) < 1200 and 380 < len(e) < 620
    assert e <= q  # subset-monotone: the 1/8 sample is inside the 1/4 sample
    # exact membership = the documented integer threshold, row by row
    thr = (1 << 60) // 4
    assert q == {i for i in range(4000) if _h60(str(i)) < thr}


def test_hash_sample_salt_independence(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id for r in hash_sample(df, 1, 2, salt="a:").collect()}
    b = {r.doc_id for r in hash_sample(df, 1, 2, salt="b:").collect()}
    assert a != b  # different seed, different draw
    inter = len(a & b) / max(len(a), 1)
    assert 0.3 < inter < 0.7  # independent halves overlap ~50%


def test_sample_per_stratum_exact_and_nested(spark):
    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample_per_stratum(df, n_per=10).collect()
    by_s = {}
    for r in out:
        by_s.setdefault(r.source, []).append(r)
    assert {s: len(v) for s, v in by_s.items()} == {"s0": 10, "s1": 10, "s2": 10}
    for s, v in by_s.items():
        # rank order == hash order; the m-prefix is the m-sample (nested)
        ks = [_h60(str(r.doc_id)) for r in sorted(v, key=lambda r: r.draw_rank)]
        assert ks == sorted(ks)
        want = sorted((d for d, src in rows if src == s), key=lambda d: (_h60(str(d)), d))[:10]
        assert sorted(r.doc_id for r in v) == sorted(want)
    # small stratum: returns all its rows, never pads
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, source string")
    assert sample_per_stratum(tiny, n_per=10).count() == 2


def test_sample_key_is_pure_plan(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    plan = (
        df.select(sample_key(F.col("doc_id")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_parse_sitemap_urlset_index_entities(spark):
    urlset = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.example/x </loc></url>"
        "<url><loc>https://a.example/p?x=1&amp;y=2</loc></url>"
        "<url><loc></loc></url></urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://b.example/sm1.xml</loc></sitemap>"
        "<sitemap><loc>https://b.example/sm2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("https://a.example/s.xml", urlset), ("https://b.example/s.xml", index)],
        "url string, body string",
    )
    out = parse_sitemap(df).collect()
    a = sorted(r.loc for r in out if r.sitemap_url == "https://a.example/s.xml")
    assert a == ["https://a.example/p?x=1&y=2", "https://a.example/x"]  # trimmed, unescaped, empty dropped
    assert all(not r.is_index for r in out if r.sitemap_url.startswith("https://a"))
    b = [r for r in out if r.sitemap_url == "https://b.example/s.xml"]
    assert len(b) == 2 and all(r.is_index for r in b)


def test_xml_unescape_amp_last(spark):
    # '&amp;lt;' must decode to the literal '&lt;', not recurse to '<'
    df = spark.createDataFrame([("&amp;lt;",), ("a&amp;b",)], "s string")
    got = [r[0] for r in df.select(xml_unescape(F.col("s"))).collect()]
    assert got == ["&lt;", "a&b"]


def test_html_to_text_strips_blocks_tags_entities(spark):
    html = (
        '<html><head><style>p{color:red}</style>'
        '<script>var x="</p>";</script></head>'
        "<body><!-- note --><h1>Title</h1><p>hello&nbsp;world</p>"
        "<p>it&#39;s &amp; &lt;tagged&gt;</p></body></html>"
    )
    df = spark.createDataFrame([(html,), (None,)], "h string")
    got = [r[0] for r in df.select(html_to_text(F.col("h"))).collect()]
    # script body's '</p>' is gone WITH the script (stripped before tags);
    # &nbsp; is not in the decoded set and survives literally
    assert got[0] == "Title hello&nbsp;world it's & <tagged>"
    assert got[1] is None


def test_html_to_text_python_oracle(spark):
    def py(h):
        h = re.sub(r"(?is)<script\b[^>]*>.*?</script\s*>", " ", h)
        h = re.sub(r"(?is)<style\b[^>]*>.*?</style\s*>", " ", h)
        h = re.sub(r"(?s)<!--.*?-->", " ", h)
        h = re.sub(r"(?s)<[^>]*>", " ", h)
        for a, b in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&apos;", "'"), ("&#39;", "'"), ("&amp;", "&")]:
            h = h.replace(a, b)
        return re.sub(r"\s+", " ", h).strip()

    cases = [
        "<p>a<br/>b</p>",
        "no tags at all",
        "<script>while(1){}</script>rest",
        "<SCRIPT src='x'>a</script >tail",
        "un<closed",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "h string")
    got = [r[0] for r in df.select(html_to_text(F.col("h"))).collect()]
    assert got == [py(c) for c in cases]


def test_authority_blend_tiers_and_per_host_rank(spark):
    # hub-heavy graph: vertex 0 receives from everyone → top tier
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    ranks = pagerank(spark.createDataFrame(edges, "src long, dst long"), iters=5)
    rows = [(h, k) for h in range(0, 10) for k in range(3)]
    frontier = spark.createDataFrame(rows, "host long, priority_key long")
    out = authority_blend(frontier, ranks, n_per_host=2).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    assert all(len(v) == 2 for v in by_host.values())  # top-2 per host
    tiers = {h: v[0].auth_tier for h, v in by_host.items()}
    assert tiers[0] == max(tiers.values())  # the hub outranks everyone
    assert tiers[8] == 0 and tiers[9] == 0  # hosts outside the graph → tier 0
    for v in by_host.values():  # within host: rank follows the key order
        v = sorted(v, key=lambda r: r.host_rank)
        assert v[0].priority_key <= v[1].priority_key


def test_header_dims_real_headers(spark):
    import struct

    from maga_spark.functions.payload import geometry_check

    def png(w, h):
        return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + struct.pack(">II", w, h) + b"\x08\x06\x00\x00"

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h)

    def bmp(w, h):
        # 14-byte file header (BM + size + reserved + offset) then BITMAPINFOHEADER
        return b"BM" + b"\x00" * 8 + b"\x36\x00\x00\x00" + b"\x28\x00\x00\x00" + struct.pack("<ii", w, h)

    rows = [
        ("p_ok", png(640, 480), 640, 480, "png"),
        ("p_bad_w", png(641, 480), 640, 480, "png"),
        ("g_ok", gif(320, 200), 320, 200, "gif"),
        ("b_ok", bmp(100, 50), 100, 50, "bmp"),
        ("b_topdown", bmp(100, -50), 100, 50, "bmp"),  # negative = top-down, |h| must match
        ("b_bad_h", bmp(100, 51), 100, 50, "bmp"),
        ("jpeg", b"\xff\xd8\xff\xe0" + b"\x00" * 22, 10, 10, "jpeg"),  # no fixed-offset dims
        ("trunc", png(9, 9)[:20], 9, 9, "png"),  # incomplete IHDR
        ("mislabel", gif(320, 200), 320, 200, "png"),  # declared png, header gif
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int, fmt string")
    out = {r.image_id: r for r in geometry_check(df).collect()}
    assert (out["p_ok"].hdr_w, out["p_ok"].hdr_h, out["p_ok"].geometry_ok) == (640, 480, True)
    assert out["p_bad_w"].geometry_ok is False and out["p_bad_w"].hdr_w == 641
    assert (out["g_ok"].hdr_w, out["g_ok"].hdr_h, out["g_ok"].geometry_ok) == (320, 200, True)
    assert (out["b_ok"].hdr_w, out["b_ok"].hdr_h, out["b_ok"].geometry_ok) == (100, 50, True)
    assert (out["b_topdown"].hdr_h, out["b_topdown"].geometry_ok) == (50, True)
    assert out["b_bad_h"].geometry_ok is False
    assert out["jpeg"].hdr_w is None and out["jpeg"].geometry_ok is None
    assert out["trunc"].hdr_w is None and out["trunc"].geometry_ok is None
    assert out["mislabel"].geometry_ok is False  # sniffed gif != declared png


def test_header_dims_pure_plan(spark):
    from maga_spark.functions.payload import header_dims

    df = spark.createDataFrame([(b"BMxx",)], "b binary")
    d = header_dims(F.col("b"))
    plan = df.select(*d.values())._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_alignment_gate_verdicts(spark):
    from maga_spark.operators.similarity import alignment_gate

    rows = [
        ("same", [0.5, 0.5, 0.0], [0.5, 0.5, 0.0]),          # cos 1 → aligned
        ("ortho", [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),          # cos 0 → not
        ("anti", [0.5, 0.5, 0.0], [-0.5, -0.5, 0.0]),         # cos -1 → not
        ("close", [1.0, 0.1, 0.0], [1.0, 0.0, 0.0]),          # cos ~0.995 → aligned
        ("mid", [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]),            # cos ~0.707 < 0.8 → not
    ]
    df = spark.createDataFrame(rows, "k string, a array<float>, b array<float>")
    out = {r.k: r for r in alignment_gate(df, tau_num=4, tau_den=5).collect()}
    assert out["same"].aligned and out["close"].aligned
    assert not out["ortho"].aligned and not out["anti"].aligned and not out["mid"].aligned
    assert out["anti"].dot_q < 0
    # integer terms exposed for re-use: |a|² of [0.5,0.5,0] at quant 1000
    assert out["same"].na_q == 500 * 500 * 2


def test_alignment_gate_pure_plan(spark):
    from maga_spark.operators.similarity import alignment_gate

    df = spark.createDataFrame([([1.0], [1.0])], "a array<float>, b array<float>")
    plan = alignment_gate(df)._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_sitemaps_from_robots(spark):
    from maga_spark.operators.robots import sitemaps_from_robots

    txt_a = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a.example/sm.xml\n"
        "sitemap:https://a.example/sm2.xml\n"   # lowercase key, no space
        "\tSITEMAP:\thttps://a.example/sm3.xml.gz\n"  # indented, tab-separated
        "NotSitemap: https://a.example/no.xml\n"      # wrong key must not match
        "# Sitemap: https://a.example/commented.xml\n"  # comment line must not match
    )
    df = spark.createDataFrame(
        [("a", txt_a), ("b", "User-agent: *\nAllow: /\n"), ("c", None)],
        "host string, robots_txt string",
    )
    out = sorted((r.host, r.sitemap_url) for r in sitemaps_from_robots(df).collect())
    assert out == [
        ("a", "https://a.example/sm.xml"),
        ("a", "https://a.example/sm2.xml"),
        ("a", "https://a.example/sm3.xml.gz"),
    ]


def test_extract_anchors_and_profile(spark):
    from maga_spark.operators.links import anchor_text_profile, extract_anchors

    html1 = (
        '<a href="https://t.example/x">Great <b>Article</b></a>'
        '<a href="/rel">rel link</a>'
        '<a href="mailto:a@b.c">skip me</a>'
        '<a href="https://t.example/x"><img src="i.png"/></a>'  # image link: '' text
    )
    html2 = '<A HREF="https://t.example/x">great article indeed</A>'
    df = spark.createDataFrame(
        [("https://s.example/p1", html1), ("https://s.example/p2", html2)],
        "url_canon string, html string",
    )
    anchors = extract_anchors(df).collect()
    by_link = {}
    for r in anchors:
        by_link.setdefault(r.link, []).append(r.anchor_text)
    assert sorted(by_link["https://t.example/x"]) == ["", "Great Article", "great article indeed"]
    assert by_link["https://s.example/rel"] == ["rel link"]
    assert not any("mailto" in k for k in by_link)  # non-fetchable dropped

    prof = {r.link: r for r in anchor_text_profile(extract_anchors(df)).collect()}
    p = prof["https://t.example/x"]
    assert p.n_refs == 3
    # 'great'/'article' tf=2 beat the rest; ties then alphabetic
    assert p.top_terms[:2] == ["article", "great"]


def test_let_binding_semantics(spark):
    """scalar.let_ is semantically the identity wrapper: same values as the
    unbound expression on normal, empty, and NULL inputs (the binding only
    changes HOW OFTEN the bound expression is evaluated)."""
    from maga_spark.functions.scalar import let_
    from maga_spark.operators.text import winnow_fingerprint_portable

    df = spark.createDataFrame([("x",)], "s string")
    got = df.select(
        let_(F.upper(F.col("s")), lambda v: F.concat(v, F.lit("!"), v))
    ).collect()[0][0]
    assert got == "X!X"
    # NULL value propagates through the binding like through the expression
    dfn = spark.createDataFrame([(None,)], "s string")
    assert dfn.select(let_(F.upper(F.col("s")), lambda v: F.length(v))).collect()[0][0] is None

    # winnow edge inputs through the let_-bound implementation
    edge = spark.createDataFrame([(None,), ("",), ("abc",), ("abcde",), ("abcdefgh",)], "t string")
    rows = [r[0] for r in edge.select(winnow_fingerprint_portable(F.col("t"))).collect()]
    assert rows[0] == [] and rows[1] == []   # NULL / empty text → empty set
    assert rows[2] == []                     # < k chars → empty
    assert len(rows[3]) == 1                 # exactly one k-gram → single min
    assert len(rows[4]) >= 1


def test_bm25_ranking_sanity(spark):
    import math

    from maga_spark.operators.text import bm25_scores

    docs = [
        (1, "apple banana apple apple"),        # tf(apple)=3, short
        (2, "apple " + "filler " * 40),          # tf=1, long → length-normalized down
        (3, "banana banana cherry"),
        (4, "cherry cherry cherry cherry"),
        (5, "nothing relevant here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_scores(df, ["apple", "banana"], top_k=10).collect()
    ids = [r.doc_id for r in out]
    assert 5 not in ids                      # no query term → no row
    assert ids[0] == 1                       # high-tf short doc wins
    by = {r.doc_id: r for r in out}
    assert by[1].n_hit_terms == 2 and by[2].n_hit_terms == 1
    assert by[1].score_micro > by[2].score_micro  # tf + length norm dominate
    # python oracle for one cell: doc 2's single 'apple' gain
    N, df_apple = 5, 2
    dls = {1: 4, 2: 41, 3: 3, 4: 4, 5: 5}
    avg = sum(dls.values()) / 5
    idf = math.log(1 + (N - df_apple + 0.5) / (df_apple + 0.5))
    gain = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * dls[2] / avg))
    assert by[2].score_micro == round(gain * 1e6)

    with __import__("pytest").raises(ValueError):
        bm25_scores(df, [])


def test_url_template_and_trap_detection(spark):
    from maga_spark.operators.links import detect_traps, url_template

    df = spark.createDataFrame(
        [("https://a.example/Item/123?id=ABC9F3310D2E&page=7",),
         ("https://a.example/item/999?id=77ddea10c001&page=2",)],
        "u string",
    )
    ts = {r[0] for r in df.select(url_template(F.col("u"))).collect()}
    assert ts == {"https://a.example/item/N?id=V&page=V"}  # one family

    # calendar trap: 30 URLs, 1 content; healthy: 30 URLs, 30 contents
    rows = [(f"https://c.example/d?d=2026-01-{i:02d}", "shell") for i in range(1, 31)]
    rows += [(f"https://n.example/a/{i}", f"art-{i}") for i in range(30)]
    fdf = spark.createDataFrame(rows, "url string, content_hash string")
    out = {r.template: r for r in detect_traps(fdf, min_urls=20, max_content_ratio=4).collect()}
    trap = out["https://c.example/d?d=V"]
    assert (trap.n_urls, trap.n_content, trap.is_trap) == (30, 1, True)
    healthy = out["https://n.example/a/N"]
    assert (healthy.n_urls, healthy.n_content, healthy.is_trap) == (30, 30, False)


def test_kmv_distinct_estimate(spark):
    import pytest as _pt

    from maga_spark.operators.sampling import kmv_distinct_estimate

    # fewer distincts than k → exact branch
    small = spark.createDataFrame([(f"v{i % 10}",) for i in range(100)], "v string")
    r = kmv_distinct_estimate(small, "v", k=64).collect()[0]
    assert (r.n_mins, r.est_distinct) == (10, 10)

    # 5000 distincts, k=256 → estimate within ~4 standard errors (1/16)
    big = spark.createDataFrame([(f"u{i}",) for i in range(5000)], "v string")
    r = kmv_distinct_estimate(big, "v", k=256).collect()[0]
    assert r.n_mins == 256
    assert abs(r.est_distinct - 5000) / 5000 < 0.25
    # duplicates must not move the sketch: same stream repeated 3x
    trip = big.unionAll(big).unionAll(big)
    r3 = kmv_distinct_estimate(trip, "v", k=256).collect()[0]
    assert (r3.kth_min, r3.est_distinct) == (r.kth_min, r.est_distinct)

    with _pt.raises(ValueError):
        kmv_distinct_estimate(big, "v", k=1)


def test_weighted_sample_matches_manual_hash_math(spark):
    """Per-row Bernoulli by integer hash threshold: verdicts must equal a
    hand computation of the same md5-derived algebra, w=0 never picks,
    and raising a weight is subset-monotone (never un-picks)."""
    import pytest as _pt

    from maga_spark.operators.sampling import _MODULUS, weighted_sample

    rows = [(i, (i * 97) % 1200) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, score long")
    w = F.least(F.col("score"), F.lit(1000))
    got = {
        r.doc_id: r.picked
        for r in weighted_sample(df, w, 1000, out_col="picked").collect()
    }

    unit = _MODULUS // 1000
    for i, score in rows:
        h = int(hashlib.md5(f"wsmp:{i}".encode()).hexdigest()[:15], 16)
        assert got[i] == (h < unit * min(score, 1000)), i
    assert any(got.values()) and not all(got.values())

    # w = 0 rows can never be picked
    zero = weighted_sample(df, F.lit(0), 1000).count()
    assert zero == 0

    # subset-monotone: +100 weight only ever adds rows
    lo = {r.doc_id for r in weighted_sample(df, w, 2000).collect()}
    hi = {r.doc_id for r in weighted_sample(df, w + F.lit(100), 2000).collect()}
    assert lo <= hi

    with _pt.raises(ValueError):
        weighted_sample(df, w, 0)

    # pure per-row filter: no shuffle, no Python in the plan
    plan = (
        weighted_sample(df, w, 1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_mixture_rates_hand_computed(spark):
    from maga_spark.operators.sampling import mixture_rates

    stats = spark.createDataFrame(
        [("a", 1000, 1), ("b", 1000, 3), ("tiny", 10, 4), ("empty", 0, 2)],
        "source string, tokens long, weight long",
    )
    out = {r.source: r for r in mixture_rates(stats, 2000).collect()}
    # Σw = 10; desired: a=200, b=600, tiny=800, empty=400
    assert (out["a"].desired_tokens, out["a"].rate_ppm) == (200, 200_000)
    assert out["a"].expected_tokens == 200
    assert not out["a"].undersupplied
    assert (out["b"].desired_tokens, out["b"].rate_ppm) == (600, 600_000)
    # tiny cannot fill its slice: rate caps at 1.0 and the flag trips
    assert (out["tiny"].rate_ppm, out["tiny"].expected_tokens) == (1_000_000, 10)
    assert out["tiny"].undersupplied
    # empty source: rate 0, no div-by-zero, still undersupplied
    assert (out["empty"].rate_ppm, out["empty"].expected_tokens) == (0, 0)
    assert out["empty"].undersupplied


def test_mixture_rates_overflow_safe_expected(spark):
    from maga_spark.operators.sampling import mixture_rates

    # tokens far beyond the naive tokens·10^6 int64 limit
    big = 4_000_000_000_000_000  # 4e15
    stats = spark.createDataFrame(
        [("x", big, 1)], "source string, tokens long, weight long"
    )
    out = mixture_rates(stats, 1 << 42).collect()[0]
    rate = ((1 << 42) * 1_000_000) // big
    assert out.rate_ppm == rate
    assert out.expected_tokens == (big // 1_000_000) * rate + ((big % 1_000_000) * rate) // 1_000_000


def test_mixture_rates_rejects_bad_budget(spark):
    import pytest as _pytest

    from maga_spark.operators.sampling import mixture_rates

    stats = spark.createDataFrame([("a", 1, 1)], "source string, tokens long, weight long")
    with _pytest.raises(ValueError):
        mixture_rates(stats, -1)
    with _pytest.raises(ValueError):
        mixture_rates(stats, (1 << 42) + 1)
