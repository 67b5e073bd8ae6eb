"""Link extraction + RFC 3986 resolution + robots Crawl-delay."""

from __future__ import annotations

from urllib.parse import urldefrag, urljoin

import pytest
from pyspark.sql import functions as F

from maga_spark.operators.links import extract_links, resolve_href, urls_from_links
from maga_spark.operators.robots import (
    parse_crawl_delays,
    parse_robots_delay,
    rates_from_delays,
)
from maga_spark.urlnorm import canonicalize

BASES = [
    "http://site.test/a/b/page.html",
    "https://x.example/dir/sub/",
    "http://h.test",
]
HREFS = [
    "http://other.test/abs",
    "HTTPS://UPPER.test/Path",
    "//cdn.test/lib.js",
    "/rooted/x",
    "/rooted/../y",
    "rel.html",
    "../up.html",
    "../../far.html",
    "./same.html",
    "sub/./deep/../d.html",
    "q.html?k=v",
    "/q2?a=/..",
    "#frag",
    "",
    "mailto:a@b.test",
    "javascript:void(0)",
    "rel.html#frag",
    # query-only references keep the base PATH (RFC 3986 §5.3), not the dir
    "?q=1",
    "?a=1&b=2#frag",
    # unknown fetchable-looking schemes must yield NULL, never a fabricated
    # https://host/dir/file:///... frontier key (ADVICE r4)
    "file:///etc/passwd",
    "ftps://x.test/y",
    "ws://x.test/sock",
    "urn:isbn:0451450523",
    # a colon AFTER the first '/' does not make a scheme — still relative
    "dir/a:b",
]
SKIP_SCHEMES = ("mailto", "javascript", "tel", "data", "ftp")
UNKNOWN_SCHEMES = ("file", "ftps", "ws", "urn")


def test_resolve_href_matches_urljoin(spark):
    """Every (base, href) pair must resolve exactly as stdlib urljoin (+
    fragment drop + engine canonicalization); non-fetchable schemes,
    empty hrefs and bare fragments must resolve to NULL."""
    rows = [(b, h) for b in BASES for h in HREFS]
    df = spark.createDataFrame(rows, "base string, href string")
    got = {
        (r["base"], r["href"]): r["out"]
        for r in df.withColumn("out", resolve_href(F.col("base"), F.col("href"))).collect()
    }
    for b, h in rows:
        hs = h.strip()
        scheme = hs.split(":", 1)[0].lower() if ":" in hs.split("/", 1)[0] else None
        if (
            hs == ""
            or hs.startswith("#")
            or scheme in SKIP_SCHEMES
            or scheme in UNKNOWN_SCHEMES
        ):
            want = None
        else:
            want = canonicalize(urldefrag(urljoin(b, h))[0])
        assert got[(b, h)] == want, (b, h)


def test_extract_links_end_to_end(spark):
    """Scan finds single/double-quoted and case-varied hrefs, resolves the
    fetchable ones, drops fragment/mailto, dedups — and the whole plan is
    pure expressions."""
    pages = spark.createDataFrame(
        [
            (
                "http://site.test/a/p.html",
                '<a href="/x">1</a> <A HREF=\'rel.html\'>2</A> <a href="#f">no</a>'
                '<a href="//cdn.test/l.js">3</a> <a href="mailto:z@y">no</a>'
                '<a href="/x">dup</a>',
            )
        ],
        "url_canon string, html string",
    )
    out = sorted(r["link"] for r in extract_links(pages).collect())
    assert out == sorted(
        ["http://site.test/x", "http://site.test/a/rel.html", "http://cdn.test/l.js"]
    )
    plan = extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_links_to_frontier_absorb(spark, tmp_path):
    """Discovered links are a first-class discovery channel: page hrefs →
    extract_links → urls_from_links → engine absorb → scheduled, exactly
    like the announce/node channels (O-39)."""
    from maga_spark.crawlspec import CrawlConfig
    from maga_spark.plans.frontier import CrawlEngine
    from maga_spark.sources.fixtures import generate

    pages = spark.createDataFrame(
        [
            ("http://h0.test/index.html",
             '<a href="/a">.</a><a href="/b">.</a><a href="http://h1.test/c">.</a>'),
            ("http://h1.test/index.html",
             '<a href="/a">.</a><a href="#skip">.</a>'),  # /a on h1 != /a on h0
        ],
        "url_canon string, html string",
    )
    links = extract_links(pages)
    assert links.count() == 4
    fix = str(tmp_path / "fix")
    generate(fix, n_urls=50, n_seeds=4)
    eng = CrawlEngine(spark, fix, CrawlConfig(epochs=1, global_k=16))
    eng._pending = urls_from_links(links)
    res = eng.run(epochs=1)
    m = res.metrics[0]
    assert m["enqueued"] == 4 and m["scheduled"] > 0
    assert res.seen_count == 4


ROBOTS_CASES = [
    # specific group beats wildcard
    ("User-agent: magaspark\nCrawl-delay: 4\nUser-agent: *\nCrawl-delay: 99", 4.0),
    # wildcard applies when no specific group
    ("User-agent: *\n# maintenance\nCrawl-delay: 2.5", 2.5),
    # invalid value ignored -> unset
    ("User-agent: magaspark\nCrawl-delay: fast\nDisallow: /x", None),
    # negative ignored
    ("User-agent: magaspark\nCrawl-delay: -3", None),
    # merged specific groups: min wins (group 1 serves both sinks)
    (
        "User-agent: magaspark\nUser-agent: *\nCrawl-delay: 3\n"
        "User-agent: magaspark\nCrawl-delay: 7",
        3.0,
    ),
    # case-insensitive agent + directive
    ("USER-AGENT: MagaSpark\nCRAWL-DELAY: 6", 6.0),
    ("", None),
]


@pytest.mark.parametrize("txt,want", ROBOTS_CASES)
def test_parse_robots_delay(txt, want):
    assert parse_robots_delay(txt, "magaspark") == want


def test_parse_robots_delay_matches_stdlib():
    """On single-group files (no merge subtleties), the parser must agree
    with urllib.robotparser's crawl_delay."""
    import urllib.robotparser as rp

    for txt, agent in [
        ("User-agent: magaspark\nCrawl-delay: 4", "magaspark"),
        ("User-agent: *\nCrawl-delay: 2", "magaspark"),
        ("User-agent: other\nCrawl-delay: 9", "magaspark"),
    ]:
        p = rp.RobotFileParser()
        p.parse(txt.splitlines())
        std = p.crawl_delay(agent)
        got = parse_robots_delay(txt, agent)
        assert (got is None and std is None) or float(std) == got, txt


def test_rates_from_delays(spark):
    """Delay folds into the token rate as min(configured, 1/delay) with a
    floor; hosts without a delay keep their configured rate."""
    pol = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5), ("c", 0.5), ("d", 0.5)], "host string, rate double"
    )
    robots = spark.createDataFrame(
        [
            ("a", "User-agent: *\nCrawl-delay: 4"),  # 1/4 < 0.5 -> 0.25
            ("b", "User-agent: *\nCrawl-delay: 1"),  # 1/1 > 0.5 -> keep 0.5
            ("c", "User-agent: *\nCrawl-delay: 1e9"),  # floored at min_rate
        ],
        "host string, robots_txt string",
    )
    delays = parse_crawl_delays(robots)
    out = {r["host"]: r["rate"] for r in rates_from_delays(pol, delays).collect()}
    assert out == {"a": 0.25, "b": 0.5, "c": 1e-3, "d": 0.5}


def test_registrable_domain_psl_semantics(spark):
    from maga_spark.operators.links import registrable_domain

    cases = [
        ("bbc.co.uk", "bbc.co.uk"),          # listed 2-label suffix
        ("news.bbc.co.uk", "bbc.co.uk"),     # deep subdomain collapses
        ("co.uk", None),                      # the suffix itself: nothing registered
        ("a.blogspot.com", "a.blogspot.com"),  # private-domain style suffix
        ("b.a.blogspot.com", "a.blogspot.com"),
        ("www.site.com", "site.com"),
        ("foo.unknowntld", "foo.unknowntld"),  # implicit * rule
        ("localhost", None),
        ("Example.COM.", "example.com"),      # case + FQDN trailing dot
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r.rd
        for r in df.select(registrable_domain(F.col("host")).alias("rd")).collect()
    ]
    assert got == [want for _, want in cases]


def test_registrable_domain_rejects_empty_suffixes(spark):
    import pytest as _pytest

    from maga_spark.operators.links import registrable_domain

    with _pytest.raises(ValueError):
        registrable_domain(F.col("x"), suffixes=())
