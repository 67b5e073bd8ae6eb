"""RFC 9309 robots operator: parser vs stdlib urllib.robotparser on the
prefix subset, wildcard/anchor semantics vs the RFC 9309 §2.2.3 (Google
parser) examples, and the pure-expression longest-match gate end-to-end."""

from __future__ import annotations

import re
import urllib.robotparser
from io import StringIO

import pytest

from maga_spark.operators.robots import (  # noqa: E402
    parse_robots,
    parse_robots_text,
    pattern_to_rx,
    robots_gate,
)


def _match(pattern: str, path: str) -> bool:
    return re.search(pattern_to_rx(pattern), path) is not None


# -- pattern_to_rx: the RFC 9309 / Google documented example matrix --------

WILDCARD_CASES = [
    ("/fish", "/fish", True),
    ("/fish", "/fish.html", True),
    ("/fish", "/fishheads/yummy.html", True),
    ("/fish", "/Fish.asp", False),
    ("/fish", "/catfish", False),
    ("/fish*", "/fish.html", True),
    ("/fish*", "/desert/fish", False),
    ("/fish/", "/fish/", True),
    ("/fish/", "/fish/salmon.htm", True),
    ("/fish/", "/fish", False),
    ("/*.php", "/index.php", True),
    ("/*.php", "/folder/filename.php", True),
    ("/*.php", "/folder/any.php.file.html", True),
    ("/*.php", "/", False),
    ("/*.php", "/windows.PHP", False),
    ("/*.php$", "/filename.php", True),
    ("/*.php$", "/filename.php?parameters", False),
    ("/*.php$", "/filename.php5", False),
    ("/fish*.php", "/fish.php", True),
    ("/fish*.php", "/fishheads/catfish.php?parameters", True),
    ("/fish*.php", "/Fish.PHP", False),
    # regex metachars in paths are literals
    ("/a(b)+c?", "/a(b)+c?", True),
    ("/a(b)+c?", "/abbc", False),
    # inner $ is literal, only trailing $ anchors
    ("/p$q", "/p$q/r", True),
]


@pytest.mark.parametrize("pattern,path,want", WILDCARD_CASES)
def test_pattern_to_rx_rfc_examples(pattern, path, want):
    assert _match(pattern, path) is want, (pattern, path)


# -- parser vs urllib.robotparser on the prefix-only subset ----------------

# NOTE: Allow lines precede their Disallow prefixes so stdlib's FIRST-match
# (1994 spec) and RFC 9309's LONGEST-match agree on this file — the parity
# test below compares against urllib.robotparser, which never did longest-
# match; the RFC-only orderings are pinned in test_rfc_tie_least_restrictive.
PREFIX_ROBOTS = """
# sample robots.txt
User-agent: magaspark
Allow: /private/pub
Disallow: /private/
Disallow: /tmp

User-agent: *
Disallow: /
"""

PATH_BATTERY = [
    "/", "/index.html", "/private/", "/private/x", "/private/pub",
    "/private/pub/deep", "/tmp", "/tmp/x", "/tmpfile", "/other",
]


def _stdlib_allowed(txt: str, agent: str, path: str) -> bool:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(StringIO(txt).read().splitlines())
    return rp.can_fetch(agent, f"http://h{path}")


def _rules_allowed(rules: list[tuple[str, str, int, bool]], path: str) -> bool:
    best = None
    for _p, rx, spec, allow in rules:
        if re.search(rx, path):
            k = (spec, allow)
            if best is None or k > best:
                best = k
    return True if best is None else best[1]


@pytest.mark.parametrize("path", PATH_BATTERY)
def test_parser_matches_stdlib_on_prefix_rules(path):
    rules = parse_robots_text(PREFIX_ROBOTS, "magaspark")
    assert _rules_allowed(rules, path) == _stdlib_allowed(PREFIX_ROBOTS, "magaspark", path), path


def test_parser_group_semantics():
    # wildcard group applies only when no specific group matches
    txt = "User-agent: *\nDisallow: /\n"
    assert _rules_allowed(parse_robots_text(txt, "magaspark"), "/x") is False
    # specific group shadows the wildcard entirely
    rules = parse_robots_text(PREFIX_ROBOTS, "magaspark")
    assert all(p != "/" for p, _rx, _s, _a in rules)
    # two groups for the same agent MERGE (RFC 9309 §2.2.1)
    txt2 = "User-agent: a\nDisallow: /x\n\nUser-agent: a\nDisallow: /y\n"
    assert sorted(p for p, *_ in parse_robots_text(txt2, "a")) == ["/x", "/y"]
    # consecutive user-agent lines share the following rules
    txt3 = "User-agent: a\nUser-agent: b\nDisallow: /z\n"
    assert [p for p, *_ in parse_robots_text(txt3, "b")] == ["/z"]
    # empty Disallow: = allow-all (no rule); comments stripped
    txt4 = "User-agent: a\nDisallow:  # nothing\n"
    assert parse_robots_text(txt4, "a") == []
    # agent match is case-insensitive
    assert [p for p, *_ in parse_robots_text("User-Agent: MagaSpark\nDisallow: /q\n", "magaspark")] == ["/q"]


def test_rfc_tie_least_restrictive():
    # equal specificity: allow wins (RFC 9309 §2.2.2)
    txt = "User-agent: a\nAllow: /page\nDisallow: /page\n"
    assert _rules_allowed(parse_robots_text(txt, "a"), "/page") is True
    # longest match wins regardless of rule order
    txt2 = "User-agent: a\nDisallow: /\nAllow: /p\n"
    rules2 = parse_robots_text(txt2, "a")
    assert _rules_allowed(rules2, "/page") is True
    assert _rules_allowed(rules2, "/other") is False


# -- Spark end-to-end: parse (Arrow) → gate (pure expressions) -------------

def test_robots_gate_end_to_end(spark):
    robots = spark.createDataFrame(
        [
            ("h1", PREFIX_ROBOTS),
            ("h2", "User-agent: *\nDisallow: /*.php$\nAllow: /\n"),
            ("h3", None),  # no robots.txt fetched → allow-all
        ],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots, agent="magaspark")
    urls = spark.createDataFrame(
        [
            ("h1", "/private/x"),      # disallow /private/
            ("h1", "/private/pub/a"),  # allow /private/pub beats /private/
            ("h1", "/ok"),             # no match → allowed
            ("h2", "/index.php"),      # trailing-$ disallow
            ("h2", "/index.php?x=1"),  # NOT anchored-match → allow rule wins
            ("h3", "/anything"),       # host with no rules
            ("h4", "/unlisted"),       # host absent from rules table
        ],
        "host string, path string",
    )
    out = {
        (r["host"], r["path"]): r["allowed"]
        for r in robots_gate(urls, rules).collect()
    }
    assert out == {
        ("h1", "/private/x"): False,
        ("h1", "/private/pub/a"): True,
        ("h1", "/ok"): True,
        ("h2", "/index.php"): False,
        ("h2", "/index.php?x=1"): True,
        ("h3", "/anything"): True,
        ("h4", "/unlisted"): True,
    }
    # the gate itself (rules already a table) is the hot path: pure expressions
    plan = robots_gate(urls, rules.persist()).filter("allowed")
    s = plan._jdf.queryExecution().executedPlan().toString()
    # parse_robots is Arrow (host-cardinality, cold path); the gate adds no
    # Python of its own — assert by gating a PARQUET-shaped pure rules frame
    from pyspark.sql import functions as F

    pure_rules = spark.range(3).select(
        F.concat(F.lit("h"), F.col("id")).alias("host"),
        F.lit("/x").alias("pattern"),
        F.lit("^/x").alias("rx"),
        F.lit(2).alias("spec"),
        F.lit(False).alias("allow"),
    )
    pure = robots_gate(urls, pure_rules)
    ps = pure._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in ps and "ArrowEvalPython" not in ps
    assert "CartesianProduct" not in ps
