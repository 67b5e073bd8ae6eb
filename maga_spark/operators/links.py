"""Link extraction — the URL-crawl discovery channel.

The reference's discovery fan-in is DHT gossip: compact node blobs exploded
from responses and announce edges (maga/crawler.py:121-126,156-163 →
SURVEY.md O-13/O-26/O-39). A URL crawler's equivalent is extracting
``href``s from fetched pages and resolving them against the page URL. This
module does both as PURE expressions — regexp_extract_all for the scan,
string cases for RFC 3986 §5.2 reference resolution, and a fold
(``aggregate`` over the split segments) for §5.2.4 remove_dot_segments —
so link explosion runs inside whole-stage codegen on the 10^10-row fetch
output, no Python in the loop. Discovered links feed the same absorb →
anti-join-seen → schedule path as every other channel (O-39).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from maga_spark.functions.scalar import url_canonicalize

# href attribute values in single or double quotes, case-insensitive
HREF_RX = r"""(?i)href\s*=\s*["']([^"']*)["']"""

# schemes we never enqueue (non-fetchable or non-HTTP)
_SKIP_RX = r"(?i)^(javascript|mailto|tel|data|ftp):"


def remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 as a pure-expression fold: split on '/', push
    normal segments, pop on '..', drop on '.' — the output buffer is the
    fold accumulator. Empty inner segments ('//' runs) are preserved like
    the RFC's output of merge (they are distinct path segments); a
    trailing '/' survives via the trailing empty segment."""
    segs = F.split(path, "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(s == "..", F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))))
        .otherwise(F.concat(acc, F.array(s))),
    )
    # leading empty segment (absolute path) is re-added by the join below
    return F.concat(F.lit("/"), F.array_join(F.filter(
        folded, lambda s, i: (i > 0) | (s != F.lit(""))
    ), "/"))


def resolve_href(base_canon: Column, href: Column) -> Column:
    """RFC 3986 §5.2 reference resolution against a CANONICAL base URL,
    restricted to the fetchable subset: absolute http(s) passes through,
    protocol-relative inherits the base scheme, root-relative and
    path-relative merge with the base (dot segments removed); fragments,
    empty hrefs, and non-fetchable schemes (mailto/javascript/...) → NULL.
    The result is re-canonicalized, so the output is idempotent under the
    engine's identity rules (O-14)."""
    h = F.trim(href)
    scheme = F.regexp_extract(base_canon, r"^([a-z0-9+.\-]+)://", 1)
    origin = F.regexp_extract(base_canon, r"^([a-z0-9+.\-]+://[^/?#]+)", 1)
    base_path = F.regexp_extract(base_canon, r"^[a-z0-9+.\-]+://[^/?#]+([^?#]*)", 1)
    # directory of the base path ('' → '/')
    base_dir = F.regexp_replace(
        F.when(base_path == "", F.lit("/")).otherwise(base_path), r"[^/]*$", ""
    )
    # dot-segment removal applies to the PATH only (RFC 3986 §5.2.2):
    # split the reference into path and query, drop any fragment
    hpath = F.regexp_extract(h, r"^([^?#]*)", 1)
    hquery = F.regexp_extract(h, r"(\?[^#]*)", 1)
    resolved = (
        F.when(h.rlike(_SKIP_RX), F.lit(None).cast("string"))
        .when((h == "") | h.startswith("#"), F.lit(None).cast("string"))
        .when(h.rlike(r"(?i)^https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, remove_dot_segments(hpath), hquery))
        .otherwise(
            F.concat(origin, remove_dot_segments(F.concat(base_dir, hpath)), hquery)
        )
    )
    return url_canonicalize(resolved)


def extract_links(
    pages: DataFrame,
    html_col: str = "html",
    base_col: str = "url_canon",
    out_col: str = "link",
) -> DataFrame:
    """(page, html) → one row per distinct resolved link: regexp scan →
    explode → resolve → canonicalize → drop nulls. The explode is the only
    row-multiplying step and feeds straight into the frontier absorb's
    dedup/anti-join, mirroring the compact-node explode O-13."""
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(HREF_RX), 1)
    return (
        pages.select(F.col(base_col), F.explode(hrefs).alias("_href"))
        .withColumn(out_col, resolve_href(F.col(base_col), F.col("_href")))
        .filter(F.col(out_col).isNotNull())
        .select(base_col, out_col)
        .distinct()
    )


def urls_from_links(links: DataFrame, out_col: str = "url") -> DataFrame:
    """Bridge extracted links into the crawl engine's absorb input (one
    ``url`` column — the same contract as streaming.ingest's
    urls_from_announces / urls_from_nodes): fetched pages' hrefs become
    frontier candidates and flow through canonicalize → seen anti-join →
    robots → politeness like every other discovery channel (O-39)."""
    return links.select(F.col("link").alias(out_col))
