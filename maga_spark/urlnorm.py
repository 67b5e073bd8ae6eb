"""Python mirror of the URL canonicalization spec (maga_spark.functions.
scalar.url_canonicalize). Used by the reference simulator and the fixture
generator — the Spark engine never calls this (it uses the codegen'd column
expression); tests assert the two agree on every fixture URL.

Reference analog: ``proper_infohash`` (maga/utils.py:7-11) — idempotent,
total canonical identity; malformed input dropped (maga/crawler.py:33-36).
"""

from __future__ import annotations

import re

URL_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/:?#]+)(?::([0-9]+))?([^?#]*)(\?[^#]*)?(?:#.*)?$"
)

_DEFAULT_PORTS = {("http", "80"), ("https", "443")}


def canonicalize(url: str) -> str | None:
    """Lowercase scheme+host, drop fragment + default port, strip trailing
    slashes; None for malformed input.

    C0 control bytes are malformed by definition (RFC 3986 excludes them
    everywhere): this also protects the engine's single-pass ``\\x01``
    group-separator trick (scalar._url_groups) — both sides agree such
    input is NULL."""
    if re.search(r"[\x00-\x1f]", url):
        return None
    m = URL_RE.match(url)
    if m is None:
        return None
    scheme, host, port, path, query = m.groups()
    scheme = scheme.lower()
    host = host.lower()
    port_part = ""
    if port and (scheme, port) not in _DEFAULT_PORTS:
        port_part = f":{port}"
    path = re.sub(r"/+$", "", path or "")
    return f"{scheme}://{host}{port_part}{path}{query or ''}"


def host_of(url_canon: str) -> str:
    m = re.match(r"^[a-z0-9+.\-]+://([^/?#]+)", url_canon)
    return m.group(1) if m else ""


def path_of(url_canon: str) -> str:
    m = re.match(r"^[a-z0-9+.\-]+://[^/?#]+([^?#]*)", url_canon)
    return m.group(1) if m else ""
