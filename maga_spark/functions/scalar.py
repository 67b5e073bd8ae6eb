"""Scalar operator core — SURVEY.md §2.2/§2.7 re-expressed as built-in
Spark column expressions (zero Python in the hot path; everything here
compiles into whole-stage codegen).

Each function cites the reference behavior it reproduces (file:line into
/root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared URL grammar (engine + simulator + oracle must agree — the Python
# mirror lives in maga_spark.urlnorm). Groups: 1=scheme 2=host 3=port
# 4=path 5=query; fragment is dropped (non-capturing).
URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/:?#]+)(?::([0-9]+))?([^?#]*)(\?[^#]*)?(?:#.*)?$"


def canonical_hex(col: Column | str) -> Column:
    """O-14/O-41: bytes → UPPER hex — the reference's identity canonicalizer
    ``proper_infohash`` (maga/utils.py:7-11). Idempotent on already-hex input
    when applied to strings (upper of hex string)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.hex(c))


def unhex_upper(col: Column | str) -> Column:
    """O-42: hex string → bytes (maga/downloader.py:44-46)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unhex(F.upper(c))


def token_of(url_canon: Column | str) -> Column:
    """O-15: opaque 2-char token = prefix of the canonical key
    (maga/crawler.py:135)."""
    c = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.substring(c, 1, 2)


def splice_last_byte(nid: Column, self_id: Column) -> Column:
    """O-16: proximity spoof — replace the last byte of a 20-byte id with our
    own last byte (maga/crawler.py:198-201). Works on BinaryType."""
    return F.concat(F.substring(nid, 1, 19), F.substring(self_id, 20, 1))


def coalesce_implied_port(implied_port: Column, src_port: Column, port: Column) -> Column:
    """O-17: BEP-5 implied-port rule (maga/crawler.py:156-159)."""
    return F.when(implied_port.isNotNull() & (implied_port != 0), src_port).otherwise(port)


def _byte_at(bin_col: Column, pos: int) -> Column:
    # one byte of a binary column as int, via hex→base-10 conv (pure codegen)
    return F.conv(F.hex(F.substring(bin_col, pos, 1)), 16, 10).cast("int")


def inet_ntoa(bin4: Column) -> Column:
    """O-43: 4 bytes → dotted-quad string (maga/utils.py:25), no UDF."""
    return F.concat_ws(
        ".",
        _byte_at(bin4, 1).cast("string"),
        _byte_at(bin4, 2).cast("string"),
        _byte_at(bin4, 3).cast("string"),
        _byte_at(bin4, 4).cast("string"),
    )


def be_u16(bin2: Column) -> Column:
    """O-44: big-endian uint16 from 2 bytes (maga/utils.py:26) —
    ``unpack('!H', b)`` as hex→int conversion."""
    return F.conv(F.hex(F.substring(bin2, 1, 2)), 16, 10).cast("int")


def xor_dist(a: Column, b: Column) -> Column:
    """O-40: Kademlia XOR distance on int64 keys — the priority score.
    Reference form: random find_node targets (maga/crawler.py:203-205) +
    node-id splice (maga/crawler.py:198-201); here a deterministic signed-64
    XOR (both engine and simulator compare signed — any consistent total
    order gives bit-exact parity, SURVEY.md §7.6)."""
    return a.bitwiseXOR(b)


def url_canonicalize(url: Column | str) -> Column:
    """★ URL canonicalization — the crawl generalization of
    ``proper_infohash`` (maga/utils.py:7-11): idempotent, total (malformed →
    NULL, mirroring the bare-except drop at maga/crawler.py:33-36).

    Rules: lowercase scheme+host; drop fragment; drop default port (http:80 /
    https:443); strip trailing slashes from the path; keep query verbatim.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, URL_RE, 1))
    host = F.lower(F.regexp_extract(u, URL_RE, 2))
    port = F.regexp_extract(u, URL_RE, 3)
    path = F.regexp_replace(F.regexp_extract(u, URL_RE, 4), "/+$", "")
    query = F.regexp_extract(u, URL_RE, 5)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port == "") | default_port, "").otherwise(F.concat(F.lit(":"), port))
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, query)
    return F.when(u.rlike(URL_RE), canon).otherwise(F.lit(None).cast("string"))


def url_host(url_canon: Column | str) -> Column:
    """Politeness key: host (with non-default port) of a canonical URL."""
    u = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.regexp_extract(u, r"^[a-z0-9+.\-]+://([^/?#]+)", 1)


def url_path(url_canon: Column | str) -> Column:
    """Path component of a canonical URL ('' when absent) — robots gate key
    (prefix match, analog of the handshake gate maga/downloader.py:71-81)."""
    u = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.regexp_extract(u, r"^[a-z0-9+.\-]+://[^/?#]+([^?#]*)", 1)
