"""WARC split/parse + CDX index (operators/warc.py, SURVEY §2.10 X-43/X-44).

The split must honor Content-Length (a payload may embed the literal bytes
``WARC/1.0\\r\\n`` — any delimiter-based split is wrong by construction),
surface unparseable tails as ``truncated`` rows instead of dropping them,
and the whole family must stay pure-expression (no EvalPython in any plan).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from maga_spark.operators.warc import (
    cdx_index,
    parse_warc_records,
    split_warc,
    surt_key,
    warc_record_offsets,
)


def _rec(wtype: str, uri: str | None, payload: str, date: str = "2024-03-05T12:34:56Z") -> str:
    hdr = f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Date: {date}\r\n"
    if uri:
        hdr += f"WARC-Target-URI: {uri}\r\n"
    hdr += f"Content-Length: {len(payload)}\r\n\r\n"
    return hdr + payload + "\r\n\r\n"


def _http(status: str, ctype: str, body: str) -> str:
    return f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\nServer: x\r\n\r\n{body}"


TRICKY_BODY = "<html>embedded\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record</html>"


@pytest.fixture(scope="module")
def files(spark):
    f1 = (
        _rec("warcinfo", None, "software: maga_spark")
        + _rec("request", "https://www.Example.COM:443/a?b=1", "GET /a?b=1 HTTP/1.1\r\n\r\n")
        + _rec("response", "https://www.Example.COM:443/a?b=1", _http("200 OK", "text/html; charset=utf-8", TRICKY_BODY))
    )
    f2 = _rec("response", "http://sub.test.org/x", _http("404 Not Found", "text/plain", "nope"))
    # f3: valid first record, then garbage → record 1 parses, file flags truncated
    f3 = _rec("response", "http://t.example/ok", _http("200 OK", "text/plain", "fine")) + "GARBAGE TAIL"
    return spark.createDataFrame(
        [("f1", f1), ("f2", f2), ("f3", f3), ("f4", "not a warc file")],
        "file_id string, data string",
    )


def test_split_honors_content_length(spark, files):
    rows = split_warc(files).filter(F.col("file_id") == "f1").orderBy("rec_no").collect()
    # the response payload EMBEDS 'WARC/1.0\r\n' — a delimiter split would
    # see 4+ records; the length-prefixed chase sees exactly 3
    assert [r.rec_no for r in rows] == [1, 2, 3]
    assert all(not r.truncated for r in rows)
    # offsets tile the file exactly: each record starts where the previous ends
    data = files.filter("file_id = 'f1'").collect()[0].data
    pos = 1
    for r in rows:
        assert r.rec_offset == pos
        assert data[r.rec_offset - 1 : r.rec_offset - 1 + r.rec_len] == r.record
        assert r.record.startswith("WARC/1.0\r\n")
        pos += r.rec_len
    assert pos == len(data) + 1


def test_split_truncation_and_dead_letter(spark, files):
    rows = {r.file_id: r for r in split_warc(files).filter("file_id in ('f3','f4')").collect()}
    # f3: the good record still comes out, flagged truncated (garbage tail)
    assert rows["f3"].rec_no == 1 and rows["f3"].truncated
    assert rows["f3"].record.startswith("WARC/1.0")
    # f4: not WARC at all → one all-NULL dead-letter row, never silently dropped
    assert rows["f4"].rec_no is None and rows["f4"].record is None
    assert rows["f4"].truncated


def test_split_flags_torn_tail_and_null_data(spark):
    """A Content-Length that overshoots the data (torn archive tail) must
    flag truncated AND report the record length that EXISTS; NULL data is
    a dead-letter, never a silently-clean row."""
    torn = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999999\r\n\r\nshort"
    df = spark.createDataFrame(
        [("torn", torn), ("null", None), ("empty", "")],
        "file_id string, data string",
    )
    rows = {r.file_id: r for r in split_warc(df).collect()}
    assert rows["torn"].truncated
    assert rows["torn"].rec_len == len(torn)  # capped at EOF, not 999999+
    assert rows["torn"].record == torn
    assert rows["null"].truncated and rows["null"].rec_no is None
    # an empty file is vacuously clean: zero records, nothing torn
    assert rows["empty"].rec_no is None and not rows["empty"].truncated


def test_split_respects_max_records(spark):
    many = "".join(_rec("response", f"http://h.example/{i}", _http("200 OK", "a/b", f"p{i}")) for i in range(7))
    df = spark.createDataFrame([("m", many)], "file_id string, data string")
    full = split_warc(df, max_records=16).collect()
    assert len(full) == 7 and not any(r.truncated for r in full)
    capped = split_warc(df, max_records=3).collect()
    # over-cap is LOUD: fewer rows, every one flagged truncated
    assert len(capped) == 3 and all(r.truncated for r in capped)


def test_parse_fields_and_http_subparse(spark, files):
    p = parse_warc_records(split_warc(files)).filter("file_id = 'f1'").orderBy("rec_no").collect()
    info, req, resp = p
    assert info.warc_type == "warcinfo" and info.target_uri is None
    assert info.warc_epoch == 1709642096  # 2024-03-05T12:34:56Z
    assert req.warc_type == "request" and req.http_status is None
    assert resp.http_status == 200
    assert resp.http_content_type == "text/html"  # parameters stripped
    assert resp.http_body == TRICKY_BODY
    assert resp.content_length == len(_http("200 OK", "text/html; charset=utf-8", TRICKY_BODY))


def test_parse_malformed_date_yields_null_not_error(spark):
    bad = _rec("response", "http://d.example/", _http("200 OK", "a/b", "x"), date="NOT-A-DATE")
    df = spark.createDataFrame([("b", bad)], "file_id string, data string")
    row = parse_warc_records(split_warc(df)).collect()[0]
    assert row.warc_date == "NOT-A-DATE" and row.warc_epoch is None


def test_surt_key(spark):
    df = spark.range(1).select(
        surt_key(F.lit("https://www.Example.COM:443/a?b=1")).alias("a"),
        surt_key(F.lit("http://sub.test.org:80")).alias("b"),
        surt_key(F.lit("relative/not/absolute")).alias("c"),
    )
    row = df.collect()[0]
    assert row.a == "com,example)/a?b=1"
    assert row.b == "org,test,sub)/"
    assert row.c is None


def test_cdx_index_rows_and_digest(spark, files):
    cdx = cdx_index(parse_warc_records(split_warc(files))).collect()
    # responses only (f1's response, f2, f3) — requests/warcinfo/dead-letter excluded
    assert [c.surt for c in cdx] == sorted(c.surt for c in cdx)
    by_surt = {c.surt: c for c in cdx}
    assert set(by_surt) == {"com,example)/a?b=1", "org,test,sub)/x", "example,t)/ok"}
    c = by_surt["com,example)/a?b=1"]
    assert c.ts == "20240305123456" and c.status == 200 and c.mime == "text/html"
    assert c.digest == hashlib.md5(TRICKY_BODY.encode()).hexdigest()
    # (offset, length) must slice the capture straight out of the archive file
    data = files.filter("file_id = 'f1'").collect()[0].data
    assert data[c.rec_offset - 1 : c.rec_offset - 1 + c.rec_len].startswith("WARC/1.0")


def test_warc_plans_are_python_free(spark, files):
    for df in (
        split_warc(files),
        parse_warc_records(split_warc(files)),
        cdx_index(parse_warc_records(split_warc(files))),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_offsets_empty_on_empty_string(spark):
    df = spark.range(1).select(warc_record_offsets(F.lit("")).alias("o"))
    assert df.collect()[0].o == []


def test_cdx_revisits_flags_identical_digest_recaptures(spark):
    """Two captures of /a with identical bodies one month apart, plus one
    changed-body capture of /b: the later /a capture must come out
    ``revisit`` pointing at the first capture's (ts, file, offset); both
    /b captures are originals (distinct digests)."""
    from maga_spark.operators.warc import cdx_revisits

    def cap(fid, uri, body, date):
        return (fid, _rec("response", uri, _http("200 OK", "text/plain", body), date))

    rows = [
        cap("g0a", "http://a.example/a", "same content", "2024-03-01T00:00:00Z"),
        cap("g1a", "http://a.example/a", "same content", "2024-04-01T00:00:00Z"),
        cap("g0b", "http://a.example/b", "old content", "2024-03-01T00:00:00Z"),
        cap("g1b", "http://a.example/b", "new content", "2024-04-01T00:00:00Z"),
    ]
    files = spark.createDataFrame(rows, "file_id string, data string")
    out = cdx_revisits(cdx_index(parse_warc_records(split_warc(files)))).collect()
    by_file = {r.file: r for r in out}
    assert not by_file["g0a"].revisit
    r = by_file["g1a"]
    assert r.revisit and r.orig_file == "g0a"
    assert r.orig_ts == "20240301000000" and r.orig_offset == by_file["g0a"].rec_offset
    # changed content: the recapture is its own original
    assert not by_file["g0b"].revisit and not by_file["g1b"].revisit
    assert by_file["g1b"].orig_file == "g1b"
    # plan hygiene: one window, zero Python
    plan = cdx_revisits(
        cdx_index(parse_warc_records(split_warc(files)))
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
