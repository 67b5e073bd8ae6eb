"""Wire-format + bencode/KRPC + resolver operators (SURVEY.md §2:
O-2/O-3/O-4/O-18/O-19/O-30/O-45/O-50/D6)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from maga_spark.functions.bencode import (
    bdecode,
    bencode,
    decode_krpc,
    encode_error_response,
    encode_find_node_query,
    encode_get_peers_response,
    encode_ping_response,
)
from maga_spark.functions.wire import (
    BT_HEADER,
    check_handshake,
    embedded_int_after,
    frame_decode,
    frame_encode,
    piece_count,
    piece_range,
)
from maga_spark.operators.resolver import fake_resolve, resolve_hosts

# ---------------------------------------------------------------- bencode


def test_bencode_python_roundtrip():
    cases = [
        0,
        -42,
        b"",
        b"spam",
        [1, b"a", [2]],
        {b"a": 1, b"b": [b"x"]},
        {b"t": b"tt", b"y": b"q", b"q": b"ping", b"a": {b"id": b"\x00" * 20}},
    ]
    for c in cases:
        assert bdecode(bencode(c)) == c
    # canonical key order
    assert bencode({b"b": 1, b"a": 2}) == b"d1:ai2e1:bi1ee"
    # malformed rejects
    for bad in [b"", b"i1", b"ie", b"i01e", b"i-0e", b"i-01e", b"5:abc", b"d1:ae", b"i1etrail"]:
        try:
            bdecode(bad)
            raise AssertionError(f"accepted {bad!r}")
        except ValueError:
            pass


def test_encode_expressions_match_python_bencode(spark):
    """The pure-expression encoders == generic python bencode of the same
    dicts (the shapes maga/crawler.py actually sends)."""
    nid, tgt, tok, t = b"N" * 20, b"T" * 20, b"to", b"tt"
    df = spark.createDataFrame([(t, nid, tgt, tok)], "t binary, nid binary, tgt binary, tok binary")
    row = df.select(
        encode_ping_response(F.col("t"), F.col("nid")).alias("ping"),
        encode_get_peers_response(F.col("t"), F.col("nid"), F.col("tok")).alias("gp"),
        encode_find_node_query(F.col("t"), F.col("nid"), F.col("tgt")).alias("fn"),
        encode_error_response(F.col("t")).alias("err"),
    ).first()
    assert bytes(row["ping"]) == bencode({b"t": t, b"y": b"r", b"r": {b"id": nid}})
    assert bytes(row["gp"]) == bencode(
        {b"t": t, b"y": b"r", b"r": {b"id": nid, b"nodes": b"", b"token": tok}}
    )
    assert bytes(row["fn"]) == bencode(
        {b"t": t, b"y": b"q", b"q": b"find_node", b"a": {b"id": nid, b"target": tgt}}
    )
    assert bytes(row["err"]) == bencode({b"t": t, b"y": b"e", b"e": [202, b"Server Error"]})
    # non-ASCII message: length prefix must count BYTES of the encoded form
    row2 = df.select(encode_error_response(F.col("t"), msg="séñal").alias("err")).first()
    assert bytes(row2["err"]) == bencode(
        {b"t": t, b"y": b"e", b"e": [202, "séñal".encode("utf-8")]}
    )
    bdecode(bytes(row2["err"]))  # well-formed frame


def test_decode_krpc_struct(spark):
    nid = b"\x01" * 20
    msgs = [
        bencode({b"t": b"aa", b"y": b"q", b"q": b"get_peers",
                 b"a": {b"id": nid, b"info_hash": b"\x02" * 20}}),
        bencode({b"t": b"bb", b"y": b"q", b"q": b"announce_peer",
                 b"a": {b"id": nid, b"info_hash": b"\x03" * 20, b"port": 6881,
                        b"implied_port": 1, b"token": b"tk"}}),
        bencode({b"t": b"cc", b"y": b"r", b"r": {b"id": nid, b"nodes": b"\x04" * 26}}),
        bencode({b"t": b"dd", b"y": b"r", b"r": {b"id": nid, b"values": [b"\x05" * 6, b"\x06" * 6]}}),
        bencode({b"t": b"ee", b"y": b"e", b"e": [202, b"Server Error"]}),
        b"garbage not bencoded",
        None,
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "data binary")
    rows = df.select(decode_krpc("data").alias("m")).select("m.*").collect()
    assert rows[0]["q"] == "get_peers" and bytes(rows[0]["args"]["info_hash"]) == b"\x02" * 20
    assert rows[1]["args"]["port"] == 6881 and rows[1]["args"]["implied_port"] == 1
    assert bytes(rows[1]["args"]["token"]) == b"tk"
    assert rows[2]["y"] == "r" and bytes(rows[2]["args"]["nodes"]) == b"\x04" * 26
    assert [bytes(v) for v in rows[3]["values"]] == [b"\x05" * 6, b"\x06" * 6]
    assert rows[4]["e_code"] == 202 and rows[4]["e_msg"] == "Server Error"
    assert rows[5]["y"] is None and bytes(rows[5]["_raw"]) == b"garbage not bencoded"
    assert rows[6]["y"] is None and rows[6]["_raw"] is None


def test_decode_encode_roundtrip_spark(spark):
    """encode (pure expr) → decode (UDF) recovers the fields."""
    nid, tgt = b"A" * 20, b"B" * 20
    df = spark.createDataFrame([(b"fn", nid, tgt)], "t binary, nid binary, tgt binary")
    out = df.select(
        decode_krpc(encode_find_node_query(F.col("t"), F.col("nid"), F.col("tgt"))).alias("m")
    ).select("m.*").first()
    assert out["y"] == "q" and out["q"] == "find_node"
    assert bytes(out["t"]) == b"fn"
    assert bytes(out["args"]["id"]) == nid and bytes(out["args"]["target"]) == tgt


# ---------------------------------------------------------------- framing


def test_frame_encode_decode(spark):
    payloads = [b"", b"x", b"hello world" * 10]
    df = spark.createDataFrame([(p,) for p in payloads], "p binary")
    framed = [bytes(r[0]) for r in df.select(frame_encode(F.col("p"))).collect()]
    for p, f in zip(payloads, framed):
        assert f == struct.pack(">I", len(p)) + p  # the reference's exact framing

    # !IB decode: msg_id byte + payload behind the length prefix
    msg = bytes([20]) + b"payload-bytes"
    data = struct.pack(">I", len(msg)) + msg
    df2 = spark.createDataFrame([(data,), (b"\x00\x01",), (None,)], "d binary")
    rows = df2.select(frame_decode(F.col("d")).alias("f")).select("f.*").collect()
    assert rows[0]["length"] == len(msg) and rows[0]["msg_id"] == 20
    assert bytes(rows[0]["payload"]) == b"payload-bytes"
    assert rows[1]["length"] is None  # truncated → NULL, never error
    assert rows[2]["length"] is None


def test_frame_roundtrip_property(spark):
    """frame_decode(frame_encode(id+payload)) is the identity over
    generated binary payloads."""
    df = (
        spark.range(200)
        .select(
            F.col("id"),
            F.concat(
                F.unhex(F.lpad(F.hex(F.col("id") % 256), 2, "0")),
                F.unhex(F.md5(F.col("id").cast("string"))),
            ).alias("msg"),
        )
    )
    out = df.select(
        "id",
        F.col("msg"),
        frame_decode(frame_encode(F.col("msg"))).alias("f"),
    )
    bad = out.filter(
        (F.col("f.length") != F.length("msg"))
        | (F.col("f.msg_id") != F.col("id") % 256)
        | (F.col("f.payload") != F.expr("substring(msg, 2, length(msg) - 1)"))
    ).count()
    assert bad == 0


# ---------------------------------------------------------------- handshake


def test_check_handshake(spark):
    ih = b"H" * 20
    peer = b"P" * 20
    good = BT_HEADER + ih + peer
    no_ext = BT_HEADER[:20] + b"\x00" * 8 + ih + peer  # extension bit unset
    wrong_ih = BT_HEADER + b"X" * 20 + peer
    wrong_prefix = b"\x12" + BT_HEADER[1:] + ih + peer
    short = good[:40]
    df = spark.createDataFrame(
        [(d, ih) for d in [good, no_ext, wrong_ih, wrong_prefix, short, None]],
        "data binary, ih binary",
    )
    got = [r[0] for r in df.select(check_handshake(F.col("data"), F.col("ih"))).collect()]
    assert got == [True, False, False, False, False, False]

    # python cross-check: the reference's exact predicate
    def ref_check(data, infohash):
        return (
            len(data) >= 68
            and data[:20] == BT_HEADER[:20]
            and data[28:48] == infohash
            and data[25] & 0x10 == 0x10
        )

    for d, want in zip([good, no_ext, wrong_ih, wrong_prefix, short], got[:5]):
        assert ref_check(d, ih) == want


def test_handshake_pure_codegen(spark):
    df = spark.createDataFrame([(b"x" * 68, b"H" * 20)], "data binary, ih binary")
    plan = (
        df.select(check_handshake(F.col("data"), F.col("ih")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


# ---------------------------------------------------------------- embedded int


def test_embedded_int_after(spark):
    payloads = [
        b"d1:md11:ut_metadatai3eee",
        b"d13:metadata_sizei31337e1:md11:ut_metadatai1eee",
        b"no keys here",
        b"d11:ut_metadatai-7ee",
    ]
    df = spark.createDataFrame([(p.decode(),) for p in payloads], "s string")
    rows = df.select(
        embedded_int_after(F.col("s"), "ut_metadata").alias("ut"),
        embedded_int_after(F.col("s"), "metadata_size").alias("ms"),
    ).collect()
    # the reference's own parsers agree (maga/downloader.py:28-39)
    assert [r["ut"] for r in rows] == [3, 1, None, -7]
    assert [r["ms"] for r in rows] == [None, 31337, None, None]


def test_piece_count_and_range(spark):
    import math

    df = spark.createDataFrame(
        [(0, 0, 100), (1, 16384, 1), (2, 16385, 2), (3, 999, 16384 * 3)],
        "id long, sz long, extra long",
    )
    got = {r["id"]: r["pc"] for r in df.select("id", piece_count(F.col("sz")).alias("pc")).collect()}
    assert got == {i: math.ceil(s / 16384) for i, s, _ in [(0, 0, 0), (1, 16384, 0), (2, 16385, 0), (3, 999, 0)]}

    big = (1 << 60) + 950  # above 2^53: IEEE double division would misplace
    rng = spark.createDataFrame(
        [(0, 0, 100), (1, 950, 100), (2, 1000, 1), (3, 0, 0), (4, big, 100)],
        "id long, off long, sz long",
    )
    rows = {
        r["id"]: list(r["pieces"])
        for r in rng.select("id", piece_range(F.col("off"), F.col("sz"), 1000).alias("pieces")).collect()
    }
    # divmod oracle (screenshot_system/io_adapter.py:57-63)
    def ref_range(off, sz, plen=1000):
        if sz <= 0:
            return []
        s, _ = divmod(off, plen)
        e, _ = divmod(off + sz - 1, plen)
        return list(range(s, e + 1))

    assert rows == {
        0: ref_range(0, 100),
        1: ref_range(950, 100),
        2: ref_range(1000, 1),
        3: [],
        4: ref_range(big, 100),
    }


# ---------------------------------------------------------------- resolver


def test_resolve_hosts(spark):
    df = spark.createDataFrame(
        [("h1.test",), ("h2.test",), ("h1.test",), ("bad.invalid",)], "host string"
    )
    rows = {r["host"]: r["ip"] for r in resolve_hosts(df).collect()}
    assert rows["h1.test"] == fake_resolve("h1.test")
    assert rows["h1.test"].startswith("10.")
    assert rows["bad.invalid"] is None


def test_socket_resolver_wiring(spark):
    """The production socket_resolve is a named injectable (never default).
    Unit: localhost resolves via /etc/hosts (no network), junk yields None.
    Wiring: the callable serializes into the executor-side mapInPandas
    stage and its verdicts broadcast back onto the rows."""
    from maga_spark.operators.resolver import socket_resolve

    assert socket_resolve("localhost") == "127.0.0.1"
    assert socket_resolve("no-such-host.invalid") is None
    assert socket_resolve(None) is None
    df = spark.createDataFrame(
        [("localhost",), ("localhost",), ("no-such-host.invalid",)], "host string"
    )
    rows = [
        (r["host"], r["ip"])
        for r in resolve_hosts(df, resolver=socket_resolve).collect()
    ]
    assert rows.count(("localhost", "127.0.0.1")) == 2
    assert ("no-such-host.invalid", None) in rows


def test_resolve_hosts_distinct_only(spark):
    """The resolver callable must run once per DISTINCT host, not per row."""
    calls = []

    def counting(h):
        calls.append(h)
        return "10.0.0.1"

    df = spark.createDataFrame([("h.test",)] * 50, "host string").coalesce(1)
    out = resolve_hosts(df, resolver=counting)
    assert out.count() == 50
    # executor-side list isn't visible here; assert via plan shape instead:
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Deduplicate" in plan or "HashAggregate" in plan  # the distinct stage


def test_parse_piece_message_vs_reference(spark):
    """Columnar wire parse == the reference's read-loop byte logic
    (maga/downloader.py:117-146), including non-UTF8 piece payloads."""
    from maga_spark.functions.bencode import bencode
    from maga_spark.functions.wire import parse_piece_message

    def make_frame(ext_id, msg_type, piece, piece_data):
        env = bencode({b"msg_type": msg_type, b"piece": piece})
        msg = bytes([20, ext_id]) + env + piece_data
        return struct.pack(">I", len(msg)) + msg

    def ref_parse(framed):  # the reference's exact logic
        total_len, msg_id = struct.unpack("!IB", framed[:5])
        payload = framed[5 : 5 + total_len - 1]
        ext_id, ext_payload = payload[0], payload[1:]
        split = ext_payload.index(b"ee") + 2
        env = ext_payload[:split]

        def emb_int(data, key):  # maga/downloader.py:28-39 exactly
            d = data[data.index(key) + len(key) + 1 :]
            return int(d[: d.index(b"e")])

        return msg_id, ext_id, emb_int(env, b"msg_type"), emb_int(env, b"piece"), ext_payload[split:]

    frames = [
        make_frame(3, 1, 0, b"\xff\x00\xfe binary \x9c piece data"),
        make_frame(7, 1, 5, b"x" * 100),
        make_frame(2, 0, 0, b""),
        make_frame(1, 2, 11, b"ee trailing ee bytes"),  # 'ee' inside data too
    ]
    df = spark.createDataFrame([(fr,) for fr in frames], "d binary")
    rows = df.select(parse_piece_message(F.col("d")).alias("p")).select("p.*").collect()
    for fr, r in zip(frames, rows):
        msg_id, ext_id, mt, pc, pd_ = ref_parse(fr)
        assert r["msg_id"] == msg_id and r["ext_id"] == ext_id
        assert r["msg_type"] == mt and r["piece"] == pc
        assert bytes(r["piece_data"]) == pd_

    plan = df.select(parse_piece_message(F.col("d")))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure codegen end to end
