"""O-47/O-33/O-28/O-29/O-55 as Structured Streaming — the BEP-9 metadata
downloader's per-session state machine (maga/downloader.py:105-151)
re-expressed with ``applyInPandasWithState``.

Reference semantics reproduced exactly:
* strict in-order pieces — an out-of-order piece KILLS the session
  (maga/downloader.py:142-143; no reorder buffer),
* ordered reassembly + SHA-1 integrity check at finalize
  (maga/downloader.py:91-103) — corrupt payloads are rejected, never
  propagated,
* bounded sessions — state TTL ≙ the 5 s ``wait_for`` timeout
  (maga/downloader.py:161), surfaced as a ``timeout`` status row.

Plus the session-window metric aggregation (O-55) over an event stream.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PIECE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField("piece", T.IntegerType()),
        T.StructField("total", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("expected_sha1", T.StringType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField("status", T.StringType()),  # complete | killed | sha1_mismatch | timeout
        T.StructField("n_pieces", T.IntegerType()),
        T.StructField("payload_len", T.IntegerType()),
    ]
)

# state: (expected_next, total, buffered payload so far, dead?)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("expected", T.IntegerType()),
        T.StructField("total", T.IntegerType()),
        T.StructField("buf", T.BinaryType()),
        T.StructField("dead", T.BooleanType()),
    ]
)


SESSION_TTL_MS = 0  # module default; piece_assembler passes a closure value


def _assemble(key, pdf_iter, state: GroupState, ttl_ms: int = 0):
    """The WirePeerClient state machine for one (session_id,) key."""
    session_id = key[0]
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(
            [{"session_id": session_id, "status": "timeout", "n_pieces": 0, "payload_len": 0}]
        )
        return

    expected, total, buf, dead = (
        state.get if state.exists else (0, -1, b"", False)
    )
    buf = bytes(buf or b"")
    out = []
    expected_sha1 = None
    for pdf in pdf_iter:
        for row in pdf.itertuples(index=False):
            if dead:
                break
            expected_sha1 = row.expected_sha1
            total = int(row.total)
            if int(row.piece) != expected:  # O-33: strict order or die
                dead = True
                out.append(
                    {
                        "session_id": session_id,
                        "status": "killed",
                        "n_pieces": expected,
                        "payload_len": len(buf),
                    }
                )
                break
            buf += bytes(row.data)
            expected += 1
            if expected == total:  # finalize: O-28 reassembly + O-29 sha1
                ok = hashlib.sha1(buf).hexdigest() == expected_sha1
                out.append(
                    {
                        "session_id": session_id,
                        "status": "complete" if ok else "sha1_mismatch",
                        "n_pieces": expected,
                        "payload_len": len(buf),
                    }
                )
                dead = True  # session finished
    if dead:
        state.remove()
    else:
        state.update((expected, total, buf, False))
        if ttl_ms > 0:  # the reference's 5 s session bound (opt-in)
            state.setTimeoutDuration(ttl_ms)
    if out:
        yield pd.DataFrame(out)


def piece_assembler(stream: DataFrame, session_ttl_ms: int = 0) -> DataFrame:
    """Streaming piece stream → session status rows.

    ``session_ttl_ms`` > 0 enables the reference's 5 s-style session bound
    via ProcessingTimeTimeout (maga/downloader.py:161). Default is NoTimeout:
    with ProcessingTimeTimeout registered, ``processAllAvailable()`` never
    settles (timeout wake-ups keep scheduling batches) — fine for a
    continuously-running deployment, unusable for drain-the-source testing."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if session_ttl_ms > 0 else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdf_iter, state):
        yield from _assemble(key, pdf_iter, state, ttl_ms=session_ttl_ms)

    return stream.groupBy("session_id").applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout,
    )


def pieces_from_frames(
    frames: DataFrame,
    data_col: str = "frame",
    ext_msg_id: int = 20,
    data_msg_type: int = 1,
) -> DataFrame:
    """O-4 end-to-end: raw ``!IB``-framed wire bytes → assembler input rows.

    Columnar form of the reference read loop (maga/downloader.py:117-146):
    ``wire.parse_piece_message`` splits each frame into (msg_id, ext_id,
    msg_type, piece, piece_data); non-extension frames (`msg_id != 20`) and
    non-DATA messages are dropped exactly as the reference's ``continue`` /
    close branches do. Pure expressions — works unchanged on a streaming
    DataFrame, feeding ``piece_assembler``.

    Input: (session_id, <data_col> binary, total int, expected_sha1 string).
    """
    from maga_spark.functions.wire import parse_piece_message

    p = parse_piece_message(F.col(data_col))
    return (
        frames.withColumn("_p", p)
        .filter(
            (F.col("_p.msg_id") == ext_msg_id) & (F.col("_p.msg_type") == data_msg_type)
        )
        .select(
            "session_id",
            F.col("_p.piece").cast("int").alias("piece"),
            F.col("total").cast("int").alias("total"),
            F.col("_p.piece_data").alias("data"),
            "expected_sha1",
        )
    )


def read_piece_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PIECE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def session_window_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """O-55: session-window aggregation with watermarked late-data handling
    — per-user activity sessions closed after ``gap`` of silence. NTZ
    timestamps are cast to TIMESTAMP (session tz pinned UTC) — streaming
    event time requires the instant type."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
