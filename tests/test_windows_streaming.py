"""Watermarked event-time windows (ST7 extension): tumbling counts and
session windows emit exactly once the watermark passes — late data
beyond the watermark is dropped, bounding state."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_streaming_twitch_analytics_spark.streaming.windows import (
    session_counts,
    tumbling_counts,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_events(dir_path: str, batch_id: int, rows: list[tuple[str, str, int, float]]):
    os.makedirs(dir_path, exist_ok=True)
    tmp = os.path.join(dir_path, f".b{batch_id}.tmp")
    dst = os.path.join(dir_path, f"b{batch_id}.json")
    with open(tmp, "w") as f:
        for ts, et, uid, v in rows:
            f.write(
                json.dumps(
                    {"ts": ts, "event_type": et, "user_id": uid, "value": v}
                )
                + "\n"
            )
    os.rename(tmp, dst)


def stream(spark, src):
    return spark.readStream.schema(EVENT_SCHEMA).json(src)


def test_tumbling_window_emits_on_watermark(spark, tmp_path):
    src = str(tmp_path / "ev")
    write_events(
        src,
        1,
        [
            ("2024-01-01T10:05:00", "click", 1, 1.0),
            ("2024-01-01T10:20:00", "click", 2, 2.0),
            ("2024-01-01T10:40:00", "view", 1, 3.0),
        ],
    )
    agg = tumbling_counts(stream(spark, src), window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("tumbling")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark hasn't passed the 10:00 window end yet → nothing emitted
        assert spark.table("tumbling").count() == 0
        # an event far in the future advances the watermark past 11:00
        write_events(src, 2, [("2024-01-01T13:00:00", "click", 3, 1.0)])
        q.processAllAvailable()
        write_events(src, 3, [("2024-01-01T14:00:00", "click", 3, 1.0)])
        q.processAllAvailable()
        rows = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.table("tumbling").collect()
        }
        assert rows[("2024-01-01 10:00:00", "click")] == (2, 3.0)
        assert rows[("2024-01-01 10:00:00", "view")] == (1, 3.0)
    finally:
        q.stop()


def test_sliding_window_overlapping_assignment(spark, tmp_path):
    """Each event lands in window/slide = 2 overlapping windows; counts
    accumulate per window across micro-batches; append-mode emission
    waits for the watermark to pass each window's end."""
    from spark_streaming_twitch_analytics_spark.streaming.windows import (
        sliding_counts,
    )

    src = str(tmp_path / "ev")
    write_events(
        src,
        1,
        [
            ("2024-01-01T10:30:00", "click", 1, 1.0),
            ("2024-01-01T11:10:00", "click", 2, 2.0),
        ],
    )
    agg = sliding_counts(
        stream(spark, src), window="2 hours", slide="1 hour", watermark="1 hour"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sliding")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark far past every open window's end
        write_events(src, 2, [("2024-01-01T20:00:00", "view", 3, 0.0)])
        q.processAllAvailable()
        write_events(src, 3, [("2024-01-01T23:00:00", "view", 3, 0.0)])
        q.processAllAvailable()
        rows = {
            (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.table("sliding").collect()
        }
        # 10:30 event → [09:00,11:00) and [10:00,12:00)
        # 11:10 event → [10:00,12:00) and [11:00,13:00)
        assert rows[("2024-01-01 09:00:00", "click")] == (1, 1.0)
        assert rows[("2024-01-01 10:00:00", "click")] == (2, 3.0)
        assert rows[("2024-01-01 11:00:00", "click")] == (1, 2.0)
    finally:
        q.stop()


def test_session_window_groups_by_gap(spark, tmp_path):
    src = str(tmp_path / "ev")
    write_events(
        src,
        1,
        [
            # user 1: two events 10 min apart (one session), then a 2h gap
            ("2024-01-01T10:00:00", "click", 1, 1.0),
            ("2024-01-01T10:10:00", "click", 1, 1.0),
            ("2024-01-01T12:30:00", "click", 1, 1.0),
        ],
    )
    agg = session_counts(stream(spark, src), gap="30 minutes", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        write_events(src, 2, [("2024-01-01T16:00:00", "click", 2, 1.0)])
        q.processAllAvailable()
        write_events(src, 3, [("2024-01-01T18:00:00", "click", 2, 1.0)])
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"]): r["n_events"]
            for r in spark.table("sessions").collect()
        }
        assert got[(1, "2024-01-01 10:00:00")] == 2  # merged by gap
        assert got[(1, "2024-01-01 12:30:00")] == 1  # separate session
    finally:
        q.stop()
