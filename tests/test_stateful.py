"""Arbitrary-state streaming operator (applyInPandasWithState): running
counts accumulate across micro-batches, and idle keys expire with a
terminal row — the bounded-state behavior the reference's
``updateStateByKey`` lacks."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark.functions.text import countable_words
from spark_streaming_twitch_analytics_spark.operators.messages import (
    format_raw_messages,
)
from spark_streaming_twitch_analytics_spark.sources.irc import (
    file_line_source,
    format_privmsg,
    write_batch_file,
)
from spark_streaming_twitch_analytics_spark.streaming.stateful import (
    running_count_with_expiry,
)


def word_stream(spark, src):
    return format_raw_messages(file_line_source(spark, src)).select(
        F.explode(countable_words(F.col("text"), "en")).alias("word")
    )


def test_stateful_running_count_accumulates(spark, tmp_path):
    src = str(tmp_path / "in")
    write_batch_file(src, [format_privmsg(1, "u", "c", "apple apple banana")], 1)
    out = running_count_with_expiry(word_stream(spark, src), idle_timeout_ms=None)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_wc")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch_file(src, [format_privmsg(2, "u", "c", "apple cherry")], 2)
        q.processAllAvailable()
        got = {
            r["word"]: r["cnt"]
            for r in spark.sql(
                "SELECT word, max(cnt) AS cnt FROM stateful_wc GROUP BY word"
            ).collect()
        }
        # apple: 2 in batch1 + 1 in batch2 → per-key state carried to 3
        assert got == {"apple": 3, "banana": 1, "cherry": 1}
        assert not any(r["expired"] for r in spark.table("stateful_wc").collect())
    finally:
        q.stop()


def test_stateful_idle_keys_expire(spark, tmp_path):
    src = str(tmp_path / "in")
    write_batch_file(src, [format_privmsg(1, "u", "c", "apple apple")], 1)
    out = running_count_with_expiry(word_stream(spark, src), idle_timeout_ms=1500)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_exp")
        .start()
    )
    try:
        # the timeout keeps scheduling cleanup batches; poll for the
        # terminal expired row instead of processAllAvailable
        deadline = time.time() + 60
        expired = []
        while time.time() < deadline and not expired:
            time.sleep(2)
            expired = [
                r for r in spark.table("stateful_exp").collect() if r["expired"]
            ]
        assert expired and expired[0]["word"] == "apple" and expired[0]["cnt"] == 2
    finally:
        q.stop()
