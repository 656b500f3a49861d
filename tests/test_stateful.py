"""Arbitrary-state streaming operator (applyInPandasWithState): running
counts accumulate across micro-batches, and idle keys expire with a
terminal row — the bounded-state behavior the reference's
``updateStateByKey`` lacks."""

from __future__ import annotations

import time

import pytest
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
    running_count_tws,
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


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas's state-server protocol needs "
    "protobuf (not in this container; no installs allowed) — the "
    "operator itself is real, see streaming/stateful.py",
)
def test_tws_running_count_accumulates(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 StatefulProcessor) must match
    the applyInPandasWithState semantics batch-for-batch. RocksDB is the
    only supported backend for this API."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "in")
    write_batch_file(src, [format_privmsg(1, "u", "c", "apple apple banana")], 1)
    out = running_count_tws(word_stream(spark, src), idle_timeout_ms=None)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_wc")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch_file(src, [format_privmsg(2, "u", "c", "apple cherry")], 2)
        q.processAllAvailable()
        got = {
            r["word"]: r["cnt"]
            for r in spark.sql(
                "SELECT word, max(cnt) AS cnt FROM tws_wc GROUP BY word"
            ).collect()
        }
        assert got == {"apple": 3, "banana": 1, "cherry": 1}
        assert not any(r["expired"] for r in spark.table("tws_wc").collect())
    finally:
        q.stop()
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


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
