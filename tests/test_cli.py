"""End-to-end test of the CLI entry point (__main__.py) — the
reference's launch surface (TwitchStream.scala:27-35) — in file-source
mode with deterministic input."""

from __future__ import annotations

from pyspark.sql import types as T

from spark_streaming_twitch_analytics_spark.__main__ import main
from spark_streaming_twitch_analytics_spark.sources import irc


def test_cli_file_source_counts_words_and_categories(spark, tmp_path):
    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    lines = [
        irc.format_privmsg(1000 + i, f"u{i % 3}", "testchan", "hello stream hello")
        for i in range(10)
    ]
    irc.write_batch_file(src, lines, 0)

    rc = main(
        [
            "testchan",
            "1",
            "english",
            "--source",
            "file",
            "--dir",
            src,
            "--store",
            store,
            "--max-batches",
            "3",
        ]
    )
    assert rc == 0

    # the CLI stopped its own session; read the store with the test session
    from spark_streaming_twitch_analytics_spark.sources.kv_store import KVTableStore

    kv = KVTableStore(spark, store)
    schema = T.StructType(
        [T.StructField("word", T.StringType()), T.StructField("cnt", T.LongType())]
    )
    words = {r["word"]: r["cnt"] for r in kv.get_table("testchan_wordcount", schema).collect()}
    # 10 messages × ("hello"×2 + "stream"×1); "hello"/"stream" are >3 chars
    assert words.get("hello") == 20
    assert words.get("stream") == 10
    cat_schema = T.StructType(
        [T.StructField("category", T.StringType()), T.StructField("cnt", T.LongType())]
    )
    cats = kv.get_table("testchan_categoryCount", cat_schema).collect()
    assert sum(r["cnt"] for r in cats) > 0
