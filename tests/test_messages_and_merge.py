"""Message parsing (P1-P4, incl. the ':' truncation quirk), the J1
``update_table`` merge (FIXTURES A6 shapes), and top-K determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark.operators import merge, messages, topk
from spark_streaming_twitch_analytics_spark.sources.irc import format_privmsg


def parse_one(spark, line):
    raw = spark.createDataFrame([(line,)], "value string")
    return messages.format_raw_messages(raw).head().asDict()


def test_parse_privmsg_fields(spark):
    line = format_privmsg(1700000000123, "alice", "general", "Hello World")
    row = parse_one(spark, line)
    assert row["timestamp"] == "1700000000123"
    assert row["user"] == "alice"
    assert row["channel"] == "#general"
    assert row["text"] == "hello world"  # lowercased (P4)
    assert row["message"] == line


def test_parse_truncation_quirk_preserved(spark):
    # reference keeps only split-item 2: text after a ':' is TRUNCATED
    # (SparkRunner.scala:193-198; documented SURVEY §7 hard-point 2)
    line = format_privmsg(1, "bob", "chan", "see http://x.y for more")
    row = parse_one(spark, line)
    assert row["text"] == "see http"


def test_update_table_merge_shapes(spark):
    stored = spark.createDataFrame(
        [("both", 2), ("left_only", 5)], "word string, cnt int"
    )
    incoming = spark.createDataFrame(
        [("both", 3), ("right_only", 7)], "word string, cnt int"
    )
    got = {
        r["word"]: r["cnt"]
        for r in merge.update_table(stored, incoming, "word", "cnt").collect()
    }
    # full-outer + na.fill(0) + sum (RedisInterface.scala:61-73)
    assert got == {"both": 5, "left_only": 5, "right_only": 7}


def test_update_table_idempotent_empty(spark):
    stored = spark.createDataFrame([("w", 1)], "word string, cnt int")
    empty = spark.createDataFrame([], "word string, cnt int")
    got = merge.update_table(stored, empty, "word", "cnt").collect()
    assert [(r["word"], r["cnt"]) for r in got] == [("w", 1)]


def test_top_k_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [("b", 2), ("a", 2), ("c", 2), ("d", 1)], "word string, cnt int"
    )
    got = [r["word"] for r in topk.top_k(df, "cnt", 2, ["word"]).collect()]
    assert got == ["a", "b"]


def test_top_k_per_group_matches_sorted_truth(spark):
    df = spark.createDataFrame(
        [("g1", "x", 3), ("g1", "y", 5), ("g1", "z", 5), ("g2", "q", 1)],
        "g string, word string, cnt int",
    )
    got = {
        (r["g"], r["word"], r["rn"])
        for r in topk.top_k_per_group(df, ["g"], "cnt", 1, ["word"]).collect()
    }
    assert got == {("g1", "y", 1), ("g2", "q", 1)}


def test_semi_join_equals_collect_whitelist(spark, docs):
    wc = messages.word_counts(F.col("text"), docs)
    top5 = topk.top_k(wc, "cnt", 5, ["word"])
    semi = topk.top_k_semi_join(wc, top5.select("word"), "word")
    whitelist = {r["word"] for r in top5.collect()}  # the reference's O3 way
    got = {r["word"] for r in semi.collect()}
    assert got == whitelist


def test_apply_changes_upsert_delete_untouched(spark):
    from spark_streaming_twitch_analytics_spark.operators import merge

    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "k long, seq long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, 21, "a2", "U"),   # update k=1
            (1, 22, "a3", "U"),   # later update wins
            (2, 25, "bx", "D"),   # delete k=2
            (4, 40, "d", "U"),    # insert new key
            (5, 50, "e", "U"),    # insert then delete: latest wins -> gone
            (5, 51, "e2", "D"),
        ],
        "k long, seq long, v string, op string",
    )
    got = {
        (r["k"], r["seq"], r["v"])
        for r in merge.apply_changes(
            base, changes, keys=["k"], seq_cols=["seq"], broadcast_changes=True
        ).collect()
    }
    assert got == {(1, 22, "a3"), (3, 30, "c"), (4, 40, "d")}


def test_apply_changes_delete_then_reinsert(spark):
    from spark_streaming_twitch_analytics_spark.operators import merge

    base = spark.createDataFrame([(1, 1, "x")], "k long, seq long, v string")
    changes = spark.createDataFrame(
        [(1, 2, "x", "D"), (1, 3, "y", "U")], "k long, seq long, v string, op string"
    )
    rows = merge.apply_changes(base, changes, ["k"], ["seq"]).collect()
    assert [(r["k"], r["seq"], r["v"]) for r in rows] == [(1, 3, "y")]


def test_apply_changes_null_op_rejected_not_silent_delete(spark):
    """A malformed feed row with op=NULL must be IGNORED (key untouched)
    — left in, it would anti-join the base row away while failing the
    upsert filter, silently deleting the record."""
    base = spark.createDataFrame([(1, 10, 1.0), (2, 20, 2.0)], "k long, seq long, v double")
    changes = spark.createDataFrame(
        [(1, 30, 9.0, None), (2, 30, 8.0, "U")],
        "k long, seq long, v double, op string",
    )
    got = {
        r["k"]: (r["seq"], r["v"])
        for r in merge.apply_changes(base, changes, ["k"], ["seq"]).collect()
    }
    assert got[1] == (10, 1.0)  # NULL-op row ignored; base row survives
    assert got[2] == (30, 8.0)  # valid upsert applied


def test_epoch_guard_is_scoped_to_checkpoint_lineage(spark, tmp_path):
    """A FRESH checkpoint restarts foreachBatch epochs at 0; the
    exactly-once guard must not mistake those for replays of the old
    lineage's epochs (which would silently drop real batches)."""
    import pyspark.sql.types as T

    from spark_streaming_twitch_analytics_spark.sources.kv_store import KVTableStore
    from spark_streaming_twitch_analytics_spark.streaming.wordcount import (
        COUNT_SCHEMA,
        apply_delta_once,
    )

    store = KVTableStore(spark, str(tmp_path / "kv"))
    delta = spark.createDataFrame([("w", 1)], COUNT_SCHEMA)
    assert apply_delta_once(store, "t", COUNT_SCHEMA, delta, "word", "cnt", 5, lineage="ckpt-A")
    # same lineage, same epoch → replay, skipped
    assert not apply_delta_once(store, "t", COUNT_SCHEMA, delta, "word", "cnt", 5, lineage="ckpt-A")
    # NEW lineage, epoch restarts at 0 → must apply
    assert apply_delta_once(store, "t", COUNT_SCHEMA, delta, "word", "cnt", 0, lineage="ckpt-B")
    rows = {r["word"]: r["cnt"] for r in store.get_table("t", COUNT_SCHEMA).collect()}
    assert rows == {"w": 2}
