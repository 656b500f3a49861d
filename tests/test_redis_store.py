"""Redis KV store backend: interface parity with the file-backed
KVTableStore (the reference's actual sink — RedisInterface.scala:9-59).

Layers:
- store CONTRACT tests parameterized over both backends (the Redis one
  runs against the file-backed fake client, so no server is needed);
- executor-side writer unit tests against an in-memory fake;
- a real-server round-trip, skipped when redis-py or the server is
  absent (the container ships neither).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import types as T

from spark_streaming_twitch_analytics_spark.sources.fake_redis import DirFakeRedis
from spark_streaming_twitch_analytics_spark.sources.kv_store import KVTableStore
from spark_streaming_twitch_analytics_spark.sources.redis_store import (
    RedisKVTableStore,
    _decode_cell,
    _write_partition,
)

COUNT_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType()),
        T.StructField("count", T.LongType()),
    ]
)


def make_store(kind: str, spark, tmp_path):
    if kind == "file":
        return KVTableStore(spark, str(tmp_path / "kv"))
    root = str(tmp_path / "fredis")
    return RedisKVTableStore(
        spark,
        client_factory=lambda root=root: DirFakeRedis(root),
        checkpoint_root=str(tmp_path / "ckpt"),
    )


@pytest.fixture(params=["file", "redis"])
def store(request, spark, tmp_path):
    return make_store(request.param, spark, tmp_path)


def test_contract_missing_table_returns_empty_of_schema(store):
    out = store.get_table("nope", COUNT_SCHEMA)
    assert out.count() == 0 and out.schema == COUNT_SCHEMA


def test_contract_overwrite_snapshot_replaces_state(store, spark):
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], COUNT_SCHEMA)
    df2 = spark.createDataFrame([("a", 5)], COUNT_SCHEMA)
    store.write(df1, "t")
    store.write(df2, "t")  # overwrite: b must be GONE
    got = {r["word"]: r["count"] for r in store.get_table("t", COUNT_SCHEMA).collect()}
    assert got == {"a": 5}


def test_contract_append_keeps_existing_rows(store, spark):
    store.write(spark.createDataFrame([("a", 1)], COUNT_SCHEMA), "t")
    store.write(spark.createDataFrame([("b", 2)], COUNT_SCHEMA), "t", mode="append")
    got = {r["word"]: r["count"] for r in store.get_table("t", COUNT_SCHEMA).collect()}
    assert got == {"a": 1, "b": 2}


@pytest.mark.parametrize("kind", ["file", "redis"])
def test_contract_ttl_expiry_falls_back_to_empty(kind, spark, tmp_path):
    # Injected clock instead of wall-clock sleeps: on a loaded host more
    # than the TTL can elapse between write and first read (Spark job
    # launch included), which made the sleep version flaky.
    now = time.time()
    offset = [0.0]
    clock = lambda: now + offset[0]  # noqa: E731
    if kind == "file":
        store = KVTableStore(spark, str(tmp_path / "kv"), clock=clock)
    else:
        root = str(tmp_path / "fredis")
        store = RedisKVTableStore(
            spark,
            # driver-side client time-travels; executor writers keep the
            # real clock (expire_at is anchored at write time regardless)
            client_factory=lambda root=root: DirFakeRedis(root, clock=clock),
            checkpoint_root=str(tmp_path / "ckpt"),
        )
    store.write(spark.createDataFrame([("w", 1)], COUNT_SCHEMA), "t", ttl=30)
    assert store.get_table("t", COUNT_SCHEMA).count() == 1
    offset[0] = 31.0
    assert store.get_table("t", COUNT_SCHEMA).count() == 0


def test_contract_epoch_lineage_guard(store, spark):
    df = spark.createDataFrame([("a", 1)], COUNT_SCHEMA)
    assert store.last_applied_epoch("t") == -1
    store.write(df, "t", epoch=3, lineage="q1")
    assert store.last_applied_epoch("t", lineage="q1") == 3
    # a fresh checkpoint (new lineage) must not be masked by an old epoch
    assert store.last_applied_epoch("t", lineage="q2") == -1


def test_contract_delete_removes_table(store, spark):
    store.write(spark.createDataFrame([("a", 1)], COUNT_SCHEMA), "t")
    store.delete("t")
    assert store.get_table("t", COUNT_SCHEMA).count() == 0


# -- redis-specific behavior ------------------------------------------------


def test_key_column_upserts_by_key(spark, tmp_path):
    store = make_store("redis", spark, tmp_path)
    store.write(
        spark.createDataFrame([("a", 1), ("b", 2)], COUNT_SCHEMA),
        "t",
        mode="append",
        key_column="word",
    )
    store.write(
        spark.createDataFrame([("a", 9)], COUNT_SCHEMA),
        "t",
        mode="append",
        key_column="word",
    )
    got = {r["word"]: r["count"] for r in store.get_table("t", COUNT_SCHEMA).collect()}
    assert got == {"a": 9, "b": 2}  # append + key.column = upsert, like spark-redis


def test_table_name_with_colon_rejected(spark, tmp_path):
    """':' delimits the key space — a table named 'a:b' would be swept up
    by table 'a's scan pattern, so it's rejected up front."""
    store = make_store("redis", spark, tmp_path)
    df = spark.createDataFrame([("a", 1)], COUNT_SCHEMA)
    with pytest.raises(ValueError, match="delimiter"):
        store.write(df, "a:b")
    with pytest.raises(ValueError, match="delimiter"):
        store.get_table("a:b", COUNT_SCHEMA)
    with pytest.raises(ValueError, match="delimiter"):
        store.delete("a:b")


def test_get_table_dedupes_at_least_once_scan(spark, tmp_path):
    """Real SCAN can yield a key twice during a rehash; the reader must
    not return duplicate rows."""

    class DupScanFake(DirFakeRedis):
        def scan_iter(self, match="*", count=1000):
            keys = list(super().scan_iter(match=match, count=count))
            yield from keys + keys  # every key twice

    root = str(tmp_path / "fredis")
    store = RedisKVTableStore(
        spark,
        client_factory=lambda root=root: DupScanFake(root),
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    store.write(spark.createDataFrame([("a", 1), ("b", 2)], COUNT_SCHEMA), "t")
    got = sorted(
        (r["word"], r["count"]) for r in store.get_table("t", COUNT_SCHEMA).collect()
    )
    assert got == [("a", 1), ("b", 2)]


def test_write_partition_one_pipeline_and_row_shape():
    class CountingFake(DirFakeRedis):
        pass

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        client = CountingFake(d)
        rows = [{"word": "x", "count": 1}, {"word": "y", "count": None}]
        _write_partition(
            rows, ["word", "count"], lambda: client, "p:", "t", "word", 0
        )
        assert client.hgetall("p:t:x") == {"word": "x", "count": "1"}
        # NULL cells are simply absent fields (Redis hashes have no NULL)
        assert client.hgetall("p:t:y") == {"word": "y"}


def test_cell_codec_roundtrip_property():
    """hypothesis: decode(encode(v), type-of-v) == v for every value the
    store can carry (Redis hashes only speak strings, so the codec IS the
    store's correctness boundary)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_streaming_twitch_analytics_spark.sources.redis_store import (
        _encode_cell,
    )

    cases = st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62).map(
            lambda v: (v, T.LongType())
        ),
        st.floats(allow_nan=False, allow_infinity=False).map(
            lambda v: (v, T.DoubleType())
        ),
        st.booleans().map(lambda v: (v, T.BooleanType())),
        st.text(max_size=50).map(lambda v: (v, T.StringType())),
        st.lists(st.integers(min_value=-1000, max_value=1000), max_size=10).map(
            lambda v: (v, T.ArrayType(T.LongType()))
        ),
        st.none().map(lambda v: (v, T.StringType())),
    )

    @settings(max_examples=300, deadline=None)
    @given(case=cases)
    def check(case):
        v, dt = case
        assert _decode_cell(_encode_cell(v), dt) == v

    check()


def test_decode_cell_round_trips_types():
    assert _decode_cell("3", T.LongType()) == 3
    assert _decode_cell("1.5", T.DoubleType()) == 1.5
    assert _decode_cell("true", T.BooleanType()) is True
    assert _decode_cell("[1, 2]", T.ArrayType(T.LongType())) == [1, 2]
    assert _decode_cell(None, T.LongType()) is None


def test_store_backends_share_sink_helpers(spark, tmp_path):
    """The streaming snapshot sink helper must accept either backend
    (interface parity is the point of the Redis adapter)."""
    from spark_streaming_twitch_analytics_spark.streaming import wordcount as SW

    for kind in ("file", "redis"):
        store = make_store(kind, spark, tmp_path / kind)
        df = spark.createDataFrame([("hi", 2), ("yo", 1)], COUNT_SCHEMA)
        store.write(df, "wordcount")
        restored = store.get_table("wordcount", COUNT_SCHEMA)
        assert {r["word"]: r["count"] for r in restored.collect()} == {
            "hi": 2,
            "yo": 1,
        }
        assert isinstance(store.checkpoint_dir("wordcount"), str)
    assert SW is not None


def test_streaming_snapshot_sink_into_redis_backend(spark, tmp_path):
    """End-to-end: a real Structured Streaming query snapshot-sinks its
    running word counts into the Redis-backed store (fake client)."""
    import os

    from spark_streaming_twitch_analytics_spark.sources.irc import (
        format_privmsg,
        write_batch_file,
    )
    from spark_streaming_twitch_analytics_spark.streaming import wordcount as SW

    store = make_store("redis", spark, tmp_path)
    src = str(tmp_path / "in")
    write_batch_file(src, [format_privmsg(1, "u", "c", "apple apple banana")], 1)
    raw = spark.readStream.format("text").load(src)
    q = SW.run_snapshot_query(
        SW.streaming_word_counts(raw),
        store,
        "wc",
        os.path.join(str(tmp_path), "ckpt_snap"),
    )
    try:
        q.processAllAvailable()
        write_batch_file(src, [format_privmsg(2, "u", "c", "apple cherry")], 2)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["word"]: r["cnt"]
        for r in store.get_table("wc", SW.COUNT_SCHEMA).collect()
    }
    assert got == {"apple": 3, "banana": 1, "cherry": 1}


def test_streaming_upsert_sink_is_per_key(spark, tmp_path):
    """The native-upsert sink must produce the same final state as the
    snapshot sink while writing only changed keys per batch."""
    import os

    from spark_streaming_twitch_analytics_spark.sources.irc import (
        format_privmsg,
        write_batch_file,
    )
    from spark_streaming_twitch_analytics_spark.streaming import wordcount as SW

    store = make_store("redis", spark, tmp_path)
    src = str(tmp_path / "in")
    write_batch_file(src, [format_privmsg(1, "u", "c", "apple apple banana")], 1)
    raw = spark.readStream.format("text").load(src)
    q = SW.run_upsert_query(
        SW.streaming_word_counts(raw),
        store,
        "wc",
        os.path.join(str(tmp_path), "ckpt_up"),
        key_column="word",
    )
    try:
        q.processAllAvailable()
        write_batch_file(src, [format_privmsg(2, "u", "c", "apple cherry")], 2)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["word"]: r["cnt"]
        for r in store.get_table("wc", SW.COUNT_SCHEMA).collect()
    }
    assert got == {"apple": 3, "banana": 1, "cherry": 1}


def test_real_redis_round_trip(spark, tmp_path):
    redis = pytest.importorskip("redis")  # absent in this container → skip
    client = redis.Redis(decode_responses=True)
    try:
        client.ping()
    except Exception:
        pytest.skip("no redis server on localhost:6379")
    store = RedisKVTableStore(
        spark, prefix="sgtest:", checkpoint_root=str(tmp_path / "ckpt")
    )
    try:
        store.write(spark.createDataFrame([("a", 1)], COUNT_SCHEMA), "t")
        got = store.get_table("t", COUNT_SCHEMA).collect()
        assert [(r["word"], r["count"]) for r in got] == [("a", 1)]
    finally:
        store.delete("t")
