"""Batch source/sink surface (S5 CSV, S6 single-file parquet, S8 JSON
resource) — the reference's exact read options exercised on fixture data
shaped like FIXTURES §A5."""

from __future__ import annotations

import os

from spark_streaming_twitch_analytics_spark.constants import ENCODER_CLASSES
from spark_streaming_twitch_analytics_spark.sources import io as sio

CSV = '''title,text,discussions,categories
"Page One","body text one","first item< br / >with marker,second
item spanning lines","['Histoire', 'France']"
"Page Two","body two","short,items here","['Science']"
"Page Three",,"x,y",
'''


def test_read_training_csv_multiline_quoted(spark, tmp_path):
    p = str(tmp_path / "train.csv")
    with open(p, "w") as f:
        f.write(CSV)
    df = sio.read_training_csv(spark, p)
    rows = df.collect()
    assert [f.name for f in df.schema.fields] == [
        "title", "text", "discussions", "categories",
    ]
    assert len(rows) == 3
    one = next(r for r in rows if r["title"] == "Page One")
    assert "second\nitem spanning lines" in one["discussions"]  # multiLine
    assert one["categories"] == "['Histoire', 'France']"
    three = next(r for r in rows if r["title"] == "Page Three")
    assert three["text"] is None  # na survives for na.drop (P9)


def test_write_single_parquet(spark, tmp_path, docs):
    out = str(tmp_path / "out")
    sio.write_single_parquet(docs.limit(10), out)
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(parts) == 1  # coalesce(1) → one data file
    assert spark.read.parquet(out).count() == 10


def test_write_partitioned_parquet_scale_path(spark, tmp_path, docs):
    out = str(tmp_path / "out_part")
    sio.write_single_parquet(docs, out, single_file=False, partition_by=["lang"])
    langs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert langs == {r["lang"] for r in docs.select("lang").distinct().collect()}


def test_label_map_resource_roundtrip(spark):
    m = sio.load_label_map()
    assert len(m) == 50 and m[0] == ENCODER_CLASSES[0] and m[49] == ENCODER_CLASSES[49]
    b = sio.broadcast_label_map(spark)
    assert b.value[7] == ENCODER_CLASSES[7]
    b.unpersist()


def test_jsonl_roundtrip_schema_enforced(spark, tmp_path):
    from pyspark.sql import types as T

    from spark_streaming_twitch_analytics_spark.sources.io import (
        read_jsonl,
        write_jsonl,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    df = spark.createDataFrame([(1, "a b"), (2, "c")], schema)
    p = str(tmp_path / "docs.jsonl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, schema)
    assert back.schema == schema
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [(1, "a b"), (2, "c")]


def test_clustered_parquet_files_have_disjoint_ranges(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from spark_streaming_twitch_analytics_spark.sources.io import (
        write_clustered_parquet,
    )

    df = spark.range(0, 10_000).selectExpr(
        "pmod(hash(id), 1000) AS k", "id AS payload"
    )
    p = str(tmp_path / "clustered")
    write_clustered_parquet(df, p, "k", 8, sort_cols=["payload"])
    spans = []
    for f in glob.glob(f"{p}/part-*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) == 8
    # contiguous non-overlapping ranges: every file's min exceeds the
    # previous file's max → a point/range predicate prunes to one file
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    from pyspark.sql import types as T

    from spark_streaming_twitch_analytics_spark.sources.io import read_jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nnot json at all\n{"doc_id": 2, "text": "fine"}\n')
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    rows = read_jsonl(spark, str(p), schema).collect()
    good = [(r.doc_id, r.text) for r in rows if r._corrupt_record is None]
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert sorted(good) == [(1, "ok"), (2, "fine")]
    assert bad == ["not json at all"]


def test_zorder_clustering_bounds_both_columns_per_file(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.sources.io import (
        write_clustered_parquet,
        zorder_key,
    )

    # two independent uniform columns in [0, 256)
    df = spark.range(0, 20_000).selectExpr(
        "pmod(hash(id), 256) AS x", "pmod(hash(id * 7 + 1), 256) AS y"
    )
    z = df.withColumn("z", zorder_key(F.col("x"), F.col("y"), bits=8))
    p = str(tmp_path / "zordered")
    write_clustered_parquet(z, p, "z", 16)

    # per-file spans of BOTH x and y must be far below the global span:
    # that's what lets footer stats prune on either column
    spans_x, spans_y = [], []
    for f in glob.glob(f"{p}/part-*.parquet"):
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
        spans_x.append(max(xs) - min(xs))
        spans_y.append(max(ys) - min(ys))
    assert len(spans_x) == 16
    # 16 z-clustered files tile a 256x256 grid into ~64x64 squares-ish
    # regions; allow generous slack over the ideal span of 64
    assert sum(spans_x) / len(spans_x) < 256 * 0.75
    assert sum(spans_y) / len(spans_y) < 256 * 0.75


def test_orc_round_trip_preserves_rows_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.sources.io import read_orc, write_orc
    from spark_streaming_twitch_analytics_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(d, path)
    back = read_orc(spark, path)
    assert back.count() == d.count()
    assert sorted(back.columns) == sorted(d.columns)
    # hash parity with the parquet original (same rows, any order)
    h = lambda df: df.select(F.md5(F.concat_ws("\x1f", *sorted(df.columns))).alias("h")) \
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint"))).head()[0]
    assert h(back) == h(d)
    # filter pushdown reaches the ORC scan
    plan = back.filter(F.col("n_chars") > 200).select("doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(n_chars)" in plan


def test_training_shards_layout_is_sharded_sorted_and_complete(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.sources.io import write_training_shards
    from spark_streaming_twitch_analytics_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    path = str(tmp_path / "shards")
    write_training_shards(d, path, n_shards=16)
    back = spark.read.parquet(path)
    assert back.count() == d.count()  # complete: every doc in exactly one shard
    assert back.select("shard").distinct().count() == 16
    # shard dir pruning: a shard-predicate scan reads only that partition
    one = spark.read.parquet(path).filter(F.col("shard") == 3)
    assert one.count() == back.filter("shard = 3").count()
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan
    # within-file training order: rows of one physical file are sorted by skey
    rows = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .filter(F.col("shard") == 3)
        .collect()
    )
    by_file = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["skey"])
    for keys in by_file.values():
        assert keys == sorted(keys)
    # shard assignment matches the corpus_shuffle_shards report hash
    from spark_streaming_twitch_analytics_spark.sources.io import (
        epoch_shuffle_key,
        shard_of,
    )

    expected_shard = shard_of(epoch_shuffle_key("doc_id"), 16)
    mismatches = (
        back.join(d.select("doc_id", expected_shard.alias("want")), "doc_id")
        .filter(F.col("shard") != F.col("want"))
        .count()
    )
    assert mismatches == 0


def test_irc_reader_framing_offsets_and_replay():
    """Driver-side live-reader bookkeeping, no network: byte-buffer line
    framing (partial lines held, buffered lines all surfaced), PRIVMSG
    filtering + leading-colon normalization, retained-log replay of
    uncommitted offsets, and pruning on commit."""
    from spark_streaming_twitch_analytics_spark.sources.irc import (
        HAS_DATASOURCE_API,
        _IRCStreamReader,
        format_stored_line,
    )

    assert HAS_DATASOURCE_API
    r = _IRCStreamReader({}, connect=False)
    # one TCP segment carrying two complete messages + a partial third
    r.rx += (
        b":a!a@h PRIVMSG #c :hello there\r\n"
        b"PING :tmi\r\n"
        b":b!b@h PRIVMSG #c :second msg\r\nPARTIAL"
    )
    r._drain_rx()
    assert r.next_seq == 2  # PING and the partial line are not stored
    assert r.rx == b"PARTIAL"
    rows, off = r.read({"n": 0})
    rows = list(rows)
    assert off == {"n": 2} and len(rows) == 2
    # leading ':' stripped → colon-split parser sees metadata at item 1
    ms, meta, text = rows[0][0].split(":", 2)
    assert meta == "a!a@h PRIVMSG #c " and text == "hello there"
    # replay of the uncommitted range returns the SAME rows
    assert list(r.readBetweenOffsets({"n": 0}, {"n": 2})) == rows
    # completing the partial line on the next segment
    r.rx += b" line PRIVMSG #c :tail\r\n"
    r._drain_rx()
    assert r.next_seq == 3
    # commit prunes only below the committed offset
    r.commit({"n": 2})
    assert [s for s, _ in r.log] == [2]
    assert list(r.readBetweenOffsets({"n": 2}, {"n": 3}))
    # non-PRIVMSG lines are ignored by the normalizer too
    assert format_stored_line(":tmi 001 nick :welcome") is None


def test_kv_append_preserves_ttl(spark, tmp_path):
    import pyspark.sql.types as T

    from spark_streaming_twitch_analytics_spark.sources.kv_store import KVTableStore

    store = KVTableStore(spark, str(tmp_path / "kv"))
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    store.write(df, "t", ttl=3600)
    store.write(df, "t", mode="append")  # bare append: ttl must survive
    meta = store._load_meta("t")
    assert meta["ttl"] == 3600
    schema = T._parse_datatype_string("k string, v int")
    assert store.get_table("t", schema).count() == 2


def test_orc_roundtrip_stats_query_matches_source(spark, docs):
    """The registered ORC round-trip query's checksums must equal the
    same aggregate computed directly on the source parquet — value
    fidelity through the second columnar format, not just row counts."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark import registry

    got = registry.get("orc_roundtrip_stats").fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    want = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_ids"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum("doc_id").alias("id_sum"),
    ).collect()[0]
    assert got.asDict() == want.asDict()


def test_jsonl_roundtrip_stats_query_matches_source(spark, docs):
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark import registry

    got = registry.get("jsonl_roundtrip_stats").fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    needs_escape = (
        F.col("text").contains('"')
        | F.col("text").contains("\\")
        | F.col("text").contains("\n")
    )
    want = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_ids"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum(F.when(needs_escape, 1).otherwise(0)).alias("n_escaped"),
    ).collect()[0]
    assert got.asDict() == want.asDict()
