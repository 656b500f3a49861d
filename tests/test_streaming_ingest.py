"""Stream ≡ batch equivalence for the corpus ingestion pipeline
(streaming/ingest.py): streaming the docs through in micro-batches must
keep exactly the rows the equivalent batch pipeline keeps."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_streaming_twitch_analytics_spark.cache import eager_persist, release_all
from spark_streaming_twitch_analytics_spark.sources.kv_store import KVTableStore
from spark_streaming_twitch_analytics_spark.streaming.ingest import (
    clean_batch,
    corpus_band_index,
    drop_near_dups,
    run_corpus_ingest,
)
from spark_streaming_twitch_analytics_spark.tables import load_table

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def write_docs(dir_path: str, batch_id: int, rows: list[tuple[int, str]]):
    os.makedirs(dir_path, exist_ok=True)
    with open(os.path.join(dir_path, f"b{batch_id}.json"), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_stream_ingest_equals_batch_pipeline(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    # corpus = docs with doc_id % 10 != 0; the "incoming crawl" = the rest
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = [
        (r["doc_id"], r["text"])
        for r in docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
        .collect()
    ]
    bands = eager_persist(corpus_band_index(corpus))
    try:
        src = str(tmp_path / "docs")
        mid = len(incoming) // 2
        write_docs(src, 1, incoming[:mid])
        store = KVTableStore(spark, str(tmp_path / "store"))
        stream = spark.readStream.schema(DOC_SCHEMA).json(src)
        q = run_corpus_ingest(stream, bands, store, min_quality=0.3)
        try:
            q.processAllAvailable()
            write_docs(src, 2, incoming[mid:])  # second micro-batch
            q.processAllAvailable()
        finally:
            q.stop()

        got = {
            (r["doc_id"], r["n_toks"], r["quality"])
            for r in store.get_table(
                "corpus_keep",
                T.StructType(
                    [
                        T.StructField("doc_id", T.LongType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("n_toks", T.IntegerType()),
                        T.StructField("quality", T.DoubleType()),
                    ]
                ),
            ).collect()
        }
        # batch oracle over the SAME rows (texts are unique across the two
        # batches, so batch-local exact dedup == global exact dedup here)
        batch_docs = spark.createDataFrame(incoming, DOC_SCHEMA)
        expected = {
            (r["doc_id"], r["n_toks"], r["quality"])
            for r in drop_near_dups(
                clean_batch(batch_docs, min_quality=0.3), bands
            ).collect()
        }
        assert got == expected
        assert expected  # non-degenerate: something survives
        # and the near-dup guard did something at least once across SFs is
        # not guaranteed at this tiny SF — assert the mechanism instead:
        # a doc textually identical to a corpus doc must be dropped
        dup_text = corpus.select("text").filter(F.length("text") > 60).first()["text"]
        probe = spark.createDataFrame([(999999, dup_text)], DOC_SCHEMA)
        survived = drop_near_dups(clean_batch(probe, min_quality=0.0), bands)
        assert survived.count() == 0
    finally:
        release_all()


def test_checkpoint_dir_is_per_table(spark, tmp_path):
    store = KVTableStore(spark, str(tmp_path / "s"))
    a, b = store.checkpoint_dir("t1"), store.checkpoint_dir("t2")
    assert a != b and a.startswith(str(tmp_path / "s"))


def test_ingest_observed_metrics_reconcile(spark, tmp_path):
    """Per-batch df.observe counters must reconcile exactly: rows_in sums
    to the rows streamed, rows_kept sums to the keep-store row count, and
    no second pass over the batch is needed to get them."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = [
        (r["doc_id"], r["text"])
        for r in docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
        .collect()
    ]
    bands = eager_persist(corpus_band_index(corpus))
    try:
        src = str(tmp_path / "docs")
        mid = len(incoming) // 2
        write_docs(src, 1, incoming[:mid])
        store = KVTableStore(spark, str(tmp_path / "store"))
        stream = spark.readStream.schema(DOC_SCHEMA).json(src)
        metrics: list[dict] = []
        q = run_corpus_ingest(stream, bands, store, min_quality=0.3, metrics=metrics)
        try:
            q.processAllAvailable()
            write_docs(src, 2, incoming[mid:])
            q.processAllAvailable()
        finally:
            q.stop()
        assert len(metrics) >= 2
        assert sum(m["rows_in"] for m in metrics) == len(incoming)
        kept_rows = store.get_table(
            "corpus_keep",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("n_toks", T.IntegerType()),
                    T.StructField("quality", T.DoubleType()),
                ]
            ),
        ).count()
        assert sum(m["rows_kept"] for m in metrics) == kept_rows
        for m in metrics:
            if m["rows_kept"]:
                assert 0.3 <= m["avg_quality"] <= 1.0
    finally:
        release_all()


def test_available_now_drains_and_terminates(spark, tmp_path):
    """Drain mode: maxFilesPerTrigger rate-limits the backlog into
    several micro-batches, AvailableNow stops the query by itself once
    the backlog is consumed, and the kept rows equal the batch pipeline
    over the same input."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = [
        (r["doc_id"], r["text"])
        for r in docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
        .collect()
    ]
    bands = eager_persist(corpus_band_index(corpus))
    try:
        src = str(tmp_path / "docs")
        third = len(incoming) // 3
        for i, lo in enumerate(range(0, len(incoming), third or 1)):
            write_docs(src, i, incoming[lo : lo + third])
        store = KVTableStore(spark, str(tmp_path / "store"))
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        metrics: list[dict] = []
        q = run_corpus_ingest(
            stream, bands, store, metrics=metrics, available_now=True
        )
        assert q.awaitTermination(120), "drain query did not self-terminate"
        assert len(metrics) >= 2, "maxFilesPerTrigger should split the backlog"

        incoming_df = spark.createDataFrame(incoming, DOC_SCHEMA)
        expected = drop_near_dups(clean_batch(incoming_df), bands)
        got = store.get_table(
            "corpus_keep",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("n_toks", T.IntegerType()),
                    T.StructField("quality", T.DoubleType()),
                ]
            ),
        )
        assert sorted(r["doc_id"] for r in got.collect()) == sorted(
            r["doc_id"] for r in expected.collect()
        )
    finally:
        release_all()


def test_drop_near_dups_broadcasts_batch_side(spark):
    """The corpus band index (the 100 TB side) must never shuffle: the
    batch side is the broadcast build side of an INNER join (a broadcast
    hint on the left of a LEFT SEMI join is silently dropped by Spark)."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.streaming.ingest import (
        corpus_band_index,
        drop_near_dups,
    )
    from spark_streaming_twitch_analytics_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(20)
    out = drop_near_dups(batch, corpus_band_index(corpus))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BuildLeft" in plan  # the batch (small) side is the build side
    assert out.count() <= 20


def test_clean_batch_keeps_min_doc_id_for_duplicate_texts(spark):
    from spark_streaming_twitch_analytics_spark.streaming.ingest import clean_batch

    rows = [
        (12, "alpha bravo charlie delta echo foxtrot"),
        (7, "alpha bravo charlie delta echo foxtrot"),
        (3, "golf hotel india juliet kilo lima"),
    ]
    out = clean_batch(
        spark.createDataFrame(rows, "doc_id long, text string"), min_quality=0.0
    ).collect()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [3, 7]  # min doc_id survives, deterministically


def test_ingest_sink_skips_replayed_epoch(spark, tmp_path):
    """Exactly-once: re-delivering an epoch must not append twice."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.sources.kv_store import KVTableStore
    from spark_streaming_twitch_analytics_spark.streaming import ingest as I
    from spark_streaming_twitch_analytics_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 10)
    bands = I.corpus_band_index(corpus)
    store = KVTableStore(spark, str(tmp_path / "kv"))
    batch = docs.filter(F.col("doc_id").between(100, 120))

    # drive a foreachBatch-shaped sink directly, as the engine would
    def sink(df, epoch):
        if epoch <= store.last_applied_epoch("corpus_keep"):
            return
        kept = I.drop_near_dups(I.clean_batch(df, min_quality=0.0), bands)
        store.write(kept, "corpus_keep", mode="append", epoch=epoch)

    sink(batch, 0)
    schema = "doc_id long, text string, n_toks int, quality double"
    import pyspark.sql.types as T

    n1 = store.get_table("corpus_keep", T._parse_datatype_string(schema)).count()
    sink(batch, 0)  # replay of the SAME epoch: must be a no-op
    n2 = store.get_table("corpus_keep", T._parse_datatype_string(schema)).count()
    assert n1 == n2 and n1 > 0
    sink(batch, 1)  # a new epoch appends
    n3 = store.get_table("corpus_keep", T._parse_datatype_string(schema)).count()
    assert n3 == 2 * n1
