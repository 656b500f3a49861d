"""Streaming-throughput probe: the reference's flagship modality measured
end-to-end.

Feeds IRC-wire-format lines (synthesized from the sf documents table,
replicated to the requested volume) through the COMPLETE streaming
pipeline — file source → parse → tokenize/stopwords → explode → running
word count (state store) → complete-mode snapshot sink to the KV store —
split across micro-batch files, and reports lines/sec from query start
to drain.

Context for the number: the reference's operating point is one Twitch
IRC channel ≈ O(10-100) messages/sec; a busy channel peaks ~1k/s. The
single-node figure printed here is the same dataflow sustaining orders
of magnitude more, with per-batch state-snapshot writes included.

Usage: python tools/stream_probe.py [sf_dir] [replicate] [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark.operators.messages import synth_raw_lines
from spark_streaming_twitch_analytics_spark.session import get_spark
from spark_streaming_twitch_analytics_spark.sources.kv_store import KVTableStore
from spark_streaming_twitch_analytics_spark.streaming.wordcount import (
    run_snapshot_query,
    streaming_word_counts,
)
from spark_streaming_twitch_analytics_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="stream_probe")
    work = tempfile.mkdtemp(prefix="stream_probe_")
    src_dir = os.path.join(work, "lines")
    try:
        docs = load_table(spark, sf_dir, "documents")
        # replicate the corpus to the probe volume (distinct doc ids so
        # the synthesized users/timestamps vary) and lay it out as
        # n_files text files = n_files micro-batches
        n_docs = docs.count()
        rep = docs.crossJoin(
            spark.range(replicate).select(F.col("id").alias("rep"))
        ).withColumn("doc_id", F.col("doc_id") + F.col("rep") * n_docs)
        lines = synth_raw_lines(rep)
        total = n_docs * replicate
        lines.repartition(n_files).write.mode("overwrite").text(src_dir)

        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(src_dir)
        )
        counts = streaming_word_counts(raw)
        store = KVTableStore(spark, os.path.join(work, "kv"))
        t0 = time.time()
        query = run_snapshot_query(
            counts, store, "probe_wordcount", os.path.join(work, "ckpt")
        )
        query.processAllAvailable()
        wall = time.time() - t0
        query.stop()
        n_words = store.get_table(
            "probe_wordcount", counts.schema
        ).count()
        print(
            f"lines={total} files={n_files} wall={wall:.1f}s "
            f"throughput={total / wall:,.0f} lines/s "
            f"distinct_words={n_words}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
