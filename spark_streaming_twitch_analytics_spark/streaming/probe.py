"""Streaming-throughput measurement: the reference's flagship modality
(IRC lines → parse → tokenize → stateful running word count → KV
snapshot sink) timed end-to-end from query start to drain.

Shared by ``tools/stream_probe.py`` (ad-hoc CLI) and ``bench.py`` (one
pinned-protocol run per round, reported as ``streaming_lines_per_sec``
in ``BENCH_rN.json`` so streaming perf regressions are visible
round-over-round, not just in SCALING.md prose).

Context for the number: the reference's operating point is one Twitch
IRC channel ≈ O(10-100) messages/sec; a busy channel peaks ~1k/s
(SparkRunner.scala batch interval = seconds). The single-node figure
here is the same dataflow sustaining orders of magnitude more, with
per-batch state-snapshot writes included.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Pinned bench protocol (see BASELINE.md "Streaming throughput probe"):
# replicate the sf documents table 20x and split into 10 text files =
# 10 micro-batches. At sf0.1 that is ~100k lines in ~10k-line batches.
BENCH_REPLICATE = 20
BENCH_N_FILES = 10


def measure_stream_throughput(
    spark: SparkSession,
    sf_dir: str,
    replicate: int = BENCH_REPLICATE,
    n_files: int = BENCH_N_FILES,
    runs: int = 3,
) -> dict:
    """Run the complete flagship stream over a replicated corpus and
    return ``{"lines", "files", "wall_sec", "wall_sec_runs",
    "lines_per_sec", "lines_per_sec_runs", "spread", "distinct_words"}``.
    Wall time spans query start → drain (``processAllAvailable``),
    including every state-store commit and complete-mode snapshot write.

    The reported ``lines_per_sec`` is the MEDIAN of ``runs`` full
    replays (fresh checkpoint + KV dir each, same source files): the r7
    round artifacts showed single-shot numbers swinging ~2× on this
    multi-tenant host (4,199 vs 7,490 lines/s on an unchanged
    protocol), so one sample can't regression-track anything. The
    per-run times and max/min ``spread`` ship alongside so a reader can
    judge whether a round-over-round delta exceeds the measured noise."""
    from ..operators.messages import synth_raw_lines
    from ..sources.kv_store import KVTableStore
    from ..streaming.wordcount import run_snapshot_query, streaming_word_counts
    from ..tables import load_table

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
        walls: list[float] = []
        n_words = 0
        for i in range(runs):
            store = KVTableStore(spark, os.path.join(work, f"kv{i}"))
            t0 = time.time()
            query = run_snapshot_query(
                counts, store, "probe_wordcount", os.path.join(work, f"ckpt{i}")
            )
            query.processAllAvailable()
            walls.append(time.time() - t0)
            query.stop()
            n_words = store.get_table("probe_wordcount", counts.schema).count()
        med = sorted(walls)[len(walls) // 2]
        return {
            "lines": total,
            "files": n_files,
            "wall_sec": round(med, 2),
            "wall_sec_runs": [round(w, 2) for w in walls],
            "lines_per_sec": round(total / med, 1),
            "lines_per_sec_runs": [round(total / w, 1) for w in walls],
            "spread": round(max(walls) / min(walls), 2),
            "distinct_words": n_words,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
