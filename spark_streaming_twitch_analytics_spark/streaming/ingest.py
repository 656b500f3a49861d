"""Streaming corpus ingestion: the end-to-end training-data intake path.

Composes the batch corpus operators into one ``foreachBatch`` pipeline
over a document stream — the shape a 100 TB pretraining pipeline runs
continuously against a crawl firehose:

    stream of raw docs
      → quality/token-band/repetition filters       (narrow, map-side)
      → near-dup match vs the EXISTING corpus       (MinHash bands;
        the micro-batch side is broadcast — the corpus never reshuffles)
      → survivors appended to the keep store        (KVTableStore)

Per-batch dedup state is the *static corpus bands*, computed once and
persisted — each micro-batch joins against it map-side. New survivors
are NOT added to the in-session band index (batch-local dedup plus a
nightly compaction re-index is the standard trade; doing it in-stream
would require a mutable broadcast). Duplicates *within* one micro-batch
are still caught by ``dropDuplicates`` on the exact text hash.

Oracle (tests/test_streaming_ingest.py): streaming the corpus through in
N micro-batches must yield exactly the rows the equivalent BATCH
pipeline keeps — SURVEY §5's stream≡batch equivalence contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions import text as X
from ..operators import dedup
from ..sources.kv_store import checkpoint_lineage


def clean_batch(
    batch: DataFrame,
    min_quality: float = 0.3,
    min_toks: int = 5,
    max_toks: int = 100000,
    max_dup_word_frac: float = 0.7,
) -> DataFrame:
    """Map-side intake filters: exact-dup collapse within the batch,
    quality floor, token band, Gopher-style repetition gate (duplicate-
    word fraction ≤ ``max_dup_word_frac`` — a sort+fold over the row's
    own tokens, still narrow). Returns (doc_id, text, n_toks, quality)."""
    toks = X.tokenize(F.col("text"))
    # exact-dup collapse keeps min(doc_id) — dropDuplicates would keep an
    # arbitrary survivor, breaking the stream≡batch equivalence whenever
    # duplicate texts carry distinct doc_ids (same canonical convention
    # as dedup.exact_dup_groups)
    import pyspark.sql.window as W

    rn = F.row_number().over(
        W.Window.partitionBy("text").orderBy(F.asc("doc_id"))
    )
    deduped = (
        batch.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
    )
    return (
        deduped
        .select(
            "doc_id",
            "text",
            F.size(toks).cast("int").alias("n_toks"),
            X.quality_score(F.col("text"), toks, "en").alias("quality"),
            X.dup_word_frac(toks).alias("dup_frac"),
        )
        .filter(
            (F.col("quality") >= min_quality)
            & F.col("n_toks").between(min_toks, max_toks)
            & (F.col("dup_frac") <= max_dup_word_frac)
        )
        .drop("dup_frac")
    )


def corpus_band_index(corpus: DataFrame) -> DataFrame:
    """The static dedup state: (doc_id, band, key) MinHash bands of the
    existing corpus. Persist this once; every micro-batch joins it."""
    return dedup.minhash_bands(corpus)


def drop_near_dups(
    batch: DataFrame, corpus_bands: DataFrame, min_jaccard_band_hit: bool = True
) -> DataFrame:
    """Anti-join the (small) micro-batch against the corpus band index:
    a batch doc sharing any LSH band with a corpus doc is treated as a
    near-dup and dropped. The batch side is broadcast — the corpus
    bands never move."""
    batch_bands = dedup.minhash_bands(batch).select(
        F.col("doc_id").alias("b_id"), "band", "key"
    )
    # INNER join with the broadcast batch on the build side: Spark cannot
    # build-left a LEFT SEMI broadcast join (the hint is silently dropped
    # and the corpus side would shuffle every micro-batch); broadcast-left
    # inner is plannable and the distinct collapses multi-band hits
    hits = (
        F.broadcast(batch_bands)
        .join(corpus_bands, ["band", "key"])
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    return batch.join(hits, "doc_id", "left_anti")


def run_corpus_ingest(
    stream_docs: DataFrame,
    corpus_bands: DataFrame,
    store,
    table: str = "corpus_keep",
    min_quality: float = 0.3,
    min_toks: int = 5,
    max_toks: int = 100000,
    metrics: list[dict] | None = None,
    available_now: bool = False,
):
    """Start the ingestion query: clean → near-dup drop → append to the
    keep store. Returns the StreamingQuery (caller stops it).

    ``available_now=True`` runs the stream in drain mode
    (``Trigger.AvailableNow``): process everything currently in the
    source — rate-limited into micro-batches by the source's own options
    (e.g. ``maxFilesPerTrigger``) — then stop, with the same checkpoint
    and exactly-once bookkeeping as the continuous mode. This is the
    nightly-batch deployment of the ingest pipeline: one code path for
    both continuous intake and scheduled backfill.

    Pass a list as ``metrics`` to collect one dict per micro-batch —
    ``{epoch, rows_in, rows_kept, avg_quality}`` — via ``df.observe``:
    the counters ride the write action itself (no second pass over the
    batch), which is the only affordable way to monitor data-quality
    yield on a 100 TB intake stream."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # exactly-once guard: foreachBatch is at-least-once; a replayed
        # epoch (crash between sink write and checkpoint commit) must not
        # append its survivors twice (same pattern as apply_delta_once)
        lin = checkpoint_lineage(store.checkpoint_dir(table))
        if epoch_id <= store.last_applied_epoch(table, lineage=lin):
            return
        obs_in = Observation()
        obs_kept = Observation()
        kept = drop_near_dups(
            clean_batch(
                batch_df.observe(obs_in, F.count(F.lit(1)).alias("n")),
                min_quality,
                min_toks,
                max_toks,
            ),
            corpus_bands,
        ).observe(
            obs_kept,
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        store.write(
            kept,
            table,
            mode="append",
            epoch=epoch_id,
            lineage=lin,
        )
        if metrics is not None:
            metrics.append(
                {
                    "epoch": epoch_id,
                    "rows_in": obs_in.get["n"],
                    "rows_kept": obs_kept.get["n"],
                    "avg_quality": obs_kept.get["avg_quality"],
                }
            )

    writer = stream_docs.writeStream.foreachBatch(sink).option(
        "checkpointLocation", store.checkpoint_dir(table)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
