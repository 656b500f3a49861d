"""Streaming relational extensions beyond the reference's surface
(which had no joins and no dedup on the stream — SURVEY §2.4/§A5):

- :func:`enrich_with_dim` — stream-static join. The static side is
  broadcast, so each micro-batch enriches map-side: no shuffle of the
  stream, no state. The 100 TB shape for attaching a label/user/channel
  dimension to an event firehose.
- :func:`dedup_stream` — watermarked streaming deduplication
  (``dropDuplicatesWithinWatermark``): exactly-once-per-id emission with
  state BOUNDED by the watermark horizon. The training-data ingestion
  guard: upstream retries/replays collapse to one row as long as the
  duplicate arrives within the delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(stream_df: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Left-join a streaming frame against a static dimension on ``key``.
    The dimension is explicitly broadcast — a shuffled join would
    re-partition every micro-batch."""
    return stream_df.join(F.broadcast(dim), key, "left")


def dedup_stream(
    events: DataFrame, id_cols: list[str], ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Drop duplicate ids arriving within the watermark horizon. State
    holds one entry per id seen in the last ``delay`` of event time and
    is evicted as the watermark advances — unlike a bare
    ``dropDuplicates`` on a stream, whose state grows forever."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(id_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on ``key`` where the right event lands in
    ``[left_ts, left_ts + within]`` — the click-joins-impression shape.

    Both sides are watermarked, and the time-interval condition is what
    BOUNDS the join state: each side buffers only rows whose window can
    still match under the other side's watermark, then evicts. Without
    the interval condition Spark must keep every row forever (unbounded
    state — the same trap as the reference's ``updateStateByKey``).
    Right columns are suffixed ``_r``.

    ``how='left_outer'`` emits an unmatched left row (NULL right side)
    only once the watermark CERTIFIES no future right row can land in
    its interval — so outer results are late by one watermark horizon,
    the price of correctness on an unbounded stream.
    """
    r = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns]
    ).withWatermark(f"{right_ts}_r", watermark)
    lt, rt = F.col(left_ts), F.col(f"{right_ts}_r")
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return (
        left.withWatermark(left_ts, watermark).join(r, cond, how).drop(f"{key}_r")
    )
