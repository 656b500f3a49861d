"""Custom stateful streaming operator (SURVEY ST4's arbitrary-state
fallback: ``applyInPandasWithState``).

The plain running count is better served by streaming aggregation
(``wordcount.py`` — state store, no Python). This operator exists for
semantics an aggregate can't express: per-key state with **idle-key
expiry** — a key silent for ``idle_timeout_ms`` of processing time is
evicted and emitted one final time with ``expired=true``. That bounds
state for the unbounded key domains a 100 TB stream has (the reference's
``updateStateByKey`` retained every key forever —
``SparkRunner.scala:171-188`` — which OOMs eventually; SURVEY §7 flags
it).

State flows per key as Arrow batches; the python function sees a bounded
iterator of pandas frames, never the whole partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("expired", T.BooleanType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("cnt", T.LongType())])


def running_count_with_expiry(
    words: DataFrame, idle_timeout_ms: int | None = 60_000
) -> DataFrame:
    """``words`` is a streaming DF with a ``word`` column; output is the
    running count per word in update fashion, plus a terminal
    ``expired=true`` row when a key times out and its state is dropped.

    ``idle_timeout_ms=None`` disables expiry (state grows like the
    reference's). NOTE: with a timeout enabled the engine schedules
    continuous state-cleanup micro-batches, so ``processAllAvailable()``
    never settles — deterministic tests use ``None``; expiry tests poll."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (word,) = key
        if state.hasTimedOut:
            (cnt,) = state.get
            state.remove()
            yield pd.DataFrame({"word": [word], "cnt": [cnt], "expired": [True]})
            return
        new = sum(len(pdf) for pdf in pdfs)
        cnt = (state.get[0] if state.exists else 0) + new
        state.update((cnt,))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({"word": [word], "cnt": [cnt], "expired": [False]})

    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return words.groupBy("word").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
