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


def running_count_tws(
    words: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    :func:`running_count_with_expiry` — the Spark 4 successor API
    (SPARK-49564 ``StatefulProcessor``): named state variables instead of
    one state tuple, explicit per-key timers instead of a single timeout
    conf, and RocksDB-only state backend (the production state store for
    100 TB key domains — the test pins
    ``spark.sql.streaming.stateStore.providerClass`` accordingly).

    Same output contract: update-mode running counts, plus a terminal
    ``expired=true`` row when a key's idle timer fires and state drops.

    Runtime dependency: the TWS state-server protocol needs the
    ``protobuf`` package on driver and executors (absent in the test
    container, so the pytest for this operator self-skips there;
    ``applyInPandasWithState`` above is the dependency-free fallback
    with identical semantics).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    idle = idle_timeout_ms

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._cnt = handle.getValueState("cnt", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            new = sum(len(pdf) for pdf in rows)
            cnt = (self._cnt.get()[0] if self._cnt.exists() else 0) + new
            self._cnt.update((cnt,))
            if idle is not None:
                for ts in list(self._handle.listTimers()):  # re-arm
                    self._handle.deleteTimer(ts)
                self._handle.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs() + idle
                )
            yield pd.DataFrame({"word": [key[0]], "cnt": [cnt], "expired": [False]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            cnt = self._cnt.get()[0] if self._cnt.exists() else 0
            self._cnt.clear()
            yield pd.DataFrame({"word": [key[0]], "cnt": [cnt], "expired": [True]})

        def close(self) -> None:
            pass

    return words.groupBy("word").transformWithStateInPandas(
        RunningCount(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none" if idle is None else "processingTime",
    )
