"""As-of join — an operator Spark lacks natively (SURVEY §2.4 notes the
reference has only one join; this is a scale extension).

Implemented as union + window (``last_value ignorenulls`` over an
event-time ordering) — pure JVM, whole-stage-codegen'd, ONE shuffle on
the key. The per-group ``pd.merge_asof`` route (``applyInPandas``) would
serialize every row through Arrow; the union trick keeps the hot path
columnar and scales to arbitrarily many rows per key (state is one
running value per window, not a per-group pandas frame).

Semantics: for each left row, attach the right value with the greatest
``right_ts <= left_ts`` for the same key (right rows must be unique per
(key, ts) — pre-aggregate if not). Matches DuckDB's ``ASOF LEFT JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """Left as-of join: all left columns + ``out_col`` (nullable when no
    right row precedes)."""
    # the right value rides inside a struct so a right row whose VALUE is
    # NULL is still a non-null marker: bare last(value, ignorenulls) would
    # skip it and attach an older, stale value — DuckDB ASOF returns the
    # NULL from the latest preceding row
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.struct(F.col(value_col).alias("v")).alias("__rv"),
        F.lit(1).alias("__is_right"),
    )
    l = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__is_right", F.lit(0)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal timestamps so `<=` holds
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("__t"), F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        out_col, F.last("__rv", ignorenulls=True).over(w)["v"]
    )
    return filled.filter(F.col("__is_right") == 0).drop(
        "__t", "__is_right", "__rv"
    )
