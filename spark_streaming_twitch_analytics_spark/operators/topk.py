"""Top-K operators (reference O1-O3, ``ProcessingWorkSheet.sc:102-114``).

Three forms, by scale regime:

- :func:`top_k` — global sort-desc + limit. Catalyst plans
  ``TakeOrderedAndProject``: each partition keeps a K-heap, the driver
  merges K·partitions rows — no global sort, safe at any scale for
  modest K.
- :func:`top_k_per_group` — ``row_number`` over a window; one shuffle on
  the group key. The scalable replacement for per-group collect+limit.
- :func:`top_k_semi_join` — the reference's ``collect()`` whitelist
  pattern (O3) replaced by a broadcast LEFT SEMI join so the whitelist
  never leaves the cluster.

All take explicit tie-break columns: a top-K without a total order is
nondeterministic under ties, which would break oracle comparison (and
real reproducibility).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_desc: str, k: int, tiebreak: list[str]) -> DataFrame:
    return df.orderBy(F.desc(order_desc), *[F.asc(c) for c in tiebreak]).limit(k)


def top_k_sql(rel: str, order_desc: str, k: int, tiebreak: list[str]) -> str:
    tb = ", ".join(f"{c} ASC" for c in tiebreak)
    return f"SELECT * FROM ({rel}) ORDER BY {order_desc} DESC, {tb} LIMIT {k}"


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_desc: str,
    k: int,
    tiebreak: list[str],
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(order_desc), *[F.asc(c) for c in tiebreak]
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_k_per_group_sql(
    rel: str,
    group_cols: list[str],
    order_desc: str,
    k: int,
    tiebreak: list[str],
    rank_col: str = "rn",
) -> str:
    part = ", ".join(group_cols)
    tb = ", ".join(f"{c} ASC" for c in tiebreak)
    return (
        f"SELECT * FROM (SELECT *, CAST(row_number() OVER "
        f"(PARTITION BY {part} ORDER BY {order_desc} DESC, {tb}) AS INT) "
        f"AS {rank_col} FROM ({rel})) WHERE {rank_col} <= {k}"
    )


def top_k_semi_join(df: DataFrame, whitelist: DataFrame, on: str) -> DataFrame:
    """Keep rows whose ``on`` value appears in ``whitelist`` — the
    distributed form of the reference's collect-to-driver whitelist
    (``ProcessingWorkSheet.sc:113-114``)."""
    return df.join(F.broadcast(whitelist.select(on).distinct()), on, "left_semi")
