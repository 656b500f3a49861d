"""Incremental aggregate merge — the reference's ``update_table``
(``RedisInterface.scala:61-73``): FULL OUTER equi-join of a stored
aggregate with a new partial aggregate, ``na.fill(0)``, sum, drop temps.

This is hand-rolled partial/final aggregation merge; in the streaming
rebuild Spark's state store does it (``streaming/``), but it stays a
first-class batch operator because restore-merge-snapshot cycles against
an external store need it.

Scale: both sides keyed on ``join_key`` → one shuffle each, sort-merge
join; AQE converts to broadcast when one side is small (the common case:
the per-batch partial is tiny vs the accumulated table). Pass
``broadcast_incoming=True`` to force it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def update_table(
    stored: DataFrame,
    incoming: DataFrame,
    join_key: str,
    sum_key: str,
    broadcast_incoming: bool = False,
) -> DataFrame:
    inc = incoming.withColumnRenamed(sum_key, "__incoming")
    if broadcast_incoming:
        inc = F.broadcast(inc)
    return (
        stored.withColumnRenamed(sum_key, "__stored")
        .join(inc, [join_key], "full_outer")
        .na.fill(0, ["__stored", "__incoming"])
        .withColumn(sum_key, F.col("__stored") + F.col("__incoming"))
        .drop("__stored", "__incoming")
    )


def update_table_sql(stored_rel: str, incoming_rel: str, join_key: str, sum_key: str) -> str:
    return f"""
SELECT COALESCE(a.{join_key}, b.{join_key}) AS {join_key},
       COALESCE(a.{sum_key}, 0) + COALESCE(b.{sum_key}, 0) AS {sum_key}
FROM ({stored_rel}) a FULL OUTER JOIN ({incoming_rel}) b
  ON a.{join_key} = b.{join_key}"""


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    broadcast_changes: bool = False,
) -> DataFrame:
    """CDC upsert (extension — no reference counterpart): apply a change
    feed to a keyed base table and return the new table contents.

    ``changes`` must carry every ``base`` column plus ``op_col``; the
    winning change per key is the one with the highest ``seq_cols``
    (descending, left-to-right). Semantics per key:

    - latest op == ``delete_op`` → key disappears,
    - latest op != ``delete_op`` → that change's row replaces (or
      inserts) the base row,
    - key absent from ``changes`` → base row kept unchanged.

    Rows with a NULL ``op_col`` are rejected up front (both engines):
    left in, a NULL op fails the ``!= delete_op`` filter while its key
    still anti-joins the base row away — a malformed feed row would
    silently DELETE the record instead of surfacing as bad input.

    Scale shape: one shuffle of the (small) change feed for the
    latest-per-key window, then a LEFT ANTI join of the base against the
    touched-key set — with ``broadcast_changes=True`` the touched keys
    broadcast and the 100 TB base never reshuffles; the upsert rows
    union in for free (no sort, no full-table rewrite plan)."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in seq_cols])
    latest = (
        changes.filter(F.col(op_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    touched = latest.select(*keys)
    if broadcast_changes:
        touched = F.broadcast(touched)
    survivors = base.join(touched, keys, "left_anti")
    upserts = latest.filter(F.col(op_col) != delete_op).select(*base.columns)
    return survivors.unionByName(upserts)


def apply_changes_sql(
    base_rel: str,
    changes_rel: str,
    keys: list[str],
    seq_cols: list[str],
    out_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> str:
    ks = ", ".join(keys)
    order = ", ".join(f"{c} DESC" for c in seq_cols)
    cols = ", ".join(out_cols)
    on = " AND ".join(f"b.{k} = l.{k}" for k in keys)
    return f"""
WITH __latest AS (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY {ks} ORDER BY {order}) AS __rn
    FROM ({changes_rel}) c WHERE {op_col} IS NOT NULL) WHERE __rn = 1)
SELECT {cols} FROM ({base_rel}) b
WHERE NOT EXISTS (SELECT 1 FROM __latest l WHERE {on})
UNION ALL
SELECT {cols} FROM __latest WHERE {op_col} <> '{delete_op}'"""
