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


def scd2_history(
    events: DataFrame,
    keys: list[str],
    attr_col: str,
    seq_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an append-only
    change log: collapse consecutive no-change rows per key, then emit
    one versioned row per surviving change with a [valid_from, valid_to)
    interval (open-ended for the current version).

    Counterpart of the reference's overwrite-only table updates
    (``RedisInterface.scala:9-31`` keeps only the latest state): this
    keeps the full audit history, the shape every warehouse dimension
    load needs.

    Scale: both windows (the change-detection lag and the interval
    lead/version) partition by the SAME keys, so Catalyst reuses one
    exchange — a single shuffle of the change log regardless of history
    depth. No driver state; skewed keys fall to AQE.
    """
    order = [F.col(c).asc() for c in (ts_col, *seq_cols)]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(attr_col)).over(w)
    changed = events.withColumn("__prev", prev).filter(
        F.col("__prev").isNull() | (F.col(attr_col) != F.col("__prev"))
    )
    return changed.select(
        *keys,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
        F.lead(F.col(ts_col)).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("int").alias("version"),
    )


def scd2_history_sql(
    events_rel: str,
    keys: list[str],
    attr_col: str,
    seq_cols: list[str],
    ts_col: str,
) -> str:
    """DuckDB twin of :func:`scd2_history` (same change-collapse and
    interval semantics; `is_current` boolean on both engines)."""
    ks = ", ".join(keys)
    order = ", ".join([ts_col, *seq_cols])
    return f"""
WITH __o AS (
  SELECT *, lag({attr_col}) OVER (PARTITION BY {ks} ORDER BY {order}) AS __prev
  FROM ({events_rel})),
__chg AS (
  SELECT * FROM __o WHERE __prev IS NULL OR {attr_col} <> __prev)
SELECT {ks}, {attr_col},
  {ts_col} AS valid_from,
  lead({ts_col}) OVER (PARTITION BY {ks} ORDER BY {order}) AS valid_to,
  lead({ts_col}) OVER (PARTITION BY {ks} ORDER BY {order}) IS NULL AS is_current,
  CAST(row_number() OVER (PARTITION BY {ks} ORDER BY {order}) AS INT) AS version
FROM __chg"""
