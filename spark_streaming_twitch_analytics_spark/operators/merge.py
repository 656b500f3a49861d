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

from pyspark.sql import DataFrame
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
