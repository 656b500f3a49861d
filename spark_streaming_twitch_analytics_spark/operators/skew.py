"""Skew-mitigation operators.

AQE's skew-join splitting handles most cases automatically
(``session.py`` enables it); salting is the manual lever for skewed
AGGREGATIONS whose hot keys overwhelm a single reducer even after
partial aggregation (e.g. high-cardinality payloads per key, or
``collect_list``-style aggs with no partial form).

:func:`salted_count` demonstrates the two-phase shape:
key → (key, salt) partial agg → strip salt → final agg. The hot key's
rows spread across ``salt_buckets`` reducers in phase 1; phase 2 merges
``salt_buckets`` rows per key — negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """groupBy(key).count() with a salt stage; result is identical to the
    plain count (and oracle-checked as such)."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("cnt"))
