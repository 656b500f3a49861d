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


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input so an expensive per-row
    stage (hash digests, vectorized scoring) runs at full cluster width.

    Widen-only: inputs already at/above the target pass through
    untouched. At 100 TB the scan yields thousands of splits and this is
    a no-op; locally a sub-128MB parquet arrives as ONE split and would
    otherwise serialize the whole digest stage onto one core (measured:
    3.1s → 0.5s for the simhash64 digest at sf0.1 on local[32]). The
    shuffle moves only the raw rows — cheap relative to the per-row work
    it parallelizes."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def salted_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """groupBy(key).count() with a salt stage; result is identical to the
    plain count (and oracle-checked as such)."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("cnt"))
