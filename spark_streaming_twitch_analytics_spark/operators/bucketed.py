"""Bucketed-table layout — shuffle-free co-located joins.

The reference joins only driver-small tables (the running-count merge,
``ProcessingWorkSheet.sc``), so it never needed layout-aware joins. At
100 TB the fact-fact join (orders ⋈ lineitem) is THE dominant shuffle:
both sides move over the network every time the join runs. Bucketing is
Spark's answer — write each side pre-hash-partitioned (and pre-sorted)
by the join key ONCE, and every subsequent join on that key is a
SortMergeJoin with NO Exchange under it, verified in
``tests/test_plans.py``. (Local per-bucket Sorts remain: Spark 3+
stopped trusting bucket sort order —
``spark.sql.legacy.bucketedTableScanOutputOrdering`` defaults false —
but a per-partition sort is CPU-local; the network shuffle is what the
layout eliminates, and that is the 100 TB cost.)

Layout contract: the writer repartitions by the bucket
key into ``n_buckets`` tasks. Spark's ``repartition(n, col)`` and its
bucket assignment use the same hash family (pmod of Murmur3), so each
write task holds exactly one bucket's rows → exactly one file per
bucket. On a real cluster the same holds per partition of a
date-partitioned table; the build cost is one shuffle each, amortized
over every later join/aggregate on the key (the classic
write-once/join-many trade).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _slug(sf_dir: str) -> str:
    return hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]


def atomic_publish(write_fn, path: str) -> None:
    """Race-safe publish of a fingerprint-keyed artifact directory
    (ADVICE r9): writing straight to ``path`` lets two concurrent
    sessions both miss ``_SUCCESS`` and one overwrite the directory
    while the other reads it. Instead, ``write_fn`` writes into a
    unique staging dir on the SAME filesystem, which is then renamed
    into place — POSIX ``rename`` is atomic, and it FAILS (ENOTEMPTY/
    EEXIST) if a concurrent winner already published, in which case the
    loser's copy is discarded. Either copy is valid: the path is keyed
    by a content fingerprint, so both writers produced the same
    artifact. No-op if ``path`` is already published."""
    import shutil

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    parent = os.path.dirname(path) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(
        dir=parent, prefix=os.path.basename(path) + ".stage."
    )
    try:
        staging = os.path.join(tmp, "out")
        write_fn(staging)
        try:
            os.rename(staging, path)
        except OSError:
            # lost the race — the winner's identical artifact stands
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                # no winner: the target is DEBRIS (a partial copy from a
                # crashed writer or the old overwrite-based code). The
                # overwrite write self-healed this state; rename must
                # too (ADVICE r10) — clear the stale dir and retry once.
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(staging, path)
                except OSError:
                    # a concurrent writer published between the rmtree
                    # and the retry — their identical artifact stands
                    if not os.path.exists(os.path.join(path, "_SUCCESS")):
                        raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def ensure_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    base_name: str,
    sf_dir: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> str:
    """Write ``df`` as a bucketed+sorted catalog table (idempotent per
    session; a stale on-disk copy from a previous process is
    overwritten). Returns the catalog table name.

    The catalog entry is session-scoped (in-memory catalog); the data
    files live under the system temp dir keyed by the sf_dir, so
    different scale factors never collide.
    """
    table = f"ssta_b_{_slug(sf_dir)}_{base_name}"
    if spark.catalog.tableExists(table):
        return table
    loc = os.path.join(
        tempfile.gettempdir(), f"ssta_bucketed_{_slug(sf_dir)}", base_name
    )
    (
        df.repartition(n_buckets, F.col(bucket_col))  # 1 file per bucket
        .write.mode("overwrite")
        .option("path", loc)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )
    return table


def bucketed_priority_revenue(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> DataFrame:
    """orders ⋈ lineitem on the order key over the bucketed layout,
    aggregated per order priority.

    The merge hint pins SortMergeJoin (a broadcast join would be
    trivially shuffle-free and prove nothing); with both sides bucketed
    by the join key, the ONLY Exchange in the plan is the 5-group
    final aggregate's — the join itself moves no bytes. Revenue accumulates as exact integer cents
    (order-invariant), so the result is layout-independent — the same
    answer the unbucketed plan gives, which is exactly what the DuckDB
    oracle checks.
    """
    from ..tables import load_table

    ob = ensure_bucketed_table(
        spark,
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        "orders",
        sf_dir,
        "o_orderkey",
        n_buckets,
    )
    lb = ensure_bucketed_table(
        spark,
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "lineitem",
        sf_dir,
        "l_orderkey",
        n_buckets,
    )
    o = spark.table(ob)
    li = spark.table(lb)
    joined = o.hint("merge").join(
        li, o.o_orderkey == li.l_orderkey
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(
                    F.floor(
                        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                        * 100
                        + F.lit(0.5)
                    )
                ).cast("double")
                / F.lit(100.0),
                2,
            ).alias("revenue"),
        )
        .select("o_orderpriority", "n_orders", "n_lines", "revenue")
    )


def _source_fingerprint(sf_dir: str, table: str) -> str:
    """Content fingerprint of a source table's parquet file set
    (path + size + mtime per file): regenerated testdata ⇒ new
    fingerprint ⇒ new derived-layout path, so an on-disk layout can
    never serve stale data across source regenerations."""
    base = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    entries: list[str] = []
    paths = [base]
    if os.path.isdir(base):
        paths = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(base)
            for f in fs
            if not f.startswith(("_", "."))
        )
    for p in paths:
        st = os.stat(p)
        entries.append(f"{p}|{st.st_size}|{st.st_mtime_ns}")
    return hashlib.md5("\n".join(entries).encode()).hexdigest()[:10]


def ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write the events table date-partitioned (``event_date=YYYY-MM-DD``
    directories) once per source-content version — the standard warehouse
    layout whose directory structure IS the index: a date predicate prunes
    whole partitions at planning time, before any file is opened. Returns
    the layout path. Idempotent via an on-disk marker, keyed by a
    fingerprint of the SOURCE files (size+mtime), so regenerating the
    events table invalidates the derived layout instead of serving it
    stale forever; concurrent builders of the same fingerprint land on
    the same bytes (overwrite of identical content), distinct
    fingerprints never share a path."""
    fp = _source_fingerprint(sf_dir, "events")
    loc = os.path.join(
        tempfile.gettempdir(), f"ssta_part_{_slug(sf_dir)}_{fp}", "events"
    )
    marker = os.path.join(loc, "_SUCCESS")
    if not os.path.exists(marker):
        from ..tables import load_table

        ev = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        ev.write.mode("overwrite").partitionBy("event_date").parquet(loc)
    return loc


def partitioned_day_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type counts for ONE day read from the date-partitioned
    layout. The point is the plan: the date predicate lands in
    PartitionFilters (asserted in ``tests/test_plans.py``), so at
    100 TB a one-day query reads 1/365 of the table — no footer, no
    row, no byte of any other day is touched. The oracle computes the
    same counts from the unpartitioned parquet, proving the layout
    changes cost, not answers."""
    loc = ensure_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(loc)
    return (
        ev.filter(F.col("event_date") == F.lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
