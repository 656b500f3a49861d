"""Bucketing: pre-partitioned tables make repeated key joins
shuffle-free — the co-location strategy SCALING.md promises for the
recurring J1 merge at 100 TB. Asserted on the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark.plans import explain as EX
from spark_streaming_twitch_analytics_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # saveAsTable writes to the default ./spark-warehouse (gitignored);
    # warehouse.dir is a static conf and can't be pointed at tmp_path
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    (
        li.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    a = spark.table("li_bucketed")
    b = spark.table("orders_bucketed")
    joined = a.join(b, "l_orderkey").groupBy("o_orderstatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("rev")
    )
    # disable broadcast so the join strategy itself is exercised (at real
    # scale neither side broadcasts — that's what bucketing is for)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = EX.formatted_plan(joined)
        # co-located join: the join itself needs NO Exchange; the only
        # shuffle is the final groupBy on o_orderstatus
        assert EX.count_operator(joined, "Exchange") <= 1, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    # and it returns the same result as the plain (shuffling) join
    plain = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ),
            "l_orderkey",
        )
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_source_fingerprint_tracks_content(tmp_path):
    """Derived layouts (partitioned events, ANN indexes) are keyed by a
    fingerprint of the SOURCE parquet files; regenerating the source must
    produce a different fingerprint (new layout path), identical files
    the same one."""
    import os

    from spark_streaming_twitch_analytics_spark.operators.bucketed import (
        _source_fingerprint,
    )

    src = tmp_path / "events.parquet"
    src.write_bytes(b"v1-bytes")
    fp1 = _source_fingerprint(str(tmp_path), "events")
    assert fp1 == _source_fingerprint(str(tmp_path), "events")  # stable

    src.write_bytes(b"v2-bytes!")  # different size+mtime
    fp2 = _source_fingerprint(str(tmp_path), "events")
    assert fp2 != fp1

    # directory-shaped tables fingerprint their data files, skipping markers
    d = tmp_path / "sub"
    (d / "orders.parquet").mkdir(parents=True)
    (d / "orders.parquet" / "part-0.parquet").write_bytes(b"aa")
    (d / "orders.parquet" / "_SUCCESS").write_bytes(b"")
    fp3 = _source_fingerprint(str(d), "orders")
    os.utime(d / "orders.parquet" / "_SUCCESS", (1, 1))  # marker churn: no-op
    assert _source_fingerprint(str(d), "orders") == fp3
    (d / "orders.parquet" / "part-0.parquet").write_bytes(b"ab")
    assert _source_fingerprint(str(d), "orders") != fp3
