"""Classifier surface: Arrow-batched scorer UDF ≡ native column
expression; threshold boundary; positional decode (reference ``indexOf``
bug fixed — TFInterface.scala:63-66)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark.constants import ENCODER_CLASSES
from spark_streaming_twitch_analytics_spark.functions import scoring


def test_hash_scorer_udf_matches_native_expression(spark, docs):
    udf = scoring.score_udf(scoring.HashScorer())
    both = docs.limit(50).select(
        udf(F.col("text")).alias("via_udf"),
        scoring.hash_scores(F.col("text")).alias("native"),
    )
    for r in both.collect():
        assert r["via_udf"] == r["native"]  # bit-identical (k/15 doubles)


def test_scores_shape_and_range(spark, docs):
    row = docs.limit(1).select(scoring.hash_scores(F.col("text")).alias("s")).head()
    assert len(row["s"]) == 50
    assert all(0.0 <= x <= 1.0 for x in row["s"])


def test_threshold_is_strict_greater(spark):
    # scores are k/15; 8/15 ≈ 0.533 passes, 7/15 ≈ 0.467 doesn't; and a
    # score EXACTLY at the threshold must be dropped (reference keeps > 0.5)
    df = spark.createDataFrame([(1,)], "id int").select(
        scoring.decode_categories(
            F.array(F.lit(0.5), F.lit(0.51), F.lit(0.49)), threshold=0.5
        ).alias("cats")
    )
    assert df.head()["cats"] == [ENCODER_CLASSES[1]]


def test_duplicate_scores_decode_positionally(spark):
    # reference bug: preds.indexOf(x) maps duplicate values to the FIRST
    # index; rebuild must decode each position independently
    df = spark.createDataFrame([(1,)], "id int").select(
        scoring.decode_categories(
            F.array(F.lit(0.9), F.lit(0.9), F.lit(0.1)), threshold=0.5
        ).alias("cats")
    )
    assert df.head()["cats"] == [ENCODER_CLASSES[0], ENCODER_CLASSES[1]]


def test_udf_and_native_scores_agree_on_null_text(spark):
    """NULL text must decode identically through both paths: the native
    twin yields an all-NULL score array (md5(NULL) is NULL) → no labels;
    the Arrow UDF path must not silently score the empty string."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.functions import scoring

    df = spark.createDataFrame([(1, None), (2, "hello world")], "id long, text string")
    native = df.select(
        "id", scoring.decode_categories(scoring.hash_scores(F.col("text"))).alias("c")
    ).collect()
    via_udf = df.select(
        "id",
        scoring.decode_categories(
            scoring.score_udf(scoring.HashScorer())(F.col("text"))
        ).alias("c"),
    ).collect()
    n = {r["id"]: r["c"] for r in native}
    u = {r["id"]: r["c"] for r in via_udf}
    assert list(n[1] or []) == list(u[1] or []) == []
    assert list(n[2]) == list(u[2]) and len(n[2]) > 0
