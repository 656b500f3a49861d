"""Extend the measured scaling curve one decade past the provided
testdata: replicate sf0.1 k× (default 10 → ≈ sf1) with key remapping,
then time headline queries on the replica.

Replication semantics:
- doc_id / vec_id / event_id / orderkey-family keys are offset per
  replica so uniqueness invariants hold;
- document text gets a per-replica suffix so the corpus does NOT become
  10 exact copies (which would measure pathological dedup blowup, not
  scaling); length/token distributions are preserved;
- embeddings perturb one coordinate per replica (keeps cosine structure,
  breaks exact duplication).

Usage: python tools/scale_replica.py [k] [out_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.cache import release_all
from spark_streaming_twitch_analytics_spark.session import get_spark
from spark_streaming_twitch_analytics_spark.tables import load_table

SRC = "/root/testdata/sf0.1"

DEFAULT_QUERIES = [
    "flagship_wordcount",
    "wordcount",
    "q1_pricing_summary",
    "q3_top_orders",
    "events_hourly",
    "text_quality",
    "text_langid",
    "corpus_unigram_logprob",
    "corpus_token_budget",
    "corpus_perplexity_buckets",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_simhash",
    "ann_brute_topk_np",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "corpus_profile",
    "sentiment_model_labels",
    "events_sliding_2h",
    "threshold_decode",
]


def build_replica(spark, k: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    reps = spark.range(k).select(F.col("id").alias("rep"))

    docs = load_table(spark, SRC, "documents")
    n_docs = docs.count()
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(n_docs)).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" r"), F.col("rep")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )

    emb = load_table(spark, SRC, "embeddings")
    n_vec = emb.count()
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(n_vec)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    (i == 0) & (F.col("rep") > 0),
                    x + F.col("rep").cast("float") / 100.0,
                ).otherwise(x),
            ).alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )

    ev = load_table(spark, SRC, "events")
    n_ev = ev.count()
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * F.lit(n_ev)).alias("event_id"),
            "ts",
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )

    # relational star schema: replicate the two big fact tables with key
    # offsets; dims ride along unreplicated (realistic: dims are small)
    orders = load_table(spark, SRC, "orders")
    li = load_table(spark, SRC, "lineitem")
    max_ok = orders.agg(F.max("o_orderkey")).head()[0] + 1
    (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * F.lit(max_ok))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    (
        li.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * F.lit(max_ok))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    for t in ("region", "nation", "customer", "supplier", "part"):
        src_p, dst_p = f"{SRC}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.isdir(src_p):
            shutil.copytree(src_p, dst_p, dirs_exist_ok=True)
        else:
            shutil.copyfile(src_p, dst_p)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf_replica_x{k}"
    names = sys.argv[3:] or DEFAULT_QUERIES
    spark = get_spark()
    if not os.path.exists(f"{out}/documents.parquet"):
        t0 = time.time()
        build_replica(spark, k, out)
        print(f"# replica x{k} built in {time.time() - t0:.1f}s -> {out}")
    print(f"| query | sf0.1 | sf0.1×{k} | ratio |")
    print("|---|---|---|---|")
    for name in names:
        qd = registry.get(name)
        ts = {}
        for sf_dir, key in ((SRC, "base"), (out, "rep")):
            def run():
                # noop sink materializes EVERY column (count() would let
                # Catalyst prune expensive expressions — bench.py's rule)
                qd.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

            release_all()
            run()  # warm
            release_all()
            t = time.time()
            run()
            ts[key] = time.time() - t
        print(
            f"| {name} | {ts['base']:.2f}s | {ts['rep']:.2f}s "
            f"| {ts['rep'] / ts['base']:.1f}× |",
            flush=True,
        )


if __name__ == "__main__":
    main()
