"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion via a count()-style action (collect
for small results) after a shared session warm-up, so the number reflects
plan execution, not JVM start.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.session import get_spark

HEADLINE = [
    "flagship_wordcount",
    "wordcount",
    "update_table_merge",
    "threshold_decode",
    "training_prep",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "events_hourly",
    "sessionize",
    "session_window_agg",
    "window_running_total",
    "rollup_orders",
    "pivot_events",
    "asof_join_events",
    "range_join_buckets",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_simhash64_hamming",
    "dedup_ngram_topk",
    "ann_brute_topk",
    "ann_brute_topk_np",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_lsh_index_topk",
    "ann_ivf_index_topk",
    "ann_pq_topk",
    "dedup_semantic",
    "ann_ivfpq_topk",
    "ann_ivfpq_rerank",
    "corpus_bpe_merges",
    "corpus_hot_ngrams",
    "scd2_user_history",
    "bucketed_join_priority_revenue",
    "partitioned_day_scan",
    "events_funnel",
    "events_retention",
    "events_markov_transitions",
    "events_user_paths",
    "events_seasonality",
    "events_ab_test",
    "events_attribution",
    "orders_basket_pairs",
    "orders_rfm_segments",
    "orders_cohort_revenue",
    "lineitem_discount_ols",
    "window_range_rolling",
    "window_distribution_funcs",
    "dedup_containment_pairs",
    "ann_lsh_multiprobe_topk",
    "corpus_doc_novelty",
    "quality_constraint_report",
    "text_quality",
    "text_fingerprint",
    "text_redact_pii",
    "corpus_chunk_windows",
    "corpus_pack_bins",
    "corpus_keep_list",
    "dedup_incremental",
    "multimodal_meta",
    "text_repetition",
    "corpus_decontaminate",
    "corpus_bloom_decontaminate",
    "corpus_line_dedup",
    "text_gopher_rules",
    "corpus_url_dedup",
    "dedup_ppjoin_pairs",
    "corpus_cms_counts",
    "corpus_e2e_prep",
    "corpus_fixed_sample",
    "corpus_hll_distinct",
    "corpus_dsir_weights",
    "corpus_collocations",
    "dedup_winnow_pairs",
    "corpus_classifier_filter",
    "corpus_unigram_logprob",
    "embedding_centroids",
    "corpus_tfidf_terms",
    "corpus_tfidf_top_per_doc",
    "corpus_source_quota",
    "corpus_temperature_mix",
    "dedup_substring_spans",
    "ann_ivf_recall",
    "corpus_stratified_split",
    "corpus_shuffle_shards",
    "corpus_bm25_topk",
    "events_anomaly_zscore",
    "exact_quantiles_histogram",
    "group_quantiles_histogram",
    "ann_sq8_topk",
    "corpus_typo_pairs",
    "dedup_bfs_hops",
    "events_decay_sum",
    "embedding_sparse_projection",
    "lineitem_winsorized_revenue",
    "quantiles_interpolated",
    "group_quantiles_interpolated",
    "ann_sq8_index_topk",
    "events_zorder_scan",
    "corpus_kmv_overlap",
    "events_conversion_latency",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    # warm the JVM/codegen path and parquet footers once so per-query
    # times measure plan execution, not one-time session setup
    spark.range(1000).selectExpr("sum(id)").collect()
    from spark_streaming_twitch_analytics_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).selectExpr("count(*)").collect()

    from spark_streaming_twitch_analytics_spark.cache import release_all

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.get(name).fn

        def run() -> None:
            # noop sink materializes EVERY column (a count() would let
            # Catalyst prune expensive expressions out of the measurement)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warm: codegen + shuffle-file cache for THIS plan
        release_all()  # timed runs rebuild their own caches from cold
        best = float("inf")
        for _ in range(2):  # best-of-2: the host is multi-tenant noisy
            spark._jvm.System.gc()  # drop prior queries' garbage from the measurement
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
            release_all()
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
    }
    # Full per-query summary goes to a file (the harness tail-capture window
    # truncates long stdout lines — see BENCH_r03.json `parsed: null`); the
    # printed line stays compact: totals + the slowest 10 queries only.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_summary.json"), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(times),
                "full_summary": "bench_summary.json",
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
