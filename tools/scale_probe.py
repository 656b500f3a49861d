"""Measure wall-time scaling of headline queries across sf0.001 → sf0.01
→ sf0.1 (100× data). Warm-run methodology (same as bench.py). Prints a
markdown table for SCALING.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.cache import release_all
from spark_streaming_twitch_analytics_spark.session import get_spark

QUERIES = [
    "flagship_wordcount",
    "q1_pricing_summary",
    "q3_top_orders",
    "update_table_merge",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "ann_brute_topk",
    "ann_brute_topk_np",
    "ann_ivf_topk",
    "dedup_simhash64_hamming",
    "threshold_decode",
    "sessionize",
    "q7_volume_shipping",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "dedup_ngram_topk",
    "dedup_incremental",
    "corpus_chunk_windows",
    "corpus_keep_list",
    "text_repetition",
    "corpus_decontaminate",
    "corpus_unigram_logprob",
    "corpus_bloom_decontaminate",
    "corpus_line_dedup",
    "text_gopher_rules",
    "corpus_url_dedup",
    "dedup_ppjoin_pairs",
    "corpus_cms_counts",
    "corpus_hll_distinct",
    "corpus_dsir_weights",
    "corpus_e2e_prep",
    "corpus_fixed_sample",
    "session_window_agg",
    "corpus_collocations",
    "dedup_winnow_pairs",
    "corpus_classifier_filter",
    "embedding_centroids",
    "kmeans_refine_centroids",
    "grouping_sets_orders",
    "json_variant_stats",
    "corpus_stratified_split",
    "corpus_shuffle_shards",
    "text_sentences",
    "events_sliding_2h",
    "sentiment_model_labels",
    "corpus_token_budget",
    "corpus_profile",
    "corpus_perplexity_buckets",
    "corpus_checksum",
    "corpus_dedup_report",
    "dedup_semantic",
    "corpus_bm25_topk",
    "events_anomaly_zscore",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_rerank",
    "corpus_bpe_merges",
    "corpus_hot_ngrams",
    "scd2_user_history",
    "events_funnel",
    "events_retention",
    "events_markov_transitions",
    "orders_basket_pairs",
    "window_range_rolling",
    "bucketed_join_priority_revenue",
    "partitioned_day_scan",
    "ann_sq8_topk",
    "ann_sq8_index_topk",
    "corpus_typo_pairs",
    "dedup_bfs_hops",
    "events_decay_sum",
    "embedding_sparse_projection",
    "lineitem_winsorized_revenue",
    "quantiles_interpolated",
    "group_quantiles_interpolated",
    "orders_capped_cumsum",
    "events_zorder_scan",
    "corpus_kmv_overlap",
    "events_conversion_latency",
    "corpus_pack_bins",
    "orders_capped_cumsum_fold",
    "approx_sketches",
    "dedup_embedding_cosine",
    "corpus_heavy_hitters",
    "text_char_entropy",
    "multimodal_audio_frames",
    "orc_roundtrip_stats",
    "retrieval_mmr_diverse",
    "multimodal_audio_spectrum",
    "streaming_heavy_hitters",
    "events_mad_outliers",
    "text_nfc_normalize",
    "privacy_k_anonymity",
    "jsonl_roundtrip_stats",
    "events_twap",
    "multimodal_image_stats",
    "events_periodicity_dft",
    "events_cusum_changepoint",
    "retrieval_mmr_ivf",
    "corpus_quality_composite",
    "dedup_pair_evidence",
    "text_lang_confusion",
    "corpus_bpe_fertility",
    "privacy_l_diversity",
    "corpus_pack_efficiency",
]
SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    spark = get_spark(app_name="scale_probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    rows = []
    names = sys.argv[1:] or QUERIES  # optional: probe just the named queries
    for name in names:
        fn = registry.get(name).fn
        ts = []
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"

            def run():
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

            run()
            release_all()
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
            release_all()
        rows.append((name, ts))
        print(f"# {name}: {['%.2f' % t for t in ts]}", file=sys.stderr)

    print("| query | sf0.001 | sf0.01 | sf0.1 | t(100×)/t(1×) |")
    print("|---|---|---|---|---|")
    for name, ts in rows:
        ratio = ts[2] / max(ts[0], 1e-9)
        print(
            f"| {name} | {ts[0]:.2f}s | {ts[1]:.2f}s | {ts[2]:.2f}s | {ratio:.1f}× |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
