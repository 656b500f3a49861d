"""Randomized-data oracle gate: the driver's Spark-vs-DuckDB comparison
re-run over ADVERSARIAL random tables (same schemas as the testdata) —
empty texts, exact/near duplicates, zero vectors, duplicate embeddings,
boundary punctuation. The sf0.01 gate proves the twins agree on one
fixed corpus; this proves they agree on corpora they were never tuned
on. Floats are kept order-independent by construction (int-valued
embeddings, quarter-step event values → exact sums), so any mismatch is
a real semantics divergence, not accumulation noise."""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import duckdb
import pytest

sys.path.append(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from compare_oracle import frame_hash  # noqa: E402

from spark_streaming_twitch_analytics_spark import registry  # noqa: E402

VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "the and for with from this that have будет 日本語 café naïve "
    "a an to of in on at it is be as by or we he".split()
)
LANGS = ["en", "fr", "es", "de", "zh", "xx"]
SOURCES = [f"src{i}" for i in range(8)]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

# docs/events/embeddings-only queries whose float outputs are row-local
# quantized or exact-by-construction under the generated data.
#
# Deliberately NOT enrolled — matmul tolerance class: queries whose Spark
# side computes cosine via BLAS matmul (reassociated summation) while the
# oracle uses the in-order fold, e.g. `dedup_semantic`
# (operators/similarity.py semantic_dedup). On the driver's fixed testdata
# the 6dp quantization never straddles a decision boundary, but adversarial
# fuzz data can park a pair exactly at the threshold where a 1-ulp fold
# difference flips the dup decision between engines. Keep them out of the
# randomized gate; the per-round driver run at fixed data certifies them.
FUZZ_QUERIES = [
    "flagship_wordcount", "format_messages", "wordcount", "clean_text",
    "strip_listchars", "tokens_nostop", "explode_tokens", "array_ops",
    "text_langid", "text_quality", "text_token_count", "text_fingerprint",
    "text_sentiment", "text_redact_pii", "text_repetition", "text_sentences",
    "threshold_decode", "category_doc_counts", "sentiment_count",
    "category_count", "semi_join_top_words", "topk_words_per_lang",
    "wordcount_by_channel", "update_table_merge", "drop_duplicates",
    "dedup_exact", "dedup_minhash_bands", "dedup_minhash_pairs",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_simhash64_hamming",
    "dedup_ngram_topk", "dedup_substring_spans", "dedup_keep_canonical",
    "dedup_incremental",
    "corpus_sample_10pct", "corpus_mix_sample", "corpus_chunk_windows",
    "corpus_pack_bins", "corpus_token_histogram", "corpus_unigram_logprob",
    "corpus_tfidf_terms", "corpus_tfidf_top_per_doc", "corpus_source_quota",
    "corpus_temperature_mix", "corpus_stratified_split",
    "corpus_shuffle_shards", "corpus_keep_list", "corpus_decontaminate",
    "corpus_bloom_decontaminate", "corpus_line_dedup",
    "text_gopher_rules", "corpus_url_dedup", "dedup_ppjoin_pairs",
    "corpus_cms_counts", "corpus_e2e_prep", "corpus_fixed_sample",
    "corpus_hll_distinct", "corpus_dsir_weights", "corpus_collocations",
    "corpus_winnow_fingerprints", "dedup_winnow_pairs", "corpus_classifier_filter",
    "corpus_profile", "corpus_token_budget", "corpus_perplexity_buckets",
    "sentiment_model_labels", "events_sliding_2h", "dedup_cluster_keep_best",
    "corpus_checksum", "corpus_dedup_report", "corpus_near_dedup_report",
    "ann_brute_topk", "ann_brute_topk_np", "ann_lsh_topk", "ann_ivf_topk",
    "embedding_centroids", "dedup_embedding_cosine",
    "streaming_wordcount", "streaming_category_count",
    "streaming_stateful_wordcount", "cdc_apply_changes",
    "streaming_interval_join", "streaming_dedup_watermark",
    "streaming_session_window",
    "events_hourly", "sessionize", "session_window_agg", "window_running_total", "pivot_events",
    "asof_join_events", "skew_salted_count", "json_extract_props",
    "json_variant_stats", "multimodal_meta", "multimodal_frame_sample",
    # round 3: temporal / analytics / layout-free additions over the
    # fuzzed tables (all integer-exact or fold-deterministic floats)
    "scd2_user_history", "events_funnel", "events_retention",
    "events_markov_transitions", "window_range_rolling",
    "corpus_hot_ngrams", "corpus_bpe_merges", "corpus_bpe_encode",
    # round 10: unigram-LM tokenizer — integer counts + identical-order
    # DP folds on quantized ln scores (the corpus_bpe determinism class)
    "corpus_unigram_vocab", "corpus_unigram_encode",
    "ann_ivfpq_topk", "ann_ivfpq_rerank",
    "events_seasonality", "events_user_paths", "events_ab_test",
    "dedup_containment_pairs", "ann_lsh_multiprobe_topk",
    "events_attribution", "corpus_doc_novelty", "events_dau_wau",
    # round 4: md5-recomputable multimodal fakes (bit-identical folds),
    # the HLL register merge (integer registers, exact sum), and the
    # index-served ANN forms (fingerprint-keyed layouts rebuild per
    # fuzz corpus). exact/group_quantiles are lineitem-based → not in
    # the docs/events/embeddings fuzz universe.
    "multimodal_decode", "multimodal_resize", "corpus_hll_merge",
    "ann_lsh_index_topk", "ann_ivf_index_topk",
    # round 4 analytics extensions: FastSS typo join (integer distances),
    # frontier BFS (integer hops), dyadic decay sums (exact by
    # construction), Achlioptas projection (BIGINT dots), and the SQ8
    # path (per-row identical-order IEEE requant + in-order cosine fold
    # — NOT the matmul tolerance class; its truth side is the np fold).
    "corpus_typo_pairs", "dedup_bfs_hops", "events_decay_sum",
    "embedding_sparse_projection", "ann_sq8_topk", "ann_sq8_recall",
    "streaming_chained_windows",  # integer counts; sentinel-flushed append
    "streaming_interval_join_outer",  # watermark-certified NULL emission
    "ann_sq8_index_topk",  # fingerprint-keyed layout rebuilds per corpus
    "events_zorder_scan",  # layout never changes answers; integer aggs
    "corpus_kmv_overlap",  # md5 order statistics; one shared IEEE division
    "corpus_kmv_per_source",
    "events_conversion_latency",  # integer-microsecond latencies + lerp
    # round 7: every addition is integer-exact, selection-exact, or
    # shared-literal/identical-fold IEEE — the classes this gate exists
    # to stress on adversarial input (dup texts, whitespace runs, zero
    # vectors, duplicate timestamps, 0.25-grid values)
    "corpus_heavy_hitters",  # MG candidates + exact recount, int threshold
    "streaming_heavy_hitters",  # same cut over live state
    "text_char_entropy",  # order-free micro-int entropy terms
    "text_nfc_normalize",  # byte-identical Unicode tables
    "privacy_k_anonymity",  # integer class census
    "events_mad_outliers",  # selection-exact med/mad; grid-tie-safe '>'
    "events_twap",  # BIGINT cents*micros; 0.25-grid * 100 never half-way
    "events_periodicity_dft",  # shared-literal twiddles + micro-int sums
    "events_cusum_changepoint",  # pure integer max-plus closed form
    "retrieval_mmr_diverse",  # quantized cosines; zero-norm query handled
    "retrieval_mmr_ivf",  # same greedy over the IVF-probed pool
    "multimodal_audio_frames",  # integer DSP through the real WAV codec
    "multimodal_audio_spectrum",  # exact pi/4 twiddle table
    "multimodal_image_stats",  # integer TV/min/max through the PNG codec
    "multimodal_png_roundtrip",  # real-codec round-trips, md5-exact
    "multimodal_wav_roundtrip",
    "orc_roundtrip_stats",  # format sinks rebuild per fuzz corpus
    "jsonl_roundtrip_stats",  # whitespace-run texts stress JSON escaping
    "corpus_quality_composite",  # selection-exact thresholds, int buckets
    "dedup_pair_evidence",  # sorted shared shingles, quantized jaccard
    "text_lang_confusion",  # integer confusion-matrix census
    "corpus_bpe_fertility",  # integer sums, one final division
    # round 8
    "corpus_bpe_roundtrip",  # marked token stream; both engines decode
    "corpus_heavy_hitters_by_lang",  # per-group MG + exact recount, int cut
    "multimodal_image_resize",  # NN resize: every pixel an exact source byte
    "retrieval_scored_rerank",  # md5 logit, one IEEE division; pow-2 blend
    "retrieval_hard_negatives",  # rank cuts + md5-keyed sampling, all integer/hex
    "ann_dim_truncation_recall",  # shared-fold quantized cosines at both widths
    "privacy_l_diversity",  # integer distinct-count census
    "corpus_pack_efficiency",  # integer bin sums, one final division
    # round 9
    "retrieval_ndcg_meter",  # dyadic DCG: integer numerators, one division
    "ann_ivf_sq8_topk",  # composed cell-prune + requant, both engine-exact
    "ann_ivf_sq8_index_topk",  # fingerprint-keyed layout rebuilds per corpus
    "ann_ivf_sq8_recall",  # integer ratio; brute side is the np fold class
    "retrieval_bitext_margin",  # micro-int neighborhood sums, one division
]


def _random_text(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.03:
        return ""
    if roll < 0.06:
        return rng.choice(VOCAB)
    n = rng.randint(2, 60)
    words = [rng.choice(VOCAB) for _ in range(n)]
    if rng.random() < 0.2:  # sentence punctuation / parser-quirk colons
        words.insert(rng.randrange(len(words)), rng.choice([".", "a:b", "x!", "y?"]))
    sep = " "
    if rng.random() < 0.15:  # whitespace-heavy docs: tabs/newlines/runs
        sep = rng.choice(["\t", "\n", "  ", " \n\t "])
    return sep.join(words)


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "1311")))
    root = str(tmp_path_factory.mktemp("fuzz_sf"))
    # relational star-schema side rides along un-fuzzed (queries under
    # test only read docs/events/embeddings, but shared CTE helpers may
    # touch a dim table)
    _link_star_schema(root)

    texts = [_random_text(rng) for _ in range(110)]
    for _ in range(8):  # exact duplicates
        texts.append(rng.choice(texts))
    for _ in range(6):  # near duplicates (one word changed)
        t = rng.choice(texts).split()
        if t:
            t[rng.randrange(len(t))] = rng.choice(VOCAB)
        texts.append(" ".join(t))
    docs = [
        (i, t, rng.choice(LANGS), rng.choice(SOURCES), len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.mode("overwrite").parquet(f"{root}/documents.parquet")

    vecs = []
    for i in range(90):
        vecs.append((i, [float(rng.randint(-5, 5)) for _ in range(64)], rng.randint(0, 4)))
    vecs.append((90, [0.0] * 64, 0))  # zero vector
    vecs.append((91, list(vecs[0][1]), vecs[0][2]))  # duplicate vector
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.mode("overwrite").parquet(f"{root}/embeddings.parquet")

    base = dt.datetime(2024, 3, 1)
    events = [
        (
            i,
            base + dt.timedelta(minutes=rng.randint(0, 5000)),
            rng.randint(0, 12),
            rng.choice(EVENT_TYPES),
            rng.randint(0, 400) * 0.25,  # exact binary steps → exact sums
            '{"k": %d}' % rng.randint(0, 99),
        )
        for i in range(300)
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(2).write.mode("overwrite").parquet(f"{root}/events.parquet")
    return root


def _link_star_schema(root: str) -> None:
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{root}/{t}.parquet")


def _run_gate(spark, sf_dir: str, queries=None) -> None:
    con = duckdb.connect()
    from spark_streaming_twitch_analytics_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    from spark_streaming_twitch_analytics_spark.cache import release_all

    failures = []
    for name in queries if queries is not None else FUZZ_QUERIES:
        q = registry.get(name)
        release_all()
        sdf = q.fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        sh, sn = frame_hash(sdf.columns, srows)
        if q.sql is None:
            assert sn >= 0
            continue
        res = con.execute(q.sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        dh, dn = frame_hash(dcols, drows)
        if not (sorted(sdf.columns) == sorted(dcols) and sh == dh and sn == dn):
            failures.append((name, sn, dn, sh, dh))
    assert not failures, failures


@pytest.mark.slow  # builder-side per-round ritual (see pytest.ini)
def test_registry_queries_match_oracle_on_random_tables(spark, fuzz_dir):
    _run_gate(spark, fuzz_dir)


@pytest.fixture(scope="module")
def pathological_dir(spark, tmp_path_factory):
    """Degenerate corpus: mega duplicate groups, empty docs, one language
    and one source dominating, single-user single-burst events, identical
    embeddings — the tie/skew paths the uniform fixture never exercises."""
    rng = random.Random(97)
    root = str(tmp_path_factory.mktemp("patho_sf"))
    _link_star_schema(root)

    texts = ["alpha bravo charlie delta echo foxtrot golf hotel"] * 50
    texts += [""] * 20
    texts += ["tango"] * 15
    texts += [_random_text(rng) for _ in range(15)]
    docs = [(i, t, "en", "src0" if i % 10 else "src1", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.mode("overwrite").parquet(f"{root}/documents.parquet")

    one = [float((i % 3) - 1) for i in range(64)]
    vecs = [(i, list(one), i % 2) for i in range(50)]
    vecs += [(50 + i, [0.0] * 64, 0) for i in range(5)]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.mode("overwrite").parquet(f"{root}/embeddings.parquet")

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    events = [
        (i, base + dt.timedelta(seconds=(i % 7) * 60), 1, "click", 1.25, '{"k": 1}')
        for i in range(200)
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(2).write.mode("overwrite").parquet(f"{root}/events.parquet")
    return root


@pytest.mark.slow  # builder-side per-round ritual (see pytest.ini)
def test_registry_queries_match_oracle_on_pathological_tables(spark, pathological_dir):
    _run_gate(spark, pathological_dir)


# ---------------------------------------------------------------------------
# Relational fuzz universe: random lineitem + orders. The fixed driver data
# never exercises adversarial relational shapes (boundary dates, orphan
# keys, group skew, heavy value ties); this gate does. All monetary/rate
# values sit on exact binary grids (multiples of 2^-k), so every cross-row
# SUM is order-independent and bit-equal across engines — divergence means
# semantics, not float fold order.
# ---------------------------------------------------------------------------

REL_FUZZ_QUERIES = [
    "q1_pricing_summary",       # multi-agg + boundary shipdate filter
    "q4_priority_exists",       # EXISTS semi-join + date window
    "q6_forecast_revenue",      # pure scan-filter-agg (possibly empty)
    "q12_shipmode_priority",    # join + conditional agg (orphan keys drop)
    "rollup_orders", "cube_orders", "grouping_sets_orders",
    "orders_monthly", "unpivot_lineitem", "sql_api_revenue",
    "approx_sketches",          # tolerance booleans must hold on any data
    "exact_quantiles_histogram", "group_quantiles_histogram",  # selection-exact
    "quantiles_interpolated",   # fixed-order lerp over selected ranks
    "group_quantiles_interpolated",
    "window_running_total", "window_rank_funcs",  # total orders (unique keys)
    "range_join_buckets",       # non-equi band join, int quantities
    "q3_top_orders", "q13_customer_distribution", "q18_large_orders",
    "lineitem_winsorized_revenue",  # clip bounds are selection-exact order
    # statistics; the winsorized sum is integer cents
    "orders_capped_cumsum",     # native WITH RECURSIVE, integer cents
    "orders_capped_cumsum_fold",  # one-shuffle fold twin, same oracle
]

_REL_DISCOUNTS = [0.0, 0.03125, 0.0625, 0.09375, 0.125, 0.25]  # 2^-5 grid
_REL_TAXES = [0.0, 0.125, 0.25, 0.375]  # 2^-3 grid
_REL_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
# exact filter-boundary instants used by q1/q4/q6 — seeded in explicitly
_REL_EDGE_DATES = [
    dt.datetime(1998, 9, 2), dt.datetime(1994, 1, 1),
    dt.datetime(1996, 1, 1), dt.datetime(1996, 12, 31, 23, 59, 59),
]


def _rel_date(rng: random.Random) -> dt.datetime:
    if rng.random() < 0.08:
        return rng.choice(_REL_EDGE_DATES)
    return dt.datetime(1992, 1, 1) + dt.timedelta(
        minutes=rng.randint(0, 7 * 365 * 24 * 60)
    )


@pytest.fixture(scope="module")
def rel_fuzz_dir(spark, tmp_path_factory):
    rng = random.Random(
        int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "1311")) + 7
    )
    root = str(tmp_path_factory.mktemp("rel_fuzz_sf"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "events", "documents", "embeddings"):
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{root}/{t}.parquet")

    n_orders = 180
    orders = [
        (
            i,
            rng.randint(0, 60),
            rng.choice("OFP"),
            rng.randint(4, 800_000) * 0.25,
            _rel_date(rng),
            # skewed: one priority dominates
            _REL_PRIORITIES[0] if rng.random() < 0.5 else rng.choice(_REL_PRIORITIES),
        )
        for i in range(n_orders)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ).coalesce(2).write.mode("overwrite").parquet(f"{root}/orders.parquet")

    lineitem = [
        (
            rng.randint(0, n_orders * 2),  # orphan keys past n_orders
            rng.randint(0, 80),
            rng.randint(0, 40),
            rng.randint(1, 7),
            float(rng.randint(1, 50)),
            rng.randint(4, 200_000) * 0.25,
            # heavy tie: a constant price cluster for the quantile paths
            rng.choice(_REL_DISCOUNTS),
            rng.choice(_REL_TAXES),
            "A" if rng.random() < 0.6 else rng.choice("NR"),  # group skew
            rng.choice("OF"),
            _rel_date(rng),
        )
        for _ in range(700)
    ]
    for _ in range(80):  # massed identical rows: ties for ranks/quantiles
        lineitem.append(
            (1, 2, 3, 1, 25.0, 5000.0, 0.0625, 0.125, "A", "O",
             dt.datetime(1995, 6, 15))
        )
    spark.createDataFrame(
        lineitem,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    ).coalesce(2).write.mode("overwrite").parquet(f"{root}/lineitem.parquet")
    return root


def test_relational_queries_match_oracle_on_random_tables(spark, rel_fuzz_dir):
    _run_gate(spark, rel_fuzz_dir, REL_FUZZ_QUERIES)
