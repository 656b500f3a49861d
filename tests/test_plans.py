"""Physical-plan regression tests: the scale properties the engine
depends on must be visible in the plan (SURVEY §4)."""

from __future__ import annotations

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.plans import explain as EX

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return registry.get(name).fn(spark, SF)


def test_q1_filter_pushdown_and_pruning(spark):
    df = q(spark, "q1_pricing_summary")
    pushed = " ".join(EX.pushed_filters(df))
    assert "l_shipdate" in pushed  # predicate reached the parquet scan
    schema = EX.read_schemas(df)[0]
    assert "l_orderkey" not in schema  # unused columns pruned from the scan
    # partial + final aggregation around exactly one shuffle
    assert EX.count_operator(df, "HashAggregate") >= 2
    assert EX.count_operator(df, "Exchange") == 1


def test_q3_broadcasts_dim_and_pushes_segment_filter(spark):
    df = q(spark, "q3_top_orders")
    assert EX.has_operator(df, "BroadcastHashJoin")
    pushed = " ".join(EX.pushed_filters(df))
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed
    assert EX.has_operator(df, "TakeOrderedAndProject")  # top-K, no global sort


def test_q5_small_dims_broadcast_not_shuffled(spark):
    df = q(spark, "q5_nation_revenue")
    # nation+region must be broadcast: at least 2 broadcast joins
    assert EX.count_operator(df, "BroadcastHashJoin") >= 2


def test_flagship_prunes_scan_and_uses_topk_operator(spark):
    df = q(spark, "flagship_wordcount")
    schema = EX.read_schemas(df)[0]
    assert "n_chars" not in schema and "source" not in schema
    assert EX.has_operator(df, "TakeOrderedAndProject")
    assert EX.count_operator(df, "Exchange") == 1  # one shuffle: the count


def test_wordcount_partial_aggregation_before_shuffle(spark):
    df = q(spark, "wordcount")
    plan = EX.formatted_plan(df)
    # partial HashAggregate (map-side combine) must appear BEFORE Exchange,
    # replacing the reference's hand-rolled reduceByKey combine
    assert plan.index("HashAggregate") < len(plan)
    assert EX.count_operator(df, "HashAggregate") >= 2
    assert EX.count_operator(df, "Exchange") == 1


def test_semi_join_is_broadcast_not_shuffle(spark):
    df = q(spark, "semi_join_top_words")
    plan = EX.formatted_plan(df)
    assert "BroadcastHashJoin LeftSemi" in plan or (
        "LeftSemi" in plan and "BroadcastHashJoin" in plan
    )


def test_ivf_partitioned_layout_prunes_cells(spark, tmp_path):
    """The 100 TB IVF serving shape via the first-class API: candidates
    written partitionBy(cell) by build_ivf_index → a probe of one cell
    must scan ONE partition (partition pruning visible in the plan), not
    the whole index."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    similarity.build_ivf_index(emb, path, n_cells=8)
    probe = spark.read.parquet(path).filter(F.col("cell") == 3)
    plan = EX.formatted_plan(probe)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
    # pruned scan reads strictly fewer files than the full index
    assert probe.count() < spark.read.parquet(path).count()


def test_query_ivf_index_matches_index_free_form(spark, tmp_path):
    """query_ivf_index over the persisted layout must return EXACTLY the
    rows ivf_topk computes index-free (same probes, tie-break,
    quantization) — and its scan must carry a cell partition filter."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "ivf_index")
    similarity.build_ivf_index(emb, path, n_cells=8)
    via_index = similarity.query_ivf_index(queries, path, k=5, n_cells=8, n_probe=2)
    free = similarity.ivf_topk(queries, emb, 5, n_cells=8, n_probe=2)
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, free.collect())
    )
    plan = EX.formatted_plan(via_index)
    assert "PartitionFilters" in plan


def test_query_ivf_sq8_index_matches_index_free_form(spark, tmp_path):
    """The composed IVF+SQ8 layout (round 9): index-served results must
    EXACTLY match the index-free ivf_sq8_topk, the codes scan must carry
    a cell partition filter, and the composition must agree with
    plain ivf_topk's CELL ROUTING (same probes — only scores differ by
    the requant)."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "ivf_sq8_index")
    similarity.build_ivf_sq8_index(emb, path, n_cells=8)
    via_index = similarity.query_ivf_sq8_index(
        queries, path, k=5, n_cells=8, n_probe=2
    )
    free = similarity.ivf_sq8_topk(queries, emb, 5, n_cells=8, n_probe=2)
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, free.collect())
    )
    plan = EX.formatted_plan(via_index)
    assert "PartitionFilters" in plan
    # same candidate pairs as plain IVF at the same geometry: the codec
    # changes scores, never routing
    pair = lambda df: {(r["q_id"], r["c_id"]) for r in df.collect()}  # noqa: E731
    ivf_pairs = pair(
        similarity.ivf_topk(queries, emb, 1000, n_cells=8, n_probe=2)
    )
    sq8_pairs = pair(
        similarity.ivf_sq8_topk(queries, emb, 1000, n_cells=8, n_probe=2)
    )
    assert ivf_pairs == sq8_pairs


def test_append_to_ivf_index_equals_full_build(spark, tmp_path):
    """Incremental maintenance: build with half the corpus, append the
    other half — queries over the appended index must return EXACTLY the
    full-build results (same centroids → same cells forever)."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    full_path = str(tmp_path / "ivf_full")
    inc_path = str(tmp_path / "ivf_inc")
    similarity.build_ivf_index(emb, full_path, n_cells=8)
    similarity.build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), inc_path, n_cells=8)
    similarity.append_to_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 1), inc_path, n_cells=8
    )
    a = sorted(map(tuple, similarity.query_ivf_index(queries, full_path, k=5).collect()))
    b = sorted(map(tuple, similarity.query_ivf_index(queries, inc_path, k=5).collect()))
    assert a == b


def test_query_lsh_index_matches_index_free_form(spark, tmp_path):
    """Same contract as the IVF index API, for the sign-LSH layout."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "lsh_index")
    similarity.build_lsh_index(emb, path, n_bits=4)
    via_index = similarity.query_lsh_index(queries, path, k=5, n_bits=4)
    free = similarity.lsh_topk(queries, emb, 5, n_bits=4)
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, free.collect())
    )
    plan = EX.formatted_plan(via_index)
    assert "PartitionFilters" in plan


_ORACLE_PLANS: dict[str, str] = {}


def _oracle_plans(spark) -> dict[str, str]:
    """Formatted physical plan for every batch oracled query, built once
    per test session and shared by the whole-registry plan lints."""
    if not _ORACLE_PLANS:
        for qd in registry._REGISTRY:
            if qd.sql is None or qd.name.startswith("streaming_"):
                continue
            _ORACLE_PLANS[qd.name] = EX.formatted_plan(qd.fn(spark, SF))
    return _ORACLE_PLANS


def test_no_rowwise_python_udf_in_oracle_query_plans(spark):
    # everything SQL-expressible must stay off the row-at-a-time Python
    # path (no BatchEvalPython). Vectorized ArrowEvalPython nodes are
    # allowed where deliberately chosen (e.g. the simhash64 digest, where
    # the numpy batch kernel beats the exploded-JVM form) — but must stay
    # rare, so the count is pinned.
    arrow_nodes = []
    for name, plan in _oracle_plans(spark).items():
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM path"
        if "ArrowEvalPython" in plan:
            arrow_nodes.append(name)
    allowed = {
        "dedup_simhash64_hamming",
        "dedup_simhash_pairs",
        # the model boundary: a Scorer-protocol pandas_udf IS the point
        "sentiment_model_labels",
        # same boundary, cross-encoder shape: the pair Scorer udf
        "retrieval_scored_rerank",
        # the nDCG meter reranks through the same pair Scorer boundary
        "retrieval_ndcg_meter",
        # Unicode NFC: the normalization tables live in Python's
        # unicodedata (no JVM built-in) — deliberately Arrow-batched
        "text_nfc_normalize",
        # r12: character counting via one C-speed Counter per doc (the
        # per-character HOF fold was these queries' dominant cost —
        # measured 3.75→1.06 s / 3.78→3.06 s at sf0.1); the log2
        # micro-term arithmetic stays JVM-side over the count multiset
        "text_char_entropy",
        "corpus_quality_composite",
    }
    assert set(arrow_nodes) <= allowed, (
        f"unexpected Arrow UDF in oracle plans: {sorted(set(arrow_nodes) - allowed)}"
    )


def test_no_object_agg_under_expand_in_oracle_query_plans(spark):
    """The approx_sketches trap as a registry-wide lint (SCALING.md
    "countDistinct/object-buffer split", r5: 10.3→1.6 s). Mixing
    countDistinct with a TypedImperativeAggregate in ONE aggregate makes
    Catalyst's multi-distinct rewrite insert an Expand (N× row blow-up)
    feeding a codegen-disabled ObjectHashAggregate — the object buffers
    then churn over the expanded rows. The fix is always to split the
    distinct aggregates from the object-buffer aggregates into separate
    plans and join the (tiny) results. This lint fails any oracled plan
    where an ObjectHashAggregate has an Expand in its INPUT subtree
    (tree-indentation ancestry via EX.operator_has_descendant — a
    correctly-split plan like corpus_datacard keeps the Expand and the
    percentile buffer in SIBLING subtrees of the final join, which must
    not trip the lint; the fused form is verified caught by a live
    two-countDistinct + collect_list repro)."""
    offenders = []
    for name, plan in _oracle_plans(spark).items():
        if EX.operator_has_descendant(plan, "ObjectHashAggregate", "Expand"):
            offenders.append(name)
    assert not offenders, (
        f"Expand feeding ObjectHashAggregate (multi-distinct + object-buffer "
        f"aggregate in one plan — split them): {offenders}"
    )


# Deliberate single-partition windows (VERDICT r7 task 3): every entry
# names the BOUND that makes a one-task window safe — the window input
# is class-/bin-/pool-bounded by construction, never row-bounded. A new
# query tripping the lint must either partition its window or be added
# HERE with its bound (and the bound must be real: an unbounded input
# on one task is the classic 100TB scale-killer).
GLOBAL_WINDOW_ALLOWLIST = {
    "exact_quantiles_histogram": "cum-sum over |bins| = range/bin_width histogram rows",
    "quantiles_interpolated": "same histogram bin table, interpolated select",
    "events_conversion_latency": "grouped-quantile second pass over |bins| rows",
    "corpus_vocab_coverage": "rank over the top-2000 vocabulary cut (TakeOrderedAndProject upstream)",
    "corpus_temperature_mix": "cum share over |languages| class rows",
    "retrieval_rrf_fusion": "rank over the <=50-row pooled cut (TakeOrderedAndProject upstream)",
    "events_cusum_changepoint": "calendar-bounded day series (max-plus closed form)",
}


def test_global_window_findings_detects_both_shapes(spark):
    """The lint's detector must catch (a) a window with no partitionBy
    and (b) the constant self-subtraction partition, while passing a
    properly keyed window — live plans, not canned strings, so the
    formatted-explain shapes stay honest across Spark upgrades."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.range(32).withColumn("g", F.col("id") % 4)
    bad_unpart = df.select(F.rank().over(W.orderBy("id")).alias("r"))
    bad_const = df.select(
        F.sum("id").over(W.partitionBy(F.col("id") - F.col("id")).orderBy("id")).alias("s")
    )
    good = df.select(F.row_number().over(W.partitionBy("g").orderBy("id")).alias("r"))
    assert any(
        "no partition key" in f
        for f in EX.global_window_findings(EX.formatted_plan(bad_unpart))
    )
    assert any(
        "constant self-subtraction" in f
        for f in EX.global_window_findings(EX.formatted_plan(bad_const))
    )
    assert EX.global_window_findings(EX.formatted_plan(good)) == []


def test_no_unbounded_global_windows_outside_allowlist(spark):
    """Registry-wide lint: a WindowExec with no partition key — or
    partitioned only by the constant ``c - c`` trick — moves its whole
    input to ONE task. That is deliberate in exactly the allowlisted
    queries (each names its bound); anywhere else it is an accidental
    global window and fails here before it fails at scale."""
    offenders = {}
    for name, plan in _oracle_plans(spark).items():
        findings = EX.global_window_findings(plan)
        if findings and name not in GLOBAL_WINDOW_ALLOWLIST:
            offenders[name] = findings[0]
    assert not offenders, (
        f"global/constant-partition windows outside the allowlist "
        f"(partition the window or add it WITH its bound): {offenders}"
    )
    # the allowlist must not rot: entries that no longer trip the lint
    # should be pruned so the list stays an honest inventory
    stale = [
        n
        for n in GLOBAL_WINDOW_ALLOWLIST
        if n in _oracle_plans(spark)
        and not EX.global_window_findings(_oracle_plans(spark)[n])
    ]
    assert not stale, f"allowlist entries no longer needed: {stale}"


def test_split_and_shuffle_shard_ops_take_one_exchange(spark):
    # both are row-local hash assignments + one keyed aggregate: any
    # second exchange would mean the assignment itself shuffled
    for name in ("corpus_stratified_split", "corpus_shuffle_shards"):
        df = q(spark, name)
        assert EX.count_operator(df, "Exchange") == 1, name
        # partial+final (min_by/max_by plan as SortAggregate, not Hash)
        aggs = EX.count_operator(df, "HashAggregate") + EX.count_operator(
            df, "SortAggregate"
        )
        assert aggs >= 2, name


def test_sentence_split_is_a_narrow_map(spark):
    df = q(spark, "text_sentences")
    assert EX.count_operator(df, "Exchange") == 0  # pipelines inside the scan stage
    assert EX.has_operator(df, "Generate")  # posexplode
    schema = EX.read_schemas(df)[0]
    assert "lang" not in schema  # unused columns pruned


def test_bucketed_join_moves_no_data(spark):
    """Both sides bucketed by the join key → SortMergeJoin whose inputs
    need NO Exchange (the 100 TB win: the fact-fact join moves zero
    bytes over the network). Local per-bucket Sorts remain — Spark 3+
    stopped propagating bucket sort order
    (spark.sql.legacy.bucketedTableScanOutputOrdering defaults false),
    and a per-partition sort is CPU, not shuffle. The invariant is that
    NO Exchange feeds the join — how many exchanges the aggregate above
    it needs is the planner's business (the countDistinct rewrite's
    distribution reuse is version-sensitive), so no exact whole-plan
    exchange count is asserted."""
    df = q(spark, "bucketed_join_priority_revenue")
    plan = EX.formatted_plan(df)
    assert EX.has_operator(df, "SortMergeJoin")
    assert "Bucketed: true" in plan
    # every exchange must sit ABOVE the join (aggregate side): node
    # numbers grow leaf→root, so an exchange feeding the join would
    # number below it
    import re

    smj = int(re.search(r"SortMergeJoin[^(\n]*\((\d+)\)", plan).group(1))
    ex_nums = [int(n) for n in re.findall(r"Exchange[^(\n]*\((\d+)\)", plan)]
    assert all(n > smj for n in ex_nums), (smj, ex_nums)


def test_ann_index_queries_prune_partitions(spark):
    """The REGISTERED index-served ANN queries (not just the raw APIs)
    must hit the persisted layout with partition pruning: the probed
    buckets/cells land in PartitionFilters, so a standing 100 TB index
    serves a query batch by reading only the probed partitions' files."""
    import re

    for name, col in [
        ("ann_lsh_index_topk", "bucket"),
        ("ann_ivf_index_topk", "cell"),
        ("ann_ivf_sq8_index_topk", "cell"),
    ]:
        df = q(spark, name)
        plan = EX.formatted_plan(df)
        groups = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        # the membership filter renders as `INSET ...` or `IN (...)`
        # depending on how many values survived planning
        assert any(
            col in g
            and ("inset" in g.lower() or "in(" in g.lower() or "in (" in g.lower())
            for g in groups
        ), (name, groups)


def test_partitioned_scan_prunes_to_one_day(spark):
    """The date predicate must reach PartitionFilters (pruned at
    planning, zero IO on other days) and NOT survive as a post-scan
    Filter on data rows."""
    df = q(spark, "partitioned_day_scan")
    plan = EX.formatted_plan(df)
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1)


def test_zorder_scan_pushes_both_predicates(spark):
    """The Z-order layout's value is stats skipping, which only happens
    if BOTH rectangle predicates reach the parquet reader."""
    df = q(spark, "events_zorder_scan")
    pushed = " ".join(EX.pushed_filters(df))
    assert "user_id" in pushed and "ts" in pushed
    schema = EX.read_schemas(df)[0]
    assert "props" not in schema  # untouched wide column pruned


def test_sq8_path_stays_jvm_side_with_bounded_exchange(spark):
    """SQ8 scoring is pure Catalyst expressions: no Python eval operator
    in the scan/score stages (the partial top-k mapInPandas cut is the
    only Arrow stage), and the rank window is fed by ONE exchange."""
    df = q(spark, "ann_sq8_topk")
    plan = EX.formatted_plan(df)
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert EX.count_operator(df, "WindowGroupLimit") >= 1 or EX.has_operator(
        df, "Window"
    )


def test_sq8_index_scan_reads_codes_not_embeddings(spark):
    """The persisted-index path must scan the int8 codes table — its
    ReadSchema carries the tinyint codes array, not the float vectors."""
    df = q(spark, "ann_sq8_index_topk")
    schemas = " ".join(EX.read_schemas(df))
    assert "codes" in schemas


def test_typo_pairs_join_is_keyed_not_cartesian(spark):
    df = q(spark, "corpus_typo_pairs")
    plan = EX.formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the candidate self-join keys on the deletion variant
    assert EX.has_operator(df, "SortMergeJoin") or EX.has_operator(
        df, "BroadcastHashJoin"
    )


def test_sparse_projection_is_scan_only(spark):
    df = q(spark, "embedding_sparse_projection")
    assert EX.count_operator(df, "Exchange") == 0  # pure narrow map


def test_capped_cumsum_fold_is_one_shuffle(spark):
    """The fold twin of the recursive CTE must be a single groupBy plan:
    exactly one Exchange, no Window, no iterative sub-jobs."""
    df = q(spark, "orders_capped_cumsum_fold")
    assert EX.count_distinct_operator(df, "Exchange") == 1
    assert not EX.has_operator(df, "Window")


def test_pack_bins_prefix_sum_is_distributed(spark):
    """corpus_pack_bins must never funnel the corpus through one task:
    the running-sum window has to be partitioned (by the range-partition
    id), not a global single-partition WindowExec."""
    df = q(spark, "corpus_pack_bins")
    plan = EX.formatted_plan(df)
    assert EX.has_operator(df, "Window")
    assert "SinglePartition" not in plan
    # the window spec itself must carry a partition key
    assert "windowspecdefinition(pid" in plan


def test_rrf_pools_use_topk_operator_not_global_sort(spark):
    """Both RRF branch pools and the final fused cut must be
    TakeOrderedAndProject (distributed partial top-K) — a global Sort
    would materialize a full corpus ordering at 100 TB. The rank windows
    run over pool-sized input only (after the limit), so the
    single-partition window exchange is bounded at 50 rows."""
    df = q(spark, "retrieval_rrf_fusion")
    plan = EX.formatted_plan(df)
    # lexical pool + semantic pool (inside brute_force_topk) + final cut
    assert EX.count_distinct_operator(df, "TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-wise Python UDF


def test_tree_nodes_parses_codegen_markers():
    """Whole-stage-codegen '*' markers (present on AQE-off / final
    adaptive plans) must neither hide a node nor distort its depth —
    ADVICE r6: the old prefix class skipped them, so a codegen'd Expand
    under ObjectHashAggregate escaped the lint. Validated live against
    all 201 AQE-off oracle plans (96 carried markers, 0 offenders)."""
    plan = """== Physical Plan ==
* ObjectHashAggregate (5)
+- Exchange (4)
   +- * ObjectHashAggregate (3)
      +- * Expand (2)
         +- Scan parquet (1)
"""
    nodes = EX.tree_nodes(plan)
    assert [(d, op) for d, op, _ in nodes] == [
        (0, "ObjectHashAggregate"),
        (1, "Exchange"),
        (2, "ObjectHashAggregate"),
        (3, "Expand"),
        (4, "Scan"),
    ]
    assert EX.operator_has_descendant(plan, "ObjectHashAggregate", "Expand")


def test_char_entropy_is_narrow_map(spark):
    """The entropy fold must stay per-row: zero Exchange, no explode of
    the character stream (the oracle's explode+groupBy twin would 30x
    the corpus through a shuffle at scale)."""
    df = q(spark, "text_char_entropy")
    assert EX.count_operator(df, "Exchange") == 0
    plan = EX.formatted_plan(df)
    assert "Generate" not in plan  # no explode anywhere
    assert "BatchEvalPython" not in plan


def test_audio_frames_is_shuffle_free_arrow_pass(spark):
    """Decode → frame → reduce must be one embarrassingly-parallel
    mapInPandas pass: zero Exchange at any corpus size."""
    df = q(spark, "multimodal_audio_frames")
    assert EX.count_operator(df, "Exchange") == 0
    assert "MapInPandas" in EX.formatted_plan(df)


def test_audio_spectrum_is_shuffle_free_arrow_pass(spark):
    df = q(spark, "multimodal_audio_spectrum")
    assert EX.count_operator(df, "Exchange") == 0
    assert "MapInPandas" in EX.formatted_plan(df)


def test_nfc_is_arrow_batched_not_rowwise(spark):
    df = q(spark, "text_nfc_normalize")
    plan = EX.formatted_plan(df)
    assert "ArrowEvalPython" in plan  # vectorized pandas_udf path
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python
    assert EX.count_operator(df, "Exchange") == 0


def test_twap_reuses_window_partitioning_for_the_aggregate(spark):
    """The groupBy(user_id, day) must ride the window's (user_id, day)
    exchange — exactly one shuffle in the whole plan."""
    df = q(spark, "events_twap")
    assert EX.count_operator(df, "Exchange") == 1
    assert EX.count_operator(df, "Window") == 1


def test_k_anonymity_single_partial_agg_shuffle(spark):
    df = q(spark, "privacy_k_anonymity")
    assert EX.count_operator(df, "Exchange") == 1
    assert EX.count_operator(df, "HashAggregate") >= 2  # partial+final


def test_unigram_encode_broadcasts_vocab_and_word_counts(spark):
    """The unigram encode scale shape: the corpus scan joins the
    per-word token counts via BROADCAST (the DP/vocab work must never
    shuffle the corpus), and the Viterbi fold runs only on the
    distinct-word side."""
    df = q(spark, "corpus_unigram_encode")
    # vocab map attachment + enc join-back are both broadcast
    assert EX.count_operator(df, "BroadcastHashJoin") >= 1
    # the corpus side reads only doc_id + text
    schemas = EX.read_schemas(df)
    assert all("n_chars" not in s for s in schemas)
