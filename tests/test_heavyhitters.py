"""Misra-Gries heavy hitters: merge-rule guarantees, partition
independence of the final output, and the broadcast-recount plan."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.operators import heavyhitters as HH

SF = "/root/testdata/sf0.001"


def _random_stream(rng: random.Random, n: int, vocab: int) -> list[str]:
    # Zipf-ish: small ids hugely more likely, so real heavy hitters exist
    return [f"t{int(vocab ** rng.random())}" for _ in range(n)]


def test_mg_merge_bound_and_no_missed_heavy_hitter():
    """After merging arbitrary batch splits: ≥ the k largest survive
    with undercount ≤ n/(k+1) — so every token with freq > n/(k+1)
    is present in the summary (the superset guarantee the two-pass
    operator rests on)."""
    rng = random.Random(7)
    for k in (5, 16, 64):
        stream = _random_stream(rng, 20_000, 1_000)
        truth = Counter(stream)
        n = len(stream)
        summary: dict[str, int] = {}
        i = 0
        while i < n:  # ragged batch boundaries
            step = rng.randint(1, 4_000)
            summary = HH.mg_merge_batch(
                summary, dict(Counter(stream[i : i + step])), k
            )
            i += step
        bound = n / (k + 1)
        for tok, lb in summary.items():
            assert 0 < lb <= truth[tok]
            assert truth[tok] - lb <= bound
        for tok, c in truth.items():
            if c > bound:
                assert tok in summary, f"missed heavy hitter {tok} (c={c})"


def test_mg_merge_state_bounded():
    rng = random.Random(3)
    k = 10
    summary: dict[str, int] = {}
    for _ in range(50):
        batch = Counter(_random_stream(rng, 500, 10_000))
        summary = HH.mg_merge_batch(summary, dict(batch), k)
        # strictly > the (k+1)-th largest survives ⇒ at most k counters
        assert len(summary) <= k


def test_heavy_hitters_output_partition_independent(spark):
    rng = random.Random(11)
    stream = _random_stream(rng, 8_000, 400)
    truth = Counter(stream)
    n = len(stream)
    phi_inv = 50
    expect = sorted(
        (t, c) for t, c in truth.items() if c * phi_inv >= n
    )
    assert expect, "test stream must contain heavy hitters"
    results = []
    for parts in (1, 3, 8):
        df = spark.createDataFrame(
            [(t,) for t in stream], "token string"
        ).repartition(parts)
        out = HH.heavy_hitters(df, phi_inv=phi_inv, k=64).collect()
        results.append(sorted((r["token"], r["freq"]) for r in out))
    assert results[0] == results[1] == results[2] == expect


def test_heavy_hitters_shuffled_fallback_same_output(spark):
    """Above the candidate-count gate the recount join must NOT be
    forced through a driver broadcast (k·num_partitions can reach
    millions of rows on a real cluster) — and the output is identical
    either way, because the join strategy is a physical choice only."""
    rng = random.Random(17)
    stream = _random_stream(rng, 4_000, 200)
    df = spark.createDataFrame([(t,) for t in stream], "token string").repartition(4)
    hinted = sorted(
        (r["token"], r["freq"])
        for r in HH.heavy_hitters(df, phi_inv=50, k=64).collect()
    )
    fallback = sorted(
        (r["token"], r["freq"])
        for r in HH.heavy_hitters(
            df, phi_inv=50, k=64, broadcast_max_candidates=0
        ).collect()
    )
    assert hinted == fallback and hinted


def test_heavy_hitters_rejects_undersized_k(spark):
    df = spark.createDataFrame([("a",)], "token string")
    try:
        HH.heavy_hitters(df, phi_inv=100, k=10)
    except ValueError as e:
        assert "superset" in str(e)
    else:
        raise AssertionError("k < phi_inv must be rejected")


def test_registry_heavy_hitters_plan_broadcasts_recount(spark):
    from spark_streaming_twitch_analytics_spark.plans import explain as EX

    df = registry.get("corpus_heavy_hitters").fn(spark, SF)
    # candidate set and total must be broadcast — a sort-merge join here
    # would mean the recount shuffles the full token stream by key
    assert EX.count_operator(df, "BroadcastHashJoin") >= 1
    assert not EX.has_operator(df, "SortMergeJoin")
    plan = EX.formatted_plan(df)
    assert "MapInPandas" in plan  # the bounded-memory candidate pass


def test_registry_heavy_hitters_matches_exact(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    from spark_streaming_twitch_analytics_spark.functions import text as X

    tokens = d.select(F.explode(X.tokenize(F.col("text"))).alias("token"))
    n = tokens.count()
    exact = {
        (r["token"], r["c"])
        for r in tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * 1000 >= n)
        .collect()
    }
    got = {
        (r["token"], r["freq"])
        for r in registry.get("corpus_heavy_hitters").fn(spark, SF).collect()
    }
    assert got == exact


def test_grouped_heavy_hitters_partition_independent_and_per_group(spark):
    """Per-group thresholds: a token can dominate a SMALL group while
    being invisible globally — and the output must be identical for any
    partitioning (the per-group MG superset + exact recount argument)."""
    rng = random.Random(23)
    # group 'big': 6000 spread tokens; group 'small': 60 tokens where
    # 'hot' takes a third — heavy in 'small', hopeless globally
    stream = [("big", t) for t in _random_stream(rng, 6_000, 500)]
    stream += [("small", "hot")] * 20 + [
        ("small", f"s{i}") for i in range(40)
    ]
    truth = Counter(stream)
    n_g = Counter(g for g, _ in stream)
    phi_inv = 25
    expect = sorted(
        (g, t, c) for (g, t), c in truth.items() if c * phi_inv >= n_g[g]
    )
    assert ("small", "hot", 20) in expect
    assert not any(g == "big" and t == "hot" for g, t, _ in expect)
    results = []
    for parts in (1, 3, 8):
        df = spark.createDataFrame(
            stream, "lang string, token string"
        ).repartition(parts)
        out = HH.grouped_heavy_hitters(df, "lang", phi_inv=phi_inv, k=64).collect()
        results.append(sorted((r["lang"], r["token"], r["freq"]) for r in out))
    assert results[0] == results[1] == results[2] == expect


def test_grouped_heavy_hitters_rejects_non_string_group_column(spark):
    """ADVICE r8: the MG summary carries the group key as a string, so a
    non-string group column would silently miss the recount join —
    rejected at plan time instead."""
    import pytest

    df = spark.createDataFrame([(1, "a")], "grp long, token string")
    with pytest.raises(TypeError, match="StringType"):
        HH.grouped_heavy_hitters(df, "grp", phi_inv=2, k=4)


def test_grouped_heavy_hitters_null_group_raises_not_vanishes(spark):
    """ADVICE r8: a NULL group used to stringify to 'None' and drop out
    of the recount join (silently losing that group's heavy hitters
    while a SQL GROUP BY keeps NULL as a real group). It must be a loud
    error now."""
    import pytest
    from pyspark.errors import PySparkException

    df = spark.createDataFrame(
        [("a", "x"), (None, "x"), (None, "x"), ("a", "y")],
        "lang string, token string",
    )
    # ADVICE r9: the old (Py4JJavaError, Exception) tuple was vacuous as
    # a type check; the worker-side ValueError surfaces as a
    # PySparkException subclass, and the message match pins the cause.
    with pytest.raises(PySparkException, match="non-null string"):
        HH.grouped_heavy_hitters(df, "lang", phi_inv=2, k=4).collect()


def test_grouped_heavy_hitters_gate_counts_actual_candidates(spark):
    """ADVICE r8: the broadcast gate must scale with the REAL per-group
    candidate set (k·partitions·groups), not the group-blind
    k·partitions estimate. With many groups and a tiny
    broadcast_max_candidates, the candidate join must NOT carry a
    broadcast hint."""
    rows = [(f"g{i}", f"t{j}") for i in range(40) for j in range(5)]
    df = spark.createDataFrame(rows, "lang string, token string").repartition(2)
    out = HH.grouped_heavy_hitters(
        df, "lang", phi_inv=5, k=8, broadcast_max_candidates=10
    )
    # correctness unchanged: every token is exactly 1/5 of its group
    got = sorted((r["lang"], r["token"], r["freq"]) for r in out.collect())
    assert len(got) == 200 and all(c == 1 for _, _, c in got)
