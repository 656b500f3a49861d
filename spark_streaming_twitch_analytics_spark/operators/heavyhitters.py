"""Deterministic heavy hitters by Misra-Gries candidates + exact recount.

``corpus_cms_counts`` answers point queries against a fixed sketch; the
complementary production question is ENUMERATION — "every token whose
frequency is at least a phi-fraction of the stream" (frequent-items /
iceberg query). Exact enumeration needs a full-vocabulary shuffle whose
reduction state is the vocabulary itself, which is exactly what stops
fitting first at 100 TB. The classic scalable form is two passes:

1. **Candidate pass** — each partition summarizes its token stream with
   a Misra-Gries summary of k counters (k = ceil(1/phi)); per-partition
   memory is O(k) REGARDLESS of vocabulary size, and the summaries are
   mergeable (Agarwal et al., "Mergeable Summaries", PODS 2012): the
   union of the per-partition survivor sets is a superset of every
   token with global frequency > N/(k+1) — and phi·N > N/(k+1) holds by
   the choice of k, so NO true heavy hitter can be missed.
2. **Recount pass** — the candidate set (≤ k·num_partitions rows) is
   broadcast and the stream is re-scanned counting ONLY candidates;
   the shuffle now carries at most |candidates| distinct keys instead
   of |vocabulary|.

The final filter compares exact counts against the threshold with pure
integer arithmetic (``phi_inv·freq ≥ N`` rather than ``freq ≥ phi·N``),
so the output is a deterministic function of the data — independent of
partitioning, batch boundaries, and engine — even though the
intermediate MG summaries are not. That is what makes the query
hash-checkable against a plain ``GROUP BY ... HAVING`` oracle.

MG merge rule used here (vectorized, per Arrow batch): add the batch's
exact counts to the summary; while more than k counters survive,
subtract the (k+1)-th largest count from every counter and drop the
non-positive ones. Each batch's exact counter table is itself an
error-0 MG summary, so by the merge theorem the partition summary's
undercount never exceeds n_partition/(k+1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge_batch(
    counts: dict[str, int], batch_counts: dict[str, int], k: int
) -> dict[str, int]:
    """One Misra-Gries merge step: add a batch's exact counts into the
    running summary, then (if over k counters) subtract the (k+1)-th
    largest count from every counter and drop the non-positive ones —
    the mergeable-summaries rule, which keeps the total undercount of
    any token ≤ n_seen/(k+1)."""
    for tok, c in batch_counts.items():
        counts[tok] = counts.get(tok, 0) + int(c)
    if len(counts) > k:
        arr = np.fromiter(counts.values(), dtype=np.int64)
        # (k+1)-th largest value; subtracting it from every counter
        # kills at least len-k counters (all ≤ m).
        m = int(np.partition(arr, len(arr) - k - 1)[len(arr) - k - 1])
        counts = {t: c - m for t, c in counts.items() if c > m}
    return counts


def mg_summarize_partitions(tokens: DataFrame, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries over a ``token`` column:
    one ``mapInPandas`` pass, O(k) state per task, emits the surviving
    ``(token, lower_bound)`` counters of each partition (``lower_bound``
    undercounts the partition-local frequency by ≤ n_partition/(k+1)).

    The summary also carries one SENTINEL row per partition (``token``
    NULL, ``lower_bound`` = rows seen by the task, nulls included) so
    the stream length N is a free by-product of this pass — callers
    sum the sentinels instead of paying a second full scan just to
    count. Real NULL tokens can't collide with the sentinel: pandas
    ``value_counts`` drops NaN, so a NULL token never becomes an MG
    counter (and would fail the recount equi-join anyway)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        n_seen = 0
        for pdf in batches:
            n_seen += len(pdf)
            vc = pdf["token"].value_counts()
            counts = mg_merge_batch(counts, dict(vc), k)
        yield pd.DataFrame(
            {
                "token": list(counts.keys()) + [None],
                "lower_bound": np.concatenate(
                    [
                        np.fromiter(
                            counts.values(), dtype=np.int64, count=len(counts)
                        ),
                        np.array([n_seen], dtype=np.int64),
                    ]
                ),
            }
        )

    return tokens.select("token").mapInPandas(run, "token string, lower_bound long")


def heavy_hitters(
    tokens: DataFrame,
    phi_inv: int = 1000,
    k: int | None = None,
    broadcast_max_candidates: int = 100_000,
) -> DataFrame:
    """All tokens with exact frequency ≥ N/phi_inv (N = stream length),
    via MG candidates + exact recount. Returns ``(token, freq)`` with
    exact BIGINT frequencies; deterministic for any partitioning
    because the candidate superset guarantee (k ≥ phi_inv ⇒ threshold
    phi·N = N/phi_inv > N/(k+1)) plus the exact recount make the MG
    nondeterminism unobservable in the output.

    Scale shape: the candidate set can reach k·num_partitions rows, and
    at thousands of partitions that is millions of rows — too big to
    force through a driver broadcast. The join strategy is gated on the
    PLAN-LEVEL bound k·num_partitions (a worst case known before any
    job runs, so gating costs no action): broadcast-hint below
    ``broadcast_max_candidates``, plain shuffled equi-join above (AQE
    still picks broadcast if the build side turns out small — the
    estimate erring high only ever falls back to the safe shape).
    N comes from the MG pass's sentinel rows, so ``tokens`` is scanned
    exactly twice — the algorithm's floor — instead of three times."""
    if k is None:
        k = phi_inv
    if k < phi_inv:
        raise ValueError("k must be ≥ phi_inv for the superset guarantee")
    from ..cache import eager_persist

    # worst-case candidate bound, known without running anything
    est_cand = k * tokens.rdd.getNumPartitions()
    summary = eager_persist(mg_summarize_partitions(tokens, k))
    candidates = (
        summary.filter(F.col("token").isNotNull()).select("token").distinct()
    )
    cand_side = (
        F.broadcast(candidates)
        if est_cand <= broadcast_max_candidates
        else candidates
    )
    counted = (
        tokens.join(cand_side, "token", "inner")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = summary.filter(F.col("token").isNull()).agg(
        F.sum("lower_bound").alias("n_total")
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * phi_inv >= F.col("n_total"))
        .select("token", "freq")
    )


def mg_summarize_partitions_grouped(
    tokens: DataFrame, group_col: str, k: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries PER GROUP: one ``mapInPandas``
    pass maintaining an independent k-counter summary for each group
    value seen by the task — O(k·|groups|) state, bounded when the group
    column is class-bounded (language, source, shard family). The merge
    theorem applies per group: each group's undercount is ≤
    n_partition_group/(k+1), so the per-group superset guarantee holds
    against per-group thresholds. One sentinel row per (partition,
    group) carries the group's row count (token NULL), so per-group
    stream lengths N_g cost no extra scan.

    PRECONDITION (enforced): the group column must be a NON-NULL STRING.
    Sentinel rows overload ``token IS NULL``, and the summary's group
    key travels as a string — a NULL or non-string group value would
    silently stringify (``None`` → ``'None'``) and then never match the
    original-typed column in the recount join, vanishing that group's
    heavy hitters while a SQL oracle's GROUP BY keeps NULL as a real
    group. Nulls/non-strings therefore raise inside the task; a
    non-string group COLUMN TYPE is additionally rejected at plan time
    by :func:`grouped_heavy_hitters`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, dict[str, int]] = {}
        seen: dict[str, int] = {}
        for pdf in batches:
            for g, sub in pdf.groupby(group_col, dropna=False):
                if not isinstance(g, str):
                    raise ValueError(
                        f"grouped heavy hitters: group column "
                        f"'{group_col}' must be non-null string-valued, "
                        f"got {g!r} — stringifying would drop the group "
                        "in the recount join"
                    )
                gk = g
                seen[gk] = seen.get(gk, 0) + len(sub)
                vc = sub["token"].value_counts()
                counts[gk] = mg_merge_batch(counts.get(gk, {}), dict(vc), k)
        gs, ts, lbs = [], [], []
        for gk, c in counts.items():
            for tok, lb in c.items():
                gs.append(gk)
                ts.append(tok)
                lbs.append(lb)
        for gk, n in seen.items():
            gs.append(gk)
            ts.append(None)
            lbs.append(n)
        yield pd.DataFrame(
            {
                group_col: gs,
                "token": ts,
                "lower_bound": np.array(lbs, dtype=np.int64),
            }
        )

    return tokens.select(group_col, "token").mapInPandas(
        run, f"{group_col} string, token string, lower_bound long"
    )


def grouped_heavy_hitters(
    tokens: DataFrame,
    group_col: str,
    phi_inv: int = 1000,
    k: int | None = None,
    broadcast_max_candidates: int = 100_000,
) -> DataFrame:
    """All (group, token) with exact frequency ≥ N_group/phi_inv — the
    per-language/per-source production form of :func:`heavy_hitters`
    ("what dominates EACH slice", not the global stream). Same
    two-pass shape with the group key threaded through every stage:
    per-group MG candidates (superset per group by the same k ≥ phi_inv
    argument), exact recount on (group, token), and an integer
    threshold against the group's own N from the sentinel rows.
    Deterministic for any partitioning for the same reason as the
    global form.

    Requires a non-null StringType group column (see
    :func:`mg_summarize_partitions_grouped` — type checked here at plan
    time, nulls raise inside the summarizer task).

    Broadcast gating: unlike the global form, the true candidate count
    is k·num_partitions·|groups-per-task| — a ``k·num_partitions``
    ESTIMATE errs unsafe for high-cardinality groups (it undercounts by
    the group factor and could broadcast-hint a huge set). The summary
    is eagerly persisted anyway, so the gate instead counts the ACTUAL
    candidate rows (one tiny job over the cached summary, an upper
    bound on the distinct candidate set) — exact, never unsafe, and
    costs nothing at corpus scale."""
    if k is None:
        k = phi_inv
    if k < phi_inv:
        raise ValueError("k must be ≥ phi_inv for the superset guarantee")
    from pyspark.sql.types import StringType

    gtype = tokens.schema[group_col].dataType
    if not isinstance(gtype, StringType):
        raise TypeError(
            f"grouped_heavy_hitters: group column '{group_col}' must be "
            f"StringType, got {gtype.simpleString()} — the MG summary "
            "carries the group key as a string and a non-string column "
            "would silently miss the recount join"
        )
    from ..cache import eager_persist

    summary = eager_persist(mg_summarize_partitions_grouped(tokens, group_col, k))
    candidates = (
        summary.filter(F.col("token").isNotNull())
        .select(group_col, "token")
        .distinct()
    )
    # summary is already materialized in cache: counting its candidate
    # rows is a metadata-cheap job and upper-bounds |distinct candidates|
    n_cand = summary.filter(F.col("token").isNotNull()).count()
    cand_side = (
        F.broadcast(candidates)
        if n_cand <= broadcast_max_candidates
        else candidates
    )
    counted = (
        tokens.join(cand_side, [group_col, "token"], "inner")
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    totals = (
        summary.filter(F.col("token").isNull())
        .groupBy(group_col)
        .agg(F.sum("lower_bound").alias("n_group"))
    )
    return (
        counted.join(F.broadcast(totals), group_col)
        .filter(F.col("freq") * phi_inv >= F.col("n_group"))
        .select(group_col, "token", "freq")
    )
