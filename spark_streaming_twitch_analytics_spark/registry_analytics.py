"""Round-4 analytics extensions: SQ8 ANN (scan + persisted int8 index),
edit-distance typo mining, frontier BFS, exact exponential-decay
smoothing, sparse random projection, winsorized robust aggregation,
PERCENTILE_CONT interpolated quantiles (global + grouped), a KMV
distinct/overlap sketch, a native WITH RECURSIVE clamped-balance
recurrence, a Z-order clustered-layout scan, and two append-mode
streaming shapes (chained two-level windows, left-outer interval join)
driven by a sentinel-flush harness.

Each query keeps the repo's oracle discipline — every cross-row float
accumulation is either integer-exact by construction (typo pairs, BFS,
projection, decay terms are dyadic rationals, winsorized/zorder sums
are integer cents, KMV estimates divide integers once) or an
identical-order IEEE fold shared with the DuckDB twin (SQ8 cosine,
quantile lerp).

Scale notes are inline per query; the common theme: candidate
generation is always blocked/keyed (deletion-variant buckets, frontier
neighborhoods, SQ8's bounded exchange), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import text as X
from .functions import vectors as V
from .operators import dedup, quantiles, similarity, topk
from .registry import (
    _CLUSTER_EDGES_SQL,
    _EMB_CTE,
    _IVF_CELLS,
    _IVF_SQL_ASSIGN,
    _IVF_SQL_PROBES,
    _docs,
    register,
)
from .tables import load_table


# ===========================================================================
# SQ8 scalar-quantization ANN (asymmetric: corpus coded, query full-precision)
# ===========================================================================

_SQ8_STATS_CTE = f"""e AS ({_EMB_CTE}),
pd AS (SELECT j, min(v[j]) AS mn, max(v[j]) AS mx
  FROM e, range(1, 65) t(j) GROUP BY j),
st AS (SELECT list(mn ORDER BY j) AS mns, list(mx ORDER BY j) AS mxs FROM pd),
cq AS (SELECT vec_id AS c_id, {V.sq8_requant_sql("v", "mns", "mxs", 64)} AS cv
  FROM e, st),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 10 = 0)"""

_SQ8_TOPK_SQL = f"""WITH {_SQ8_STATS_CTE},
scored AS (SELECT q_id, c_id, {V.cosine_sql("qv", "cv", 64)} AS cos
  FROM cq, q WHERE c_id <> q_id)
{topk.top_k_per_group_sql("SELECT * FROM scored", ["q_id"], "cos", 5, ["c_id"])}"""


@register(
    "ann_sq8_topk",
    _SQ8_TOPK_SQL,
    survey="ext: SQ8 scalar-quantized ANN — every candidate dimension "
    "coded to 8 bits against the corpus per-dim [min, max], queries kept "
    "full precision (asymmetric search). The scan-compression ANN family "
    "next to PQ: int8 codes read 4x less memory bandwidth than float32 "
    "at the same brute-scan shape",
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine over SQ8-requantized candidates. The quantization
    round-trip is engine-exact (identical-order IEEE per dimension,
    order-invariant min/max stats), so the ranking hash-matches DuckDB."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return similarity.sq8_topk(queries, emb, 5)


_SQ8_RECALL_SQL = f"""WITH {_SQ8_STATS_CTE},
sscored AS (SELECT q_id, c_id, {V.cosine_sql("qv", "cv", 64)} AS cos
  FROM cq, q WHERE c_id <> q_id),
stt AS ({topk.top_k_per_group_sql("SELECT * FROM sscored", ["q_id"], "cos", 5, ["c_id"])}),
bscored AS (SELECT q_id, c.vec_id AS c_id, {V.cosine_sql("qv", "c.v", 64)} AS cos
  FROM e c, q WHERE c.vec_id <> q_id),
bt AS ({topk.top_k_per_group_sql("SELECT * FROM bscored", ["q_id"], "cos", 5, ["c_id"])}),
m AS (SELECT CAST(count(*) AS BIGINT) AS matched
  FROM bt JOIN stt ON bt.q_id = stt.q_id AND bt.c_id = stt.c_id),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM bt)
SELECT matched, total,
  (floor((CAST(matched AS DOUBLE) / total) * 1000000.0) / 1000000.0) AS recall
FROM m, t"""


@register(
    "ann_sq8_recall",
    _SQ8_RECALL_SQL,
    survey="ext: ANN evaluation — recall@5 of the SQ8 quantized scan vs "
    "exact brute-force top-k (the fidelity number that decides whether "
    "8-bit codes are servable; expect NEAR-1 recall — SQ8 loses far less "
    "ranking signal than PQ's subspace codebooks)",
)
def ann_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of SQ8 vs exact — one engine-exact integer ratio."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    # r12: fused one-scan meter (bit-exact per-dim requant twin, stats
    # from the engine aggregate) — similarity.sq8_recall_fused
    return similarity.sq8_recall_fused(queries, emb, 5)


@register(
    "ann_sq8_index_topk",
    _SQ8_TOPK_SQL,
    survey="ext: SQ8 ANN served off the PERSISTED int8 index "
    "(build_sq8_index → query_sq8_index): hash-matches ann_sq8_topk; the "
    "scan reads 1-byte-per-dim codes — 4x less IO than raw float32 "
    "embeddings, the storage/bandwidth form a production SQ8 deployment "
    "actually runs",
)
def ann_sq8_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ranking as ann_sq8_topk but scanning the persisted
    codes+stats layout instead of re-encoding the corpus per query
    batch — encode once, serve many."""
    from .registry import _ensure_ann_index

    path = _ensure_ann_index(spark, sf_dir, "sq8")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return similarity.query_sq8_index(queries, path, 5)


# IVF cell pruning composed with SQ8 scan compression — the production
# pairing (FAISS "IVFx,SQ8") and the direct answer to the ×10-replica
# certification flags: the flat SQ8 scan is |Q|·|C| pairs by design
# (15-18× wall at ×10 data, SCALE_X10_HEADLINE.json); celling the coded
# corpus bounds each query to n_probe/n_cells of the codes.
_IVF_SQ8_SCORED_CTE = f"""WITH e AS ({_EMB_CTE}),
{_IVF_SQL_ASSIGN},
{_IVF_SQL_PROBES}
pd AS (SELECT j, min(v[j]) AS mn, max(v[j]) AS mx
  FROM e, range(1, 65) t(j) GROUP BY j),
st AS (SELECT list(mn ORDER BY j) AS mns, list(mx ORDER BY j) AS mxs FROM pd),
cq AS (SELECT vec_id AS c_id, cell,
  {V.sq8_requant_sql("v", "mns", "mxs", 64)} AS cv FROM ac, st),
iscored AS (SELECT q_id, c_id, {V.cosine_sql("qv", "cv", 64)} AS cos
  FROM cq JOIN qp ON cq.cell = qp.cell WHERE c_id <> q_id)"""

_IVF_SQ8_TOPK_SQL = f"""{_IVF_SQ8_SCORED_CTE}
{topk.top_k_per_group_sql("SELECT * FROM iscored", ["q_id"], "cos", 5, ["c_id"])}"""


@register(
    "ann_ivf_sq8_topk",
    _IVF_SQ8_TOPK_SQL,
    survey="ext: IVF+SQ8 ANN — cell pruning composed with 8-bit scan "
    "compression (the FAISS IVFx,SQ8 production pairing): cell "
    "assignment on full-precision vectors, asymmetric SQ8 scoring "
    "inside the probed cells only; ships the scale path for the "
    "x10-cert-flagged flat SQ8 scan (15-18x at x10 -> the IVF family's "
    "~linear decade curve) while keeping the 4x bandwidth win",
)
def ann_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 asymmetric SQ8 cosine within IVF 2-probe cells. Every
    piece (cell argmax, probe masking, per-dim requant, quantized
    cosine, c_id tie-break) is engine-exact, so the composition
    hash-matches DuckDB."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return similarity.ivf_sq8_topk(
        queries, emb, 5, n_cells=_IVF_CELLS, n_probe=2
    )


@register(
    "ann_ivf_sq8_index_topk",
    _IVF_SQ8_TOPK_SQL,
    survey="ext: IVF+SQ8 ANN served off the PERSISTED layout "
    "(build_ivf_sq8_index -> query_ivf_sq8_index): int8 codes "
    "partitioned by cell, so a query batch reads only its probed "
    "cells' FILES (partition filter) and those files are 1-byte-per-"
    "dim codes — both serve-time wins composed; hash-matches "
    "ann_ivf_sq8_topk",
)
def ann_ivf_sq8_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ranking as ann_ivf_sq8_topk off the cell-partitioned codes
    layout — encode+cell once, serve many."""
    from .registry import _ensure_ann_index

    path = _ensure_ann_index(spark, sf_dir, "ivfsq8")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return similarity.query_ivf_sq8_index(
        queries, path, 5, n_cells=_IVF_CELLS, n_probe=2
    )


_IVF_SQ8_RECALL_SQL = f"""{_IVF_SQ8_SCORED_CTE},
stt AS ({topk.top_k_per_group_sql("SELECT * FROM iscored", ["q_id"], "cos", 5, ["c_id"])}),
bscored AS (SELECT qb.vec_id AS q_id, c.vec_id AS c_id,
  {V.cosine_sql("qb.v", "c.v", 64)} AS cos
  FROM e c, e qb WHERE qb.vec_id % 10 = 0 AND c.vec_id <> qb.vec_id),
bt AS ({topk.top_k_per_group_sql("SELECT * FROM bscored", ["q_id"], "cos", 5, ["c_id"])}),
m AS (SELECT CAST(count(*) AS BIGINT) AS matched
  FROM bt JOIN stt ON bt.q_id = stt.q_id AND bt.c_id = stt.c_id),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM bt)
SELECT matched, total,
  (floor((CAST(matched AS DOUBLE) / total) * 1000000.0) / 1000000.0) AS recall
FROM m, t"""


@register(
    "ann_ivf_sq8_recall",
    _IVF_SQ8_RECALL_SQL,
    survey="ext: ANN evaluation — recall@5 of the IVF+SQ8 composition "
    "vs exact brute force: measures the cell-miss AND quantization "
    "losses together, the number that decides whether the composed "
    "index is servable (expect IVF's probe recall to dominate — SQ8 "
    "alone is near-1)",
)
def ann_ivf_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the composed index vs exact — one engine-exact
    integer ratio (the exact side is the meter, sampled in
    production)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    # r12: fused one-scan meter (IVF probe eligibility x SQ8 approx
    # scores) — similarity.ivf_sq8_recall_fused
    return similarity.ivf_sq8_recall_fused(
        queries, emb, 5, n_cells=_IVF_CELLS, n_probe=2
    )


# ===========================================================================
# Edit-distance-1 typo mining (FastSS deletion neighborhoods)
# ===========================================================================

_TYPO_WORD_RE = "^[a-z]{3,12}$"

# ≤2-deletion neighborhood: the word, every 1-deletion, every 2-deletion
_TYPO_VARS_SQL = """list_prepend(w, list_concat(
  list_transform(range(1, length(w) + 1),
    j -> substr(w, 1, j - 1) || substr(w, j + 1, length(w))),
  flatten(list_transform(range(1, length(w)), i ->
    list_transform(range(i + 1, length(w) + 1),
      j -> substr(w, 1, i - 1) || substr(w, i + 1, j - i - 1)
           || substr(w, j + 1, length(w)))))))"""

_TYPO_SQL = f"""WITH toks AS (
  SELECT unnest({X.tokenize_sql("text")}) AS w FROM documents),
words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM toks
  WHERE regexp_matches(w, '{_TYPO_WORD_RE}')
  GROUP BY w HAVING count(*) >= 2),
vars AS (SELECT w, unnest({_TYPO_VARS_SQL}) AS key FROM words),
cand AS (
  SELECT DISTINCT a.w AS word_a, b.w AS word_b
  FROM vars a JOIN vars b ON a.key = b.key AND a.w < b.w)
SELECT word_a, word_b,
       CAST(levenshtein(word_a, word_b) AS INT) AS dist,
       fa.freq AS freq_a, fb.freq AS freq_b
FROM cand
JOIN words fa ON fa.w = word_a
JOIN words fb ON fb.w = word_b
WHERE levenshtein(word_a, word_b) BETWEEN 1 AND 2"""


@register(
    "corpus_typo_pairs",
    _TYPO_SQL,
    survey="ext: edit-distance similarity join (k <= 2) over the corpus "
    "vocabulary (FastSS deletion neighborhoods, Bocek et al. 2007, "
    "public) — spell-variant / typo candidate mining for corpus "
    "normalization. Candidates meet ONLY on a shared <=2-deletion "
    "variant (equi-join on a derived key), then levenshtein verifies; "
    "never all-pairs",
)
def corpus_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word pairs at edit distance 1-2 among frequent lowercase
    vocabulary (len 3-12, freq >= 2), with the exact distance and both
    frequencies — the typical canonicalization signal is freq_a >> freq_b.

    Completeness (FastSS): if d(a, b) <= k, an optimal alignment leaves
    a common subsequence reachable from EACH side by deleting <= k
    characters, so a and b share a member of their <=k-deletion
    neighborhoods; levenshtein then rejects the false candidates.

    Scale: the vocabulary table (distinct words) is tiny relative to any
    corpus; the <=2-deletion neighborhood multiplies it by
    1 + len + C(len,2) <= 79 — still vocabulary-scale. The self
    equi-join on the variant key is bucketed by construction;
    verification touches only candidates. The same block-then-verify
    skeleton as MinHash/PPJoin, specialized to edit distance."""
    docs = _docs(spark, sf_dir)
    words = (
        docs.select(F.explode(X.tokenize(F.col("text"))).alias("w"))
        .filter(F.col("w").rlike(_TYPO_WORD_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 2)
    )
    from .cache import eager_persist

    # words is read three times (variants + two freq lookups) — persist
    # so the tokenize/explode corpus scan runs once
    words = eager_persist(words)
    variants = words.select(
        "w",
        F.explode(
            F.expr(
                """concat(
  array(w),
  transform(sequence(1, length(w)),
    j -> concat(substr(w, 1, j - 1), substr(w, j + 1, length(w)))),
  flatten(transform(sequence(1, length(w) - 1), i ->
    transform(sequence(i + 1, length(w)),
      j -> concat(substr(w, 1, i - 1), substr(w, i + 1, j - i - 1),
                  substr(w, j + 1, length(w)))))))"""
            )
        ).alias("key"),
    )
    a = variants.select(F.col("w").alias("word_a"), "key")
    b = variants.select(F.col("w").alias("word_b"), "key")
    cand = (
        a.join(b, "key")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    fa = words.select(F.col("w").alias("word_a"), F.col("freq").alias("freq_a"))
    fb = words.select(F.col("w").alias("word_b"), F.col("freq").alias("freq_b"))
    dist = F.levenshtein(F.col("word_a"), F.col("word_b"))
    return (
        cand.filter(dist.between(1, 2))
        .join(fa, "word_a")
        .join(fb, "word_b")
        .select(
            "word_a",
            "word_b",
            dist.cast("int").alias("dist"),
            "freq_a",
            "freq_b",
        )
    )


# ===========================================================================
# Frontier BFS over the near-dup graph (recursive-CTE oracle)
# ===========================================================================

_BFS_MAX_HOPS = 4

_BFS_SQL = (
    _CLUSTER_EDGES_SQL
    + f""",
undirected AS (SELECT a AS src, b AS dst FROM edges
               UNION SELECT b AS src, a AS dst FROM edges),
bfs AS (
  SELECT (SELECT min(a) FROM edges) AS node, 0 AS hops
  UNION
  SELECT u.dst, b.hops + 1
  FROM bfs b JOIN undirected u ON u.src = b.node
  WHERE b.hops < {_BFS_MAX_HOPS})
SELECT node AS doc_id, CAST(min(hops) AS INT) AS hops
FROM bfs GROUP BY node"""
)


@register(
    "dedup_bfs_hops",
    _BFS_SQL,
    survey="ext: frontier BFS — hop distance from the minimum node over "
    "the minhash near-dup graph, vs a recursive-CTE oracle. The third "
    "iterative-graph pattern (frontier loop) next to connected "
    "components (fixed point) and integer PageRank (fixed rounds); "
    "per-round shuffle bounded by the frontier's neighborhood",
)
def dedup_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hops) for every node within 4 hops of the minimum doc_id
    in the near-dup graph (minhash pairs, jaccard >= 0.5) — 'how far
    does this boilerplate family extend' provenance tracing. Integer
    hops, engine-exact."""
    from .operators.clusters import bfs_hops
    from .registry import _ensure_minhash_pairs

    pairs = _ensure_minhash_pairs(spark, sf_dir)  # standing pair table
    edges = pairs.filter(F.col("jaccard") >= 0.5).select("a", "b")
    return bfs_hops(edges, max_hops=_BFS_MAX_HOPS)


# ===========================================================================
# Exact exponential-decay smoothing (alpha = 1/2 -> dyadic, bit-exact)
# ===========================================================================

_DECAY_DAYS = 15

_DECAY_SQL = f"""WITH d AS (
  SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2)
SELECT cur.day, cur.event_type, cur.cnt,
  sum(prev.cnt / CAST(1 << date_diff('day', prev.day, cur.day) AS DOUBLE))
    AS decay_sum
FROM d cur JOIN d prev
  ON prev.event_type = cur.event_type
  AND prev.day BETWEEN cur.day - {_DECAY_DAYS} AND cur.day
GROUP BY 1, 2, 3"""


@register(
    "events_decay_sum",
    _DECAY_SQL,
    survey="ext: exponential-decay smoothing of daily event counts "
    "(EWMA family) that is BIT-EXACT across engines: decay base 1/2 "
    "over integer day lags makes every term cnt·2^-k a dyadic rational, "
    "so the windowed sum never rounds and fold order cannot matter — "
    "no tolerance tricks, a float time-series metric with an exact hash",
)
def events_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (day, event_type): that day's count plus the trailing 15-day
    exponentially-decayed count sum (weight 2^-lag).

    Exactness: weights are exact powers of two >= 2^-15, so each term
    cnt·2^-lag is a dyadic rational with lsb 2^-15. A double holds the
    running sum exactly while it needs <= 53 mantissa bits, i.e. while
    the total stays below 2^38 (53 - 15 bits above the lsb); with <= 16
    terms that is guaranteed for per-(day,type) counts < 2^37 ≈ 1.4e11
    (not 2^40 — at ~2^40-scale counts the sum would need ~56 bits and
    round). Within that bound no rounding ever happens, hence
    order-invariance without integer tricks; beyond it, accumulate in
    integer 2^15-scaled units instead.

    Scale: the self-range-join runs on the AGGREGATED (day, type) table
    — days x types, trivially small at any corpus scale; the only big
    work is the first groupBy, a map-side-combining count."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    prev = d.select(
        F.col("day").alias("pday"),
        F.col("event_type").alias("ptype"),
        F.col("cnt").alias("pcnt"),
    )
    # 2^-lag as 1 / (1 << lag): exact power-of-two division, no libm pow
    # (shiftleft's shift amount must be an expression, hence F.expr)
    weight = F.expr("1.0 / cast(shiftleft(1L, datediff(day, pday)) as double)")
    return (
        d.join(
            prev,
            (F.col("ptype") == F.col("event_type"))
            & (F.col("pday") >= F.date_sub(F.col("day"), _DECAY_DAYS))
            & (F.col("pday") <= F.col("day")),
        )
        .groupBy("day", "event_type", "cnt")
        .agg(F.sum(F.col("pcnt") * weight).alias("decay_sum"))
    )


# ===========================================================================
# Sparse random projection (Achlioptas) — integer-exact dimensionality cut
# ===========================================================================

_PROJ_OUT = 16
_PROJ_DIM = 64


def _proj_sql() -> str:
    xi = (
        "list_transform(range(1, 65), "
        "j -> CAST(floor(v[j] * 1000.0 + 0.5) AS BIGINT))"
    )
    cols = ", ".join(
        V.int_dot_sql("xi", V.achlioptas_weights(k, _PROJ_DIM))
        for k in range(_PROJ_OUT)
    )
    # Exploded (vec_id, k, coord) rows rather than an array column: the
    # driver's oracle harness canonicalizes results in pandas, which
    # cannot hash list cells — scalar rows are the certifiable shape.
    return f"""WITH e AS ({_EMB_CTE}),
q AS (SELECT vec_id, {xi} AS xi FROM e),
p AS (SELECT vec_id, [{cols}] AS proj FROM q)
SELECT vec_id, CAST(i - 1 AS BIGINT) AS k, proj[CAST(i AS INT)] AS coord
FROM p CROSS JOIN range(1, {_PROJ_OUT + 1}) t(i)"""


@register(
    "embedding_sparse_projection",
    _proj_sql(),
    survey="ext: sparse random projection (Achlioptas 2003, public) — "
    "64-dim embeddings cut to 16 dims with a deterministic {-1, 0, +1} "
    "matrix (~2/3 zeros). Inputs are milli-quantized to integers first, "
    "so every projected coordinate is an exact BIGINT dot product — "
    "engine-exact with no float anywhere. Row-local map: zero shuffle",
)
def embedding_sparse_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, k, coord): 16 exact integer coordinates per embedding,
    one row per (vector, output dim). The dimensionality-reduction front
    end for any downstream index (LSH on the projected space, cheap
    pre-filtering before exact cosine) — Johnson-Lindenstrauss distance
    preservation with a multiply-free matrix. Emitted in exploded scalar
    form (not array<bigint>) so the result is hashable row-by-row; the
    posexplode is still a narrow per-row map, so at 100 TB this remains
    a pure zero-shuffle scan."""
    from .functions.vectors import as_double

    emb = load_table(spark, sf_dir, "embeddings")
    xi = F.transform(
        as_double(F.col("embedding")),
        lambda x: F.floor(x * F.lit(1000.0) + F.lit(0.5)),
    )
    q = emb.select("vec_id", xi.alias("xi"))
    proj = F.array(
        *[
            V.int_dot(F.col("xi"), V.achlioptas_weights(k, _PROJ_DIM))
            for k in range(_PROJ_OUT)
        ]
    )
    return q.select(
        "vec_id", F.posexplode(proj).alias("k", "coord")
    ).withColumn("k", F.col("k").cast("bigint"))


# ===========================================================================
# Chained streaming window aggregation (multiple stateful operators)
# ===========================================================================


def _run_stream_with_flush(
    spark: SparkSession,
    sf_dir: str,
    build,
    n_files: int = 4,
    flush_days: int = 3660,
    watermark_days: int = 3650,
    sentinel_types: tuple[str, ...] = ("__flush__",),
) -> DataFrame:
    """Replay the events table as a file stream (one file per
    micro-batch), then feed ONE far-future sentinel event in a final
    micro-batch so the watermark passes every real window and APPEND
    mode emits all finalized results.

    Why this exists: chained stateful aggregations are append-mode-only
    (Spark restriction) — the complete-mode huge-watermark trick the
    other streaming twins use cannot apply. Instead the watermark delay
    still outlives the real event span (nothing real is ever late or
    evicted mid-replay, so file order cannot matter), and the sentinel —
    ``watermark + 10 days`` past everything — closes the real windows in
    one deterministic flush. The sentinel's own windows never close, so
    it never appears in the sink: the emitted table equals the batch
    aggregation over exactly the real events.

    ``sentinel_types``: event_type value(s) for the sentinel rows. A
    watermark node only counts rows that survive the operators BELOW it,
    so a plan that splits the stream per type (e.g. a stream-stream self
    join) needs one sentinel PER branch, typed to pass that branch's
    filter; the global watermark is the MIN across nodes. Each sentinel
    carries a distinct negative user_id/event_id so sentinels can never
    join each other."""
    import shutil
    import tempfile
    import uuid

    from .streaming.wordcount import memory_sink_query

    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="ev_stream_flush_")
    ev.repartition(n_files).write.mode("overwrite").parquet(src)
    sentinel = ev.agg(
        (F.max("ts") + F.expr(f"INTERVAL {flush_days} DAYS")).alias("ts")
    ).selectExpr(
        "explode(array({})) AS s".format(
            ", ".join(
                f"named_struct('event_id', CAST({-(i + 1)} AS BIGINT), "
                f"'user_id', CAST({-(i + 1)} AS BIGINT), "
                f"'event_type', '{t}')"
                for i, t in enumerate(sentinel_types)
            )
        ),
        "ts",
    ).select(
        F.col("s.event_id").alias("event_id"),
        F.col("ts"),
        F.col("s.user_id").alias("user_id"),
        F.col("s.event_type").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).select(*[f.name for f in ev.schema.fields])
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"stream_{uuid.uuid4().hex[:8]}"
    q = memory_sink_query(
        build(stream, f"{watermark_days} days"), name, mode="append"
    )
    try:
        q.processAllAvailable()  # phase 1: all real events, nothing emitted
        sentinel.write.mode("append").parquet(src)
        q.processAllAvailable()  # phase 2: watermark jump flushes windows
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)
    return spark.table(name)


_CHAIN_SQL = """WITH w5 AS (
  SELECT event_type,
    to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)) AS w5s,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT strftime(to_timestamp(CAST(floor(epoch(w5s) / 3600) * 3600 AS BIGINT)),
                '%Y-%m-%d %H:%M:%S') AS hour_start,
  event_type, CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(max(n) AS BIGINT) AS max_5min, CAST(sum(n) AS BIGINT) AS total
FROM w5 GROUP BY 1, 2"""


@register(
    "streaming_chained_windows",
    _CHAIN_SQL,
    survey="ext: CHAINED streaming window aggregation — two stateful "
    "operators in one continuous plan (5-min tumbling counts re-"
    "aggregated into hourly count/max/sum via window_time), Spark 3.5+ "
    "multi-stateful append mode; a far-future sentinel micro-batch "
    "flushes the final watermark so the emitted table ≡ the two-level "
    "batch oracle",
)
def streaming_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (hour, event_type): number of active 5-minute buckets, the
    peak 5-minute count, and the hourly total — the burstiness rollup a
    telemetry pipeline computes as one streaming job rather than a
    stream + a batch re-read. Both aggregation levels hold state; the
    downstream hour window consumes the upstream 5-min windows'
    event-time (window_time) so late-data semantics compose.

    Exactness: counts are integers; window boundaries are epoch-aligned
    floor divisions — identical on both engines."""

    def build(stream: DataFrame, wm: str) -> DataFrame:
        s5 = (
            stream.withWatermark("ts", wm)
            .groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return (
            s5.groupBy(
                F.window(F.window_time("window"), "1 hour"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_buckets"),
                F.max("n").alias("max_5min"),
                F.sum("n").alias("total"),
            )
            .select(
                F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "hour_start"
                ),
                "event_type",
                "n_buckets",
                "max_5min",
                "total",
            )
        )

    return _run_stream_with_flush(spark, sf_dir, build)


# ===========================================================================
# Conversion-latency percentiles (funnel step timing distribution)
# ===========================================================================

_LAT_QS = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))

_LAT_CTE = """SELECT CAST(min(pu.us) - c.cus AS BIGINT) AS lat_us
FROM (SELECT user_id, min(epoch_us(ts)) AS cus FROM events
      WHERE event_type = 'click' GROUP BY user_id) c
JOIN (SELECT user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase') pu
  ON pu.user_id = c.user_id AND pu.us >= c.cus
GROUP BY c.user_id, c.cus"""


@register(
    "events_conversion_latency",
    quantiles.interpolated_quantiles_sql(_LAT_CTE, "lat_us", _LAT_QS),
    survey="ext: funnel step-timing distribution — per user, microseconds "
    "from first click to the first subsequent purchase, summarized as "
    "interpolated p25/p50/p75/p90 (the conversion-SLA numbers a product "
    "team tracks); composes the funnel extraction with the "
    "histogram-select interpolated-quantile engine, all integer inputs",
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency percentiles of the click→purchase step. The per-user
    extraction is two keyed aggregates + one keyed join (first-click
    table is one row per converting user); the distribution summary is
    the two-pass histogram-select — no global sort anywhere. Latencies
    are exact integer microseconds, so the quantile lerp is the only
    float op (one shared IEEE sequence)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(us).alias("cus"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("puid"), us.alias("us")
    )
    lat = (
        clicks.join(
            purch,
            (F.col("puid") == F.col("user_id")) & (F.col("us") >= F.col("cus")),
        )
        .groupBy("user_id", "cus")
        .agg((F.min("us") - F.col("cus")).cast("long").alias("lat_us"))
        .select("lat_us")
    )
    # bin width ~2.8h of microseconds: a 30-day latency range stays
    # within a few hundred histogram bins
    return quantiles.interpolated_quantiles(
        lat, "lat_us", bin_width=1e10, qs=_LAT_QS
    )


# ===========================================================================
# KMV (k-minimum-values) sketch: distinct + INTERSECTION estimation
# ===========================================================================

_KMV_K = 16  # small enough that the ESTIMATOR branch runs on the test vocab
_KMV_SPACE = float(1 << 48)  # hash48 range


def _kmv_sql() -> str:
    from .sources.io import hash48_sql

    h = hash48_sql("token")
    est = (
        f"floor(({_KMV_K} - 1) * {_KMV_SPACE!r} / kth * 1000000.0) / 1000000.0"
    )
    return f"""WITH tok AS (
  SELECT CASE WHEN CAST(substr(md5(source), 1, 2) AS VARCHAR) < '8'
              THEN 0 ELSE 1 END AS side,
         unnest({X.tokenize_sql("text")}) AS token
  FROM documents),
hx AS (SELECT DISTINCT side, {h} AS h FROM tok),
ka AS (SELECT h FROM hx WHERE side = 0 ORDER BY h LIMIT {_KMV_K}),
kb AS (SELECT h FROM hx WHERE side = 1 ORDER BY h LIMIT {_KMV_K}),
ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
       ORDER BY h LIMIT {_KMV_K}),
ea AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS kth FROM ka),
eb AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS kth FROM kb),
eu AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS kth FROM ku),
truth AS (
  SELECT CAST(count(DISTINCT CASE WHEN side = 0 THEN h END) AS BIGINT) AS true_a,
         CAST(count(DISTINCT CASE WHEN side = 1 THEN h END) AS BIGINT) AS true_b,
         CAST(count(DISTINCT h) AS BIGINT) AS true_union
  FROM hx)
SELECT true_a, true_b, true_union,
  CASE WHEN ea.n < {_KMV_K} THEN CAST(ea.n AS DOUBLE) ELSE {est.replace("kth", "ea.kth")} END AS est_a,
  CASE WHEN eb.n < {_KMV_K} THEN CAST(eb.n AS DOUBLE) ELSE {est.replace("kth", "eb.kth")} END AS est_b,
  CASE WHEN eu.n < {_KMV_K} THEN CAST(eu.n AS DOUBLE) ELSE {est.replace("kth", "eu.kth")} END AS est_union
FROM truth, ea, eb, eu"""


@register(
    "corpus_kmv_overlap",
    _kmv_sql(),
    survey="ext: KMV (k-minimum-values) sketch — distinct-count AND "
    "set-overlap estimation between two corpus halves: each side keeps "
    "its k smallest 48-bit token hashes; union sketch = k smallest of "
    "the merged values; intersection follows by inclusion-exclusion "
    "(est_a + est_b - est_union downstream). The sketch HLL can't give "
    "(HLL has no intersection); fully deterministic md5 order "
    "statistics, so estimates hash exactly against the oracle — no "
    "tolerance",
)
def corpus_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketches for two md5-split document sides plus the exact
    truths (evaluation harness; production ships the k values only —
    k longs per corpus snapshot, mergeable by sorted-merge + cut).

    Estimator: D ≈ (k−1)·H / h_(k) (the classic KMV/bottom-k estimate,
    Bar-Yossef et al. 2002, public), falling back to the exact count
    when a side has fewer than k distinct values (the sketch IS the
    set). All inputs to the one float division are integers both
    engines hold exactly; the division + floor-quantize is one IEEE op
    sequence — bit-equal across engines.

    Scale: per side, the sketch is a sort-limit over DISTINCT hashed
    tokens — Spark plans TakeOrderedAndProject with per-partition
    top-k, so the full stream never sorts; everything after runs on
    ≤ 3k rows."""
    d = _docs(spark, sf_dir)
    from .sources.io import hash48

    side = F.when(
        F.substring(F.md5(F.col("source")), 1, 2) < "8", F.lit(0)
    ).otherwise(F.lit(1))
    tok = d.select(
        side.alias("side"),
        F.explode(X.tokenize(F.col("text"))).alias("token"),
    )
    hx = tok.select("side", hash48(F.col("token")).alias("h")).distinct()
    from .cache import eager_persist

    hx = eager_persist(hx)  # feeds 3 sketches + the truth row
    ka = hx.filter(F.col("side") == 0).select("h").orderBy("h").limit(_KMV_K)
    kb = hx.filter(F.col("side") == 1).select("h").orderBy("h").limit(_KMV_K)
    ku = (
        ka.unionAll(kb).select("h").distinct().orderBy("h").limit(_KMV_K)
    )

    def est(frame: DataFrame, n_col: str, kth_col: str) -> DataFrame:
        return frame.agg(
            F.count(F.lit(1)).alias(n_col), F.max("h").alias(kth_col)
        )

    ea, eb, eu = (
        est(ka, "na", "ka"),
        est(kb, "nb", "kb"),
        est(ku, "nu", "ku"),
    )
    truth = hx.agg(
        F.count_distinct(F.when(F.col("side") == 0, F.col("h"))).alias("true_a"),
        F.count_distinct(F.when(F.col("side") == 1, F.col("h"))).alias("true_b"),
        F.count_distinct("h").alias("true_union"),
    )

    def estimate(n: str, kth: str):
        raw = (
            F.floor(
                F.lit(_KMV_K - 1)
                * F.lit(_KMV_SPACE)
                / F.col(kth)
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        )
        return F.when(F.col(n) < _KMV_K, F.col(n).cast("double")).otherwise(raw)

    return (
        truth.crossJoin(F.broadcast(ea))
        .crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .select(
            "true_a",
            "true_b",
            "true_union",
            estimate("na", "ka").alias("est_a"),
            estimate("nb", "kb").alias("est_b"),
            estimate("nu", "ku").alias("est_union"),
        )
    )


def _kmv_grouped_sql() -> str:
    from .sources.io import hash48_sql

    h = hash48_sql("token")
    est = (
        f"floor(({_KMV_K} - 1) * {_KMV_SPACE!r} / kth * 1000000.0) "
        "/ 1000000.0"
    )
    return f"""WITH tok AS (
  SELECT source, unnest({X.tokenize_sql("text")}) AS token FROM documents),
hx AS (SELECT DISTINCT source, {h} AS h FROM tok),
rk AS (SELECT source, h,
       row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hx),
sk AS (SELECT source, CAST(count(*) AS BIGINT) AS n, max(h) AS kth
       FROM rk WHERE rn <= {_KMV_K} GROUP BY source),
tr AS (SELECT source, CAST(count(*) AS BIGINT) AS true_distinct
       FROM hx GROUP BY source)
SELECT tr.source, true_distinct,
  CASE WHEN sk.n < {_KMV_K} THEN CAST(sk.n AS DOUBLE) ELSE {est} END AS est
FROM tr JOIN sk ON sk.source = tr.source"""


@register(
    "corpus_kmv_per_source",
    _kmv_grouped_sql(),
    survey="ext: GROUPED bottom-k sketch — per-source distinct-token "
    "estimates in one pass (the per-tenant cardinality dashboard): each "
    "source keeps its k smallest token hashes via a rank window, the "
    "same KMV estimator per group, exact-fallback when a source's "
    "vocabulary is smaller than k. Hash-exact like corpus_kmv_overlap",
)
def corpus_kmv_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, true_distinct, est): per-group KMV cardinality with the
    truth column for evaluation. Scale shape: distinct (source, hash)
    pairs shuffle once; the rank window per source is bounded by the
    per-source distinct vocabulary; production drops the truth branch
    and ships k longs per group (mergeable by sorted-merge + cut per
    group — daily per-tenant sketches union for free)."""
    from pyspark.sql import Window as W

    from .cache import eager_persist
    from .sources.io import hash48

    d = _docs(spark, sf_dir)
    tok = d.select(
        "source", F.explode(X.tokenize(F.col("text"))).alias("token")
    )
    hx = eager_persist(
        tok.select("source", hash48(F.col("token")).alias("h")).distinct()
    )
    rn = F.row_number().over(W.partitionBy("source").orderBy("h"))
    sk = (
        hx.withColumn("rn", rn)
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
    )
    tr = hx.groupBy("source").agg(F.count(F.lit(1)).alias("true_distinct"))
    raw = (
        F.floor(
            F.lit(_KMV_K - 1) * F.lit(_KMV_SPACE) / F.col("kth") * F.lit(1e6)
        )
        / F.lit(1e6)
    )
    est = F.when(F.col("n") < _KMV_K, F.col("n").cast("double")).otherwise(raw)
    return tr.join(sk, "source").select("source", "true_distinct", est.alias("est"))


# ===========================================================================
# Native recursive CTE: capped cumulative spend (non-window recurrence)
# ===========================================================================

_CAP_CENTS = 50_000_00  # 50k budget cap per customer

# identical SQL text runs on BOTH engines (Spark 4 ships WITH RECURSIVE);
# only the source relation name differs — parameterized below. Deltas are
# SIGNED ('F'-status orders post as refunds), so the double clamp is a
# genuinely non-linear recurrence: with only positive deltas the cap
# binds permanently and a prefix-sum min would fake it — signed deltas
# re-open headroom after a clamp, which no window frame can express.
_CAPPED_CUMSUM_SQL_TPL = f"""WITH RECURSIVE o AS (
  SELECT o_custkey,
         CAST(CASE WHEN o_orderstatus = 'F'
              THEN -floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 2)
              ELSE floor(o_totalprice * 100 + 0.5) END
              AS BIGINT) AS delta,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS INT) AS rn
  FROM {{rel}}),
rec(o_custkey, rn, spent) AS (
  SELECT o_custkey, rn,
         greatest(CAST(0 AS BIGINT), least(delta, {_CAP_CENTS}))
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.o_custkey, o.rn,
         greatest(CAST(0 AS BIGINT), least(rec.spent + o.delta, {_CAP_CENTS}))
  FROM rec JOIN o ON o.o_custkey = rec.o_custkey AND o.rn = rec.rn + 1)
SELECT o_custkey, rn, spent FROM rec"""


@register(
    "orders_capped_cumsum",
    _CAPPED_CUMSUM_SQL_TPL.format(rel="orders"),
    survey="ext: NATIVE recursive CTE (Spark 4 WITH RECURSIVE) — "
    "floor/cap-clamped running balance per customer over SIGNED deltas "
    "(refund orders), spent_i = clamp(spent_{i-1} + delta_i): a "
    "genuinely non-linear recurrence (the clamp re-opens headroom, so "
    "no window-frame rewrite exists; the key-local associative-fold "
    "twin orders_capped_cumsum_fold is the scale-safe plan). The same "
    "SQL text runs on both engines; integer cents keep every step "
    "engine-exact. "
    "Complements the repo's driver-loop iterative ops "
    "(components/PageRank/BFS) with the engine-native recursion form",
)
def orders_capped_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-cap balance: each customer's orders in date order post
    signed deltas ('F' status = half-value refund) into a [0, 50k]-
    clamped balance. The recursion steps one rank per iteration, joining
    the frontier (one row per still-active customer) to the rank-indexed
    orders — iterations are bounded by the deepest customer's order
    count, and each step is a keyed join, the same per-round shape as
    the repo's manual frontier loops, but planned by Catalyst's native
    UnionLoop.

    The delta/rank projection is computed once and PERSISTED before the
    recursion: every UnionLoop step re-reads the anchor relation, and an
    unpersisted view re-runs the scan + window per iteration — measured
    10.8 s → 5.4 s at sf0.1 from the persist alone (same rule as the
    manual loops' edge-list persist). The oracle keeps the single
    self-contained SQL text; semantics are identical."""
    from pyspark.sql import Window as W

    from .cache import eager_persist

    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    delta = F.when(
        F.col("o_orderstatus") == "F", -F.floor(cents / 2).cast("long")
    ).otherwise(cents)
    rn = F.row_number().over(
        W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    ranked = eager_persist(
        o.select("o_custkey", delta.alias("delta"), rn.cast("int").alias("rn"))
    )
    ranked.createOrReplaceTempView("orders_ranked_rcte_v")
    # the recursion accumulates one row per input order; Spark's default
    # safety cap (spark.sql.cteRecursionRowLimit = 1e6) trips at ~sf1 —
    # size it to the fact table, the knob a 100 TB deployment must set
    # session-wide (int-typed conf: values must stay under 2^31). The
    # raise is SCOPED: the recursion is materialized eagerly under the
    # raised caps, then the session values are restored in the finally so
    # later queries keep the runaway-recursion safety net. (If the
    # persist is later released and the frame recomputed, the default
    # caps apply again — harmless at test SFs, and a real deployment
    # sets the caps in its session conf anyway.)
    _ROW_KEY = "spark.sql.cteRecursionRowLimit"
    _LVL_KEY = "spark.sql.cteRecursionLevelLimit"
    prev_row = spark.conf.get(_ROW_KEY, None)
    prev_lvl = spark.conf.get(_LVL_KEY, None)
    try:
        try:
            spark.conf.set(_ROW_KEY, str(2_000_000_000))
            # level cap = max orders per customer (loop iterations); the
            # default 100 suffices for realistic per-key depth but a
            # skewed key (or a replicated test corpus) can exceed it
            spark.conf.set(_LVL_KEY, "10000")
        except Exception:
            pass  # locked-down session: the default caps apply
        return eager_persist(
            spark.sql(
                f"""WITH RECURSIVE rec(o_custkey, rn, spent) AS (
  SELECT o_custkey, rn, greatest(CAST(0 AS BIGINT), least(delta, {_CAP_CENTS}))
  FROM orders_ranked_rcte_v WHERE rn = 1
  UNION ALL
  SELECT o.o_custkey, o.rn,
         greatest(CAST(0 AS BIGINT), least(rec.spent + o.delta, {_CAP_CENTS}))
  FROM rec JOIN orders_ranked_rcte_v o
    ON o.o_custkey = rec.o_custkey AND o.rn = rec.rn + 1)
SELECT o_custkey, rn, spent FROM rec"""
            )
        )
    finally:
        for key, prev in ((_ROW_KEY, prev_row), (_LVL_KEY, prev_lvl)):
            try:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)
            except Exception:
                pass


@register(
    "orders_capped_cumsum_fold",
    _CAPPED_CUMSUM_SQL_TPL.format(rel="orders"),
    survey="ext: the SCALE-SAFE twin of orders_capped_cumsum — identical "
    "clamped-running-balance semantics (same oracle SQL) computed as ONE "
    "per-customer associative fold instead of a driver-sequenced "
    "recursion. The recurrence is key-local, so collect each customer's "
    "(date, key, delta) list, sort it in-row, and fold the clamp with "
    "aggregate(): one shuffle total, zero iterative jobs — at 100 TB "
    "this is a plain groupBy whose per-key state is bounded by orders "
    "per customer, where the recursive CTE pays a driver round per rank",
)
def orders_capped_cumsum_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, rn, spent): spent_i = clamp(spent_{i-1} + delta_i,
    0, cap) per customer in (o_orderdate, o_orderkey) order — exactly
    orders_capped_cumsum, replanned.

    Why a fold works where no window does: the clamp is non-linear, so
    no window frame expresses it — but it IS associative under function
    composition (each step is x -> min(max(x + d, 0), cap)), and more
    simply the whole recurrence lives inside ONE key. So the scale
    shape is: groupBy(o_custkey) -> sort_array(collect_list(...)) ->
    aggregate() fold emitting the running array -> posexplode. Per-key
    state is max-orders-per-customer (tens in TPC-H-like data; the
    array is bounded by the data model, not the table size). One
    Exchange in the whole plan (plan-asserted)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    delta = F.when(
        F.col("o_orderstatus") == "F", -F.floor(cents / 2).cast("long")
    ).otherwise(cents)
    g = o.groupBy("o_custkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("o_orderdate").alias("d"),
                    F.col("o_orderkey").alias("k"),
                    delta.alias("delta"),
                )
            )
        ).alias("xs")
    )
    zero = F.lit(0).cast("long")
    spent_arr = F.aggregate(
        F.col("xs"),
        F.expr("CAST(array() AS array<bigint>)"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.greatest(
                    zero,
                    F.least(
                        # try_element_at: NULL (not an ANSI error) on the
                        # empty accumulator at the first fold step
                        F.coalesce(F.try_element_at(acc, F.lit(-1)), zero)
                        + x["delta"],
                        F.lit(_CAP_CENTS).cast("long"),
                    ),
                )
            ),
        ),
    )
    return g.select(
        "o_custkey", F.posexplode(spent_arr).alias("rn0", "spent")
    ).select(
        "o_custkey", (F.col("rn0") + 1).cast("int").alias("rn"), "spent"
    )


# ===========================================================================
# Z-order clustered layout (two-dimensional data skipping)
# ===========================================================================

_Z_USER_LO, _Z_USER_HI = 3, 9
_Z_TS_LO, _Z_TS_HI = "2024-01-10 00:00:00", "2024-01-15 00:00:00"


@register(
    "events_zorder_scan",
    f"""SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE user_id BETWEEN {_Z_USER_LO} AND {_Z_USER_HI}
  AND ts >= TIMESTAMP '{_Z_TS_LO}' AND ts < TIMESTAMP '{_Z_TS_HI}'""",
    survey="ext: Z-order (Morton-curve) clustered layout — the events "
    "table rewritten sorted by the interleaved (user_id, minute) key "
    "(operators/layout.py, OPTIMIZE-ZORDER-BY semantics from public bit "
    "interleaving), then a two-dimensional rectangle predicate scans it; "
    "parquet row-group min/max stats skip most groups on BOTH dims at "
    "once — the pruning partition directories can't do for a second key. "
    "Result ≡ the same filter over the raw table (layout never changes "
    "answers); the skip ratio is asserted from parquet metadata in tests",
)
def events_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count/users/cents over a (user range × time range) rectangle read
    from the Z-ordered layout. Integer-exact aggregates."""
    from .operators.layout import ensure_zordered_events

    loc = ensure_zordered_events(spark, sf_dir)
    ev = spark.read.parquet(loc)
    return (
        ev.filter(
            F.col("user_id").between(_Z_USER_LO, _Z_USER_HI)
            & (F.col("ts") >= _Z_TS_LO)
            & (F.col("ts") < _Z_TS_HI)
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("cents"),
        )
    )


# ===========================================================================
# Streaming left-outer interval join (watermark-certified NULL emission)
# ===========================================================================

_OUTER_WITHIN = "30 minutes"


@register(
    "streaming_interval_join_outer",
    f"""SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS event_id_r, r.ts AS ts_r
FROM (SELECT * FROM events WHERE event_type = 'click') l
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL {_OUTER_WITHIN}""",
    survey="ext: stream-stream LEFT OUTER time-interval join — unmatched "
    "clicks emit a NULL purchase side only once the watermark certifies "
    "no purchase can still arrive in their interval (the abandoned-cart "
    "shape); the sentinel flush closes every interval so the emitted "
    "table ≡ the batch left join",
)
def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every click joined to purchases within 30 min, unmatched clicks
    kept with NULLs — outer emission is the part inner joins never
    exercise: the state store must prove absence, which only the
    watermark can. Run as a real multi-micro-batch stream; result equals
    the batch left join because the watermark horizon outlives the
    replay (no real row ever late) and the sentinel closes all state."""
    from .streaming.ops import interval_join

    def build(stream: DataFrame, wm: str) -> DataFrame:
        left = stream.filter(F.col("event_type") == "click")
        right = stream.filter(F.col("event_type") == "purchase")
        return interval_join(
            left,
            right,
            "user_id",
            within=_OUTER_WITHIN,
            watermark=wm,
            how="left_outer",
        ).select("event_id", "user_id", "ts", "event_id_r", "ts_r")

    # one sentinel per join branch: each side's watermark node sits above
    # its event_type filter, so a '__flush__' row would be dropped before
    # either node ever saw it and the MIN watermark would never advance.
    # The click sentinel (user -1) never emits: its own interval is never
    # watermark-certified; the purchase sentinel (user -2) never matches.
    return _run_stream_with_flush(
        spark, sf_dir, build, sentinel_types=("click", "purchase")
    )


# ===========================================================================
# Winsorized robust aggregation (exact-quantile clipping)
# ===========================================================================

_CONT_QS = (
    ("p25", 1, 4),
    ("p50", 1, 2),
    ("p75", 3, 4),
    ("p90", 9, 10),
    ("p99", 99, 100),
)


@register(
    "quantiles_interpolated",
    quantiles.interpolated_quantiles_sql(
        "SELECT l_extendedprice FROM lineitem", "l_extendedprice", _CONT_QS
    ),
    survey="ext: PERCENTILE_CONT (type-7 linear interpolation, the SQL "
    "standard / numpy default) via the same two-pass histogram-select "
    "engine as the exact order statistics — each q fetches its two "
    "bracketing ranks; the lerp evaluates in one fixed IEEE order so "
    "even a COMPUTED quantile hashes exactly against the oracle",
)
def quantiles_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated p25/p50/p75/p90/p99 of l_extendedprice — the
    continuous-percentile twin of exact_quantiles_histogram. Scale shape
    identical: one bounded histogram shuffle, second pass sorts only the
    <= 2-per-q selected bins."""
    li = load_table(spark, sf_dir, "lineitem")
    return quantiles.interpolated_quantiles(
        li, "l_extendedprice", bin_width=100.0, qs=_CONT_QS
    )


@register(
    "group_quantiles_interpolated",
    quantiles.grouped_interpolated_quantiles_sql(
        "SELECT l_returnflag, l_extendedprice FROM lineitem",
        "l_returnflag",
        "l_extendedprice",
        _CONT_QS,
    ),
    survey="ext: per-group PERCENTILE_CONT (grouped twin of "
    "quantiles_interpolated) — the p99-per-service / median-per-segment "
    "shape with SQL-standard interpolation, still histogram-select (no "
    "global sort) and still hash-exact",
)
def group_quantiles_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated p25..p99 of l_extendedprice per l_returnflag."""
    li = load_table(spark, sf_dir, "lineitem")
    return quantiles.grouped_interpolated_quantiles(
        li, "l_returnflag", "l_extendedprice", bin_width=100.0, qs=_CONT_QS
    )


_WINSOR_QS = (("p05", 1, 20), ("p95", 19, 20))

_WINSOR_SQL = f"""WITH th AS (
{quantiles.grouped_exact_quantiles_sql(
    "SELECT l_returnflag, l_extendedprice FROM lineitem",
    "l_returnflag",
    "l_extendedprice",
    _WINSOR_QS,
)}),
p AS (SELECT l_returnflag, max(CASE WHEN label = 'p05' THEN value END) AS lo,
             max(CASE WHEN label = 'p95' THEN value END) AS hi
      FROM th GROUP BY 1),
c AS (SELECT l.l_returnflag AS flag, p.lo, p.hi,
             least(greatest(l.l_extendedprice, p.lo), p.hi) AS cv
      FROM lineitem l JOIN p ON p.l_returnflag = l.l_returnflag)
SELECT flag, lo, hi, CAST(count(*) AS BIGINT) AS n,
  round(CAST(sum(CAST(floor(cv * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2)
    AS winsorized_sum
FROM c GROUP BY 1, 2, 3"""


@register(
    "lineitem_winsorized_revenue",
    _WINSOR_SQL,
    survey="ext: winsorized robust aggregation — per-group revenue with "
    "values clipped to the group's EXACT [p05, p95] order statistics "
    "(reuses the two-pass histogram-select quantile operator), then an "
    "integer-cents sum. The outlier-robust replacement for a plain sum "
    "that per-row quantile clips make deterministic",
)
def lineitem_winsorized_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per l_returnflag: exact p05/p95 clip bounds, row count, and the
    winsorized extended-price sum (cents-exact, order-invariant).

    Scale: thresholds come from the grouped exact-quantile operator
    (histogram pass + selected-bin sort — never a global sort); the clip
    itself is a broadcast join of |groups|x2 thresholds onto the fact
    scan, then one map-side-combining aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    th = quantiles.grouped_exact_quantiles(
        li, "l_returnflag", "l_extendedprice", bin_width=100.0, qs=_WINSOR_QS
    )
    p = th.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("label") == "p05", F.col("value"))).alias("lo"),
        F.max(F.when(F.col("label") == "p95", F.col("value"))).alias("hi"),
    )
    cv = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(p), "l_returnflag")
        .select(F.col("l_returnflag").alias("flag"), "lo", "hi", cv.alias("cv"))
        .groupBy("flag", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.floor(F.col("cv") * 100 + F.lit(0.5))).cast("double")
                / F.lit(100.0),
                2,
            ).alias("winsorized_sum"),
        )
        .select("flag", "lo", "hi", "n", "winsorized_sum")
    )


# ===========================================================================
# Robust outlier detection: median / MAD (median absolute deviation)
# ===========================================================================

_MAD_Q = (("med", 1, 2),)  # rank ceil(n/2): the lower-median order statistic


@register(
    "events_mad_outliers",
    f"""WITH med0 AS ({quantiles.grouped_exact_quantiles_sql(
        "SELECT event_type, value FROM events", "event_type", "value", qs=_MAD_Q)}),
med AS (SELECT event_type, value AS med FROM med0),
dv AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS dev
  FROM events e JOIN med m USING (event_type) WHERE e.value IS NOT NULL),
mad0 AS ({quantiles.grouped_exact_quantiles_sql(
        "SELECT event_type, dev FROM dv", "event_type", "dev", qs=_MAD_Q)}),
mad AS (SELECT event_type, value AS mad FROM mad0)
SELECT dv.event_type, CAST(count(*) AS BIGINT) AS n,
  max(dv.med) AS med, max(a.mad) AS mad,
  CAST(sum(CASE WHEN dv.dev > 3.0 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers
FROM dv JOIN mad a USING (event_type)
GROUP BY dv.event_type""",
    survey="ext: robust outlier detection — per-group median and MAD via "
    "TWO passes of the histogram-select exact-quantile operator (bin "
    "table bounded by value range, never row count; a global per-group "
    "sort never happens), medians broadcast back onto the fact scan; "
    "med/mad are SELECTED values and the 3·MAD flag is one exact "
    "multiply, so the report hashes with no tolerance",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier report per event type: the robust twin of the
    z-score detector (events_anomaly_zscore) — a fat-tailed value
    column moves mean/stddev but barely moves median/MAD, so this cut
    survives exactly the data that breaks the parametric one. Both
    medians are exact order statistics from the two-pass histogram
    select (operators/quantiles.py); no sort of the full group at any
    scale."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = quantiles.grouped_exact_quantiles(
        ev, "event_type", "value", bin_width=1.0, qs=_MAD_Q
    ).select("event_type", F.col("value").alias("med"))
    dv = (
        ev.filter(F.col("value").isNotNull())
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "value",
            "med",
            F.abs(F.col("value") - F.col("med")).alias("dev"),
        )
    )
    mad = quantiles.grouped_exact_quantiles(
        dv.select("event_type", "dev"), "event_type", "dev", bin_width=1.0, qs=_MAD_Q
    ).select("event_type", F.col("value").alias("mad"))
    return (
        dv.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > F.lit(3.0) * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ===========================================================================
# Time-weighted average (TWAP): value held between events, weighted by
# the integer-microsecond interval — the ops/finance aggregate where a
# plain AVG over irregular samples is simply wrong
# ===========================================================================


@register(
    "events_twap",
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
  CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
l AS (SELECT *, lead(ts) OVER (PARTITION BY user_id, day
        ORDER BY ts, event_id) AS nxt FROM e)
SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN nxt IS NOT NULL
    THEN cents * (epoch_us(nxt) - epoch_us(ts)) END) AS DOUBLE)
   / (100.0 * sum(CASE WHEN nxt IS NOT NULL
    THEN epoch_us(nxt) - epoch_us(ts) END)) AS twap
FROM l GROUP BY 1, 2
HAVING sum(CASE WHEN nxt IS NOT NULL
  THEN epoch_us(nxt) - epoch_us(ts) END) > 0""",
    survey="ext: time-weighted average per user-day — irregular samples "
    "weighted by the held interval; integer micro-cents·microseconds "
    "sums (order-free, overflow-checked: cents·Δt_day < 2⁵³) with ONE "
    "final division, so the double is bit-identical on both engines; "
    "one window pass + one keyed aggregate",
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP per user-day: each event's value is held until the next
    event; the average weights by the integer-microsecond gap. All
    accumulation is BIGINT (cents × micros), so no float fold order
    exists to disagree on — the single num/den division at the end is
    the only floating-point op. Single-event groups (no held interval)
    are excluded by the HAVING on both engines."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    day = F.to_date("ts").alias("day")
    cents = F.round(F.col("value") * 100).cast("long").alias("cents")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    l = ev.select("user_id", day, "ts", "event_id", cents).withColumn(
        "nxt", F.lead("ts").over(w)
    )
    dt = F.unix_micros("nxt") - F.unix_micros("ts")
    held = F.when(F.col("nxt").isNotNull(), dt)
    return (
        l.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("nxt").isNotNull(), F.col("cents") * dt)).alias(
                "_num"
            ),
            F.sum(held).alias("_den"),
        )
        .filter(F.col("_den") > 0)
        .select(
            "user_id",
            "day",
            "n_events",
            (F.col("_num").cast("double") / (F.lit(100.0) * F.col("_den"))).alias(
                "twap"
            ),
        )
    )


# ===========================================================================
# Periodicity detection: 24-point DFT over the hour-of-day event profile.
# Trig constants are computed ONCE here (Python math) and injected into
# BOTH engines as the same literal doubles — neither engine ever calls
# cos/sin, so libm differences cannot exist. Per-term micro-int floors
# make the cross-row sums order-free (the Kneser-Ney trick), and the
# only remaining float ops are per-row IEEE on identical inputs.
# ===========================================================================


def _dft24_constants() -> list[tuple[int, int, float, float]]:
    import math

    out = []
    for k in range(13):  # one-sided bins of a 24-point real DFT
        for h in range(24):
            ang = 2.0 * math.pi * ((k * h) % 24) / 24.0
            out.append((k, h, math.cos(ang), math.sin(ang)))
    return out


def _dft24_values_sql() -> str:
    return ", ".join(
        f"({k}, {h}, CAST({c!r} AS DOUBLE), CAST({s!r} AS DOUBLE))"
        for k, h, c, s in _dft24_constants()
    )


@register(
    "events_periodicity_dft",
    lambda: f"""WITH prof AS (
  SELECT CAST(extract(hour FROM ts) AS INT) AS h, count(*) AS c
  FROM events GROUP BY 1),
tw(k, h, cosv, sinv) AS (VALUES {_dft24_values_sql()}),
acc AS (SELECT tw.k,
  sum(CAST(floor(CAST(c AS DOUBLE) * cosv * 1000000.0) AS BIGINT)) AS re_u,
  sum(CAST(floor(CAST(c AS DOUBLE) * sinv * 1000000.0) AS BIGINT)) AS im_u
  FROM tw JOIN prof USING (h) GROUP BY 1)
SELECT k, {V.quantize_sql(
        "(re_u / 1000000.0) * (re_u / 1000000.0)"
        " + (im_u / 1000000.0) * (im_u / 1000000.0)", 4)} AS power
FROM acc""",
    survey="ext: periodicity detection — 24-point DFT over the "
    "hour-of-day event profile; trig constants are shared literal "
    "doubles (computed once, injected into both engines — no libm call "
    "anywhere), per-term micro-int floors make the sums order-free, so "
    "the spectrum hashes exactly; the first aggregate is the only "
    "data-sized stage, everything after is 24 rows",
)
def events_periodicity_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which periods dominate the event stream: power at bin k means a
    24/k-hour cycle in hourly volume (k=0 is total mass; a flat profile
    puts ~everything there). The data-sized work is one partial-agg
    shuffle to the 24-row profile; the DFT is a broadcast join against
    312 constant rows — at any corpus size the spectrum costs one scan."""
    ev = load_table(spark, sf_dir, "events")
    prof = ev.groupBy(F.hour("ts").cast("int").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tw = spark.createDataFrame(
        _dft24_constants(), "k int, h int, cosv double, sinv double"
    )
    micro = lambda col: F.floor(  # noqa: E731
        F.col("c").cast("double") * F.col(col) * F.lit(1000000.0)
    ).cast("long")
    acc = (
        tw.join(F.broadcast(prof), "h")
        .groupBy("k")
        .agg(
            F.sum(micro("cosv")).alias("re_u"),
            F.sum(micro("sinv")).alias("im_u"),
        )
    )
    p = (F.col("re_u") / 1e6) * (F.col("re_u") / 1e6) + (
        F.col("im_u") / 1e6
    ) * (F.col("im_u") / 1e6)
    return acc.select("k", V.quantize(p, 4).alias("power"))


# ===========================================================================
# CUSUM change-point detection over the daily event series. The textbook
# recurrence S_t = max(0, S_{t-1} + a_t) looks inherently sequential, but
# it has the max-plus closed form S_t = cum_t − min(0, min_{j≤t} cum_j) —
# two window passes, no recursion, no per-row loop. All arithmetic stays
# in scaled integers (a_t = n·c_t − total avoids the fractional mean), so
# both engines compute identical BIGINTs.
# ===========================================================================


@register(
    "events_cusum_changepoint",
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS c
  FROM events GROUP BY 1),
t AS (SELECT count(*) AS n, sum(c) AS total FROM d),
a AS (SELECT day, c, n * c - total AS a, total FROM d, t),
cm AS (SELECT day, c, total,
  sum(a) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum FROM a),
s AS (SELECT day, c, total, cum,
  least(CAST(0 AS BIGINT),
        min(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)) AS floor_min
  FROM cm)
SELECT day, CAST(c AS BIGINT) AS c, CAST(cum - floor_min AS BIGINT) AS s_scaled,
  CAST((cum - floor_min) > 2 * total AS INT) AS alarm
FROM s""",
    survey="ext: CUSUM change-point detection — the sequential "
    "max(0, S+a) recurrence rewritten via its max-plus closed form "
    "(cumsum minus clamped running min) into two window passes; "
    "scaled-integer arithmetic (n·c − total) keeps every engine "
    "BIGINT-identical, no tolerance; the data-sized stage is one "
    "daily partial-agg scan, the windows run over calendar-bounded rows",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upward mean-shift detector on daily event volume: S accumulates
    n·c_t − total (the scaled deviation from the series mean) and clamps
    at zero; a run of above-mean days drives S up and trips the alarm at
    2·total. The window frame is the day series — bounded by the
    calendar, never by corpus size (the same single-partition-by-
    construction shape as the quantile bin windows)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    t = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("total")
    )
    a = d.crossJoin(F.broadcast(t)).select(
        "day", "c", (F.col("n") * F.col("c") - F.col("total")).alias("a"), "total"
    )
    # constant partition via c - c (the quantiles _bin_cum_window trick:
    # a bare literal is folded out of the window spec and WindowExec
    # then warns "No Partition Defined" — the warning should stay a true
    # signal for ACCIDENTAL global windows; this one is deliberate and
    # calendar-bounded)
    w = (
        Window.partitionBy(F.col("c") - F.col("c"))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cm = a.select("day", "c", "total", F.sum("a").over(w).alias("cum"))
    s = cm.select(
        "day",
        "c",
        "total",
        "cum",
        F.least(F.lit(0).cast("long"), F.min("cum").over(w)).alias("floor_min"),
    )
    return s.select(
        "day",
        "c",
        (F.col("cum") - F.col("floor_min")).alias("s_scaled"),
        ((F.col("cum") - F.col("floor_min")) > 2 * F.col("total"))
        .cast("int")
        .alias("alarm"),
    )
