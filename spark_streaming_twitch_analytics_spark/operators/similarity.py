"""Similarity search over embedding columns (SURVEY §7 phase 4 extension).

Two paths:

- :func:`brute_force_topk` — exact cosine top-k. The query set is
  broadcast (small side), candidates stream through; per-partition the
  window top-k keeps a bounded heap. Baseline + ground truth.
- :func:`lsh_topk` — sign-random-projection LSH: queries and candidates
  only meet when they share a hyperplane-sign bucket. The bucket is an
  integer key → equi-join, so the shuffle is keyed and bounded; recall
  trades off with n_bits (more bits = smaller buckets). The 100 TB shape:
  candidates partitioned by bucket once (reusable across query batches).

Hyperplanes are deterministic md5-derived integer weights
(``functions.vectors.hyperplane_weights``) so results are reproducible
and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot, lsh_bucket, norm

DIM = 64  # embeddings table dimensionality (static → unrolled codegen dots)


def _pairs(queries: DataFrame, candidates: DataFrame, join_cols: list[str] | None) -> DataFrame:
    """Each side carries its vector AND its precomputed norm — computing
    the norm per-pair would triple the per-pair FLOPs (dot + 2 norms).
    Bitwise identical: norm sees the same values either way."""
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        as_double(F.col("embedding")).alias("qv"),
        norm(as_double(F.col("embedding")), DIM).alias("qn"),
        *[F.col(c) for c in (join_cols or [])],
    )
    c = candidates.select(
        F.col("vec_id").alias("c_id"),
        as_double(F.col("embedding")).alias("cv"),
        norm(as_double(F.col("embedding")), DIM).alias("cn"),
        *[F.col(c_) for c_ in (join_cols or [])],
    )
    if join_cols:
        joined = c.join(F.broadcast(q), join_cols)
    else:
        joined = c.crossJoin(F.broadcast(q))
    return joined.filter(F.col("q_id") != F.col("c_id"))


def _scored(pairs: DataFrame) -> DataFrame:
    cos = F.round(
        dot(F.col("qv"), F.col("cv"), DIM) / (F.col("qn") * F.col("cn")), 6
    )
    return pairs.select("q_id", "c_id", cos.alias("cos"))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "cos", "rn")
    )


def brute_force_topk(queries: DataFrame, candidates: DataFrame, k: int) -> DataFrame:
    """Exact top-k neighbours per query by cosine (desc, c_id tiebreak)."""
    return _topk(_scored(_pairs(queries, candidates, None)), k)


def lsh_topk(
    queries: DataFrame, candidates: DataFrame, k: int, n_bits: int = 4, dim: int = 64
) -> DataFrame:
    """Approximate top-k: candidates considered only within the query's
    LSH bucket. Same output shape as :func:`brute_force_topk`."""
    q = queries.withColumn("bucket", lsh_bucket(as_double(F.col("embedding")), n_bits, dim))
    c = candidates.withColumn("bucket", lsh_bucket(as_double(F.col("embedding")), n_bits, dim))
    return _topk(_scored(_pairs(q, c, ["bucket"])), k)
