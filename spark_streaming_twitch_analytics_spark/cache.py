"""Tracked eager persists.

Composed operators (MinHash dedup, n-gram Jaccard, SimHash64) persist a
shared intermediate so multi-branch plans evaluate it once. The frames
must stay cached until the *caller* runs its action, so the operator
can't unpersist them itself. This module tracks every such persist so
harnesses that run many queries in one session (``compare_oracle``,
``bench``, the driver) can release them between queries instead of
leaning on LRU eviction — on a shared cluster, orphaned cache blocks
steal executor storage memory from later stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def eager_persist(df: DataFrame) -> DataFrame:
    """Persist + materialize now (a lazy persist would still be computed
    once per downstream branch when they run inside the same job), and
    record the frame for :func:`release_all`."""
    df.persist()
    # track BEFORE materializing: if count() throws (corrupt input,
    # killed stage) the partially cached blocks must still be releasable
    _LIVE.append(df)
    df.count()
    return df


def release_all() -> int:
    """Unpersist every tracked frame; returns how many were released.
    Safe to call while results built on them are still held — Spark just
    recomputes if they're referenced again."""
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist()
        n += 1
    return n
