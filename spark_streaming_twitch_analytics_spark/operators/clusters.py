"""Connected-components clustering over near-dup pairs — the transitive
step of a dedup pipeline (A~B, B~C ⇒ {A,B,C} is one cluster, keep one
canonical doc). An iterative algorithm, the pattern Spark expresses as a
driver-side loop over DataFrame ops.

Algorithm: minimum-label propagation. Every node starts labeled with its
own id; each round, a node takes the min of its label and its neighbors'
labels; converged when no label changes. Rounds ≤ graph diameter (real
dup clusters are small — boilerplate families converge in 2-3 rounds).

Scale shape per round: one join (labels ⟕ edges) + one groupBy(min) —
both keyed shuffles on node id. ``localCheckpoint`` every few rounds
truncates the growing lineage (standard iterative-Spark hygiene;
without it each round's plan contains all previous rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """``edges(a, b)`` undirected → ``(doc_id, canonical_id)`` where
    canonical_id is the min doc_id in the component. Nodes appear only if
    they touch an edge (isolated docs are their own canonical trivially).

    Per-round cost is exactly one keyed join + one groupBy over frames
    bounded by the dup-graph size (nodes that touch an edge — tiny
    relative to the corpus even at 100 TB). Three iterative-Spark rules
    applied, each measured to matter here:

    - the edge list is persisted ONCE — it usually arrives with an
      expensive lineage (the whole MinHash pipeline), which an unpersisted
      loop would re-execute every round;
    - every round's labels are eagerly ``localCheckpoint``ed, truncating
      lineage so round N's plan doesn't contain rounds 1..N-1;
    - convergence is read off the label SUM (labels only ever decrease,
      so an unchanged sum ⇔ a fixed point) — one scalar agg on the
      checkpointed frame instead of a self-join changed-count that would
      re-evaluate the round's plan a second time. Decimal sum: no
      overflow at any realistic node count.
    """
    from ..cache import eager_persist

    both = eager_persist(
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
            edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
    )
    labels = (
        both.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    lbl_sum = F.sum(F.col("lbl").cast("decimal(38,0)"))
    prev = labels.agg(lbl_sum).first()[0]
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint()
        )
        cur = labels.agg(lbl_sum).first()[0]
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # silent non-convergence would SPLIT one dup cluster into several
        # "canonical" docs — wrong dedup output with no signal. A chain of
        # diameter > max_iter (long boilerplate families) needs more rounds.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the dup graph has a component of larger diameter — raise max_iter"
        )
    return labels.select("doc_id", F.col("lbl").alias("canonical_id"))


def bfs_hops(edges: DataFrame, max_hops: int = 4) -> DataFrame:
    """Breadth-first hop distance from the graph's minimum node id over
    the undirected edge set ``edges(a, b)`` → ``(doc_id, hops)`` for every
    node reachable within ``max_hops``. The third iterative-graph pattern
    next to :func:`connected_components` (fixed point) and
    :func:`pagerank_int` (fixed rounds): a FRONTIER loop whose per-round
    work shrinks to the newly discovered nodes.

    Seed = ``min(a)`` (edges arrive as ``a < b`` pairs, so ``min(a)`` is
    the global minimum node) — computed in-plan as a 1-row frame, never
    collected. Per round: frontier ⋈ edges (keyed), minus already-visited
    (left-anti, keyed), distinct. ``localCheckpoint`` truncates lineage
    per round. Hop counts are integers; no float anywhere — the result is
    engine-exact against a recursive-CTE oracle.

    Scale: every round's shuffle is bounded by the frontier's edge
    neighborhood, not the graph; ``max_hops`` bounds total rounds. This
    is exactly Pregel-style BFS expressed as DataFrame ops."""
    from ..cache import eager_persist

    both = eager_persist(
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    visited = (
        edges.agg(F.min("a").alias("doc_id"))
        .withColumn("hops", F.lit(0).cast("int"))
        .localCheckpoint()
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        frontier = (
            both.join(
                frontier.select(F.col("doc_id").alias("src")), "src"
            )
            .select(F.col("dst").alias("doc_id"))
            .distinct()
            .join(visited, "doc_id", "left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        visited = visited.unionByName(frontier).localCheckpoint()
    return visited


def pagerank_int(
    edges: DataFrame,
    iterations: int = 4,
    scale: int = 10**12,
) -> DataFrame:
    """Deterministic integer PageRank over an undirected ``edges(a, b)``
    graph: ranks are BIGINTs at ``scale``; each round every node sends
    ``(r * 85) div (100 * deg)`` to each neighbor and restarts from
    ``(scale * 15) div 100``. All arithmetic is integral, so the
    per-node contribution SUM is order-independent — the result is
    bit-identical on any engine / partitioning / iteration schedule,
    with no float fold-order hazard (the reason this is not the
    textbook double-valued formulation). Centrality over the near-dup
    graph is a canonical-selection signal in dedup pipelines (the most
    central member of a boilerplate family is its best representative).

    Fixed ``iterations`` (not convergence-tested): PageRank converges
    geometrically and the downstream use is a RANKING; K rounds of
    integer flow is a well-defined deterministic quantity both engines
    compute identically.

    Scale shape per round: one join (ranks ⋈ edges) + one keyed groupBy
    sum — same cost class as a :func:`connected_components` round,
    bounded by the dup-graph size. Lineage is truncated per round
    (``localCheckpoint``), the edge list persisted once. Overflow: the
    flow term multiplies BEFORE dividing (``r * 85``), so the binding
    bound is max-rank (≤ graph mass N·scale) staying under 2^63/85 —
    keep N·scale < 2^63/100 for headroom on both the flow and restart
    terms (drop ``scale`` to 1e6 past ~1e11 nodes).

    Input edges are treated as a SET: the undirected expansion is
    deduplicated below, so symmetric or repeated ``(a, b)`` rows do not
    double-count degrees/flows (parity with the SQL oracle's ``UNION``
    set semantics in ``registry._pagerank_sql``).
    """
    from ..cache import eager_persist

    both = eager_persist(
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    base = (scale * 15) // 100
    r = deg.select(
        F.col("src").alias("node"), "d", F.lit(scale).cast("long").alias("r")
    ).localCheckpoint()
    for _ in range(iterations):
        contrib = both.join(
            r, both.src == r.node
        ).select(
            F.col("dst"),
            F.expr("(r * 85) div (100 * d)").alias("c"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        r = (
            deg.join(sums, deg.src == sums.dst, "left")
            .select(
                F.col("src").alias("node"),
                "d",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return r.select(
        F.col("node").alias("doc_id"),
        F.col("d").alias("degree"),
        F.col("r").alias("rank"),
    )
