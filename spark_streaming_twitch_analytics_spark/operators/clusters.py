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


def connected_components(
    edges: DataFrame, max_iter: int = 20, checkpoint_every: int = 3
) -> DataFrame:
    """``edges(a, b)`` undirected → ``(doc_id, canonical_id)`` where
    canonical_id is the min doc_id in the component. Nodes appear only if
    they touch an edge (isolated docs are their own canonical trivially).
    """
    both = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    labels = (
        both.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
    )
    for it in range(max_iter):
        neighbor_min = (
            both.join(labels, both.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", F.col("lbl").alias("canonical_id"))
