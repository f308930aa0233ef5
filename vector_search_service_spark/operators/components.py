"""Connected components over candidate-duplicate pairs — the
clustering step a production dedup pipeline needs after pair
generation (near-dup pairs are not transitive: A~B and B~C put A,B,C
in one cluster even when A~C fails the threshold; keep-one-per-cluster
needs the cluster).

Algorithm: iterative min-label propagation on the undirected pair
graph. Each round is two shuffles (edge⋈label, groupBy node); rounds =
graph diameter, and near-dup components are shallow (pairs chain
through shared shingles), so a handful of rounds converges. At true
web scale swap the body for the alternating large-star/small-star
rounds (Kiveris et al., "Connected Components in MapReduce and
Beyond") — same driver loop, O(log n) rounds; the loop below is the
honest diameter-bounded version. Lineage is truncated every round
with ``localCheckpoint`` so the plan doesn't grow with iterations."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, *, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_rounds: int = 25) -> DataFrame:
    """Label every node that appears in ``pairs`` with the minimum
    node id reachable from it. Returns ``(node, component)``.
    Deterministic: min-propagation has a unique fixpoint."""
    # materialize the pair input ONCE before the symmetric union —
    # both union branches read it, and pair generation (UDF + pair
    # join) is the expensive part of the whole computation
    pairs = pairs.localCheckpoint(eager=True)
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_rounds):
        # each node offers its label to every neighbor; a node keeps
        # the min of its own label and the best offer
        offers = (
            edges.join(labels, edges.u == labels.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("offer"))
        )
        stepped = (
            labels.join(offers, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("offer", "component")).alias(
                    "component"
                ),
                (F.coalesce("offer", "component") < F.col("component")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("_changed")).count()
        labels = stepped.drop("_changed")
        if changed == 0:
            break
    return labels
