"""Connected components over near-duplicate pair graphs.

Dedup pipelines emit PAIRS (minhash/jaccard/simhash verify stages); keeping
one representative per duplicate GROUP requires the transitive closure of
those pairs — i.e. connected components. The reference has no graph or
iteration surface at all (SURVEY.md §2.5); this is north-star extension
surface for training-data dedup at scale.

Algorithm: iterative min-label propagation. Every node starts labeled with
itself; each round, a node adopts the minimum label in its closed
neighborhood; convergence (no label changed) is detected with a cheap
aggregate. The fixpoint — every node labeled with the minimum node id of
its component — is unique, so results are deterministic regardless of
execution order. Rounds needed = graph diameter; near-dup clusters are
shallow (pairs/stars), so 2–4 rounds is typical.

Scale design: each round is one self-join shuffle on the node id + one
aggregate — the standard distributed-CC shape (cf. the large-star/small-star
construction of Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — this is the simpler min-propagation variant, fine for
bounded-diameter dedup graphs). Each round's result is persisted and the
previous round unpersisted, keeping the lineage flat (no exponential plan
growth). The driver loop only ever collects ONE scalar (the change count)
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, cluster) for every node appearing in `edges`, where `cluster`
    is the minimum node id of the node's connected component. Raises if the
    graph hasn't converged after `max_iter` rounds (diameter > max_iter)."""
    und = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .unionByName(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .distinct()
        .persist()
    )
    labels = und.groupBy("n").agg(F.least(F.min("m"), F.col("n")).alias("label"))
    # least(min(neighbor), self) is already one propagation step — saves a round.
    labels = labels.persist()
    labels.count()

    for _ in range(max_iter):
        # candidate: min label among closed neighborhood
        nbr_min = (
            und.join(labels.withColumnRenamed("n", "m"), "m")
            .groupBy("n")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "n", "left")
            .select(
                "n",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "label"
                ),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        ).persist()
        changes = new_labels.where(F.col("changed")).count()
        labels.unpersist()
        labels = new_labels.select("n", "label").persist()
        new_labels.unpersist()
        if changes == 0:
            und.unpersist()
            return labels.select(F.col("n").alias("node"), F.col("label").alias("cluster"))
    und.unpersist()
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
