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

__all__ = ["connected_components", "dedup_corpus", "dedup_stats"]


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """(node, cluster) for every node appearing in `edges`, where `cluster`
    is the minimum node id of the node's connected component. Raises if the
    graph hasn't converged after `max_iter` rounds (diameter > max_iter).

    Adaptive execution: when the (deduplicated) edge list is below
    `local_threshold`, the closure is solved with driver-side union-find —
    a dedup pair graph is usually a few orders of magnitude smaller than
    the corpus, and a millisecond union-find beats several sequential
    shuffle rounds. Above the threshold the distributed min-label
    iteration runs. Both paths reach the same unique min-id fixpoint;
    pass ``local_threshold=0`` to force the distributed path."""
    spark = edges.sparkSession
    und = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .unionByName(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .distinct()
        .persist()
    )
    if local_threshold > 0:
        # Probe with a cheap count first: a graph above the threshold must
        # not pay a threshold-sized collect just to learn it's too big (and
        # the count also materializes the persist for the distributed path).
        if und.count() <= local_threshold:
            head = und.collect()
            und.unpersist()
            return _local_union_find(spark, head, und.schema["n"].dataType)

    # least(min(neighbor), self) is already one propagation step — saves a
    # round. Lazy persist: round 0's action materializes everything in one
    # job instead of paying a separate warm-up job.
    labels = und.groupBy("n").agg(F.least(F.min("m"), F.col("n")).alias("label")).persist()

    # Label frames shrink to |nodes| rows immediately; the default partition
    # count just adds scheduling latency to every sequential round. Scope the
    # iteration to a few partitions — AQE re-expands nothing here, and a
    # production run sizes this to |nodes|/target-partition-size.
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _iterate(und, labels, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_conf)


def _local_union_find(spark, rows, node_type) -> DataFrame:
    """Min-root union-find with path compression over collected (n, m)
    rows; returns the same (node, cluster) frame the distributed path
    produces."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = find(row["n"]), find(row["m"])
        if a != b:
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    out = [(x, find(x)) for x in parent]
    schema = StructType(
        [StructField("node", node_type, False), StructField("cluster", node_type, False)]
    )
    return spark.createDataFrame(out, schema)


def _iterate(und: DataFrame, labels: DataFrame, max_iter: int) -> DataFrame:
    prev_persisted = labels
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
        # new_labels is now materialized; labels reads FROM that cache (it is
        # a column-drop of it). Only unpersist the previous round's artifact
        # — unpersisting new_labels here would silently re-run the whole
        # lineage every later round (measured: per-round cost grew 1.7s →
        # 3.8s over 3 rounds on a 2k-edge graph).
        prev_persisted.unpersist()
        prev_persisted = new_labels
        labels = new_labels.select("n", "label")
        if changes == 0:
            # localCheckpoint pins the small (node, cluster) frame and cuts
            # the lineage, so BOTH caches can be released here instead of
            # leaking one entry per call (the caller can't know when it is
            # safe to unpersist).
            result = labels.select(
                F.col("n").alias("node"), F.col("label").alias("cluster")
            ).localCheckpoint(eager=True)
            prev_persisted.unpersist()
            und.unpersist()
            return result
    und.unpersist()
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def _keep_predicate(id_col: str):
    """Keep a doc iff it is not a non-representative duplicate: either it
    never appears in the pair graph (cluster IS NULL) or it IS its
    cluster's min-id representative."""
    return F.col("cluster").isNull() | (F.col(id_col) == F.col("cluster"))


def dedup_corpus(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "da",
    dst: str = "db",
) -> DataFrame:
    """The consuming end of every dedup pipeline: turn near-dup PAIRS into
    a CLEANED corpus. Labels each doc with its duplicate-cluster id
    (connected components over `edges`), keeps exactly one representative
    per cluster (the min doc id) plus every doc not in any cluster.
    Output = `docs` columns + `cluster` (null when the doc had no
    near-duplicate).

    Scale: the label frame is proportional to the dup-graph nodes — orders
    of magnitude smaller than the corpus — so the single left join
    broadcasts under AQE; the corpus itself is never shuffled more than
    once, and the keep-filter is a narrow per-row predicate."""
    cc = connected_components(edges, src, dst)
    lab = cc.withColumnRenamed("node", id_col)
    return docs.join(lab, id_col, "left").where(_keep_predicate(id_col))


def dedup_stats(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "da",
    dst: str = "db",
) -> DataFrame:
    """One-row accounting for a dedup run: docs in, docs kept, duplicates
    removed, and the removed ratio — the numbers a pipeline operator
    reports after every dedup pass."""
    cc = connected_components(edges, src, dst)
    lab = cc.withColumnRenamed("node", id_col)
    j = docs.join(lab, id_col, "left")
    keep = _keep_predicate(id_col)
    drop = (~keep).cast("bigint")
    return j.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(keep.cast("bigint")).alias("docs_out"),
        F.sum(drop).alias("dups_removed"),
        F.round(F.sum(drop) / F.count(F.lit(1)), 4).alias("dup_ratio"),
    )
