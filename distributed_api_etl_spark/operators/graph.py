"""Graph operators for dedup clustering: connected components.

Pairwise near-dup output (d1, d2) is only half the job — ingest needs one
canonical document per *cluster* (pairs are transitive: A~B, B~C => keep
one of {A,B,C}). Connected components with min-id labels gives exactly
that; the label IS the canonical (keep) id.

Algorithm: iterative min-label propagation on DataFrames —
``label(v) <- min(label(v), min over neighbors(label(n)))`` to fixpoint.
Each round is one join + one aggregation; rounds needed = graph diameter
(dup clusters are near-cliques, so 2-4 rounds in practice).

100 TB notes: the driver loop holds no data — per round it runs one
distributed job and reads a single changed-count. For adversarial
long-chain graphs switch to the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14,
public) — same join primitives, O(log n) rounds guaranteed. Persist the
label frame between rounds (lineage otherwise grows linearly with rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id = min
    node id reachable. Deterministic for any id type with a total order."""
    # persist + materialize the incoming edge list FIRST: the symmetrization
    # union below references it twice, and edges are typically the output of
    # an entire LSH/minhash pipeline — lazy persist alone isn't enough, both
    # union branches would race a cold cache inside one job and run the
    # upstream DAG twice anyway. count() is one job over a frame that must
    # be computed regardless; every later round then reads pure cache.
    edges = edges.select(F.col(src), F.col(dst)).persist()
    edges.count()
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    # distinct + repartition on the join key: the persisted frame is already
    # hash-partitioned on ``a``, so every round's propagation join shuffles
    # only the (smaller) label side, never the edges again
    sym = sym.distinct().repartition("a").persist()
    # iterative lineage MUST be truncated every round: ``labels`` appears
    # twice per iteration, so without a checkpoint the logical plan doubles
    # each round (2^iters nodes -> driver OOM just *printing* the plan).
    # localCheckpoint materializes to executor storage and cuts lineage; on
    # a cluster prefer a reliable checkpoint dir for fault tolerance.
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the old label through the update so convergence detection is
        # a scan of the just-checkpointed frame, not another join
        new_labels = (
            labels.select("node", F.col("label").alias("old"))
            .join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("old"), F.coalesce(F.col("nbr_label"), F.col("old"))
                ).alias("label"),
                "old",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("label") != F.col("old")).limit(1).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    sym.unpersist()
    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_cluster_assignment(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """Full-corpus cluster map: every doc gets (doc_id, cluster_id, is_keep).

    Docs not in any dup pair are their own cluster. ``is_keep`` marks the
    canonical doc (min id) — ``filter(is_keep)`` is the deduplicated corpus.
    """
    comp = connected_components(pairs, src, dst)
    return (
        all_ids.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_keep", F.col("doc_id") == F.col("cluster_id"))
    )
