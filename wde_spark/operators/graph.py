"""Connected components over a pair/edge table — the clustering step of a
dedup pipeline: near-dup PAIRS (from LSH/simhash/Jaccard verification)
become dedup CLASSES, each labeled by its minimum member id, so "keep one
representative per class" is a groupBy away.

Algorithm: iterative min-label propagation. Every node starts labeled with
itself; each round a node takes the min of its own and its neighbors'
labels; converges in O(diameter) rounds (near-dup graphs are overwhelmingly
tiny cliques — diameter 1-2, so 3-4 rounds in practice).

Scale notes (100 TB):
- Each round is one shuffle join (edges ⋈ labels on dst) + a hash agg on
  src — both on the same key, so AQE reuses the partitioning.
- `localCheckpoint` between rounds cuts lineage; without it the plan
  doubles each iteration and the driver OOMs on plan size long before the
  data is a problem.
- Convergence is detected by the monotone sum of labels (strictly
  decreasing until fixpoint) — one cheap scalar agg per round instead of a
  full old-vs-new anti join.
- For pathological chain graphs, large-star/small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SOCC'14) halves rounds;
  not needed for dedup-clique workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 20) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node id
    reachable. Deterministic for any input order."""
    # checkpoint the symmetrized edge table ONCE — every round joins it
    sym = edges.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(
        edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    converged = prev_sum is None  # no nodes → nothing to propagate
    for _ in range(max_iter):
        if converged:
            break
        nbr = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src").agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr, labels.node == nbr.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            converged = True
        prev_sum = cur_sum
    if not converged:
        # silent truncation would return WRONG components — fail loudly
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(component diameter exceeds max_iter); raise max_iter")
    return labels.select("node", F.col("label").alias("component"))
