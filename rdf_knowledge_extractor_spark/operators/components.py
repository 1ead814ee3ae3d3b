"""Connected components on a DataFrame edge list (label propagation).

GraphFrames-style min-label propagation, pure DataFrame ops: each
node's label starts as itself; every round each node takes the min of
its own and its neighbors' labels; converges in O(component diameter)
rounds (entity-alias clusters are near-star-shaped ⇒ 2-4 rounds).

Scale design:
- the edge list is symmetrized once and re-used every round
  (persist + explicit repartition on `src` so every round's join is
  co-partitioned — one shuffle per round for the aggregation only);
- per-round `localCheckpoint` truncates the lineage chain (a growing
  plan is the classic iterative-algorithm OOM at scale);
- convergence is checked with a cheap aggregate (sum of label
  changes), not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame(node, component) — component = min node id (lexicographic
    for strings) reachable from `node`.  Isolated nodes appear iff they
    appear in `edges` (self-loops allowed)."""
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition(n_part, "a")
        .persist()
    )

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .repartition(n_part, "node")
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # neighbor label propagation: node ← min(own, neighbors' labels)
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("new_component"),
                F.col("component"),
            )
        )
        changed = updated.agg(
            F.sum((F.col("new_component") != F.col("component")).cast("long")).alias("n")
        ).collect()[0]["n"]
        labels = (
            updated.select("node", F.col("new_component").alias("component"))
            .repartition(n_part, "node")
            .localCheckpoint(eager=True)
        )
        if not changed:
            break

    sym.unpersist()
    return labels
