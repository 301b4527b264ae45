"""Connected components over candidate-pair edges — the clustering step
that turns near-dup PAIRS (MinHash-LSH output) into dedup CLUSTERS
("keep one document per duplicate cluster").

Algorithm: iterative min-label propagation (large-star/small-star
simplified): every node adopts the smallest id reachable in one hop;
repeat until a fixed point. Each iteration is one join + one aggregation
(all shuffle-partitioned by node id); iterations ~ O(log(diameter)) —
the standard scalable CC formulation when a graph library isn't
available. The driver loop only checks a convergence *count* per
iteration; all data stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """(id_a, id_b) undirected edges -> (id, component) with component =
    min node id in the component. Nodes appearing only as singletons are
    absent (callers union them back with component = own id)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    # initial label: min neighbor (including self)
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("component"))
        .select(F.col("src").alias("id"), "component")
        .persist()
    )
    for _ in range(max_iter):
        # propagate: node label := min(own label, neighbors' labels)
        neigh = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
            .select(F.col("src").alias("id"), "n_comp")
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))).alias(
                    "component"
                ),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Assign every row a duplicate-cluster id (= min id in its near-dup
    component; singletons are their own cluster) and a keep flag for the
    cluster representative."""
    comp = connected_components(pairs, id_a, id_b)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("component"), F.col("id")).alias("cluster_id"),
        )
        .withColumn("is_kept", F.col(id_col) == F.col("cluster_id"))
    )
