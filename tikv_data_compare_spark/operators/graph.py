"""Connected components over a candidate-pair graph.

The last stage of near-dup deduplication: LSH produces *pairs*, but a dup
cluster is the transitive closure of those pairs — keep one doc per
component, not one per pair.  Component id = the minimum node id in the
component, so results are deterministic and comparable across engines
(DuckDB reproduces them with a recursive CTE — see the dedup_components
oracle in queries_ext.py).

Algorithm: min-label propagation.  Every node starts labeled with itself;
each round a node takes the min of its own and its neighbors' labels; stop
at fixpoint.  One equi-join + one groupBy-min per round, converging in
O(graph diameter) rounds — near-dup clusters are dense and shallow, so a
handful of rounds in practice.  Each round is ``localCheckpoint``-ed: an
iterative DataFrame loop otherwise grows the lineage/plan exponentially
(the classic Spark iterative-algorithm trap).  For adversarially deep
graphs at cluster scale, swap in the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce") — same
join primitive, O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 64,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component is
    the minimum node id reachable through the undirected pair graph."""
    e = edges.select(
        F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.persist()
    try:
        labels = sym.select("u").distinct().withColumn("comp", F.col("u"))
        labels = labels.localCheckpoint(eager=True)
        for _ in range(max_iter):
            neigh = sym.alias("e").join(
                labels.alias("l"), F.col("e.v") == F.col("l.u")
            ).select(F.col("e.u").alias("u"), F.col("l.comp").alias("comp"))
            new = (
                labels.unionByName(neigh)
                .groupBy("u")
                .agg(F.min("comp").alias("comp"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "u")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            labels = new
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds; "
                "the graph diameter exceeds max_iter — raise it or use the "
                "large-star/small-star variant"
            )
        return labels.select(F.col("u").alias("id"), F.col("comp").alias("component"))
    finally:
        sym.unpersist()
