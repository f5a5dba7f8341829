"""Connected components over a candidate-pair graph.

The last stage of near-dup deduplication: LSH produces *pairs*, but a dup
cluster is the transitive closure of those pairs — keep one doc per
component, not one per pair.  Component id = the minimum node id in the
component, so results are deterministic and comparable across engines
(DuckDB reproduces them with a recursive CTE — see the dedup_components
oracle in queries_ext.py).

Two algorithms, same output contract:

- ``min_label`` (default): min-label propagation.  Every node starts
  labeled with itself; each round a node takes the min of its own and its
  neighbors' labels; stop at fixpoint.  One equi-join + one groupBy-min per
  round, converging in O(graph diameter) rounds — near-dup clusters are
  dense and shallow, so a handful of rounds in practice.
- ``star``: alternating large-star/small-star contraction (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14) — O(log n)
  rounds regardless of diameter, the cluster-scale fallback for
  adversarially deep graphs (a 1000-node path converges in ~10 rounds
  where min-label needs ~1000; property-tested in tests/test_graph.py).

Each round is ``localCheckpoint``-ed: an iterative DataFrame loop
otherwise grows the lineage/plan exponentially (the classic Spark
iterative-algorithm trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


#: default ceiling on the symmetrized edge frame both CC variants persist /
#: checkpoint per round.  LSH over boilerplate-heavy corpora can emit a
#: near-clique (a template shared by n docs → ~n²/2 pairs), and the edge
#: frame — not the node count — is what each round's join/groupBy and the
#: persisted partitions scale with.  2^31 edges ≈ 32 GiB at 16 B/edge.
MAX_EDGES_DEFAULT = 2_000_000_000


def _guard_edges(n_edges: int, max_edges: int | None) -> None:
    if max_edges is not None and n_edges > max_edges:
        raise ValueError(
            f"pair graph has {n_edges} symmetrized edges > max_edges="
            f"{max_edges}: a near-clique this size usually means LSH "
            "candidate generation collapsed (boilerplate-heavy corpus — "
            "tighten the band threshold or pre-filter template docs). Raise "
            "max_edges explicitly to proceed anyway."
        )


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 64,
    algo: str = "min_label",
    max_edges: int | None = MAX_EDGES_DEFAULT,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component is
    the minimum node id reachable through the undirected pair graph.

    ``algo='min_label'`` (O(diameter) rounds, cheapest per round) for the
    shallow dense clusters dedup produces; ``algo='star'`` (O(log n)
    rounds) when the graph may contain long chains.

    ``max_edges`` bounds the symmetrized edge frame persisted across rounds
    (see :data:`MAX_EDGES_DEFAULT`).  High-degree hubs themselves are fine:
    the per-round ``groupBy.min`` partially aggregates map-side, and the
    neighbor join is an equi-join AQE skew-splits — a 10k-edge hub is
    pinned in tests/test_graph.py."""
    if algo == "star":
        return connected_components_star(edges, a_col, b_col, max_iter, max_edges)
    if algo != "min_label":
        raise ValueError(f"algo must be 'min_label' or 'star', got {algo!r}")
    e = edges.select(
        F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.persist()
    try:
        # materializes the persisted frame (needed before the loop anyway)
        # and feeds the runaway-graph guard in the same job
        _guard_edges(sym.count(), max_edges)
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


def connected_components_star(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
    max_edges: int | None = MAX_EDGES_DEFAULT,
) -> DataFrame:
    """Alternating large-star/small-star connected components — O(log n)
    rounds on ANY graph shape (Kiveris et al., SoCC'14).

    Each round:

    - **large-star**: per node u with m = min(N(u) ∪ {u}), rewire every
      strictly-larger neighbor v > u to m;
    - **small-star**: on edges oriented larger→smaller, per node u with
      m = min(N(u) ∪ {u}), rewire u and all its smaller neighbors to m.

    Both steps are one groupBy-min + one equi-join over the edge list (the
    same primitives as min-label), monotonically decrease the potential
    Σ(v, parent) and converge to disjoint stars rooted at each component's
    minimum id.  Fixpoint is detected by an (count, xxhash64-sum) edge-set
    signature instead of a join-diff — one tiny aggregate per round.
    """
    e = (
        edges.select(
            F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
    )
    nodes = (
        e.selectExpr("u AS n").union(e.selectExpr("v AS n")).distinct()
        .localCheckpoint(eager=True)
    )
    cur = (
        e.selectExpr("greatest(u, v) AS u", "least(u, v) AS v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    _guard_edges(cur.count(), max_edges)
    prev_sig = None
    for _ in range(max_iter):
        # large-star over the symmetric neighborhood
        sym = cur.union(cur.selectExpr("v AS u", "u AS v"))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn")).selectExpr(
            "u", "least(u, mn) AS m"
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .selectExpr("v AS u", "m AS v")  # v > u ≥ m keeps the u > v orientation
            .distinct()
        )
        # small-star over the larger→smaller orientation
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
        small = (
            large.join(mins2, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("x"), F.col("m").alias("y")),
                        F.struct(F.col("u").alias("x"), F.col("m").alias("y")),
                    )
                ).alias("p")
            )
            .selectExpr("p.x AS x", "p.y AS y")
            .filter(F.col("x") != F.col("y"))
            .selectExpr("greatest(x, y) AS u", "least(x, y) AS v")
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig_row = small.agg(
            F.count(F.lit(1)).alias("c"), F.sum(F.xxhash64("u", "v")).alias("h")
        ).first()
        sig = (sig_row["c"], sig_row["h"])
        cur = small
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds "
            "(O(log n) expected — this indicates a bug, not a deep graph)"
        )
    comp = cur.selectExpr("u AS id", "v AS component")
    roots = nodes.join(cur.selectExpr("u AS n"), "n", "left_anti").selectExpr(
        "n AS id", "n AS component"
    )
    return comp.union(roots)


def incremental_components(
    labels: DataFrame | None,
    new_edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    algo: str = "min_label",
    max_edges: int | None = MAX_EDGES_DEFAULT,
) -> DataFrame:
    """Fold one batch of pairs into an existing ``(id, component)`` label
    table — incremental union-find for the streamed dedup pair log (r10).

    The batch shape is the whole point at 100 TB: the accumulated pair log
    is NEVER re-read and the corpus-sized label table is never re-solved.
    Per fold:

    1. map the batch's endpoints through the prior labels (two equi-joins
       of the BATCH against the label table — prior components contract to
       their representative, unseen nodes stay themselves);
    2. run connected components on that mapped **merge graph**, whose size
       is bounded by the batch's pair count, not the corpus (mapped
       self-loops — pairs already inside one component — drop out first);
    3. rewrite labels with one equi-join against the merge map (AQE
       broadcasts it when small, which is the common case: most epochs
       merge few components) and append the batch's unseen nodes.

    Correctness: contracting a component to its (min-id) representative
    preserves reachability, and the representative participates in the
    merge-graph CC, so min ids propagate globally — folding epochs one at
    a time ends bit-identical to one-shot ``connected_components`` over
    the union of all pairs (pinned in tests/test_graph.py), and refolding
    the same batch is a no-op (idempotent under redelivery).

    ``labels=None`` bootstraps (plain CC over the batch).  Output covers
    every node that has appeared in at least one pair, like
    ``connected_components``.
    """
    if labels is None:
        return connected_components(
            new_edges, a_col, b_col, algo=algo, max_edges=max_edges
        )
    e = new_edges.select(
        F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
    )
    lab = labels.select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"),
    )
    mapped = (
        e.join(lab.selectExpr("id AS u", "component AS cu"), "u", "left")
        .join(lab.selectExpr("id AS v", "component AS cv"), "v", "left")
        .select(
            F.coalesce("cu", "u").alias("mu"), F.coalesce("cv", "v").alias("mv")
        )
        .filter(F.col("mu") != F.col("mv"))
    )
    merge_map = connected_components(
        mapped, "mu", "mv", algo=algo, max_edges=max_edges
    ).persist()
    try:
        updated = (
            lab.join(
                merge_map.selectExpr("id AS component", "component AS _new"),
                "component",
                "left",
            )
            .select("id", F.coalesce("_new", "component").alias("component"))
        )
        # batch endpoints never seen before: their merge-graph node IS the
        # doc id; a node whose every mapped edge self-looped cannot be
        # unseen (it would have had to map to itself on both sides), but
        # coalesce-to-self keeps the shape total anyway
        unseen = (
            e.selectExpr("u AS id").union(e.selectExpr("v AS id")).distinct()
            .join(lab.select("id"), "id", "left_anti")
            .join(
                merge_map.selectExpr("id", "component AS _new"), "id", "left"
            )
            .select("id", F.coalesce("_new", "id").alias("component"))
        )
        out = updated.unionByName(unseen)
        # materialize before unpersisting the merge map the plan reads
        return out.localCheckpoint(eager=True)
    finally:
        merge_map.unpersist()
