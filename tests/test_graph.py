"""Connected-components tests: min-label vs large-star/small-star parity,
and the O(log n) convergence property that motivates the star variant."""

import random

from tikv_data_compare_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_star_path_graph_converges_in_log_rounds(spark):
    """A 1000-node path is the adversarial case for min-label (needs ~1000
    rounds, would raise at max_iter=64).  The star algorithm must finish it
    within 16 rounds — the O(log n) guarantee, not just eventual
    convergence — and label every node with the path minimum."""
    n = 1000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = _labels(connected_components_star(edges, max_iter=16))
    assert got == {i: 0 for i in range(n)}


def test_star_matches_min_label_on_random_graph(spark):
    rng = random.Random(42)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(220)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    star = _labels(connected_components_star(df))
    minl = _labels(connected_components(df, algo="min_label"))
    assert star == minl


def test_star_two_cliques_and_bridge(spark):
    cliq1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    cliq2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    bridge = [(4, 10)]
    df = spark.createDataFrame(cliq1 + cliq2 + bridge, "doc_a long, doc_b long")
    got = _labels(connected_components_star(df))
    assert set(got.values()) == {0}
    assert len(got) == 10


def test_connected_components_algo_dispatch(spark):
    df = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    star = _labels(connected_components(df, algo="star"))
    assert star == {1: 1, 2: 1, 3: 3, 4: 3}
    import pytest

    with pytest.raises(ValueError, match="algo"):
        connected_components(df, algo="bogus")


def test_hub_star_node_10k_edges_both_algos(spark):
    """The LSH skew case: one high-degree hub (node 0 paired with 1..10000,
    the near-clique shape boilerplate corpora produce).  Both algorithms
    must label the whole star with the hub minimum — the per-round
    groupBy.min partially aggregates the hub's fan-in map-side, so the hub
    is not a scale hazard (r7, VERDICT #7)."""
    n = 10_000
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, n + 1)], "doc_a long, doc_b long"
    )
    want = {i: 0 for i in range(n + 1)}
    assert _labels(connected_components(edges, algo="min_label")) == want
    assert _labels(connected_components_star(edges, max_iter=16)) == want


def test_max_edges_guard_raises(spark):
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "doc_a long, doc_b long"
    )
    # symmetrized frame has 100 edges; a 99-edge ceiling must trip, loudly
    with pytest.raises(ValueError, match="max_edges"):
        connected_components(edges, algo="min_label", max_edges=99)
    with pytest.raises(ValueError, match="max_edges"):
        connected_components_star(edges, max_edges=49)  # oriented-distinct: 50
    # and max_edges=None disables the guard
    got = _labels(connected_components(edges, max_edges=None))
    assert set(got.values()) == {0}


def test_incremental_fold_equals_batch(spark):
    """Folding random edge batches one at a time through
    incremental_components ends bit-identical to one-shot CC over the
    union — the streamed-pair-log contract."""
    from tikv_data_compare_spark.operators.graph import incremental_components

    rng = random.Random(7)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(180)]
    edges = [(a, b) for a, b in edges if a != b]
    chunks = [edges[i::4] for i in range(4)]
    labels = None
    for ch in chunks:
        df = spark.createDataFrame(ch, "doc_a long, doc_b long")
        labels = incremental_components(labels, df)
    batch = connected_components(
        spark.createDataFrame(edges, "doc_a long, doc_b long")
    )
    assert _labels(labels) == _labels(batch)


def test_incremental_cross_epoch_merge_and_idempotence(spark):
    """A later epoch bridging two earlier components must relabel the
    LOSING component's every node; refolding the same epoch is a no-op."""
    from tikv_data_compare_spark.operators.graph import incremental_components

    e1 = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    e2 = spark.createDataFrame([(10, 11), (11, 12)], "doc_a long, doc_b long")
    bridge = spark.createDataFrame([(3, 10)], "doc_a long, doc_b long")
    labels = incremental_components(None, e1)
    labels = incremental_components(labels, e2)
    assert _labels(labels) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    merged = incremental_components(labels, bridge)
    want = {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 12: 1}
    assert _labels(merged) == want
    again = incremental_components(merged, bridge)  # redelivered epoch
    assert _labels(again) == want
