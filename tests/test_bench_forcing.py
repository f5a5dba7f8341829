"""Tripwire for bench.py's evaluation forcing (VERDICT r15 finding 1).

The r15 audit showed ``.count()`` forcing let Catalyst prune five operators
to bare parquet scans — ``text_stats(...).count()`` optimized to
``Aggregate [count(1)] <- Project [] <- Relation``, timing a row-count
instead of the operator.  bench.py r16 forces every entry through
``bit_xor(xxhash64(<all output columns>))`` (bench.forced), which makes
pruning impossible: the hash needs every column of every row.

These tests pin that property against regression:
  1. the forced plan's TOP-level aggregate is the canon hash (bit_xor of
     xxhash64), never count(1);
  2. every output column of the operator survives into the optimized
     forced plan (nothing pruned);
  3. the five formerly-pruned entries' characteristic work is present in
     the forced plan (hex projection, window, joins, text functions) —
     the exact nodes r15 saw vanish.
"""

import re

import pytest

import bench

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def benches(spark):
    return bench.build_benches(spark, SF_DIR)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _top_aggregate_line(plan: str) -> str:
    """First plan line — the root node of the forced query."""
    return plan.splitlines()[0]


@pytest.mark.parametrize("name", [
    "checksum_compare_xxh", "diff_keyed", "export_hex", "dedup_minhash_pairs",
    "dedup_simhash", "similarity_topk", "text_stats", "sessionize",
    "asof_join", "join_region_revenue", "funnel_gaps", "tfidf",
    "repair_plan", "price_histogram", "targeted_diff_1pct", "diff_full_1pct",
    "topk_pq_rerank", "topk_ivfpq", "topk_ivfpq_join", "dedup_lines",
    "bm25", "semdedup", "semdedup_auto", "bpe_tokens", "curation_pipeline",
    "dsir_sample", "quality_classifier",
])
def test_forced_plan_is_canon_hash_and_unpruned(benches, name):
    df = benches[name]()
    plan = _optimized(bench.forced(df))
    root = _top_aggregate_line(plan)
    # 1. root is the canon aggregate, not a count
    assert "bit_xor" in root and "xxhash64" in root, (
        f"{name}: forced root is not the canon hash aggregate: {root}"
    )
    assert "count(1)" not in root, (
        f"{name}: forced root degenerated to count(1) — the r15 pruning bug: {root}"
    )
    # 2. no output column pruned: each must be referenced somewhere in the
    # optimized plan (either computed or read from the scan)
    missing = [c for c in df.columns if c not in plan]
    assert not missing, f"{name}: columns pruned from forced plan: {missing}"


# The five entries r15 caught timing nothing, each with the specific node
# the audit saw Catalyst remove under count() forcing.  A marker regex
# disappearing again means the forcing (or the operator) regressed.
PRUNED_FIVE_MARKERS = {
    # r15: "keeps the _bid broadcast join but loses the hex projection, the
    # per-bucket row_number window, and the offset sum"
    "export_hex": [r"hex\(", r"row_number"],
    # r15: reduced to a scan of doc_id alone
    "dedup_simhash": [r"xxhash64|md5|hash", r"split|sentences|regexp"],
    # r15: Aggregate [count(1)] over bare Relation
    "text_stats": [r"length\(|split\(|size\("],
    "asof_join": [r"Join|Window"],
    "dedup_lines": [r"Join", r"split\(|explode|Generate"],
}


@pytest.mark.parametrize("name", sorted(PRUNED_FIVE_MARKERS))
def test_formerly_pruned_entries_keep_their_work(benches, name):
    plan = _optimized(bench.forced(benches[name]()))
    for marker in PRUNED_FIVE_MARKERS[name]:
        assert re.search(marker, plan), (
            f"{name}: marker /{marker}/ absent from forced plan — operator "
            f"pruned again?\n{plan[:2000]}"
        )


def test_forced_helper_hashes_every_column(spark):
    df = spark.range(3).selectExpr("id", "id * 2 as b", "cast(id as string) as c")
    f = bench.forced(df)
    assert f.columns == ["canon"]
    plan = _optimized(f)
    for c in ("id", "b", "c"):
        assert c in plan
    # deterministic value: same frame, same canon
    assert f.collect()[0][0] == bench.forced(df).collect()[0][0]


def test_every_bench_entry_has_a_band(benches):
    """Band ↔ entry key parity: a new bench entry must ship with a
    BASELINE band (and a dead band means an entry was renamed/removed
    without recalibrating)."""
    assert set(bench.BANDS) == set(benches)
