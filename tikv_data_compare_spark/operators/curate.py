"""One-call corpus curation: the composed pipeline a training-data user
actually runs, built entirely from this package's operators.

``curate(docs)`` chains, in the order real pipelines apply them:

1. exact dedup (content-hash groups, keep min id) — ``dedup.dedup_exact``;
2. near-dup removal (minhash-LSH candidates, exact-Jaccard verify, drop the
   higher id of each verified pair) — ``dedup.jaccard_pairs``;
3. quality gate (Gopher rule flags) — ``text.quality_flags``;
4. repetition gate (duplicate-word / top-bigram caps) —
   ``text.repetition_stats``;
5. PII gate (drop flagged docs when ``drop_pii``) — ``text.pii_counts``;
6. optional decontamination against a probe/benchmark corpus —
   ``text.contamination``.

Returns ``(kept_docs, attrition)`` where ``attrition`` is a small report
DataFrame ``(stage, n_in, n_out, n_dropped)`` — the per-stage funnel every
curation run is judged by.  Stage counts cost one action per stage over
cached intermediates; the kept-docs plan itself stays lazy-composable.

Scale: every stage is the underlying operator's plan (bucketed equi-joins
for near-dup, broadcast probe grams for decontamination, map-side
everything else); the composition adds only doc-id anti-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tikv_data_compare_spark.operators import dedup as dd
from tikv_data_compare_spark.operators import text as tx
from tikv_data_compare_spark.operators.similarity import release_broadcasts


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_jaccard_c: int = 8000,
    max_dup_word_frac_c: int = 7000,
    max_top_bigram_frac_c: int = 1800,
    drop_pii: bool = False,
    probes: DataFrame | None = None,
    max_contamination_hits: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation chain; see module docstring.

    Thresholds are scaled ×10000 like every engine fraction.  ``probes``
    enables the decontamination stage (docs with more than
    ``max_contamination_hits`` overlapping n-grams are dropped).

    The returned kept-docs DataFrame is **persisted** (its stage count
    already materialized it; unpersisting would make the caller's first
    action recompute the whole funnel).  The frame itself is the release
    handle: call ``kept.unpersist()`` when done with it.  All other
    intermediates and any operator-module broadcasts are released before
    returning.
    """
    spark = docs.sparkSession
    stages: list[tuple[str, int, int]] = []
    intermediates: list[DataFrame] = []

    base = docs.persist()
    intermediates.append(base)
    n_live = base.count()

    def step(name: str, after: DataFrame) -> DataFrame:
        # one count per stage: the input count is the previous stage's output
        nonlocal n_live
        cached = after.persist()
        intermediates.append(cached)
        n_out = cached.count()
        stages.append((name, n_live, n_out))
        n_live = n_out
        return cached

    # 1. exact dedup
    exact = step("exact_dedup", dd.dedup_exact(base, id_col, text_col))

    # 2. near-dup removal among survivors (pairs computed on survivors so a
    #    doc never loses to an already-removed exact duplicate)
    losers = (
        dd.jaccard_pairs(exact, id_col, text_col)
        .filter(F.col("jaccard_c") >= near_dup_jaccard_c)
        .select(F.col("doc_b").alias(id_col))
        .distinct()
    )
    near = step("near_dedup", exact.join(losers, id_col, "left_anti"))

    # 3. quality gate
    q_keep = tx.quality_flags(near, id_col, text_col).filter(F.col("keep") == 1).select(id_col)
    quality = step("quality", near.join(q_keep, id_col, "left_semi"))

    # 4. repetition gate
    r = tx.repetition_stats(quality, id_col, text_col)
    r_keep = r.filter(
        (F.col("dup_word_frac_c") <= max_dup_word_frac_c)
        & (F.col("top_bigram_frac_c") <= max_top_bigram_frac_c)
    ).select(id_col)
    cur = step("repetition", quality.join(r_keep, id_col, "left_semi"))

    # 5. PII gate
    if drop_pii:
        clean = tx.pii_counts(cur, id_col, text_col).filter(F.col("has_pii") == 0).select(id_col)
        cur = step("pii", cur.join(clean, id_col, "left_semi"))

    # 6. decontamination
    if probes is not None:
        ok = (
            tx.contamination(cur, probes, id_col, text_col)
            .filter(F.col("n_hit_grams") <= max_contamination_hits)
            .select(id_col)
        )
        cur = step("decontamination", cur.join(ok, id_col, "left_semi"))

    for df in intermediates:
        if df is not cur:
            df.unpersist()
    # drop any operator-module broadcasts created along the way (plane/query
    # matrices etc.) — a long-lived session calling curate() in a loop must
    # not accumulate executor-side broadcast blocks
    release_broadcasts()
    attrition = spark.createDataFrame(
        [(name, n_in, n_out, n_in - n_out) for name, n_in, n_out in stages],
        "stage string, n_in long, n_out long, n_dropped long",
    )
    return cur, attrition
