"""Round-4 extension queries: reconciliation, funnel/gap analytics, histograms,
TF-IDF keywords, dedup canonicalization, and source-format roundtrips.

Same driver contract as queries.py / queries_ext.py: every entry has a Spark
implementation (operators/*) and a bit-identical DuckDB oracle built from the
shared sqlgen canon primitives.  Registered via queries.queries() /
queries.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tikv_data_compare_spark.functions import fsutil, sqlgen
from tikv_data_compare_spark.functions.sqlgen import DUCK
from tikv_data_compare_spark.model import Keyed
from tikv_data_compare_spark.operators import diff as df_ops
from tikv_data_compare_spark.operators import events as ev
from tikv_data_compare_spark.operators import text as tx
from tikv_data_compare_spark.queries import (
    DST_ORDERS_SQL,
    _dc,
    _events_ms,
    _load,
    mutated_orders,
)
from tikv_data_compare_spark.session import tune

# ===================================================== diff → reconciliation


REPAIR_VALUE_COLS = ["o_custkey", "o_orderstatus", "o_totalprice"]


def q_diff_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation plan from the keyed diff: the action set (upsert with
    src payload / delete with NULL payload) that makes the mutated dst equal
    src again — the reference's diff report (diff/diff.go:49-62) upgraded to
    an executable MERGE input.  One full-outer sort-merge join; the invariant
    apply_repair(dst, plan) == src is pytest-proven (tests/test_repair.py)."""
    tune(spark)
    src = Keyed.of(
        _load(spark, sf_dir, "orders").select("o_orderkey", *REPAIR_VALUE_COLS),
        keys=("o_orderkey",),
    )
    dst = Keyed.of(
        mutated_orders(spark, sf_dir).select("o_orderkey", *REPAIR_VALUE_COLS),
        keys=("o_orderkey",),
    )
    plan = df_ops.repair_plan(src, dst)
    return plan.select(
        "o_orderkey",
        "action",
        "o_custkey",
        "o_orderstatus",
        F.expr(_dc("o_totalprice")).alias("o_totalprice_c"),
    )


ORACLE_DIFF_REPAIR = f"""
WITH s AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
d AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM ({DST_ORDERS_SQL}))
SELECT s.o_orderkey, 'upsert' AS action, s.o_custkey, s.o_orderstatus,
       {_dc("s.o_totalprice")} AS o_totalprice_c
FROM s LEFT JOIN d ON s.o_orderkey = d.o_orderkey
WHERE d.o_orderkey IS NULL
   OR NOT (s.o_custkey IS NOT DISTINCT FROM d.o_custkey
       AND s.o_orderstatus IS NOT DISTINCT FROM d.o_orderstatus
       AND s.o_totalprice IS NOT DISTINCT FROM d.o_totalprice)
UNION ALL
SELECT d.o_orderkey, 'delete' AS action, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT)
FROM d
WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.o_orderkey = d.o_orderkey)
"""


# ===================================================== dedup canonicalization


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup decision: every document mapped to its
    transitive dup component (connected components over the minhash-LSH pair
    graph) with a kept/dropped verdict — kept iff the doc is its component's
    canonical (minimum) id; singletons keep themselves.  This is the row a
    training-data pipeline actually acts on, completing the
    pairs → components → decisions chain.

    Since r6 the row gates the component algorithms against each other:
    the labeling is computed by min-label propagation AND by alternating
    large/small-star (operators/graph.py) AND — since r10 — by the
    INCREMENTAL union-find fold over three pair chunks
    (graph.incremental_components, the streamed-pair-log maintenance
    path); the returned rows are their three-way INTERSECTION.  Closure is
    algorithm- and chunking-independent, so all labelings must be
    identical; any divergence shrinks the intersection and fails the
    unchanged recursive-CTE oracle's row count — a driver-hard equivalence
    gate, not just a property test.

    Since r12 the row also carries the LEAKAGE-SAFE train/val/test
    assignment (``sampling.split_assign`` keyed on the component label,
    90/5/5): every member of a near-dup family gets the identical split by
    construction — the composition that stops eval contamination — and the
    oracle recomputes bucket AND bucket-layout CASE from the component, so
    the group-keyed coin is hash-gated on real canonical labels."""
    tune(spark)
    from tikv_data_compare_spark.operators import dedup as dd
    from tikv_data_compare_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id")
    pairs = dd.minhash_pairs(_load(spark, sf_dir, "documents"), "doc_id", "text").cache()
    try:
        # all CC variants run their rounds eagerly (localCheckpoint per
        # round) and return lineage-cut frames, so the pair cache is fully
        # consumed here and can be released before returning — a long-lived
        # driver session must not accumulate cached pair partitions (r7,
        # ADVICE; mirrors curate()'s release pattern)
        comp_min = connected_components(pairs)
        comp_star = connected_components_star(pairs)
        # third labeling since late r10: the INCREMENTAL union-find fold
        # (graph.incremental_components) over three doc_id-keyed pair
        # chunks — the streamed-pair-log maintenance path must land on the
        # identical closure, so it joins the intersection gate
        from tikv_data_compare_spark.operators.graph import incremental_components

        comp_inc = None
        for k in range(3):
            chunk = pairs.filter((F.col("doc_a") % 3) == k)
            comp_inc = incremental_components(comp_inc, chunk)
    finally:
        pairs.unpersist()

    def verdicts(comp: DataFrame) -> DataFrame:
        joined = docs.join(comp, docs.doc_id == comp.id, "left")
        component = F.coalesce(F.col("component"), F.col("doc_id"))
        return joined.select(
            "doc_id",
            component.cast("long").alias("component"),
            (component == F.col("doc_id")).cast("long").alias("kept"),
        )

    from tikv_data_compare_spark.operators.sampling import split_assign

    out = (
        verdicts(comp_min)
        .intersect(verdicts(comp_star))
        .intersect(verdicts(comp_inc))
    )
    # leakage-safe split: the coin is the COMPONENT label, so a whole
    # near-dup family lands in one split (a pure function of the already
    # intersection-gated component — applied once, after the gate)
    return split_assign(
        out, {"train": 9000, "val": 500, "test": 500}, group_col="component"
    )


def _oracle_dedup_canonical() -> str:
    from tikv_data_compare_spark.queries_ext import ORACLE_DEDUP_COMPONENTS

    from tikv_data_compare_spark.functions import sqlgen

    return f"""
WITH comp AS ({ORACLE_DEDUP_COMPONENTS}),
verdicts AS (
  SELECT d.doc_id,
         CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
         CAST(CASE WHEN COALESCE(c.component, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS BIGINT) AS kept
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
-- r12: leakage-safe split keyed on the component label (group coin:
-- md5 of the label rendered as a string, per-10000 bucket, layout
-- train [0,9000) / val [9000,9500) / test — sampling.split_assign
SELECT doc_id, component, kept,
       CAST(b AS BIGINT) AS split_bucket,
       CASE WHEN b < 9000 THEN 'train'
            WHEN b < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, component, kept,
         ((({sqlgen.hexfold_i64('_m')}) % 10000) + 10000) % 10000 AS b
  FROM (SELECT doc_id, component, kept,
               md5(CAST(component AS VARCHAR)) AS _m
        FROM verdicts)
)
"""


# ============================================================ events: funnel


FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → click → purchase: a user
    reaches stage k iff an event of that type occurs at-or-after their
    stage-(k-1) reach time (first-touch cascade).

    Shape: four chained window-mins over the SAME user_id partitioning — one
    exchange, one sort, four Window operators back-to-back — then a groupBy
    on the already-partitioned key (no second exchange) and a scalar rollup.
    No self-joins, no collect; at 100 TB this is a single shuffle of
    (user_id, type, ms) triples."""
    tune(spark)
    e, ms = _events_ms(spark, sf_dir)
    base = e.select("user_id", "event_type", ms.alias("ms"))
    return ev.funnel_counts(base, FUNNEL_STAGES)


def q_events_funnel_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel + gap analytics in one tall (metric, value) result:

    - the ordered-conversion funnel rollup (``funnel_counts`` over
      ``q_events_funnel``'s stage cascade): total users and per-stage reach
      counts;
    - the inter-event gap profile (``gap_profile``) reduced to corpus-level
      metrics: total gaps, max/sum gap, gaps above the 30-min session
      threshold, and how many users have at least one such gap — the
      distribution that motivates the sessionize cut-off.

    Both operators run their full per-user window machinery (four chained
    window-mins; one lag window) — a mispartitioned window changes the
    global sums and fails the hash — then collapse to the tall summary so
    two operator families share one driver row."""
    tune(spark)
    e, ms = _events_ms(spark, sf_dir)
    base = e.select("user_id", "event_type", "event_id", ms.alias("ms"))
    funnel = ev.funnel_counts(base, FUNNEL_STAGES)
    stage_stack = ", ".join(
        f"'{m}', {m}" for m in ["n_users"] + [f"n_{s}" for s in FUNNEL_STAGES]
    )
    f_tall = funnel.select(
        F.expr(f"stack({1 + len(FUNNEL_STAGES)}, {stage_stack}) AS (metric, value)")
    )
    gaps = ev.gap_profile(base, long_gap_ms=GAP_LONG_MS)
    g_tall = gaps.agg(
        F.sum("n_gaps").cast("long").alias("gap_total"),
        F.max("max_gap_ms").cast("long").alias("gap_max_ms"),
        F.sum("sum_gap_ms").cast("long").alias("gap_sum_ms"),
        F.sum("n_long_gaps").cast("long").alias("gap_long_total"),
        F.sum((F.col("n_long_gaps") > 0).cast("long")).cast("long").alias("gap_users_with_long"),
    ).select(
        F.expr(
            "stack(5, 'gap_total', gap_total, 'gap_max_ms', gap_max_ms, "
            "'gap_sum_ms', gap_sum_ms, 'gap_long_total', gap_long_total, "
            "'gap_users_with_long', gap_users_with_long) AS (metric, value)"
        )
    )
    return f_tall.unionByName(g_tall)


def _oracle_events_funnel_gaps() -> str:
    stage_rows = "\nUNION ALL ".join(
        f"SELECT '{m}' AS metric, CAST({'count(*)' if m == 'n_users' else 'count(t' + str(i) + ')'} AS BIGINT) AS value FROM per_user"
        for i, m in enumerate(["n_users"] + [f"n_{s}" for s in FUNNEL_STAGES])
    )
    return f"""
WITH base AS (SELECT user_id, event_type, event_id, {sqlgen.ts_ms("ts", DUCK)} AS ms FROM events),
w1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN ms END)
                 OVER (PARTITION BY user_id) AS t1 FROM base),
w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND ms >= t1 THEN ms END)
                 OVER (PARTITION BY user_id) AS t2 FROM w1),
w3 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ms >= t2 THEN ms END)
                 OVER (PARTITION BY user_id) AS t3 FROM w2),
w4 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ms >= t3 THEN ms END)
                 OVER (PARTITION BY user_id) AS t4 FROM w3),
per_user AS (
  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3, min(t4) AS t4
  FROM w4 GROUP BY user_id
),
gapped AS (
  SELECT user_id, ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap
  FROM base
),
per_user_g AS (
  SELECT user_id, count(gap) AS n_gaps, max(gap) AS max_gap, sum(gap) AS sum_gap,
         count(CASE WHEN gap > {GAP_LONG_MS} THEN 1 END) AS n_long
  FROM gapped GROUP BY user_id
)
{stage_rows}
UNION ALL SELECT 'gap_total', CAST(sum(n_gaps) AS BIGINT) FROM per_user_g
UNION ALL SELECT 'gap_max_ms', CAST(max(max_gap) AS BIGINT) FROM per_user_g
UNION ALL SELECT 'gap_sum_ms', CAST(sum(sum_gap) AS BIGINT) FROM per_user_g
UNION ALL SELECT 'gap_long_total', CAST(sum(n_long) AS BIGINT) FROM per_user_g
UNION ALL SELECT 'gap_users_with_long', CAST(sum(CASE WHEN n_long > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM per_user_g
"""


# ============================================================== events: gaps


GAP_LONG_MS = 1_800_000  # same 30-min threshold as sessionize


# ========================================================== price histogram


HIST_BUCKET_CENTS = 2_000_000  # $20,000 equal-width buckets


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of order totals in exact integer cents —
    bucket = round(price×100) div 2,000,000 ($20k), so bucket edges are
    engine-stable (no float floor at boundaries).  Pure map-side bucketing +
    one tiny shuffle of ≤ ~30 partial rows per task: the 100 TB profile
    primitive."""
    tune(spark)
    o = _load(spark, sf_dir, "orders")
    cents = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
    b = o.select(
        F.expr(f"{cents} DIV {HIST_BUCKET_CENTS}").alias("bucket"),
        F.expr(cents).alias("cents"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "bucket",
            (F.col("bucket") * (HIST_BUCKET_CENTS // 100)).alias("lo_dollars"),
            "n",
            "sum_cents",
        )
    )


ORACLE_PRICE_HISTOGRAM = f"""
WITH b AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // {HIST_BUCKET_CENTS} AS bucket,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT bucket, CAST(bucket * {HIST_BUCKET_CENTS // 100} AS BIGINT) AS lo_dollars,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY bucket
"""


# ============================================================== text: tf-idf


#: fixed retrieval query set for the bm25 gate — corpus-vocabulary words
#: (FIXTURES.md: the synthetic docs draw from a small OLAP word list), one
#: query with an out-of-vocabulary term to prove unmatched terms score 0.
BM25_QUERIES = (
    (0, "data query window"),
    (1, "hash join merge table"),
    (2, "stream batch nonexistentterm"),
)


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus term-ranking/retrieval operators in one labeled row set:

    - ``part='tfidf'``: top-3 TF-IDF terms per document (``tfidf_top_terms``;
      idf frozen to ROUND(ln(N/df)×1e6) so ranking and score are integer and
      bit-identical across engines; term-ascending tie-break);
    - ``part='bigrams'`` (since r6): corpus-wide top-20 adjacent-word
      bigrams (``top_bigrams``; count desc, bigram asc), ``doc_id=-1`` /
      ``score_c=0`` as the corpus-level placeholders;
    - ``part='bm25'`` (r10): Okapi BM25 top-5 docs per ``BM25_QUERIES``
      query (per-term scores integer-frozen before the per-doc sum, the
      score expression shared verbatim with the oracle via
      ``bm25_score_sql``) — ``term`` is the query text, ``tf`` the count of
      matched distinct query terms, ``score_c`` the integer BM25 score.
      The row runs the PERSISTED path (operators/text_index.py) and since
      late r10 BUILDS IT THROUGH THE STREAMING INGEST
      (streaming/text_index_stream.py: two watermarked
      ``ingest_batch_into_text_index`` epoch calls — bootstrap build +
      id-idempotent append), so the continuous-maintenance flow + load +
      query are all inside the hash gate — the oracle recomputes
      whole-corpus BM25, which only matches if every epoch's appended
      statistics are exactly the corpus statistics."""

    from tikv_data_compare_spark.operators.text_index import query_text_index
    from tikv_data_compare_spark.streaming.text_index_stream import (
        ingest_batch_into_text_index,
    )

    tune(spark)
    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    tfidf = tx.tfidf_top_terms(docs, "doc_id", "text", k=3).select(
        F.lit("tfidf").alias("part"), "doc_id", "rnk", "term", "tf", "score_c"
    )
    bigr = tx.top_bigrams(docs, "text", k=20).select(
        F.lit("bigrams").alias("part"),
        F.lit(-1).cast("long").alias("doc_id"),
        "rnk",
        F.col("bigram").alias("term"),
        F.col("n").alias("tf"),
        F.lit(0).cast("long").alias("score_c"),
    )
    qdf = spark.createDataFrame(list(BM25_QUERIES), "query_id long, qtext string")
    tix = fsutil.scratch_dir(prefix="bm25_tix_") + "/index"
    ingest_batch_into_text_index(docs.filter("doc_id % 2 = 0"), tix, epoch_id=0)
    ingest_batch_into_text_index(docs.filter("doc_id % 2 = 1"), tix, epoch_id=1)
    bm25 = (
        query_text_index(qdf, tix, k=5)
        .join(F.broadcast(qdf), "query_id")
        .select(
            F.lit("bm25").alias("part"),
            "doc_id",
            "rnk",
            F.col("qtext").alias("term"),
            F.col("n_terms").alias("tf"),
            F.col("bm25_c").alias("score_c"),
        )
    )
    return tfidf.unionByName(bigr).unionByName(bm25)


def _bm25_values() -> str:
    return ", ".join(f"({i}, '{t}')" for i, t in BM25_QUERIES)


ORACLE_TEXT_TFIDF = f"""
WITH words AS (
  SELECT doc_id, unnest({sqlgen.split_words('text', DUCK)}) AS w FROM documents
),
tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS dfq FROM tf GROUP BY w),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
idf AS (
  -- frozen per distinct term via the det_ln freeze (sqlgen.frozen_ln_c),
  -- engine-exact — mirrors operators/text.py tfidf_topk
  SELECT w, {sqlgen.frozen_ln_c('idf_r')} AS idf_c
  FROM (SELECT dfreq.w, CAST(n.n_docs AS DOUBLE) / dfreq.dfq AS idf_r
        FROM dfreq CROSS JOIN n)
),
scored AS (
  SELECT tf.doc_id, tf.w, tf.tf, tf.tf * idf.idf_c AS score_c
  FROM tf JOIN idf ON tf.w = idf.w
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_c DESC, w ASC) AS rnk
  FROM scored
)
SELECT 'tfidf' AS part, doc_id, CAST(rnk AS BIGINT) AS rnk, w AS term,
       CAST(tf AS BIGINT) AS tf, score_c
FROM ranked WHERE rnk <= 3
UNION ALL
SELECT 'bigrams' AS part, CAST(-1 AS BIGINT) AS doc_id,
       CAST(row_number() OVER (ORDER BY n DESC, bigram ASC) AS BIGINT) AS rnk,
       bigram AS term, CAST(n AS BIGINT) AS tf, CAST(0 AS BIGINT) AS score_c
FROM (
  SELECT bigram, count(*) AS n FROM (
    SELECT unnest(CASE WHEN len(ws) < 2 THEN []
           ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END) AS bigram
    FROM (SELECT {sqlgen.split_words('text', DUCK)} AS ws FROM documents)
  ) GROUP BY bigram
) QUALIFY rnk <= 20
UNION ALL
SELECT 'bm25' AS part, CAST(doc_id AS BIGINT) AS doc_id, CAST(rnk AS BIGINT) AS rnk,
       qtext AS term, CAST(n_terms AS BIGINT) AS tf, bm25_c AS score_c
FROM (
  WITH toks AS (SELECT doc_id, {sqlgen.split_words('text', DUCK)} AS ws FROM documents),
  w2 AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS w FROM toks),
  tf2 AS (SELECT doc_id, dl, w, CAST(count(*) AS BIGINT) AS tf FROM w2 GROUP BY 1, 2, 3),
  dfreq2 AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY w),
  scal AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
           CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
    FROM (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM toks)
  ),
  qt AS (
    SELECT qid, qtext, unnest(list_distinct(string_split(qtext, ' '))) AS w
    FROM (VALUES {{BM25_VALUES}}) AS q(qid, qtext)
  ),
  -- idf hoisted to one row per distinct term (r14, mirrors bm25_rank):
  -- the det_ln expansion runs vocabulary-many times, never per candidate
  bidf AS (
    SELECT w, {{BM25_IDF}} AS idf FROM dfreq2 CROSS JOIN scal
  ),
  sc2 AS (
    SELECT qt.qid, qt.qtext, tf2.doc_id, {{BM25_SCORE}} AS score_c
    FROM tf2 JOIN qt USING (w) JOIN bidf USING (w) CROSS JOIN scal
  ),
  perdoc AS (
    SELECT qid, qtext, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(score_c) AS BIGINT) AS bm25_c
    FROM sc2 GROUP BY 1, 2, 3
  )
  SELECT qtext, doc_id, n_terms, bm25_c,
         row_number() OVER (PARTITION BY qid ORDER BY bm25_c DESC, doc_id ASC) AS rnk
  FROM perdoc QUALIFY rnk <= 5
)
"""

# the query VALUES and the idf/score expressions are rendered OUTSIDE the
# f-string so the idf and score SQL are textually THE SAME strings the Spark
# operator compiles (bm25_idf_sql / bm25_score_sql) — the determinism
# argument rests on that.
ORACLE_TEXT_TFIDF = (
    ORACLE_TEXT_TFIDF.replace("{BM25_VALUES}", _bm25_values())
    .replace("{BM25_IDF}", tx.bm25_idf_sql())
    .replace("{BM25_SCORE}", tx.bm25_score_sql())
)


# ============================================== sources: partitioned layout


PRUNE_PRIORITY = "1-URGENT"


def q_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet layout + partition pruning: write orders
    partitioned by o_orderpriority, read back with a partition-column filter
    — the scan must touch ONLY the matching directory (partition pruning,
    plan-asserted in tests/test_plans.py), the 100 TB answer to 'compare only
    this slice'.  Returns the per-status rollup of the pruned slice."""
    tune(spark)
    o = _load(spark, sf_dir, "orders")
    d = fsutil.scratch_dir(prefix="tdc_part_")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(d)
    back = spark.read.parquet(d).filter(F.col("o_orderpriority") == PRUNE_PRIORITY)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(_dc("o_totalprice"))).alias("sum_price_c"),
    )


ORACLE_PARTITIONED_PRUNE = f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum({_dc("o_totalprice")}) AS BIGINT) AS sum_price_c
FROM orders WHERE o_orderpriority = '{PRUNE_PRIORITY}'
GROUP BY o_orderstatus
"""


# Registration lives in queries.queries()/queries.oracle_sql() — the single
# ordered 50-entry registry (the driver's checked window is 50 entries).
ORACLE_EVENTS_FUNNEL_GAPS = _oracle_events_funnel_gaps()
