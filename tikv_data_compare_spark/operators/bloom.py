"""Deterministic Bloom-filter membership gates for corpus-scale screening.

The exact decontamination / dedup joins in this repo carry the screening
set as a broadcast TABLE of fingerprints (``text.decontaminate_substring``,
``text.contamination``).  That is the right shape while the eval set is
benchmark-sized; when the screening set itself is corpus-sized (a blocklist
of URLs, the fingerprints of an entire held-out corpus, the id set of an
earlier epoch), the broadcast grows with it.  A Bloom filter caps that
broadcast at a FIXED ``m_bits`` bitmap — a few MB no matter how many items
were inserted — at the price of a bounded, tunable false-positive rate and
zero false negatives.  The standard composition stays exact: bloom-probe as
the cheap map-side pre-filter, then run the exact verify only on the
(typically tiny) flagged remainder — same contract as the winnow prune
inside ``decontaminate_substring``.

Everything is integer-deterministic and engine-exact, so the DuckDB oracle
replays the filter bit-for-bit — including which false positives occur:

- probe ``j`` of item ``x`` sets bit ``hexfold(md5(x || ':' || j)) mod m``
  (the repo's shared md5+hexfold coin, staged into a column before the
  30×-repeating fold);
- the bitmap is packed into 63-bit words (bits 0..62 of a BIGINT), so no
  value ever touches the sign bit — DuckDB RAISES on signed shift overflow
  and the two engines would otherwise disagree at bit 63;
- membership = every one of the ``k_hashes`` probed bits set.

Spark shape: build is one map-side explode + a ``bit_or`` group-by whose
result is ≤ ``ceil(m_bits / 63)`` rows regardless of input size; probe is
``k_hashes`` broadcast-hash-joins of that bounded word table plus a
per-row bitwise AND — the probed corpus never shuffles at all.

The reference (a KV-compare CLI) has no membership surface; this module is
part of the LLM-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tikv_data_compare_spark.functions import sqlgen

_WORD_BITS = 63  # bits per packed BIGINT word; bit 63 (sign) never used
_STAGE = "_bloom_m"


def _validate(m_bits: int, k_hashes: int) -> None:
    if isinstance(m_bits, bool) or not isinstance(m_bits, int) or m_bits < _WORD_BITS:
        raise ValueError(f"m_bits must be an integer >= {_WORD_BITS}, got {m_bits!r}")
    if (
        isinstance(k_hashes, bool)
        or not isinstance(k_hashes, int)
        or not 1 <= k_hashes <= 16
    ):
        raise ValueError(f"k_hashes must be an integer in [1, 16], got {k_hashes!r}")


def _positions(
    df: DataFrame, item_col: str, m_bits: int, k_hashes: int, keep: list[str]
) -> DataFrame:
    """One row per (kept-cols, probe j) with the probed word index and bit:
    ``pos_j = hexfold(md5(item || ':' || j)) mod m_bits`` (non-negative),
    ``word = pos // 63``, ``bit = pos % 63``.  NULL items key as ``''``
    (the sampler-family convention — deterministic, never dropped by a
    NULL-propagating md5)."""
    if _STAGE in df.columns:
        raise ValueError(f"column name {_STAGE!r} is reserved by the bloom operators")
    item = F.coalesce(F.col(item_col).cast("string"), F.lit(""))
    staged = (
        df.select(*keep, item.alias("_bi"))
        .withColumn("_bj", F.explode(F.expr(f"sequence(0, {k_hashes - 1})")))
        .withColumn(_STAGE, F.md5(F.concat_ws(":", F.col("_bi"), F.col("_bj"))))
    )
    pos = F.expr(
        f"((({sqlgen.hexfold_i64(_STAGE)}) % {m_bits}) + {m_bits}) % {m_bits}"
    )
    return (
        staged.withColumn("_bpos", pos.cast("long"))
        .select(
            *keep,
            "_bj",
            F.expr(f"_bpos div {_WORD_BITS}").cast("long").alias("_bword"),
            (F.col("_bpos") % _WORD_BITS).cast("int").alias("_bbit"),
        )
    )


def bloom_build(
    items: DataFrame,
    item_col: str,
    m_bits: int,
    k_hashes: int = 4,
) -> DataFrame:
    """Build the packed bitmap: ``(word long, bits long)`` with one row per
    63-bit word that has at least one set bit — ≤ ``ceil(m_bits / 63)``
    rows however many items went in.  Inserting the same item twice is a
    no-op (``bit_or`` is idempotent), so build and any later merge are
    trivially re-runnable.

    Scale shape: map-side probe explode (``k_hashes`` rows per item), one
    partially-aggregated ``bit_or`` group-by onto the bounded word space.
    """
    _validate(m_bits, k_hashes)
    pos = _positions(items, item_col, m_bits, k_hashes, keep=[])
    return (
        pos.groupBy(F.col("_bword").alias("word"))
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), _bbit))")
            .cast("long")
            .alias("bits")
        )
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    item_col: str,
    m_bits: int,
    k_hashes: int = 4,
    id_cols: list[str] | None = None,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Append ``flag_col`` (long 0/1) to ``df``: 1 iff every probed bit of
    the row's item is set in ``bloom`` (built with the SAME ``m_bits`` /
    ``k_hashes`` — the caller owns geometry agreement; the persistent index
    face threads it through a validated meta).  Zero false negatives: an
    inserted item always flags 1.

    ENTIRELY map-side: each of the ``k_hashes`` probes is its own staged
    md5 column plus a broadcast-hash-join against the bounded word table
    (≤ ``ceil(m_bits / 63)`` rows), and the flag is the bitwise AND of the
    per-probe bits — no explode, no re-aggregation, no shuffle of the
    probed frame at all.  ``k_hashes`` broadcast joins of one tiny table
    beat one shuffle of the corpus at any scale (the map-side-probe shape
    the filter exists for).

    ``id_cols`` is retained for call-shape compatibility and validated
    when given, but the flag is computed per ROW, so no uniqueness
    requirement applies.
    """
    _validate(m_bits, k_hashes)
    if id_cols:
        for c in id_cols:
            if c not in df.columns:
                raise ValueError(f"id column {c!r} not in the probed frame")
    if flag_col in df.columns:
        raise ValueError(f"output column {flag_col!r} already exists on the input")
    if _STAGE in df.columns:
        raise ValueError(f"column name {_STAGE!r} is reserved by the bloom operators")
    # the full per-probe temporary namespace, not just _STAGE/flag_col: an
    # input frame already carrying e.g. `_bhit0` would make the probe join
    # ambiguous or silently corrupt the flag (ADVICE r12)
    reserved = {
        f"{p}{j}"
        for j in range(k_hashes)
        for p in ("_bpos", "_bword", "_bbit", "_bhit", "_bw", "_bb")
    }
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"column names {clash} are reserved by bloom_probe's per-probe "
            "temporaries; rename them on the input"
        )
    item = F.coalesce(F.col(item_col).cast("string"), F.lit(""))
    out = df
    hits = []
    for j in range(k_hashes):
        out = out.withColumn(
            _STAGE, F.md5(F.concat_ws(":", item, F.lit(str(j))))
        )
        pos = F.expr(
            f"((({sqlgen.hexfold_i64(_STAGE)}) % {m_bits}) + {m_bits}) % {m_bits}"
        )
        out = (
            out.withColumn(f"_bpos{j}", pos.cast("long"))
            .drop(_STAGE)
            .withColumn(f"_bword{j}", F.expr(f"_bpos{j} div {_WORD_BITS}"))
            .withColumn(
                f"_bbit{j}", (F.col(f"_bpos{j}") % _WORD_BITS).cast("int")
            )
            .drop(f"_bpos{j}")
        )
        side = F.broadcast(
            bloom.select(
                F.col("word").alias(f"_bw{j}"), F.col("bits").alias(f"_bb{j}")
            )
        )
        out = out.join(
            side, F.col(f"_bword{j}") == F.col(f"_bw{j}"), "left"
        ).drop(f"_bword{j}", f"_bw{j}")
        out = out.withColumn(
            f"_bhit{j}",
            F.expr(
                f"(shiftright(coalesce(_bb{j}, CAST(0 AS BIGINT)), _bbit{j}) & 1)"
            ).cast("long"),
        ).drop(f"_bb{j}", f"_bbit{j}")
        hits.append(f"_bhit{j}")
    flag = F.expr(" & ".join(hits)).cast("long")
    return out.withColumn(flag_col, flag).drop(*hits)


# ---------------------------------------------------------------------------
# Persistent face: build / load / query / append (+ streaming sibling in
# streaming/bloom_index_stream.py) — the dedup/text/ann/dhash index
# convention: compact derived table + a validated one-row meta, geometry
# always read back from the meta so a probe can never disagree with the
# build.
# ---------------------------------------------------------------------------

BLOOM_INDEX_FORMAT_VERSION = 1


def _write_meta(spark, path: str, meta: dict) -> None:
    from tikv_data_compare_spark.functions.fsutil import swap_commit

    swap_commit(
        spark.createDataFrame([tuple(meta.values())], list(meta.keys())),
        f"{path}/meta",
        coalesce=1,
    )


def build_bloom_index(
    items: DataFrame,
    path: str,
    item_col: str,
    m_bits: int,
    k_hashes: int = 4,
    extra_meta: dict | None = None,
) -> dict:
    """Persist the packed bitmap plus its geometry under ``path``.  The
    on-disk artifact is ≤ ``ceil(m_bits / 63)`` rows — FIXED size however
    large the inserted set — which is the whole point: ship a corpus-sized
    blocklist as a few-MB parquet.  ``n_items`` records the count of
    distinct item strings inserted (observability; the filter itself is
    insert-idempotent).  ``extra_meta`` rides in the same meta swap (the
    streaming-watermark convention)."""
    from tikv_data_compare_spark.functions.fsutil import swap_commit

    _validate(m_bits, k_hashes)
    spark = items.sparkSession
    swap_commit(bloom_build(items, item_col, m_bits, k_hashes), f"{path}/words")
    n = int(
        items.select(
            F.coalesce(F.col(item_col).cast("string"), F.lit("")).alias("_i")
        ).distinct().count()
    )
    meta = {
        "version": BLOOM_INDEX_FORMAT_VERSION,
        "m_bits": int(m_bits),
        "k_hashes": int(k_hashes),
        "n_items": n,
        **(extra_meta or {}),
    }
    _write_meta(spark, path, meta)
    return meta


def load_bloom_index(spark, path: str):
    """Reopen a persisted filter: ``(words DataFrame, meta dict)``.  Refuses
    a foreign format version or an inconsistent geometry, so bits of
    unknown provenance never silently probe."""
    rows = spark.read.parquet(f"{path}/meta").collect()
    if len(rows) != 1:
        raise ValueError(f"bloom index at {path!r} has a malformed meta table")
    meta = rows[0].asDict()
    if meta.get("version") != BLOOM_INDEX_FORMAT_VERSION:
        raise ValueError(
            f"bloom index format version {meta.get('version')} != supported "
            f"{BLOOM_INDEX_FORMAT_VERSION}"
        )
    m, k = meta.get("m_bits"), meta.get("k_hashes")
    try:
        _validate(int(m), int(k))
    except (TypeError, ValueError):
        raise ValueError(
            f"bloom index at {path!r} has inconsistent geometry: "
            f"m_bits={m!r}, k_hashes={k!r} — refusing to probe bits of "
            "unknown provenance"
        ) from None
    return spark.read.parquet(f"{path}/words"), meta


def query_bloom_index(
    df: DataFrame,
    path: str,
    item_col: str,
    id_cols: list[str] | None = None,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Probe a batch against the stored filter — geometry comes from the
    validated meta, never from the caller, so a batch can never be hashed
    differently from the corpus it probes (the index-family contract)."""
    words, meta = load_bloom_index(df.sparkSession, path)
    return bloom_probe(
        df, words, item_col, int(meta["m_bits"]), int(meta["k_hashes"]),
        id_cols=id_cols, flag_col=flag_col,
    )


def append_to_bloom_index(
    items: DataFrame,
    path: str,
    item_col: str,
    extra_meta: dict | None = None,
) -> dict:
    """OR a batch into the stored bitmap: build the batch's words at the
    meta geometry, union with the stored words, ``bit_or`` per word, swap.
    Work is batch-sized plus the BOUNDED stored table (≤ ceil(m/63) rows) —
    never corpus-sized; re-appending the same items is a bitmap no-op
    (``n_items`` adds the batch's distinct count, an upper bound under
    cross-batch overlap — documented observability, not a correctness
    input).  The swap is atomic (write-then-rename), so a concurrent query
    sees the old or the new bitmap, never a half-OR."""
    from tikv_data_compare_spark.functions.fsutil import swap_commit

    spark = items.sparkSession
    words, meta = load_bloom_index(spark, path)
    m, k = int(meta["m_bits"]), int(meta["k_hashes"])
    batch = bloom_build(items, item_col, m, k)
    merged = (
        words.unionByName(batch)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").cast("long").alias("bits"))
    )
    swap_commit(merged, f"{path}/words")
    n_new = int(
        items.select(
            F.coalesce(F.col(item_col).cast("string"), F.lit("")).alias("_i")
        ).distinct().count()
    )
    out = {**meta, "n_items": int(meta["n_items"]) + n_new, **(extra_meta or {})}
    _write_meta(spark, path, out)
    return out
