"""Deduplication operators for training-data pipelines.

Grounded in the engine's comparison machinery (exact dedup ≍ self-diff on a
content hash; near-dup ≍ approximate diff — SURVEY.md §2.7) and designed for
100 TB shapes:

- exact:   one groupBy on a 60-bit content hash (partial agg, one shuffle).
- minhash: signatures are computed ENTIRELY map-side with array
  higher-order functions (``transform`` + ``array_min`` over the per-doc
  shingle array — zero shuffle; the r6 explode→distinct→groupBy shape
  shuffled O(total shingles) rows twice before the LSH join even started).
  Candidates then meet in the LSH *band equi-join* — a shuffle on
  (band, hash), never a cartesian product.
- simhash: per-bit majority computed map-side over the token array
  (``aggregate`` per bit — zero shuffle), pairs via 8-bit band equi-join +
  hamming filter.
- jaccard: exact verification restricted to LSH candidates —
  ``array_intersect`` on the two docs' shingle arrays after joining the
  (small, typically broadcast) candidate set against the per-doc arrays;
  the corpus-wide exploded-shingle shuffle of the r6 shape is gone.

Docs are identified by ``id_col`` and assumed unique per row (the fixture
tables and every pipeline caller guarantee this; the r6 explode+groupBy
shape would have silently merged duplicate ids instead).

The minhash/simhash/jaccard operators take ``algo`` (exact dedup is
md5-only — its content hash must stay oracle-checkable):

- ``md5i64`` (default): cross-engine md5-fold (functions/sqlgen.py) — every
  query is DuckDB-oracle checkable bit-for-bit.
- ``xxhash64``: Spark's built-in JVM hash — same plan shape, no md5/hexfold
  expression tree, ~3-5× faster; the throughput path (bench.py uses it),
  mirroring checksum.py's algo switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tikv_data_compare_spark.functions import sqlgen

H30_MASK = (1 << 30) - 1

ALGOS = ("md5i64", "xxhash64")


def _check_algo(algo: str) -> None:
    if algo not in ALGOS:  # mirror checksum._with_hash: typos must not silently fall back
        raise ValueError(f"unknown algo {algo!r}; expected one of {ALGOS}")


def _minhash_constants():
    from tikv_data_compare_spark.queries import MINHASH_P, MINHASH_PERMS

    return MINHASH_PERMS, MINHASH_P


def minhash_perms(n: int) -> list[tuple[int, int]]:
    """First ``n`` (a, b) MinHash permutation coefficients.

    The first 8 are the frozen ``MINHASH_PERMS`` constants (every existing
    signature, oracle and persisted band table is denominated in them);
    beyond 8 the sequence extends deterministically from two public
    multiplicative-hash primes (Knuth 2654435761, xxhash 2246822519) mod
    ``MINHASH_P`` — same (a·h + b) % P family, reproducible in any engine,
    no RNG.  Geometry-parameterized callers (dedup_index with r·b > 8)
    depend on this determinism: an index built today must produce the same
    band keys when queried by a later session.
    """
    perms, p = _minhash_constants()
    if n <= len(perms):
        return list(perms[:n])
    out = list(perms)
    for i in range(len(out), n):
        a = ((2654435761 * (i + 1) + 1) % p) or 1
        b = (2246822519 * (i + 1) + 7) % p
        out.append((a, b))
    return out


def exact_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-duplicate groups by content hash: (content_id, keep_doc_id, n_dups)."""
    hashed = df.withColumn("_m", F.md5(F.col(text_col))).withColumn(
        "content_id", F.expr(sqlgen.hexfold_i64("_m")).cast("long")
    )
    return hashed.groupBy("content_id").agg(
        F.min(id_col).cast("long").alias(f"keep_{id_col}"),
        F.count(F.lit(1)).cast("long").alias("n_dups"),
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative row (min id) per exact content group."""
    keep = exact_groups(df, id_col, text_col).select(
        F.col(f"keep_{id_col}").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def shingle_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc DISTINCT word-3-shingle array ``_sh`` (whole text when < 3
    tokens) — the map-side representation every minhash/jaccard stage reads.

    Shingles, not words: with a small vocabulary, word *sets* of long docs
    converge to the whole vocabulary and word-minhash collides on nearly
    every pair; 3-gram sequences stay diverse (standard shingling).

    ``split(text)`` is hoisted into a projected ``_toks`` column so the
    tokenization runs once per row, not 5× inside the shingle expression.
    One (id, array) row per doc — no explode, so downstream signature /
    size / intersection math stays shuffle-free.  The source is widened via
    :func:`session.scale_out` first: all the shingle/hash CPU now runs in
    the SCAN stage, and a compact parquet source can under-split it
    (cluster no-op; see scale_out's doc).
    """
    from tikv_data_compare_spark.session import scale_out

    df = scale_out(df, key=id_col)
    toks = df.select(
        F.col(id_col),
        F.col(text_col).alias("_txt"),
        F.split(F.col(text_col), " ").alias("_toks"),
    )
    return toks.select(
        id_col,
        F.expr(
            "array_distinct(CASE WHEN size(_toks) >= 3 THEN "
            "transform(sequence(0, size(_toks) - 3), "
            "i -> concat_ws(' ', _toks[i], _toks[i+1], _toks[i+2])) "
            "ELSE array(_txt) END)"
        ).alias("_sh"),
    )


def _hashed_shingles(arrays: DataFrame, algo: str) -> DataFrame:
    """(id…, `_hs` array<long>): 30-bit hash of each shingle, map-side.

    md5 path stages the md5 through an inner ``transform`` so the 30×
    textual repetition in :func:`sqlgen.hexfold_i64` folds an
    already-computed lambda variable, not 30 fresh md5 calls (the same
    staging discipline as the projected-column rule in sqlgen).

    A frame that already carries ``_hs`` (a cached
    :func:`hashed_shingle_arrays`) passes through untouched — pipelines
    cache the hashes once instead of recomputing the md5 fold in every
    branch that reads the signatures.
    """
    _check_algo(algo)
    if "_hs" in arrays.columns:
        return arrays
    if algo == "xxhash64":
        expr = f"transform(_sh, s -> xxhash64(s) & {H30_MASK})"
    else:
        expr = (
            f"transform(transform(_sh, s -> md5(s)), "
            f"m -> ({sqlgen.hexfold_i64('m')}) & {H30_MASK})"
        )
    return arrays.withColumn("_hs", F.expr(expr))


def hashed_shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, algo: str = "md5i64"
) -> DataFrame:
    """(id, `_sh`, `_hs`): the cacheable projection a composed near-dup
    pipeline wants — raw distinct-shingle strings (for the exact-Jaccard
    verify) plus their 30-bit hashes (for the signatures), computed once.
    Pass it via ``shingles=``; the signature path detects the ``_hs``
    column and skips re-hashing, so a pipeline whose candidate generation
    reads the signatures from two join branches hashes each shingle once
    per corpus, not once per branch."""
    return _hashed_shingles(shingle_arrays(df, id_col, text_col), algo)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    algo: str = "md5i64",
    shingles: DataFrame | None = None,
    n_perms: int | None = None,
) -> DataFrame:
    """MinHash signature of each document's 3-shingle set — 8 frozen
    permutations by default; ``n_perms`` widens/narrows via
    :func:`minhash_perms` for geometry-parameterized callers.

    Entirely map-side: each permutation's min is ``array_min`` over a
    ``transform`` of the per-doc hashed-shingle array — no explode, no
    distinct, no groupBy.  (Min over the distinct shingle set equals min
    over the multiset, so sharing the ``array_distinct`` arrays with the
    jaccard stage is free.)

    ``shingles`` lets a pipeline pass a precomputed (typically cached)
    :func:`shingle_arrays` frame so composed plans tokenize the text once.
    """
    perms, p = _minhash_constants()
    if n_perms is not None:
        perms = minhash_perms(n_perms)
    if shingles is None:
        shingles = shingle_arrays(df, id_col, text_col)
    hashed = _hashed_shingles(shingles, algo)
    mins = [
        F.expr(
            f"CAST(array_min(transform(_hs, h -> "
            f"(CAST({a} AS BIGINT) * h + {b}) % {p})) AS BIGINT)"
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(perms)
    ]
    return hashed.select(id_col, *mins)


def _band_rows(sig: DataFrame, id_col: str) -> DataFrame:
    """(id, band_idx, h1, h2) rows — one per 2-perm LSH band."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.col(f"m{2 * j}").alias("h1"),
                F.col(f"m{2 * j + 1}").alias("h2"),
            )
            for j in range(4)
        ]
    )
    return sig.select(id_col, F.explode(bands).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.h1").alias("h1"), F.col("b.h2").alias("h2")
    )


def band_key_rows(
    sig: DataFrame, id_col: str, n_bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band, hkey array<long>) rows for an ARBITRARY r×b geometry —
    the general form of :func:`_band_rows`.  The band key is the exact
    array of the band's ``rows_per_band`` permutation minima (no lossy
    fold), so two documents share a band iff every row value matches —
    equi-joins on array columns hash/compare element-wise in Spark, same
    one-shuffle shape as the (band, h1, h2) fast path.

    NULL minima (NULL/empty text hashes to NULL signatures) emit NO band
    row: unlike scalar equi-join keys, ARRAY keys compare NULL elements as
    equal in Spark (``array(NULL) = array(NULL)`` is true), so without the
    filter every junk doc in the corpus would land in one giant bucket —
    O(n²) candidate pairs at scale AND a semantics divergence from the
    scalar fast path, where the NULL keys simply never join (r10 review).
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.array(
                    *[F.col(f"m{rows_per_band * j + k}") for k in range(rows_per_band)]
                ).alias("hkey"),
            )
            for j in range(n_bands)
        ]
    )
    return (
        sig.select(id_col, F.explode(bands).alias("b"))
        .select(
            id_col, F.col("b.band").alias("band"), F.col("b.hkey").alias("hkey")
        )
        .where(F.expr("NOT exists(hkey, x -> x IS NULL)"))
    )


def minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    algo: str = "md5i64",
    shingles: DataFrame | None = None,
    n_bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Candidate near-dup pairs sharing ≥1 LSH band.

    Scale shape: the self-join is an equi-join on (band, h1, h2) — each
    bucket meets in one shuffle partition; no O(n²) comparison.  Hot buckets
    (giant near-dup clusters) are the skew case AQE's skew-join handles.

    The default 4×2 geometry keeps the frozen benched/oracled plan; a
    non-default ``(n_bands, rows_per_band)`` routes through the general
    array-keyed band join (the similarity threshold of r×b LSH is
    ≈ (1/b)^(1/r), so corpus operators tune both — the dedup index exposes
    this end to end).
    """
    if (n_bands, rows_per_band) == (4, 2):
        sig = minhash_signatures(df, id_col, text_col, algo, shingles=shingles)
        b = _band_rows(sig, id_col)
        a = b.select(F.col(id_col).alias("doc_a"), "band", "h1", "h2")
        c = b.select(F.col(id_col).alias("doc_b"), "band", "h1", "h2")
        keys = ["band", "h1", "h2"]
    else:
        sig = minhash_signatures(
            df, id_col, text_col, algo, shingles=shingles,
            n_perms=n_bands * rows_per_band,
        )
        b = band_key_rows(sig, id_col, n_bands, rows_per_band)
        a = b.select(F.col(id_col).alias("doc_a"), "band", "hkey")
        c = b.select(F.col(id_col).alias("doc_b"), "band", "hkey")
        keys = ["band", "hkey"]
    return (
        a.join(c, on=keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    algo: str = "md5i64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard (scaled ×10000) for minhash candidate pairs.

    The shingle arrays feed BOTH the minhash candidates and the exact
    verify; pass a cached :func:`shingle_arrays` frame (or let this
    function build one) so the composed plan tokenizes each document once.

    Scale shape: the candidate set is small (LSH already pruned), so both
    array joins resolve to broadcast hash joins under AQE and the corpus
    arrays are probed map-side — the 100 TB shuffle cost is the candidate
    pairs, not the corpus shingles (the r6 shape shuffled the full
    exploded (doc, shingle) frame three times here).

    NULL semantics: two NULL-text docs have equal ([NULL]) shingle sets,
    so under ``xxhash64`` (whose band keys are non-null for them) they
    verify at jaccard 10000 — "identical empty content", which is the
    honest answer.  Under the default ``md5i64`` their band keys are NULL
    and they never become candidates.
    """
    if shingles is None:
        shingles = shingle_arrays(df, id_col, text_col)
    cand = minhash_pairs(df, id_col, text_col, algo, shingles=shingles)
    return jaccard_for_pairs(cand, df, id_col, text_col, shingles=shingles)


def jaccard_for_pairs(
    cand: DataFrame,
    df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard (scaled ×10000) for GIVEN candidate pairs
    ``(doc_a, doc_b)`` — the verify stage decoupled from candidate
    generation, so ANY candidate source plugs in: the batch LSH self-join
    (:func:`jaccard_pairs` delegates here), the persistent dedup index's
    new-vs-indexed candidates (operators/dedup_index.py), or a hand-picked
    audit list.

    Scale shape: identical to the composed path — the candidate set is
    already pruned, so both shingle-array joins resolve to broadcast/AQE
    hash joins and the corpus arrays are probed map-side; the shuffle cost
    is the candidate pairs, never the corpus shingles.
    """
    if shingles is None:
        shingles = shingle_arrays(df, id_col, text_col)
    sa = shingles.select(F.col(id_col).alias("doc_a"), F.col("_sh").alias("_sha"))
    sb = shingles.select(F.col(id_col).alias("doc_b"), F.col("_sh").alias("_shb"))
    return (
        cand.select("doc_a", "doc_b")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        # stage the intersection size once; referencing array_intersect in
        # both numerator and denominator would evaluate it twice per row
        .withColumn("_ni", F.expr("size(array_intersect(_sha, _shb))"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST(ROUND(10000.0 * _ni / (size(_sha) + size(_shb) - _ni)) AS BIGINT)"
            ).alias("jaccard_c"),
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str, algo: str = "md5i64") -> DataFrame:
    """32-bit SimHash over the word multiset (per-bit majority vote).

    Entirely map-side: each bit's ±1 vote sum is an ``aggregate`` fold over
    the per-doc hashed-token array — no explode, no groupBy shuffle (the
    r6 shape shuffled every word of the corpus).  NULL-text docs are
    filtered to preserve the explode shape's behavior (they produced no
    word rows, hence no signature row).
    """
    _check_algo(algo)
    from tikv_data_compare_spark.session import scale_out

    toks = scale_out(df.filter(F.col(text_col).isNotNull()), key=id_col).select(
        id_col, F.split(F.col(text_col), " ").alias("_toks")
    )
    if algo == "xxhash64":
        hashed = toks.withColumn("_hw", F.expr("transform(_toks, w -> xxhash64(w))"))
    else:
        hashed = toks.withColumn(
            "_hw",
            F.expr(
                f"transform(transform(_toks, w -> md5(w)), m -> {sqlgen.hexfold_i64('m')})"
            ),
        )
    bits = " + ".join(
        f"(CASE WHEN aggregate(_hw, 0L, (acc, h) -> acc + "
        f"(CASE WHEN (({sqlgen.shiftright('h', i, sqlgen.SPARK)}) & 1) = 1 THEN 1 ELSE -1 END)) >= 0"
        f" THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(32)
    )
    return hashed.select(id_col, F.expr(f"CAST({bits} AS BIGINT)").alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, algo: str = "md5i64"
) -> DataFrame:
    """Near-dup pairs: share ≥1 of four 8-bit simhash bands, hamming ≤ k.

    Same scale shape as minhash_pairs: band equi-join, then cheap bit_count
    verification on the candidates only.
    """
    sig = simhash(df, id_col, text_col, algo)
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.expr(f"(({sqlgen.shiftright('simhash', 8 * j, sqlgen.SPARK)}) & 255)").alias("bv"),
            )
            for j in range(4)
        ]
    )
    b = sig.select(id_col, "simhash", F.explode(bands).alias("b")).select(
        id_col, "simhash", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    a = b.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "bv")
    c = b.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "bv")
    return (
        a.join(c, on=["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_lines_per_doc: int = 1_000_000,
) -> DataFrame:
    """C4-style corpus-level line deduplication: any line that occurs more
    than once ACROSS the whole corpus is kept only at its globally-first
    occurrence (ordered by (id, position)) and dropped everywhere else —
    the stage that strips "subscribe to our newsletter" / legal-footer
    boilerplate from a web crawl (Raffel et al. 2020 dedup three-sentence
    spans the same way; here the unit is the ``sep``-delimited line).

    Returns one row per input document:
    ``(id, n_lines, n_kept, n_dropped, new_text)`` where ``new_text`` is
    the document rebuilt from its kept lines in original order (``''``
    when every line was dropped).

    Determinism: first occurrence is the minimum of the packed position
    ``id·max_lines_per_doc + pos``, so the kept/dropped verdict is a pure
    function of the corpus — no hash order, no partition layout.  Docs
    with more than ``max_lines_per_doc`` lines would alias packs and raise.

    Scale shape (100 TB): explode is map-side; the global first-occurrence
    table is ONE partial-aggregated groupBy on the 64-bit line hash (tiny
    rows: hash + packed min).  The verdict then meets the exploded frame in
    an equi-join on the hash — deliberately a join, not min-over-window:
    corpus-scale boilerplate lines are exactly the hot keys, and AQE's
    skew-join splits a hot hash across tasks where a window partition
    cannot be split.  Rebuild is one groupBy(id) with an array sort —
    bounded by the document's own line count.  Two shuffles total, no UDFs,
    no driver-side collect.  Hash collisions (xxhash64, 64-bit) would
    merge unrelated lines; at 100 TB (~2^40 distinct lines) the collision
    expectation is ~2^16 lines corpus-wide — acceptable for a boilerplate
    filter, and the same trade C4's implementation makes.
    """
    import re as _re

    occ = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1)).alias("_pos", "_line"),
    ).withColumn("_h", F.xxhash64("_line"))
    occ = occ.withColumn(
        "_packed",
        # the ELSE arm enforces the documented alias guard lazily, with no
        # extra pass: a doc exceeding max_lines_per_doc would silently pack
        # into its neighbor's position range (r10 review)
        F.expr(
            f"CASE WHEN _pos < {int(max_lines_per_doc)}L "
            f"THEN _id * {int(max_lines_per_doc)}L + _pos "
            f"ELSE CAST(raise_error(CONCAT('dedup_lines: doc ', CAST(_id AS STRING), "
            f"' exceeds max_lines_per_doc={int(max_lines_per_doc)}')) AS BIGINT) END"
        ),
    )
    first = occ.groupBy("_h").agg(F.min("_packed").alias("_first"))
    verdict = occ.join(first, "_h").withColumn("_kept", F.col("_packed") == F.col("_first"))
    # collect_list skips NULLs, so the un-kept occurrences vanish from the
    # rebuild array without a separate filter (which would lose all-dropped
    # docs from the output entirely).
    verdict = verdict.withColumn(
        "_kept_struct", F.when(F.col("_kept"), F.struct(F.col("_pos"), F.col("_line")))
    )
    per_doc = (
        verdict.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("_kept").cast("long")).cast("long").alias("n_kept"),
            F.concat_ws(
                sep,
                F.expr("transform(array_sort(collect_list(_kept_struct)), s -> s._line)"),
            ).alias("new_text"),
        )
        .withColumn("n_dropped", (F.col("n_lines") - F.col("n_kept")).cast("long"))
        .select(F.col("_id").alias(id_col), "n_lines", "n_kept", "n_dropped", "new_text")
    )
    # one row per INPUT document, as documented: split(NULL) explodes to
    # nothing, so a NULL-text doc would otherwise vanish from the rebuilt
    # corpus — data loss through `cli dedup --lines --out` (r10 review).
    # NULL text has zero lines; the rebuilt text is '' like an all-dropped
    # doc, and none of its nothing enters the corpus line pool.
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce("new_text", F.lit("")).alias("new_text"),
        )
    )


def subtract_corpus(
    df: DataFrame,
    other: DataFrame,
    content_col: str = "text",
    other_content_col: str | None = None,
    bloom_m_bits: int | None = None,
    bloom_k_hashes: int = 4,
    flag_col: str = "in_other",
) -> DataFrame:
    """Cross-corpus exact-content subtraction (r12) — the incremental-crawl
    dedup every pipeline runs between snapshots: flag each row of ``df``
    whose content already exists (verbatim) anywhere in ``other``, so the
    caller keeps ``in_other = 0``.  This is dedup BETWEEN corpora, the
    complement of ``exact_groups``' dedup within one.

    Content keys are md5 of the content string with NULL keyed as ``''``
    (the sampler-family convention — two NULL/empty docs are the same
    "content" deterministically, matching ``_with_hash``).

    Scale shape: ``other`` reduces to its DISTINCT content-hash set (one
    partial-aggregated shuffle of narrow hashes, never the payload); the
    flag is a join of ``df``'s hash against it — broadcast when small (the
    planner's call).  ``bloom_m_bits`` is the corpus-sized-``other`` mode:
    the distinct hash set ALSO builds a fixed-size Bloom bitmap
    (``operators/bloom.py``), every ``df`` row pre-screens map-side, and
    only might-contain rows enter the exact hash join — zero false
    negatives plus the exact re-check keep the result identical at any
    ``m`` (equivalence-tested), while the join input shrinks to the
    (tiny) bloom survivors.

    Returns ``df`` plus ``(flag_col long 0/1)``.
    """
    if flag_col in df.columns:
        raise ValueError(f"output column {flag_col!r} already exists on the input")
    for reserved in ("_sub_h", "_sub_hit", "_sub_might"):
        if reserved in df.columns:
            raise ValueError(
                f"column name {reserved!r} is reserved by subtract_corpus"
            )
    occ = other_content_col or content_col
    h_df = F.md5(F.coalesce(F.col(content_col).cast("string"), F.lit("")))
    h_ot = F.md5(F.coalesce(F.col(occ).cast("string"), F.lit("")))
    others = other.select(h_ot.alias("_sub_h")).distinct()
    staged = df.withColumn("_sub_h", h_df)
    if bloom_m_bits is None:
        flagged = staged.join(
            others.withColumn("_sub_hit", F.lit(1).cast("long")),
            "_sub_h", "left",
        )
        return flagged.withColumn(
            flag_col, F.coalesce("_sub_hit", F.lit(0).cast("long"))
        ).drop("_sub_h", "_sub_hit")
    from tikv_data_compare_spark.operators.bloom import bloom_build, bloom_probe

    bitmap = bloom_build(others, "_sub_h", bloom_m_bits, bloom_k_hashes)
    probed = bloom_probe(
        staged, bitmap, "_sub_h", bloom_m_bits, bloom_k_hashes,
        flag_col="_sub_might",
    )
    # exact re-check ONLY for the bloom survivors (a where-split, so
    # non-survivors never enter the join's shuffle at all — they are
    # definitively absent, zero false negatives); the split scans the
    # map-side probe twice but shuffles only the survivors
    survivors = (
        probed.where(F.col("_sub_might") == 1)
        .join(
            others.withColumn("_sub_hit", F.lit(1).cast("long")),
            "_sub_h", "left",
        )
        .withColumn(flag_col, F.coalesce("_sub_hit", F.lit(0).cast("long")))
        .drop("_sub_hit")
    )
    rest = probed.where(F.col("_sub_might") == 0).withColumn(
        flag_col, F.lit(0).cast("long")
    )
    return survivors.unionByName(rest).drop("_sub_h", "_sub_might")
