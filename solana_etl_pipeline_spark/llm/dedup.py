"""Deduplication operators: exact, MinHash-LSH, SimHash.

Scale design (the part that matters at 100 TB):

- **Exact** dedup is one hash aggregate on a 256-bit content digest —
  shuffle is proportional to distinct contents, never all-pairs.
- **MinHash near-dup** is the banded-LSH construction (Broder '97;
  Leskovec/Rajaraman/Ullman ch.3): shingle → k min-hash permutations →
  b bands of r rows → exact-match bucket join on (band, band-hash).
  Candidate generation is a self-equi-join on bucket keys — the only
  quadratic step is *within* a bucket, which is the whole point.
  NEVER an all-pairs cross join.
- **SimHash** (Charikar '02): 64-bit signature whose per-bit sign is
  the weighted majority of token-hash bits; near-dups have small
  Hamming distance. Candidates come from exact-match joins on 16-bit
  signature bands (Hamming ≤ 3 ⇒ at least one of 4 bands identical).

All signature math is built-in integer/array expressions — JVM-side,
codegen'd, no Python in the hot path.

Caching contract: the pair generators (`minhash_near_dup_pairs`,
`ngram_jaccard_for_pairs`, `embedding_near_dup_pairs`,
`simhash_candidate_pairs`) ``persist()`` their signature/shingle
intermediates because each feeds 2-3 plan branches. The returned
DataFrames are lazy — unpersisting before return would just recompute
the intermediate once per branch — so by default the cache is scoped to
the SparkSession. Long-lived sessions have two cleanup options:

- wrap the *consume* (build + action) in :func:`dedup_cache_scope`,
  which unpersists everything those calls pinned when the block exits;
- or ``spark.catalog.clearCache()`` between runs (``bench.py`` does,
  per query).

At cluster scale you'd write the signature table out once and re-read
it instead (that is what ``llm/incremental.py`` does).
"""

from __future__ import annotations

import contextlib
import threading
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm import tokenize

#: Active cache scopes (innermost last). Module-level because the pair
#: generators are plain functions; a scope collects every DataFrame
#: they persist so the context manager can release them deterministically.
#: THREAD-LOCAL stack: with a plain module global, a scope opened on
#: one thread would capture persists made concurrently by another
#: (e.g. a parallel query harness sharing the session) and blocking-
#: unpersist them mid-flight on exit.
_CACHE_SCOPES = threading.local()


def _scope_stack() -> "list[list[DataFrame]]":
    stack = getattr(_CACHE_SCOPES, "stack", None)
    if stack is None:
        stack = _CACHE_SCOPES.stack = []
    return stack


def _scoped_persist(df: DataFrame, eager: bool = False) -> DataFrame:
    """``persist()`` that registers with the innermost active
    :func:`dedup_cache_scope` ON THIS THREAD (no-op registration
    outside a scope — session-scoped cache, see the module
    docstring).

    ``eager=True`` materializes the cache (one ``count()``) before
    returning. Use it when the persisted frame fans out into
    CONCURRENTLY-SCHEDULED stages of the same job — e.g. both sides
    of a self-join, or the ``sig_a``/``sig_b`` legs of a pair
    re-join. ``persist()`` alone is lazy, and Spark schedules
    independent stages in parallel, so every cold-cache consumer
    stage races to compute the same partitions and an expensive
    upstream (the Arrow signature UDF) runs once PER RACING STAGE
    instead of once: the r11 third-decade decomposition measured the
    integrated survivors pipeline at ~2× the sum of its
    barrier-separated stages (680 s vs ~350 s at 10 M docs) from
    exactly this. The eager count costs one extra scan when there is
    a single consumer — only set it at known fan-out sites.

    Each eager count is also a serial JOB BARRIER, and at fixture
    scale the barriers cost more than the races they prevent: an
    interleaved sf0.1 A/B on `llm_minhash_near_dup` measured eager on
    ALL four of its persists at min 2.80 s vs 2.45 s lazy (+14%).
    Set eager only where the cached plan is itself expensive (the
    Arrow shingle/signature UDFs, the embedding sign projections) —
    cheap tables derived from an already-warm cache (band
    projections, the broadcast-tagged split) stay lazy: a racing
    stage recomputing them re-reads the warm upstream cache, which
    is a map, not a second UDF pass.
    """
    df = df.persist()
    stack = _scope_stack()
    if stack:
        stack[-1].append(df)
    if eager:
        df.count()
    return df


def single_slot_persist(
    df: DataFrame, slot: "list[DataFrame]", lock
) -> DataFrame:
    """Persist a lazily-consumed internal frame with BOUNDED unscoped
    accumulation (the llm/lm.py vocab pattern, shared by any operator
    whose registry path cannot wrap its consume in a scope).

    Inside a :func:`dedup_cache_scope`: plain scoped persist — the
    scope exit releases it. Outside a scope: the previous occupant of
    ``slot`` is released FIRST, then the new frame is persisted and
    parked in the slot — release-before-persist because Spark's cache
    is keyed by analyzed-plan equality, so a plan-identical refit
    shares ONE cache entry and the reversed order would evict the
    fresh persist. Repeated unscoped calls therefore keep at most one
    stale frame cached. Two concurrent unscoped calls on different
    threads may evict each other mid-flight — a recompute-latency
    blip, not a correctness issue; scope them to avoid it.
    """
    if _scope_stack():
        return _scoped_persist(df)
    with lock:
        prev, slot[:] = slot[:], []
    for old in prev:
        old.unpersist()
    df = _scoped_persist(df)
    with lock:
        slot.append(df)
    return df


@contextlib.contextmanager
def dedup_cache_scope() -> Iterator[None]:
    """Scope the dedup family's internal caches to a block::

        with dedup_cache_scope():
            pairs = minhash_near_dup_pairs(docs, "doc_id", "text")
            result = pairs.collect()          # caches live here
        # every intermediate persisted inside the block is unpersisted

    Run ACTIONS inside the block: the returned DataFrames are lazy, so
    an action executed after exit recomputes the (now-released)
    intermediates — correct, just uncached. Scopes nest; each releases
    only its own persists. Release is ``unpersist(blocking=True)`` so
    that on exit the caches are deterministically gone (tests assert
    emptiness immediately); the eviction of a few cached signature
    tables is cheap relative to the jobs that built them.

    Scopes are per-thread: a scope never captures (or releases)
    persists made by other threads sharing the SparkSession."""
    held: list[DataFrame] = []
    stack = _scope_stack()
    stack.append(held)
    try:
        yield
    finally:
        stack.pop()
        for df in held:
            df.unpersist(blocking=True)

#: Mersenne prime 2^31-1: permutation-hash modulus (fits in a long
#: with room for a*h+b before the mod).
_P = 2_147_483_647


def content_hash(*cols: Column) -> Column:
    """256-bit content digest over the concatenated columns (with a
    field separator so ("ab","c") != ("a","bc"))."""
    return F.sha2(F.concat_ws("", *cols), 256)


def exact_dedup_groups(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """Exact duplicate groups by content hash: one row per distinct
    content with the surviving (minimum) id and the duplicate count.

    ``dropDuplicates`` gives the same survivors nondeterministically;
    min-id keep is the deterministic form an oracle can check.
    """
    return (
        df.withColumn(
            "content_hash", content_hash(*[F.col(c) for c in content_cols])
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _word_shingles(text: Column, shingle_len: int) -> Column:
    """Word n-gram shingle set (distinct, lowercase).

    Prefer :func:`shingle_sets` for DataFrame-level use: referencing
    this expression directly re-inlines the ``split`` into every
    lambda position (Catalyst only de-duplicates it across a project
    boundary), recomputing the tokenization once per shingle — a
    measured ~7× slowdown on the documents fixture.
    """
    words = tokenize.words(text)
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - shingle_len + 1, F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(words, i, shingle_len))
        )
    )


def _word_tokens(t: "str | None") -> list[str]:
    """The Python tokenization convention, shared by every Arrow text
    path (shingles here, n-grams in ``llm.textstats``). The actual
    convention — collapse whitespace runs, trim, literal-space split,
    None → ``['']`` — lives in :mod:`llm.tokenize` alongside its
    Spark-expression and DuckDB-oracle twins, so a convention change
    lands in all three engines at once."""
    return tokenize.py_words(t)


def _shingle_list(t: "str | None", shingle_len: int) -> list[str]:
    """Plain-Python shingle builder shared by the Arrow stages, pinned
    semantically identical to the expression twin
    (:func:`shingle_sets_expr`): tokenization via :func:`_word_tokens`
    (the conventions live there); ``dict.fromkeys`` keeps
    ``array_distinct``'s first-occurrence order; null text renders the
    single degenerate ``''`` shingle (greatest(NULL,1)=1 +
    concat_ws-over-NULL-slice)."""
    words = _word_tokens(t)
    n = len(words)
    if n <= shingle_len:
        return [" ".join(words)]
    return list(
        dict.fromkeys(
            " ".join(words[i : i + shingle_len])
            for i in range(n - shingle_len + 1)
        )
    )


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, shingle_len: int
) -> DataFrame:
    """(_id, _sh: array<string>) — distinct word n-gram shingles.

    Arrow-batched ``pandas_udf``: per-position shingle construction is
    one of the few places built-in expressions genuinely lose — the
    higher-order ``transform``+``slice``+``concat_ws`` twin
    (:func:`shingle_sets_expr`) evaluates interpreted closures per
    shingle position and measures 4× slower on the documents fixture
    (2.4 s vs 0.6 s for 5k docs), a gap that grows with document
    length. Semantics are pinned identical to the expression twin by
    ``tests/test_hardening.py``.
    """
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def _sh(texts: pd.Series) -> pd.Series:
        return pd.Series([_shingle_list(t, shingle_len) for t in texts])

    return df.select(
        F.col(id_col).alias("_id"), _sh(F.col(text_col)).alias("_sh")
    )


def shingle_sets_expr(
    df: DataFrame, id_col: str, text_col: str, shingle_len: int
) -> DataFrame:
    """Pure-expression twin of :func:`shingle_sets` (JVM-side, no
    Python workers) — kept as the parity reference and for clusters
    where Python worker startup outweighs the interpreted-closure cost.

    Two projections on purpose: the word split materializes once per
    row in the first, and the shingle lambda then reads the ``words``
    attribute instead of re-evaluating ``split(lower(trim(text)))``
    per shingle position (Catalyst's CollapseProject keeps multiply-
    referenced non-cheap aliases in their own project)."""
    words_df = df.select(
        F.col(id_col).alias("_id"),
        tokenize.words(F.col(text_col)).alias("_words"),
    )
    w = F.col("_words")
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(w) - shingle_len + 1, F.lit(1))
    )
    return words_df.select(
        "_id",
        F.array_distinct(
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(w, i, shingle_len))
            )
        ).alias("_sh"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_len: int = 3,
    shingles: DataFrame | None = None,
    keep_shingles: bool = False,
) -> DataFrame:
    """(id, sig: array<long>) — MinHash signature per document.

    MAP-ONLY Arrow path: one base hash per shingle (crc32 → [0, 2^31)),
    then k universal permutations ``h_i(x) = (a_i·x + b_i) mod P``
    reduced with MIN — all inside one vectorized numpy outer-product
    per document, no explode and NO SHUFFLE. The aggregate twin
    (:func:`minhash_signatures_agg`, xxhash64 base + 64 codegen
    min-aggregates) shuffles per-doc partial minima and measures ~2×
    slower at sf0.1; structural parity between the two (doc coverage,
    identical-text ⇒ identical sigs, near-dup estimates) is pinned by
    tests. Signature VALUES differ between the twins (different base
    hash) — signatures are an internal representation; anything
    persisting them must pin the implementation (see
    ``llm/incremental.py`` meta ``sig_impl``).

    Docs whose text yields no real shingle (null/empty text) get no
    signature row — same coverage as the agg twin's post-explode
    filter. ``shingles`` (a :func:`shingle_sets` result, ideally
    persisted) lets a pipeline that ALSO needs the shingle sets —
    e.g. LSH candidates followed by exact-Jaccard verify — parse and
    shingle the corpus text once instead of once per stage.
    """
    import zlib

    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    odd = np.arange(1, 2 * num_hashes, 2, dtype=np.int64)
    off = (982_451_653 * np.arange(num_hashes, dtype=np.int64)) % _P

    def _sig_of(sh: "list[str] | None") -> "np.ndarray | None":
        if sh is None:
            return None
        # drop degenerate shingles: '' (null/empty text) AND
        # spaces-only (whitespace-only text tokenizes to empty words
        # joined by ' ') — either way every such doc would share one
        # signature and pair with every other degenerate doc.
        # strip(' ') suffices: words from the \s+ split are
        # whitespace-free, so any whitespace in a shingle is the ' '
        # joiner.
        bases = np.array(
            [
                zlib.crc32(s.encode()) & 0x7FFFFFFF
                for s in sh
                if s.strip(" ")
            ],
            dtype=np.int64,
        )
        if bases.size == 0:
            return None
        return ((bases[:, None] * odd[None, :] + off[None, :]) % _P).min(
            axis=0
        )

    if shingles is not None:
        @F.pandas_udf(ArrayType(LongType()))
        def _sig(shs: pd.Series) -> pd.Series:
            return pd.Series([_sig_of(sh) for sh in shs], dtype=object)

        # keep_shingles: signatures are a pure projection of the
        # shingle frame, so carrying ``_sh`` through is a column
        # append, never a join — the fused verify pass
        # (minhash_verified_pairs) reads both from one cache.
        extra = [F.col("_sh")] if keep_shingles else []
        keyed = shingles.select(
            F.col("_id").alias(id_col),
            _sig(F.col("_sh")).alias("sig"),
            *extra,
        )
    else:
        if keep_shingles:
            raise ValueError(
                "keep_shingles requires a precomputed shingles frame"
            )
        # no shingle consumer downstream: fuse shingling + signing into
        # ONE Arrow stage (one scan, one Python round-trip)
        @F.pandas_udf(ArrayType(LongType()))
        def _sig_from_text(texts: pd.Series) -> pd.Series:
            return pd.Series(
                [_sig_of(_shingle_list(t, shingle_len)) for t in texts],
                dtype=object,
            )

        keyed = df.select(
            F.col(id_col), _sig_from_text(F.col(text_col)).alias("sig")
        )
    return keyed.filter(F.col("sig").isNotNull())


def minhash_signatures_agg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_len: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Aggregate twin of :func:`minhash_signatures` — pure-JVM: xxhash64
    base per exploded shingle, k codegen min-aggregates (map-side
    partial fold, shuffle carries per-doc minima). Kept as the
    no-Python-workers fallback and the parity reference; ~2× slower
    than the vectorized map-only path at sf0.1."""
    # explode_outer, not explode: InferFiltersFromGenerate turns inner
    # explode into a Filter(size(expr)>0) that re-inlines the whole
    # shingle expression (split included) per row — measured ~8× on
    # this step. The shingle array is never empty (greatest(...,1)
    # index floor), so outer ≡ inner here.
    shingle_df = (
        shingles
        if shingles is not None
        else shingle_sets(df, id_col, text_col, shingle_len)
    )
    shingled = shingle_df.select(
        "_id", F.explode_outer("_sh").alias("sh")
    )
    # Null/empty/whitespace-only text ⇒ a single degenerate '' or
    # spaces-only shingle (split/slice null semantics; empty words
    # joined by ' ') — drop it, or every such doc would share a
    # signature and pair with each other. trim() is exact here: words
    # from the \s+ split are whitespace-free, so any whitespace in a
    # shingle is the ' ' joiner. A filter on the *generated* column
    # does not trigger the InferFiltersFromGenerate re-inlining that
    # filtering the array expression would.
    shingled = shingled.filter(
        F.col("sh").isNotNull() & (F.trim(F.col("sh")) != "")
    )
    base = F.pmod(F.xxhash64("sh"), F.lit(_P))
    mins = [
        F.min(
            F.pmod((2 * i + 1) * base + F.lit(982_451_653) * i, F.lit(_P))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = shingled.groupBy("_id").agg(*mins)
    return sigs.select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )



def band_rows(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band_idx, band_hash): skinny LSH bucket rows from full
    MinHash signatures — one xxhash64 over each band's slice of the
    ``sig`` array.

    SINGLE SOURCE of the band-hash scheme: the incremental store
    (``llm/incremental.py``) PERSISTS these hashes in its ``bands/``
    table and probes them on later batches, so batch and incremental
    mode must always hash identically — keep every edit here (review
    r15; the signature representation has the same pin via
    ``_SIG_IMPL``)."""
    return sigs.select(
        F.col(id_col),
        F.posexplode_outer(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )

def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_len: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard ≥ threshold).

    Banded LSH: a pair collides if any band of r = k/b signature rows
    matches exactly (collision prob ≈ 1-(1-j^r)^b). Candidates come
    from a bucket equi-join; Jaccard is then *estimated* from the full
    signatures (fraction of equal entries) — no second pass over text.
    ``shingles`` forwards a precomputed :func:`shingle_sets` frame to
    the signature stage (one corpus text parse for LSH + verify).

    ``max_bucket`` bounds the quadratic worst case of the bucket
    self-join. A band bucket of size s emits s·(s-1)/2 candidate
    pairs, so ONE mega-bucket — boilerplate duplicated across
    millions of documents, the classic web-corpus pathology — turns
    the join into a job-killing O(s²) explosion no partitioning can
    save. Buckets larger than ``max_bucket`` instead emit STAR edges
    around the bucket's min id (s-1 pairs): for deduplication the
    downstream connected-components resolution sees the same
    component whenever the verify stage passes the star edges (exact
    for the mass-duplication case that creates mega-buckets, since
    every member verifies against the representative at jaccard 1.0);
    pairwise recall inside an oversize bucket is deliberately traded
    away — the same cap discipline production LSH dedups apply.
    ``None`` (default) disables the cap and keeps exact clique
    semantics; at 100 TB, set it (10³–10⁵) — the guard costs one
    map-side-combined count over the skinny band rows plus two
    broadcast probes (the oversize-bucket set is ≤ bands·n/max_bucket
    rows by counting, so the broadcast is bounded and the band table
    is never re-shuffled). Measured on an untriggered 100 k-doc run:
    ~+25% wall (interleaved A/B, min 3.9 → 4.9 s) — the price of the
    size scan — against an unbounded quadratic when the pathology
    hits.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_len, shingles=shingles
    )
    # The signature table feeds three plan branches (band explode +
    # both sides of the candidate re-join). Without materialization
    # Spark recomputes the shingle-explode + 64-way min aggregate per
    # branch — the dominant cost. Persist is the single-job form; at
    # cluster scale you'd write signatures to a table once and reuse
    # them across dedup runs.
    sigs = _scoped_persist(sigs, eager=True)

    # Band rows carry ONLY (id, band_idx, band_hash) — never the full
    # signature: the bucket join shuffles bands*|docs| skinny rows, and
    # signatures re-join only for the (few) surviving candidate pairs.
    band_entries = band_rows(sigs, id_col, bands, rows_per_band)

    if max_bucket is not None:
        # The guard adds three more consumers of the band projection
        # (size agg, anti probe, star probe) on top of the self-join's
        # two — persist the skinny band rows once instead of
        # recomputing 16 band hashes per doc per consumer (scoped,
        # same lifecycle as the sigs persist above).
        band_entries = _scoped_persist(band_entries)
        # One map-side-combined aggregate sizes every bucket; only the
        # OVERSIZE buckets (with their min-id star representative) are
        # kept and BROADCAST — there are at most bands·n/max_bucket of
        # them by counting, so the broadcast is bounded and the band
        # table itself is never re-shuffled (an equi-join split was
        # measured +65% on the untriggered path). The tiny aggregate
        # is persisted so its broadcast build never re-runs the count
        # shuffle, and ONE left-outer broadcast probe tags every band
        # row with its bucket's representative (NULL = within cap);
        # the persisted tagged table then splits into small/star by
        # filter — one join execution + cache reads instead of three
        # (anti×2 + star), which is fixed-stage overhead at fixture
        # scale and one fewer pass at any scale.
        oversize = F.broadcast(
            _scoped_persist(
                band_entries.groupBy("band_idx", "band_hash")
                .agg(
                    F.count(F.lit(1)).alias("_bsz"),
                    F.min(id_col).alias("_rep"),
                )
                .filter(F.col("_bsz") > max_bucket)
                .select("band_idx", "band_hash", "_rep")
            )
        )
        flagged = _scoped_persist(
            band_entries.join(oversize, ["band_idx", "band_hash"], "left")
        )
        small = flagged.filter(F.col("_rep").isNull()).drop("_rep")
        # oversize buckets: star around the min id — s-1 edges, never
        # s², and rep < member always, so (id_a, id_b) is ordered
        star = (
            flagged.filter(
                F.col("_rep").isNotNull() & (F.col(id_col) != F.col("_rep"))
            )
            .select(
                F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b")
            )
        )
    else:
        small = band_entries
        star = None

    left = small.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    right = small.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    pair_ids = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if star is not None:
        pair_ids = pair_ids.unionByName(star)
    pair_ids = pair_ids.dropDuplicates(["id_a", "id_b"])
    candidates = pair_ids.join(
        sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")),
        "id_a",
    ).join(
        sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")),
        "id_b",
    )

    est = (
        F.aggregate(
            F.zip_with(
                "sig_a",
                "sig_b",
                lambda x, y: F.when(x == y, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(num_hashes)
    )
    return (
        candidates.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_len: int = 3,
    est_threshold: float = 0.5,
    jaccard_threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Fused LSH-candidate + exact-verify pass: the composition
    ``minhash_near_dup_pairs → ngram_jaccard_for_pairs`` in ONE
    pipeline with HALF the candidate re-joins (r16 optimization,
    guide §2.4 "remove shuffles outright").

    The composed form joins surviving pair ids back to the signature
    table twice (est-Jaccard) and then to the shingle table twice
    (exact Jaccard) — four id-equi-joins, four exchanges of the pair
    ids. But signatures are a pure projection OF the shingle sets, so
    one persisted ``(_id, _sh, sig)`` frame serves both stages and the
    pair ids join it once per side: est and exact Jaccard evaluate in
    the same projection, and the est filter still short-circuits the
    (costlier) exact array intersection for non-candidates via
    predicate ordering. Two joins, one cache, identical output rows:
    ``(id_a, id_b, jaccard)`` with ``jaccard`` the 1e-6-rounded exact
    n-gram Jaccard, filtered at ``est_jaccard >= est_threshold`` (the
    LSH semantics) AND ``jaccard >= jaccard_threshold`` (the verify) —
    bit-identical to the composed form because both filters and both
    roundings are unchanged.

    At 100 TB the same fusion halves the number of times the pair-id
    table shuffles; the memory trade is that the verify-side cache
    carries shingle arrays alongside signatures (the composed form
    cached them in two separate tables of the same total size).
    ``max_bucket`` is the mega-bucket star cap, forwarded unchanged.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh = shingle_sets(df, id_col, text_col, shingle_len)
    # one cache, both stages: (id, sig, _sh) in a single projection of
    # the shingle frame (keep_shingles appends the column — no join).
    combined = _scoped_persist(
        minhash_signatures(
            df, id_col, text_col, num_hashes, shingle_len,
            shingles=sh, keep_shingles=True,
        ),
        eager=True,
    )
    sig_side = combined.select(F.col(id_col), "sig")

    band_entries = band_rows(sig_side, id_col, bands, rows_per_band)
    if max_bucket is not None:
        band_entries = _scoped_persist(band_entries)
        oversize = F.broadcast(
            _scoped_persist(
                band_entries.groupBy("band_idx", "band_hash")
                .agg(
                    F.count(F.lit(1)).alias("_bsz"),
                    F.min(id_col).alias("_rep"),
                )
                .filter(F.col("_bsz") > max_bucket)
                .select("band_idx", "band_hash", "_rep")
            )
        )
        flagged = _scoped_persist(
            band_entries.join(oversize, ["band_idx", "band_hash"], "left")
        )
        small = flagged.filter(F.col("_rep").isNull()).drop("_rep")
        star = (
            flagged.filter(
                F.col("_rep").isNotNull() & (F.col(id_col) != F.col("_rep"))
            )
            .select(
                F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b")
            )
        )
    else:
        small = band_entries
        star = None

    left = small.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    right = small.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    pair_ids = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if star is not None:
        pair_ids = pair_ids.unionByName(star)
    pair_ids = pair_ids.dropDuplicates(["id_a", "id_b"])

    cand = pair_ids.join(
        combined.select(
            F.col(id_col).alias("id_a"),
            F.col("sig").alias("sig_a"),
            F.col("_sh").alias("sh_a"),
        ),
        "id_a",
    ).join(
        combined.select(
            F.col(id_col).alias("id_b"),
            F.col("sig").alias("sig_b"),
            F.col("_sh").alias("sh_b"),
        ),
        "id_b",
    )
    est = (
        F.aggregate(
            F.zip_with(
                "sig_a",
                "sig_b",
                lambda x, y: F.when(x == y, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(num_hashes)
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= est_threshold)
        .withColumn("jaccard", F.round(jaccard, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_len: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard for given candidate pairs (id_a, id_b):
    |A∩B| / |A∪B| over distinct word shingles.

    This is the verify stage after any LSH candidate generator — cost
    is proportional to candidate count, never corpus²: each pair member
    carries its (distinct) shingle set once through two id-equi-joins,
    and the intersect/union counts are per-row array expressions —
    no exploded shingle shuffle, no re-aggregation.

    ``shingles`` reuses a caller-persisted :func:`shingle_sets` frame
    (the caller owns its lifecycle); otherwise shingles are computed
    and persisted here (scoped — see :func:`dedup_cache_scope`).
    """
    sets_df = (
        shingles
        if shingles is not None
        else _scoped_persist(
            shingle_sets(df, id_col, text_col, shingle_len), eager=True
        )
    )  # feeds both sides of the pair join — compute shingles once
    out = pairs.join(
        sets_df.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")),
        "id_a",
    ).join(
        sets_df.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")),
        "id_b",
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return out.select(
        "id_a", "id_b", F.round(jaccard, 6).alias("jaccard")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    n_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH buckets
    generate candidates (corpus self-join on band keys, never
    all-pairs), exact cosine verifies against ``threshold``.

    Defaults use 8-bit bands: a random (cos≈0) pair collides in a band
    with p≈0.5^8≈0.4%, while a 0.95-cosine pair (bit-match p≈0.9)
    collides in ≥1 of 4 bands with p≈0.9 — near-dup recall stays high
    while candidate volume stays ~linear in corpus size, which is the
    property that matters at scale.

    ``max_bucket`` bounds the self-join's per-bucket quadratic exactly
    like :func:`minhash_near_dup_pairs`: oversize band buckets (mass-
    duplicated embeddings — re-encoded boilerplate) emit star edges
    around the bucket's min id instead of the clique; identical
    vectors verify against the representative at cosine 1.0, so
    connected-components dedup resolves the same survivors. ``None``
    (default) keeps exact clique semantics."""
    from solana_etl_pipeline_spark.llm.similarity import (
        _as_double,
        lsh_bucket_assignments,
        pair_cosine,
    )

    buckets = lsh_bucket_assignments(emb, id_col, vec_col, n_planes, n_bands)
    # skinny band join: only (id, band_idx, band_val) shuffles — the
    # 64-double vectors would otherwise ship n_bands copies each; they
    # re-join below for just the surviving candidate pairs
    # persist: the 32 sign-projections per vector are interpreted
    # higher-order expressions — compute once, not once per join side
    bands_only = _scoped_persist(
        buckets.select(F.col(id_col), "band_idx", "band_val"), eager=True
    )
    if max_bucket is not None:
        # same star discipline as minhash_near_dup_pairs: the (few,
        # ≤ bands·n/max_bucket) oversize buckets broadcast (persisted —
        # tiny — so the probes share one count shuffle); the band
        # table is never re-shuffled. ONE left-outer broadcast probe
        # tags every band row with its bucket's representative (NULL =
        # bucket within cap), and the persisted tagged table splits
        # into small/star by filter — one join execution + cache reads
        # instead of three join executions (anti×2 + star), which is
        # fixed-stage overhead at fixture scale and one fewer pass at
        # any scale.
        oversize = F.broadcast(
            _scoped_persist(
                bands_only.groupBy("band_idx", "band_val")
                .agg(
                    F.count(F.lit(1)).alias("_bsz"),
                    F.min(id_col).alias("_rep"),
                )
                .filter(F.col("_bsz") > max_bucket)
                .select("band_idx", "band_val", "_rep")
            )
        )
        flagged = _scoped_persist(
            bands_only.join(oversize, ["band_idx", "band_val"], "left")
        )
        small = flagged.filter(F.col("_rep").isNull()).drop("_rep")
        star = (
            flagged.filter(
                F.col("_rep").isNotNull() & (F.col(id_col) != F.col("_rep"))
            )
            .select(
                F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b")
            )
        )
    else:
        small = bands_only
        star = None
    pair_ids = (
        small.select(F.col(id_col).alias("id_a"), "band_idx", "band_val")
        .join(
            small.select(F.col(id_col).alias("id_b"), "band_idx", "band_val"),
            ["band_idx", "band_val"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if star is not None:
        pair_ids = pair_ids.unionByName(star)
    pair_ids = pair_ids.dropDuplicates(["id_a", "id_b"])
    vecs = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    cand = pair_ids.join(
        vecs.select(F.col(id_col).alias("id_a"), F.col("v").alias("va")), "id_a"
    ).join(
        vecs.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb")), "id_b"
    )
    cos = pair_cosine(F.col("va"), F.col("vb"))
    return (
        cand.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash: long) — Charikar SimHash over word hashes.

    Bit i of the signature is set iff the sum over token occurrences
    of ±1 (according to bit i of the token's 64-bit hash) is positive.

    MAP-ONLY Arrow path (same rationale as :func:`minhash_signatures`):
    per-doc token counting + one vectorized bit-matrix reduction in
    numpy — no explode, no 64-aggregate shuffle. The token hash is a
    crc32 pair (high/low 32 bits, distinct salts); signature VALUES
    therefore differ from the JVM aggregate twin
    (:func:`simhash_agg`, xxhash64 base) — signatures are internal,
    and both twins' structural behavior (order-invariance, identical
    text ⇒ hamming 0, unrelated text ⇒ large hamming) is pinned by
    tests. Docs with no valid token (null/empty text) get no row, as
    in the twin's post-explode filter.
    """
    import zlib
    from collections import Counter

    import numpy as np
    from pyspark.sql.types import LongType

    shifts = np.arange(64, dtype=np.uint64)

    @F.pandas_udf(LongType())
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            # the w filter drops the degenerate '' token of
            # empty/whitespace-only text
            words = [w for w in tokenize.py_words(t) if w]
            if not words:
                out.append(None)
                continue
            cnt = Counter(words)
            toks = np.array(
                [
                    (zlib.crc32(w.encode()) << 32)
                    | zlib.crc32(b"\x01" + w.encode())
                    for w in cnt
                ],
                dtype=np.uint64,
            )
            weights = np.fromiter(
                cnt.values(), dtype=np.int64, count=len(cnt)
            )
            bits = ((toks[:, None] >> shifts[None, :]) & 1).astype(
                np.int64
            ) * 2 - 1
            sums = (bits * weights[:, None]).sum(axis=0)
            sig = 0
            for i in np.nonzero(sums > 0)[0]:
                sig |= 1 << int(i)
            if sig >= 1 << 63:
                sig -= 1 << 64  # two's-complement into Spark's long
            out.append(sig)
        return pd.Series(out, dtype=object)

    return df.select(
        F.col(id_col), _sig(F.col(text_col)).alias("simhash")
    ).filter(F.col("simhash").isNotNull())


def simhash_agg(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Aggregate twin of :func:`simhash` — pure-JVM: xxhash64 per
    exploded token, 64 conditional-sum aggregates (map-side
    combinable). Kept as the no-Python-workers fallback and the
    structural parity reference."""
    words = df.select(
        F.col(id_col).alias("_id"),
        # outer: split() never yields an empty array, and inner explode
        # would re-evaluate the split inside an inferred size()>0 filter
        F.explode_outer(tokenize.words(F.col(text_col))).alias("w"),
    ).filter(
        # null/empty/whitespace-only text tokenizes to [''] — all such
        # docs would share one signature and pair with each other.
        # Drop the degenerate token (isNotNull kept for belt-and-
        # braces). Filtering the generated column avoids the
        # InferFiltersFromGenerate split re-inlining.
        F.col("w").isNotNull() & (F.col("w") != "")
    ).withColumn("h", F.xxhash64("w"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = words.groupBy("_id").agg(*bit_sums)
    sig = None
    for i in range(64):
        term = F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select(F.col("_id").alias(id_col), sig.alias("simhash"))


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4
    16-bit pieces (pigeonhole: hamming ≤ 3 ⇒ some band equal), join on
    equal bands, verify with bit_count(xor).

    ``max_bucket`` bounds the bucket self-join's quadratic worst case
    exactly like :func:`minhash_near_dup_pairs`: band buckets larger
    than the cap emit star edges around the bucket's min id instead
    of the full clique (mass-duplicated boilerplate shares one
    signature, so every member still verifies against the
    representative at hamming 0 and connected-components dedup
    resolves the same survivors). ``None`` keeps exact clique
    semantics."""
    # persist: the 64-way conditional-sum aggregate feeds both sides of
    # the band self-join below
    sigs = _scoped_persist(simhash(df, id_col, text_col), eager=True)
    banded = sigs.select(
        id_col,
        "simhash",
        F.posexplode_outer(
            F.array(
                *[
                    F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    if max_bucket is not None:
        # size every band bucket in one map-side-combined aggregate —
        # hot buckets collapse per partition here, unlike in the
        # self-join they would feed — and BROADCAST only the oversize
        # ones (≤ bands·n/max_bucket by counting) with their min-id
        # representative (struct carries the rep's signature for the
        # star edges' verify); the banded table is never re-shuffled,
        # the tiny aggregate is persisted so its broadcast build runs
        # the count shuffle once, and ONE left-outer probe tags every
        # band row (NULL _rep = within cap) — the persisted tagged
        # table splits into small/star by filter, one join execution
        # instead of three
        oversize = F.broadcast(
            _scoped_persist(
                banded.groupBy("band_idx", "band_val")
                .agg(
                    F.count(F.lit(1)).alias("_bsz"),
                    F.min(F.struct(id_col, "simhash")).alias("_rep"),
                )
                .filter(F.col("_bsz") > max_bucket)
                .select("band_idx", "band_val", "_rep")
            )
        )
        flagged = _scoped_persist(
            banded.join(oversize, ["band_idx", "band_val"], "left")
        )
        small = flagged.filter(F.col("_rep").isNull()).drop("_rep")
        star = (
            flagged.filter(
                F.col("_rep").isNotNull()
                & (F.col(id_col) != F.col(f"_rep.{id_col}"))
            )
            .select(
                F.col(f"_rep.{id_col}").alias("id_a"),
                F.col("_rep.simhash").alias("sim_a"),
                F.col(id_col).alias("id_b"),
                F.col("simhash").alias("sim_b"),
            )
        )
    else:
        small = banded
        star = None

    left = small.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("sim_a"),
        "band_idx",
        "band_val",
    )
    right = small.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sim_b"),
        "band_idx",
        "band_val",
    )
    pairs = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "sim_a", "id_b", "sim_b")
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return (
        pairs.dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def edit_distance_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    len_bucket: int = 32,
    prefix_chars: int = 16,
    max_dist: int = 40,
) -> DataFrame:
    """Blocked Levenshtein near-duplicate pairs (``id_a < id_b``).

    Character-level complement of the shingle-based detectors above:
    catches small in-place edits (typo fixes, number swaps, template
    fills) that keep most shingles intact but also catches them when
    the documents are too short for stable MinHash signatures.

    Blocking is PART OF the operator's semantics, as with every
    candidate generator in this module: a pair is reported iff both
    docs share a ``(floor(char_length / len_bucket),
    lowercased-prefix)`` block AND their full lowercased texts are
    within ``max_dist`` edits. Near-dups that straddle a length-bucket
    boundary or differ inside the prefix are by-design misses (the
    MinHash/SimHash detectors cover those).

    Scale posture: the candidate generator is a bucket EQUI-join (no
    cartesian); per-candidate cost is bounded because Spark's
    3-argument ``levenshtein(l, r, threshold)`` runs the banded
    O(len·threshold) algorithm and bails out at ``max_dist`` instead
    of filling the full O(len²) matrix.

    Engine note (same class as the llm.tokenize lower() divergences):
    Spark's levenshtein counts CODEPOINT edits, DuckDB's counts BYTE
    edits — they agree on ASCII text (all fixture corpora) and drift
    on multi-byte characters; the oracle pairing relies on the ASCII
    fixtures, documented here like the final-sigma/dotted-I cases.
    """
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.lower(F.col(text_col)).alias("t"),
    )
    blocked = base.select(
        "id",
        "t",
        F.floor(F.length("t") / len_bucket).alias("len_b"),
        F.substring("t", 1, prefix_chars).alias("pre"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, ["len_b", "pre"])
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col("a.t"), F.col("b.t"), max_dist).cast("long"),
        )
        .filter(F.col("edit_distance") >= 0)  # threshold form: -1 = over
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "edit_distance",
        )
    )
