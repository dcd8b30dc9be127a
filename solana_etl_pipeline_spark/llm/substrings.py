"""Exact substring-span deduplication (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499) — the token-window form that scales on Spark.

The paper removes every duplicated substring of >= 50 BPE tokens via
a corpus-wide suffix array. A suffix array is a single global sorted
structure — exactly what a shared-nothing engine should NOT build.
The standard distributed equivalent keys on fixed-width token
windows instead: a duplicated run of length L >= W contains L - W + 1
duplicated W-windows, so marking every non-first occurrence of each
W-window and merging overlapping windows per document recovers the
duplicated SPANS (to within W-1 tokens of the suffix-array answer at
the span edges) with nothing but hash aggregations and joins.

Pipeline (all DataFrame ops, shuffle keys bounded):

1. tokenize ONCE with the JVM ``tokenize.words`` convention and
   explode each document's W-token window slices — map-side,
   ~n_tokens rows per doc, entirely inside whole-stage codegen (no
   Python, no Arrow — see the step-1 comment);
2. keep-first: ONE hash aggregation on the 16-byte window digest
   computing ``min(struct(doc_id, pos))`` (map-side partial — the
   same shape as paragraph dedup's digest groupBy);
3. re-join windows to their keeper on the digest; every occurrence
   that is not the keeper is a duplicated window;
4. gaps-and-islands per document merges overlapping/adjacent
   windows into spans (window function over each doc's dup
   positions — state is per-doc, never corpus-wide);
5. each doc's merged span list (a small array — spans, not
   positions) joins back to its token array, and the survivor text
   is rebuilt in place with a position-aware array filter — no
   token-position explode, no anti-join, no reassembly sort.

At 100 TB: the heavy side (window rows) shuffles once on the digest
with map-side combining; everything after step 3 is keyed on doc_id,
and the reconstruction never re-explodes the corpus. No global sort,
no suffix array, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm import tokenize

#: window width in tokens. Lee et al. use 50 BPE tokens; the fixture
#: documents are ~50 words, so the default is sized to exercise the
#: machinery there. Production corpora raise it back toward 50.
DEFAULT_WINDOW = 20


def duplicate_span_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
) -> DataFrame:
    """Per-document duplicated-span report + deduplicated text.

    Output columns: ``(id, n_tokens, n_dup_windows, n_spans,
    dup_tokens, clean_text)`` where ``clean_text`` is the space-join
    of tokens NOT covered by any duplicated span (the keep-first
    survivor text; the whitespace-normalized join is the canonical
    form ``tokenize.words`` produces). Documents shorter than
    ``window`` tokens have no windows and pass through intact.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        tokenize.words(F.col(text_col)).alias("_ws"),
    )
    # r16 (guide §2.3 narrower types / per-task work): hash every
    # token ONCE into a parallel long array and build the window
    # digests over slices of LONGS. The previous shape sliced the
    # string array and xxhash64'd the strings per window — each token's
    # bytes were re-hashed W=20 times (once per window containing it);
    # now each token hashes once and windows hash 20 fixed-width longs.
    # Equivalence classes are identical up to xxhash64 collisions —
    # the same convention (2) the pair-digest already relies on, and
    # keep-first ties stay on (doc_id, pos), never on the hash.
    #
    # Collision-bound note (ADVICE r16): this narrows the PER-TOKEN
    # key from the token bytes to 64 bits, and both halves of the
    # 128-bit window-digest pair consume the SAME pre-hashed longs —
    # so a single token-level xxhash64 collision makes two distinct
    # windows equal under BOTH digests (the pair protects against
    # window-digest collisions, not token-hash collisions). The
    # exposure is the DISTINCT-TOKEN count, not the window count:
    # birthday-plausible only at multi-billion distinct tokens
    # (p ≈ n²/2^65 — at 10^9 distinct tokens p ≈ 3%), and the failure
    # mode is one false duplicate span, not data loss. At corpora
    # whose vocabulary approaches that range, restore per-token width
    # by carrying a second salt-differentiated token-hash array (the
    # h1/h2 convention below) and feeding the two digest halves from
    # different arrays.
    hashed = toks.select(
        "_id",
        "_ws",
        F.transform("_ws", lambda t: F.xxhash64(t)).alias("_hs"),
    )

    # 1. W-token windows, map-side and JVM-only. Window SLICES of the
    # token array are built with a higher-order transform and hashed
    # post-explode with xxhash64 directly over the array<string>
    # value — no per-window string building, no Python UDF, no Arrow
    # batch transfer. Through r11 this stage was an Arrow pandas_udf
    # emitting the joined window strings (a ~20x blow-up of the
    # corpus through Arrow buffers — the very allocation class behind
    # the r11 10 M-doc executor OOM), which also forced a SECOND,
    # Python-side tokenization and a count+crc32 drift guard so the
    # Python window positions could be trusted against the JVM token
    # array the spans are cut from (steps below). Building the slices
    # from ``_ws`` itself makes that hazard class impossible by
    # design: positions index the SAME array step 5 cuts, there is
    # exactly one tokenizer, and the guard plus its degrade path are
    # gone. Measured at the 500 k-doc rehearsal the JVM form is also
    # modestly faster (12.1 s vs 13.0 s warm for the wins stage) and
    # removes Python worker memory from the 100 TB risk budget.
    #
    # The window key is a PAIR of xxhash64s (16 bytes) rather than a
    # sha256 hex string (64 bytes): the digest is this pipeline's one
    # heavy shuffle key. Measured at the 200k-doc rehearsal: total
    # pipeline shuffle write 1219 -> 818 MB (1.49x; the digest rows
    # also carry doc_id/pos and the doc-keyed stages are unchanged,
    # so the whole-pipeline ratio is below the 4x key-width ratio).
    # The second, salt-differentiated hash keeps the effective key
    # width at 128 bits: corpus-scale window counts (>> 2^32) would
    # collide a single 64-bit key at birthday rates, while the pair
    # needs 2^64. Keep-first ties stay on (doc_id, pos), never on
    # the hash. Hashing the token ARRAY yields the same equivalence
    # classes as hashing the space-joined string (tokens are
    # whitespace-split, so they cannot contain the joiner).
    #
    # ``sequence`` guard: sequence(0, n-W) DESCENDS when n < W, so
    # short docs must short-circuit to an empty slice list (they have
    # no windows, matching the pass-through contract).
    slices = F.when(
        F.size("_hs") >= window,
        F.transform(
            F.sequence(F.lit(0), F.size("_hs") - window),
            lambda i: F.slice("_hs", i + 1, window),
        ),
    ).otherwise(F.array().cast("array<array<bigint>>"))
    wins = hashed.select(
        "_id", F.posexplode(slices).alias("pos", "_win")
    ).select(
        "_id",
        "pos",
        F.struct(
            F.xxhash64("_win").alias("h1"),
            F.xxhash64(F.lit(1), F.col("_win")).alias("h2"),
        ).alias("digest"),
    )

    # 2-3. keep-first on the digest; non-keeper occurrences are dups.
    # Only digests seen MORE THAN ONCE can mark a dup (a unique window
    # is its own keeper), so the keeper table is filtered to the
    # duplicated digests before the probe join: the join's build side
    # shrinks from |windows| to |duplicated digests| — on real corpora
    # a small fraction (the boilerplate), which Spark then broadcasts
    # (or AQE converts at runtime), sparing the window table a second
    # corpus-wide shuffle + sort. The groupBy itself stays the
    # map-side-combined hash aggregate — hot boilerplate digests
    # combine per partition, so no single reducer sees a skewed key's
    # full occurrence list (the reason a window-function min over the
    # digest partition would NOT be scale-safe here).
    keepers = (
        wins.groupBy("digest")
        .agg(
            F.min(F.struct("_id", "pos")).alias("keeper"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") > 1)
        .drop("_n")
    )
    dups = (
        wins.join(keepers, "digest")
        .filter(F.struct("_id", "pos") != F.col("keeper"))
        .select("_id", "pos")
    )

    # 4. merge overlapping/adjacent windows into spans per doc. With
    # fixed width W the span end is monotone in pos, so comparing
    # against lag(pos) + W is the full running-max-end island test.
    w_doc = Window.partitionBy("_id").orderBy("pos")
    marked = dups.withColumn(
        "_new",
        F.when(
            F.lag("pos").over(w_doc).isNull()
            | (F.col("pos") > F.lag("pos").over(w_doc) + window),
            1,
        ).otherwise(0),
    ).withColumn(
        "_isl",
        F.sum("_new").over(
            w_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # r16: per-island window counts ride the span aggregate, so
    # n_dup_windows (= total dup rows per doc = Σ island sizes) comes
    # out of the SAME chain instead of a second groupBy directly on
    # ``dups`` — which, being a second consumer of that subtree,
    # re-executed the whole window explode + keep-first join once more
    # (Spark reuses only identical exchanges, not shared lineage).
    spans = marked.groupBy("_id", "_isl").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + window).alias("e"),
        F.count(F.lit(1)).alias("_n_wins"),
    )
    # One doc-keyed aggregate carries the stats AND the span list;
    # merged islands are disjoint, so the list is small (≤ spans per
    # doc, never corpus-sized).
    span_agg = spans.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("dup_tokens"),
        F.sum("_n_wins").alias("n_dup_windows"),
        F.collect_list(F.struct("s", "e")).alias("_spans"),
    )

    # 5. survivors: token positions not covered by any span —
    # evaluated IN PLACE with a position-aware array filter against
    # the doc's span list. The earlier formulation exploded every
    # token position, anti-joined the covered positions, and
    # reassembled with a collect_list sort: three corpus-wide
    # shuffles of the widest rows in the pipeline just to drop a few
    # slices. The span test is per-token × per-span (spans per doc
    # are few after island-merge), runs inside whole-stage codegen,
    # and everything after the keep-first join stays doc-keyed. Span
    # positions index ``_ws`` itself (the windows were sliced from
    # it), so the cut needs no cross-tokenizer guard.
    kept_tokens = F.filter(
        "_ws",
        lambda tok, i: ~F.exists(
            "_spans", lambda sp: (i >= sp["s"]) & (i < sp["e"])
        ),
    )
    return (
        toks.join(span_agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.size("_ws").alias("n_tokens"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.when(
                F.col("_spans").isNotNull(),
                F.concat_ws(" ", kept_tokens),
            )
            .otherwise(F.concat_ws(" ", "_ws"))
            .alias("clean_text"),
        )
    )
