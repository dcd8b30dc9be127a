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

1. tokenize (shared ``llm/tokenize.py`` convention) and explode each
   document's W-token windows — map-side, ~n_tokens rows per doc;
2. keep-first: ONE hash aggregation on the 32-byte window digest
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

import pandas as pd
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
    _tokenizer=None,
) -> DataFrame:
    """Per-document duplicated-span report + deduplicated text.

    Output columns: ``(id, n_tokens, n_dup_windows, n_spans,
    dup_tokens, clean_text)`` where ``clean_text`` is the space-join
    of tokens NOT covered by any duplicated span (the keep-first
    survivor text; the whitespace-normalized join is the same
    canonical form both tokenizer twins produce). Documents shorter
    than ``window`` tokens have no windows and pass through intact.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        tokenize.words(F.col(text_col)).alias("_ws"),
    )

    # 1. W-token windows, map-side. Window STRINGS are built in an
    # Arrow-batched pandas_udf and hashed AFTER the explode on a flat
    # string column: the higher-order ``transform``+``slice``+
    # ``concat_ws`` twin evaluates interpreted closures per window
    # position (the same shape ``llm/dedup.py::shingle_sets`` measured
    # 4× slower than its Arrow twin), while xxhash64 over an exploded
    # column runs inside whole-stage codegen. Tokenization uses the
    # pinned Python twin of the ``tokenize.words`` convention
    # (``tokenize.py_words`` — twin equality enforced by the
    # whitespace-hostile fixtures), so the window grams are identical
    # to the old expression's. Docs shorter than the window produce no
    # window rows, exactly like the old ``sequence`` guard.
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
    # the hash.
    # The UDF also returns the PYTHON token count (_py_nt): window
    # positions are indices into py_words, but step 5 cuts spans out
    # of the JVM ``tokenize.words`` array — the twins are fuzz-pinned
    # equal (tests/test_properties.py), but a silent drift (a Unicode
    # lower-casing or whitespace-class edge) would shift every span
    # and corrupt clean_text rather than fail (ADVICE r9). Carrying
    # the py count lets step 5 verify both tokenizers saw the same
    # token array and degrade to NO-OP dedup (full text) on mismatch.
    # ``_tokenizer`` exists ONLY so tests can inject a deliberately
    # drifted twin and observe the degrade path — production callers
    # never pass it.
    py_tokenize = _tokenizer if _tokenizer is not None else tokenize.py_words

    # The guard hash (ADVICE r10): the count check alone misses a
    # drift that PRESERVES token count but moves a boundary (one token
    # splits while two merge). Both engines crc32 the \x1f-joined
    # token array — zlib.crc32 here, F.crc32 in step 5 — so equal
    # (count, hash) certifies the two tokenizers saw the same array
    # up to a 2^-32 collision, not just arrays of the same length.
    @F.pandas_udf("struct<nt:int, th:long, wins:array<string>>")
    def _windows(texts: pd.Series) -> pd.DataFrame:
        import zlib

        nts, ths, winss = [], [], []
        for t in texts:
            words = py_tokenize(t)
            nts.append(len(words))
            ths.append(zlib.crc32("\x1f".join(words).encode("utf-8")))
            winss.append(
                []
                if len(words) < window
                else [
                    " ".join(words[i : i + window])
                    for i in range(len(words) - window + 1)
                ]
            )
        return pd.DataFrame({"nt": nts, "th": ths, "wins": winss})

    wins = (
        docs.select(
            F.col(id_col).alias("_id"),
            _windows(F.col(text_col)).alias("_pw"),
        )
        .select(
            "_id",
            F.col("_pw.nt").alias("_py_nt"),
            F.col("_pw.th").alias("_py_th"),
            F.posexplode("_pw.wins").alias("pos", "_win"),
        )
        .select(
            "_id",
            "_py_nt",
            "_py_th",
            "pos",
            F.struct(
                F.xxhash64("_win").alias("h1"),
                F.xxhash64(F.lit(1), F.col("_win")).alias("h2"),
            ).alias("digest"),
        )
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
    # _py_nt rides only the DUP rows (a small fraction); the heavy
    # digest groupBy above prunes it (its aggregate touches only
    # digest + struct(_id, pos)), so the pipeline's one corpus-wide
    # shuffle key stays 16 bytes.
    dups = (
        wins.join(keepers, "digest")
        .filter(F.struct("_id", "pos") != F.col("keeper"))
        .select("_id", "_py_nt", "_py_th", "pos")
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
    spans = marked.groupBy("_id", "_isl").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + window).alias("e"),
        F.first("_py_nt").alias("_py_nt"),
        F.first("_py_th").alias("_py_th"),
    )
    # One doc-keyed aggregate carries the stats AND the span list;
    # merged islands are disjoint, so the list is small (≤ spans per
    # doc, never corpus-sized).
    span_agg = spans.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("dup_tokens"),
        F.collect_list(F.struct("s", "e")).alias("_spans"),
        F.first("_py_nt").alias("_py_nt"),
        F.first("_py_th").alias("_py_th"),
    )
    dup_counts = dups.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_dup_windows")
    )

    # 5. survivors: token positions not covered by any span —
    # evaluated IN PLACE with a position-aware array filter against
    # the doc's span list. The earlier formulation exploded every
    # token position, anti-joined the covered positions, and
    # reassembled with a collect_list sort: three corpus-wide
    # shuffles of the widest rows in the pipeline just to drop a few
    # slices. The span test is per-token × per-span (spans per doc
    # are few after island-merge), runs inside whole-stage codegen,
    # and everything after the keep-first join stays doc-keyed.
    kept_tokens = F.filter(
        "_ws",
        lambda tok, i: ~F.exists(
            "_spans", lambda sp: (i >= sp["s"]) & (i < sp["e"])
        ),
    )
    # Tokenizer-drift guard (ADVICE r9): span positions index the
    # PYTHON token array; the cut indexes the JVM one. The twins are
    # fuzz-pinned equal, but if they ever diverge on a doc the counts
    # differ and the spans would cut the WRONG tokens — degrade that
    # doc to no-op dedup (full text survives, stats still reported)
    # instead of silently corrupting clean_text. The crc32 of the
    # \x1f-joined token array (ADVICE r10) additionally catches
    # count-PRESERVING boundary drift (one token splits while two
    # merge): the cut applies only when both engines certify the same
    # token array, count AND content.
    spans_applicable = (
        F.col("_spans").isNotNull()
        & (F.col("_py_nt") == F.size("_ws"))
        & (
            F.col("_py_th")
            == F.crc32(F.encode(F.concat_ws("\x1f", "_ws"), "UTF-8"))
        )
    )
    return (
        toks.join(dup_counts, "_id", "left")
        .join(span_agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.size("_ws").alias("n_tokens"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.when(spans_applicable, F.concat_ws(" ", kept_tokens))
            .otherwise(F.concat_ws(" ", "_ws"))
            .alias("clean_text"),
        )
    )
