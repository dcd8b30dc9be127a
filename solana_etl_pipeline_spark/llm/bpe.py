"""Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909) — distributed the way BPE actually scales.

The insight that makes BPE 100 TB-feasible: after ONE corpus pass
builds the word-frequency VOCABULARY, every merge round operates on
vocab-sized data only (distinct words × their symbol sequences). So:

* ``bpe_fit`` — one corpus hash-aggregation to ``(word, count)``,
  then ``n_merges`` driver-loop rounds. Each round is one job over
  the vocab frame: explode adjacent symbol pairs weighted by word
  count, take the argmax pair (count, then lexicographic — the
  deterministic tie-break), and rewrite each word's symbol sequence
  with the merged pair. The merge-apply is a left-to-right scan per
  word — a tiny Arrow-batched UDF over VOCAB rows (never corpus
  rows; the one place an imperative scan genuinely beats
  higher-order expressions). The returned merge table is
  ``n_merges`` rows of driver-side metadata, exactly like
  ``kmeans_fit``'s codebook.
* ``bpe_encode`` — apply the learned merge table to any corpus:
  Arrow-batched map over documents, merges applied in training
  order. Per-token cost is O(len · n_merges) worst case with the
  standard early-exit (skip merges whose pair is absent).

Word boundaries use the repo tokenization convention
(``llm/tokenize.py``); the end-of-word marker ``</w>`` is appended as
one symbol so merges cannot cross word boundaries, per the paper.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from solana_etl_pipeline_spark.llm import tokenize

EOW = "</w>"


def _symbols(word: str) -> list[str]:
    return list(word) + [EOW]


def _merge_seq(seq: list[str], a: str, b: str) -> list[str]:
    """One left-to-right merge pass: every non-overlapping adjacent
    (a, b) becomes a+b (the paper's greedy scan)."""
    out: list[str] = []
    i = 0
    n = len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The one corpus pass: ``(word, c)`` — map-side combined."""
    return (
        docs.select(
            F.explode(tokenize.words(F.col(text_col))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bpe_fit(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    (driver-side metadata, n_merges pairs).

    Each round collects ONE row (the argmax pair) — the same bounded
    scalar-probe pattern as ``kmeans_fit``'s convergence checks. The
    vocab frame is persisted per round and replaced after the merge
    rewrite so lineage stays one-round deep.
    """
    vocab = word_frequencies(docs, text_col).withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ),
    ).persist()
    vocab.count()

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            F.posexplode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.element_at("syms", i + 1).alias("a"),
                            F.element_at("syms", i + 2).alias("b"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<a:string,b:string>>")
                )
            ).alias("_", "p"),
            "c",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("c").alias("n"))
            .orderBy(F.desc("n"), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0].n < 2:
            break  # nothing left worth merging
        a, b = top[0].p.a, top[0].p.b
        merges.append((a, b))

        @F.pandas_udf(ArrayType(StringType()))
        def _apply(sym_col: pd.Series) -> pd.Series:
            return sym_col.map(
                lambda s: _merge_seq(list(s), a, b)
            )

        new_vocab = vocab.withColumn(
            "syms", _apply(F.col("syms"))
        ).persist()
        new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with a learned merge table: ``(id, bpe_tokens,
    n_bpe_tokens)``. Arrow-batched map over documents; merges apply
    in training order with the absent-pair early exit."""
    merge_list = list(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        def enc(t):
            out: list[str] = []
            for w in tokenize.py_words(t):
                if not w:
                    continue
                seq = _symbols(w)
                for a, b in merge_list:
                    if len(seq) < 2:
                        break
                    # absent-pair early exit: scan only when a is
                    # present at all
                    if a in seq:
                        seq = _merge_seq(seq, a, b)
                out.extend(seq)
            return out

        return texts.map(enc)

    toks = _encode(F.col(text_col))
    return docs.select(
        F.col(id_col),
        toks.alias("bpe_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
    )
