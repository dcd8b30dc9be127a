"""Corpus-curation operators: PII redaction and sequence packing.

Two ops every LLM training-data pipeline needs before text reaches a
tokenizer (no reference counterpart — SURVEY §2.11 surface):

- **PII redaction**: regex-scrub emails, URLs, and base58 wallet
  addresses (thematically, Solana pubkeys) to typed placeholder
  tokens. Pure ``regexp_replace`` chains — JVM-side, whole-stage
  codegen, trivially data-parallel at any scale.
- **Sequence packing**: assign documents to fixed token-budget packs
  (context windows) by contiguous fill — a running token sum per
  stream partitioned by ``source``, ``pack = floor(start / budget)``.
  One window per source key: partition-parallel, bounded state, no
  global sort. (Greedy bin-packing would need per-partition state;
  contiguous fill is the shuffle-free approximation large pipelines
  actually use for streaming corpora.)

Patterns use only RE2-compatible syntax so the DuckDB oracle can run
the exact same regexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm import tokenize

# RE2-safe patterns (work identically under Java regex and DuckDB/RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
# Base58 (no 0, O, I, l), Solana pubkey length band.
ADDR_RE = r"\b[1-9A-HJ-NP-Za-km-z]{32,44}\b"
# URL variants with the whitespace class spelled out (llm/tokenize.py's
# rule: Java and RE2 disagree on \s membership — \x0B is whitespace to
# Java but not RE2 — so cross-engine-checked extraction never uses \s).
URL_WS_RE = r"https?://[^ \t\n\r\f]+"
HOST_RE = r"https?://([^/ \t\n\r\f]+)"

_REDACTIONS = ((EMAIL_RE, "<EMAIL>"), (URL_RE, "<URL>"), (ADDR_RE, "<ADDR>"))


def extract_domains(text: Column) -> Column:
    """Array of registrable hosts for every URL in ``text`` — the
    per-document half of the domain-rollup curation pass (web-corpus
    pipelines score and blocklist by domain before any text-level
    filter runs). Pure JVM regexp expressions."""
    # idx=0 = the whole match (PySpark's default is capture group 1,
    # and URL_WS_RE deliberately has no groups; DuckDB's
    # regexp_extract_all defaults to group 0 already)
    return F.transform(
        F.regexp_extract_all(
            F.coalesce(text, F.lit("")), F.lit(URL_WS_RE), 0
        ),
        lambda url: F.regexp_extract(url, HOST_RE, 1),
    )


def redact_pii(text: Column) -> Column:
    """Replace every email/URL/base58-address with its placeholder."""
    out = text
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts on the raw text (for audit reports)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_urls": F.regexp_count(text, F.lit(URL_RE)),
        "n_addrs": F.regexp_count(text, F.lit(ADDR_RE)),
    }


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping fixed-token windows — the
    standard pre-embedding / long-context chunking pass (stride <
    chunk_size gives ``chunk_size - stride`` tokens of overlap so no
    span falls across a hard boundary).

    One generate-explode per document (start positions ``1, 1+stride,
    ...``), then pure slice/concat expressions: map-side only, no
    shuffle, output rows ≈ ``n_tokens / stride`` per document. Returns
    ``(id, chunk_id, chunk_tokens, chunk_text)``.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    words = tokenize.words(F.col(text_col))
    # Materialize the token array before the generator references it:
    # sibling columns of an explode are re-evaluated per output row,
    # so an inlined split would re-tokenize once per chunk.
    base = df.select(F.col(id_col), words.alias("_w"))
    sliced = base.select(
        F.col(id_col),
        "_w",
        F.explode(
            F.sequence(F.lit(1), F.size("_w"), F.lit(stride))
        ).alias("_start"),
    )
    chunk = F.slice(F.col("_w"), F.col("_start"), chunk_size)
    return sliced.select(
        F.col(id_col),
        ((F.col("_start") - 1) / F.lit(stride)).cast("bigint").alias(
            "chunk_id"
        ),
        F.size(chunk).cast("bigint").alias("chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 512,
    stream_col: str = "source",
) -> DataFrame:
    """Assign docs to token-budget packs by contiguous fill.

    Within each ``stream_col`` partition (ordered by ``id_col``) a
    running token total places each document in the pack where it
    starts: ``pack_id = floor((cum - tokens) / budget)``. Returns one
    row per (stream, pack) with ``n_docs`` and ``sum_tokens``.
    """
    toks = df.select(
        F.col(stream_col).alias("stream"),
        F.col(id_col).alias("doc"),
        F.size(tokenize.words(F.col(text_col))).alias("tokens"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("doc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("cum", F.sum("tokens").over(w)).withColumn(
        "pack_id",
        F.floor((F.col("cum") - F.col("tokens")) / F.lit(float(budget))).cast(
            "bigint"
        ),
    )
    return packed.groupBy("stream", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("sum_tokens"),
    )


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2,
    arXiv:1910.10683): keep a line iff, after trimming, it

    * ends in terminal punctuation (``. ! ? "``),
    * has at least ``min_words_per_line`` whitespace words,
    * does not mention ``javascript`` (case-insensitive), and
    * contains no ``{`` (the paper's code/boilerplate tell);

    then drop the whole PAGE if fewer than ``min_lines`` lines
    survive or the page contains ``lorem ipsum``.

    Output: ``(id, n_lines, n_kept, c4_kept, clean_text)`` —
    ``clean_text`` is the newline-join of the surviving trimmed lines
    (emitted for dropped pages too, so a filter audit can inspect
    what WOULD remain). Entirely built-in higher-order expressions
    over the line array: a map-only projection, no shuffle, no
    Python. The within-line word count collapses ``[ \\t\\f\\r]+``
    runs before splitting — the repo tokenizer convention restricted
    to one line (newlines are the line separator here, not word
    separators).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.transform(
        F.split(text, "\n"), lambda ln: F.trim(ln)
    )

    def _n_words(ln: Column) -> Column:
        collapsed = F.trim(F.regexp_replace(ln, "[ \\t\\f\\r]+", " "))
        return F.size(F.split(collapsed, " "))

    kept_lines = F.filter(
        lines,
        lambda ln: (_n_words(ln) >= min_words_per_line)
        & ln.rlike('[.!?"]$')
        & ~F.lower(ln).contains("javascript")
        & ~ln.contains("{"),
    )
    lorem = F.lower(text).contains("lorem ipsum")
    n_kept = F.size(kept_lines)
    return docs.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept"),
        ((n_kept >= min_lines) & ~lorem).cast("long").alias("c4_kept"),
        F.array_join(kept_lines, "\n").alias("clean_text"),
    )


def canonical_url(text: Column) -> Column:
    """Canonical form of a document's FIRST URL, for URL-level dedup
    (the CC-Net / RefinedWeb first pass: one document per canonical
    URL before any content hashing):

    lowercase → strip ``http(s)://`` → strip leading ``www.`` →
    strip ``?query`` and ``#fragment`` → strip the trailing ``/``.

    Documents with no URL yield the empty string (callers filter it
    out before grouping). Pure chained regexp/string expressions —
    map-only. The URL match uses ``URL_WS_RE`` (whitespace class
    spelled out — Java and RE2 disagree on ``\\s`` membership, the
    llm/tokenize.py rule) under ``(?i)`` so an uppercase
    ``HTTPS://`` scheme still canonicalizes (same inline-flag syntax
    in Java regex and RE2)."""
    first = F.regexp_extract(
        F.coalesce(text, F.lit("")), "(?i)" + URL_WS_RE, 0
    )
    stripped = F.regexp_replace(
        F.lower(first), r"^https?://(www\.)?", ""
    )
    no_query = F.regexp_replace(stripped, r"[?#].*$", "")
    return F.regexp_replace(no_query, "/$", "")
