"""Corpus-curation queries: PII redaction audit and sequence packing
(SURVEY §2.11 LLM-data surface; no reference counterpart).

The fixture text is synthetic prose with no PII, so the redaction
query deterministically AUGMENTS each document with one email, one
URL, and one base58 wallet address (derived from sha256 of the text,
``translate``-mapped into the base58 alphabet) — the scrubber then
has real work to do and the oracle can verify counts, the scrubbed
length, and that zero matches survive redaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.curate import (
    ADDR_RE,
    EMAIL_RE,
    HOST_RE,
    URL_RE,
    URL_WS_RE,
    c4_line_filter,
    canonical_url,
    extract_domains,
    pack_sequences,
    pii_counts,
    redact_pii,
)
from solana_etl_pipeline_spark.llm import tokenize
from solana_etl_pipeline_spark.llm.paragraphs import dedup_paragraphs
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table

PACK_BUDGET = 512


def _augmented(docs: DataFrame) -> DataFrame:
    """Deterministically inject one email/URL/wallet per document.

    ``coalesce(text, '')`` on BOTH sides (here and ``_AUG_SQL``):
    Spark's ``concat`` is null-in-null-out while DuckDB's skips NULL
    arguments, so a null-text document would otherwise diverge on
    every column (fixture-latent today — no null texts — but the
    symmetric coalesce removes the trap)."""
    text = F.coalesce(F.col("text"), F.lit(""))
    wallet = F.translate(F.substring(F.sha2(text, 256), 1, 36), "0", "g")
    return docs.select(
        "doc_id",
        F.concat(
            text,
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via https://sol.example/tx/"),
            F.col("doc_id").cast("string"),
            F.lit(" wallet "),
            wallet,
        ).alias("text"),
    )


def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction audit: per-doc match counts, scrubbed length, and a
    zero residual-match proof on the redacted text."""
    aug = _augmented(load_table(spark, sf_dir, "documents"))
    counts = pii_counts(F.col("text"))
    redacted = redact_pii(F.col("text"))
    residual = (
        F.regexp_count(redacted, F.lit(EMAIL_RE))
        + F.regexp_count(redacted, F.lit(URL_RE))
        + F.regexp_count(redacted, F.lit(ADDR_RE))
    )
    return aug.select(
        "doc_id",
        *[expr.alias(name) for name, expr in counts.items()],
        F.length(redacted).alias("clean_len"),
        residual.alias("residual"),
    )


def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill packing of documents into 512-token packs per
    source stream."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, "doc_id", "text", budget=PACK_BUDGET, stream_col="source"
    ).select(
        F.col("stream").alias("source"), "pack_id", "n_docs", "sum_tokens"
    )


def _para_augmented(docs: DataFrame) -> DataFrame:
    """Give every fixture document three newline-delimited paragraphs
    so line-level dedup has real work on the single-line fixture:

    - para 0: the document text (the fixture's planted exact-dup
      documents make these collide corpus-wide),
    - para 1: a footer — shared boilerplate for ``doc_id % 3 == 0``
      (the RefinedWeb boilerplate case), unique otherwise,
    - para 2: a probe paragraph shared by every 50th id (~10 copies
      per group at sf0.01), so keep-first must pick the smallest
      ``doc_id`` per group.

    Plain ``%`` (not pmod) on both sides: fixture ids are
    non-negative, and Spark's ``%`` and DuckDB's ``%`` agree on the
    dividend's sign anyway."""
    text = F.coalesce(F.col("text"), F.lit(""))
    footer = F.when(
        F.col("doc_id") % 3 == 0, F.lit("shared boilerplate footer")
    ).otherwise(
        F.concat(F.lit("unique footer "), F.col("doc_id").cast("string"))
    )
    probe = F.concat(
        F.lit("probe paragraph group "),
        (F.col("doc_id") % 50).cast("string"),
    )
    return docs.select(
        "doc_id", F.concat_ws("\n", text, footer, probe).alias("text")
    )


def llm_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style exact line dedup over the augmented corpus:
    per-doc paragraph counts plus the reassembled clean text."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_paragraphs(_para_augmented(docs))


def _url_augmented(docs: DataFrame) -> DataFrame:
    """Inject deterministic URLs so the domain rollup has real work on
    the URL-free fixture: every doc links one of 7 content domains;
    every 5th doc additionally carries a tracker link (the
    blocklist-shaped skew the rollup exists to surface)."""
    text = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            text,
            F.lit(" see https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" https://tracker.example/t/"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def llm_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain link rollup over the augmented corpus: URL and
    document counts plus mean document length — the statistics a
    domain blocklist/quality pass ranks on. One explode + one groupBy
    on the host string; counts are map-side partially aggregated."""
    docs = _url_augmented(load_table(spark, sf_dir, "documents"))
    per_url = docs.select(
        "doc_id",
        "n_chars",
        F.explode(extract_domains(F.col("text"))).alias("domain"),
    )
    return per_url.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


_AUG_SQL = """
  aug AS (
    SELECT doc_id,
           concat(coalesce(text, ''), ' contact user',
                  CAST(doc_id AS VARCHAR),
                  '@example.com via https://sol.example/tx/',
                  CAST(doc_id AS VARCHAR), ' wallet ',
                  translate(substr(sha256(coalesce(text, '')), 1, 36),
                            '0', 'g')) AS text
    FROM documents)
"""

def _c4_augmented(docs: DataFrame) -> DataFrame:
    """Inject deterministic LINES so the single-line fixture gives the
    C4 filter real per-line work: every doc gets one always-good
    sentence, one too-short line, a javascript line, a curly-brace
    line; even docs a second good sentence; doc_id%4 docs a third
    (crossing the 3-line page threshold); and every 97th doc a lorem
    ipsum plant that sinks an otherwise-good page. ``concat_ws``
    skips the NULL lorem slot identically in both engines."""
    i = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.coalesce(F.col("text"), F.lit("")),
            F.concat(
                F.lit("document "),
                i.cast("string"),
                F.lit(" opens with a full proper sentence."),
            ),
            F.lit("short line."),
            F.lit("this line mentions javascript frameworks every day."),
            F.lit("code sample { embedded right here today."),
            F.when(
                i % 2 == 0,
                F.lit("an even doc earns a second proper sentence."),
            ).otherwise(F.lit("no terminal punctuation on this line")),
            F.when(
                i % 4 == 0, F.lit("a third good line appears right here.")
            ).otherwise(F.lit("tiny.")),
            F.when(
                i % 97 == 0,
                F.lit("lorem ipsum dolor sit amet consectetur adipiscing."),
            ),
        ).alias("text"),
    )


def llm_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning over the line-augmented corpus: per-page
    line counts, the kept/dropped verdict, and the full cleaned
    text."""
    docs = load_table(spark, sf_dir, "documents")
    return c4_line_filter(_c4_augmented(docs))




def _urldup_augmented(docs: DataFrame) -> DataFrame:
    """Inject one URL per doc whose CANONICAL form collides across
    ~doc_id%100 groups while the surface forms differ in scheme
    (http/https), www prefix, host case, trailing slash, and
    tracking-query suffix — the variants URL canonicalization exists
    to fold together."""
    i = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" ref "),
            F.when(i % 2 == 0, F.lit("https://")).otherwise(
                F.lit("http://")
            ),
            F.when(i % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.when(i % 11 == 0, F.lit("SITE.EXAMPLE")).otherwise(
                F.lit("site.example")
            ),
            F.lit("/page/"),
            (i % 100).cast("string"),
            F.when(i % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(i % 7 == 0, F.lit("?utm_source=feed")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )


def llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup over the augmented corpus: canonicalize each
    doc's first URL, keep the smallest doc_id per canonical URL.
    One map-side canonicalization + one groupBy on the canonical
    string — at 100 TB this is the cheap first dedup pass that runs
    before any content hashing."""
    docs = _urldup_augmented(load_table(spark, sf_dir, "documents"))
    per_doc = docs.select(
        "doc_id", canonical_url(F.col("text")).alias("canonical_url")
    ).filter(F.col("canonical_url") != "")
    return per_doc.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )



def llm_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus sources — the
    corpus-comparison statistic behind mixture design ("how much does
    web overlap with code?") and dedup-scope decisions.

    Scale posture: the corpus tokenizes once into DISTINCT
    (source, word) rows (one hash agg — vocabulary-scale output);
    the pair join runs on the word key with per-word fan-out bounded
    by #sources² (tens), then one hash agg to the ≤ sources² pair
    grid. Jaccard derives from exact BIGINTs, rounded at 1e-6."""
    docs = load_table(spark, sf_dir, "documents")
    # The per-source vocabulary feeds sizes and both pair-join
    # sides; Catalyst's ReusedExchange already dedups the repeated
    # subplan (measured: persisting regressed 0.7 s → 1.5 s at sf0.1
    # by blocking that reuse), so the frame stays unpersisted.
    sv = (
        docs.select(
            "source",
            F.explode(tokenize.words(F.col("text"))).alias("w"),
        )
        .distinct()
    )
    sizes = sv.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    x = sv.select(F.col("source").alias("src_a"), "w")
    y = sv.select(F.col("source").alias("src_b"), "w")
    inter = (
        x.join(y, "w")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(
                F.col("source").alias("src_a"), F.col("n").alias("n_a")
            ),
            "src_a",
        )
        .join(
            sizes.select(
                F.col("source").alias("src_b"), F.col("n").alias("n_b")
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


QUERIES: dict[str, QuerySpec] = {
    "llm_url_dedup": QuerySpec(
        spark=llm_url_dedup,
        oracle=r"""
            WITH aug AS (
              SELECT doc_id,
                     concat(coalesce(text, ''), ' ref ',
                       CASE WHEN doc_id % 2 = 0 THEN 'https://'
                            ELSE 'http://' END,
                       CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
                       CASE WHEN doc_id % 11 = 0 THEN 'SITE.EXAMPLE'
                            ELSE 'site.example' END,
                       '/page/', CAST(doc_id % 100 AS VARCHAR),
                       CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
                       CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed'
                            ELSE '' END) AS t
              FROM documents),
            canon AS (
              SELECT doc_id,
                     regexp_replace(regexp_replace(regexp_replace(
                       lower(regexp_extract(t, '(?i)https?://[^ \t\n\r\f]+')),
                       '^https?://(www\.)?', ''),
                       '[?#].*$', ''),
                       '/$', '') AS canonical_url
              FROM aug)
            SELECT canonical_url, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM canon
            WHERE canonical_url <> ''
            GROUP BY 1
        """,
        doc="URL-canonicalize dedup (CC-Net/RefinedWeb first pass): "
        "scheme/www/case/slash/query variants fold to one canonical "
        "URL; keep-min-id per group",
        tags=("SS2.11",),
    ),
    "llm_c4_line_filter": QuerySpec(
        spark=llm_c4_line_filter,
        oracle=r"""
            -- Line trims use trim(x, ' ') (ASCII space only) to match
            -- Spark's trim — DuckDB's bare trim strips Unicode spaces
            -- (see llm/tokenize.py). Within-line word counts collapse
            -- [ \t\f\r]+ runs, the tokenizer convention minus \n
            -- (the line separator here).
            WITH aug AS (
              SELECT doc_id,
                     concat_ws(chr(10), coalesce(text, ''),
                       'document ' || CAST(doc_id AS VARCHAR)
                         || ' opens with a full proper sentence.',
                       'short line.',
                       'this line mentions javascript frameworks every day.',
                       'code sample { embedded right here today.',
                       CASE WHEN doc_id % 2 = 0
                            THEN 'an even doc earns a second proper sentence.'
                            ELSE 'no terminal punctuation on this line' END,
                       CASE WHEN doc_id % 4 = 0
                            THEN 'a third good line appears right here.'
                            ELSE 'tiny.' END,
                       CASE WHEN doc_id % 97 = 0
                            THEN 'lorem ipsum dolor sit amet consectetur adipiscing.'
                            ELSE NULL END) AS t
              FROM documents),
            l AS (
              SELECT doc_id, t,
                     list_transform(string_split(t, chr(10)),
                                    x -> trim(x, ' ')) AS ls
              FROM aug),
            k AS (
              SELECT doc_id, ls,
                     list_filter(ls, x ->
                       len(string_split(trim(regexp_replace(x,
                             '[ \t\f\r]+', ' ', 'g'), ' '), ' ')) >= 5
                       AND regexp_matches(x, '[.!?"]$')
                       AND NOT contains(lower(x), 'javascript')
                       AND NOT contains(x, '{')) AS kept,
                     contains(lower(t), 'lorem ipsum') AS lorem
              FROM l)
            SELECT doc_id,
                   len(ls) AS n_lines,
                   len(kept) AS n_kept,
                   CAST(len(kept) >= 3 AND NOT lorem AS BIGINT) AS c4_kept,
                   array_to_string(kept, chr(10)) AS clean_text
            FROM k
        """,
        doc="C4 line-level cleaning (Raffel et al. 2020 SS2.2): terminal "
        "punctuation + min-words + javascript/brace line drops, "
        "lorem-ipsum and min-lines page drops, full clean-text parity",
        tags=("SS2.11",),
    ),
    "llm_pii_redact": QuerySpec(
        spark=llm_pii_redact,
        oracle=f"""
            WITH {_AUG_SQL},
            red AS (
              SELECT doc_id, text,
                     regexp_replace(regexp_replace(regexp_replace(text,
                       '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{URL_RE}', '<URL>', 'g'),
                       '{ADDR_RE}', '<ADDR>', 'g') AS clean
              FROM aug)
            SELECT doc_id,
                   len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
                   len(regexp_extract_all(text, '{URL_RE}')) AS n_urls,
                   len(regexp_extract_all(text, '{ADDR_RE}')) AS n_addrs,
                   len(clean) AS clean_len,
                   len(regexp_extract_all(clean, '{EMAIL_RE}'))
                     + len(regexp_extract_all(clean, '{URL_RE}'))
                     + len(regexp_extract_all(clean, '{ADDR_RE}')) AS residual
            FROM red
        """,
        doc="PII scrub audit: emails/URLs/base58 wallets -> placeholders",
        tags=("§2.11", "F5"),
    ),
    "llm_pack_sequences": QuerySpec(
        spark=llm_pack_sequences,
        oracle=f"""
            WITH toks AS (
              SELECT source, doc_id,
                     len(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' '))
                       AS tokens
              FROM documents),
            packed AS (
              SELECT source, tokens,
                     sum(tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM toks)
            SELECT source,
                   CAST(floor((cum - tokens) / {PACK_BUDGET}.0) AS BIGINT)
                     AS pack_id,
                   count(*) AS n_docs,
                   CAST(sum(tokens) AS BIGINT) AS sum_tokens
            FROM packed GROUP BY 1, 2
        """,
        doc="Contiguous-fill packing into 512-token context windows",
        tags=("§2.11",),
    ),
    "llm_paragraph_dedup": QuerySpec(
        spark=llm_paragraph_dedup,
        oracle="""
            -- keep-first line dedup. The first-occurrence key is
            -- doc_id*1000000+pos, equivalent to the engine's
            -- lexicographic min(struct(doc_id, pos)) because pos is
            -- bounded far below 1e6 (3 paragraphs per augmented doc).
            WITH aug AS (
              SELECT doc_id,
                     coalesce(text, '') || chr(10) ||
                     CASE WHEN doc_id % 3 = 0
                          THEN 'shared boilerplate footer'
                          ELSE 'unique footer ' ||
                               CAST(doc_id AS VARCHAR) END || chr(10) ||
                     'probe paragraph group ' ||
                     CAST(doc_id % 50 AS VARCHAR) AS text
              FROM documents),
            para AS (
              SELECT doc_id,
                     unnest(ps) AS para,
                     unnest(range(len(ps))) AS pos
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ps
                    FROM aug)),
            firsts AS (
              SELECT sha256(para) AS pk,
                     min(doc_id * 1000000 + pos) AS fk
              FROM para GROUP BY 1),
            verdicts AS (
              SELECT p.doc_id, p.pos, p.para,
                     (p.doc_id * 1000000 + p.pos = f.fk) AS kept
              FROM para p JOIN firsts f ON sha256(p.para) = f.pk)
            SELECT doc_id,
                   count(*) AS n_paras,
                   CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_kept,
                   coalesce(string_agg(para, chr(10) ORDER BY pos)
                              FILTER (WHERE kept), '') AS clean_text
            FROM verdicts GROUP BY doc_id
        """,
        doc="RefinedWeb-style corpus-wide keep-first line dedup",
        tags=("§2.11",),
    ),
    "llm_domain_rollup": QuerySpec(
        spark=llm_domain_rollup,
        oracle=f"""
            WITH aug AS (
              SELECT doc_id, n_chars,
                     coalesce(text, '') || ' see https://site' ||
                     CAST(doc_id % 7 AS VARCHAR) || '.example/p/' ||
                     CAST(doc_id AS VARCHAR) ||
                     CASE WHEN doc_id % 5 = 0
                          THEN ' https://tracker.example/t/' ||
                               CAST(doc_id AS VARCHAR)
                          ELSE '' END AS text
              FROM documents),
            urls AS (
              SELECT doc_id, n_chars,
                     unnest(regexp_extract_all(text, '{URL_WS_RE}'))
                       AS url
              FROM aug),
            hosts AS (
              SELECT doc_id, n_chars,
                     regexp_extract(url, '{HOST_RE}', 1) AS domain
              FROM urls)
            SELECT domain,
                   count(*) AS n_urls,
                   count(DISTINCT doc_id) AS n_docs,
                   round(avg(n_chars), 6) AS avg_chars
            FROM hosts GROUP BY 1
        """,
        doc="Per-domain URL rollup (blocklist/quality curation stats)",
        tags=("§2.11", "F5"),
    ),
    "llm_source_vocab_overlap": QuerySpec(
        spark=llm_source_vocab_overlap,
        oracle=f"""
            WITH sv AS (
              SELECT DISTINCT source,
                     unnest({tokenize.words_sql("text")}) AS w
              FROM documents),
            sizes AS (SELECT source, count(*) AS n FROM sv GROUP BY 1),
            inter AS (
              SELECT x.source AS src_a, y.source AS src_b,
                     count(*) AS n_common
              FROM sv x JOIN sv y ON x.w = y.w
              WHERE x.source < y.source
              GROUP BY 1, 2)
            SELECT i.src_a, i.src_b,
                   sa.n AS n_a, sb.n AS n_b, i.n_common,
                   round(i.n_common / (sa.n + sb.n - i.n_common), 6)
                     AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.source = i.src_a
            JOIN sizes sb ON sb.source = i.src_b
        """,
        doc="Pairwise vocabulary Jaccard between corpus sources",
        tags=("§2.11",),
    ),
}
