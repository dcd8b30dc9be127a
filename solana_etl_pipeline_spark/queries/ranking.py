"""Ranking queries: TF-IDF top terms and BM25 keyword search
(SURVEY §2.11 LLM-data surface; no reference counterpart — the
reference's text handling stops at field extraction,
clean_data.py:92-113).

Both are fully SQL-expressible, so both carry DuckDB oracles; scores
derive from exact integer counts through mirrored expression shapes
(see llm/ranking.py) that agree to far below the 1e-4 rounding grain,
and both engines rank on the ROUNDED score with a unique tie-break
key — so a last-ulp ln() difference between java.lang.Math.log and
libm cannot flip which rows are emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from solana_etl_pipeline_spark.llm.ranking import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    inverted_index,
    pmi_bigrams,
    tfidf_top_terms,
)
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table

# Fixture-present query terms (documents use a small synthetic
# vocabulary; these three appear with differing frequencies).
BM25_QUERY = ["customer", "vector", "spark"]
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)


def llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf)."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


def llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 documents for a fixed keyword query."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_QUERY, "doc_id", "text", k=20)


POSTINGS_K = 5


def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped inverted index: per-term df / total tf / top-5 postings."""
    docs = load_table(spark, sf_dir, "documents")
    return inverted_index(docs, "doc_id", "text", postings_k=POSTINGS_K)


def llm_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by PMI (min count 5)."""
    docs = load_table(spark, sf_dir, "documents")
    return pmi_bigrams(docs, "text", min_count=5, k=20)


# coalesce mirrors the Spark side's _tokens null-text handling
_TOKS_SQL = """
  toks AS (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' ')) AS term
    FROM documents),
  toks2 AS (
    SELECT doc_id, term FROM toks
    WHERE term IS NOT NULL AND term <> '')
"""

QUERIES: dict[str, QuerySpec] = {
    "llm_tfidf_top_terms": QuerySpec(
        spark=llm_tfidf_top_terms,
        oracle=f"""
            WITH {_TOKS_SQL},
            tf AS (
              SELECT doc_id, term, count(*) AS tf
              FROM toks2 GROUP BY 1, 2),
            dfreq AS (
              SELECT term, count(DISTINCT doc_id) AS df
              FROM toks2 GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term,
                     tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0)
                       AS tfidf
              FROM tf JOIN dfreq USING (term), n),
            ranked AS (
              SELECT doc_id, term,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY round(tfidf, 4) DESC, term) AS rank,
                     tfidf
              FROM scored)
            SELECT doc_id, term, rank, round(tfidf, 4) AS tfidf
            FROM ranked WHERE rank <= 3
        """,
        doc="Top-3 TF-IDF terms per document (smoothed idf)",
        tags=("§2.11",),
    ),
    "llm_bm25_search": QuerySpec(
        spark=llm_bm25_search,
        oracle=f"""
            WITH {_TOKS_SQL},
            dl AS (
              SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY 1),
            stats AS (
              SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            qt AS (
              SELECT doc_id, term FROM toks2
              WHERE term IN ({_BM25_TERMS_SQL})),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2),
            dfreq AS (
              SELECT term, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
            contrib AS (
              SELECT tf.doc_id,
                     ln((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                       * (tf.tf * {BM25_K1 + 1.0})
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B}
                          + {BM25_B} * dl.dl / s.avgdl))
                       AS part
              FROM tf
              JOIN dfreq USING (term)
              JOIN dl USING (doc_id), stats s),
            scores AS (
              SELECT doc_id, sum(part) AS score FROM contrib GROUP BY 1),
            ranked AS (
              SELECT doc_id,
                     row_number() OVER (
                       ORDER BY round(score, 4) DESC, doc_id) AS rank,
                     score
              FROM scores)
            SELECT doc_id, rank, round(score, 4) AS bm25
            FROM ranked WHERE rank <= 20
        """,
        doc="Okapi BM25 top-20 documents for a fixed keyword query",
        tags=("§2.11",),
    ),
    "llm_inverted_index": QuerySpec(
        spark=llm_inverted_index,
        oracle=f"""
            WITH {_TOKS_SQL},
            tf AS (
              SELECT term, doc_id, count(*) AS tf
              FROM toks2 GROUP BY 1, 2),
            stats AS (
              SELECT term, count(*) AS doc_freq,
                     CAST(sum(tf) AS BIGINT) AS total_tf
              FROM tf GROUP BY 1),
            ranked AS (
              SELECT term, doc_id,
                     row_number() OVER (PARTITION BY term
                                        ORDER BY tf DESC, doc_id) AS rn
              FROM tf),
            posts AS (
              SELECT term,
                     array_to_string(list(doc_id ORDER BY rn), ',')
                       AS top_doc_ids
              FROM ranked WHERE rn <= {POSTINGS_K} GROUP BY 1)
            SELECT s.term, s.doc_freq, s.total_tf, p.top_doc_ids
            FROM stats s JOIN posts p USING (term)
        """,
        doc="Capped inverted index: df / total tf / top-5 postings per term",
        tags=("§2.11",),
    ),
    "llm_pmi_bigrams": QuerySpec(
        spark=llm_pmi_bigrams,
        oracle="""
            WITH w AS (
              SELECT string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \\t\\n\\r\\f]+', ' ', 'g'), ' '), ' ')
                AS ws
              FROM documents),
            tok AS (SELECT unnest(ws) AS t FROM w),
            toks AS (SELECT t FROM tok WHERE t <> ''),
            big0 AS (
              SELECT ws[CAST(i AS INT)] AS w1,
                     ws[CAST(i AS INT) + 1] AS w2
              FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM w)),
            big AS (SELECT w1, w2 FROM big0
                    WHERE w1 <> '' AND w2 <> ''),
            uni AS (SELECT t AS w, count(*) AS cw FROM toks GROUP BY 1),
            tot AS (
              SELECT (SELECT count(*) FROM toks) AS t_tokens,
                     (SELECT count(*) FROM big) AS b_bigrams),
            cxy AS (
              SELECT w1, w2, count(*) AS c_xy
              FROM big GROUP BY 1, 2 HAVING count(*) >= 5)
            SELECT c.w1, c.w2, c.c_xy,
                   round(ln((CAST(c.c_xy AS DOUBLE) * t.t_tokens
                             * t.t_tokens)
                          / (CAST(t.b_bigrams AS DOUBLE) * u1.cw
                             * u2.cw)), 6) AS pmi
            FROM cxy c
            JOIN uni u1 ON c.w1 = u1.w
            JOIN uni u2 ON c.w2 = u2.w
            CROSS JOIN tot t
            ORDER BY pmi DESC, c.w1, c.w2 LIMIT 20
        """,
        doc="Top-20 bigram collocations by PMI, min bigram count 5",
        tags=("§2.11",),
    ),
}
