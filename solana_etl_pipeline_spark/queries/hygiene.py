"""Corpus-hygiene queries: eval-set decontamination, repetition
rules, domain-mixture sampling, document chunking, and unigram-LM
quality scoring (SURVEY §2.11 LLM-data surface; no reference
counterpart).

Driver conventions (see ``queries/base.py``): every computed column is
aliased identically on both sides, floats are rounded to 1e-6, counts
are BIGINT on both sides. The eval split (``doc_id % 41 == 3``) and
the fixture's planted near-duplicate documents give the
decontamination flag real positives without any augmentation — the
corpus genuinely contains train docs that duplicate eval docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.curate import chunk_documents
from solana_etl_pipeline_spark.llm.decontaminate import decontaminate
from solana_etl_pipeline_spark.llm.dsir import importance_weights
from solana_etl_pipeline_spark.llm.export import assign_splits
from solana_etl_pipeline_spark.llm.lm import unigram_fit, unigram_score
from solana_etl_pipeline_spark.llm.mixture import (
    mixture_plan,
    mixture_sample,
    quota_sample,
    weighted_sample,
)
from solana_etl_pipeline_spark.llm.textstats import (
    gopher_quality_report,
    repetition_report,
)
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table
from solana_etl_pipeline_spark.llm import tokenize

# Eval split: ~2.4% of doc ids. 41 is coprime with the fixture's dup
# plant stride so the eval set contains members of cross-split
# duplicate clusters (real contamination to find).
EVAL_MOD, EVAL_REM = 41, 3
DECON_N = 5
DECON_THRESHOLD = 0.2

# Repetition flags sit at the fixture's p90/p99 so a realistic
# minority of documents trips each rule.
TOP_BIGRAM_MAX = 0.09
DUP_TRIGRAM_MAX = 0.02

MIXTURE_BUDGET = 10_000  # tokens; ~0.37 keep-rate per source at sf0.01

CHUNK_SIZE, CHUNK_STRIDE = 32, 24


def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs whose 5-gram overlap with the held-out eval
    split exceeds 20% (GPT-3/PaLM-style n-gram decontamination)."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.pmod(F.col("doc_id"), F.lit(EVAL_MOD)) == EVAL_REM
    return decontaminate(
        docs.filter(~is_eval),
        docs.filter(is_eval),
        n=DECON_N,
        threshold=DECON_THRESHOLD,
    )


def llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (non-repetition half): per-doc metrics,
    per-rule flags, and the composite verdict, at the paper's own
    bounds. Map-only projection over the shared tokenizer."""
    docs = load_table(spark, sf_dir, "documents")
    report = gopher_quality_report(F.col("text"))
    return docs.select(
        "doc_id", *[expr.alias(name) for name, expr in report.items()]
    )


def llm_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition report + `repetitive` flag."""
    docs = load_table(spark, sf_dir, "documents")
    return repetition_report(docs).withColumn(
        "repetitive",
        (F.col("top_bigram_frac") >= TOP_BIGRAM_MAX)
        | (F.col("dup_trigram_frac") >= DUP_TRIGRAM_MAX),
    )


QUOTA_K = 12


def llm_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source quota sample (min(k, n) docs per source in
    mod-prime scramble order; salted two-phase top-k, no window)."""
    docs = load_table(spark, sf_dir, "documents")
    return quota_sample(docs, "source", "doc_id", k=QUOTA_K)


WEIGHTED_K = 100


def llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Efraimidis–Spirakis sample of 100 docs with
    selection probability ∝ n_chars (quality-weighted curation)."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "doc_id", "n_chars", k=WEIGHTED_K).select(
        "doc_id", "source", "n_chars", "es_key"
    )


def llm_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 mixture plan + realized deterministic sample,
    summarized per source. The plan is computed once and reused for
    the sample (the ``plan=`` seam), so the corpus aggregates once
    per side of the audit."""
    docs = load_table(spark, sf_dir, "documents")
    plan = mixture_plan(docs, token_budget=MIXTURE_BUDGET)
    words = tokenize.words(F.col("text"))
    kept = (
        mixture_sample(docs, plan=plan)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.size(words)).cast("bigint").alias("tokens_kept"),
        )
    )
    return plan.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "tokens",
        "rate_micro",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
    )


DSIR_BUCKETS = 4096
DSIR_TOP_K = 20


def llm_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: importance-weight every non-eval document
    against the eval split as the target distribution (the same split
    the decontamination pass uses) and keep the top 20 most
    target-like — ``orderBy(desc(log_weight), doc_id).limit(k)``
    compiles to TakeOrderedAndProject, never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    is_target = F.pmod(F.col("doc_id"), F.lit(EVAL_MOD)) == EVAL_REM
    weights = importance_weights(
        docs.filter(~is_target),
        docs.filter(is_target),
        n_buckets=DSIR_BUCKETS,
    )
    return weights.orderBy(
        F.desc("log_weight"), "doc_id"
    ).limit(DSIR_TOP_K)


LM_VAL_FRAC, LM_TEST_FRAC = 0.10, 0.10
# Oracle band edges derived with the engine's int(round(...)) so a
# fraction edit can never silently diverge the two (see
# queries/export.py's note on truncation vs round).
_LM_VAL_M = int(round(LM_VAL_FRAC * 1_000_000))
_LM_TEST_M = int(round(LM_TEST_FRAC * 1_000_000))


def llm_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter, composed end-to-end: fit a
    unigram LM on the deterministic train split, score EVERY document
    (val/test docs exercise the OOV smoothing path), and tag each row
    with its split — recomputed from the id, not joined."""
    docs = load_table(spark, sf_dir, "documents")
    split_docs = assign_splits(
        docs, "doc_id", val_frac=LM_VAL_FRAC, test_frac=LM_TEST_FRAC
    )
    vocab = unigram_fit(split_docs.filter(F.col("split") == "train"))
    scored = unigram_score(docs, vocab)
    return assign_splits(
        scored, "doc_id", val_frac=LM_VAL_FRAC, test_frac=LM_TEST_FRAC
    ).select("doc_id", "split", "n_tokens", "avg_neg_logprob")


def llm_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token / stride-24 chunks, full text compared."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, chunk_size=CHUNK_SIZE, stride=CHUNK_STRIDE
    )


# Shared oracle CTE: the repo-wide tokenization convention, derived
# from its single source of truth (llm/tokenize.py) so the oracle can
# never drift from the Spark expression.
_WORDS_SQL = f"""
  w AS (
    SELECT doc_id, source,
           {tokenize.words_sql("text")} AS ws
    FROM documents)
"""


def llm_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's actual output shape (Wenzek et al. 2020,
    arXiv:1911.00359 §3): per-SOURCE head/middle/tail perplexity
    buckets. Fit the unigram LM on the train split, score every
    document, then ``ntile(3)`` within each source ordered by the
    ROUNDED score with a doc_id tie-break — both engines implement
    standard SQL ntile (early buckets absorb the remainder), so the
    assignment is deterministic and oracle-checkable. Bucket 1 =
    head (most fluent), 3 = tail. One fit aggregation, one score
    join, one window over per-source partitions."""
    docs = load_table(spark, sf_dir, "documents")
    split_docs = assign_splits(
        docs, "doc_id", val_frac=LM_VAL_FRAC, test_frac=LM_TEST_FRAC
    )
    vocab = unigram_fit(split_docs.filter(F.col("split") == "train"))
    scored = unigram_score(docs, vocab)
    w = Window.partitionBy("source").orderBy("avg_neg_logprob", "doc_id")
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "avg_neg_logprob",
            F.ntile(3).over(w).alias("ppl_bucket"),
        )
    )



QUERIES: dict[str, QuerySpec] = {
    "llm_ccnet_buckets": QuerySpec(
        spark=llm_ccnet_buckets,
        oracle=f"""
            -- Same LM recompute as llm_lm_quality_score, then
            -- standard-SQL ntile(3) per source on (rounded score,
            -- doc_id) — a total order, so bucket edges cannot flip
            -- on engine sort instability.
            WITH {_WORDS_SQL},
            split_docs AS (
              SELECT doc_id, source, ws,
                     CASE
                       WHEN ((doc_id % 1000000007) * (2654435761 % 1000000007))
                              % 1000000007 * 1000000
                            < {_LM_VAL_M}::BIGINT * 1000000007 THEN 'val'
                       WHEN ((doc_id % 1000000007) * (2654435761 % 1000000007))
                              % 1000000007 * 1000000
                            < {_LM_VAL_M + _LM_TEST_M}::BIGINT * 1000000007
                            THEN 'test'
                       ELSE 'train' END AS split
              FROM w),
            tok AS (
              SELECT doc_id, source, split, unnest(ws) AS t
              FROM split_docs),
            vocab AS (
              SELECT t, count(*) AS c FROM tok
              WHERE split = 'train' GROUP BY 1),
            tot AS (
              SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v
              FROM vocab),
            scored AS (
              SELECT t.doc_id, t.source,
                     round(avg(-ln((coalesce(vc.c, 0) + 1) * 1.0
                                   / (tot.n + tot.v))), 6)
                       AS avg_neg_logprob
              FROM tok t
              LEFT JOIN vocab vc ON vc.t = t.t
              CROSS JOIN tot
              GROUP BY 1, 2)
            SELECT doc_id, source, avg_neg_logprob,
                   CAST(ntile(3) OVER (
                     PARTITION BY source
                     ORDER BY avg_neg_logprob, doc_id) AS BIGINT)
                     AS ppl_bucket
            FROM scored
        """,
        doc="CCNet per-source head/middle/tail perplexity buckets "
        "(unigram-LM scored, deterministic ntile)",
        tags=("§2.11",),
    ),
    "llm_decontaminate": QuerySpec(
        spark=llm_decontaminate,
        oracle=f"""
            WITH {_WORDS_SQL},
            starts AS (
              SELECT doc_id, ws,
                     unnest(range(1, greatest(len(ws) - {DECON_N - 1}, 1)
                                     + 1)) AS i
              FROM w),
            grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(
                       ws[CAST(i AS INT):CAST(i AS INT) + {DECON_N - 1}],
                       ' ') AS g
              FROM starts),
            ev AS (
              SELECT DISTINCT g FROM grams
              WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
            tr AS (
              SELECT * FROM grams
              WHERE doc_id % {EVAL_MOD} <> {EVAL_REM}),
            per AS (
              SELECT tr.doc_id, count(*) AS n_grams,
                     count(ev.g) AS n_hit
              FROM tr LEFT JOIN ev ON ev.g = tr.g
              GROUP BY 1)
            SELECT doc_id, n_grams, n_hit,
                   round(n_hit * 1.0 / n_grams, 6) AS contamination,
                   round(n_hit * 1.0 / n_grams, 6) >= {DECON_THRESHOLD}
                     AS contaminated
            FROM per
        """,
        doc="Eval-set 5-gram decontamination audit (hashed-gram probe)",
        tags=("§2.11",),
    ),
    "llm_dsir_select": QuerySpec(
        spark=llm_dsir_select,
        oracle=f"""
            WITH {_WORDS_SQL},
            grams AS (
              SELECT doc_id,
                     unnest(list_concat(ws,
                       CASE WHEN len(ws) >= 2
                            THEN list_transform(range(len(ws) - 1),
                                   i -> ws[CAST(i AS INT) + 1] || ' ' ||
                                        ws[CAST(i AS INT) + 2])
                            ELSE CAST([] AS VARCHAR[]) END)) AS g
              FROM w),
            gb AS (
              SELECT doc_id,
                     ('0x' || substr(md5(g), 1, 8))::BIGINT
                       % {DSIR_BUCKETS} AS bucket,
                     doc_id % {EVAL_MOD} = {EVAL_REM} AS is_target
              FROM grams),
            tc AS (SELECT bucket, count(*) AS ct FROM gb
                   WHERE is_target GROUP BY 1),
            rc AS (SELECT bucket, count(*) AS cr FROM gb
                   WHERE NOT is_target GROUP BY 1),
            tot AS (SELECT
                      (SELECT count(*) FROM gb WHERE is_target) AS nt,
                      (SELECT count(*) FROM gb WHERE NOT is_target) AS nr),
            ratios AS (
              SELECT bucket,
                     ln((coalesce(ct, 0) + 1)
                        / (nt + {DSIR_BUCKETS}.0e0))
                     - ln((coalesce(cr, 0) + 1)
                          / (nr + {DSIR_BUCKETS}.0e0)) AS lr
              FROM tc FULL JOIN rc USING (bucket) CROSS JOIN tot),
            dw AS (
              SELECT g.doc_id, count(*) AS n_grams,
                     round(sum(r.lr), 6) AS log_weight
              FROM gb g JOIN ratios r USING (bucket)
              WHERE NOT g.is_target GROUP BY 1)
            SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, log_weight
            FROM dw ORDER BY log_weight DESC, doc_id
            LIMIT {DSIR_TOP_K}
        """,
        doc="DSIR importance-weighted selection vs the eval target set",
        tags=("§2.11",),
    ),
    "llm_gopher_rules": QuerySpec(
        spark=llm_gopher_rules,
        oracle=rf"""
            -- Same tokenizer, same 1e-6 rounding, flags compared on
            -- the ROUNDED metrics; flags and verdict are BIGINT 0/1.
            WITH w AS (
              SELECT doc_id, coalesce(text, '') AS t,
                     {tokenize.words_sql("text")} AS ws
              FROM documents),
            m AS (
              SELECT doc_id,
                     len(ws) AS n_words,
                     round(list_sum(list_transform(ws, x -> len(x)))
                           * 1.0 / len(ws), 6) AS mean_word_len,
                     round(len(list_filter(ws,
                           x -> regexp_matches(x, '[A-Za-z]')))
                           * 1.0 / len(ws), 6) AS alpha_word_ratio,
                     round(len(regexp_extract_all(t, '#|\.\.\.'))
                           * 1.0 / len(ws), 6) AS symbol_word_ratio,
                     len(list_filter(list_distinct(ws),
                         x -> list_contains(
                           ['the','a','of','and','to','in','or','is'], x)))
                       AS n_stop_distinct
              FROM w)
            SELECT doc_id, n_words, mean_word_len, alpha_word_ratio,
                   symbol_word_ratio, n_stop_distinct,
                   CAST(n_words BETWEEN 50 AND 100000 AS BIGINT)
                     AS ok_word_count,
                   CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS BIGINT)
                     AS ok_mean_word_len,
                   CAST(symbol_word_ratio <= 0.1 AS BIGINT)
                     AS ok_symbol_ratio,
                   CAST(alpha_word_ratio >= 0.8 AS BIGINT)
                     AS ok_alpha_ratio,
                   CAST(n_stop_distinct >= 2 AS BIGINT) AS ok_stopwords,
                   CAST(n_words BETWEEN 50 AND 100000
                        AND mean_word_len BETWEEN 3.0 AND 10.0
                        AND symbol_word_ratio <= 0.1
                        AND alpha_word_ratio >= 0.8
                        AND n_stop_distinct >= 2 AS BIGINT) AS gopher_pass
            FROM m
        """,
        doc="Gopher quality rules (Rae et al. 2021 A1.1, non-repetition "
        "half): per-doc metrics + per-rule flags + composite verdict",
        tags=("§2.11",),
    ),
    "llm_repetition_rules": QuerySpec(
        spark=llm_repetition_rules,
        oracle=f"""
            WITH {_WORDS_SQL},
            g AS (
              SELECT doc_id,
                     list_transform(
                       range(1, greatest(len(ws) - 1, 1) + 1),
                       i -> array_to_string(
                              ws[CAST(i AS INT):CAST(i AS INT) + 1], ' '))
                       AS bi,
                     list_transform(
                       range(1, greatest(len(ws) - 2, 1) + 1),
                       i -> array_to_string(
                              ws[CAST(i AS INT):CAST(i AS INT) + 2], ' '))
                       AS tri
              FROM w),
            m AS (
              SELECT doc_id,
                     CAST(len(bi) AS BIGINT) AS n_bigrams,
                     CAST(list_max(list_transform(list_distinct(bi),
                            x -> len(list_filter(bi, y -> y = x))))
                          AS BIGINT) AS top_bigram_count,
                     CAST(len(tri) AS BIGINT) AS n_tri,
                     CAST(len(list_distinct(tri)) AS BIGINT) AS nd_tri
              FROM g)
            SELECT doc_id, n_bigrams, top_bigram_count,
                   round(top_bigram_count * 1.0 / n_bigrams, 6)
                     AS top_bigram_frac,
                   round((n_tri - nd_tri) * 1.0 / n_tri, 6)
                     AS dup_trigram_frac,
                   (round(top_bigram_count * 1.0 / n_bigrams, 6)
                      >= {TOP_BIGRAM_MAX}
                    OR round((n_tri - nd_tri) * 1.0 / n_tri, 6)
                      >= {DUP_TRIGRAM_MAX}) AS repetitive
            FROM m
        """,
        doc="Gopher repetition rules: top-2-gram + duplicate-3-gram",
        tags=("§2.11",),
    ),
    "llm_quota_sample": QuerySpec(
        spark=llm_quota_sample,
        oracle=f"""
            WITH scr AS (
              SELECT source, doc_id,
                     ((doc_id % 1000000007) * (2654435761 % 1000000007))
                       % 1000000007 AS s
              FROM documents),
            ranked AS (
              SELECT source, doc_id,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY s, doc_id) AS sample_rank
              FROM scr)
            SELECT source, sample_rank, doc_id
            FROM ranked WHERE sample_rank <= {QUOTA_K}
        """,
        doc="Exact per-source quota sample in portable scramble order",
        tags=("§2.11",),
    ),
    "llm_weighted_sample": QuerySpec(
        spark=llm_weighted_sample,
        oracle=f"""
            WITH scr AS (
              SELECT doc_id, source, n_chars,
                     ((doc_id % 1000000007) * (2654435761 % 1000000007))
                       % 1000000007 AS s
              FROM documents),
            keyed AS (
              SELECT doc_id, source, n_chars,
                     round(ln(CAST(s + 1 AS DOUBLE) / 1000000008.0)
                           / greatest(CAST(n_chars AS DOUBLE), 1.0), 9)
                       AS es_key
              FROM scr)
            SELECT doc_id, source, n_chars, es_key
            FROM keyed ORDER BY es_key DESC, doc_id
            LIMIT {WEIGHTED_K}
        """,
        doc="Efraimidis–Spirakis weighted sample (prob ∝ n_chars)",
        tags=("§2.11",),
    ),
    "llm_mixture_sample": QuerySpec(
        spark=llm_mixture_sample,
        oracle=f"""
            WITH {_WORDS_SQL},
            toks AS (
              SELECT doc_id, source, len(ws) AS doc_tokens FROM w),
            per AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(doc_tokens) AS BIGINT) AS tokens
              FROM toks GROUP BY 1),
            plan AS (
              SELECT source, n_docs, tokens,
                     CAST(floor(
                       least(1.0,
                             ({MIXTURE_BUDGET} * sqrt(CAST(tokens AS DOUBLE))
                              / round(sum(sqrt(CAST(tokens AS DOUBLE)))
                                        OVER (), 6))
                             / tokens)
                       * 1000000.0 + 0.5) AS BIGINT) AS rate_micro
              FROM per),
            kept AS (
              SELECT t.source, count(*) AS n_kept,
                     CAST(sum(t.doc_tokens) AS BIGINT) AS tokens_kept
              FROM toks t JOIN plan p ON p.source = t.source
              WHERE ((t.doc_id % 1000000007) * (2654435761 % 1000000007))
                      % 1000000007 * 1000000
                    < p.rate_micro * 1000000007
              GROUP BY 1)
            SELECT p.source, p.n_docs, p.tokens, p.rate_micro,
                   coalesce(k.n_kept, 0) AS n_kept,
                   coalesce(k.tokens_kept, 0) AS tokens_kept
            FROM plan p LEFT JOIN kept k ON k.source = p.source
        """,
        doc="Temperature-0.5 domain mixture: plan + deterministic sample",
        tags=("§2.11",),
    ),
    "llm_lm_quality_score": QuerySpec(
        spark=llm_lm_quality_score,
        oracle=f"""
            WITH {_WORDS_SQL},
            split_docs AS (
              SELECT doc_id, ws,
                     CASE
                       WHEN ((doc_id % 1000000007) * (2654435761 % 1000000007))
                              % 1000000007 * 1000000
                            < {_LM_VAL_M}::BIGINT * 1000000007 THEN 'val'
                       WHEN ((doc_id % 1000000007) * (2654435761 % 1000000007))
                              % 1000000007 * 1000000
                            < {_LM_VAL_M + _LM_TEST_M}::BIGINT * 1000000007
                            THEN 'test'
                       ELSE 'train' END AS split
              FROM w),
            tok AS (
              SELECT doc_id, split, unnest(ws) AS t FROM split_docs),
            vocab AS (
              SELECT t, count(*) AS c FROM tok
              WHERE split = 'train' GROUP BY 1),
            tot AS (
              SELECT CAST(sum(c) AS BIGINT) AS n,
                     count(*) AS v
              FROM vocab)
            SELECT t.doc_id, t.split, count(*) AS n_tokens,
                   round(avg(-ln((coalesce(vc.c, 0) + 1) * 1.0
                                 / (tot.n + tot.v))), 6)
                     AS avg_neg_logprob
            FROM tok t
            LEFT JOIN vocab vc ON vc.t = t.t
            CROSS JOIN tot
            GROUP BY 1, 2
        """,
        doc="CCNet-style unigram LM cross-entropy (train-split fit, "
        "add-one OOV smoothing)",
        tags=("§2.11",),
    ),
    "llm_chunk_documents": QuerySpec(
        spark=llm_chunk_documents,
        oracle=f"""
            WITH {_WORDS_SQL},
            starts AS (
              SELECT doc_id, ws,
                     unnest(range(1, len(ws) + 1, {CHUNK_STRIDE})) AS i
              FROM w)
            SELECT doc_id,
                   CAST((i - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
                   CAST(len(ws[CAST(i AS INT):
                              CAST(i AS INT) + {CHUNK_SIZE - 1}])
                        AS BIGINT) AS chunk_tokens,
                   array_to_string(
                     ws[CAST(i AS INT):CAST(i AS INT) + {CHUNK_SIZE - 1}],
                     ' ') AS chunk_text
            FROM starts
        """,
        doc="Overlapping 32/24 token-window chunking (full-text parity)",
        tags=("§2.11",),
    ),
}
