"""Classification + semantic-dedup queries (SURVEY §2.11 LLM-data
surface; no reference counterpart — the reference's text handling
stops at field extraction, ``clean_data.py:92-113``).

* ``llm_nb_source_classifier`` — multinomial Naive Bayes trained on
  the corpus's own source labels, scoring every document. Fully
  SQL-expressible, so the oracle recomputes the WHOLE model from raw
  strings (the engine joins 64-bit token hashes — identical up to
  xxhash64 collisions, the unigram-LM convention). Determinism
  across engines follows the repo's ln() discipline: argmax on the
  1e-6-rounded score, label ascending as tie-break.
* ``llm_semantic_dedup`` — SemDeDup planted-probe: exact vector
  copies planted past the organic id range must be flagged as
  within-cluster duplicates of their originals at cosine 1.0
  (identical vector ⇒ identical k-means cell, so cluster bucketing
  cannot miss them at any codebook). The oracle enumerates the
  expected verdicts closed-form with the standard signability guard;
  organic clustering quality stays pinned by pytest (planted-cluster
  recovery in tests/test_llm.py, cluster-bucketed recall in
  tests/test_classify.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm import tokenize
from solana_etl_pipeline_spark.llm.classify import (
    nb_fit,
    nb_label_stats,
    nb_score,
    shared_tokens,
)
from solana_etl_pipeline_spark.llm.similarity import kmeans_fit, semantic_dedup
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.queries.llm import _probe_offset
from solana_etl_pipeline_spark.sources import load_table

#: Planted-copy count for the semantic-dedup probe (the near-dup
#: family's convention: first N organic ids get exact twins).
_N_SEM_PROBES = 20
SEM_THRESHOLD = 0.99


def llm_nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit NB on (source | text) over the whole corpus, classify the
    whole corpus: ``(doc_id, predicted, nb_score)``. Self-training is
    deliberate — the oracle recomputes the identical closed-form
    model, so the pair checks the full fit+score arithmetic, not
    held-out generalization (that is a quality question, pinned by
    pytest on a separable crafted corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    # r16: fit and score share ONE tokenize+explode pass (the widest
    # map stage here) via the persisted shared_tokens frame.
    toks = shared_tokens(docs)
    model = nb_fit(docs, label_col="source", tokens=toks)
    stats = nb_label_stats(docs, label_col="source")
    return nb_score(docs, model, stats, tokens=toks)


def llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup planted-probe: copies of the first 20 vectors planted
    at ``vec_id + max(vec_id)+1`` must each be flagged as a duplicate
    of their original (cosine exactly 1.0 after the 1e-6 round). The
    full machinery runs — k-means codebook, cluster assignment,
    within-cluster pair generation, threshold verify — and the twin
    verdicts are emitted."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    off = _probe_offset(emb, "vec_id", sf_dir)
    centroids = kmeans_fit(emb, k=8, dim=64, n_iters=1)
    planted = emb.filter(F.col("vec_id") < _N_SEM_PROBES).select(
        (F.col("vec_id") + off).alias("vec_id"), "embedding"
    )
    verdicts = semantic_dedup(
        emb.unionByName(planted), centroids, threshold=SEM_THRESHOLD
    )
    return verdicts.filter(F.col("drop_id") == F.col("keep_id") + off)


_WORDS = tokenize.words_sql("text")

def llm_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the class-prototype table
    behind semantic classifiers, cluster seeding, and drift checks on
    embedding spaces: for each label and dimension, the mean
    component, plus per-label member counts.

    Scale posture: ``posexplode`` fans each vector into (label, dim,
    component) rows map-side (dim-bounded, 64×), then ONE hash
    aggregation on (label, dim) — labels × dim output rows
    (dimension-scale). No collect, no window; the float surface is a
    single mean, rounded at 1e-6 (components are |x| ≤ ~1 floats, so
    cross-engine sum-order drift sits ~8 orders below the grain)."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )
    comps = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).withColumn(
        # int64: the oracle's generate_subscripts emits BIGINT and the
        # driver hashes Arrow types, not just values
        "dim",
        F.col("dim").cast("bigint"),
    )
    return comps.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"),
    )


QUERIES: dict[str, QuerySpec] = {
    "llm_label_centroids": QuerySpec(
        spark=llm_label_centroids,
        # generate_subscripts is 1-based; Spark's posexplode 0-based —
        # the oracle shifts to match.
        oracle="""
            WITH c AS (
              SELECT label,
                     unnest(embedding::DOUBLE[]) AS x,
                     generate_subscripts(embedding, 1) - 1 AS dim
              FROM embeddings
              WHERE embedding IS NOT NULL AND len(embedding) > 0)
            SELECT label, dim,
                   count(*) AS n_vectors,
                   round(avg(x), 6) AS centroid
            FROM c GROUP BY 1, 2
        """,
        doc="Per-label embedding centroids (labels × dims rollup)",
        tags=("§2.11", "A"),
    ),
    "llm_nb_source_classifier": QuerySpec(
        spark=llm_nb_source_classifier,
        oracle=f"""
            WITH toks AS (
              SELECT doc_id, unnest({_WORDS}) AS w FROM documents),
            toks_ne AS (
              SELECT doc_id, w FROM toks WHERE w <> ''),
            labeled AS (
              SELECT t.doc_id, d.source AS label, t.w
              FROM toks_ne t JOIN documents d USING (doc_id)),
            model AS (
              SELECT label, w, count(*) AS c FROM labeled GROUP BY 1, 2),
            label_stats AS (
              SELECT source AS label, count(*) AS docs_l
              FROM documents GROUP BY 1),
            per_label AS (
              SELECT label, sum(c) AS n_l FROM model GROUP BY 1),
            vocab AS (SELECT count(DISTINCT w) AS v FROM toks_ne),
            d_total AS (SELECT count(*) AS d FROM documents),
            doc_len AS (
              SELECT doc_id, count(*) AS n FROM toks_ne GROUP BY 1),
            matched AS (
              SELECT t.doc_id, m.label, sum(ln(m.c + 1.0)) AS s
              FROM toks_ne t JOIN model m ON m.w = t.w
              GROUP BY 1, 2),
            base AS (
              SELECT dd.doc_id, ls.label,
                     coalesce(dl.n, 0) AS n,
                     ls.docs_l,
                     coalesce(pl.n_l, 0) AS n_l
              FROM documents dd
              CROSS JOIN label_stats ls
              LEFT JOIN doc_len dl ON dl.doc_id = dd.doc_id
              LEFT JOIN per_label pl ON pl.label = ls.label),
            scored AS (
              SELECT b.doc_id, b.label,
                     round(ln(b.docs_l * 1.0 / dt.d)
                           + coalesce(m.s, 0)
                           - b.n * ln((b.n_l + v.v) * 1.0), 6) AS sc
              FROM base b
              CROSS JOIN d_total dt
              CROSS JOIN vocab v
              LEFT JOIN matched m
                ON m.doc_id = b.doc_id AND m.label = b.label),
            ranked AS (
              SELECT doc_id, label, sc,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY sc DESC, label ASC) AS rn
              FROM scored)
            SELECT doc_id, label AS predicted, sc AS nb_score
            FROM ranked WHERE rn = 1
        """,
        doc="Multinomial NB source classifier (one-aggregation training)",
        tags=("§2.11",),
    ),
    "llm_semantic_dedup": QuerySpec(
        spark=llm_semantic_dedup,
        oracle=f"""
            -- same signability guard as the IVF/LSH probes: null,
            -- empty, or zero-norm vectors are dropped by the engine's
            -- norm guard and produce no verdict
            SELECT vec_id AS keep_id,
                   vec_id + (SELECT max(vec_id) + 1 FROM embeddings)
                     AS drop_id,
                   CAST(1.0 AS DOUBLE) AS cos_sim
            FROM embeddings
            WHERE vec_id < {_N_SEM_PROBES} AND embedding IS NOT NULL
              AND len(embedding) > 0
              AND list_inner_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[]) > 0
        """,
        doc="SemDeDup cluster-bucketed embedding dedup finds planted copies",
        tags=("§2.11",),
    ),
}
