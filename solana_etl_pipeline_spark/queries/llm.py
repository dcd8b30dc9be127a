"""LLM-data-pipeline queries over ``documents`` / ``embeddings``
(SURVEY.md §2.11 north star).

SQL-expressible operators get DuckDB oracles; the LSH families
(MinHash, SimHash, hyperplane-LSH) are rows-only by the driver
contract — their correctness is pinned by unit tests with planted
near-duplicates (tests/test_llm.py) and by the brute-force twin
(``llm_cosine_topk``) that IS oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.dedup import (
    embedding_near_dup_pairs,
    exact_dedup_groups,
    minhash_near_dup_pairs,
    ngram_jaccard_for_pairs,
    simhash_candidate_pairs,
)
from solana_etl_pipeline_spark.llm.cluster import near_dup_dedup
from solana_etl_pipeline_spark.llm.multimodal import (
    documents_as_assets,
    featurize_assets,
)
from solana_etl_pipeline_spark.llm.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    kmeans_fit,
    lsh_cosine_topk,
)
from solana_etl_pipeline_spark.llm.textstats import (
    STOPWORDS,
    TOKEN_REGEX,
    document_fingerprint,
    language_id,
    quality_score,
    text_stats,
    token_counts,
)
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table

_N_QUERY_VECS = 5  # similarity queries use vec_id < 5 as the query set


def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash exact dedup groups (hash side is Spark-only; the
    oracle groups by raw text — identical up to sha256 collisions)."""
    docs = load_table(spark, sf_dir, "documents")
    groups = exact_dedup_groups(docs, ["text"], "doc_id")
    return groups.select("keep_id", "n_copies")


def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = text_stats(F.col("text"))
    per_doc = docs.select(
        "lang", *[expr.alias(name) for name, expr in stats.items()]
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg("n_words"), 4).alias("avg_words"),
        F.round(F.avg("avg_word_len"), 4).alias("avg_word_len"),
        F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword_ratio"),
    )


def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = token_counts(F.col("text"))
    return (
        docs.select(
            "source", *[expr.alias(name) for name, expr in counts.items()]
        )
        .groupBy("source")
        .agg(
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            F.round(F.avg("ws_tokens"), 4).alias("avg_ws_tokens"),
        )
    )


def llm_quality_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solana_etl_pipeline_spark.functions.banding import risk_band

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    )
    return (
        scored.withColumn("band", risk_band(F.col("quality"), 80.0, 50.0))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
    )


def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted vs labeled language confusion counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", language_id(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", document_fingerprint(F.col("text")).alias("fingerprint")
    )


def llm_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs (rows-only: LSH bucketing is
    not SQL-expressible; planted-duplicate tests pin semantics)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
    )


def llm_near_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup: MinHash-LSH pairs → connected
    components → one canonical survivor per cluster
    (``llm/cluster.py``), summarized per source. Rows-only: the
    iterative component resolution isn't SQL-expressible; planted
    transitive-cluster tests pin semantics."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
    )
    survivors = near_dup_dedup(docs, pairs, "doc_id")
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.sum("n_chars").alias("surviving_chars"),
    )


def llm_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded candidates with Hamming ≤ 3 (rows-only)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_candidate_pairs(docs, "doc_id", "text", max_hamming=3)


def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-gram Jaccard for each consecutive doc pair (doc_id,
    doc_id+1) — a SQL-expressible candidate set so the verify stage
    itself is oracle-checked (LSH candidate generation is covered by
    the rows-only near-dup queries + planted tests)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1).alias("id_b"),
    ).join(
        docs.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi"
    )
    return ngram_jaccard_for_pairs(docs, pairs, "doc_id", "text")


def llm_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs at 0.9 (rows-only: LSH
    candidates; planted tests pin semantics). On the random fixture
    this is usually empty — exactly right for distinct vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.9)


def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 5 vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    return cosine_topk(emb, queries, k=5)


def llm_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 (rows-only; recall vs the
    exact twin is asserted in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    return lsh_cosine_topk(emb, queries, k=5)


def llm_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-5 (rows-only): codebook trained
    with one Lloyd refinement over a deterministic scramble-seeded
    init (``kmeans_fit``; more iterations are a library-level knob —
    one keeps this registered query inside the bench envelope),
    nprobe=1 cluster search."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=8, dim=64, n_iters=1)
    queries = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    return ivf_cosine_topk(emb, queries, centroids, k=5)


def llm_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup over a signature store (rows-only: the
    MinHash/LSH machinery isn't SQL-expressible): one arrival batch of
    100 fixture docs plus 20 exact copies (ids +10000) runs the full
    sign → band-probe → verdict → index step and must flag exactly
    the planted copies (scope='batch', lower id wins). The
    cross-batch index probe, replay idempotence, and foreachBatch
    wiring are pinned by tests/test_incremental.py — a second batch
    step here would re-witness what those tests already pin, at
    double the job count (the query's cost is SF-independent by
    design: per-batch work must not scale with the indexed corpus)."""
    import tempfile

    from solana_etl_pipeline_spark.llm.incremental import (
        incremental_near_dup_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = tempfile.mkdtemp(prefix="spark_incr_dedup_")
    batch = docs.filter(F.col("doc_id") < 100).unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    verdicts = incremental_near_dup_batch(
        batch, store, batch_id=0, num_hashes=32, bands=8
    )
    return verdicts.groupBy("scope").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("est_jaccard"), 4).alias("avg_est"),
    )


def llm_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based frequent tokens, pinned against exact counts.

    ``approx_top_k`` is the mergeable bounded-state answer to
    frequent-items at 100 TB: each partition tracks at most
    ``maxItemsTracked`` candidates regardless of term cardinality and
    partial sketches merge associatively, where an exact groupBy's
    state grows with the vocabulary. With ``maxItemsTracked`` ≥ the
    distinct-term count the sketch is exact, so the query emits the
    exact top-5 joined with the sketch's counts and an ``err`` column
    the oracle pins to zero — same self-banding pattern as the HLL
    rollup (``sketch_rollup_distinct_users``)."""
    from solana_etl_pipeline_spark.llm.ranking import _tokens

    toks = _tokens(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    # sketch k=20 ≫ the joined top-5: an exact count tie at the 5th
    # place must not let the sketch's unspecified tie order drop the
    # term we join on (tracked budget ≥ fixture vocabulary keeps the
    # counts themselves exact — see the oracle's err=0 pin)
    approx = (
        toks.agg(F.expr("approx_top_k(term, 20, 65536)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("term"),
            F.col("e.count").alias("approx_count"),
        )
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_count"))
    top5 = exact.orderBy(F.desc("exact_count"), F.asc("term")).limit(5)
    return top5.join(F.broadcast(approx), "term", "left").select(
        "term",
        "exact_count",
        F.coalesce("approx_count", F.lit(0)).alias("approx_count"),
        (F.col("exact_count") - F.coalesce("approx_count", F.lit(0))).alias(
            "err"
        ),
    )


def llm_multimodal_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload featurization via Arrow-batched mapInPandas; the
    deterministic digest featurizer lets DuckDB check the full path
    (bytes → batches → Python → typed rows)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = featurize_assets(documents_as_assets(docs))
    return feats.select(
        "asset_id",
        "modality",
        "n_bytes",
        "digest",
        F.round(F.element_at("feat", 1), 6).alias("feat0"),
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

QUERIES: dict[str, QuerySpec] = {
    "llm_exact_dedup": QuerySpec(
        spark=llm_exact_dedup,
        oracle="""
            SELECT min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        doc="Content-hash exact dedup groups (sha256; oracle groups raw text)",
        tags=("§2.11", "A7"),
    ),
    "llm_text_stats": QuerySpec(
        spark=llm_text_stats,
        oracle=f"""
            WITH per_doc AS (
              SELECT lang,
                     len(text) AS n_chars,
                     len(string_split(lower(trim(text)), ' ')) AS n_words,
                     round(list_sum(list_transform(
                         string_split(lower(trim(text)), ' '),
                         w -> len(w))) * 1.0
                       / len(string_split(lower(trim(text)), ' ')), 6)
                       AS avg_word_len,
                     round(len(list_filter(
                         string_split(lower(trim(text)), ' '),
                         w -> w IN ({_STOP_SQL}))) * 1.0
                       / len(string_split(lower(trim(text)), ' ')), 6)
                       AS stopword_ratio
              FROM documents)
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 4) AS avg_chars,
                   round(avg(n_words), 4) AS avg_words,
                   round(avg(avg_word_len), 4) AS avg_word_len,
                   round(avg(stopword_ratio), 4) AS avg_stopword_ratio
            FROM per_doc GROUP BY lang
        """,
        doc="Per-language text statistics",
        tags=("§2.11",),
    ),
    "llm_token_count": QuerySpec(
        spark=llm_token_count,
        oracle=f"""
            WITH per_doc AS (
              SELECT source,
                     len(string_split(lower(trim(text)), ' ')) AS ws_tokens,
                     len(regexp_extract_all(text,
                         '{TOKEN_REGEX.replace("'", "''")}')) AS bpe_tokens
              FROM documents)
            SELECT source,
                   CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
                   CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
                   round(avg(ws_tokens), 4) AS avg_ws_tokens
            FROM per_doc GROUP BY source
        """,
        doc="Whitespace + BPE-ish regex token counting",
        tags=("§2.11",),
    ),
    "llm_quality_banding": QuerySpec(
        spark=llm_quality_banding,
        oracle=f"""
            WITH s AS (
              SELECT doc_id,
                     len(string_split(lower(trim(text)), ' ')) AS n_words,
                     round(len(list_filter(
                         string_split(lower(trim(text)), ' '),
                         w -> w IN ({_STOP_SQL}))) * 1.0
                       / len(string_split(lower(trim(text)), ' ')), 6)
                       AS stop_ratio,
                     round(len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                       / len(text), 6) AS punct_ratio,
                     round(len(regexp_extract_all(text, '[0-9]')) * 1.0
                       / len(text), 6) AS digit_ratio
              FROM documents),
            scored AS (
              SELECT doc_id,
                     round(greatest(0.0, least(100.0,
                       0.4 * least(100.0, n_words * 2.0)
                       + 0.3 * (100.0 - abs(stop_ratio - 0.4) * 200.0)
                       + 0.3 * (100.0 - (punct_ratio + digit_ratio) * 500.0)
                     )), 6) AS quality
              FROM s)
            SELECT CASE WHEN quality > 80.0 THEN 'HIGH'
                        WHEN quality > 50.0 THEN 'MEDIUM'
                        ELSE 'LOW' END AS band,
                   count(*) AS n_docs,
                   round(avg(quality), 4) AS avg_quality
            FROM scored GROUP BY 1
        """,
        doc="Heuristic quality score + banding",
        tags=("§2.11", "F11"),
    ),
    "llm_lang_id": QuerySpec(
        spark=llm_lang_id,
        oracle="""
            WITH scores AS (
              SELECT lang,
                     len(list_filter(string_split(lower(trim(text)), ' '),
                         w -> w IN ('the','and','of'))) AS s_en,
                     len(list_filter(string_split(lower(trim(text)), ' '),
                         w -> w IN ('el','la','de'))) AS s_es,
                     len(list_filter(string_split(lower(trim(text)), ' '),
                         w -> w IN ('der','die','und'))) AS s_de
              FROM documents),
            pred AS (
              SELECT lang,
                     CASE
                       WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de THEN 'en'
                       WHEN s_es > 0 AND s_es >= s_de THEN 'es'
                       WHEN s_de > 0 THEN 'de'
                       ELSE 'und' END AS predicted
              FROM scores)
            SELECT lang, predicted, count(*) AS n_docs
            FROM pred GROUP BY 1, 2
        """,
        doc="Marker-word language-ID heuristic, confusion counts",
        tags=("§2.11",),
    ),
    "llm_fingerprint": QuerySpec(
        spark=llm_fingerprint,
        oracle="""
            WITH words AS (
              SELECT doc_id,
                     unnest(string_split(lower(trim(text)), ' ')) AS w,
                     generate_subscripts(
                       string_split(lower(trim(text)), ' '), 1) AS pos
              FROM documents)
            SELECT doc_id,
                   CAST(sum(pos * (31 * len(w) + ascii(w))) % 2147483647
                        AS BIGINT) AS fingerprint
            FROM words GROUP BY doc_id
        """,
        doc="Order-sensitive rolling document fingerprint",
        tags=("§2.11",),
    ),
    "llm_minhash_near_dup": QuerySpec(
        spark=llm_minhash_near_dup,
        oracle=None,
        doc="Banded MinHash-LSH near-dup pairs (rows-only; tests plant dups)",
        tags=("§2.11",),
    ),
    "llm_near_dup_survivors": QuerySpec(
        spark=llm_near_dup_survivors,
        oracle=None,
        doc="Fuzzy dedup end-to-end: pairs → components → canonical keep",
        tags=("§2.11",),
    ),
    "llm_simhash_near_dup": QuerySpec(
        spark=llm_simhash_near_dup,
        oracle=None,
        doc="SimHash band candidates, Hamming-verified (rows-only)",
        tags=("§2.11",),
    ),
    "llm_ngram_jaccard": QuerySpec(
        spark=llm_ngram_jaccard,
        oracle="""
            WITH words AS (
              SELECT doc_id,
                     unnest(string_split(lower(trim(text)), ' ')) AS w,
                     generate_subscripts(
                       string_split(lower(trim(text)), ' '), 1) AS pos
              FROM documents),
            shingles AS (
              SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
              FROM words a
              JOIN words b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN words c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
            sizes AS (
              SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY 1),
            pairs AS (
              SELECT d1.doc_id AS id_a, d1.doc_id + 1 AS id_b
              FROM documents d1
              JOIN documents d2 ON d2.doc_id = d1.doc_id + 1),
            inter AS (
              SELECT p.id_a, p.id_b, count(*) AS n_inter
              FROM pairs p
              JOIN shingles sa ON sa.doc_id = p.id_a
              JOIN shingles sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
              GROUP BY 1, 2)
            SELECT p.id_a, p.id_b,
                   round(coalesce(i.n_inter, 0) * 1.0
                         / (za.n_sh + zb.n_sh - coalesce(i.n_inter, 0)), 6)
                     AS jaccard
            FROM pairs p
            LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
            JOIN sizes za ON za.doc_id = p.id_a
            JOIN sizes zb ON zb.doc_id = p.id_b
        """,
        doc="Exact n-gram Jaccard verify stage (SQL-expressible pair set)",
        tags=("§2.11",),
    ),
    "llm_embedding_near_dup": QuerySpec(
        spark=llm_embedding_near_dup,
        oracle=None,
        doc="Embedding-cosine near-dup via LSH buckets (rows-only)",
        tags=("§2.11",),
    ),
    "llm_cosine_topk": QuerySpec(
        spark=llm_cosine_topk,
        oracle="""
            WITH q AS (SELECT vec_id AS query_id,
                              embedding::DOUBLE[] AS qvec
                       FROM embeddings WHERE vec_id < 5),
            pairs AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(
                       list_inner_product(q.qvec, e.embedding::DOUBLE[])
                       / (sqrt(list_inner_product(q.qvec, q.qvec))
                          * sqrt(list_inner_product(e.embedding::DOUBLE[],
                                                    e.embedding::DOUBLE[]))),
                       6) AS cosine
              FROM q, embeddings e WHERE e.vec_id <> q.query_id),
            ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
              FROM pairs)
            SELECT query_id, neighbor_id, rank, cosine
            FROM ranked WHERE rank <= 5
        """,
        doc="Exact brute-force cosine top-k (ANN baseline)",
        tags=("§2.11",),
    ),
    "llm_lsh_cosine_topk": QuerySpec(
        spark=llm_lsh_cosine_topk,
        oracle=None,
        doc="Hyperplane-LSH bucketed cosine top-k (rows-only; recall tested)",
        tags=("§2.11",),
    ),
    "llm_ivf_cosine_topk": QuerySpec(
        spark=llm_ivf_cosine_topk,
        oracle=None,
        doc="IVF cosine top-k, k-means-trained codebook, nprobe=1 (rows-only)",
        tags=("§2.11",),
    ),
    "llm_incremental_near_dup": QuerySpec(
        spark=llm_incremental_near_dup,
        oracle=None,
        doc="Incremental near-dup vs a persisted signature store (rows-only)",
        tags=("§2.11",),
    ),
    "llm_token_heavy_hitters": QuerySpec(
        spark=llm_token_heavy_hitters,
        oracle="""
            WITH toks AS (
              SELECT unnest(string_split(lower(trim(coalesce(text, ''))),
                            ' ')) AS term
              FROM documents),
            counts AS (
              SELECT term, count(*) AS exact_count FROM toks
              WHERE term IS NOT NULL AND term <> '' GROUP BY term),
            top5 AS (
              SELECT term, exact_count FROM counts
              ORDER BY exact_count DESC, term LIMIT 5)
            SELECT term, exact_count,
                   exact_count AS approx_count,
                   CAST(0 AS BIGINT) AS err
            FROM top5
        """,
        doc="approx_top_k frequent tokens, err-pinned against exact",
        tags=("§2.11", "A2"),
    ),
    "llm_multimodal_featurize": QuerySpec(
        spark=llm_multimodal_featurize,
        oracle="""
            SELECT doc_id AS asset_id,
                   'text' AS modality,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS digest,
                   round(('0x' || substr(sha256(text), 1, 2))::INT / 255.0, 6)
                     AS feat0
            FROM documents
        """,
        doc="Binary multimodal column + Arrow mapInPandas featurizer",
        tags=("§2.11", "D4", "D2"),
    ),
}
