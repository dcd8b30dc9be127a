"""Remaining operator coverage: as-of join, Python UDTF expansion (D3),
negative-substring predicates (P6), and the string↔timestamp round-trip
(F2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.functions.timestamps import format_ts, parse_ts
from solana_etl_pipeline_spark.operators.asof import asof_join
from solana_etl_pipeline_spark.operators.cdc import apply_changes
from solana_etl_pipeline_spark.operators.diff import snapshot_diff
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table


def asof_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event picks up the value of the same
    user's most recent purchase at-or-before it (null if none yet)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", F.round("value", 6).alias("value")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 6).alias("purchase_value")
    )
    joined = asof_join(
        errors, purchases, key="user_id", ts="ts",
        value_cols=["purchase_value"],
    )
    return joined.select(
        "user_id",
        "event_id",
        "value",
        F.col("purchase_value_asof").alias("prior_purchase_value"),
    )


def udtf_word_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 general case: a Python UDTF (Spark 3.5+) expanding one
    document into one row per 10-word chunk — the record-expanding
    shape of ``process_helius_transaction`` (``clean_data.py:36-72``)
    when no built-in explode applies. Arrow-evaluated; prefer
    ``explode``/``posexplode`` wherever the expansion is expressible
    as an array."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_words int")
    class WordChunks:
        def eval(self, text: str):
            # the repo-wide tokenization convention (null/empty text
            # is ONE empty token; whitespace runs collapse) — a bare
            # .split() would crash on None, count degenerates as zero
            # words, and diverge from the oracle on tabs/newlines
            from solana_etl_pipeline_spark.llm.tokenize import py_words

            words = py_words(text)
            for i in range(0, max(len(words), 1), 10):
                yield i // 10, min(10, len(words) - i)

    spark.udtf.register("word_chunks", WordChunks)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_udtf"
    )
    return spark.sql(
        """
        SELECT c.chunk_idx,
               count(*) AS n_chunks,
               sum(c.chunk_words) AS total_words
        FROM documents_udtf, LATERAL word_chunks(text) AS c
        GROUP BY c.chunk_idx
        """
    )


def negative_substring_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: exclude rows whose payload contains a substring (the
    reference's ``DEST_PREFIX in key`` exclusions) + suffix predicate
    (P5) on a derived name."""
    ev = load_table(spark, sf_dir, "events")
    name = F.concat(F.col("event_type"), F.lit("/"), F.col("event_id"))
    return (
        ev.withColumn("name", name)
        .filter(~F.col("props").contains('"k": 4'))
        .filter(F.col("name").startswith("p"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def timestamp_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: format → parse round-trip; seconds-grain timestamps must
    survive exactly (the reference's store-as-string / re-parse cycle,
    ``streamlit 1.3.txt:51``)."""
    ev = load_table(spark, sf_dir, "events")
    truncated = F.date_trunc("second", F.col("ts"))
    rendered = format_ts(truncated)
    reparsed = parse_ts(rendered)
    return (
        ev.select(
            (reparsed == truncated).alias("roundtrip_exact"),
        )
        .groupBy("roundtrip_exact")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def skew_salted_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (``operators/skew.py``): identical
    semantics to a plain GROUP BY — so it's oracle-paired — but the
    first stage fans each hot key over 16 salt buckets, bounding any
    single reducer's input at scale (the hot-key defense when AQE's
    skew handling can't help, e.g. a single giant group)."""
    from solana_etl_pipeline_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        "user_id",
        {
            "n_events": ("value", "count"),
            "total_value": ("value", "sum"),
            "max_value": ("value", "max"),
        },
    ).select(
        "user_id",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        "max_value",
    )


def skew_salted_join_priority_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Salted equi-join (``operators/skew.py::salted_join``): lineitem
    facts salt-bucketed, the orders build side replicated ``buckets``×,
    joined on (key, salt) — semantics identical to the plain join, so
    oracle-paired. The shape for a hot fact key too big for one reducer
    when the build side is replicable but not broadcast-small."""
    from solana_etl_pipeline_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, orders, "o_orderkey", buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


def nullsafe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): rows
    with a null join key still pair with null-keyed dimension rows —
    the §2.11 completeness case ordinary equi-joins drop."""
    ev = load_table(spark, sf_dir, "events")
    # key: k mod 5, but null for error events — guarantees null keys
    keyed = ev.select(
        F.when(
            F.col("event_type") != "error",
            F.get_json_object("props", "$.k").try_cast("bigint") % 5,
        ).alias("k"),
        "value",
    )
    # range+expressions, not createDataFrame-from-list: a Python-list
    # frame executes as a Python-RDD scan spawning a worker per
    # partition (measured ~2 s of this query's wall at sf0.1 — the
    # same pathology documented at llm/incremental.py:111); range is
    # a pure-JVM local relation. Row 0 is the (NULL, 'missing') row.
    dim = spark.range(6).select(
        F.when(F.col("id") > 0, F.col("id") - 1).alias("k"),
        F.when(
            F.col("id") > 0,
            F.concat(F.lit("bucket_"), (F.col("id") - 1).cast("string")),
        )
        .otherwise(F.lit("missing"))
        .alias("bucket"),
    )
    return (
        keyed.join(F.broadcast(dim), keyed.k.eqNullSafe(dim.k))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def regexp_extract_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction (a SURVEY §2.8 gap row): parse the numeric id
    out of the source tag with a capture group and aggregate on it."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"src(\d+)", 1).try_cast("bigint")
    return (
        docs.select(src_num.alias("src_num"), "n_chars")
        .groupBy("src_num")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type with the summed value — the
    wide-format reshape. Pivot values are enumerated explicitly (never
    inferred: inference is an extra job and nondeterministic column
    order at scale)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["purchase", "click", "view", "signup", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 4))
    )
    # null -> 0.0 so the wide table is arithmetic-ready
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in types],
    )


def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: three metric columns become (metric, value) rows,
    then a per-metric summary — the long-format reshape."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return melted.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.sum("value"), 4).alias("total"),
    )


def typed_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 typed form: ``from_json`` with a static schema over the raw
    payload column (vs the ad-hoc ``get_json_object`` path) — missing
    fields become typed nulls, the contract form of ``.get(k,
    default)``."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", "struct<k: bigint, missing: string>").alias("p")
    )
    return (
        parsed.select(
            F.col("p.k").alias("k"),
            F.col("p.missing").isNull().alias("missing_is_null"),
        )
        .groupBy("missing_is_null")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# Deterministic synthetic "rebuild" of the documents snapshot so the
# diff classifier sees all three change classes: every 13th doc is
# dropped (removed), every 7th surviving doc gets its text appended
# and lang cleared (changed, two columns), and a shifted-id copy of
# every 50th doc is inserted (added).
def _rebuilt_documents(docs: DataFrame) -> DataFrame:
    survivors = docs.filter(F.pmod("doc_id", F.lit(13)) != 4)
    updated = survivors.select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(7)) == 2,
            F.concat(F.col("text"), F.lit(" [rebuilt]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(F.pmod("doc_id", F.lit(7)) == 2, F.lit(None).cast("string"))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "source",
        "n_chars",
    )
    inserts = docs.filter(F.pmod("doc_id", F.lit(50)) == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    return updated.unionByName(inserts)


def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy diff of the documents snapshot vs its synthetic
    rebuild (``operators/diff.py``): added/removed keys + per-key
    changed-column lists."""
    docs = load_table(spark, sf_dir, "documents")
    return snapshot_diff(
        docs,
        _rebuilt_documents(docs),
        keys=["doc_id"],
        compare_cols=["text", "lang", "source", "n_chars"],
    )


def cdc_apply_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge-apply (``operators/cdc.py``) of a deterministic
    synthetic change feed into the documents snapshot: inserts
    (shifted-id copies of every 11th-mod-5 doc, seq 1), text updates
    (every 5th doc, seq 2), deletes (every 7th-mod-3 doc, seq 3).
    Keys hit by both an update and a later delete (doc_id ≡ 10 mod
    35) exercise latest-wins. Output digests the text (md5) so the
    result set stays compact."""
    docs = load_table(spark, sf_dir, "documents")
    inserts = docs.filter(F.pmod("doc_id", F.lit(11)) == 5).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.lit("upsert").alias("op"),
        F.lit(1).alias("seq"),
        "text",
        "lang",
        F.lit("cdc_insert").alias("source"),
        "n_chars",
    )
    v2_text = F.concat(F.col("text"), F.lit(" [v2]"))
    updates = docs.filter(F.pmod("doc_id", F.lit(5)) == 0).select(
        "doc_id",
        F.lit("upsert").alias("op"),
        F.lit(2).alias("seq"),
        v2_text.alias("text"),
        "lang",
        "source",
        F.length(v2_text).cast("long").alias("n_chars"),
    )
    deletes = docs.filter(F.pmod("doc_id", F.lit(7)) == 3).select(
        "doc_id",
        F.lit("delete").alias("op"),
        F.lit(3).alias("seq"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("n_chars"),
    )
    changes = inserts.unionByName(updates).unionByName(deletes)
    applied = apply_changes(docs, changes, key="doc_id")
    return applied.select(
        "doc_id",
        F.md5(F.coalesce("text", F.lit(""))).alias("text_md5"),
        "lang",
        "source",
        "n_chars",
    )


QUERIES: dict[str, QuerySpec] = {
    "cdc_apply_documents": QuerySpec(
        spark=cdc_apply_documents,
        oracle="""
            WITH changes AS (
              SELECT doc_id + 2000000 AS doc_id, 'upsert' AS op,
                     1 AS seq, text, lang,
                     'cdc_insert' AS source, n_chars
              FROM documents WHERE doc_id % 11 = 5
              UNION ALL
              SELECT doc_id, 'upsert', 2, text || ' [v2]', lang,
                     source, length(text || ' [v2]')
              FROM documents WHERE doc_id % 5 = 0
              UNION ALL
              SELECT doc_id, 'delete', 3, NULL, NULL, NULL, NULL
              FROM documents WHERE doc_id % 7 = 3),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY seq DESC) AS rn
              FROM changes),
            final AS (SELECT * FROM ranked WHERE rn = 1),
            applied AS (
              SELECT b.doc_id, b.text, b.lang, b.source, b.n_chars
              FROM documents b LEFT JOIN final f ON b.doc_id = f.doc_id
              WHERE f.doc_id IS NULL
              UNION ALL
              SELECT doc_id, text, lang, source, n_chars
              FROM final WHERE op = 'upsert')
            SELECT doc_id, md5(coalesce(text, '')) AS text_md5,
                   lang, source, n_chars
            FROM applied
        """,
        doc="CDC merge-apply: latest-wins upserts + deletes into base",
        tags=("§2.11",),
    ),
    "snapshot_diff_documents": QuerySpec(
        spark=snapshot_diff_documents,
        oracle="""
            WITH new AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 2
                          THEN text || ' [rebuilt]' ELSE text END AS text,
                     CASE WHEN doc_id % 7 = 2
                          THEN NULL ELSE lang END AS lang,
                     source, n_chars
              FROM documents WHERE doc_id % 13 <> 4
              UNION ALL
              SELECT doc_id + 1000000, text, lang, source, n_chars
              FROM documents WHERE doc_id % 50 = 0),
            j AS (
              SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                     CASE WHEN o.doc_id IS NULL THEN 'added'
                          WHEN n.doc_id IS NULL THEN 'removed'
                          WHEN o.text  IS DISTINCT FROM n.text
                            OR o.lang  IS DISTINCT FROM n.lang
                            OR o.source IS DISTINCT FROM n.source
                            OR o.n_chars IS DISTINCT FROM n.n_chars
                          THEN 'changed' END AS change_type,
                     CASE WHEN o.doc_id IS NULL OR n.doc_id IS NULL
                          THEN ''
                          ELSE concat_ws(',',
                            CASE WHEN o.text IS DISTINCT FROM n.text
                                 THEN 'text' END,
                            CASE WHEN o.lang IS DISTINCT FROM n.lang
                                 THEN 'lang' END,
                            CASE WHEN o.source IS DISTINCT FROM n.source
                                 THEN 'source' END,
                            CASE WHEN o.n_chars IS DISTINCT FROM n.n_chars
                                 THEN 'n_chars' END) END AS changed_cols
              FROM documents o FULL OUTER JOIN new n
                ON o.doc_id = n.doc_id)
            SELECT doc_id, change_type, changed_cols
            FROM j WHERE change_type IS NOT NULL
        """,
        doc="Snapshot anti-entropy diff: added/removed/changed + columns",
        tags=("§2.11",),
    ),
    "asof_prior_purchase": QuerySpec(
        spark=asof_prior_purchase,
        oracle="""
            SELECT e.user_id, e.event_id, round(e.value, 6) AS value,
                   p.purchase_value AS prior_purchase_value
            FROM (SELECT * FROM events WHERE event_type = 'error') e
            ASOF LEFT JOIN (
              SELECT user_id, ts, round(value, 6) AS purchase_value
              FROM events WHERE event_type = 'purchase') p
              ON e.user_id = p.user_id AND e.ts >= p.ts
        """,
        doc="As-of (nearest-prior) join via union+window, no range explosion",
        tags=("§2.11", "W"),
    ),
    "udtf_word_chunks": QuerySpec(
        spark=udtf_word_chunks,
        oracle="""
            WITH sized AS (
              SELECT len(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' '))
                AS n_words
              FROM documents),
            chunks AS (
              SELECT n_words,
                     unnest(range(0, CAST(ceil(n_words / 10.0) AS BIGINT)))
                       AS chunk_idx
              FROM sized)
            SELECT CAST(chunk_idx AS INT) AS chunk_idx,
                   count(*) AS n_chunks,
                   CAST(sum(least(10, n_words - 10 * chunk_idx)) AS BIGINT)
                     AS total_words
            FROM chunks GROUP BY 1
        """,
        doc="Python UDTF record expansion (D3 general case)",
        tags=("D3",),
    ),
    "negative_substring_filter": QuerySpec(
        spark=negative_substring_filter,
        oracle="""
            SELECT event_type, count(*) AS n_events
            FROM events
            WHERE props NOT LIKE '%"k": 4%'
              AND (event_type || '/' || event_id) LIKE 'p%'
            GROUP BY 1
        """,
        doc="Negative substring + prefix predicates (P5/P6)",
        tags=("P5", "P6"),
    ),
    "pivot_event_values": QuerySpec(
        spark=pivot_event_values,
        oracle="""
            SELECT user_id,
                   coalesce(round(sum(CASE WHEN event_type = 'purchase'
                            THEN value END), 4), 0.0) AS purchase,
                   coalesce(round(sum(CASE WHEN event_type = 'click'
                            THEN value END), 4), 0.0) AS click,
                   coalesce(round(sum(CASE WHEN event_type = 'view'
                            THEN value END), 4), 0.0) AS view,
                   coalesce(round(sum(CASE WHEN event_type = 'signup'
                            THEN value END), 4), 0.0) AS signup,
                   coalesce(round(sum(CASE WHEN event_type = 'error'
                            THEN value END), 4), 0.0) AS error
            FROM events GROUP BY user_id
        """,
        doc="Pivot to wide format with explicit value list",
        tags=("§2.11",),
    ),
    "unpivot_lineitem_metrics": QuerySpec(
        spark=unpivot_lineitem_metrics,
        oracle="""
            WITH melted AS (
              SELECT 'l_quantity' AS metric, l_quantity AS value
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', l_extendedprice FROM lineitem
              UNION ALL
              SELECT 'l_discount', l_discount FROM lineitem)
            SELECT metric, count(*) AS n_values,
                   round(sum(value), 4) AS total
            FROM melted GROUP BY metric
        """,
        doc="Unpivot/melt to long format + per-metric summary",
        tags=("§2.11",),
    ),
    "skew_salted_user_rollup": QuerySpec(
        spark=skew_salted_user_rollup,
        oracle="""
            SELECT user_id,
                   count(value) AS n_events,
                   round(sum(value), 4) AS total_value,
                   max(value) AS max_value
            FROM events
            GROUP BY user_id
        """,
        doc="Two-stage salted aggregation ≡ plain GROUP BY (skew defense)",
        tags=("§4", "A1"),
    ),
    "skew_salted_join_priority_revenue": QuerySpec(
        spark=skew_salted_join_priority_revenue,
        oracle="""
            SELECT o.o_orderpriority,
                   count(*) AS n_items,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                     AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        doc="Salted (key, salt) join ≡ plain equi-join (skew defense)",
        tags=("§4", "J1"),
    ),
    "nullsafe_join_counts": QuerySpec(
        spark=nullsafe_join_counts,
        oracle="""
            WITH keyed AS (
              SELECT CASE WHEN event_type <> 'error'
                     THEN TRY_CAST(json_extract_string(props, '$.k')
                                   AS BIGINT) % 5 END AS k,
                     value
              FROM events),
            dim AS (
              SELECT NULL::BIGINT AS k, 'missing' AS bucket
              UNION ALL
              SELECT i, 'bucket_' || i FROM generate_series(0, 4) AS t(i))
            SELECT d.bucket, count(*) AS n_rows,
                   round(sum(keyed.value), 4) AS sum_value
            FROM keyed JOIN dim d ON keyed.k IS NOT DISTINCT FROM d.k
            GROUP BY 1
        """,
        doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM)",
        tags=("§2.11",),
    ),
    "regexp_extract_sources": QuerySpec(
        spark=regexp_extract_sources,
        oracle="""
            SELECT TRY_CAST(regexp_extract(source, 'src(\\d+)', 1)
                            AS BIGINT) AS src_num,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY 1
        """,
        doc="Regex capture-group extraction (SURVEY §2.8 gap)",
        tags=("§2.11", "F5"),
    ),
    "typed_props_parse": QuerySpec(
        spark=typed_props_parse,
        oracle="""
            SELECT json_extract_string(props, '$.missing') IS NULL
                     AS missing_is_null,
                   count(*) AS n_events,
                   CAST(sum(TRY_CAST(json_extract_string(props, '$.k')
                                     AS BIGINT)) AS BIGINT) AS sum_k,
                   min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS min_k,
                   max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS max_k
            FROM events GROUP BY 1
        """,
        doc="Typed from_json parse with static schema (S6 contract form)",
        tags=("S6", "F13", "P10"),
    ),
    "timestamp_parse_roundtrip": QuerySpec(
        spark=timestamp_parse_roundtrip,
        oracle="""
            SELECT strptime(strftime(date_trunc('second', ts),
                                     '%Y-%m-%d %H:%M:%S'),
                            '%Y-%m-%d %H:%M:%S')
                     = date_trunc('second', ts) AS roundtrip_exact,
                   count(*) AS n_events
            FROM events GROUP BY 1
        """,
        doc="String↔timestamp round-trip at seconds grain (F2)",
        tags=("F2", "F3"),
    ),
}
