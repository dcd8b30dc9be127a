"""Hygiene-family scale rehearsal: one decade past fixture scale.

Synthesizes a deterministic N-doc corpus (default 500k docs, ~50
tokens each — an order of magnitude past the 50k-doc measurements in
COVERAGE.md conventions 5/7), lands it as parquet, then times:

  * ``decontaminate``  (train side vs a ~2.4% eval split)
  * ``repetition_report``  (Arrow path)
  * ``unigram_fit`` + ``unigram_score``  (scoped vocab persist)
  * ``incremental_near_dup_batch``  (one arrival batch against a
    pre-seeded signature store — probe cost ∝ batch, not store)
  * ``dedup_paragraphs``  (keep-first line dedup with the registry
    query's three-paragraph augmentation — shared boilerplate + a
    probe paragraph per id%50 group, so the digest groupBy sees hot
    keys with n/50 occurrences)
  * ``pq_fit`` + ``pq_cosine_topk``  (product-quantization train,
    encode, and ADC search over n_docs/5 synthetic 64-dim vectors)
  * ``cms_daily_rollup`` + ``cms_range_estimates``  (count-min cells
    over 10x n_docs synthetic events across 30 days)

Run:  python tools/scale_rehearsal.py [n_docs] [workdir]

Generation is pure-expression (no Python row loops): per-position
vocab picks via xxhash64(id, pos), plus a planted dup plant (every
200th doc copies its predecessor's text) so the near-dup paths do
real candidate work. The corpus is WRITTEN to parquet first so the
timed jobs scan files, not a range-lineage.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from solana_etl_pipeline_spark.session import build_session  # noqa: E402


def size_rehearsal_heap(min_gb: int = 8, cap_gb: int = 64) -> None:
    """Default SPARK_DRIVER_MEMORY to half the machine's available RAM.

    The engine's 8 g default deliberately models a SMALL production
    executor (local[32] at 8 g is ~0.25 g per task slot — tighter than
    any real cluster, where 2-4 g/core is typical). That posture is
    right for tests and the bench, but the multi-decade rehearsals run
    corpora two decades past fixture scale through the same 32 slots,
    and at 10 M docs the concurrent Arrow batches alone exceed it: the
    r11 re-pin reproduced r10's "transient worker loss" as 8
    simultaneous executor heap-space OOMs (GCLocker allocation-retry
    warnings, then OOM → local-mode JVM death; COVERAGE.md convention
    7). Rehearsal entry points therefore size the heap to the machine
    — callers' explicit SPARK_DRIVER_MEMORY always wins.
    """
    if os.environ.get("SPARK_DRIVER_MEMORY"):
        return
    gb = min_gb
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable"):
                    avail_kb = int(line.split()[1])
                    gb = max(min_gb, min(cap_gb, avail_kb // (2 * 1024 * 1024)))
                    break
    except OSError:
        pass
    os.environ["SPARK_DRIVER_MEMORY"] = f"{gb}g"

VOCAB = (
    "the of and to in data table row scan value fast merge batch "
    "spark vector customer order region part supply query join "
    "window stream state shuffle broadcast partition bucket salt "
    "skew sketch rollup delta parquet schema column filter push "
    "down prune codegen arrow pandas numpy hash band bucketed"
).split()
DOC_TOKENS = 50


def build_corpus(spark, n_docs: int, out_dir: str) -> None:
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_TOKENS)),
        lambda i: F.element_at(
            vocab_arr,
            (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(VOCAB))) + 1).cast(
                "int"
            ),
        ),
    )
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
        F.concat(
            F.lit("src"), F.pmod(F.col("id"), F.lit(5)).cast("string")
        ).alias("source"),
    )
    # dup plant: every 200th doc copies its predecessor (same token
    # stream) so near-dup candidate generation does real work
    planted = base.withColumn(
        "text",
        F.when(
            (F.pmod(F.col("doc_id"), F.lit(200)) == 0)
            & (F.col("doc_id") > 0),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(DOC_TOKENS)),
                    lambda i: F.element_at(
                        F.array(*[F.lit(w) for w in VOCAB]),
                        (
                            F.pmod(
                                F.xxhash64(F.col("doc_id") - 1, i),
                                F.lit(len(VOCAB)),
                            )
                            + 1
                        ).cast("int"),
                    ),
                ),
            ),
        ).otherwise(F.col("text")),
    )
    planted.repartition(32).write.mode("overwrite").parquet(out_dir)


def timed(label: str, fn) -> float:
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.1f}s", flush=True)
    return dt


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    workdir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="rehearse_")
    )
    size_rehearsal_heap()
    spark = build_session(app_name="scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = f"{workdir}/corpus"
    print(f"n_docs={n_docs} workdir={workdir}", flush=True)
    timed("generate+land corpus", lambda: build_corpus(spark, n_docs, corpus_dir))
    docs = spark.read.parquet(corpus_dir)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    from solana_etl_pipeline_spark.llm import lm
    from solana_etl_pipeline_spark.llm.decontaminate import decontaminate
    from solana_etl_pipeline_spark.llm.dedup import dedup_cache_scope
    from solana_etl_pipeline_spark.llm.incremental import (
        incremental_near_dup_batch,
    )
    from solana_etl_pipeline_spark.llm.textstats import repetition_report

    is_eval = F.pmod(F.col("doc_id"), F.lit(41)) == 3

    def run_decon():
        with dedup_cache_scope():
            noop(
                decontaminate(
                    docs.filter(~is_eval), docs.filter(is_eval), n=5
                )
            )

    timed("decontaminate", run_decon)
    spark.catalog.clearCache()

    timed("repetition_report", lambda: noop(repetition_report(docs)))
    spark.catalog.clearCache()

    def run_lm():
        with dedup_cache_scope():
            vocab = lm.unigram_fit(docs.filter(~is_eval))
            noop(lm.unigram_score(docs, vocab))

    timed("unigram_fit+score", run_lm)
    spark.catalog.clearCache()

    # incremental: seed the store with 90% of the corpus as batch 0,
    # then time ONE 10%-sized arrival batch (the steady-state cost)
    store = f"{workdir}/store"
    seed = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    arrival = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    timed(
        "incremental seed (batch 0, 90%)",
        lambda: incremental_near_dup_batch(seed, store, 0).count(),
    )
    spark.catalog.clearCache()
    timed(
        "incremental probe (batch 1, 10%)",
        lambda: incremental_near_dup_batch(arrival, store, 1).count(),
    )

    spark.catalog.clearCache()

    # paragraph dedup: same augmentation as the registry query —
    # every doc gains a footer (1/3 shared boilerplate) and a probe
    # paragraph shared by its id%50 group (n/50 occurrences per key)
    from solana_etl_pipeline_spark.llm.paragraphs import dedup_paragraphs

    aug = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("shared boilerplate footer")
            ).otherwise(
                F.concat(F.lit("unique footer "), F.col("doc_id").cast("string"))
            ),
            F.concat(
                F.lit("probe paragraph group "),
                (F.col("doc_id") % 50).cast("string"),
            ),
        ).alias("text"),
    )
    timed("paragraph_dedup", lambda: noop(dedup_paragraphs(aug)))
    spark.catalog.clearCache()

    # round-7 curation trio: C4 line filter and Gopher rules are pure
    # map-side projections (expected ~scan-linear); URL dedup adds one
    # groupBy on the canonical string (corpus/5 distinct keys here)
    from solana_etl_pipeline_spark.llm.curate import (
        c4_line_filter,
        canonical_url,
    )
    from solana_etl_pipeline_spark.llm.textstats import (
        gopher_quality_report,
    )

    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(
                F.lit("document "),
                F.col("doc_id").cast("string"),
                F.lit(" opens with a full proper sentence."),
            ),
            F.lit("short line."),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit("an even doc earns a second proper sentence."),
            ).otherwise(F.lit("no terminal punctuation on this line")),
        ).alias("text"),
    )
    timed("c4_line_filter", lambda: noop(c4_line_filter(lined)))
    rep = gopher_quality_report(F.col("text"))
    timed(
        "gopher_rules",
        lambda: noop(
            docs.select(
                "doc_id", *[e.alias(n) for n, e in rep.items()]
            )
        ),
    )
    urled = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" https://site.example/page/"),
            (F.col("doc_id") % (n_docs // 5 + 1)).cast("string"),
        ).alias("text"),
    )
    from solana_etl_pipeline_spark.llm.substrings import (
        duplicate_span_report,
    )

    boiler = " ".join(f"boil{j}" for j in range(24))
    run_planted = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(boiler)),
            F.concat(F.lit("tail "), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    timed(
        "substring_dedup",
        lambda: noop(duplicate_span_report(run_planted, window=20)),
    )
    timed(
        "url_dedup",
        lambda: noop(
            urled.select(
                "doc_id",
                canonical_url(F.col("text")).alias("canonical_url"),
            )
            .groupBy("canonical_url")
            .agg(
                F.min("doc_id").alias("keep_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
        ),
    )
    spark.catalog.clearCache()

    # PQ: n_docs/5 synthetic 64-dim vectors (expression-generated),
    # landed to parquet like the corpus; train (1 refinement pass),
    # then ADC-search 5 queries over the encoded corpus
    from solana_etl_pipeline_spark.llm.similarity import (
        pq_cosine_topk,
        pq_fit,
    )

    vec_dir = f"{workdir}/vectors"
    n_vecs = max(1000, n_docs // 5)
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000
            ).cast("double")
            / 1000.0,
        ).alias("embedding"),
    )
    vecs.repartition(32).write.mode("overwrite").parquet(vec_dir)
    emb = spark.read.parquet(vec_dir)
    book = []
    timed(
        f"pq_fit ({n_vecs} vecs)",
        lambda: book.append(pq_fit(emb, m=8, ksub=16, dim=64, n_iters=1)),
    )
    timed(
        "pq_topk (encode + ADC + re-rank)",
        lambda: noop(
            pq_cosine_topk(
                emb, emb.filter(F.col("vec_id") < 5), book[0], k=5
            )
        ),
    )
    spark.catalog.clearCache()

    # CMS: 10x n_docs events over 30 days, ~n_docs/100 distinct users
    from solana_etl_pipeline_spark.operators.sketches import (
        cms_daily_rollup,
        cms_range_estimates,
    )

    ev_dir = f"{workdir}/events"
    n_events = n_docs * 10
    types = F.array(*[F.lit(t) for t in ("click", "view", "buy", "err", "sub")])
    spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_interval(days=F.pmod(F.col("id"), F.lit(30)).cast("int"))
            + F.make_interval(
                secs=F.pmod(F.xxhash64("id", F.lit(7)), F.lit(86400)).cast(
                    "double"
                )
            )
        ).alias("ts"),
        F.pmod(F.xxhash64("id"), F.lit(max(10, n_docs // 100))).alias(
            "user_id"
        ),
        F.element_at(
            types, (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5)) + 1).cast("int")
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(100000)) / 1000.0).alias(
            "value"
        ),
    ).repartition(32).write.mode("overwrite").parquet(ev_dir)
    events = spark.read.parquet(ev_dir)

    def run_cms():
        rollup = cms_daily_rollup(events, "user_id", depth=4, width=4096)
        noop(
            cms_range_estimates(
                rollup,
                events.select("user_id").distinct(),
                "user_id",
                depth=4,
                width=4096,
            )
        )

    timed(f"cms rollup+estimates ({n_events} events)", run_cms)

    # --- round-7 additions: editdist / index / quota / scd2 / ohlc /
    # zscore / cohort ---
    from solana_etl_pipeline_spark.llm.dedup import edit_distance_near_dup
    from solana_etl_pipeline_spark.llm.mixture import quota_sample
    from solana_etl_pipeline_spark.llm.ranking import inverted_index
    from solana_etl_pipeline_spark.operators.scd import state_intervals

    timed(
        "edit-distance near-dup",
        lambda: noop(edit_distance_near_dup(docs, "doc_id", "text")),
    )
    timed(
        "inverted index (top-5 postings)",
        lambda: noop(inverted_index(docs, "doc_id", "text", 5)),
    )
    timed(
        "quota sample (k=1000/source)",
        lambda: noop(quota_sample(docs, "source", "doc_id", 1000)),
    )
    timed(
        "scd2 state intervals",
        lambda: noop(
            state_intervals(
                events, "user_id", "event_type", tie_col="event_id"
            )
        ),
    )

    def run_ohlc():
        order_key = F.struct(F.col("ts"), F.col("event_id"))
        noop(
            events.groupBy(
                "event_type", F.date_trunc("hour", "ts").alias("hour")
            ).agg(
                F.min_by("value", order_key).alias("open_value"),
                F.max("value").alias("high_value"),
                F.min("value").alias("low_value"),
                F.max_by("value", order_key).alias("close_value"),
                F.count(F.lit(1)).alias("n_events"),
            )
        )

    timed("ohlc hourly bars", run_ohlc)

    def run_zscore():
        from solana_etl_pipeline_spark.queries.windows import trailing_zscore

        noop(trailing_zscore(events))

    timed("trailing-hour zscore (per-second rollup)", run_zscore)

    def run_cohort():
        uw = events.select(
            "user_id", F.date_trunc("week", "ts").alias("week")
        ).distinct()
        coh = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
        noop(
            uw.join(coh, "user_id")
            .groupBy(
                "cohort_week",
                (F.datediff("week", "cohort_week") / 7)
                .cast("long")
                .alias("week_offset"),
            )
            .agg(F.count_distinct("user_id").alias("n_users"))
        )

    timed("cohort retention", run_cohort)

    # ---- round-7 batch: resample / CDC / drift / graph / analytics ----
    from pyspark.sql import Window

    def run_gapfill():
        hourly = events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        bounds = hourly.groupBy("event_type").agg(
            F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi")
        )
        spine = bounds.select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts"),
        )
        locf = (
            Window.partitionBy("event_type")
            .orderBy("hour_ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        noop(
            spine.join(hourly, ["event_type", "hour_ts"], "left").select(
                "event_type",
                "hour_ts",
                F.last("avg_value", ignorenulls=True).over(locf).alias(
                    "filled"
                ),
            )
        )

    timed("gapfill+locf (hourly rollup + spine)", run_gapfill)

    def run_twa():
        series = Window.partitionBy("user_id", "event_type").orderBy(
            "ts", "event_id"
        )
        us = F.unix_micros(F.col("ts"))
        seg = events.withColumn(
            "dt_us", F.unix_micros(F.lead("ts").over(series)) - us
        ).filter(F.col("dt_us").isNotNull())
        noop(
            seg.groupBy("event_type").agg(
                F.round(
                    F.sum(F.col("value") * F.col("dt_us"))
                    / F.sum("dt_us"),
                    6,
                ).alias("twa")
            )
        )

    timed("time-weighted average", run_twa)

    def run_psi():
        from solana_etl_pipeline_spark.operators.drift import psi_report

        noop(
            psi_report(
                events,
                "event_type",
                "value",
                is_current=F.dayofmonth("ts") >= 15,
            )
        )

    timed("psi drift report", run_psi)

    def run_cdc():
        from solana_etl_pipeline_spark.operators.cdc import apply_changes

        base = docs.select("doc_id", "text")
        feed = (
            docs.filter(F.col("doc_id") % 10 == 0)
            .select(
                "doc_id",
                F.pmod(F.xxhash64("doc_id"), F.lit(5)).alias("seq"),
                F.when(F.col("doc_id") % 30 == 0, F.lit("delete"))
                .otherwise(F.lit("upsert"))
                .alias("op"),
                F.concat(F.lit("v2 "), F.col("text")).alias("text"),
            )
        )
        noop(apply_changes(base, feed, key="doc_id"))

    timed("cdc apply (10% change feed)", run_cdc)

    def run_interval():
        from solana_etl_pipeline_spark.operators.intervals import (
            interval_coverage,
        )

        noop(interval_coverage(events, "user_id", "ts", hold_seconds=1800))

    timed("interval coverage (gaps-and-islands)", run_interval)

    def run_paths():
        by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
        us = F.unix_micros(F.col("ts"))
        prev = F.unix_micros(F.lag("ts").over(by_user))
        sess = events.withColumn(
            "session_id",
            F.sum(
                F.when(prev.isNull() | (us - prev > 1800 * 1_000_000), 1)
                .otherwise(0)
            ).over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
        )
        in_s = Window.partitionBy("user_id", "session_id").orderBy(
            "ts", "event_id"
        )
        first3 = sess.withColumn("rn", F.row_number().over(in_s)).where(
            F.col("rn") <= 3
        )
        paths = first3.groupBy("user_id", "session_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
        noop(paths.groupBy("path").agg(F.count(F.lit(1)).alias("n")))

    timed("session paths (first-3)", run_paths)

    def run_transition():
        by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
        noop(
            events.withColumn(
                "next_type", F.lead("event_type").over(by_user)
            )
            .filter(F.col("next_type").isNotNull())
            .groupBy("event_type", "next_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    timed("transition matrix", run_transition)

    def run_rfm():
        buys = events.where(F.col("event_type") == "buy").select(
            "user_id", F.unix_micros("ts").alias("ts_us"), "value"
        )
        ref = buys.agg(F.max("ts_us").alias("ref_us"))
        per_user = (
            buys.groupBy("user_id")
            .agg(
                F.max("ts_us").alias("last_us"),
                F.count(F.lit(1)).alias("frequency"),
                F.round(F.sum("value"), 6).alias("monetary"),
            )
            .crossJoin(F.broadcast(ref))
            .select(
                "user_id",
                F.floor(
                    (F.col("ref_us") - F.col("last_us"))
                    / F.lit(86_400_000_000)
                ).alias("recency_days"),
                "frequency",
                F.floor("monetary").alias("monetary_band"),
            )
        )
        from solana_etl_pipeline_spark.queries.analytics import (
            _value_quantile_tiles,
        )

        tiled = _value_quantile_tiles(
            per_user, "recency_days", "r_tile", ascending=True
        )
        tiled = _value_quantile_tiles(
            tiled, "frequency", "f_tile", ascending=False
        )
        tiled = _value_quantile_tiles(
            tiled, "monetary_band", "m_tile", ascending=False
        )
        noop(
            tiled.groupBy("r_tile", "f_tile", "m_tile").agg(
                F.count(F.lit(1)).alias("n_users")
            )
        )

    timed("rfm segmentation", run_rfm)

    def run_benford():
        digit = F.substring(
            F.round(F.col("value") * 100).cast("bigint").cast("string"),
            1,
            1,
        ).cast("int")
        noop(
            events.where(F.col("value") > 0)
            .select(digit.alias("digit"))
            .groupBy("digit")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    timed("benford digit rollup", run_benford)

    def run_pagerank():
        from solana_etl_pipeline_spark.operators.graph import pagerank

        # bipartite user↔community graph, |E| ≈ 3 per user
        edges = events.select(
            (F.col("user_id") * 2).alias("src"),
            (F.pmod(F.xxhash64("user_id", "event_type"), F.lit(997)) * 2
             + 1).alias("dst"),
        ).distinct()
        noop(
            pagerank(
                edges, n_iter=3, dedup_edges=False, broadcast_ranks=True
            )
        )

    timed("pagerank (3 iters, bipartite)", run_pagerank)

    def run_basket():
        # baskets = (user, day); items = 8 hashed value buckets
        items = events.select(
            F.struct("user_id", F.to_date("ts").alias("d")).alias("okey"),
            F.pmod(F.xxhash64("value"), F.lit(8)).alias("p"),
        ).distinct()
        a, b = items.alias("a"), items.alias("b")
        pairs = (
            a.join(b, "okey")
            .where(F.col("a.p") < F.col("b.p"))
            .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
            .agg(F.count(F.lit(1)).alias("pair_cnt"))
        )
        noop(pairs)

    timed("basket pairs (bounded per-basket fan-out)", run_basket)

    def run_pmi():
        from solana_etl_pipeline_spark.llm.ranking import pmi_bigrams

        noop(pmi_bigrams(docs, min_count=5, k=20))

    timed("pmi bigrams", run_pmi)

    def run_weighted():
        from solana_etl_pipeline_spark.llm.mixture import weighted_sample

        weighted = docs.select(
            "doc_id", F.length("text").cast("double").alias("w")
        )
        noop(weighted_sample(weighted, "doc_id", "w", k=1000))

    timed("weighted sample (ES A-Res)", run_weighted)

    # ---- round-7 third batch: seasonal / ewma / attribution /
    #      profile / overlap family ----
    def run_seasonal():
        keyed = events.select(
            "event_id",
            "event_type",
            "value",
            F.weekday("ts").alias("dow"),
            F.hour("ts").alias("hod"),
        )
        profile = keyed.groupBy("event_type", "dow", "hod").agg(
            F.round(F.avg("value"), 6).alias("seasonal")
        )
        noop(
            keyed.join(F.broadcast(profile), ["event_type", "dow", "hod"])
            .select(
                "event_id",
                F.round(F.col("value") - F.col("seasonal"), 6).alias("r"),
            )
            .orderBy(F.desc(F.abs(F.col("r"))), "event_id")
            .limit(20)
        )

    timed("seasonal anomalies (profile broadcast)", run_seasonal)

    def run_ewma():
        hourly = events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
        ).agg(F.round(F.avg("value"), 6).alias("avg_value"))
        w_arr = F.array(*[F.lit(round(0.7**k, 12)) for k in range(20)])
        contrib = hourly.select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(19))).alias("k"),
            F.col("hour_ts").alias("obs_hour"),
            "avg_value",
        ).select(
            "event_type",
            (
                F.col("obs_hour")
                + F.make_interval(hours=F.col("k").cast("int"))
            ).alias("hour_ts"),
            F.element_at(w_arr, F.col("k").cast("int") + 1).alias("w"),
            "avg_value",
        )
        noop(
            contrib.groupBy("event_type", "hour_ts").agg(
                F.round(
                    F.sum(F.col("w") * F.col("avg_value")) / F.sum("w"), 6
                ).alias("ewma")
            )
        )

    timed("ewma (explode over rollup)", run_ewma)

    def run_attr():
        from pyspark.sql import Window as W

        us = F.unix_micros(F.col("ts"))
        w = (
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        touch = F.last(
            F.when(
                F.col("event_type") != "buy",
                F.struct(us.alias("t_us"), F.col("event_type").alias("t")),
            ),
            ignorenulls=True,
        ).over(w)
        noop(
            events.withColumn("u_us", us)
            .withColumn("touch", touch)
            .where(F.col("event_type") == "buy")
            .groupBy(F.col("touch.t").alias("t"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    timed("last-touch attribution", run_attr)

    def run_profile():
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for col in ("event_id", "user_id", "value", "event_type"):
            aggs.append(
                F.sum(F.col(col).isNull().cast("bigint")).alias(f"nl_{col}")
            )
            aggs.append(F.count_distinct(F.col(col)).alias(f"nd_{col}"))
        noop(events.agg(*aggs))

    timed("column profile (multi-distinct Expand)", run_profile)

    def run_hll_overlap():
        sk = events.groupBy("event_type").agg(
            F.hll_sketch_agg("user_id").alias("sk")
        )
        a = sk.select(F.col("event_type").alias("ea"), F.col("sk").alias("sa"))
        b = sk.select(F.col("event_type").alias("eb"), F.col("sk").alias("sb"))
        noop(
            a.join(b, F.col("ea") < F.col("eb")).select(
                "ea",
                "eb",
                (
                    F.hll_sketch_estimate("sa")
                    + F.hll_sketch_estimate("sb")
                    - F.hll_sketch_estimate(F.hll_union("sa", "sb"))
                ).alias("overlap_est"),
            )
        )

    timed("hll overlap (sketch-side only)", run_hll_overlap)

    def run_vocab_overlap():
        from solana_etl_pipeline_spark.llm import tokenize

        sv = docs.select(
            "source", F.explode(tokenize.words(F.col("text"))).alias("w")
        ).distinct()
        x = sv.select(F.col("source").alias("sa"), "w")
        y = sv.select(F.col("source").alias("sb"), "w")
        noop(
            x.join(y, "w")
            .where(F.col("sa") < F.col("sb"))
            .groupBy("sa", "sb")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )

    timed("vocab overlap (pair join)", run_vocab_overlap)

    def run_centroids():
        noop(
            emb.select(
                (F.col("vec_id") % 10).alias("label"),
                F.posexplode("embedding").alias("dim", "x"),
            )
            .groupBy("label", "dim")
            .agg(F.round(F.avg("x"), 6).alias("centroid"))
        )

    timed("label centroids (posexplode)", run_centroids)

    if len(sys.argv) <= 2:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
