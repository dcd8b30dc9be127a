"""Scale-mechanism tests: bucketed co-located joins (shuffle
elimination), persist/cache reuse (T9/X6), and plan-shape audits
(pushdown, broadcast) for the queries that must hold at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.queries import QUERIES
from solana_etl_pipeline_spark.sources import load_table


from solana_etl_pipeline_spark.plans import (
    assert_plan,
    capture_pre_checkpoint_plans as _capture_plans,
    executed_plan as _executed_plan,
    formatted_explain as _optimized_explain,
    scan_info,
)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key join WITHOUT an
    Exchange — the co-location mechanism for repeated big-big joins."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    left = ev.select("event_id", "user_id", "value")
    right = ev.select("event_id", "event_type")
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    (left.write.bucketBy(4, "event_id").sortBy("event_id")
         .mode("overwrite").saveAsTable("b_left"))
    (right.write.bucketBy(4, "event_id").sortBy("event_id")
          .mode("overwrite").saveAsTable("b_right"))
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # small tables would otherwise broadcast; the point here is the
        # big-big case, where bucketing must eliminate the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_left").join(spark.table("b_right"), "event_id")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_persist_reuse(spark, sf_dir):
    """T9/X6: an explicitly persisted intermediate is marked cached and
    serves multiple downstream actions."""
    ev = load_table(spark, sf_dir, "events")
    snapshot = ev.filter(F.col("event_type") == "purchase").persist()
    try:
        n1 = snapshot.count()
        n2 = snapshot.select(F.sum("value")).collect()[0][0]
        assert n1 > 0 and n2 is not None
        assert snapshot.storageLevel.useMemory
        assert "InMemoryTableScan" in _executed_plan(snapshot.groupBy().count())
    finally:
        snapshot.unpersist()


def test_scan_pushdown_projection_and_filter(spark, sf_dir):
    """X1/X2: the narrow projection + equality predicate reach the
    parquet scan (PushedFilters + pruned ReadSchema)."""
    df = QUERIES["events_project_filter"].spark(spark, sf_dir)
    plan = _optimized_explain(df)
    assert "PushedFilters" in plan and "EqualTo(event_type,purchase)" in plan
    assert "ReadSchema" in plan
    # only the needed columns are read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("event_id", "user_id", "value", "event_type"):
        assert col in read_schema
    assert "props" not in read_schema and "ts" not in read_schema


def test_q6_predicates_all_pushed(spark, sf_dir):
    plan = _optimized_explain(
        QUERIES["tpch_q6_forecast_revenue"].spark(spark, sf_dir)
    )
    assert "PushedFilters" in plan
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in plan


def test_broadcast_joins_in_q5(spark, sf_dir):
    plan = _executed_plan(
        QUERIES["tpch_q5_local_supplier_volume"].spark(spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    plan = _executed_plan(QUERIES["risk_scores_topk"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """Audit every registered batch query plan: no accidental cartesian
    or broadcast nested-loop joins (the llm cosine brute force is the
    one sanctioned crossJoin — a broadcast of 5 query vectors)."""
    # cosine brute-force broadcasts 5 query vectors; IVF broadcasts an
    # 8-row codebook; the sketch rollup combines two 1-row scalar
    # aggregates — all deliberate small-side cross joins
    sanctioned = {
        "llm_cosine_topk",
        "llm_lsh_cosine_topk",
        "sketch_rollup_distinct_users",
        # ranking: N / avgdl ride 1-row broadcast scalar combines
        "llm_tfidf_top_terms",
        "llm_bm25_search",
        # LM scoring: (N, V) totals ride a 1-row broadcast scalar
        "llm_lm_quality_score",
        # CCNet buckets reuse the LM scoring plan (same 1-row (N, V)
        # scalar combine) before the per-source ntile window
        "llm_ccnet_buckets",
        # DSIR: the two pool totals ride 1-row broadcast scalars into
        # the <= n_buckets ratio table (index metadata, never corpus)
        "llm_dsir_select",
        # NB scoring: per-label stats (|labels| rows, tens) + two
        # 1-row scalars (V, D) ride broadcast cross joins — the
        # doc×label fan-out is the NB scoring shape, bounded by the
        # label count, never corpus×corpus
        "llm_nb_source_classifier",
        # SemDeDup / IVF / IVF-PQ no longer need sanctioning: coarse
        # assignment is a closure-captured Arrow matmul (no codebook
        # crossJoin remains in their plans)
        # PQ: the 5 query vectors (with their ADC lookup tables)
        # broadcast into the code scan — same contract as the brute
        # cosine probe; the corpus side carries codes, not vectors
        "llm_pq_cosine_topk",
        # histogram quantiles: the 1-row total broadcasts into the
        # ≤ n_bins cumsum rows (a rollup-sized combine, never corpus)
        "agg_histogram_quantiles",
        # funnel: the 1-row step-1 count broadcasts into the
        # per-step count rows for the conversion ratio
        "funnel_conversion_steps",
        # PMI: the two corpus totals (tokens, bigrams) ride a 1-row
        # broadcast scalar combine into the vocab-bounded bigram table
        "llm_pmi_bigrams",
        # Pareto: the 1-row total-revenue scalar broadcasts into the
        # 100 surviving top-k rows for the cumulative share
        "pareto_top_parts",
        # basket rules: the 1-row order-count scalar broadcasts into
        # the min-support-filtered pair table for support/lift ratios
        "basket_part_pairs",
        # RFM: the 1-row max-purchase-ts scalar broadcasts into the
        # per-user metric rollup for the recency offset
        "user_rfm_segments",
        # FK audit: six (1-row total × 1-row orphan-count) scalar
        # combines, one per relationship — never row-level data
        "data_ref_integrity",
        # HLL overlap: the pair enumeration is a 5-row × 5-row
        # sketch-table theta self-join (event-type dimension scale)
        "sketch_hll_overlap",
        # skew report: the 1-row (total, n_keys) scalar broadcasts
        # onto the 10 surviving top-k rows
        "data_skew_report",
        # column profile (r16): the plain-stats and multi-distinct
        # aggregates run as separate passes combined by a 1-row ×
        # 1-row broadcast scalar cross join — the mixed form planned
        # one Expand ×7 with every plain agg duplicated onto the
        # expanded rows (measured 2-3× slower and a 7×-row shuffle at
        # scale)
        "profile_events_columns",
    }
    offenders = []
    for name, spec in QUERIES.items():
        if name in sanctioned or name.startswith("streaming"):
            continue
        if name.startswith(("sink_", "enrich_http")):
            continue  # write temp dirs; plan shape covered elsewhere
        # capture the pre-checkpoint plans too: the iterative queries
        # (connected components, PageRank) truncate lineage per round,
        # so their final plan is a bare checkpoint scan and only the
        # captured per-round plans contain the joins this gate audits
        with _capture_plans() as staged:
            plans = [_executed_plan(spec.spark(spark, sf_dir))]
        plans += [s["plan"] for s in staged]
        if any(
            "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p
            for p in plans
        ):
            offenders.append(name)
    assert not offenders, offenders


def test_pre_checkpoint_capture_is_thread_isolated(monkeypatch):
    """Two concurrent capture scopes must not interleave stage records
    or restore each other's buffer — the buffer is a ContextVar, not a
    module global (ADVICE r9). Pure driver-side test: executed_plan is
    stubbed so no Spark session is needed."""
    import threading

    from solana_etl_pipeline_spark.plans import audit

    monkeypatch.setattr(audit, "executed_plan", lambda df: f"plan<{df}>")

    results: dict[str, list] = {}
    barrier = threading.Barrier(2)

    def worker(tag: str) -> None:
        with audit.capture_pre_checkpoint_plans() as captured:
            barrier.wait()  # both scopes active simultaneously
            for i in range(50):
                audit.record_pre_checkpoint(f"{tag}:{i}", tag)
            barrier.wait()  # neither exits before both recorded
        results[tag] = captured

    threads = [
        threading.Thread(target=worker, args=(t,)) for t in ("a", "b")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for tag in ("a", "b"):
        stages = [r["stage"] for r in results[tag]]
        assert stages == [f"{tag}:{i}" for i in range(50)]
        assert all(r["plan"] == f"plan<{tag}>" for r in results[tag])
    # and outside any scope, record is a no-op
    audit.record_pre_checkpoint("outside", "x")


def test_context_thread_carries_capture_scope(monkeypatch):
    """Threaded query construction inside a capture scope must still
    record when spawned via context_thread (VERDICT r11 task 4):
    contextvars don't follow raw threads, so the helper runs the
    worker body in a copy of the spawning context — the worker
    appends to the same captured list the scope yielded. A bare
    Thread, by contrast, records nothing (the documented and pinned
    limitation, kept visible so a regression in either direction
    trips)."""
    import threading

    from solana_etl_pipeline_spark.plans import audit

    monkeypatch.setattr(audit, "executed_plan", lambda df: f"plan<{df}>")

    with audit.capture_pre_checkpoint_plans() as captured:
        t = audit.context_thread(
            audit.record_pre_checkpoint, "in-worker", "w"
        )
        bare = threading.Thread(
            target=audit.record_pre_checkpoint, args=("bare-worker", "b")
        )
        t.start(), bare.start()
        t.join(), bare.join()
        audit.record_pre_checkpoint("in-main", "m")

    stages = [r["stage"] for r in captured]
    assert "in-worker" in stages  # context_thread: buffer followed
    assert "in-main" in stages
    assert "bare-worker" not in stages  # raw threads stay blind


def test_deep_tpch_topk_compiles_to_take_ordered(spark, sf_dir):
    """Q3/Q10/Q18 end in limit-after-sort: must be a per-partition heap
    merge (TakeOrderedAndProject), never a global Sort."""
    for name in (
        "tpch_q3_shipping_priority",
        "tpch_q10_returned_items",
        "tpch_q18_large_orders",
    ):
        assert_plan(
            QUERIES[name].spark(spark, sf_dir),
            require=("TakeOrderedAndProject",),
        )


def test_q4_exists_plans_left_semi(spark, sf_dir):
    """The EXISTS predicate must become a semi join (no row fanout
    from duplicate matching lineitems)."""
    plan = _executed_plan(QUERIES["tpch_q4_order_priority"].spark(spark, sf_dir))
    assert "LeftSemi" in plan, plan


def test_q21_decorrelates_to_semi_plus_anti(spark, sf_dir):
    """EXISTS + NOT EXISTS over self-aliased lineitem: Catalyst must
    plan one semi and one anti join, not a nested-loop re-scan."""
    plan = _executed_plan(QUERIES["tpch_q21_waiting_supplier"].spark(spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_q19_shared_quantity_envelope_pushed(spark, sf_dir):
    """The OR-clauses share a 1..30 l_quantity envelope; that bound
    must reach the lineitem parquet scan even though the full
    disjunction can only evaluate post-join."""
    scans = scan_info(QUERIES["tpch_q19_disjunctive_filter"].spark(spark, sf_dir))
    li_scans = [
        s for s in scans if "l_quantity" in s.get("pushed_filters", "")
    ]
    assert li_scans, scans


def test_derived_tpch_plan_shapes(spark, sf_dir):
    """Q16's NOT IN must become an anti join (blocklist is provably
    non-null → no null-aware BNLJ), Q20's nested IN a semi join, and
    Q2's correlated min a window over the joined slice."""
    assert_plan(
        QUERIES["tpch_q16_parts_supplier_cnt"].spark(spark, sf_dir),
        require=("LeftAnti",),
        forbid=("BroadcastNestedLoopJoin", "CartesianProduct"),
    )
    assert_plan(
        QUERIES["tpch_q20_promotion_suppliers"].spark(spark, sf_dir),
        require=("LeftSemi",),
        forbid=("CartesianProduct",),
    )
    assert_plan(
        QUERIES["tpch_q2_min_cost_supplier"].spark(spark, sf_dir),
        require=("Window",),
        forbid=("CartesianProduct",),
    )


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """The 100 TB mechanism for star joins over date-partitioned facts:
    a selective dim filter must reach the fact scan as a runtime
    partition filter (DPP), so only matching day= directories are read
    — without it, a 365-day fact scans all partitions for a 3-day
    query."""
    from pyspark.sql import functions as F

    fact_path = str(tmp_path / "fact")
    (
        spark.range(5000)
        .select(
            F.col("id"),
            (F.col("id") % 20).alias("day"),
            (F.col("id") * 2).alias("val"),
        )
        .write.partitionBy("day")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.range(20).select(
        F.col("id").alias("day"),
        F.when(F.col("id") < 3, "hot").otherwise("cold").alias("tag"),
    )
    joined = fact.join(dim, "day").filter(F.col("tag") == "hot")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the pruned result is still correct: days 0,1,2 only
    assert joined.select("day").distinct().count() == 3


def test_runtime_bloom_filter_reduces_shuffle_join_probe(spark, tmp_path):
    """Runtime row-level filtering for shuffle joins (the non-partition
    cousin of DPP): with a selective creation side, the optimizer
    injects a bloom filter (might_contain) on the probe side's scan so
    non-matching rows drop before the shuffle. At 100 TB this is the
    difference between shuffling the full fact and shuffling ~the
    matching keys."""
    from pyspark.sql import functions as F

    big_p = str(tmp_path / "big")
    small_p = str(tmp_path / "small")
    (
        spark.range(200_000)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        .write.parquet(big_p)
    )
    (
        spark.range(100)
        .select((F.col("id") * 1000).alias("k"), F.lit("x").alias("t"))
        .write.parquet(small_p)
    )
    old = {
        c: spark.conf.get(c, None)
        for c in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # local fixtures are far below the 10 GB production threshold,
        # and a broadcast join would not need the filter at all — force
        # the shuffle-join shape the mechanism exists for
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.read.parquet(big_p)
        small = spark.read.parquet(small_p).filter(F.col("t") == "x")
        joined = big.join(small, "k")
        opt = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt or "bloom" in opt.lower(), opt[:2000]
        assert joined.count() == 100
    finally:
        for c, v in old.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)


def test_hygiene_family_plan_shapes(spark, sf_dir):
    """r5 corpus-hygiene operators: the map-side ops stay shuffle-free
    and the probes broadcast — the shapes that make them free at
    100 TB."""
    # repetition + chunking: zero exchanges (embarrassingly parallel)
    for name in ("llm_repetition_rules", "llm_chunk_documents"):
        plan = _executed_plan(QUERIES[name].spark(spark, sf_dir))
        assert "Exchange" not in plan, name
    # decontamination: the eval probe is a broadcast join; the train
    # side has no SortMergeJoin anywhere
    plan = _executed_plan(QUERIES["llm_decontaminate"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # LM scoring: vocab probe broadcasts too
    plan = _executed_plan(QUERIES["llm_lm_quality_score"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # split assignment: single aggregation exchange, no join at all
    plan = _executed_plan(QUERIES["llm_split_assign"].spark(spark, sf_dir))
    assert "Join" not in plan
