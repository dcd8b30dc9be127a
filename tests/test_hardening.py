"""Round-5 hardening contracts: scale-aware gold writes, the
parquet/delta sink seam, the brute-force query-side guard, scoped
dedup caches, and compaction over the incremental signature store."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.oracle_utils import assert_matches_oracle
from solana_etl_pipeline_spark.llm.dedup import (
    dedup_cache_scope,
    embedding_near_dup_pairs,
    minhash_near_dup_pairs,
    ngram_jaccard_for_pairs,
    simhash_candidate_pairs,
)
from solana_etl_pipeline_spark.llm.incremental import (
    incremental_near_dup_batch,
)
from solana_etl_pipeline_spark.llm.similarity import cosine_topk
from solana_etl_pipeline_spark.pipelines.gold import write_gold
from solana_etl_pipeline_spark.sources.sinks import (
    compact_parquet_dir,
    resolve_sink_format,
    write_parquet,
)


# ---------------------------------------------------------------- gold


def _fake_gold(spark, n: int):
    return spark.range(n).select(
        F.concat(F.lit("mint"), F.col("id")).alias("mint"),
        (F.col("id") % 97).cast("double").alias("risk_score"),
    )


def test_write_gold_sizes_files_from_rows(spark, tmp_path):
    """The mint dimension grows with the corpus: the gold writer must
    fan out above the per-file target instead of funnelling through a
    single coalesced task."""
    path = tmp_path / "gold_multi"
    write_gold(_fake_gold(spark, 250), str(path), target_rows_per_file=100)
    files = list(path.glob("*.parquet"))
    assert len(files) == 3  # ceil(250 / 100)
    got = spark.read.parquet(str(path))
    assert got.count() == 250
    assert got.select(F.countDistinct("mint")).collect()[0][0] == 250


def test_write_gold_small_table_single_file(spark, tmp_path):
    """Below the target the dashboard still gets one tidy file."""
    path = tmp_path / "gold_single"
    write_gold(_fake_gold(spark, 50), str(path))
    assert len(list(path.glob("*.parquet"))) == 1
    assert spark.read.parquet(str(path)).count() == 50


# ------------------------------------------------------ sink format seam


def test_sink_format_seam_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "seam")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("p")
    )
    write_parquet(df, path, partition_cols=["p"], mode="overwrite",
                  format="parquet")
    got = spark.read.parquet(path)
    assert got.count() == 10
    assert {r.p for r in got.select("p").distinct().collect()} == {0, 1}


def test_sink_format_seam_rejects_unknown(spark):
    with pytest.raises(ValueError, match="unsupported sink format"):
        resolve_sink_format("orc-ish")


def test_sink_format_seam_delta_needs_package():
    try:
        import delta  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="delta-spark"):
            resolve_sink_format("delta")
    else:  # pragma: no cover - not this container
        assert resolve_sink_format("delta") == "delta"


def test_sink_format_seam_delta_writer_wiring(spark, monkeypatch, tmp_path):
    """Exercise the delta BRANCH of the seam without delta-spark: with
    an importable ``delta`` module faked in, ``write_parquet(...,
    format='delta')`` must thread ``delta`` through
    ``resolve_sink_format`` into the DataFrameWriter's ``.format()``
    call with mode/partitioning intact. The real ``.save()`` stays
    env-gated (no Delta JVM classes here), so it is intercepted and
    recorded instead of executed."""
    import sys
    import types

    from pyspark.sql.readwriter import DataFrameWriter

    monkeypatch.setitem(sys.modules, "delta", types.ModuleType("delta"))
    assert resolve_sink_format("delta") == "delta"

    calls: dict[str, object] = {}
    orig_format = DataFrameWriter.format
    orig_partition_by = DataFrameWriter.partitionBy
    orig_mode = DataFrameWriter.mode

    def rec_format(self, source):
        calls["format"] = source
        return orig_format(self, "parquet" if source == "delta" else source)

    def rec_partition_by(self, *cols):
        calls["partitionBy"] = cols
        return orig_partition_by(self, *cols)

    def rec_mode(self, saveMode):
        calls["mode"] = saveMode
        return orig_mode(self, saveMode)

    def rec_save(self, path=None, **kw):
        calls["save_path"] = path

    monkeypatch.setattr(DataFrameWriter, "format", rec_format)
    monkeypatch.setattr(DataFrameWriter, "partitionBy", rec_partition_by)
    monkeypatch.setattr(DataFrameWriter, "mode", rec_mode)
    monkeypatch.setattr(DataFrameWriter, "save", rec_save)

    df = spark.range(4).select(F.col("id"), (F.col("id") % 2).alias("p"))
    path = str(tmp_path / "delta_seam")
    write_parquet(df, path, partition_cols=["p"], mode="overwrite",
                  format="delta")

    assert calls["format"] == "delta"
    assert calls["partitionBy"] == ("p",)
    assert calls["mode"] == "overwrite"
    assert calls["save_path"] == path


# -------------------------------------------- witness-staleness gate


def test_correctness_witnesses_not_stale():
    """Prefix-rotation invariant (README 'Prefix rotation'): every
    driver-witnessed query's most recent green CORRECTNESS row is at
    most ``invariant_bound()`` rounds old — ceil(N_queries / 50), the
    tightest bound a 50-row-per-round rotation can arithmetically
    satisfy (plus its built-in backlog-slack round; see
    tools/staleness.py). A missed rotation trips this test one round
    later instead of silently aging the evidence."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    try:
        from tools.staleness import (
            invariant_bound,
            load_witness_rounds,
            registry_names,
        )
    finally:
        sys.path.pop(0)

    latest, last_green = load_witness_rounds()
    if latest == 0:  # pragma: no cover - fresh checkout without rows
        pytest.skip("no CORRECTNESS files on disk")
    names = registry_names()
    bound = invariant_bound(len(names))
    over = {
        n: latest - last_green[n]
        for n in names
        if n in last_green and latest - last_green[n] > bound
    }
    assert not over, (
        f"correctness witnesses older than the invariant bound "
        f"(staleness <= {bound} = ceil({len(names)}/50); regenerate "
        f"_PRIORITY with `python tools/staleness.py`): {over}"
    )


# ------------------------------------------------- brute-force guard


def _embeddings(spark, n: int, dim: int = 8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[((F.col("id") * (i + 3)) % 11 + 1).cast("double")
              for i in range(dim)]
        ).alias("embedding"),
    )


def test_cosine_topk_guards_large_query_side(spark):
    emb = _embeddings(spark, 30)
    with pytest.raises(ValueError, match="lsh_cosine_topk"):
        cosine_topk(emb, emb, k=2, max_queries=10)


def test_cosine_topk_small_or_opted_out_query_side_runs(spark):
    emb = _embeddings(spark, 30)
    assert cosine_topk(emb, emb.limit(3), k=2).count() == 6
    # explicit opt-out: caller takes responsibility for sizing
    assert (
        cosine_topk(emb.limit(12), emb.limit(12), k=1,
                    max_queries=None).count() == 12
    )


# --------------------------------------------------- dedup cache scope


def _cached_rdd_ids(spark) -> set[int]:
    return {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keys()}


def _docs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog near the old wall",
        "the quick brown fox jumps over the sleepy dog near the old wall",
        "columnar engines shuffle partitions with vectorized operators",
        "completely different text about rivers mountains and valleys",
    ]
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


@pytest.mark.parametrize("api", ["minhash", "jaccard", "simhash", "embedding"])
def test_dedup_cache_scope_releases_persists(spark, api):
    """Every pair generator pins intermediates; consuming inside
    dedup_cache_scope must leave zero NEW cached RDDs behind (delta
    check: the shared session may legitimately hold other caches)."""
    docs = _docs(spark)
    before = _cached_rdd_ids(spark)
    with dedup_cache_scope():
        if api == "minhash":
            out = minhash_near_dup_pairs(docs, "doc_id", "text")
        elif api == "jaccard":
            pairs = spark.createDataFrame([Row(id_a=0, id_b=1)])
            out = ngram_jaccard_for_pairs(docs, pairs, "doc_id", "text")
        elif api == "simhash":
            out = simhash_candidate_pairs(docs, "doc_id", "text")
        else:
            out = embedding_near_dup_pairs(_embeddings(spark, 20))
        out.count()  # action inside the scope: caches are live here
        assert _cached_rdd_ids(spark) - before  # something WAS pinned
    assert _cached_rdd_ids(spark) - before == set()


def test_dedup_cache_scopes_nest(spark):
    docs = _docs(spark)
    before = _cached_rdd_ids(spark)
    with dedup_cache_scope():
        minhash_near_dup_pairs(docs, "doc_id", "text").count()
        outer_pinned = _cached_rdd_ids(spark) - before
        with dedup_cache_scope():
            simhash_candidate_pairs(docs, "doc_id", "text").count()
        # inner scope released only its own persists
        assert _cached_rdd_ids(spark) - before == outer_pinned
    assert _cached_rdd_ids(spark) - before == set()


# ------------------------------- incremental store + compaction loop


def _batch(spark, batch: int, n: int = 4):
    """Distinct documents (token-disjoint across batches and docs, so
    zero accidental near-dups)."""
    rows = [
        Row(
            doc_id=100 * batch + i,
            text=" ".join(f"w{batch}x{i}y{j}" for j in range(20)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "in the warm sun and the birds sing in the tall green trees near "
    "the old stone wall by the river bank"
)


def test_incremental_store_survives_compaction(spark, tmp_path):
    """The 100 TB operational loop end-to-end: land many small batches
    -> compact the signature store -> later probes still match, and a
    replayed batch stays idempotent against the compacted leaves."""
    store = tmp_path / "store"
    b0 = _batch(spark, 0).union(
        spark.createDataFrame([Row(doc_id=99, text=BASE)])
    )
    assert incremental_near_dup_batch(b0, str(store), batch_id=0).count() == 0
    for b in range(1, 6):
        v = incremental_near_dup_batch(_batch(spark, b), str(store),
                                       batch_id=b)
        assert v.count() == 0  # token-disjoint: no dups yet

    sigs_dir = store / "sigs"
    bands_dir = store / "bands"
    n_sigs_before = spark.read.parquet(str(sigs_dir)).count()
    batches_before = {
        d.name for d in sigs_dir.iterdir() if d.name.startswith("batch_id=")
    }
    assert len(batches_before) == 6

    # maintenance pass over both store tables
    assert compact_parquet_dir(spark, str(sigs_dir)) >= 1
    assert compact_parquet_dir(spark, str(bands_dir)) >= 1
    # partition tree preserved, no rows lost, no residue dirs
    assert {
        d.name for d in sigs_dir.iterdir() if d.is_dir()
    } == batches_before
    assert spark.read.parquet(str(sigs_dir)).count() == n_sigs_before

    # probe against the compacted index: a near-dup of the batch-0 doc
    probe = spark.createDataFrame(
        [Row(doc_id=600, text=BASE.replace("lazy", "sleepy"))]
    )
    v6 = incremental_near_dup_batch(probe, str(store), batch_id=6).collect()
    assert {(r.new_id, r.dup_of, r.scope) for r in v6} == {(600, 99, "index")}

    # replay an old batch id against the compacted store: dynamic
    # partition overwrite replaces exactly its own leaf — store row
    # count and verdicts unchanged
    v3 = incremental_near_dup_batch(_batch(spark, 3), str(store), batch_id=3)
    assert v3.count() == 0
    assert spark.read.parquet(str(sigs_dir)).count() == n_sigs_before + 1
    # and the compacted index still answers a second probe correctly
    v7 = incremental_near_dup_batch(
        spark.createDataFrame([Row(doc_id=700, text=BASE)]), str(store),
        batch_id=7,
    )
    got = {(r.new_id, r.dup_of, r.scope) for r in v7.collect()}
    assert (700, 99, "index") in got and (700, 600, "index") in got


# ------------------------------------------- shingle twin parity


def test_shingle_sets_pandas_matches_expression_twin(spark):
    """The Arrow-batched shingler is the hot path; the pure-expression
    twin is the semantic reference. Pin them identical on every edge:
    null text, empty, whitespace runs/tabs, fewer words than the
    shingle length, exactly the length, repeats (dedup order), case."""
    from solana_etl_pipeline_spark.llm.dedup import (
        shingle_sets,
        shingle_sets_expr,
    )

    texts = [
        None,
        "",
        "   ",
        "one",
        "one two",
        "one two three",
        "one two three four five six",
        "a b a b a b a b",  # repeated shingles: dedup keeps first
        "Tabs\tand\nnewlines   collapse  the same",
        "MiXeD CaSe LoWeRs",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    for n in (2, 3):
        fast = shingle_sets(df, "doc_id", "text", n).collect()
        ref = shingle_sets_expr(df, "doc_id", "text", n).collect()
        got = {r._id: r._sh for r in fast}
        want = {r._id: r._sh for r in ref}
        assert got == want, f"shingle_len={n}: {got} != {want}"


# ------------------------------------- minhash twin + sig_impl pin


def test_minhash_arrow_and_agg_twins_structural_parity(spark):
    """The map-only Arrow path and the JVM aggregate twin use different
    base hashes, so minima differ by design — but doc coverage,
    identical-text determinism, and near-dup estimates must agree."""
    from solana_etl_pipeline_spark.llm.dedup import (
        minhash_signatures,
        minhash_signatures_agg,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog near the old wall",
        "the quick brown fox jumps over the sleepy dog near the old wall",
        "the quick brown fox jumps over the lazy dog near the old wall",
        "columnar engines shuffle partitions with vectorized operators",
        None,
        "",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    for fn in (minhash_signatures, minhash_signatures_agg):
        sigs = {r.doc_id: list(r.sig) for r in fn(df, "doc_id", "text").collect()}
        # null/empty text docs carry no signature in either impl
        assert set(sigs) == {0, 1, 2, 3}
        assert sigs[0] == sigs[2]  # identical text -> identical sig
        est_near = sum(a == b for a, b in zip(sigs[0], sigs[1])) / 64
        est_far = sum(a == b for a, b in zip(sigs[0], sigs[3])) / 64
        assert est_near >= 0.5, f"{fn.__name__}: near-dup est {est_near}"
        assert est_far < 0.3, f"{fn.__name__}: unrelated est {est_far}"


def test_incremental_store_refuses_foreign_sig_impl(spark, tmp_path):
    """A store written under a different signature representation must
    refuse probes — cross-impl minima compare as noise, not as an
    error, so this has to fail loudly up front."""
    from solana_etl_pipeline_spark.llm import incremental as incr

    store = str(tmp_path / "store")
    b = spark.createDataFrame([Row(doc_id=0, text=BASE)])
    incremental_near_dup_batch(b, store, batch_id=0)
    orig = incr._SIG_IMPL
    incr._SIG_IMPL = orig + 1
    try:
        with pytest.raises(ValueError, match="sig_impl"):
            incremental_near_dup_batch(
                spark.createDataFrame([Row(doc_id=1, text=BASE)]),
                store,
                batch_id=1,
            )
    finally:
        incr._SIG_IMPL = orig


def test_simhash_arrow_and_agg_twins_structural_parity(spark):
    """Map-only simhash vs the JVM aggregate twin: values differ by
    design (different token hash), but both must be order-invariant,
    deterministic on identical text, and far apart on unrelated text."""
    from solana_etl_pipeline_spark.llm.dedup import simhash, simhash_agg

    texts = [
        "the quick brown fox jumps over the lazy dog near the wall",
        "wall the near dog lazy the over jumps fox brown quick the",  # permuted
        "columnar engines shuffle partitions with vectorized operators",
        None,
        "",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    for fn in (simhash, simhash_agg):
        sigs = {r.doc_id: r.simhash for r in fn(df, "doc_id", "text").collect()}
        assert set(sigs) == {0, 1, 2}  # null/empty text: no row
        assert sigs[0] == sigs[1], f"{fn.__name__} not order-invariant"
        ham = bin(sigs[0] ^ sigs[2]).count("1")
        assert ham > 10, f"{fn.__name__}: unrelated docs hamming {ham}"


# ------------------- near-dup oracles on a crafted adversarial corpus


def test_near_dup_oracles_hold_on_short_docs_and_adjacent_ids(spark, tmp_path):
    """The fixture's docs are all >=10 words with a compact id space —
    two latent divergences hid there: (a) the oracle's positional
    3-gram CTE gave <3-word docs NO shingle set while the engine gives
    them one whole-text shingle, and (b) planted-probe offsets were a
    fixed literal that organic ids could collide with. Re-run three
    oracle-paired queries over a crafted corpus (identical 2-word
    twins, organic long near-dups, adjacent ids) through the SAME
    QuerySpec oracle SQL the driver uses."""
    import duckdb

    from solana_etl_pipeline_spark.queries import QUERIES

    long_a = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps in the warm afternoon sun near the old stone wall"
    )
    docs = [
        (0, "alpha beta"),                       # short twin 1
        (1, "alpha beta"),                       # short twin 2 (J=1.0)
        (2, "gamma delta"),                      # short non-dup
        (3, long_a),
        (4, long_a.replace("lazy", "sleepy")),   # organic near-dup of 3
        (5, "completely unrelated terms about engines and shuffles "
            "running vectorized plans on large clusters with columns"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="crafted",
             n_chars=len(t)) for i, t in docs]
    ).write.parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    for name in (
        "llm_minhash_near_dup",
        "llm_ngram_jaccard",
        "llm_simhash_near_dup",
    ):
        spec = QUERIES[name]
        assert_matches_oracle(
            spec.spark(spark, sf_dir), con, spec.oracle, name=name
        )
    # sanity on the interesting rows: the short twins DID pair
    pairs = {
        (r.id_a, r.id_b)
        for r in QUERIES["llm_minhash_near_dup"].spark(spark, sf_dir).collect()
    }
    assert (0, 1) in pairs and (3, 4) in pairs


def test_cache_scope_is_thread_local(spark):
    """A scope on one thread must not capture (and later blocking-
    unpersist) persists made concurrently by another thread."""
    import threading

    from solana_etl_pipeline_spark.llm.dedup import (
        _scoped_persist,
        dedup_cache_scope,
    )

    other_df = []
    entered = threading.Event()
    release = threading.Event()

    def scoped_holder():
        with dedup_cache_scope():
            entered.set()
            release.wait(timeout=30)

    t = threading.Thread(target=scoped_holder)
    t.start()
    try:
        assert entered.wait(timeout=30)
        # main thread persists OUTSIDE any scope of its own while the
        # other thread's scope is open
        df = _scoped_persist(
            spark.range(10).select((F.col("id") * 2).alias("v"))
        )
        other_df.append(df)
        df.count()
        release.set()
        t.join(timeout=30)
        # the other thread's scope exit must NOT have unpersisted it
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
    finally:
        release.set()
        t.join(timeout=30)
        for df in other_df:
            df.unpersist(blocking=True)


# ------------------------------------- memoized-fixture idempotence


def test_memoized_fixture_queries_are_invocation_idempotent(spark, sf_dir):
    """The streaming landing dirs and the incremental seed store are
    memoized per fixture dir (bench de-noising, round 9). Memoization
    must be invisible to results: a second invocation in the same
    process reuses the cached fixture and must return exactly the
    same rows — in particular the incremental query must copy its
    seed store per run (batch 1 indexes arrivals; replaying against a
    MUTATED store would re-match the previous run's arrivals and
    change the verdicts)."""
    from solana_etl_pipeline_spark.queries import QUERIES

    for name in ("streaming_hourly_rollup", "llm_incremental_near_dup"):
        first = QUERIES[name].spark(spark, sf_dir)
        second = QUERIES[name].spark(spark, sf_dir)
        assert first.exceptAll(second).count() == 0, name
        assert second.exceptAll(first).count() == 0, name
        assert first.count() > 0, name
