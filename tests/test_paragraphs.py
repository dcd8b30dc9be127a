"""Paragraph-level (line-level) dedup semantics
(``llm/paragraphs.py``) — the RefinedWeb keep-first rule on
hand-built corpora where the expected survivor set is computable by
eye. The registry query's full-value oracle and the hostile-fixture
gate cover the fixture path.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.paragraphs import (
    dedup_paragraphs,
    explode_paragraphs,
)


def _docs(spark, *texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}


def test_keep_first_across_documents(spark):
    """A line survives only at its corpus-wide first (doc_id, pos);
    later documents lose shared lines but keep their own."""
    out = _by_id(
        dedup_paragraphs(_docs(spark, "a\nb", "b\nc", "a\nb"))
    )
    assert (out[0].n_paras, out[0].n_kept, out[0].clean_text) == (
        2, 2, "a\nb"
    )
    assert (out[1].n_paras, out[1].n_kept, out[1].clean_text) == (
        2, 1, "c"
    )
    # fully-duplicated document: everything occurs earlier elsewhere
    assert (out[2].n_paras, out[2].n_kept, out[2].clean_text) == (
        2, 0, ""
    )


def test_within_document_repeats_collapse(spark):
    out = _by_id(dedup_paragraphs(_docs(spark, "x\ny\nx\nx")))
    assert (out[0].n_paras, out[0].n_kept, out[0].clean_text) == (
        4, 2, "x\ny"
    )


def test_reassembly_preserves_document_order(spark):
    """Survivors re-join in original position order even when the
    dropped line sits between them."""
    out = _by_id(dedup_paragraphs(_docs(spark, "dup", "z\ndup\na")))
    assert out[1].clean_text == "z\na"


def test_null_and_empty_text_convention(spark):
    """Null text coalesces to one empty paragraph; the corpus-wide
    first empty line wins, exactly like any other content."""
    out = _by_id(dedup_paragraphs(_docs(spark, None, "")))
    assert (out[0].n_paras, out[0].n_kept, out[0].clean_text) == (
        1, 1, ""
    )
    assert (out[1].n_paras, out[1].n_kept, out[1].clean_text) == (
        1, 0, ""
    )


def test_trailing_empty_fields_kept(spark):
    """'a\\n' splits to ['a', ''] (Spark limit=-1 == DuckDB
    string_split) — the trailing empty is a real paragraph occurrence
    and claims the empty-line slot for later docs."""
    out = _by_id(dedup_paragraphs(_docs(spark, "a\n", "")))
    assert (out[0].n_paras, out[0].n_kept) == (2, 2)
    assert (out[1].n_paras, out[1].n_kept) == (1, 0)


def test_explode_positions_are_zero_based_per_doc(spark):
    rows = explode_paragraphs(_docs(spark, "p\nq", "r")).collect()
    got = {(r.doc_id, r.pos): r.para for r in rows}
    assert got == {(0, 0): "p", (0, 1): "q", (1, 0): "r"}


def test_plan_has_no_cartesian_or_nested_loop(spark):
    """Plan audit: first-occurrence resolution + survivor join compile
    to hash aggregation and an equi-join on the digest — no cartesian
    or nested-loop join anywhere."""
    from solana_etl_pipeline_spark.plans import executed_plan

    plan = executed_plan(dedup_paragraphs(_docs(spark, "a\nb", "b\nc")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan
