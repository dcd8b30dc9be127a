"""Unit tests for exact substring-span dedup (llm/substrings.py) on
hand-built corpora where the expected spans are computable by eye.
Window = 4 tokens throughout so the fixtures stay readable.
"""

from __future__ import annotations

from pyspark.sql import Row

from solana_etl_pipeline_spark.llm.substrings import duplicate_span_report

W = 4


def _report(spark, rows, window=W):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in duplicate_span_report(df, window=window).collect()
    }


def test_cross_doc_copy_marks_later_doc_only(spark):
    """Doc 1 repeats doc 0's 6-token run: keep-first leaves doc 0
    intact and cuts the whole run (3 overlapping windows -> one
    merged 6-token span) from doc 1."""
    run = "a b c d e f"
    got = _report(spark, [
        Row(doc_id=0, text=run + " unique zero tail"),
        Row(doc_id=1, text="one lead " + run + " one tail"),
    ])
    assert got[0].n_dup_windows == 0
    assert got[0].clean_text == "a b c d e f unique zero tail"
    assert got[1].n_dup_windows == 3  # positions 2,3,4
    assert got[1].n_spans == 1
    assert got[1].dup_tokens == 2 + W  # span [2, 2+4+2) = 6 tokens
    assert got[1].clean_text == "one lead one tail"


def test_within_doc_repeat_keeps_first_occurrence(spark):
    """The same 4-token phrase twice in ONE doc: the second
    occurrence is the duplicate."""
    got = _report(spark, [
        Row(doc_id=0, text="p q r s gap1 gap2 gap3 gap4 p q r s"),
    ])
    r = got[0]
    assert r.n_dup_windows == 1 and r.n_spans == 1
    assert r.dup_tokens == W
    assert r.clean_text == "p q r s gap1 gap2 gap3 gap4"


def test_two_separated_spans_do_not_merge(spark):
    """Two duplicated regions split by unique text stay two spans."""
    got = _report(spark, [
        Row(doc_id=0, text="a b c d mid1 mid2 mid3 mid4 mid5 w x y z"),
        Row(doc_id=1, text="a b c d sep1 sep2 sep3 sep4 sep5 w x y z"),
    ])
    r = got[1]
    assert r.n_spans == 2
    assert r.dup_tokens == 2 * W
    assert r.clean_text == "sep1 sep2 sep3 sep4 sep5"


def test_short_and_null_docs_pass_through(spark):
    """Docs shorter than the window have no windows (the
    sequence(1,0)-descends trap) and survive untouched; null text
    yields the empty clean text."""
    got = _report(spark, [
        Row(doc_id=0, text="one two three"),
        Row(doc_id=1, text=None),
        Row(doc_id=2, text="one two three"),  # identical but < W: no dedup
    ])
    assert got[0].n_dup_windows == 0
    assert got[0].clean_text == "one two three"
    assert got[2].n_dup_windows == 0  # sub-window copies are NOT spans
    assert got[1].n_tokens == 1 and got[1].clean_text == ""


def test_substring_pipeline_is_jvm_only(spark):
    """The r12 redesign builds window slices from the SAME JVM token
    array the spans are cut from — one tokenizer, so the old
    cross-tokenizer drift hazard (ADVICE r9/r10, guarded through r11
    by a count+crc32 degrade path) is impossible by design. Pin the
    property that makes that true: no Python evaluation node
    (ArrowEvalPython / MapInPandas / BatchEvalPython) anywhere in the
    pipeline's physical plan — reintroducing a Python-side tokenizer
    would need the guard back."""
    from solana_etl_pipeline_spark.plans import executed_plan

    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b c d e f g h")],
        "doc_id long, text string",
    )
    plan = executed_plan(duplicate_span_report(df, window=W))
    for node in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert node not in plan


def test_fully_duplicated_doc_cleans_to_empty(spark):
    """An exact copy of an entire earlier doc loses everything."""
    body = "t1 t2 t3 t4 t5 t6 t7 t8"
    got = _report(spark, [
        Row(doc_id=0, text=body),
        Row(doc_id=1, text=body),
    ])
    assert got[0].clean_text == body
    r = got[1]
    assert r.dup_tokens == 8 and r.clean_text == ""
    assert r.n_spans == 1
