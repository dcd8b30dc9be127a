"""Unit tests for corpus curation: PII redaction on crafted strings
and contiguous-fill sequence packing on a hand-built stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.curate import (
    pack_sequences,
    pii_counts,
    redact_pii,
)

WALLET = "5Kd3NBUAdUnhyzenEwVLy9pBKxSwXvE9FMPyR4UK"  # 40 base58 chars


@pytest.fixture(scope="module")
def pii_rows(spark):
    rows = [
        Row(i=0, text=f"dm bob.smith+x@mail.co or https://a.io/t?q=1 pay {WALLET} now"),
        Row(i=1, text="no pii here at all"),
        Row(i=2, text="two mails a@b.io c@d.org and http://plain.url"),
        # too-short (31) base58 run must NOT be redacted
        Row(i=3, text="ref " + WALLET[:31] + " ok"),
    ]
    return spark.createDataFrame(rows)


def test_redaction_replaces_all_kinds(pii_rows):
    out = pii_rows.select("i", redact_pii(F.col("text")).alias("clean")).collect()
    got = {r.i: r.clean for r in out}
    assert got[0] == "dm <EMAIL> or <URL> pay <ADDR> now"
    assert got[1] == "no pii here at all"
    assert got[2] == "two mails <EMAIL> <EMAIL> and <URL>"
    assert "<ADDR>" not in got[3]  # below the 32-char address band


def test_pii_counts_per_kind(pii_rows):
    counts = pii_counts(F.col("text"))
    out = pii_rows.select(
        "i", *[c.alias(n) for n, c in counts.items()]
    ).collect()
    got = {r.i: (r.n_emails, r.n_urls, r.n_addrs) for r in out}
    assert got[0] == (1, 1, 1)
    assert got[1] == (0, 0, 0)
    assert got[2] == (2, 1, 0)
    assert got[3] == (0, 0, 0)


def test_pack_sequences_contiguous_fill(spark):
    # stream s: token lengths 3,3,3 with budget 4 ->
    # doc 0 starts at 0 (pack 0), doc 1 starts at 3 (pack 0),
    # doc 2 starts at 6 (pack 1).
    rows = [
        Row(source="s", doc_id=0, text="a b c"),
        Row(source="s", doc_id=1, text="d e f"),
        Row(source="s", doc_id=2, text="g h i"),
        Row(source="t", doc_id=3, text="x"),
    ]
    out = pack_sequences(
        spark.createDataFrame(rows), "doc_id", "text", budget=4
    ).collect()
    got = {(r.stream, r.pack_id): (r.n_docs, r.sum_tokens) for r in out}
    assert got[("s", 0)] == (2, 6)
    assert got[("s", 1)] == (1, 3)
    assert got[("t", 0)] == (1, 1)


def test_pack_sequences_null_text_counts_zeroish(spark):
    df = spark.createDataFrame(
        [("s", 0, None)], "source string, doc_id int, text string"
    )
    out = pack_sequences(df, "doc_id", "text", budget=4).collect()
    # split('', ' ') -> [''] : one (empty) token, never a crash
    assert out[0].n_docs == 1


# ----------------------------------------------------- domain rollup


def test_extract_domains_multi_and_none(spark):
    from solana_etl_pipeline_spark.llm.curate import extract_domains

    rows = [
        Row(doc_id=1, text="a https://x.example/p http://y.example b"),
        Row(doc_id=2, text="no links here"),
        Row(doc_id=3, text=None),
        # \x0B is whitespace to Java but not RE2 — the explicit class
        # treats it as a URL character in BOTH engines (the convention
        # llm/tokenize.py documents), so the host parse must agree too
        Row(doc_id=4, text="see https://z.example/q\x0btail end"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.ds
        for r in df.select(
            "doc_id", extract_domains(F.col("text")).alias("ds")
        ).collect()
    }
    assert got[1] == ["x.example", "y.example"]
    assert got[2] == [] and got[3] == []
    assert got[4] == ["z.example"]


def test_c4_line_filter_rules_on_crafted_page(spark):
    """Each C4 rule exercised on one crafted page: terminal
    punctuation, min words, javascript mention, curly brace, the
    lorem-ipsum page drop, and the min-lines page drop."""
    from solana_etl_pipeline_spark.llm.curate import c4_line_filter

    good1 = "this sentence has enough words to survive."
    good2 = "another full sentence clears every single rule!"
    good3 = 'a quoted ending also counts as terminal."'
    pages = [
        # 0: three good lines + every kind of bad line -> kept
        Row(doc_id=0, text="\n".join([
            good1, "too short.", "no terminal punctuation here at all",
            "this one mentions JavaScript libraries all day.",
            "brace { sentence with plenty of words here.",
            good2, "  " + good3 + "  ",
        ])),
        # 1: only two good lines -> page dropped (min_lines=3)
        Row(doc_id=1, text="\n".join([good1, good2, "tiny."])),
        # 2: three good lines but lorem ipsum -> page dropped
        Row(doc_id=2, text="\n".join([
            good1, good2, good3,
            "Lorem Ipsum dolor sit amet consectetur adipiscing.",
        ])),
        # 3: null text -> 1 empty line, nothing kept
        Row(doc_id=3, text=None),
    ]
    out = {
        r.doc_id: r
        for r in c4_line_filter(spark.createDataFrame(pages)).collect()
    }
    assert out[0].c4_kept == 1
    # trimmed survivors, original order
    assert out[0].clean_text == "\n".join([good1, good2, good3])
    assert (out[0].n_lines, out[0].n_kept) == (7, 3)
    assert out[1].c4_kept == 0 and out[1].n_kept == 2
    # lorem line itself passes the LINE rules; the PAGE still drops
    assert out[2].n_kept == 4 and out[2].c4_kept == 0
    assert out[3].n_kept == 0 and out[3].c4_kept == 0


def test_canonical_url_folds_variants(spark):
    """scheme/www/case/query/fragment/trailing-slash variants fold to
    one canonical form; URL-free text canonicalizes to ''."""
    from solana_etl_pipeline_spark.llm.curate import canonical_url

    variants = [
        "see https://site.example/page/7 now",
        "see http://site.example/page/7/ now",
        "see https://www.site.example/page/7?utm_source=x now",
        "see HTTPS://SITE.EXAMPLE/page/7#frag now",
    ]
    rows = [Row(i=i, text=t) for i, t in enumerate(variants)] + [
        Row(i=9, text="no url in this text"),
        Row(i=10, text=None),
    ]
    got = {
        r.i: r.c
        for r in spark.createDataFrame(rows)
        .select("i", canonical_url(F.col("text")).alias("c"))
        .collect()
    }
    assert {got[i] for i in range(4)} == {"site.example/page/7"}
    assert got[9] == "" and got[10] == ""
