"""Paragraph-level (line-level) corpus deduplication.

RefinedWeb/Falcon-style exact line dedup (Penedo et al. 2023,
arXiv:2306.01116 §4.2): split every document on newlines, drop each
line occurrence that is not the corpus-wide FIRST occurrence of that
exact line, and reassemble the surviving lines in document order.
Boilerplate (nav bars, cookie banners, shared footers) is exactly the
text this removes — document-level dedup (``llm/dedup.py``) can't see
it because the surrounding prose differs.

No reference counterpart (SURVEY §2.11 LLM-data surface); the
document-level exact dedup it composes with is the §2.11 exact-dedup
family.

Convention: paragraphs are the fields of a split on the single
literal ``\\n`` — no trim, no case-fold (dedup is exact on raw
bytes), trailing empty fields kept (Spark ``split`` at its default
``limit=-1`` and DuckDB ``string_split`` agree). Null text
coalesces to ``''`` and yields one empty paragraph, matching the
oracle's ``coalesce(text, '')`` rows.

Scale shape (the part that matters at 100 TB):

- paragraphs shuffle ONCE on a 32-byte sha256 digest of their bytes
  (the same bounded-width shuffle key the exact-dedup family uses —
  never the paragraph text itself),
- first-occurrence resolution is ``min(struct(doc_id, pos))`` under
  that groupBy — partial aggregation runs map-side, so the shuffle
  carries one candidate per (partition, digest), not one per
  occurrence,
- survivors come back via an equi-join on the same digest key (at
  fixture scale the ≤-|distinct paragraphs| aggregate side simply
  broadcasts; at 100 TB it is a shuffle join whose agg side is
  already partitioned on the key), and
- reassembly is one groupBy on ``doc_id``. No global sort, no
  window over the corpus, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Newline as both engines see it (Spark's split pattern is a Java
#: regex; a bare newline char is a literal there and in DuckDB's
#: plain-string string_split).
PARA_DELIM = "\n"


def explode_paragraphs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, pos, para)``: one row per newline-delimited paragraph,
    ``pos`` 0-based within the document. Map-side only."""
    parts = F.split(F.coalesce(F.col(text_col), F.lit("")), PARA_DELIM)
    return df.select(
        F.col(id_col), F.posexplode(parts).alias("pos", "para")
    )


def dedup_paragraphs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide keep-first paragraph dedup.

    A paragraph occurrence survives iff its ``(doc_id, pos)`` is the
    lexicographic minimum across every occurrence of that exact
    paragraph in the corpus. Returns one row per document:
    ``(id, n_paras, n_kept, clean_text)`` where ``clean_text`` is the
    surviving paragraphs re-joined with ``\\n`` in original order
    (``''`` when every paragraph of the document occurs earlier
    elsewhere).
    """
    paras = explode_paragraphs(df, id_col, text_col)
    # 32-byte digest as the shuffle/join key; the paragraph bytes
    # themselves never shuffle twice (they ride only the probe side).
    keyed = paras.withColumn("_pk", F.sha2(F.col("para"), 256))
    firsts = keyed.groupBy("_pk").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    joined = keyed.join(firsts, "_pk")
    kept = (F.col("_first")[id_col] == F.col(id_col)) & (
        F.col("_first")["pos"] == F.col("pos")
    )
    # collect_list skips nulls, so non-survivors vanish before the
    # sort; array_sort on struct(pos, para) orders by pos (first
    # field) — original document order without a window.
    ordered_kept = F.array_sort(
        F.collect_list(
            F.when(kept, F.struct(F.col("pos"), F.col("para")))
        )
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(kept.cast("bigint")).alias("n_kept"),
        F.array_join(
            F.transform(ordered_kept, lambda s: s["para"]), PARA_DELIM
        ).alias("clean_text"),
    )
