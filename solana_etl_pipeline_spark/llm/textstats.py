"""Text analysis operators: stats, token counts, language ID, quality
scoring, document fingerprints.

Everything is built-in string/array/higher-order expressions —
single-pass, no shuffle, no Python — so the per-document cost is pure
codegen'd CPU and the operators compose with any downstream groupBy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm import tokenize

#: Small function-word list used by stats/quality/lang-id (shared with
#: the DuckDB oracles — keep in sync with queries/llm.py).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "or", "is")

#: BPE-ish pre-tokenization: letter runs, single digits, or single
#: non-alphanumeric marks (GPT-2-style pre-tokenizer shape).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

#: Per-language marker words for the n-gram/marker language heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
}

_P = 2_147_483_647


def _words(text: Column) -> Column:
    # The repo-wide convention lives in llm.tokenize (collapse
    # whitespace runs → trim → literal-space split; null text → ['']).
    # The coalesce inside it matters here: without it
    # size(split(NULL)) is -1 under ANSI-off and every ratio built on
    # it goes silently bogus (-1 word counts, stopword_ratio 1.0)
    # while the oracles' NULL rows drop out of avg/sum.
    return tokenize.words(text)


def word_ngrams(text: Column, n: int) -> Column:
    """Ordered word n-grams (with duplicates): the building block for
    decontamination and repetition scoring.

    Tokenization matches :func:`_words` (the ``llm.tokenize``
    convention). Documents shorter than ``n`` words yield one
    whole-text gram (``slice`` truncates past the end) — the same
    short-doc convention as ``llm.dedup._word_shingles``.
    """
    words = _words(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))


def _max_run_of_sorted(arr: Column) -> Column:
    """Highest multiplicity of any element: sort, then one aggregate
    pass tracking the longest run of equal neighbors — O(n log n) per
    document, robust for arbitrarily long documents (a
    count-via-nested-``filter`` formulation is O(n²))."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(a: Column, x: Column) -> Column:
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(a["best"], run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), init, step, lambda a: a["best"])


def _py_word_ngrams(t: "str | None", n: int) -> list[str]:
    """Plain-Python twin of :func:`word_ngrams` (ordered, with
    duplicates; whole-text gram for short/None docs — the
    ``_shingle_list`` conventions minus the distinct). Tokenization is
    SHARED with the dedup family (``llm.dedup._word_tokens``) so a
    convention fix lands in every Arrow text path at once."""
    from solana_etl_pipeline_spark.llm.dedup import _word_tokens

    words = _word_tokens(t)
    if len(words) <= n:
        return [" ".join(words)]
    return [
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    ]


def repetition_report(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Gopher-style within-document repetition metrics (Rae et al.
    2021 §A1.1): ``(id, n_bigrams, top_bigram_count, top_bigram_frac,
    dup_trigram_frac)`` — the share of the document taken by its most
    frequent 2-gram and the fraction of 3-gram occurrences that are
    duplicates. Repetitive (boilerplate / generated) text scores high
    on both; curation pipelines drop or down-weight it.

    Arrow-batched ``pandas_udf`` for the counting (Counter/set over a
    token list), mirroring the MinHash shingle pass: per-position
    gram construction is where built-in expressions genuinely lose —
    the expression twin (:func:`repetition_report_expr`) measures
    ~6× slower at sf0.1 and the gap grows with document length.
    Map-side only either way: no explode, no shuffle, embarrassingly
    parallel at any corpus size. Parity between the twins is pinned
    by ``tests/test_hygiene.py``.
    """
    from collections import Counter

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    out_t = StructType(
        [
            StructField("n_bi", LongType()),
            StructField("top_bi", LongType()),
            StructField("n_tri", LongType()),
            StructField("dup_tri", LongType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _metrics(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            bi = _py_word_ngrams(t, 2)
            tri = _py_word_ngrams(t, 3)
            rows.append(
                (
                    len(bi),
                    max(Counter(bi).values()),
                    len(tri),
                    len(tri) - len(set(tri)),
                )
            )
        return pd.DataFrame(rows, columns=["n_bi", "top_bi", "n_tri", "dup_tri"])

    base = df.select(F.col(id_col), _metrics(F.col(text_col)).alias("_m"))
    m = F.col("_m")
    return base.select(
        F.col(id_col),
        m["n_bi"].alias("n_bigrams"),
        m["top_bi"].alias("top_bigram_count"),
        F.round(m["top_bi"] / m["n_bi"], 6).alias("top_bigram_frac"),
        F.round(m["dup_tri"] / m["n_tri"], 6).alias("dup_trigram_frac"),
    )


def repetition_report_expr(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Pure-expression twin of :func:`repetition_report` (JVM-side,
    no Python workers) — the parity reference, and the pick where
    Python worker startup outweighs the interpreted-closure cost.

    The gram arrays are MATERIALIZED in their own projection and the
    metrics reference that column: inlining ``word_ngrams(text, n)``
    into a nested lambda (or next to a generator) makes Spark
    re-derive the whole split→slice→concat tree per inner element /
    per generator output row — measured 35× slower at sf0.01. The
    top-count is a sort + longest-equal-run aggregate
    (O(n log n)/doc; a count-via-nested-``filter`` formulation is
    O(n²)).
    """
    text = F.col(text_col)
    base = df.select(
        F.col(id_col),
        word_ngrams(text, 2).alias("_bi"),
        word_ngrams(text, 3).alias("_tri"),
    )
    n_bi = F.size(F.col("_bi"))
    top_bi = _max_run_of_sorted(F.col("_bi"))
    n_tri = F.size(F.col("_tri"))
    dup_tri = n_tri - F.size(F.array_distinct(F.col("_tri")))
    return base.select(
        F.col(id_col),
        n_bi.cast("bigint").alias("n_bigrams"),
        top_bi.cast("bigint").alias("top_bigram_count"),
        F.round(top_bi / n_bi, 6).alias("top_bigram_frac"),
        F.round(dup_tri / n_tri, 6).alias("dup_trigram_frac"),
    )


def normalize_text(text: Column) -> Column:
    """Canonical text form for content-hash dedup: lowercase, strip
    punctuation, collapse whitespace runs, trim. Near-identical
    documents that differ only in case/punctuation/spacing collapse to
    one hash — the standard pre-dedup normalization pass."""
    lowered = F.lower(text)
    no_punct = F.regexp_replace(lowered, r"[^\w\s]", "")
    collapsed = F.regexp_replace(no_punct, r"\s+", " ")
    return F.trim(collapsed)


def text_stats(text: Column) -> dict[str, Column]:
    """Per-document stats: chars, words, avg word length, stopword
    ratio, punctuation ratio, digit ratio."""
    words = _words(text)
    n_chars = F.length(text)
    n_words = F.size(words)
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS))
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": F.round(
            F.aggregate(
                words, F.lit(0), lambda acc, w: acc + F.length(w)
            )
            / n_words,
            6,
        ),
        "stopword_ratio": F.round(n_stop / n_words, 6),
        "punct_ratio": F.round(
            F.regexp_count(text, F.lit(r"[.,;:!?]")) / n_chars, 6
        ),
        "digit_ratio": F.round(
            F.regexp_count(text, F.lit(r"[0-9]")) / n_chars, 6
        ),
    }


def token_counts(text: Column) -> dict[str, Column]:
    """Whitespace token count + BPE-ish regex token count."""
    return {
        "ws_tokens": F.size(_words(text)),
        "bpe_tokens": F.regexp_count(text, F.lit(TOKEN_REGEX)),
    }


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0, 100]: long enough, not stopword-soup,
    not digit/punct-heavy. Weighted like the reference's risk blend
    (``streamlit 1.3.txt:102``) so the banding operator applies."""
    s = text_stats(text)
    length_score = F.least(F.lit(100.0), s["n_words"] * 2.0)
    stop_score = F.lit(100.0) - F.abs(s["stopword_ratio"] - 0.4) * 200.0
    clean_score = F.lit(100.0) - (s["punct_ratio"] + s["digit_ratio"]) * 500.0
    blended = 0.4 * length_score + 0.3 * stop_score + 0.3 * clean_score
    return F.round(F.greatest(F.lit(0.0), F.least(F.lit(100.0), blended)), 6)


def language_id(text: Column) -> Column:
    """Marker-word language heuristic: score each language by marker
    occurrences; highest score wins (ties broken alphabetically,
    'und' = undetermined when no marker hits)."""
    words = _words(text)
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # Wrap in reverse priority so the LAST when() applied — highest
    # priority (dict order: en, es, de) — is evaluated first on ties.
    for lang in reversed(list(scores)):
        out = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(out)
    return out


def document_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling fingerprint: Σ pos·(31·len(w)+ascii(w))
    mod P over words — a polynomial-style content fingerprint that is
    cheap, deterministic, and expressible in any SQL engine (unlike
    engine-specific hash functions)."""
    words = _words(text)
    acc = F.aggregate(
        words,
        F.struct(F.lit(0).cast("long").alias("pos"), F.lit(0).cast("long").alias("val")),
        lambda a, w: F.struct(
            (a["pos"] + 1).alias("pos"),
            F.pmod(
                a["val"] + (a["pos"] + 1) * (31 * F.length(w) + F.ascii(w)),
                F.lit(_P),
            ).alias("val"),
        ),
        lambda a: a["val"],
    )
    return acc


#: Gopher quality-rule bounds (Rae et al. 2021, arXiv:2112.11446,
#: Appendix A1.1) — the paper's values, not fixture-tuned: word count
#: in [50, 100_000], mean word length in [3, 10], symbol-to-word
#: ratio ('#' or '...') <= 0.1, >= 80% of words with an alphabetic
#: character, >= 2 distinct stopwords present.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_quality_report(text: Column) -> dict[str, Column]:
    """Gopher rule metrics + per-rule flags for one text column
    (Rae et al. 2021 §A1.1 — the non-repetition half; the repetition
    half lives in :func:`repetition_report`).

    All metrics are built-in expressions over the shared tokenizer
    (`llm/tokenize.py` convention), so the report is a map-only
    projection — no shuffle, no Python. Flags are BIGINT 0/1 rather
    than booleans so the cross-engine hash never depends on boolean
    rendering. Ratios round at 1e-6 (the repo's ln()/ratio
    discipline) so a last-ulp division difference between engines
    cannot flip an emitted value; the flag comparisons run on the
    ROUNDED values for the same reason."""
    words = _words(text)
    n_words = F.size(words)
    mean_len = F.round(
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
        / n_words,
        6,
    )
    alpha_ratio = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words, 6
    )
    symbol_ratio = F.round(
        F.regexp_count(
            F.coalesce(text, F.lit("")), F.lit(r"#|\.\.\.")
        )
        / n_words,
        6,
    )
    n_stop_distinct = F.size(
        F.filter(F.array_distinct(words), lambda w: w.isin(*STOPWORDS))
    )
    flags = {
        "ok_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "ok_mean_word_len": (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN),
        "ok_symbol_ratio": symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        "ok_alpha_ratio": alpha_ratio >= GOPHER_MIN_ALPHA_RATIO,
        "ok_stopwords": n_stop_distinct >= GOPHER_MIN_STOPWORDS,
    }
    out: dict[str, Column] = {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "alpha_word_ratio": alpha_ratio,
        "symbol_word_ratio": symbol_ratio,
        "n_stop_distinct": n_stop_distinct,
    }
    passes = F.lit(True)
    for name, flag in flags.items():
        out[name] = flag.cast("long")
        passes = passes & flag
    out["gopher_pass"] = passes.cast("long")
    return out
