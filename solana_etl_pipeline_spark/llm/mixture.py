"""Domain-mixture sampling: temperature-scaled per-source token
budgets with deterministic document selection.

Training corpora are assembled from many sources (web crawl, code,
books, ...) whose raw sizes differ by orders of magnitude; training
recipes re-weight them (the "sampling temperature" of multilingual /
multi-domain training — e.g. the temperature-based sampling in the
mT5/PaLM data cards): source ``s`` gets a token target proportional to
``tokens_s ** tau`` with ``tau < 1`` up-weighting small sources. This
module computes that plan and applies it with a deterministic,
engine-portable hash filter — no RNG, so the sample is reproducible
from the ids alone and any worker can recompute membership.

Shape at scale:

- The plan is one partial-aggregated ``groupBy(source)`` over the
  corpus (token sums), then driver-free arithmetic on the handful of
  per-source rows.
- Selection joins the per-source rate back by ``broadcast`` (sources
  number in the tens, not millions) and keeps a document iff
  ``scramble(id) * 1e6 < rate_micro * P`` — pure BIGINT compare with
  the same mod-prime scramble as shard export (``llm/export.py``), so
  the kept set is identical in any engine.
- The only float math (sqrt / divide) happens on per-source
  aggregates and is snapped to a 1e-6 grain (``rate_micro``) before
  it touches the integer selection predicate, keeping the
  cross-engine float surface within the repo's rounding convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm import tokenize

from solana_etl_pipeline_spark.llm.export import SHARD_P, shard_scramble

_MICRO = 1_000_000


def mixture_plan(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    token_budget: int = 100_000,
) -> DataFrame:
    """Per-source sampling plan at temperature 0.5: ``(source, n_docs,
    tokens, rate_micro)``.

    ``weight_s = sqrt(tokens_s)``; source targets split
    ``token_budget`` ∝ weight; ``rate_micro`` is the per-source keep
    rate in millionths, clamped to [0, 1e6]. Temperature is fixed at
    0.5 because ``sqrt`` is IEEE-correctly-rounded in every engine —
    an arbitrary ``pow(x, tau)`` goes through libm and is not
    bit-portable (same reasoning as the tfidf ``ln`` note in
    ``llm/ranking.py``).
    """
    # tokenize.words coalesces on BOTH sides (here and the hygiene
    # oracle's _WORDS_SQL): a null-text doc must count 1 token in each
    # engine, not silently drop out of the Spark-side sum (the same
    # symmetric-coalesce trap queries/curation.py documents).
    words = tokenize.words(F.col(text_col))
    per_source = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words)).cast("bigint").alias("tokens"),
    )
    # Global window over the per-source aggregate rows (tens of rows —
    # the single-partition funnel is over the plan, never the corpus).
    weight = F.sqrt(F.col("tokens").cast("double"))
    total_weight = F.round(F.sum(weight).over(Window.partitionBy()), 6)
    target = F.lit(float(token_budget)) * weight / total_weight
    rate = F.least(F.lit(1.0), target / F.col("tokens"))
    rate_micro = F.floor(rate * F.lit(float(_MICRO)) + F.lit(0.5)).cast(
        "bigint"
    )
    return per_source.select(
        "source", "n_docs", "tokens", rate_micro.alias("rate_micro")
    )


def mixture_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    token_budget: int = 100_000,
    plan: DataFrame | None = None,
) -> DataFrame:
    """Rows of ``df`` kept by the temperature-0.5 mixture plan.

    Membership is ``scramble(id) * 1e6 < rate_micro * P`` — the
    mod-prime scramble spreads ids uniformly over [0, P), so each
    source keeps ≈ ``rate_micro/1e6`` of its documents, deterministic
    in the ids and independent of partitioning.

    Pass a precomputed ``plan`` (from :func:`mixture_plan`) to skip
    re-aggregating the corpus — the pattern when a caller needs both
    the plan (for audit) and the sample; ``token_budget`` is ignored
    in that case.
    """
    if plan is None:
        plan = mixture_plan(df, source_col, text_col, token_budget)
    plan = plan.select(
        F.col("source").alias("_mix_source"), "rate_micro"
    )
    keep = (
        shard_scramble(F.col(id_col)) * F.lit(_MICRO)
        < F.col("rate_micro") * F.lit(SHARD_P)
    )
    return (
        df.join(
            F.broadcast(plan), F.col(source_col) == F.col("_mix_source")
        )
        .filter(keep)
        .drop("_mix_source", "rate_micro")
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact per-group quota sample: for every group, the ``min(k, n)``
    rows ranked first under the mod-prime scramble order (the shard
    convention from ``llm/export.py`` — engine-portable, deterministic,
    partition-invariant, decorrelated from id order). The fixed-quota
    complement of :func:`mixture_sample`'s rate-based selection: "at
    most k docs per domain" curation rules need a quota, not a rate.

    Emits ``(group, sample_rank, id)`` with ``sample_rank`` 1..k in
    scramble order, so re-running on a grown corpus keeps a stable
    prefix property per group (new ids enter only by beating existing
    scramble ranks).

    Scale posture: same salted two-phase top-k as
    ``llm/ranking.py::inverted_index`` — per ``(group, id%S)`` partials
    keep ≤ k candidates, the group-level merge sorts ≤ S·k structs; no
    per-group window, so a group with a billion rows costs
    O(rows/S) per task, and every stage is map-side-combinable.
    """
    scr = shard_scramble(F.col(id_col))
    cand = F.struct(scr.alias("s"), F.col(id_col).alias("i"))
    partial = df.groupBy(
        F.col(group_col).alias("grp"),
        F.pmod(F.col(id_col), F.lit(salt_buckets)).alias("_salt"),
    ).agg(
        F.slice(F.array_sort(F.collect_list(cand)), 1, k).alias("cands")
    )
    merged = partial.groupBy("grp").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("cands"))), 1, k
        ).alias("picks")
    )
    return merged.select(
        F.col("grp").alias(group_col),
        F.posexplode("picks").alias("pos", "pick"),
    ).select(
        group_col,
        (F.col("pos") + 1).alias("sample_rank"),
        F.col("pick.i").alias(id_col),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
) -> DataFrame:
    """Deterministic Efraimidis–Spirakis weighted sampling without
    replacement (the A-Res key, arXiv does not apply — Efraimidis &
    Spirakis 2006, Inf. Process. Lett. 97(5)): the classical algorithm
    draws ``u ~ U(0,1]`` per row and keeps the k largest ``u^(1/w)``;
    ranking by the monotone-equivalent ``ln(u)/w`` (descending — closer
    to zero wins) avoids the pow. Selection probability is
    proportional-to-weight without replacement — the quality-weighted
    corpus-sampling knob ("sample harder from high-quality sources")
    that rate (``mixture_sample``) and fixed-quota (``quota_sample``)
    selection cannot express.

    Determinism: ``u = (scramble(id)+1) / (P+1)`` from the mod-prime
    scramble (llm/export.py convention) instead of an RNG, so any
    engine recomputes the identical sample from the ids alone; the key
    is ROUNDED (1e-9) with an id tie-break before the top-k cut, per
    the repo's cross-engine float convention.

    Scale posture: one map-side projection computes keys; the top-k
    compiles to TakeOrderedAndProject (per-partition heaps + driver
    merge of k rows) — no shuffle, no window, no full sort.
    Null/zero weights clamp to 1.0 (uniform floor) rather than
    dropping rows.
    """
    scr = shard_scramble(F.col(id_col))
    u = (scr + F.lit(1)).cast("double") / F.lit(float(SHARD_P + 1))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    keyed = df.withColumn("es_key", F.round(F.log(u) / w, 9))
    return keyed.orderBy(F.desc("es_key"), id_col).limit(k)
