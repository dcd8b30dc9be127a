"""Enrichment & the Python-UDF escape hatches (SURVEY.md §2.10 D1-D4).

Native-first policy: D1's dict lookup is a broadcast join (queries/
joins.py); D2's per-group metrics are a native aggregation (operators/
risk.py). These general escape hatches exist for what built-ins can't
express — and every one is Arrow-batched (mapInPandas/applyInPandas),
never a row-at-a-time Python UDF.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Output schema of :func:`risk_scores_grouped_map`.
RISK_GROUPED_SCHEMA = (
    "user_id bigint, unique_holders bigint, unique_buyers bigint, "
    "total_events bigint, ownership_risk double, liquidity_risk double, "
    "txn_concentration double, jeet_risk_score double, safety_score double"
)


def broadcast_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    value_col: str,
    default: str = "Unknown",
) -> DataFrame:
    """D1/J1: enrich facts from a small dimension with a miss default —
    the broadcast-join form of ``token_dict.get(x, "Unknown")``
    (``streamlit 1.3.txt:79-81``). The dim never shuffles the facts."""
    dim_small = F.broadcast(dim.select(key, value_col))
    return facts.join(dim_small, key, "left").withColumn(
        value_col, F.coalesce(F.col(value_col), F.lit(default))
    )


def risk_scores_grouped_map(
    df: DataFrame,
    key: str = "user_id",
    holder_col: str = "holder",
    buy_type_col: str = "event_type",
    buy_type_value: str = "purchase",
    round_to: int = 6,
) -> DataFrame:
    """D2: the reference's ``process_token_data`` (``streamlit
    1.3.txt:83-113``) as a grouped-map ``applyInPandas`` — the general
    escape hatch when per-group logic outgrows native aggregates.

    Semantics intentionally identical to ``operators.risk.risk_scores``
    so tests can diff the two paths; prefer the native one (it keeps
    partial aggregation; grouped-map shuffles whole groups).
    """

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        # r16 (guide §4.2): this function runs once PER GROUP, so its
        # constant factors multiply by group count — boolean .loc
        # indexing and dict-of-rows DataFrame construction measured
        # ~12% of the query at sf0.1. pd.unique over the raw ndarray +
        # column-wise construction is the same arithmetic: nunique()
        # drops NA, so the masked form filters NA from the uniques
        # explicitly (notna) to stay exactly equivalent.
        holders = pdf[holder_col].nunique()
        mask = (pdf[buy_type_col] == buy_type_value).to_numpy()
        uniq = pd.unique(pdf[holder_col].to_numpy()[mask])
        buyers = int(pd.notna(uniq).sum())
        total = len(pdf)
        ownership = 100.0 / (1.0 + holders) if holders else 100.0
        liquidity = 100.0 / (1.0 + buyers) if buyers else 100.0
        concentration = total / (1.0 + holders)
        jeet = 0.4 * ownership + 0.4 * liquidity + 0.2 * concentration
        return pd.DataFrame(
            {
                "user_id": [pdf[key].iloc[0]],
                "unique_holders": [holders],
                "unique_buyers": [buyers],
                "total_events": [total],
                "ownership_risk": [round(ownership, round_to)],
                "liquidity_risk": [round(liquidity, round_to)],
                "txn_concentration": [round(concentration, round_to)],
                "jeet_risk_score": [round(jeet, round_to)],
                "safety_score": [round(max(0.0, 100.0 - jeet), round_to)],
            }
        )

    # NOTE (100 TB): Catalyst cannot prune columns INTO an opaque
    # grouped-map function — every input column ships through the
    # shuffle to the Python workers. At scale, pre-project the input
    # to the consumed columns (key, holder_col, buy_type_col) before
    # calling this. The operator does not force the projection itself:
    # narrowing the scan schema also shrinks its split-packing size
    # estimate, which at small scale collapses the scan to one task
    # and serializes the upstream derivation (measured +2 s at sf0.1)
    # — the caller, not this operator, owns that trade.
    return df.groupBy(key).applyInPandas(score, schema=RISK_GROUPED_SCHEMA)


def map_in_pandas_enrich(
    df: DataFrame,
    fetcher: Callable[[list], dict],
    key_col: str,
    out_col: str,
    out_schema_suffix: str = "string",
    batch_default: str = "Unknown",
) -> DataFrame:
    """D4: external-lookup enrichment over Arrow batches — the
    distributed form of the reference's async DexScreener fetch
    (``streamlit 1.3.txt:56-81``).

    ``fetcher(keys) -> {key: value}`` is called once per Arrow batch
    (put your HTTP client/asyncio.gather/rate limiter inside it); tests
    inject a mock. Partition count bounds concurrent fetchers, which is
    the engine-side rate-limiting knob (T10).
    """
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, {out_col} {out_schema_suffix}"

    def enrich(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            keys = pdf[key_col].drop_duplicates().tolist()
            mapping = fetcher(keys)
            out = pdf.copy()
            out[out_col] = pdf[key_col].map(
                lambda k: mapping.get(k, batch_default)
            )
            yield out

    return df.mapInPandas(enrich, schema=schema)
