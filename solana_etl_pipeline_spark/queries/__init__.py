"""Query registry: every driver-visible query, merged across modules.

Each module contributes a ``QUERIES: dict[str, QuerySpec]``; this
package merges them (names must be globally unique) so the driver
adapter (``__spark_entry__.py``) and the bench harness (``bench.py``)
see one flat registry.
"""

from __future__ import annotations

from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.queries import aggs as _aggs
from solana_etl_pipeline_spark.queries import functions_zoo as _functions_zoo
from solana_etl_pipeline_spark.queries import io as _io
from solana_etl_pipeline_spark.queries import joins as _joins
from solana_etl_pipeline_spark.queries import llm as _llm
from solana_etl_pipeline_spark.queries import misc as _misc
from solana_etl_pipeline_spark.queries import nested as _nested
from solana_etl_pipeline_spark.queries import quality as _quality
from solana_etl_pipeline_spark.queries import reference as _reference
from solana_etl_pipeline_spark.queries import setops as _setops
from solana_etl_pipeline_spark.queries import sorts as _sorts
from solana_etl_pipeline_spark.queries import streaming as _streaming
from solana_etl_pipeline_spark.queries import tpch as _tpch
from solana_etl_pipeline_spark.queries import tpch_deep as _tpch_deep
from solana_etl_pipeline_spark.queries import tpch_derived as _tpch_derived
from solana_etl_pipeline_spark.queries import windows as _windows

QUERIES: dict[str, QuerySpec] = {}

for _mod in (
    _reference,
    _joins,
    _windows,
    _setops,
    _sorts,
    _aggs,
    _nested,
    _llm,
    _streaming,
    _io,
    _functions_zoo,
    _misc,
    _tpch,
    _tpch_deep,
    _tpch_derived,
    _quality,
):
    for _name, _spec in _mod.QUERIES.items():
        if _name in QUERIES:  # pragma: no cover - registry bug guard
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _spec

__all__ = ["QUERIES", "QuerySpec"]
