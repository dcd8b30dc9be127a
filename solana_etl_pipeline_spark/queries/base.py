"""Query-registry plumbing for the driver contract.

Each named query is a ``QuerySpec``: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent ANSI SQL for the DuckDB oracle. The driver hashes both
result sets order-insensitively with columns sorted by name, so:

- every computed column is aliased identically on both sides,
- float outputs are rounded identically on both sides (sum-order
  nondeterminism across engines lives far below the rounding grain),
- top-k queries always carry a unique tie-break key.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One driver-visible query: Spark impl + optional DuckDB oracle."""

    spark: SparkQuery
    oracle: str | None  # ANSI SQL over the pre-registered views, or None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())
