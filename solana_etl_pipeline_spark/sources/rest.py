"""REST batch / point-lookup sources (SURVEY.md §2.1 S2/S3).

The reference fetches per-mint transaction history from a REST API in a
driver-side loop with ``time.sleep(1)`` rate limiting (``helius.py:
55-68,96``) and token names via asyncio point lookups
(``streamlit 1.3.txt:56-71``). Engine mapping:

- **small key set** → fetch on the driver, ``spark.createDataFrame``
  (:func:`fetch_batch_to_dataframe`);
- **large key set** → distribute the fetch with ``mapInPandas``
  (``operators.enrich.map_in_pandas_enrich``) so each partition runs
  its own client — partition count IS the concurrency/rate knob (T10).

Transports are injectable callables (``fetcher(key) -> list[dict]``):
tests and offline environments pass fakes; production passes an HTTP
client. No network library is imported here.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def fetch_batch_to_dataframe(
    spark: SparkSession,
    keys: Iterable[str],
    fetcher: Callable[[str], list[dict]],
    schema: StructType,
    rate_limit_per_sec: float | None = None,
) -> DataFrame:
    """S2: driver-side batched fetch → DataFrame.

    ``rate_limit_per_sec`` reproduces the reference's fixed request
    pacing (``helius.py:96``). Use only for small key sets — thousands,
    not millions; beyond that, distribute via ``map_in_pandas_enrich``.
    """
    rows: list[dict] = []
    min_interval = 1.0 / rate_limit_per_sec if rate_limit_per_sec else 0.0
    last = 0.0
    for key in keys:
        if min_interval:
            wait = min_interval - (time.monotonic() - last)
            if wait > 0:
                time.sleep(wait)
            last = time.monotonic()
        rows.extend(fetcher(key))
    return spark.createDataFrame(rows, schema=schema)
