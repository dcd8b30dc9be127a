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
tests and offline environments pass fakes. :func:`http_json_fetcher`
builds the default production transport — stdlib ``urllib`` with
retry/backoff (429/5xx, honoring ``Retry-After``), per-request
timeout, and page-until-empty pagination, matching the reference's
working fetchers (``helius.py:55-68`` GET-with-limit,
``streamlit 1.3.txt:56-71`` point lookup with timeout).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
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


def _retry_after_seconds(value: "str | None", fallback: float) -> float:
    """RFC 7231 Retry-After is delay-SECONDS *or* an HTTP-DATE —
    ``float()`` alone crashes the retry path on the date form (the one
    place a crash turns rate limiting into job failure). Falls back to
    exponential backoff on anything unparseable."""
    if value is None:
        return fallback
    try:
        return max(0.0, float(value))
    except ValueError:
        pass
    try:
        from email.utils import parsedate_to_datetime

        dt = parsedate_to_datetime(value)
        return max(0.0, dt.timestamp() - time.time())
    except (TypeError, ValueError):
        return fallback


def http_json_fetcher(
    url_template: str,
    *,
    paginate: bool = False,
    page_param: str = "page",
    max_pages: int = 1000,
    max_retries: int = 3,
    backoff_base_sec: float = 0.5,
    timeout_sec: float = 10.0,
    headers: dict[str, str] | None = None,
    sleeper: Callable[[float], None] = time.sleep,
) -> Callable[[str], list[dict]]:
    """Default HTTP transport: ``fetcher(key) -> list[dict]`` over
    stdlib ``urllib`` (no extra dependencies), still injectable
    everywhere a fetcher is taken so tests swap in fakes or a local
    server.

    - ``url_template`` is formatted with ``{key}`` (e.g.
      ``http://host/api/addresses/{key}/transactions?limit=100``).
    - ``paginate=True`` appends ``&page=N`` (or ``?page=N``) starting
      at 0 and stops at the first EMPTY page (empty array or empty
      object); an object-per-page response carries no generic
      progress signal, so its first page is taken and pagination
      stops — the generic form of the reference's fetch-until-done
      loops. ``max_pages`` is a runaway guard.
    - 429 and 5xx responses (and network errors) retry up to
      ``max_retries`` times with exponential backoff
      ``backoff_base_sec * 2^attempt``; a ``Retry-After`` header wins
      over the computed delay (RFC 6585). 4xx other than 429 raise
      immediately — retrying a bad request never helps.
    - A JSON array response extends the result; a JSON object appends
      as one record.

    ``sleeper`` is injectable so tests assert backoff scheduling
    without wall-clock sleeps. Per-partition rate pacing composes via
    ``fetch_batch_to_dataframe(rate_limit_per_sec=...)`` or
    ``map_in_pandas_enrich`` partition counts (T10).
    """

    def _get(url: str) -> tuple[int, bytes, dict]:
        req = urllib.request.Request(url, headers=headers or {})
        # lowercase header keys: a plain dict .get("Retry-After") is
        # case-sensitive, and proxies legally emit "retry-after"
        # (review r15) — the HTTPMessage's own .get is
        # case-insensitive but does not survive dict()
        try:
            with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
                return resp.status, resp.read(), {
                    k.lower(): v for k, v in resp.headers.items()
                }
        except urllib.error.HTTPError as e:
            return e.code, e.read(), {
                k.lower(): v for k, v in (e.headers or {}).items()
            }

    def _get_with_retry(url: str) -> bytes:
        last_status = None
        for attempt in range(max_retries + 1):
            try:
                status, body, hdrs = _get(url)
            except (urllib.error.URLError, TimeoutError, OSError):
                status, body, hdrs = None, b"", {}
            if status is not None and status < 400:
                return body
            if status is not None and 400 <= status < 500 and status != 429:
                raise RuntimeError(f"GET {url} -> {status} (not retryable)")
            last_status = status
            if attempt < max_retries:
                delay = _retry_after_seconds(
                    hdrs.get("retry-after"),
                    backoff_base_sec * (2**attempt),
                )
                sleeper(delay)
        raise RuntimeError(
            f"GET {url} failed after {max_retries + 1} attempts "
            f"(last status: {last_status})"
        )

    def fetcher(key: str) -> list[dict]:
        # keys come from data columns — percent-encode so reserved
        # characters ('?', '&', '#', '/', space) cannot truncate the
        # URL or inject query parameters (review r15)
        base = url_template.format(key=urllib.parse.quote(str(key), safe=""))
        rows: list[dict] = []
        if not paginate:
            doc = json.loads(_get_with_retry(base))
            return doc if isinstance(doc, list) else [doc]
        sep = "&" if "?" in base else "?"
        for page in range(max_pages):
            doc = json.loads(_get_with_retry(f"{base}{sep}{page_param}={page}"))
            if not doc:
                break  # empty list OR empty object: exhausted
            if not isinstance(doc, list):
                # an object-per-page API gives the generic fetcher no
                # progress signal ([doc] is never empty — the old code
                # ran all max_pages and returned ~max_pages copies);
                # take the one object and stop (review r15)
                rows.append(doc)
                break
            rows.extend(doc)
        return rows

    return fetcher
