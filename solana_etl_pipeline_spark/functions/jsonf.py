"""Ad-hoc JSON access (SURVEY.md §2.8 F13).

For typed pipelines use ``from_json`` with the schemas in
``schemas.py``; ``json_str`` is the ad-hoc path-extraction analog of the
reference's universal ``data.get(k, default)`` pattern
(``cleandata1.py:27-33``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_str(c: Column, path: str, default: str | None = None) -> Column:
    """Extract a JSON string field; optional default on miss/null."""
    out = F.get_json_object(c, path)
    if default is not None:
        out = F.coalesce(out, F.lit(default))
    return out
