"""Numeric coercion with null-on-failure (SURVEY.md §2.8 F4).

The reference relies on ``pd.to_numeric(errors='coerce')``
(``clean_data.py:318-320``): dirty strings become null, never an error.
``try_cast`` gives exactly that semantics regardless of the session's
ANSI setting — safer than depending on ANSI-off non-strict ``cast``.
"""

from __future__ import annotations

from pyspark.sql import Column


def coerce_long(c: Column) -> Column:
    """String/any -> bigint, null on failure (fee, slot)."""
    return c.try_cast("bigint")


def coerce_double(c: Column) -> Column:
    """String/any -> double, null on failure (token_amount)."""
    return c.try_cast("double")
