"""String functions (SURVEY.md §2.8 F5-F8)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def swap_suffix(c: Column, old: str, new: str) -> Column:
    """Replace a filename extension (F5; ``cleandata1.py:45``)."""
    return F.regexp_replace(c, f"\\{old}$", new)


def basename(c: Column, sep: str = "/") -> Column:
    """Last path segment (F6; ``key.split('/')[-1]``)."""
    return F.element_at(F.split(c, sep), -1)


def label_with_key(name: Column, key: Column) -> Column:
    """``"{name} | {key}"`` display label (F7; ``streamlit 1.3.txt:170``)."""
    return F.concat_ws(" | ", name, key)


def is_timestamp_prefixed(c: Column, digits: int = 14) -> Column:
    """True if the first ``digits`` chars are all digits
    (F8; ``clean_data.py:154``)."""
    return F.substring(c, 1, digits).rlike(f"^[0-9]{{{digits}}}$")
