"""String functions (SURVEY.md §2.8 F5-F8)."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def swap_suffix(c: Column, old: str, new: str) -> Column:
    """Replace a filename extension (F5; ``cleandata1.py:45``).

    ``old``/``new`` are literals, not patterns: the whole suffix is
    regex-escaped (so '.tar.gz' or '.c++' match literally) and the
    replacement's ``$``/``\\`` are escaped so group references can't
    fire.
    """
    escaped_new = new.replace("\\", "\\\\").replace("$", "\\$")
    return F.regexp_replace(c, re.escape(old) + "$", escaped_new)


def basename(c: Column, sep: str = "/") -> Column:
    """Last path segment (F6; ``key.split('/')[-1]``). ``sep`` is a
    literal separator, escaped before hitting the split regex."""
    return F.element_at(F.split(c, re.escape(sep)), -1)


def label_with_key(name: Column, key: Column) -> Column:
    """``"{name} | {key}"`` display label (F7; ``streamlit 1.3.txt:170``)."""
    return F.concat_ws(" | ", name, key)


def is_timestamp_prefixed(c: Column, digits: int = 14) -> Column:
    """True if the first ``digits`` chars are all digits
    (F8; ``clean_data.py:154``)."""
    return F.substring(c, 1, digits).rlike(f"^[0-9]{{{digits}}}$")
