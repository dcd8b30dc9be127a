"""Timestamp functions (SURVEY.md §2.8 F1-F3).

Policy: timestamps are stored and compared as UTC ``TimestampType``;
zone conversion happens only at the display edge. The reference instead
bakes PST strings into its one true table (``clean_data.py:27-34``) and
re-parses them downstream (``streamlit 1.3.txt:51``) — a lossy round-trip
we deliberately do not replicate as storage semantics, only as a
display-edge rendering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's display zone (``clean_data.py:31``).
DISPLAY_ZONE = "America/Los_Angeles"

#: The reference's display format (``clean_data.py:33``), in Spark's
#: java.time pattern language.
DISPLAY_FORMAT = "yyyy-MM-dd HH:mm:ss"


def epoch_to_zoned_string(
    epoch_seconds: Column, zone: str = DISPLAY_ZONE, fmt: str = DISPLAY_FORMAT
) -> Column:
    """Epoch seconds -> zoned, formatted string (F1).

    Parity with reference ``convert_to_pst`` (``clean_data.py:27-34``):
    ``utcfromtimestamp`` -> tz-convert -> strftime; null (not crash) on
    bad input — ``timestamp_seconds`` of a null/uncastable value is null
    and ``date_format`` propagates it.
    """
    return F.date_format(
        F.from_utc_timestamp(F.timestamp_seconds(epoch_seconds), zone), fmt
    )


def to_zone(ts: Column, zone: str = DISPLAY_ZONE) -> Column:
    """UTC instant -> naive wall-clock in ``zone`` (display only)."""
    return F.from_utc_timestamp(ts, zone)


def format_ts(ts: Column, fmt: str = DISPLAY_FORMAT) -> Column:
    """Timestamp -> formatted string (F1/F3 rendering half)."""
    return F.date_format(ts, fmt)


def parse_ts(s: Column, fmt: str = DISPLAY_FORMAT) -> Column:
    """String -> timestamp (F2; reference ``streamlit 1.3.txt:51``)."""
    return F.to_timestamp(s, fmt)
