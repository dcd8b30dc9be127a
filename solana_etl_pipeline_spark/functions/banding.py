"""Conditional banding (SURVEY.md §2.8 F11-F12).

The reference bands each risk metric into HIGH/MEDIUM/LOW with chained
ifs (``streamlit 1.3.txt:115-151``) — including the latent bug where the
>80 branch reads a key that doesn't exist (SURVEY.md §0). We implement
the *intended* 3-way band.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def risk_band(
    score: Column, high: float = 80.0, medium: float = 50.0
) -> Column:
    """3-way band: > high -> HIGH, > medium -> MEDIUM, else LOW."""
    return (
        F.when(score > high, F.lit("HIGH"))
        .when(score > medium, F.lit("MEDIUM"))
        .otherwise(F.lit("LOW"))
    )
