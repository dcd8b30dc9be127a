"""THE word-tokenization convention, shared by every text path.

One convention, three implementations, pinned to each other:

* :func:`words` — the Spark expression (JVM codegen),
* :func:`py_words` — the Python twin for the Arrow/pandas-UDF paths
  (shingles, MinHash/SimHash signatures, n-gram reports),
* :func:`words_sql` — the DuckDB snippet every oracle embeds.

Convention: ``lowercase → collapse ASCII whitespace runs
([ \\t\\n\\r\\f]+) to one space → trim spaces → split on the single
literal space``. Null / empty / whitespace-only text tokenizes to
``['']`` (one empty word) — callers that explode filter that
degenerate token; callers that count sizes get 1, matching the
oracles' ``coalesce(text, '')`` rows.

Why this exact shape (formerly COVERAGE.md convention 1, now enforced
by the whitespace-hostile documents in tests/test_hostile_fixture.py):

* An explicit character class instead of ``\\s``: Java regex (Spark),
  RE2 (DuckDB) and Python ``re`` disagree on ``\\s`` membership
  (``\\x0B`` is whitespace to Java and Python but not RE2), so the
  class is spelled out once and is byte-identical in all three
  engines. Vertical tab is a word character everywhere — consistent,
  which is the requirement.
* Collapse-then-split-on-literal-space instead of splitting on the
  run regex: engines disagree on trailing-separator fields (Spark's
  ``split`` keeps trailing empties at its default ``limit=-1``;
  ``str.split`` in Python drops nothing; DuckDB keeps them), so
  ``'a\\t'`` would tokenize to ``['a', '']`` in one engine and
  ``['a']`` in another. After collapsing runs and trimming, the text
  contains no edge separators and single-space split is unambiguous.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Whitespace-run pattern as seen by Java/RE2 (escape sequences are
#: interpreted by the target regex engine, not by Python).
WS_RUN = "[ \\t\\n\\r\\f]+"

_WS_RUN_RE = re.compile("[ \t\n\r\f]+")


def words(text: Column) -> Column:
    """Canonical token array for a text column (see module doc)."""
    collapsed = F.regexp_replace(
        F.lower(F.coalesce(text, F.lit(""))), WS_RUN, " "
    )
    return F.split(F.trim(collapsed), " ")


def py_words(t: "str | None") -> list[str]:
    """Python twin of :func:`words` for the Arrow paths.

    ``strip(' ')`` after the collapse matches Spark's space-only
    ``trim``; ``''.split(' ')`` yields ``['']`` exactly like Spark's
    ``split('', ' ')``.
    """
    return _WS_RUN_RE.sub(" ", (t or "").lower()).strip(" ").split(" ")


def words_sql(col: str = "text") -> str:
    """DuckDB mirror of :func:`words` (the oracle side of the pair).

    DuckDB's default-conforming string literals pass the backslash
    escapes through to RE2 uninterpreted, so the pattern RE2 compiles
    is byte-identical to the one Java compiles for :func:`words`.
    """
    return (
        "string_split(trim(regexp_replace(lower(coalesce("
        + col
        + ", '')), '[ \\t\\n\\r\\f]+', ' ', 'g')), ' ')"
    )
