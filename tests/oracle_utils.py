"""Oracle-diff helpers mirroring the driver's rows+schema+hash check.

The driver sorts columns by name, hashes values order-insensitively, and
compares PySpark output against DuckDB running ``oracle_sql`` over the
same parquet files. Here we do the equivalent comparison in-process so
``pytest`` catches a mismatch before the driver does.
"""

from __future__ import annotations

import math
from typing import Iterable

import duckdb

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """Fresh DuckDB connection with fixture tables registered as views."""
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Both sides round computed floats explicitly; this guards the
        # representation (1.0 vs 1) rather than re-rounding semantics.
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _canonical_rows(columns: list[str], rows: Iterable[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_matches_oracle(spark_df, con, sql: str, name: str = "?") -> None:
    """Order-insensitive, column-name-sorted value comparison."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_canon = _canonical_rows(s_cols, s_rows)
    d_canon = _canonical_rows(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"
    )
