"""Driver-mirror test: every registered query vs its DuckDB oracle.

This is the same rows+schema+hash gate the driver runs at sf0.01,
executed at sf0.001 for speed (set SPARK_GRAFT_TEST_SF_DIR to widen).
"""

from __future__ import annotations

import pytest

from solana_etl_pipeline_spark.queries import QUERIES
from tests.oracle_utils import assert_matches_oracle, duckdb_connection

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    spec = QUERIES[name]
    df = spec.spark(spark, sf_dir)
    assert_matches_oracle(df, con, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    """Non-SQL-expressible ops: schema is stable and the query executes."""
    df = QUERIES[name].spark(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name
