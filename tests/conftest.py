"""Shared pytest fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os

import pytest

from solana_etl_pipeline_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark = build_session(
        app_name="solana-etl-pipeline-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_confs={"spark.sql.warehouse.dir": warehouse},
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE
