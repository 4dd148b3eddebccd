"""Shared fixtures: one SparkSession per test run, DuckDB with testdata
views, sf directory selection (sf0.001 default for speed — the driver runs
the same parity check at sf0.01).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from kafka_streams_one_to_many_join_spark.model import TESTDATA_TABLES
from kafka_streams_one_to_many_join_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "kafka: opt-in broker integration — runs only with "
        "SPARK_GRAFT_KAFKA_BOOTSTRAP set (see tests/test_kafka_integration.py)",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()
