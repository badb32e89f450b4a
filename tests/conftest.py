"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qb_data_pipeline_backfill_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # 4g driver heap (default 1g): one JVM serves ~790 tests whose
    # checkpoint/state-store residue accumulates — the bench and the
    # correctness sweep make the same move (VERDICT r16 item 2: the
    # suite must finish inside the external driver's pytest budget).
    s = get_spark(
        "pytest",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    # leave the session up; the JVM teardown is slower than the suite


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_con():
    from qb_data_pipeline_backfill_spark.oracle import duckdb_connection

    return duckdb_connection(SF_SMOKE)
