"""Shared pytest fixtures: one small local SparkSession per test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the reference implementation is importable read-only for differential tests
if "/root/reference" not in sys.path and os.path.isdir("/root/reference"):
    sys.path.insert(0, "/root/reference")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from smatchpp_spark.session import get_spark

    s = get_spark(
        app_name="smatchpp-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
