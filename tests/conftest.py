"""Shared pytest fixtures: one SparkSession for the whole run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from machinelearningalgomapreduce_spark.session import ensure_query_conf, get_spark

    s = get_spark(app_name="pytest", master="local[8]", shuffle_partitions=8)
    ensure_query_conf(s)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SMOKE_SF_DIR
