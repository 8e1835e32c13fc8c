"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``machinelearningalgomapreduce_spark``; this module
only adapts it to the driver's entry-point shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from machinelearningalgomapreduce_spark import registry
from machinelearningalgomapreduce_spark.session import ensure_query_conf

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 shape, SURVEY.md §3.2) on sf0.001."""
    ensure_query_conf(spark)
    from machinelearningalgomapreduce_spark.operators.relational import q_join5_region

    return q_join5_region(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {}
    for name, fn in registry.queries().items():
        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            ensure_query_conf(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """ANSI SQL oracles (DuckDB) for every sql-checkable query."""
    return registry.oracle_sql()
