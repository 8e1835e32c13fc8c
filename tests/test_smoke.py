"""Tiny-sf smoke: every declared query runs and returns a stable schema.

Correctness-by-value is the DuckDB oracle harness (tools/check.py, driven
at sf0.01); this guards the basics at sf0.001 so a broken import or plan
never reaches the driver.
"""

from __future__ import annotations

import pytest

from machinelearningalgomapreduce_spark import registry

QUERIES = sorted(registry.queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_smoke(spark, sf_dir, name):
    fn = registry.queries()[name]
    df = fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert len(df.columns) == len(set(df.columns)), f"{name}: duplicate column names"
    rows = df.limit(5).collect()
    # Shape only: zero rows is legitimate for threshold queries at sf0.001.
    assert rows is not None
