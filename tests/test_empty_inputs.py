"""Edge-case sweep (SURVEY.md §5.2.4): every declared query must run
without error over schema-correct but EMPTY tables — empty relations,
empty groups, and null aggregate bounds all hit their degenerate paths."""

from __future__ import annotations

import pytest

from machinelearningalgomapreduce_spark import registry
from machinelearningalgomapreduce_spark.sources.catalog import TABLES, load_tables


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("empty_sf")
    t = load_tables(spark, sf_dir)
    for name in TABLES:
        t[name].limit(0).write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_query_on_empty_tables(spark, empty_sf_dir, name):
    df = registry.queries()[name](spark, empty_sf_dir)
    rows = df.collect()
    assert isinstance(rows, list)  # no crash; zero (or degenerate) rows is fine
