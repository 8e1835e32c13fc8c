"""Layout-driven join planning (catalog.cache_partition_key): the
colocated shuffled-hash branch of q_join3_topk / q_join5_region must
produce bit-identical values to the uncached broadcast branch the
driver's correctness gate checks, and the colocated probe must add no
exchange beyond the cache-time repartition.

Runs at sf0.01 in a deliberate order — uncached baseline FIRST, then the
catalog upgrade — because load_tables memoizes per (application, dir)
and `cached=True` upgrades the shared entry in place. Only this file
and the ANN-recall test touch the sf0.01 catalog, and the latter is
value-based, so the upgrade cannot skew another test's plan snapshot.
"""

from __future__ import annotations

from machinelearningalgomapreduce_spark.operators import relational as R
from machinelearningalgomapreduce_spark.plans import inspect as P
from machinelearningalgomapreduce_spark.sources.catalog import (
    cache_partition_key,
    load_tables,
)

SF01 = "/root/testdata/sf0.01"


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_colocated_branch_matches_uncached_values(spark):
    # baseline: uncached catalog → cache_partition_key is None → both
    # queries take the broadcast-leaf branch (the one the driver checks).
    # A hard assert: if another test ever caches the sf0.01 catalog with
    # partitions before this runs, base3/base5 would silently take the
    # colocated branch too and the equivalence below would be vacuous.
    assert cache_partition_key(spark, SF01, "orders") is None
    base3 = _canon(R.q_join3_topk(spark, SF01).collect())
    base5 = _canon(R.q_join5_region(spark, SF01).collect())

    # upgrade the catalog to the bench-tier layout: fact tables cached
    # hash-partitioned on CACHE_KEYS (orders→o_custkey, customer→c_custkey)
    load_tables(spark, SF01, cached=True, cache_partitions=8)
    assert cache_partition_key(spark, SF01, "orders") == "o_custkey"
    assert cache_partition_key(spark, SF01, "customer") == "c_custkey"

    # same queries now take the colocated shuffled-hash branch
    df3 = R.q_join3_topk(spark, SF01)
    df5 = R.q_join5_region(spark, SF01)
    plan3, plan5 = P.formatted_plan(df3), P.formatted_plan(df5)
    assert "ShuffledHashJoin" in plan3, plan3
    assert "ShuffledHashJoin" in plan5, plan5

    assert _canon(df3.collect()) == base3
    assert _canon(df5.collect()) == base5


def test_colocated_probe_adds_no_exchange(spark):
    """With the layout guaranteed, the dims-build SHJ must reuse the
    cache-time partitioning: no Exchange may feed the ShuffledHashJoin
    (the entire point of reading the layout before picking the join)."""
    load_tables(spark, SF01, cached=True, cache_partitions=8)
    for q in (R.q_join3_topk, R.q_join5_region):
        plan = P.formatted_plan(q(spark, SF01))
        shj = [ln for ln in plan.splitlines() if "ShuffledHashJoin" in ln]
        assert shj, plan
        # In the formatted tree the SHJ's inputs are cached scans
        # (InMemoryTableScan), not fresh Exchanges: assert no Exchange
        # line sits between the SHJ node and its in-memory inputs.
        lines = plan.splitlines()
        i = next(j for j, ln in enumerate(lines) if "ShuffledHashJoin" in ln)
        below = "\n".join(lines[i : i + 8])
        assert "Exchange hashpartitioning" not in below, below
