"""Incremental-aggregation pattern (SURVEY.md §2B tier): maintain a rolled-up
materialized view by MERGING partial aggregate states instead of
recomputing from scratch — the batch analog of a streaming state store and
the core trick behind every incremental pipeline at 100 TB (only the new
partition is scanned; the base rollup is re-aggregated, not re-derived).

The checked query proves the merge algebra is exact: base (history) and
delta (new data) are aggregated separately and their partial states merged;
the oracle is the equivalent ONE-PASS aggregate. They can only hash-match
because every merged statistic is either an integer or a DECIMAL-exact sum
(order-independent) — merging double partial sums would drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.sources.catalog import load_tables

CUTOFF = "1998-01-01"


def partial_pricing_state(lineitem: DataFrame) -> DataFrame:
    """Mergeable partial state for the pricing rollup: exact DECIMAL sums +
    counts + min/max per (returnflag, linestatus). sum/count/min/max are
    all associative-commutative, so states merge by re-aggregation."""
    return lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


def merge_pricing_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial states into the final rollup (the
    re-aggregation an incremental refresh runs on [old state ∪ delta
    state]). Derived columns (avg) come from the merged sums only."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    out = merged.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_qty").alias("sum_qty"),
        F.sum("sum_price").alias("sum_price"),
        F.min("min_ship").alias("min_ship"),
        F.max("max_ship").alias("max_ship"),
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        F.round(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("sum_price").cast("double"), 2).alias("sum_price"),
        # Divide as doubles: decimal-division result scales differ between
        # engines; the exact sum casts to double identically (< 2^53).
        F.round(F.col("sum_price").cast("double") / F.col("n_rows"), 6).alias("avg_price"),
        "min_ship",
        "max_ship",
    )


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: the pricing rollup computed
    as merge(partial(history), partial(delta)) where the delta is every
    lineitem shipped on/after the cutoff. The oracle recomputes the same
    rollup in ONE pass — hash-matching proves the merge algebra is exact,
    i.e. the incremental refresh can replace the full recompute.

    Scale shape: at 100 TB the history side is the STORED O(groups) state
    (never rescanned); here both sides derive from the fixture so the
    oracle can check the algebra end-to-end. Each partial aggregate is one
    map-side-combined shuffle; the merge shuffles O(groups) rows."""
    t = load_tables(spark, sf_dir)
    cutoff = F.lit(CUTOFF).cast("timestamp")
    base = partial_pricing_state(t.lineitem.filter(F.col("l_shipdate") < cutoff))
    delta = partial_pricing_state(t.lineitem.filter(F.col("l_shipdate") >= cutoff))
    return merge_pricing_states(base, delta)


QUERIES = {"q_incremental_agg": q_incremental_agg}

ORACLES = {
    "q_incremental_agg": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
               round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                          AS DOUBLE), 2) AS sum_price,
               round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                          AS DOUBLE) / count(*), 6) AS avg_price,
               min(l_shipdate) AS min_ship,
               max(l_shipdate) AS max_ship
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
}
