"""Distributed total-order analytics — the 100 TB twins of the global-window
forms in operators/stats.py.

``q_customer_segments`` and ``q_gini`` are oracle baselines that rank the
customer-level frame through ONE unpartitioned window (`W.orderBy(...)`):
exact, hash-checkable, and fine while O(customers) rows fit one task — but at
100 TB a billion-row frame through a single WindowExec partition is the
textbook scale cliff. These helpers provide the shipped alternatives:

- ``distributed_rank``: EXACT global row_number with no single-partition
  exchange — range-repartition on the sort key, rank locally per partition
  (parallel), then add broadcast per-partition offsets. Two passes over the
  frame, both fully parallel; the only serialized state is the O(partitions)
  offset table. Sampling in ``repartitionByRange`` affects balance only,
  never rank values, so results are bit-identical to the window form
  (pytest-diffed in tests/test_scale_helpers.py).
- ``distributed_ntile``: exact NTILE semantics (first n%k buckets get one
  extra row) computed arithmetically from the distributed rank.
- ``gini_distributed``: q_gini's DECIMAL-exact formula over the distributed
  rank — bit-identical output.
- ``segment_by_quantile_cutpoints``: the cheaper approximate path — one
  ``percentile_approx`` aggregate broadcast back as cutpoints; no global
  order at all. Segment sizes are approximately n/k (tolerance-tested), the
  right trade once exact bucket cardinality stops mattering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _cols(order_cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def distributed_rank(
    df: DataFrame,
    order_cols,
    rank_col: str = "i",
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact global row_number over ``order_cols`` without a global window.

    ``order_cols`` must be a total order (include a unique tie-break) or
    ranks are nondeterministic — same contract as the window form.
    """
    spark = df.sparkSession
    n_part = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = _cols(order_cols)
    parted = df.repartitionByRange(n_part, *cols)
    local = parted.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_ri", F.row_number().over(W.partitionBy("_pid").orderBy(*cols))
    )
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # O(partitions) rows: the single-partition cumulative window here is over
    # a bounded domain (one row per shuffle partition), not the data.
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_ri") + F.col("_off")).cast("int"))
        .drop("_pid", "_ri", "_off")
    )


def distributed_ntile(
    df: DataFrame,
    k: int,
    order_cols,
    seg_col: str = "segment",
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(k) from the distributed rank: the first n % k buckets
    hold ceil(n/k) rows, the rest floor(n/k) — Spark/ANSI semantics."""
    ranked = distributed_rank(df, order_cols, rank_col="_i", n_partitions=n_partitions)
    n_row = ranked.agg(F.count("*").alias("_n"))
    seg = F.when(
        F.col("_i") <= F.col("_r") * (F.col("_q") + 1),
        F.expr("(_i + _q) div (_q + 1)"),
    ).otherwise(F.col("_r") + F.expr("(_i - _r * (_q + 1) + _q - 1) div _q"))
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .withColumn("_q", F.expr(f"_n div {k}"))
        .withColumn("_r", F.col("_n") % k)
        .withColumn(seg_col, seg.cast("int"))
        .drop("_i", "_n", "_q", "_r")
    )


def segment_by_quantile_cutpoints(
    df: DataFrame,
    value_col: str,
    k: int,
    seg_col: str = "segment",
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate top-down segmentation: segment 1 = highest values (the
    same orientation as q_customer_segments' NTILE over DESC value).

    One percentile_approx aggregate (GK sketch, mergeable map-side) yields
    k-1 cutpoints broadcast back over the frame — no global sort anywhere.
    Bucket sizes are ~n/k within sketch error; boundaries sit on real data
    values. This is the 100 TB default once exact bucket cardinality stops
    mattering (it usually does — segmentation consumers want value bands).
    """
    probs = [i / k for i in range(1, k)]  # ascending interior quantiles
    cuts = df.agg(
        F.percentile_approx(
            F.col(value_col).cast("double"), F.array(*[F.lit(p) for p in probs]), accuracy
        ).alias("_cuts")
    )
    v = F.col(value_col).cast("double")
    n_below = F.size(F.filter(F.col("_cuts"), lambda c: v > c))
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(seg_col, (F.lit(k) - n_below).cast("int"))
        .drop("_cuts")
    )


def gini_distributed(
    ltv: DataFrame,
    value_col: str = "ltv",
    tie_col: str = "o_custkey",
    n_partitions: int | None = None,
) -> DataFrame:
    """q_gini's exact formula over the distributed rank: bit-identical
    output (same DECIMAL accumulation, same rounding), no single-partition
    window over the customer frame."""
    ranked = distributed_rank(
        ltv, [value_col, tie_col], rank_col="i", n_partitions=n_partitions
    )
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("sx"),
        F.sum(F.col("i") * F.col(value_col)).alias("six"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    six = F.col("six").cast("double")
    g = (2 * six - (n + 1) * sx) / (n * sx)
    return stats.select(
        "n",
        F.round(F.col("sx"), 2).cast("double").alias("total_ltv"),
        F.round(g, 6).alias("gini"),
    )
