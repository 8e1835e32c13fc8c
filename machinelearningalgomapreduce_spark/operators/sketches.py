"""Mergeable frequency sketches (SURVEY.md §2C library tier).

Count-Min sketch as plain DataFrames — the canonical MapReduce-era
heavy-hitter machinery re-expressed Spark-first:

- the SKETCH IS A DATAFRAME of (row, col, count) cells, built by ONE
  aggregate over a depth-way explode (depth rows per input row, each a
  different seeded xxhash64 bucket);
- sketches are MERGEABLE by construction (cell-wise sum — pytest asserts
  build(A ∪ B) ≡ merge(build(A), build(B)) exactly), which is what makes
  the structure work at 100 TB: per-partition partial sketches combine
  map-side, and day-over-day sketches merge without touching raw data;
- point estimates join the probe items against their depth cells and take
  the min — the classic CM guarantee: estimate ≥ true count, and
  ≤ true + εN with probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

Everything is JVM-side (xxhash64 + pmod + one groupBy); the sketch is
O(depth × width) rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CM_DEPTH = 4
CM_WIDTH = 256


def _bucket(col, row: int, width: int):
    """Row-seeded bucket: xxhash64 with a per-row salt prefix, non-negative
    mod width. Deterministic across partitions/engines/sessions."""
    return F.pmod(F.xxhash64(F.lit(f"cm{row}:"), col), F.lit(width))


def count_min_build(
    df: DataFrame, col: str, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> DataFrame:
    """Build the sketch: (row, col_idx, cnt) cells, one aggregate.

    The depth-way fan-out happens via posexplode of the per-row bucket
    array — depth small constant, so the pre-shuffle blow-up is bounded
    and map-side combine collapses it to ≤ depth×width rows per task."""
    buckets = F.array(*[_bucket(F.col(col), r, width) for r in range(depth)])
    return (
        df.select(F.posexplode(buckets).alias("row", "col_idx"))
        .groupBy("row", "col_idx")
        .agg(F.count("*").alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — the mergeability that makes sketches shippable."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("row", "col_idx").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point estimates for the items: min over each item's depth cells.

    The sketch side is tiny (≤ depth×width rows) and broadcast; absent
    cells count 0 (coalesce) so never-seen items estimate correctly
    against sparse sketches."""
    probes = items.select(
        F.col(col).alias("item"),
        F.posexplode(
            F.array(*[_bucket(F.col(col), r, width) for r in range(depth)])
        ).alias("row", "col_idx"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col_idx"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def hll_daily_sketches(df: DataFrame, key_col: str, day_col) -> DataFrame:
    """Per-day HyperLogLog sketches of a key column (Datasketches HLL via
    the built-in ``hll_sketch_agg`` — JVM-side, mergeable binary state).

    This is the incremental-distinct pattern at 100 TB: each day's
    partition is sketched ONCE when it lands; any date-range distinct
    count afterwards is a union of the stored day sketches — the raw data
    is never rescanned, and the stored state is KB per day instead of the
    key set."""
    return df.groupBy(day_col.alias("day")).agg(
        F.hll_sketch_agg(key_col).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def hll_range_distinct(day_sketches: DataFrame) -> DataFrame:
    """Distinct-count estimate over a set of day sketches: ONE union-agg
    over KB-sized binaries (filter the frame to the date range first)."""
    return day_sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    phi: float = 0.01,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """φ-heavy hitters via the sketch: estimate every DISTINCT value and
    keep those with est ≥ φ·N. CM overestimates only, so recall is 1 —
    every true heavy hitter survives; the width controls false positives.

    (At fixture scale the distinct-value probe is exact; at 100 TB the
    probe set is whatever candidate stream you track — the sketch itself
    never grows.)

    N comes from the sketch itself (every input row contributes exactly 1
    to each depth row, so Σcnt over row 0 = N) — no extra scan of the raw
    data, and the function works when only the sketch is at hand."""
    sketch = count_min_build(df, col, depth, width)
    total = sketch.filter(F.col("row") == 0).agg(F.sum("cnt").alias("n_total"))
    ests = count_min_estimate(sketch, df.select(col).distinct(), col, depth, width)
    return (
        ests.crossJoin(F.broadcast(total))
        .filter(F.col("est_count") >= phi * F.col("n_total"))
        .select(F.col("item").alias(col), "est_count")
    )
