"""Distribution statistics operators (profiling surface for the pipeline).

Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
`quantile_cont`), fixed-width histograms (integer bucket arithmetic —
engine-independent), and pairwise correlation computed from explicit
sufficient statistics (Σx, Σy, Σxy, Σx², Σy², n) rather than engine
internals, exactly like operators/ml.py::q_linreg — the reference's
map(partials)+reduce(sum) idiom.

Scale notes: histograms and moment statistics are single hash aggregates
with map-side partials. Exact percentiles require a per-group sort of
values — at 100 TB prefer `approx_percentile` (t-digest, mergeable
sketch); the exact form is kept because it is oracle-checkable, the
approximate twin is `percentiles_approx` (library API, pytest-checked
against the exact one within tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.sources.catalog import load_tables

HIST_BINS = 10


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of event values per event_type."""
    t = load_tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def percentiles_approx(events: DataFrame) -> DataFrame:
    """Sketch-based twin (approx_percentile): the 100 TB path — mergeable,
    single pass, no per-group sort. Not oracle-checkable (sketch)."""
    return events.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("p90"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("p99"),
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 10-bin histogram of order totals. Bin bounds come from
    a broadcast 1-row min/max aggregate; bin index is exact integer
    arithmetic so both engines bucket identically."""
    t = load_tables(spark, sf_dir)
    bounds = t.orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bin_idx = F.least(
        F.lit(HIST_BINS - 1),
        F.floor((F.col("o_totalprice") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / HIST_BINS)),
    ).cast("int")
    return (
        t.orders.crossJoin(F.broadcast(bounds))
        .select(bin_idx.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_orders"))
    )


def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of (quantity, extendedprice) per linestatus from
    explicit sufficient statistics — no engine-internal corr() involved."""
    t = load_tables(spark, sf_dir)
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    stats = t.lineitem.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return stats.select("l_linestatus", "n", F.round(corr, 6).alias("corr_qty_price"))


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of orders: row/null/distinct counts.

    Columns are melted to (column, value-as-string) with `unpivot` — one
    Expand pass, one aggregate. String formatting differences between
    engines don't matter: only COUNTS are emitted and the casts are
    injective. At 100 TB swap countDistinct for approx_count_distinct."""
    t = load_tables(spark, sf_dir)
    melted = t.orders.unpivot(
        [],
        [F.col(c).cast("string").alias(c) for c in t.orders.columns],
        "col_name",
        "value",
    )
    return melted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("bigint")).alias("n_null"),
        F.countDistinct("value").alias("n_distinct"),
    )


QUERIES = {
    "q_percentiles": q_percentiles,
    "q_histogram": q_histogram,
    "q_corr": q_corr,
    "q_profile": q_profile,
}

_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
    "o_orderpriority",
)
_PROFILE_UNION = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS value FROM orders"
    for c in _PROFILE_COLS
)

ORACLES = {
    "q_percentiles": """
        SELECT event_type,
               count(*) AS n,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
    """,
    "q_histogram": f"""
        WITH bounds AS (
            SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
        )
        SELECT CAST(least({HIST_BINS - 1},
                    floor((o_totalprice - lo) / ((hi - lo) / {HIST_BINS}))) AS INTEGER) AS bin,
               count(*) AS n_orders
        FROM orders CROSS JOIN bounds
        GROUP BY 1
    """,
    "q_profile": f"""
        WITH melted AS (
            {_PROFILE_UNION}
        )
        SELECT col_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT value) AS n_distinct
        FROM melted
        GROUP BY col_name
    """,
    "q_corr": """
        WITH stats AS (
            SELECT l_linestatus,
                   count(*) AS n,
                   sum(l_quantity) AS sx,
                   sum(l_extendedprice) AS sy,
                   sum(l_quantity * l_extendedprice) AS sxy,
                   sum(l_quantity * l_quantity) AS sxx,
                   sum(l_extendedprice * l_extendedprice) AS syy
            FROM lineitem GROUP BY l_linestatus
        )
        SELECT l_linestatus, n,
               round((n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
        FROM stats
    """,
}
