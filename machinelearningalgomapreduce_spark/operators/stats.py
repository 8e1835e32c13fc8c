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
from pyspark.sql.window import Window as W

from machinelearningalgomapreduce_spark.functions import money
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


def q_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit for the quantile family: per event type, the
    exact p50/p90/p99 PLUS a boolean that the mergeable approx_percentile
    sketch (accuracy 10000 — the 100 TB single-pass path,
    `percentiles_approx`) landed within tolerance. The q_dedup_minhash_est
    / q_sim_recall discipline applied to quantiles: measure the sketch
    before trusting it at scale.

    Sketch outputs differ across engines by design, so the oracle emits
    the exact values with literal TRUEs (the q_distinct_users_approx
    pattern) — the hash matches iff the sketch really is close. The
    assertion is a RANK window, not a value tolerance: the sketch's
    guarantee is on rank error, and a value tolerance breaks at small
    groups where the interpolated exact percentile sits in a wide gap
    between order statistics (observed at sf0.001 p99). The approx value
    must lie within [percentile(p−0.01), percentile(p+0.01)] — ±1% rank,
    ~100× the sketch's bound at accuracy 10000."""
    t = load_tables(spark, sf_dir)

    def pct(p: float):
        return F.expr(f"percentile(value, {p})")

    base = t.events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(pct(0.5), 6).alias("p50"),
        F.round(pct(0.9), 6).alias("p90"),
        F.round(pct(0.99), 6).alias("p99"),
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("_a50"),
        F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("_a90"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("_a99"),
        pct(0.49).alias("_lo50"), pct(0.51).alias("_hi50"),
        pct(0.89).alias("_lo90"), pct(0.91).alias("_hi90"),
        pct(0.98).alias("_lo99"), pct(1.0).alias("_hi99"),
    )
    ok = lambda a, lo, hi: F.col(a).between(F.col(lo), F.col(hi))  # noqa: E731
    return base.select(
        "event_type",
        "n",
        "p50",
        "p90",
        "p99",
        ok("_a50", "_lo50", "_hi50").alias("p50_ok"),
        ok("_a90", "_lo90", "_hi90").alias("p90_ok"),
        ok("_a99", "_lo99", "_hi99").alias("p99_ok"),
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


SAMPLE_PCT = 10


def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% hash-sample of lineitem with a verification
    rollup. Sampling by a hex digit of md5(row key) is reproducible across
    runs, engines, and partitionings — unlike TABLESAMPLE/rand() — which is
    what makes downstream debugging on samples trustworthy at 100 TB."""
    t = load_tables(spark, sf_dir)
    key = F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_partkey"))
    # First 2 hex chars of md5 → 0..255; keep < 256 * pct / 100.
    bucket = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(key), 1, 1)) - 1) * 16
        + F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(key), 2, 1))
        - 1
    )
    return (
        t.lineitem.withColumn("bucket", bucket)
        .filter(F.col("bucket") < 256 * SAMPLE_PCT // 100)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_sampled"),
            # exact cents sum (r15, functions/money.py — half-boundary class)
            money.money_sum_2dp(money.units("l_extendedprice"), wide=True).alias("sampled_price"),
        )
    )


def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly time series per event_type: the full hour grid
    (from a broadcast 1-row min/max) left-joined with the observed counts,
    missing hours zero-filled — the resample/asfreq operation every
    monitoring pipeline needs. Grid generation is `sequence` + explode;
    size = hours × types, independent of event count."""
    t = load_tables(spark, sf_dir)
    bounds = t.events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
        )
        .crossJoin(t.events.select("event_type").distinct())
    )
    observed = t.events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    return grid.join(observed, ["hour", "event_type"], "left").select(
        "hour",
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified equal-size sampling: every event_type stratum contributes
    exactly min-stratum-size events, chosen deterministically by md5 rank
    within the stratum (training-data pipelines rebalance sources this way).

    Rank-based exact-k needs a per-stratum sort — fine whenever k × strata
    fits a shuffle (here: one window pass). At 100 TB prefer the
    hash-THRESHOLD form (q_sample) per stratum, or estimate the rank cutoff
    with approx quantiles of the hash to avoid the full sort."""
    t = load_tables(spark, sf_dir)
    target = F.broadcast(
        t.events.groupBy("event_type").count().agg(F.min("count").alias("target"))
    )
    w = W.partitionBy("event_type").orderBy(F.md5(F.col("event_id").cast("string")), "event_id")
    sampled = (
        t.events.withColumn("rk", F.row_number().over(w))
        .crossJoin(target)
        .filter(F.col("rk") <= F.col("target"))
    )
    return sampled.groupBy("event_type").agg(
        F.count("*").alias("n_sampled"),
        money.money_sum_2dp(money.units("value")).alias("sum_value"),
    )


COV_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def q_cov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix (upper triangle) of the lineitem
    numeric columns — the feature-correlation profile a modeling pipeline
    computes before training.

    Exactness design: the fixture columns carry ≤ 2 decimals, so the
    sufficient statistics (Σx, Σxy, n) are accumulated as DECIMAL(18,2)
    products — EXACT, hence summation-order-independent and bit-identical
    across engines; only then cast to double for the covariance division.
    This sidesteps the float-drift problem entirely for raw-magnitude
    outputs (var(price) ~ 1e8, where round-to-6-decimals cannot absorb
    double sum-order drift the way ratio outputs like corr do).

    Scale shape: one single-row hash aggregate with map-side partials —
    one scan, one 1-row shuffle, then 6 projected rows."""
    t = load_tables(spark, sf_dir)
    dec = {c: F.col(c).cast("decimal(18,2)") for c in COV_COLS}
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(dec[c]).alias(f"s{i}") for i, c in enumerate(COV_COLS)]
    aggs += [
        F.sum(dec[a] * dec[b]).alias(f"s{i}_{j}")
        for i, a in enumerate(COV_COLS)
        for j, b in enumerate(COV_COLS)
        if j >= i
    ]
    stats = t.lineitem.agg(*aggs)
    n = F.col("n").cast("double")
    entries = [
        F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            F.round(
                (
                    F.col(f"s{i}_{j}").cast("double")
                    - F.col(f"s{i}").cast("double") * F.col(f"s{j}").cast("double") / n
                )
                / n,
                6,
            ).alias("cov_pop"),
        )
        for i, a in enumerate(COV_COLS)
        for j, b in enumerate(COV_COLS)
        if j >= i
    ]
    return stats.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.col_x", "e.col_y", "e.cov_pop"
    )


N_SEGMENTS = 4


def q_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value segmentation: lifetime value (Σ order totals) per
    customer, NTILE quartiles over the exact LTV, per-segment rollup —
    the RFM-style bucketing every marketing/feature pipeline computes.

    LTV is accumulated as DECIMAL(18,2) (exact, order-independent) so the
    NTILE ordering — and therefore the segment boundaries — are engine-
    identical; ties break on custkey. The quantile sort is one window
    over O(customers) aggregated rows, not raw orders.

    Scale shape: one orders aggregate (map-side partials) + one global
    NTILE sort of the customer-level frame + an O(segments) rollup. At
    100 TB the global window is the cliff; the SHIPPED alternatives are
    functions/ranking.py — distributed_ntile (bit-identical segments, no
    single-partition exchange) or segment_by_quantile_cutpoints (approx,
    no global order at all) — both pytest-diffed against this form."""
    t = load_tables(spark, sf_dir)
    ltv = t.orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("ltv"),
        F.count("*").alias("n_orders"),
    )
    w = W.orderBy(F.desc("ltv"), "o_custkey")
    seg = ltv.withColumn("segment", F.ntile(N_SEGMENTS).over(w))
    return seg.groupBy("segment").agg(
        F.count("*").alias("n_customers"),
        F.sum("n_orders").alias("n_orders"),
        # ltv is an exact DECIMAL(18,2) sum, so these round() calls sit on
        # values already ON the 2dp grid — identity, order-free (r15 audit:
        # not the round(sum(double)) half-boundary class).
        F.round(F.min("ltv").cast("double"), 2).alias("min_ltv"),
        F.round(F.max("ltv").cast("double"), 2).alias("max_ltv"),
        F.round(F.sum("ltv").cast("double"), 2).alias("sum_ltv"),
    )


SKEW_HEAVY_FACTOR = 2.0


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for the lineitem→orders key: key count,
    max/avg key frequency, skew ratio, heavy-hitter count (> 2× avg) —
    the pre-flight a planner (or an engineer sizing a salted join) runs
    before shuffling 100 TB on a key.

    Exactness: frequencies are integers; avg enters as an exact integer
    ratio and comparisons use integer cross-multiplication (n·n_keys >
    2·n_rows), so the heavy-hitter decision never touches floats.

    Scale shape: one key-count aggregate + one O(1)-row global rollup."""
    t = load_tables(spark, sf_dir)
    freq = t.lineitem.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    totals = freq.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_freq"),
    )
    heavy = (
        freq.crossJoin(F.broadcast(totals))
        .filter(F.col("n") * F.col("n_keys") > SKEW_HEAVY_FACTOR * F.col("n_rows"))
        .agg(F.count("*").alias("n_heavy_keys"))
    )
    return (
        totals.crossJoin(F.broadcast(heavy))
        .select(
            "n_keys",
            "n_rows",
            "max_freq",
            F.round(F.col("n_rows") / F.col("n_keys").cast("double"), 6).alias("avg_freq"),
            F.round(
                F.col("max_freq") * F.col("n_keys") / F.col("n_rows").cast("double"), 6
            ).alias("skew_ratio"),
            "n_heavy_keys",
        )
    )


def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group: the most frequent p_brand within each
    p_type (count ties break on the lexicographically smallest brand) —
    the categorical summary a profiling pass reports next to percentiles.

    argmax-by-count as min_by over a (−n, brand) struct: one hash
    aggregate with map-side partials after the (type, brand) count — no
    per-group sort window.

    Scale shape: shuffle bounded by types × brands, never the fact table."""
    t = load_tables(spark, sf_dir)
    counts = t.part.groupBy("p_type", "p_brand").agg(F.count("*").alias("n"))
    m = F.min_by(
        F.struct(F.col("p_brand"), F.col("n")),
        F.struct((-F.col("n")).alias("neg_n"), F.col("p_brand")),
    )
    return counts.groupBy("p_type").agg(
        m.getField("p_brand").alias("mode_brand"),
        m.getField("n").alias("mode_n"),
        F.sum("n").alias("n_rows"),
        F.count("*").alias("n_distinct_brands"),
    )


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime value — the inequality
    profile of a key distribution (the same math that sizes how skewed a
    workload's value concentration is).

    G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) over LTV ranked ascending
    (custkey tie-break). LTV and the rank-weighted sum are DECIMAL-exact
    (order-independent); the oracle casts them to double via VARCHAR
    (DuckDB's direct decimal→double cast is off one ulp past 2^53 —
    see q_cov_matrix).

    Scale shape: one orders aggregate, one global rank over O(customers)
    rows, one 1-row rollup. At 100 TB the unpartitioned rank window is the
    cliff; the SHIPPED alternative is functions/ranking.py::gini_distributed
    (range-partitioned two-pass rank, bit-identical output, pytest-diffed
    against this form)."""
    t = load_tables(spark, sf_dir)
    ltv = t.orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("ltv")
    )
    w = W.orderBy("ltv", "o_custkey")
    ranked = ltv.withColumn("i", F.row_number().over(w))
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.sum("ltv").alias("sx"),
        F.sum(F.col("i") * F.col("ltv")).alias("six"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    six = F.col("six").cast("double")
    g = (2 * six - (n + 1) * sx) / (n * sx)
    return stats.select("n", F.round(F.col("sx"), 2).cast("double").alias("total_ltv"),
                        F.round(g, 6).alias("gini"))


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type empirical-CDF normalization table: every distinct event
    value → its ECDF position within its event type — the rank/quantile
    transform feature pipelines apply to heavy-tailed metrics before
    modeling (maps any distribution onto [0,1] monotonically).

    Output is the normalization TABLE (one row per distinct (type, value)
    with its count, cumulative count, and ECDF); appliers broadcast it
    back onto the fact stream. ECDF divides exact integers, rounded 6.

    Scale shape: the q_ks_test envelope — one hash aggregate keyed by
    (type, distinct value), one per-type cumulative window over the far
    smaller distinct-value frame (quantize the metric at 100 TB to bound
    it), one broadcast totals join."""
    t = load_tables(spark, sf_dir)
    per_value = t.events.groupBy("event_type", "value").agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("value").rowsBetween(W.unboundedPreceding, 0)
    tot = per_value.groupBy("event_type").agg(F.sum("n").alias("n_type"))
    return (
        per_value.withColumn("cum_n", F.sum("n").over(w))
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "value",
            "n",
            "cum_n",
            F.round(F.col("cum_n") / F.col("n_type").cast("double"), 6).alias("ecdf"),
        )
    )


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data screen: observed leading-digit shares vs
    log10(1+1/d), with the per-digit chi-square contribution and the
    running total carried as a DECIMAL window sum (the q_mutual_info
    order-free discipline). The leading digit comes from the INTEGER
    part rendered as a string — no float log10, fully engine-portable.

    Scale shape: one counting aggregate to the 9-digit domain +
    O(9) arithmetic."""
    import math

    t = load_tables(spark, sf_dir)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    per = (
        t.orders.filter(F.col("o_totalprice") >= 1.0)
        .groupBy(digit.alias("digit"))
        .agg(F.count("*").alias("n"))
    )
    tot = per.agg(F.sum("n").alias("n_total"))
    expected = F.element_at(
        F.array(*[F.lit(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]),
        F.col("digit"),
    )
    joined = per.crossJoin(F.broadcast(tot))
    exp_n = expected * F.col("n_total").cast("double")
    contrib = F.round(
        (F.col("n").cast("double") - exp_n) * (F.col("n").cast("double") - exp_n) / exp_n,
        10,
    ).cast("decimal(28,10)")
    w = W.partitionBy()
    return joined.select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_total").cast("double"), 6)
        .alias("obs_share"),
        F.round(expected, 6).alias("benford_share"),
        contrib.cast("double").alias("chi2_contrib"),
        F.sum(contrib).over(w).cast("double").alias("chi2_total"),
    )


QUERIES = {
    "q_benford": q_benford,
    "q_quantile_normalize": q_quantile_normalize,
    "q_percentiles": q_percentiles,
    "q_percentile_audit": q_percentile_audit,
    "q_histogram": q_histogram,
    "q_corr": q_corr,
    "q_profile": q_profile,
    "q_sample": q_sample,
    "q_sample_stratified": q_sample_stratified,
    "q_resample": q_resample,
    "q_cov_matrix": q_cov_matrix,
    "q_customer_segments": q_customer_segments,
    "q_skew_profile": q_skew_profile,
    "q_mode": q_mode,
    "q_gini": q_gini,
}

_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
    "o_orderpriority",
)
_PROFILE_UNION = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS value FROM orders"
    for c in _PROFILE_COLS
)

# Decimal→double via VARCHAR: DuckDB's direct decimal cast double-rounds
# (int128→double, then the scale division) and lands one ulp off Spark for
# sums whose integer part exceeds 2^53; the string path is the correctly-
# rounded strtod both engines share (measured on the sf0.1 Σprice² sum).
_COV_SUMS = ",\n                   ".join(
    [
        f"CAST(CAST(sum(CAST({c} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s{i}"
        for i, c in enumerate(COV_COLS)
    ]
    + [
        f"CAST(CAST(sum(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2)))"
        f" AS VARCHAR) AS DOUBLE) AS s{i}_{j}"
        for i, a in enumerate(COV_COLS)
        for j, b in enumerate(COV_COLS)
        if j >= i
    ]
)
_COV_SELECTS = "\n        UNION ALL\n        ".join(
    f"SELECT '{a}' AS col_x, '{b}' AS col_y,"
    f" round((s{i}_{j} - s{i} * s{j} / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS cov_pop"
    f" FROM stats"
    for i, a in enumerate(COV_COLS)
    for j, b in enumerate(COV_COLS)
    if j >= i
)

ORACLES = {
    "q_quantile_normalize": """
        WITH per_value AS (
            SELECT event_type, value, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, value
        ), cum AS (
            SELECT event_type, value, n,
                   CAST(sum(n) OVER (PARTITION BY event_type ORDER BY value
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS cum_n
            FROM per_value
        ), tot AS (
            SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type
            FROM per_value GROUP BY event_type
        )
        SELECT c.event_type, c.value, c.n, c.cum_n,
               round(c.cum_n / CAST(t.n_type AS DOUBLE), 6) AS ecdf
        FROM cum c JOIN tot t USING (event_type)
    """,
    "q_mode": """
        WITH counts AS (
            SELECT p_type, p_brand, count(*) AS n
            FROM part GROUP BY p_type, p_brand
        ), ranked AS (
            SELECT p_type, p_brand, n,
                   row_number() OVER (PARTITION BY p_type ORDER BY n DESC, p_brand) AS rk,
                   CAST(sum(n) OVER (PARTITION BY p_type) AS BIGINT) AS n_rows,
                   count(*) OVER (PARTITION BY p_type) AS n_distinct_brands
            FROM counts
        )
        SELECT p_type, p_brand AS mode_brand, n AS mode_n, n_rows,
               CAST(n_distinct_brands AS BIGINT) AS n_distinct_brands
        FROM ranked WHERE rk = 1
    """,
    "q_gini": """
        WITH ltv AS (
            SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS ltv
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT ltv, row_number() OVER (ORDER BY ltv, o_custkey) AS i FROM ltv
        ), stats AS (
            SELECT count(*) AS n,
                   CAST(CAST(sum(ltv) AS VARCHAR) AS DOUBLE) AS sx,
                   CAST(CAST(sum(i * ltv) AS VARCHAR) AS DOUBLE) AS six
            FROM ranked
        )
        SELECT n,
               round(sx, 2) AS total_ltv,
               round((2 * six - (n + 1) * sx) / (n * sx), 6) AS gini
        FROM stats
    """,
    "q_customer_segments": f"""
        WITH ltv AS (
            SELECT o_custkey,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS ltv,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey
        ), seg AS (
            SELECT o_custkey, ltv, n_orders,
                   ntile({N_SEGMENTS}) OVER (ORDER BY ltv DESC, o_custkey) AS segment
            FROM ltv
        )
        SELECT CAST(segment AS INTEGER) AS segment,
               count(*) AS n_customers,
               CAST(sum(n_orders) AS BIGINT) AS n_orders,
               round(CAST(min(ltv) AS DOUBLE), 2) AS min_ltv,
               round(CAST(max(ltv) AS DOUBLE), 2) AS max_ltv,
               round(CAST(CAST(sum(ltv) AS VARCHAR) AS DOUBLE), 2) AS sum_ltv
        FROM seg
        GROUP BY segment
    """,
    "q_skew_profile": f"""
        WITH freq AS (
            SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey
        ), totals AS (
            SELECT count(*) AS n_keys,
                   CAST(sum(n) AS BIGINT) AS n_rows,
                   max(n) AS max_freq
            FROM freq
        ), heavy AS (
            SELECT count(*) AS n_heavy_keys
            FROM freq, totals
            WHERE n * n_keys > {SKEW_HEAVY_FACTOR} * n_rows
        )
        SELECT n_keys, n_rows, max_freq,
               round(n_rows / CAST(n_keys AS DOUBLE), 6) AS avg_freq,
               round(max_freq * n_keys / CAST(n_rows AS DOUBLE), 6) AS skew_ratio,
               n_heavy_keys
        FROM totals, heavy
    """,
    "q_cov_matrix": f"""
        WITH stats AS (
            SELECT count(*) AS n,
                   {_COV_SUMS}
            FROM lineitem
        )
        {_COV_SELECTS}
    """,
    "q_percentiles": """
        SELECT event_type,
               count(*) AS n,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
    """,
    "q_percentile_audit": """
        SELECT event_type,
               count(*) AS n,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99,
               TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
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
    "q_sample": f"""
        WITH keyed AS (
            SELECT l_returnflag, l_extendedprice,
                   (instr('0123456789abcdef',
                          substr(md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey)), 1, 1)) - 1) * 16
                   + instr('0123456789abcdef',
                           substr(md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey)), 2, 1)) - 1
                       AS bucket
            FROM lineitem
        )
        SELECT l_returnflag,
               count(*) AS n_sampled,
               CAST(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE) / 100 AS sampled_price
        FROM keyed
        WHERE bucket < {256 * SAMPLE_PCT // 100}
        GROUP BY l_returnflag
    """,
    "q_sample_stratified": f"""
        WITH target AS (
            SELECT min(n) AS target
            FROM (SELECT count(*) AS n FROM events GROUP BY event_type)
        ), ranked AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
            FROM events
        )
        SELECT event_type,
               count(*) AS n_sampled,
               CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
        FROM ranked, target
        WHERE rk <= target
        GROUP BY event_type
    """,
    "q_resample": """
        WITH bounds AS (
            SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS lo,
                   CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS hi
            FROM events
        ), grid AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour, t.event_type
            FROM bounds, (SELECT DISTINCT event_type FROM events) t
        ), observed AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT g.hour, g.event_type, coalesce(o.n, 0) AS n_events
        FROM grid g LEFT JOIN observed o
          ON g.hour = o.hour AND g.event_type = o.event_type
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

ORACLES["q_benford"] = """
    WITH per AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INTEGER) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM orders WHERE o_totalprice >= 1.0
        GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM per),
    scored AS (
        SELECT digit, n,
               round(CAST(n AS DOUBLE) / CAST((SELECT n_total FROM tot) AS DOUBLE), 6)
                   AS obs_share,
               round(CASE digit WHEN 1 THEN CAST(0.3010299956639812 AS DOUBLE) WHEN 2 THEN CAST(0.17609125905568124 AS DOUBLE) WHEN 3 THEN CAST(0.12493873660829992 AS DOUBLE) WHEN 4 THEN CAST(0.09691001300805642 AS DOUBLE) WHEN 5 THEN CAST(0.07918124604762482 AS DOUBLE) WHEN 6 THEN CAST(0.06694678963061322 AS DOUBLE) WHEN 7 THEN CAST(0.05799194697768673 AS DOUBLE) WHEN 8 THEN CAST(0.05115252244738129 AS DOUBLE) WHEN 9 THEN CAST(0.04575749056067514 AS DOUBLE) END, 6) AS benford_share,
               CAST(round((CAST(n AS DOUBLE)
                           - (CASE digit WHEN 1 THEN CAST(0.3010299956639812 AS DOUBLE) WHEN 2 THEN CAST(0.17609125905568124 AS DOUBLE) WHEN 3 THEN CAST(0.12493873660829992 AS DOUBLE) WHEN 4 THEN CAST(0.09691001300805642 AS DOUBLE) WHEN 5 THEN CAST(0.07918124604762482 AS DOUBLE) WHEN 6 THEN CAST(0.06694678963061322 AS DOUBLE) WHEN 7 THEN CAST(0.05799194697768673 AS DOUBLE) WHEN 8 THEN CAST(0.05115252244738129 AS DOUBLE) WHEN 9 THEN CAST(0.04575749056067514 AS DOUBLE) END) * CAST((SELECT n_total FROM tot) AS DOUBLE))
                          * (CAST(n AS DOUBLE)
                             - (CASE digit WHEN 1 THEN CAST(0.3010299956639812 AS DOUBLE) WHEN 2 THEN CAST(0.17609125905568124 AS DOUBLE) WHEN 3 THEN CAST(0.12493873660829992 AS DOUBLE) WHEN 4 THEN CAST(0.09691001300805642 AS DOUBLE) WHEN 5 THEN CAST(0.07918124604762482 AS DOUBLE) WHEN 6 THEN CAST(0.06694678963061322 AS DOUBLE) WHEN 7 THEN CAST(0.05799194697768673 AS DOUBLE) WHEN 8 THEN CAST(0.05115252244738129 AS DOUBLE) WHEN 9 THEN CAST(0.04575749056067514 AS DOUBLE) END) * CAST((SELECT n_total FROM tot) AS DOUBLE))
                          / ((CASE digit WHEN 1 THEN CAST(0.3010299956639812 AS DOUBLE) WHEN 2 THEN CAST(0.17609125905568124 AS DOUBLE) WHEN 3 THEN CAST(0.12493873660829992 AS DOUBLE) WHEN 4 THEN CAST(0.09691001300805642 AS DOUBLE) WHEN 5 THEN CAST(0.07918124604762482 AS DOUBLE) WHEN 6 THEN CAST(0.06694678963061322 AS DOUBLE) WHEN 7 THEN CAST(0.05799194697768673 AS DOUBLE) WHEN 8 THEN CAST(0.05115252244738129 AS DOUBLE) WHEN 9 THEN CAST(0.04575749056067514 AS DOUBLE) END) * CAST((SELECT n_total FROM tot) AS DOUBLE)), 10)
                    AS DECIMAL(28,10)) AS contrib
        FROM per
    )
    SELECT digit, n, obs_share, benford_share,
           CAST(contrib AS DOUBLE) AS chi2_contrib,
           CAST(sum(contrib) OVER () AS DOUBLE) AS chi2_total
    FROM scored
"""


def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of supplier revenue per
    nation — the market-concentration screen (10000·Σ share²; >2500 =
    highly concentrated). Computed as the exact integer identity
    Σ cents² / (Σ cents)²: numerator in DECIMAL (cents² overflows BIGINT
    at scale), ONE double division at the end — no per-supplier float
    shares are ever summed.

    Scale shape: one (nation, supplier) revenue aggregate + one
    nation-keyed rollup, all map-side combinable."""
    t = load_tables(spark, sf_dir)
    rev = (
        t.lineitem.join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            t.lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "s_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            ).cast("bigint").alias("cents")
        )
    )
    per_nation = rev.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents")).alias("sum_sq"),
    )
    hhi = (
        F.lit(10000.0)
        * F.col("sum_sq").cast("double")
        / (F.col("total_cents").cast("double") * F.col("total_cents").cast("double"))
    )
    return per_nation.select(
        "s_nationkey",
        "n_suppliers",
        "total_cents",
        F.round(hhi, 6).alias("hhi"),
    )


QUERIES["q_hhi"] = q_hhi

ORACLES["q_hhi"] = """
    WITH rev AS (
        SELECT s.s_nationkey, l.l_suppkey,
               CAST(sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100))
                    AS BIGINT) AS cents
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    per AS (
        SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               sum(CAST(cents AS HUGEINT) * cents) AS sum_sq
        FROM rev GROUP BY s_nationkey
    )
    SELECT s_nationkey, n_suppliers, total_cents,
           round(10000.0 * CAST(sum_sq AS DOUBLE)
                 / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE)), 6)
               AS hhi
    FROM per
"""


def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of customer revenue — the decomposable
    inequality measure next to q_gini: T = (1/n)·Σ (x_i/μ)·ln(x_i/μ),
    computed from exact cent integers via the sum identity
    T = [Σ x·ln x]/X − ln(X/n) with the Σ x·ln x fold rounded per-term
    to 10 and DECIMAL-summed (order-free, the q_mutual_info discipline).

    Scale shape: one per-customer revenue aggregate + one 1-row rollup."""
    t = load_tables(spark, sf_dir)
    per_cust = t.orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    ).filter(F.col("cents") > 0)
    term = F.round(
        F.col("cents").cast("double") * F.log(F.col("cents").cast("double")), 10
    ).cast("decimal(38,10)")
    agg = per_cust.agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(term).alias("xlnx"),
    )
    x = F.col("total_cents").cast("double")
    n = F.col("n_customers").cast("double")
    theil = F.col("xlnx").cast("double") / x - F.log(x / n)
    return agg.select(
        "n_customers",
        "total_cents",
        F.round(theil, 6).alias("theil_t"),
    )


QUERIES["q_theil_index"] = q_theil_index

ORACLES["q_theil_index"] = """
    WITH per AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
        HAVING sum(CAST(floor(o_totalprice * 100) AS BIGINT)) > 0
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               sum(CAST(round(CAST(cents AS DOUBLE) * ln(CAST(cents AS DOUBLE)), 10)
                        AS DECIMAL(38,10))) AS xlnx
        FROM per
    )
    SELECT n_customers, total_cents,
           round(CAST(xlnx AS DOUBLE) / CAST(total_cents AS DOUBLE)
                 - ln(CAST(total_cents AS DOUBLE) / CAST(n_customers AS DOUBLE)), 6)
               AS theil_t
    FROM agg
"""
