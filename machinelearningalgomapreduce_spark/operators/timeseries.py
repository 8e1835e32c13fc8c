"""Time-series smoothing beyond EMA (SURVEY.md §2E tier): Holt's linear
(double exponential) smoothing — level + trend as a TWO-state recurrence,
which no window frame expresses and single-state folds (q_ema) cannot
carry.

Determinism design (the q_ema discipline, extended): the per-user series
is collected in (ts, event_id) order; the fold carries a STRUCT
accumulator {level, trend} seeded at (x₁, 0) and folds elements 2..n with
the level update inlined identically in both engines (Spark `aggregate`
with a struct; DuckDB `list_reduce` over a list of structs) — the float
op sequence is step-for-step identical, so results are bit-equal before
the final rounding.

Scale shape: ONE shuffle on user_id; per-key state is the bounded event
list (same envelope as q_ema — the unbounded-key path is
applyInPandasWithState, streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.sources.catalog import load_tables

HOLT_ALPHA = 0.3  # level smoothing
HOLT_GAMMA = 0.1  # trend smoothing


def q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt linear smoothing of event values: final level, final
    trend, and the 1-step-ahead forecast (level + trend) — the
    trend-aware successor to q_ema every monitoring/forecast pipeline
    reaches for once series drift matters."""
    t = load_tables(spark, sf_dir)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.unix_micros("ts").alias("us"), "event_id", "value"))
    )
    vals = F.transform(ordered, lambda s: s["value"])
    a, g = HOLT_ALPHA, HOLT_GAMMA

    def step(acc, x):
        # new level inlined twice (level + trend update) — identical float
        # sequence to the DuckDB lambda below.
        new_l = a * x + (1 - a) * (acc["l"] + acc["b"])
        new_b = g * ((a * x + (1 - a) * (acc["l"] + acc["b"])) - acc["l"]) + (1 - g) * acc["b"]
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    init = F.struct(F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b"))
    state = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))), init, step
    )
    return t.events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(state["l"], 6).alias("holt_level"),
        F.round(state["b"], 6).alias("holt_trend"),
        F.round(state["l"] + state["b"], 6).alias("forecast_1"),
    )


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift (changepoint) scan over each event type's hourly
    count series: peak |Σ_{i≤t}(n_i − mean)| and the hour it occurs —
    the standard drift detector a pipeline runs on ingest volumes before
    trusting a day's data.

    Exactness: the deviation never touches floats — |cusum(t)|·H =
    |cum_n(t)·H − t·total| is an EXACT integer (H = hours in the series),
    so the peak and its argmax hour (min-hour tie-break) are
    engine-identical; only the final reported magnitude divides by H.

    Scale shape: one counting aggregate to the (type × hour)-bounded
    series, one per-type cumulative window over that bounded frame, two
    O(types) rollups. The fact table is touched exactly once.
    """
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    tot = hourly.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.count("*").alias("n_hours")
    )
    w = W.partitionBy("event_type").orderBy("hour")
    cum = hourly.withColumn("cum_n", F.sum("n").over(w)).withColumn(
        "t", F.row_number().over(w).cast("bigint")
    )
    scored = cum.join(tot, "event_type").withColumn(
        "d", F.abs(F.col("cum_n") * F.col("n_hours") - F.col("t") * F.col("total"))
    )
    dmax = scored.groupBy("event_type").agg(F.max("d").alias("d_max"))
    peak = (
        scored.join(dmax, "event_type")
        .filter(F.col("d") == F.col("d_max"))
        .groupBy("event_type")
        .agg(F.min("hour").alias("peak_hour"))
    )
    return (
        dmax.join(tot, "event_type")
        .join(peak, "event_type")
        .select(
            "event_type",
            "n_hours",
            "total",
            "peak_hour",
            F.round(F.col("d_max") / F.col("n_hours").cast("double"), 6).alias("cusum_max"),
        )
    )


def q_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type traffic trend: least-squares slope/intercept/R² of the
    DAILY event-count series against the day index — the "is this stream
    growing" read-out next to q_holt (per-entity smoothing) and q_cusum
    (changepoints).

    Exactness: daily counts and day indices are exact integers, so every
    sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT;
    slope/intercept/R² are rounded double expressions of them — fully
    engine-deterministic, no decimal machinery needed.

    Scale shape: one (type, day) counting aggregate (map-side partials)
    → one O(types × days) aggregate → bounded output."""
    t = load_tables(spark, sf_dir)
    day = F.datediff(F.to_date("ts"), F.lit("1995-01-01").cast("date"))
    daily = (
        t.events.groupBy("event_type", day.alias("x"))
        .agg(F.count("*").alias("y"))
    )
    x, y = F.col("x").cast("bigint"), F.col("y")
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    # try_divide: a type seen on a single day has no x-variance — slope/R²
    # are undefined (NULL), not ANSI errors.
    slope = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r_num = n * sxy - sx * sy
    r2 = F.try_divide(r_num * r_num, (n * sxx - sx * sx) * (n * syy - sy * sy))
    out = stats.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    return tiny_sorted(out, "event_type")


DECOMP_HALF = 12  # centered moving-average half-window (hours)
DECOMP_PERIOD = 24  # seasonal period (hour of day)


from machinelearningalgomapreduce_spark.functions.fixedpoint import half_up as _half_up_ts


def q_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of each event type's hourly count
    series in exact micro-units: trend = centered ±12h moving average
    (half-up micro BIGINT), seasonal = per-hour-of-day mean of the
    detrended series re-centered to zero over the period, residual =
    y·10⁶ − trend − seasonal. Every column is an exact BIGINT — the
    fixed-point oracle-checked twin of the float `decompose_series`
    library API (pytest cross-checks the two at micro precision).

    Scale shape: one counting aggregate to the (type × hour)-bounded
    series; windows run over that bounded frame partitioned by type —
    raw events are touched once, window state is O(window)."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("y"))
    w_t = (
        W.partitionBy("event_type").orderBy("hour").rowsBetween(-DECOMP_HALF, DECOMP_HALF)
    )
    with_trend = hourly.select(
        "event_type",
        "hour",
        "y",
        _half_up_ts(
            F.lit(1_000_000) * F.sum("y").over(w_t), F.count("*").over(w_t)
        ).alias("trend_micro"),
        F.hour("hour").alias("hod"),
    ).withColumn("detr_micro", F.col("y") * 1_000_000 - F.col("trend_micro"))
    seasonal_raw = with_trend.groupBy("event_type", "hod").agg(
        _half_up_ts(F.sum("detr_micro"), F.count("*")).alias("sr_micro")
    )
    s_mean = seasonal_raw.groupBy("event_type").agg(
        _half_up_ts(F.sum("sr_micro"), F.count("*")).alias("sm_micro")
    )
    seasonal = seasonal_raw.join(s_mean, "event_type").select(
        "event_type", "hod", (F.col("sr_micro") - F.col("sm_micro")).alias("seasonal_micro")
    )
    return (
        with_trend.join(F.broadcast(seasonal), ["event_type", "hod"])
        .select(
            "event_type",
            "hour",
            "y",
            "trend_micro",
            "seasonal_micro",
            (F.col("y") * 1_000_000 - F.col("trend_micro") - F.col("seasonal_micro"))
            .alias("residual_micro"),
        )
    )


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type over the daily count series:
    slope = median of all pairwise slopes, intercept = median of
    y − slope·x. Slopes are identical double divisions of exact integer
    differences; both medians interpolate over a deterministic total
    order, so the estimates are bit-equal across engines before round-6.

    Scale shape: the pair generator is O(days²) per type — days is a
    BOUNDED domain (the value-compressed series, not the raw events), so
    the quadratic is over ~10³ rows even at 100 TB of events; the raw
    table is touched once by the daily rollup."""
    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date")).alias("x"),
    ).agg(F.count("*").alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )
    slopes = pairs.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.percentile(F.col("slope"), F.lit(0.5)).alias("m"),
    )
    resid = daily.join(F.broadcast(slopes), "event_type").select(
        "event_type",
        "n_pairs",
        (F.col("y").cast("double") - F.col("m") * F.col("x").cast("double")).alias("r"),
        F.col("m"),
    )
    return resid.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.max("n_pairs").alias("n_pairs"),
        F.round(F.max("m"), 6).alias("slope_per_day"),
        F.round(F.percentile(F.col("r"), F.lit(0.5)), 6).alias("intercept"),
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each event type's hourly series onto a dense spine:
    generate every hour between the type's first and last observation
    (sequence + explode), left-join the observed counts, and emit both
    gap-fill conventions — zero-fill and last-observation-carried-forward
    — the resample step every downstream window/forecast operator
    assumes. All columns are exact integers (raw y stays NULL on gap
    rows, the honest signal).

    Scale shape: the spine is O(types × hours) — bounded domain; one
    left join + one ordered ffill window over it; raw events are
    touched once by the counting aggregate."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("y"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mx")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hour"),
    )
    joined = spine.join(hourly, ["event_type", "hour"], "left")
    w = W.partitionBy("event_type").orderBy("hour").rowsBetween(
        W.unboundedPreceding, 0
    )
    return joined.select(
        "event_type",
        "hour",
        "y",
        F.coalesce(F.col("y"), F.lit(0)).alias("y_zero_fill"),
        F.last("y", ignorenulls=True).over(w).alias("y_ffill"),
    )


QUERIES = {
    "q_gap_fill": q_gap_fill,
    "q_holt": q_holt,
    "q_cusum": q_cusum,
    "q_trend_fit": q_trend_fit,
    "q_decompose": q_decompose,
    "q_theil_sen": q_theil_sen,
}

_A, _G = HOLT_ALPHA, HOLT_GAMMA
# State is a 2-element DOUBLE list [level, trend], NOT a struct: DuckDB's
# struct-literal lambda rebinds acc.<field> to the freshly computed field
# within the same literal (sequential semantics, measured 2026-08-13), so a
# struct accumulator silently uses the NEW level inside the trend update.
# List construction has no such rebinding; the fold is then bit-identical
# to Spark's struct aggregate.
_NEW_L = f"{_A} * x[1] + {1 - _A} * (acc[1] + acc[2])"

def decompose_series(
    spark: SparkSession, sf_dir: str, trend_window: int = 24, period: int = 24
) -> DataFrame:
    """Classical additive decomposition of each event type's hourly count
    series (library API): y_t = trend_t + seasonal_{t mod period} +
    residual_t.

    - trend  = centered moving average over ±trend_window/2 hours
      (partial at the series edges — averaging whatever the frame holds,
      stated so the Python differential can reproduce it exactly);
    - seasonal = per hour-of-day mean of the detrended series, re-centered
      to sum to zero over the period (so trend keeps the level);
    - residual = y − trend − seasonal (additivity holds by construction;
      the TESTED contracts are the seasonal zero-sum, the exact window
      arithmetic vs a Python reference, and determinism).

    Scale shape: one counting aggregate to the (type × hour)-bounded
    series; the windows run over that bounded frame partitioned by type —
    the raw events are touched exactly once, the window state is
    O(trend_window).
    """
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    half = trend_window // 2
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").cast("double").alias("y"))
    w_trend = (
        W.partitionBy("event_type").orderBy("hour").rowsBetween(-half, half)
    )
    with_trend = hourly.withColumn("trend", F.avg("y").over(w_trend)).withColumn(
        "hod", F.hour("hour")
    )
    seasonal_raw = (
        with_trend.groupBy("event_type", "hod")
        .agg(F.avg(F.col("y") - F.col("trend")).alias("s_raw"))
    )
    s_mean = seasonal_raw.groupBy("event_type").agg(F.avg("s_raw").alias("s_mean"))
    seasonal = seasonal_raw.join(s_mean, "event_type").select(
        "event_type", "hod", (F.col("s_raw") - F.col("s_mean")).alias("seasonal")
    )
    return (
        with_trend.join(F.broadcast(seasonal), ["event_type", "hod"])
        .select(
            "event_type",
            "hour",
            "y",
            "trend",
            "seasonal",
            (F.col("y") - F.col("trend") - F.col("seasonal")).alias("residual"),
        )
    )


ORACLES = {
    "q_gap_fill": """
        WITH hourly AS (
            SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(hour) AS mn, max(hour) AS mx
            FROM hourly GROUP BY event_type
        ),
        spine AS (
            SELECT event_type,
                   CAST(unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS TIMESTAMP)
                       AS hour
            FROM bounds
        )
        SELECT s.event_type, s.hour, h.y,
               CAST(coalesce(h.y, 0) AS BIGINT) AS y_zero_fill,
               CAST(last_value(h.y IGNORE NULLS)
                    OVER (PARTITION BY s.event_type ORDER BY s.hour
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS y_ffill
        FROM spine s LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.hour = h.hour
    """,
    "q_decompose": f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        with_trend AS (
            SELECT event_type, hour, y,
                   CAST(floor((2 * (1000000 * sum(y) OVER w) + (count(*) OVER w))
                              / (2 * (count(*) OVER w))) AS BIGINT) AS trend_micro,
                   CAST(hour(hour) AS BIGINT) AS hod
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY hour
                         ROWS BETWEEN {DECOMP_HALF} PRECEDING AND {DECOMP_HALF} FOLLOWING)
        ),
        detr AS (
            SELECT *, y * 1000000 - trend_micro AS detr_micro FROM with_trend
        ),
        seasonal_raw AS (
            SELECT event_type, hod,
                   CAST(floor((2 * sum(detr_micro) + count(*))
                              / (2 * count(*))) AS BIGINT) AS sr_micro
            FROM detr GROUP BY event_type, hod
        ),
        s_mean AS (
            SELECT event_type,
                   CAST(floor((2 * sum(sr_micro) + count(*))
                              / (2 * count(*))) AS BIGINT) AS sm_micro
            FROM seasonal_raw GROUP BY event_type
        ),
        seasonal AS (
            SELECT r.event_type, r.hod, r.sr_micro - m.sm_micro AS seasonal_micro
            FROM seasonal_raw r JOIN s_mean m ON r.event_type = m.event_type
        )
        SELECT d.event_type, d.hour, d.y, d.trend_micro, s.seasonal_micro,
               d.y * 1000000 - d.trend_micro - s.seasonal_micro AS residual_micro
        FROM detr d JOIN seasonal s
          ON d.event_type = s.event_type AND d.hod = s.hod
    """,
    "q_theil_sen": """
        WITH daily AS (
            SELECT event_type,
                   CAST(datediff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.x < b.x
        ),
        slopes AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
                   quantile_cont(slope, 0.5) AS m
            FROM pairs GROUP BY event_type
        ),
        resid AS (
            SELECT d.event_type, s.n_pairs, s.m,
                   CAST(d.y AS DOUBLE) - s.m * CAST(d.x AS DOUBLE) AS r
            FROM daily d JOIN slopes s ON d.event_type = s.event_type
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               max(n_pairs) AS n_pairs,
               round(max(m), 6) AS slope_per_day,
               round(quantile_cont(r, 0.5), 6) AS intercept
        FROM resid GROUP BY event_type
    """,
    "q_trend_fit": """
        WITH daily AS (
            SELECT event_type,
                   CAST(datediff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
                   count(*) AS y
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type, count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM daily GROUP BY event_type
        )
        SELECT event_type, n,
               round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / nullif(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx, 0.0), 6)
                   AS slope_per_day,
               round((CAST(sy AS DOUBLE)
                      - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                         / nullif(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx, 0.0))
                        * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
               round(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                      * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy))
                     / nullif((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy), 0.0), 6)
                   AS r2
        FROM stats
        ORDER BY event_type
    """,
    "q_holt": f"""
        WITH lists AS (
            SELECT user_id, count(*) AS n_events,
                   list(value ORDER BY ts, event_id) AS vals
            FROM events GROUP BY user_id
        ), folded AS (
            SELECT user_id, n_events,
                   list_reduce(
                       list_transform(vals, v -> [v, CAST(0.0 AS DOUBLE)]),
                       (acc, x) -> [
                           {_NEW_L},
                           {_G} * (({_NEW_L}) - acc[1]) + {1 - _G} * acc[2]
                       ]) AS s
            FROM lists
        )
        SELECT user_id, n_events,
               round(s[1], 6) AS holt_level,
               round(s[2], 6) AS holt_trend,
               round(s[1] + s[2], 6) AS forecast_1
        FROM folded
    """,
    "q_cusum": """
        WITH hourly AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), tot AS (
            SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
                   count(*) AS n_hours
            FROM hourly GROUP BY event_type
        ), cum AS (
            SELECT h.event_type, h.hour,
                   CAST(sum(h.n) OVER (PARTITION BY h.event_type ORDER BY h.hour
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
                   CAST(row_number() OVER (PARTITION BY h.event_type ORDER BY h.hour)
                        AS BIGINT) AS t
            FROM hourly h
        ), scored AS (
            SELECT c.event_type, c.hour,
                   CAST(abs(c.cum_n * tt.n_hours - c.t * tt.total) AS BIGINT) AS d
            FROM cum c JOIN tot tt ON tt.event_type = c.event_type
        ), dmax AS (
            SELECT event_type, CAST(max(d) AS BIGINT) AS d_max
            FROM scored GROUP BY event_type
        ), peak AS (
            SELECT s.event_type, min(s.hour) AS peak_hour
            FROM scored s JOIN dmax m
              ON m.event_type = s.event_type AND s.d = m.d_max
            GROUP BY s.event_type
        )
        SELECT m.event_type, tt.n_hours, tt.total, p.peak_hour,
               round(m.d_max / CAST(tt.n_hours AS DOUBLE), 6) AS cusum_max
        FROM dmax m
        JOIN tot tt ON tt.event_type = m.event_type
        JOIN peak p ON p.event_type = m.event_type
    """,
}


ACF_MAX_LAG = 24


def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function table: ACF at every lag 1..24 h for each
    event type's hourly count series — q_autocorr (lag-1 only)
    generalized to the full correlogram a seasonality analysis reads.
    Pairs come from a lag-grid join on the BOUNDED hourly frame (only
    hours where both endpoints exist — the standard irregular-series
    convention); every sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²)
    is an exact BIGINT, so the per-(type, lag) correlation is an
    identical double expression rounded to 6.

    Scale shape: raw events collapse once to the (type × hour) series;
    the 24-way lag fan-out and self-join run on that bounded frame —
    O(types × hours × lags) rows, independent of the fact-table size."""
    t = load_tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("y"))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    probes = hourly.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        (F.unix_seconds("hour") - F.col("lag") * 3600).alias("prev_s"),
        F.col("y").alias("y_now"),
    )
    prev = hourly.select(
        F.col("event_type").alias("p_type"),
        F.unix_seconds("hour").alias("p_s"),
        F.col("y").alias("y_prev"),
    )
    pairs = probes.join(
        prev,
        (F.col("event_type") == F.col("p_type")) & (F.col("prev_s") == F.col("p_s")),
    )
    stats = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("y_now").alias("sx"),
        F.sum("y_prev").alias("sy"),
        F.sum(F.col("y_now") * F.col("y_prev")).alias("sxy"),
        F.sum(F.col("y_now") * F.col("y_now")).alias("sxx"),
        F.sum(F.col("y_prev") * F.col("y_prev")).alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
    )
    return stats.select(
        "event_type", "lag", "n_pairs", F.round(r, 6).alias("acf")
    )


QUERIES["q_acf"] = q_acf

ORACLES["q_acf"] = f"""
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag),
    pairs AS (
        SELECT h.event_type, l.lag, h.y AS y_now, p.y AS y_prev
        FROM hourly h
        CROSS JOIN lags l
        JOIN hourly p
          ON p.event_type = h.event_type
         AND epoch(p.hour) = epoch(h.hour) - l.lag * 3600
    ),
    stats AS (
        SELECT event_type, CAST(lag AS BIGINT) AS lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(y_now) AS BIGINT) AS sx,
               CAST(sum(y_prev) AS BIGINT) AS sy,
               CAST(sum(y_now * y_prev) AS BIGINT) AS sxy,
               CAST(sum(y_now * y_now) AS BIGINT) AS sxx,
               CAST(sum(y_prev * y_prev) AS BIGINT) AS syy
        FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag, n_pairs,
           round((CAST(n_pairs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / nullif(sqrt((CAST(n_pairs AS DOUBLE) * sxx
                                - CAST(sx AS DOUBLE) * sx)
                               * (CAST(n_pairs AS DOUBLE) * syy
                                  - CAST(sy AS DOUBLE) * sy)), 0.0), 6) AS acf
    FROM stats
"""


def q_mk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test per event type over the
    daily count series — the hypothesis-test companion to q_theil_sen's
    slope estimate: S = Σ_{i<j} sign(y_j − y_i) (exact integer over the
    bounded day-pair domain), tie-corrected variance as the exact
    integer 18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5), and the
    continuity-corrected Z from identical double expressions.

    Scale shape: one daily rollup, an O(days²)-bounded pair join, one
    tie aggregate — independent of the fact-table size."""
    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date")).alias("x"),
    ).agg(F.count("*").alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    s_stat = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.x") < F.col("b.x")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.signum((F.col("b.y") - F.col("a.y")).cast("double")).cast("bigint"))
            .alias("s_stat"),
        )
    )
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count("*").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum("t").alias("n_days"),
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias("tie_term"),
        )
    )
    joined = s_stat.join(ties, "event_type")
    n = F.col("n_days")
    var18 = n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    s = F.col("s_stat")
    s_corr = s - F.signum(s.cast("double")).cast("bigint")
    z = F.try_divide(
        s_corr.cast("double"),
        F.sqrt(var18.cast("double") / 18.0),
    )
    return joined.select(
        "event_type",
        "n_days",
        "s_stat",
        var18.alias("var18"),
        F.round(z, 6).alias("z_stat"),
    )


QUERIES["q_mk_trend"] = q_mk_trend

ORACLES["q_mk_trend"] = """
    WITH daily AS (
        SELECT event_type,
               CAST(datediff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CAST(sign(CAST(b.y - a.y AS DOUBLE)) AS BIGINT)) AS BIGINT)
                   AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.x < b.x
        GROUP BY a.event_type
    ),
    ties AS (
        SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
              FROM daily GROUP BY event_type, y)
        GROUP BY event_type
    )
    SELECT s.event_type, t.n_days, s.s_stat,
           t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_term AS var18,
           round((s.s_stat - CAST(sign(CAST(s.s_stat AS DOUBLE)) AS BIGINT))
                 / nullif(sqrt((CAST(t.n_days * (t.n_days - 1) * (2 * t.n_days + 5)
                                     - t.tie_term AS DOUBLE)) / 18.0), 0.0), 6)
               AS z_stat
    FROM s JOIN ties t ON s.event_type = t.event_type
"""


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of each event type's
    hourly count series around its median: hours classify as above/below
    the exact 2×median (ties to the median drop — the standard
    convention), runs count via sign changes over the hour order, and
    the normal-approximation Z derives from exact integers (n1, n2,
    runs) through identical double expressions.

    Scale shape: one counting aggregate to the bounded series, one
    per-type median, one lag window over the bounded frame."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("y"))
    med = hourly.groupBy("event_type").agg(
        F.percentile(2 * F.col("y"), F.lit(0.5)).cast("bigint").alias("med2")
    )
    classified = (
        hourly.join(F.broadcast(med), "event_type")
        .filter(2 * F.col("y") != F.col("med2"))
        .select(
            "event_type", "hour", (2 * F.col("y") > F.col("med2")).cast("int").alias("up")
        )
    )
    w = W.partitionBy("event_type").orderBy("hour")
    runs = classified.select(
        "event_type",
        "up",
        (F.lag("up").over(w).isNull() | (F.lag("up").over(w) != F.col("up")))
        .cast("bigint")
        .alias("new_run"),
    ).groupBy("event_type").agg(
        F.sum("up").alias("n1"),
        F.sum(1 - F.col("up")).alias("n2"),
        F.sum("new_run").alias("runs"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    nn = n1 + n2
    mu = 1.0 + 2.0 * n1 * n2 / nn
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (nn * nn * (nn - 1.0))
    z = F.try_divide(F.col("runs").cast("double") - mu, F.sqrt(var))
    return runs.select(
        "event_type", "n1", "n2", "runs",
        F.round(mu, 6).alias("expected_runs"),
        F.round(z, 6).alias("z_stat"),
    )


QUERIES["q_runs_test"] = q_runs_test

ORACLES["q_runs_test"] = """
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, CAST(quantile_cont(2 * y, 0.5) AS BIGINT) AS med2
        FROM hourly GROUP BY event_type
    ),
    classified AS (
        SELECT h.event_type, h.hour,
               CASE WHEN 2 * h.y > m.med2 THEN 1 ELSE 0 END AS up
        FROM hourly h JOIN med m ON h.event_type = m.event_type
        WHERE 2 * h.y != m.med2
    ),
    flagged AS (
        SELECT event_type, up,
               CASE WHEN lag(up) OVER w IS NULL OR lag(up) OVER w != up
                    THEN 1 ELSE 0 END AS new_run
        FROM classified
        WINDOW w AS (PARTITION BY event_type ORDER BY hour)
    ),
    agg AS (
        SELECT event_type,
               CAST(sum(up) AS BIGINT) AS n1,
               CAST(sum(1 - up) AS BIGINT) AS n2,
               CAST(sum(new_run) AS BIGINT) AS runs
        FROM flagged GROUP BY event_type
    )
    SELECT event_type, n1, n2, runs,
           round(1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)), 6) AS expected_runs,
           round((CAST(runs AS DOUBLE)
                  - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
                 / nullif(sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                               * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                                  - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                               / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                  * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                  * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))),
                          0.0), 6) AS z_stat
    FROM agg
"""


def q_rolling_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour p90 of each event type's hourly counts — the
    windowed order statistic a latency/volume SLO monitor tracks (the
    robust band next to q_rolling_median's smoother). The exact
    interpolated percentile runs over a 24-row frame of integers in both
    engines (identical interpolation), rounded to 6.

    Scale shape: raw events collapse once to the bounded hourly series;
    the percentile window carries O(24) state per row of that frame."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("y"))
    w = W.partitionBy("event_type").orderBy("hour").rowsBetween(-23, 0)
    return hourly.select(
        "event_type",
        "hour",
        "y",
        F.count("*").over(w).alias("n_window"),
        F.round(F.percentile(F.col("y"), F.lit(0.9)).over(w), 6).alias("p90_24h"),
    )


QUERIES["q_rolling_p90"] = q_rolling_p90

ORACLES["q_rolling_p90"] = """
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour, y,
           CAST(count(*) OVER w AS BIGINT) AS n_window,
           round(quantile_cont(y, 0.9) OVER w, 6) AS p90_24h
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
"""


def pacf_from_acf(acf_values: list[float]) -> list[float]:
    """Partial autocorrelations from ACF values via Durbin-Levinson
    (library API, driver-side O(L²) on the bounded lag list): pacf[k] is
    the lag-k coefficient after removing the shorter-lag structure — the
    AR-order diagnostic read next to q_acf's correlogram. Input:
    [acf(1), ..., acf(L)]; output the same length.
    """
    pacf: list[float] = []
    phi_prev: list[float] = []
    for k, r_k in enumerate(acf_values, start=1):
        if k == 1:
            phi_kk = r_k
            phi = [phi_kk]
        else:
            num = r_k - sum(
                phi_prev[j] * acf_values[k - 2 - j] for j in range(k - 1)
            )
            den = 1.0 - sum(phi_prev[j] * acf_values[j] for j in range(k - 1))
            phi_kk = num / den if den != 0.0 else 0.0
            phi = [
                phi_prev[j] - phi_kk * phi_prev[k - 2 - j] for j in range(k - 1)
            ] + [phi_kk]
        pacf.append(phi_kk)
        phi_prev = phi
    return pacf


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each nation's cumulative daily order revenue —
    the peak-to-trough risk statistic (largest drop of the running total
    below its running maximum) a revenue monitor tracks per market.

    Revenue converts to exact BIGINT cents at the scan (2-decimal money
    ×100 is within 2⁻²⁰ of an integer, so round() agrees across engines);
    cumulative sum, running max, and the drawdown maximum are all exact
    integer window/aggregate arithmetic — nothing floating anywhere.

    Scale shape: orders collapse once to the (nation × day) rollup
    (bounded: ≤25 nations × date domain); windows partition BY NATION
    over that bounded frame, never over raw orders. Customer→nation is a
    broadcast dim join onto the orders scan."""
    from pyspark.sql.window import Window as W

    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    t = load_tables(spark, sf_dir)
    cust_nat = (
        t.customer.join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    daily = (
        t.orders.join(F.broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name", F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("bigint"))
            .alias("cents")
        )
    )
    w = W.partitionBy("n_name").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    series = daily.select(
        "n_name",
        "day",
        F.sum("cents").over(w).alias("cum"),
    )
    wmax = W.partitionBy("n_name").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    dd = series.select(
        "n_name",
        (F.max("cum").over(wmax) - F.col("cum")).alias("drawdown"),
    )
    out = dd.groupBy("n_name").agg(
        F.count("*").alias("n_days"),
        F.max("drawdown").alias("max_dd_cents"),
    )
    return tiny_sorted(out, "n_name")


QUERIES["q_max_drawdown"] = q_max_drawdown

ORACLES["q_max_drawdown"] = """
    WITH daily AS (
        SELECT n_name, CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    series AS (
        SELECT n_name, day,
               sum(cents) OVER (PARTITION BY n_name ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM daily
    ),
    dd AS (
        SELECT n_name,
               max(cum) OVER (PARTITION BY n_name ORDER BY day
                              ROWS UNBOUNDED PRECEDING) - cum AS drawdown
        FROM series
    )
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(drawdown) AS BIGINT) AS max_dd_cents
    FROM dd
    GROUP BY n_name
    ORDER BY n_name
"""


def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout detection on each order priority's daily
    revenue: days whose revenue leaves the 7-day mean ± 2σ band — the
    volatility-scaled anomaly monitor (the windowed sibling of
    q_anomaly_zscore's global z-score).

    The band test is EXACT INTEGER arithmetic end to end: with window
    sums S = Σx and Q = Σx² over exact cents, |x − S/7| > 2σ is
    equivalent to (7x − S)² > 4·(7Q − S²) — cross-multiplied so no
    division, square root, or float threshold exists anywhere. The
    quadratic terms accumulate as DECIMAL(38,0) (cents² wraps BIGINT
    near $30M-days; DuckDB promotes to HUGEINT silently).

    Scale shape: orders collapse once to the (priority × day) rollup
    (bounded domain); the 7-row window runs per priority over that
    bounded frame with O(7) state."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    daily = (
        t.orders.groupBy(
            "o_orderpriority", F.date_trunc("day", "o_orderdate").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("bigint"))
            .alias("cents")
        )
    )
    w7 = W.partitionBy("o_orderpriority").orderBy("day").rowsBetween(-6, 0)
    wn = W.partitionBy("o_orderpriority").orderBy("day")
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    framed = daily.select(
        "o_orderpriority",
        "day",
        "cents",
        F.sum("cents").over(w7).alias("s7"),
        F.sum(dec(F.col("cents")) * dec(F.col("cents"))).over(w7).alias("q7"),
        F.row_number().over(wn).alias("rn"),
    ).filter(F.col("rn") >= 7)
    lhs = dec(F.lit(7) * F.col("cents") - F.col("s7"))
    lhs2 = lhs * lhs
    rhs = 4 * (F.lit(7).cast("decimal(19,0)") * F.col("q7") - dec(F.col("s7")) * dec(F.col("s7")))
    breakout = F.when(
        lhs2 > rhs,
        F.when(F.lit(7) * F.col("cents") - F.col("s7") > 0, F.lit(1)).otherwise(F.lit(-1)),
    ).otherwise(F.lit(0))
    return framed.select(
        "o_orderpriority",
        "day",
        "cents",
        "s7",
        breakout.cast("int").alias("breakout"),
    )


QUERIES["q_bollinger"] = q_bollinger

ORACLES["q_bollinger"] = """
    WITH daily AS (
        SELECT o_orderpriority, CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS cents
        FROM orders GROUP BY 1, 2
    ),
    framed AS (
        SELECT o_orderpriority, day, cents,
               sum(cents) OVER w7 AS s7,
               sum(CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0))) OVER w7 AS q7,
               CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY day) AS INTEGER) AS rn
        FROM daily
        WINDOW w7 AS (PARTITION BY o_orderpriority ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT o_orderpriority, day, CAST(cents AS BIGINT) AS cents,
           CAST(s7 AS BIGINT) AS s7,
           CAST(CASE
               WHEN CAST(7 * cents - s7 AS DECIMAL(19,0)) * CAST(7 * cents - s7 AS DECIMAL(19,0))
                    > 4 * (CAST(7 AS DECIMAL(19,0)) * q7
                           - CAST(s7 AS DECIMAL(19,0)) * CAST(s7 AS DECIMAL(19,0)))
               THEN CASE WHEN 7 * cents - s7 > 0 THEN 1 ELSE -1 END
               ELSE 0
           END AS INTEGER) AS breakout
    FROM framed
    WHERE rn >= 7
"""


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point per event type via exact binary segmentation:
    the day-boundary split of the daily count series that maximizes the
    between-segment sum-of-squares — the batch form of drift
    localization, one step past q_cusum's peak statistic (CUSUM flags
    THAT the mean shifted; this reports the split and both segment
    means a monitor would alert with).

    Exactness: the between-SS identity gain(t) = D(t)²/(n·t·(n−t)) with
    D(t) = n·cum(t) − t·total reuses q_cusum's exact-integer deviation,
    so gain is two correctly-rounded IEEE ops on ≤2^53 integers —
    bit-identical across engines; the argmax ranks on the micro-scaled
    integer gain with a min-day tie-break. Segment means are micro
    fixed-point.

    Scale shape: one counting aggregate to the (type × day)-bounded
    series, one per-type cumulative window over that bounded frame, one
    rank window, O(types) output. The fact table is scanned once.
    """
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("cnt"))
    tot = daily.groupBy("event_type").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_days")
    )
    w = W.partitionBy("event_type").orderBy("day")
    cum = (
        daily.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("t", F.row_number().over(w).cast("bigint"))
        .join(tot, "event_type")
        .filter(F.col("t") < F.col("n_days"))
    )
    d = F.col("n_days") * F.col("cum") - F.col("t") * F.col("total")
    gain = (d.cast("double") * d.cast("double")) / (
        F.col("n_days") * F.col("t") * (F.col("n_days") - F.col("t"))
    ).cast("double")
    scored = cum.withColumn(
        "gain_micro", F.floor(gain * 1000000.0 + F.lit(0.5)).cast("bigint")
    )
    wbest = W.partitionBy("event_type").orderBy(F.desc("gain_micro"), "day")
    best = scored.withColumn("rk", F.row_number().over(wbest)).filter(F.col("rk") == 1)
    mean_l = F.floor(
        F.col("cum").cast("double") / F.col("t").cast("double") * 1000000.0 + F.lit(0.5)
    ).cast("bigint")
    mean_r = F.floor(
        (F.col("total") - F.col("cum")).cast("double")
        / (F.col("n_days") - F.col("t")).cast("double")
        * 1000000.0
        + F.lit(0.5)
    ).cast("bigint")
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    out = best.select(
        "event_type",
        "n_days",
        F.col("day").alias("split_day"),
        F.col("t").alias("left_days"),
        mean_l.alias("mean_left_micro"),
        mean_r.alias("mean_right_micro"),
        "gain_micro",
    )
    return tiny_sorted(out, "event_type")


QUERIES["q_changepoint"] = q_changepoint

ORACLES["q_changepoint"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ),
    cum AS (
        SELECT d.event_type, d.day,
               sum(cnt) OVER (PARTITION BY d.event_type ORDER BY d.day) AS cum,
               CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)
                    AS BIGINT) AS t,
               tt.total, tt.n_days
        FROM daily d JOIN tot tt USING (event_type)
    ),
    scored AS (
        SELECT *,
               CAST(floor(
                   (CAST(n_days * cum - t * total AS DOUBLE)
                    * CAST(n_days * cum - t * total AS DOUBLE))
                   / CAST(n_days * t * (n_days - t) AS DOUBLE)
                   * 1000000.0 + 0.5) AS BIGINT) AS gain_micro
        FROM cum WHERE t < n_days
    ),
    best AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY gain_micro DESC, day) AS rk
        FROM scored
    )
    SELECT event_type, n_days, day AS split_day, t AS left_days,
           CAST(floor(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS mean_left_micro,
           CAST(floor(CAST(total - cum AS DOUBLE) / CAST(n_days - t AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS mean_right_micro,
           gain_micro
    FROM best WHERE rk = 1
    ORDER BY event_type
"""


HW_ALPHA = 0.3   # level smoothing
HW_GAMMA = 0.1   # trend smoothing
HW_DELTA = 0.2   # seasonal smoothing
HW_SEASON = 7    # weekly seasonality on the daily series


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type additive Holt-Winters (triple exponential) smoothing of
    the daily event-count series — the seasonal successor to q_holt:
    level + trend + a rotating 7-slot weekly seasonal, the state a
    volume forecaster actually carries for ingest monitoring.

    State is a 9-slot DOUBLE list [l, b, s₁..s₇] folded over the
    day-ordered counts; each step consumes s₁ (the seasonal due at this
    position) and appends the re-estimated seasonal at the tail, so the
    array rotates in lock-step with the calendar. Seeds are the defined
    semantic l₀ = x₁, b₀ = 0, s = 0⃗ (documented, engine-identical).
    The q_holt determinism discipline: the new-level expression is
    INLINED everywhere it is referenced, so the float-op sequence is
    step-for-step identical between Spark `aggregate` and DuckDB
    `list_reduce`; outputs round to 6.

    Scale shape: one counting aggregate to the bounded (type × day)
    frame, one groupBy(type) fold over its own bounded list — the
    q_ema/q_holt envelope (unbounded-key streaming twin:
    applyInPandasWithState, streaming/stateful.py)."""
    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("double").alias("x"))
    ordered = F.array_sort(F.collect_list(F.struct("day", "x")))
    vals = F.transform(ordered, lambda s: s["x"])
    a, g, d = HW_ALPHA, HW_GAMMA, HW_DELTA

    def step(acc, x):
        def new_l():
            return a * (x - F.element_at(acc, 3)) + (1 - a) * (
                F.element_at(acc, 1) + F.element_at(acc, 2)
            )

        new_b = g * (new_l() - F.element_at(acc, 1)) + (1 - g) * F.element_at(acc, 2)
        new_s = d * (x - new_l()) + (1 - d) * F.element_at(acc, 3)
        return F.concat(
            F.array(new_l(), new_b),
            F.slice(acc, 4, HW_SEASON - 1),
            F.array(new_s),
        )

    init = F.concat(
        F.array(F.element_at(vals, 1), F.lit(0.0)),
        F.array_repeat(F.lit(0.0), HW_SEASON),
    )
    state = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))), init, step
    )
    return daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(state[0], 6).alias("hw_level"),
        F.round(state[1], 6).alias("hw_trend"),
        F.round(state[2], 6).alias("hw_season_next"),
        F.round(state[0] + state[1] + state[2], 6).alias("forecast_1"),
    )


QUERIES["q_holt_winters"] = q_holt_winters

_HWA, _HWG, _HWD = HW_ALPHA, HW_GAMMA, HW_DELTA
# The new-level expression inlined everywhere (the q_holt discipline).
_HW_L = f"{_HWA} * (x[1] - acc[3]) + {1 - _HWA} * (acc[1] + acc[2])"

ORACLES["q_holt_winters"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    lists AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               list(x ORDER BY day) AS vals
        FROM daily GROUP BY event_type
    ),
    folded AS (
        SELECT event_type, n_days,
               list_reduce(
                   list_transform(vals, v -> [v, 0.0, 0.0, 0.0, 0.0, 0.0,
                                              0.0, 0.0, 0.0]),
                   (acc, x) -> [
                           {_HW_L},
                           {_HWG} * (({_HW_L}) - acc[1]) + {1 - _HWG} * acc[2]
                       ] || acc[4:9] ||
                       [{_HWD} * (x[1] - ({_HW_L})) + {1 - _HWD} * acc[3]]
                   ) AS s
        FROM lists
    )
    SELECT event_type, n_days,
           round(s[1], 6) AS hw_level,
           round(s[2], 6) AS hw_trend,
           round(s[3], 6) AS hw_season_next,
           round(s[1] + s[2] + s[3], 6) AS forecast_1
    FROM folded
"""


PH_DELTA = 0.5   # magnitude tolerance
PH_LAMBDA = 30.0  # alarm threshold


def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift test on each type's daily count series — the
    sequential (one-pass, O(1)-state) mean-INCREASE detector that
    complements the batch localizers: q_cusum scores the peak deviation,
    q_changepoint localizes the split, Page-Hinkley is the form a
    monitor can actually run incrementally: mₜ = Σ(xᵢ − x̄ᵢ − δ) with
    x̄ᵢ the running mean, PH = mₜ − min m, alarm when PH > λ.

    State is the 4-slot DOUBLE list [Σx, n, m, m_min] folded over the
    day-ordered counts (q_holt discipline: the running-mean division
    happens INSIDE the fold, same op sequence in both engines — each
    step is correctly-rounded IEEE arithmetic, so the fold is
    bit-identical). Outputs round to 6; the alarm is an integer
    decision on the rounded statistic.

    Scale shape: one counting aggregate to the bounded (type × day)
    frame + one per-type fold — the q_ema envelope; the streaming twin
    (streaming/stateful.py::type_page_hinkley) carries the same 4
    numbers in applyInPandasWithState at event granularity,
    differential-tested against this recurrence."""
    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("double").alias("x"))
    ordered = F.array_sort(F.collect_list(F.struct("day", "x")))
    vals = F.transform(ordered, lambda s: s["x"])
    dlt = PH_DELTA

    def step(acc, x):
        s_new = F.element_at(acc, 1) + x
        n_new = F.element_at(acc, 2) + 1.0
        m_new = F.element_at(acc, 3) + (x - (s_new / n_new) - dlt)
        return F.array(s_new, n_new, m_new, F.least(F.element_at(acc, 4), m_new))

    init = F.array(
        F.element_at(vals, 1),
        F.lit(1.0),
        F.element_at(vals, 1) - F.element_at(vals, 1) / F.lit(1.0) - F.lit(dlt),
        F.element_at(vals, 1) - F.element_at(vals, 1) / F.lit(1.0) - F.lit(dlt),
    )
    state = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))), init, step
    )
    ph = F.round(state[2] - state[3], 6)
    return daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(state[2], 6).alias("m_final"),
        F.round(state[3], 6).alias("m_min"),
        ph.alias("ph"),
        (ph > PH_LAMBDA).cast("int").alias("alarm"),
    )


QUERIES["q_page_hinkley"] = q_page_hinkley

_PHD = PH_DELTA
# first element seeds the fold: m₁ = x₁ − x₁/1 − δ = −δ, inlined below.
ORACLES["q_page_hinkley"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    lists AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               list(x ORDER BY day) AS vals
        FROM daily GROUP BY event_type
    ),
    folded AS (
        SELECT event_type, n_days,
               list_reduce(
                   list_transform(vals,
                       v -> [v, 1.0, v - v / 1.0 - {_PHD}, v - v / 1.0 - {_PHD}]),
                   (acc, x) -> [
                       acc[1] + x[1],
                       acc[2] + 1.0,
                       acc[3] + (x[1] - ((acc[1] + x[1]) / (acc[2] + 1.0)) - {_PHD}),
                       least(acc[4],
                             acc[3] + (x[1] - ((acc[1] + x[1]) / (acc[2] + 1.0)) - {_PHD}))
                   ]) AS s
        FROM lists
    )
    SELECT event_type, n_days,
           round(s[3], 6) AS m_final,
           round(s[4], 6) AS m_min,
           round(s[3] - s[4], 6) AS ph,
           CAST(CASE WHEN round(s[3] - s[4], 6) > {PH_LAMBDA} THEN 1 ELSE 0 END
                AS INTEGER) AS alarm
    FROM folded
"""


# ------------------------------------------------------------------ session-5
# monitoring & diagnostics tier: white-noise testing (Ljung-Box), cross-series
# lead/lag screening, EWMA control charting, and trend-residual diagnostics
# (Durbin-Watson) — the statistics an operations dashboard runs NEXT to the
# per-series smoothers (q_ema/q_holt) and drift detectors (q_cusum,
# q_page_hinkley, q_changepoint) already in this module.

LB_MAX_LAG = 7          # portmanteau depth m (one week of daily lags)
LB_CRIT_95 = 14.067140  # chi-square 0.95 quantile at df = LB_MAX_LAG


def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test per event type: is the daily-count
    series white noise once you pool the first m=7 autocorrelations?
    Q = n(n+2)·Σₖ ρ̂ₖ²/(n−k) with ρ̂ₖ = cₖ/c₀ the standard SINGLE-variance
    autocorrelation estimate (shared mean and denominator across lags) —
    deliberately different from q_acf's per-lag Pearson correlogram,
    because Q's χ² null calibration assumes this estimator.

    Exactness: positions come from row_number over the day-ordered
    series, so every sufficient statistic (n, Σx, Σx², and per-lag
    n_pairs, Σxₜ, Σxₜ₋ₖ, Σxₜxₜ₋ₖ) is an exact BIGINT; ρ̂ₖ and the per-lag
    terms are identical double expressions of them, and the m-term sum
    folds in lag order seeded at 0.0 in BOTH engines (left-fold over the
    lag-sorted term list), so Q is bit-identical before the round.

    Scale shape: raw events collapse once to the bounded (type × day)
    frame; the row_number window, 7-way lag fan-out, self-join, and the
    final per-type fold all run on that O(types × days) frame —
    independent of the fact-table size."""
    from pyspark.sql.window import Window as W

    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    pos = daily.select(
        "event_type",
        "x",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("day"))
        .cast("bigint")
        .alias("t"),
    )
    lags = spark.range(1, LB_MAX_LAG + 1).select(F.col("id").alias("lag"))
    probes = pos.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        (F.col("t") - F.col("lag")).alias("pt"),
        F.col("x").alias("xa"),
    )
    prev = pos.select(
        F.col("event_type").alias("p_type"),
        F.col("t").alias("p_t"),
        F.col("x").alias("xb"),
    )
    pairs = probes.join(
        prev, (F.col("event_type") == F.col("p_type")) & (F.col("pt") == F.col("p_t"))
    )
    per_lag = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("xa").alias("sa"),
        F.sum("xb").alias("sb"),
        F.sum(F.col("xa") * F.col("xb")).alias("sab"),
    )
    totals = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    j = per_lag.join(F.broadcast(totals), "event_type")
    nd = F.col("n_days").cast("double")
    mean = F.col("sx").cast("double") / nd
    c0 = F.col("sxx").cast("double") - mean * F.col("sx").cast("double")
    ck = (
        F.col("sab").cast("double")
        - mean * F.col("sa").cast("double")
        - mean * F.col("sb").cast("double")
        + F.col("n_pairs").cast("double") * mean * mean
    )
    rho = ck / c0
    term = rho * rho / (nd - F.col("lag").cast("double"))
    lagrows = j.select(
        "event_type", "lag", "n_days", rho.alias("rho"), term.alias("term")
    )
    agg = lagrows.groupBy("event_type", "n_days").agg(
        F.count("*").alias("m_lags"),
        F.max(F.when(F.col("lag") == 1, F.round(F.col("rho"), 6))).alias("rho1"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lag", "term"))),
                lambda s: s["term"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("s"),
    )
    ndq = F.col("n_days").cast("double")
    q = ndq * (ndq + 2.0) * F.col("s")
    out = agg.select(
        "event_type",
        "n_days",
        "m_lags",
        "rho1",
        F.round(q, 6).alias("q_stat"),
        (F.round(q, 6) > LB_CRIT_95).cast("int").alias("reject"),
    )
    return tiny_sorted(out, "event_type")


QUERIES["q_ljung_box"] = q_ljung_box

ORACLES["q_ljung_box"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    pos AS (
        SELECT event_type, x,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS t
        FROM daily
    ),
    lags AS (SELECT CAST(unnest(range(1, {LB_MAX_LAG + 1})) AS BIGINT) AS lag),
    pairs AS (
        SELECT a.event_type, l.lag, a.x AS xa, b.x AS xb
        FROM pos a CROSS JOIN lags l
        JOIN pos b ON b.event_type = a.event_type AND b.t = a.t - l.lag
    ),
    per_lag AS (
        SELECT event_type, lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(xa) AS BIGINT) AS sa,
               CAST(sum(xb) AS BIGINT) AS sb,
               CAST(sum(xa * xb) AS BIGINT) AS sab
        FROM pairs GROUP BY 1, 2
    ),
    totals AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM daily GROUP BY 1
    ),
    terms AS (
        SELECT p.event_type, p.lag, t.n_days,
               (CAST(p.sab AS DOUBLE)
                - (CAST(t.sx AS DOUBLE) / CAST(t.n_days AS DOUBLE))
                  * CAST(p.sa AS DOUBLE)
                - (CAST(t.sx AS DOUBLE) / CAST(t.n_days AS DOUBLE))
                  * CAST(p.sb AS DOUBLE)
                + CAST(p.n_pairs AS DOUBLE)
                  * (CAST(t.sx AS DOUBLE) / CAST(t.n_days AS DOUBLE))
                  * (CAST(t.sx AS DOUBLE) / CAST(t.n_days AS DOUBLE)))
               / (CAST(t.sxx AS DOUBLE)
                  - (CAST(t.sx AS DOUBLE) / CAST(t.n_days AS DOUBLE))
                    * CAST(t.sx AS DOUBLE)) AS rho,
               CAST(t.n_days AS DOUBLE) AS nd
        FROM per_lag p JOIN totals t USING (event_type)
    ),
    folded AS (
        SELECT event_type, n_days,
               CAST(count(*) AS BIGINT) AS m_lags,
               max(CASE WHEN lag = 1 THEN round(rho, 6) END) AS rho1,
               list_reduce(
                   list_prepend(0.0,
                       list(rho * rho / (nd - CAST(lag AS DOUBLE))
                            ORDER BY lag)),
                   (a, x) -> a + x) AS s
        FROM terms GROUP BY 1, 2
    )
    SELECT event_type, n_days, m_lags, rho1,
           round(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 2.0) * s,
                 6) AS q_stat,
           CAST(CASE WHEN round(CAST(n_days AS DOUBLE)
                               * (CAST(n_days AS DOUBLE) + 2.0) * s, 6)
                          > {LB_CRIT_95} THEN 1 ELSE 0 END
                AS INTEGER) AS reject
    FROM folded
    ORDER BY event_type
"""


XCORR_LAG_DAYS = 1  # screening lag: does yesterday's B predict today's A?


def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series lead/lag screen: for every ORDERED pair of event
    types (target, leader), the Pearson correlation between the target's
    daily count and the leader's PREVIOUS-day count — "which metric
    moves first", the bivariate companion of q_acf's within-series
    correlogram and the screening step before q_diff_in_diff-style
    causal reads. Pairs use the irregular-series convention (only days
    where both endpoints exist, q_acf discipline); `lead_rank` orders
    each target's candidate leaders by the ROUNDED correlation with a
    type-name tiebreak, so the ranking is fully deterministic.

    Exactness: daily counts are exact BIGINTs, so all six sufficient
    statistics are exact; r is the identical double expression in both
    engines, rounded to 6 before ranking and output.

    Scale shape: events collapse once to the (type × day) frame; the
    pair join and rank window run on that bounded frame — O(types² ×
    days) worst case with types a handful, never touching raw events
    twice."""
    from pyspark.sql.window import Window as W

    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    tgt = daily.select(
        F.col("event_type").alias("type_tgt"),
        F.col("day").alias("d"),
        F.col("x").alias("xt"),
    )
    led = daily.select(
        F.col("event_type").alias("type_lead"),
        F.date_add(F.col("day"), XCORR_LAG_DAYS).alias("d2"),
        F.col("x").alias("xl"),
    )
    pairs = tgt.join(
        led, (F.col("d") == F.col("d2")) & (F.col("type_tgt") != F.col("type_lead"))
    )
    stats = pairs.groupBy("type_tgt", "type_lead").agg(
        F.count("*").alias("n_pairs"),
        F.sum("xt").alias("sx"),
        F.sum("xl").alias("sy"),
        F.sum(F.col("xt") * F.col("xl")).alias("sxy"),
        F.sum(F.col("xt") * F.col("xt")).alias("sxx"),
        F.sum(F.col("xl") * F.col("xl")).alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
    )
    scored = stats.select(
        "type_tgt", "type_lead", "n_pairs", F.round(r, 6).alias("xcorr")
    )
    w = W.partitionBy("type_tgt").orderBy(F.col("xcorr").desc(), F.col("type_lead"))
    out = scored.select(
        "type_tgt",
        "type_lead",
        "n_pairs",
        "xcorr",
        F.row_number().over(w).cast("bigint").alias("lead_rank"),
    )
    return tiny_sorted(out, "type_tgt", "type_lead")


QUERIES["q_lead_lag"] = q_lead_lag

ORACLES["q_lead_lag"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type AS type_tgt, b.event_type AS type_lead,
               a.x AS xt, b.x AS xl
        FROM daily a
        JOIN daily b
          ON a.day = b.day + {XCORR_LAG_DAYS}
         AND a.event_type <> b.event_type
    ),
    stats AS (
        SELECT type_tgt, type_lead,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(xt) AS BIGINT) AS sx,
               CAST(sum(xl) AS BIGINT) AS sy,
               CAST(sum(xt * xl) AS BIGINT) AS sxy,
               CAST(sum(xt * xt) AS BIGINT) AS sxx,
               CAST(sum(xl * xl) AS BIGINT) AS syy
        FROM pairs GROUP BY 1, 2
    ),
    scored AS (
        SELECT type_tgt, type_lead, n_pairs,
               round((CAST(n_pairs AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * sy)
                     / nullif(sqrt((CAST(n_pairs AS DOUBLE) * sxx
                                    - CAST(sx AS DOUBLE) * sx)
                                   * (CAST(n_pairs AS DOUBLE) * syy
                                      - CAST(sy AS DOUBLE) * sy)), 0.0), 6)
                   AS xcorr
        FROM stats
    )
    SELECT type_tgt, type_lead, n_pairs, xcorr,
           CAST(row_number() OVER (PARTITION BY type_tgt
                                   ORDER BY xcorr DESC, type_lead)
                AS BIGINT) AS lead_rank
    FROM scored
    ORDER BY type_tgt, type_lead
"""


EWMA_LAMBDA = 0.2  # smoothing weight λ
EWMA_L = 3.0       # control-limit width in asymptotic σ units
# Derived constants are computed ONCE here and interpolated as decimal
# literals into both engines (q_holt discipline): repr() round-trips the
# exact double, so 1−λ, (1−λ)² and λ/(2−λ) are bit-identical on both
# sides without trusting either engine's constant folding.
_EW_OM = 1.0 - EWMA_LAMBDA
_EW_OM2 = _EW_OM * _EW_OM
_EW_FAC = EWMA_LAMBDA / (2.0 - EWMA_LAMBDA)


def q_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart per event type (SPC form): zₜ = λxₜ + (1−λ)zₜ₋₁
    seeded at the series mean, with TIME-VARYING limits x̄ ± L·σ̂·√(λ/(2−λ)
    ·(1−(1−λ)^2t)) — the exact small-t correction a monitor needs in its
    first samples. Complements q_ema (plain smoother, no limits), q_cusum
    (batch peak deviation) and q_page_hinkley (mean-increase only):
    the EWMA chart alarms on BOTH directions with calibrated width.

    Exactness: the variance factor (1−λ)^2t is carried IN the fold state
    (p' = p·(1−λ)², one IEEE multiply per step) rather than through
    pow() — libm pow differs across engines in the last ulp, a fold of
    multiplies cannot. x̄ and σ̂ come from exact BIGINT Σx/Σx²; every fold
    step is the same correctly-rounded op sequence in both engines, so
    z, the alarm count, and the first-alarm index are bit-identical.

    Scale shape: one counting aggregate to the bounded (type × day)
    frame + one per-type fold — the q_page_hinkley envelope; the state
    is 6 doubles regardless of series length."""
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("xi")
    )
    lists = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("xi").alias("sx"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", F.col("xi").cast("double").alias("xd")))),
            lambda s: s["xd"],
        ).alias("vals"),
    )
    nd = F.col("n_days").cast("double")
    mean_e = F.col("sx").cast("double") / nd
    sd_e = F.sqrt(
        F.try_divide(
            F.col("sxx").cast("double") - mean_e * F.col("sx").cast("double"),
            nd - 1.0,
        )
    )
    model = lists.select("event_type", "n_days", "vals", mean_e.alias("mean"), sd_e.alias("sd"))

    lam, om, om2, fac, lw = EWMA_LAMBDA, _EW_OM, _EW_OM2, _EW_FAC, EWMA_L
    mean, sd = F.col("mean"), F.col("sd")

    def z_next(x, z_prev):
        return F.lit(lam) * x + F.lit(om) * z_prev

    def thr(p_new):
        return F.lit(lw) * sd * F.sqrt(F.lit(fac) * (F.lit(1.0) - p_new))

    x1 = F.element_at("vals", 1)
    z1 = z_next(x1, mean)
    a1 = F.abs(z1 - mean) > thr(F.lit(om2))
    init = F.array(
        x1,
        z1,
        F.lit(om2),
        F.lit(1.0),
        F.when(a1, 1.0).otherwise(0.0),
        F.when(a1, 1.0).otherwise(0.0),
    )

    def step(acc, x):
        z_new = z_next(x, F.element_at(acc, 2))
        p_new = F.element_at(acc, 3) * F.lit(om2)
        t_new = F.element_at(acc, 4) + 1.0
        a = F.abs(z_new - mean) > thr(p_new)
        return F.array(
            x,
            z_new,
            p_new,
            t_new,
            F.element_at(acc, 5) + F.when(a, 1.0).otherwise(0.0),
            F.when(F.element_at(acc, 6) > 0.0, F.element_at(acc, 6))
            .when(a, t_new)
            .otherwise(0.0),
        )

    state = F.aggregate(
        F.slice("vals", 2, F.greatest(F.size("vals") - 1, F.lit(0))), init, step
    )
    out = model.select(
        "event_type",
        "n_days",
        F.round(mean, 6).alias("mean"),
        F.round(sd, 6).alias("sd"),
        F.round(state[1], 6).alias("z_final"),
        state[4].cast("bigint").alias("n_alarms"),
        state[5].cast("bigint").alias("first_alarm"),
    )
    return tiny_sorted(out, "event_type")


QUERIES["q_ewma_control"] = q_ewma_control

ORACLES["q_ewma_control"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS xi
        FROM events GROUP BY 1, 2
    ),
    lists AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(xi) AS BIGINT) AS sx,
               CAST(sum(xi * xi) AS BIGINT) AS sxx,
               list(CAST(xi AS DOUBLE) ORDER BY day) AS vals
        FROM daily GROUP BY event_type
    ),
    model AS (
        SELECT event_type, n_days, vals,
               CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
               sqrt((CAST(sxx AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
                       * CAST(sx AS DOUBLE))
                    / nullif(CAST(n_days AS DOUBLE) - 1.0, 0.0)) AS sd
        FROM lists
    ),
    folded AS (
        SELECT event_type, n_days, mean, sd,
               list_reduce(
                   list_transform(vals, v -> [
                       v,
                       {EWMA_LAMBDA} * v + {_EW_OM} * mean,
                       {_EW_OM2},
                       1.0,
                       CASE WHEN abs({EWMA_LAMBDA} * v + {_EW_OM} * mean - mean)
                                 > {EWMA_L} * sd * sqrt({_EW_FAC} * (1.0 - {_EW_OM2}))
                            THEN 1.0 ELSE 0.0 END,
                       CASE WHEN abs({EWMA_LAMBDA} * v + {_EW_OM} * mean - mean)
                                 > {EWMA_L} * sd * sqrt({_EW_FAC} * (1.0 - {_EW_OM2}))
                            THEN 1.0 ELSE 0.0 END
                   ]),
                   (acc, e) -> [
                       e[1],
                       {EWMA_LAMBDA} * e[1] + {_EW_OM} * acc[2],
                       acc[3] * {_EW_OM2},
                       acc[4] + 1.0,
                       acc[5] + CASE WHEN abs({EWMA_LAMBDA} * e[1] + {_EW_OM} * acc[2] - mean)
                                          > {EWMA_L} * sd * sqrt({_EW_FAC} * (1.0 - acc[3] * {_EW_OM2}))
                                     THEN 1.0 ELSE 0.0 END,
                       CASE WHEN acc[6] > 0.0 THEN acc[6]
                            WHEN abs({EWMA_LAMBDA} * e[1] + {_EW_OM} * acc[2] - mean)
                                 > {EWMA_L} * sd * sqrt({_EW_FAC} * (1.0 - acc[3] * {_EW_OM2}))
                            THEN acc[4] + 1.0 ELSE 0.0 END
                   ]) AS s
        FROM model
    )
    SELECT event_type, n_days,
           round(mean, 6) AS mean,
           round(sd, 6) AS sd,
           round(s[2], 6) AS z_final,
           CAST(s[5] AS BIGINT) AS n_alarms,
           CAST(s[6] AS BIGINT) AS first_alarm
    FROM folded
    ORDER BY event_type
"""


DW_LO = 1.5  # below → positive residual autocorrelation
DW_HI = 2.5  # above → negative residual autocorrelation


def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson residual-autocorrelation diagnostic for q_trend_fit's
    per-type model (daily count ~ day index): DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² over
    the day-ordered OLS residuals, the standard "is the trend line
    missing serial structure" read-out (≈2 white, <2 positive, >2
    negative autocorrelation). `autocorr_flag` is the banded verdict on
    the ROUNDED statistic: +1 below DW_LO, −1 above DW_HI, else 0.

    Exactness: slope/intercept are double expressions of exact BIGINT
    sufficient statistics (q_trend_fit discipline); each residual is the
    same per-row double expression in both engines, and both DW sums
    fold in day order seeded from the first residual — bit-identical
    before the round.

    Scale shape: one counting aggregate to the bounded (type × day)
    frame, one broadcast of the O(types) model back onto it, one
    per-type fold. Raw events are scanned once."""
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    t = load_tables(spark, sf_dir)
    day = F.datediff(F.to_date("ts"), F.lit("1995-01-01").cast("date"))
    daily = t.events.groupBy("event_type", day.cast("bigint").alias("x")).agg(
        F.count("*").alias("y")
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    model = stats.select(
        "event_type",
        F.col("n").alias("n_days"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )
    resid = daily.join(F.broadcast(model), "event_type").select(
        "event_type",
        "n_days",
        "x",
        (
            F.col("y").cast("double")
            - (F.col("intercept") + F.col("slope") * F.col("x").cast("double"))
        ).alias("e"),
    )
    lists = resid.groupBy("event_type", "n_days").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("x", "e"))), lambda s: s["e"]
        ).alias("es"),
    )
    e1 = F.element_at("es", 1)
    state = F.aggregate(
        F.slice("es", 2, F.greatest(F.size("es") - 1, F.lit(0))),
        F.array(e1, F.lit(0.0), e1 * e1),
        lambda acc, x: F.array(
            x,
            F.element_at(acc, 2) + (x - F.element_at(acc, 1)) * (x - F.element_at(acc, 1)),
            F.element_at(acc, 3) + x * x,
        ),
    )
    dw = F.round(state[1] / state[2], 6)
    out = lists.select(
        "event_type",
        "n_days",
        dw.alias("dw"),
        F.when(dw < DW_LO, 1).when(dw > DW_HI, -1).otherwise(0)
        .cast("int")
        .alias("autocorr_flag"),
    )
    return tiny_sorted(out, "event_type")


QUERIES["q_durbin_watson"] = q_durbin_watson

ORACLES["q_durbin_watson"] = f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM daily GROUP BY 1
    ),
    model AS (
        SELECT event_type, n AS n_days,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope,
               (CAST(sy AS DOUBLE)
                - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS intercept
        FROM stats
    ),
    resid AS (
        SELECT d.event_type, m.n_days, d.x,
               CAST(d.y AS DOUBLE)
               - (m.intercept + m.slope * CAST(d.x AS DOUBLE)) AS e
        FROM daily d JOIN model m USING (event_type)
    ),
    lists AS (
        SELECT event_type, n_days, list(e ORDER BY x) AS es
        FROM resid GROUP BY 1, 2
    ),
    folded AS (
        SELECT event_type, n_days,
               list_reduce(
                   list_transform(es, v -> [v, 0.0, v * v]),
                   (acc, x) -> [
                       x[1],
                       acc[2] + (x[1] - acc[1]) * (x[1] - acc[1]),
                       acc[3] + x[1] * x[1]
                   ]) AS s
        FROM lists
    )
    SELECT event_type, n_days,
           round(s[2] / s[3], 6) AS dw,
           CAST(CASE WHEN round(s[2] / s[3], 6) < {DW_LO} THEN 1
                     WHEN round(s[2] / s[3], 6) > {DW_HI} THEN -1
                     ELSE 0 END AS INTEGER) AS autocorr_flag
    FROM folded
    ORDER BY event_type
"""


def q_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-causality screen for every ORDERED event-type pair
    (target, source): does the source's PREVIOUS-day count improve a
    one-lag autoregression of the target's daily count? F-test of
    y_t = α + β₁·y_{t−1} (+ β₂·x_{t−1}): F = (RSS_r − RSS_u)·(n−3)/RSS_u
    — the model-based upgrade of q_lead_lag's correlation screen, the
    step between "moves first" and a q_diff_in_diff-style causal read.

    Exactness: daily counts are exact BIGINTs, so ALL ten sufficient
    statistics (n, Σy, Σa, Σb, Σy², Σa², Σb², Σya, Σyb, Σab with
    a = y_{t−1}, b = x_{t−1}) accumulate exactly; the centered moments,
    the closed-form 2×2 normal-equation solve, both RSS values and F
    are ONE identical chain of double arithmetic in both engines —
    no cross-row float sums anywhere, so no fold is needed. Degenerate
    pairs (constant series → zero variance, collinear lags → det 0,
    saturated fit → RSS_u 0) yield NULL via try_divide/nullif
    identically in both engines.

    Scale shape: events collapse ONCE to the bounded (type × day)
    frame; the triple alignment join (y_t, y_{t−1}, x_{t−1}) and the
    pair aggregate run on that frame — O(types² × days) worst case
    with types a handful; raw events are never rescanned."""
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    cur = daily.select(
        F.col("event_type").alias("type_tgt"),
        F.col("day").alias("d"),
        F.col("x").alias("y"),
    )
    ylag = daily.select(
        F.col("event_type").alias("type_tgt2"),
        F.date_add(F.col("day"), 1).alias("d2"),
        F.col("x").alias("a"),
    )
    xlag = daily.select(
        F.col("event_type").alias("type_src"),
        F.date_add(F.col("day"), 1).alias("d3"),
        F.col("x").alias("b"),
    )
    rows = (
        cur.join(ylag, (F.col("d") == F.col("d2")) & (F.col("type_tgt") == F.col("type_tgt2")))
        .join(
            xlag,
            (F.col("d") == F.col("d3")) & (F.col("type_tgt") != F.col("type_src")),
        )
        .select("type_tgt", "type_src", "y", "a", "b")
    )
    m = rows.groupBy("type_tgt", "type_src").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("y") * F.col("a")).alias("sya"),
        F.sum(F.col("y") * F.col("b")).alias("syb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    )
    nd = F.col("n").cast("double")
    sy, sa, sb = (F.col(c).cast("double") for c in ("sy", "sa", "sb"))
    syy, saa, sbb = (F.col(c).cast("double") for c in ("syy", "saa", "sbb"))
    sya, syb, sab = (F.col(c).cast("double") for c in ("sya", "syb", "sab"))
    cyy = syy - sy * sy / nd
    caa = saa - sa * sa / nd
    cbb = sbb - sb * sb / nd
    cya = sya - sy * sa / nd
    cyb = syb - sy * sb / nd
    cab = sab - sa * sb / nd
    rss_r = cyy - F.try_divide(cya * cya, caa)
    det = caa * cbb - cab * cab
    explained = F.try_divide(
        cya * (cbb * cya - cab * cyb) + cyb * (caa * cyb - cab * cya), det
    )
    rss_u = cyy - explained
    f_stat = F.try_divide((rss_r - rss_u) * (nd - 3.0), rss_u)
    beta_x = F.try_divide(caa * cyb - cab * cya, det)
    out = m.filter(F.col("n") > 3).select(
        "type_tgt",
        "type_src",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(beta_x, 6).alias("beta_x"),
        F.round(f_stat, 6).alias("f_stat"),
    )
    return tiny_sorted(out, "type_tgt", "type_src")


QUERIES["q_granger"] = q_granger

ORACLES["q_granger"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    rows_j AS (
        SELECT c.event_type AS type_tgt, s.event_type AS type_src,
               c.x AS y, yl.x AS a, s.x AS b
        FROM daily c
        JOIN daily yl ON yl.event_type = c.event_type
                     AND c.day = yl.day + 1
        JOIN daily s  ON s.event_type <> c.event_type
                     AND c.day = s.day + 1
    ),
    m AS (
        SELECT type_tgt, type_src,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(a) AS BIGINT) AS sa,
               CAST(sum(b) AS BIGINT) AS sb,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(a * a) AS BIGINT) AS saa,
               CAST(sum(b * b) AS BIGINT) AS sbb,
               CAST(sum(y * a) AS BIGINT) AS sya,
               CAST(sum(y * b) AS BIGINT) AS syb,
               CAST(sum(a * b) AS BIGINT) AS sab
        FROM rows_j GROUP BY 1, 2
    ),
    c AS (
        SELECT type_tgt, type_src, n,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy,
               CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) AS caa,
               CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(n AS DOUBLE) AS cbb,
               CAST(sya AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) AS cya,
               CAST(syb AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(n AS DOUBLE) AS cyb,
               CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(n AS DOUBLE) AS cab
        FROM m
    ),
    solved AS (
        SELECT type_tgt, type_src, n, cyy,
               cyy - cya * cya / nullif(caa, 0.0) AS rss_r,
               cyy - (cya * (cbb * cya - cab * cyb)
                      + cyb * (caa * cyb - cab * cya))
                     / nullif(caa * cbb - cab * cab, 0.0) AS rss_u,
               (caa * cyb - cab * cya)
                   / nullif(caa * cbb - cab * cab, 0.0) AS beta_x
        FROM c
    )
    SELECT type_tgt, type_src,
           CAST(n AS BIGINT) AS n_days,
           round(beta_x, 6) AS beta_x,
           round((rss_r - rss_u) * (CAST(n AS DOUBLE) - 3.0)
                 / nullif(rss_u, 0.0), 6) AS f_stat
    FROM solved
    WHERE n > 3
    ORDER BY type_tgt, type_src
"""
