"""Behavioral event analytics (SURVEY.md §2E extension, round 5).

Product-analytics rollups over the events stream that round out the
session family in operators/events.py:

- q_bounce_rate    per-entry-event-type bounce share (1-event sessions)
- q_gap_histogram  inter-event-gap distribution in bounded buckets
- q_burstiness     per-user burstiness parameter B = (σ−μ)/(σ+μ) of gaps
- q_sma_crossover  5/20 moving-average crossover counts per user

Scale notes (100 TB posture): every query is ONE shuffle on user_id
followed by ordered per-user passes (lag / running sums), then a bounded
aggregate — the sessionize shape. No joins except 1-row/bounded-domain
broadcasts. Gap arithmetic stays in exact integer micros/seconds
(unix_micros), so bucket and burstiness inputs are engine-exact; the SMA
uses cent-scaled BIGINT sums (values rounded to 2 decimals first), so
crossover signs are integer comparisons — no float window-sum drift
(DuckDB's segment-tree sliding aggregates don't sum in Spark's order, so
double window sums are NOT bit-stable across engines; integers are).

Burstiness B ∈ [−1, 1] (Goh & Barabási): −1 = perfectly periodic,
0 = Poisson, → 1 = extremely bursty. Gap seconds ≤ 6×10⁵ and per-user
event counts ≤ 10⁴ keep Σg² ≤ 4×10¹⁴ — exact in BIGINT and in double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from machinelearningalgomapreduce_spark.operators.events import sessionize
from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted
from machinelearningalgomapreduce_spark.functions.fixedpoint import half_up
from machinelearningalgomapreduce_spark.sources.catalog import load_tables

#: Sessionize CTE shared by the bounce oracle — keep identical to
#: operators/events.py's q_sessionize oracle (same gap, same tie-break).
_SESS_SQL = """
    WITH flagged AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
    ),
    sess AS (
        SELECT event_id, user_id, ts, event_type,
               sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS session_seq
        FROM flagged
    )
"""


def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session entry event type.

    Rides the sessionize window (one user_id shuffle); the per-session
    rollup extracts the entry event with a struct-min over the unique
    (ts, event_id) order — no second window, no self-join — then a
    bounded aggregate keyed by entry type.
    """
    t = load_tables(spark, sf_dir)
    per_session = (
        sessionize(t.events)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.struct("ts", "event_id", "event_type"))
            .getField("event_type")
            .alias("entry_type"),
            F.count("*").alias("n_events"),
        )
    )
    bounced = (F.col("n_events") == 1).cast("int")
    agg = per_session.groupBy("entry_type").agg(
        F.count("*").alias("n_sessions"),
        F.sum(bounced).alias("n_bounce"),
        F.round(F.avg(bounced), 6).alias("bounce_rate"),
    )
    return tiny_sorted(agg, "entry_type")


def q_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-gap distribution in bounded buckets.

    lag over the per-user order gives exact integer micro gaps; the
    bucket domain is fixed (4 labels), so the final aggregate exchange
    moves a handful of rows at any scale.
    """
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap_us = us - F.lag(us).over(w)
    g = F.col("gap_us")
    bucket = (
        F.when(g < 60 * 1_000_000, "a_under_1m")
        .when(g < 5 * 60 * 1_000_000, "b_1m_5m")
        .when(g < 30 * 60 * 1_000_000, "c_5m_30m")
        .otherwise("d_over_30m")
    )
    agg = (
        t.events.select(gap_us.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_gaps"))
    )
    return tiny_sorted(agg, "bucket")


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 burstiest users: B = (σ−μ)/(σ+μ) over inter-event gaps.

    Gaps floor to whole seconds (exact BIGINT), so Σg and Σg² are exact
    integers in both engines; μ, σ, B derive from them with identical
    IEEE ops. Population σ via E[g²]−E[g]². Users need ≥ 30 gaps (B is
    noise below that). TakeOrdered 20 with (B desc, user_id) tie-break.
    """
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap_s = ((us - F.lag(us).over(w)) / F.lit(1_000_000)).cast("bigint")
    per_user = (
        t.events.select("user_id", gap_s.alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("g").alias("sg"),
            F.sum(F.col("g") * F.col("g")).alias("sg2"),
        )
        .filter(F.col("n_gaps") >= 30)
    )
    mean = F.col("sg") / F.col("n_gaps")
    var = F.col("sg2") / F.col("n_gaps") - mean * mean
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        per_user.select(
            "user_id",
            "n_gaps",
            # try_divide/nullif: NULL when every gap is sub-second (σ+μ=0)
            # — B is undefined there, and ANSI division would error.
            F.round(F.try_divide(sigma - mean, sigma + mean), 6).alias("burstiness"),
        )
        .orderBy(F.desc("burstiness"), "user_id")
        .limit(20)
    )


def q_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/20 moving-average crossover counts per user (top 20).

    Signals on integer arithmetic: values floor to cents (BIGINT), the
    5- and 20-row sums come from prefix-sum differences, and the sign of
    SMA5−SMA20 is the sign of 4·sum5−sum20 — all integers, so crossing
    detection is bit-free of float window-sum drift. A crossover is a
    sign CHANGE between consecutive full-frame rows (zeros pass through:
    sign must flip −↔+ to count).
    """
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # floor, not round-then-cast: DuckDB CAST rounds while Spark truncates;
    # floor's output is an exact integer-valued double in both engines.
    cents = F.floor(F.col("value") * 100)
    seq = F.row_number().over(w)
    cum = F.sum(cents.cast("bigint")).over(w.rowsBetween(W.unboundedPreceding, 0))
    base = t.events.select(
        "user_id", seq.alias("seq"), cum.alias("cum")
    )
    wu = W.partitionBy("user_id").orderBy("seq")
    sum5 = F.col("cum") - F.lag("cum", 5).over(wu)
    sum20 = F.col("cum") - F.lag("cum", 20).over(wu)
    sig = F.signum((4 * sum5 - sum20).cast("double"))
    signed = base.select(
        "user_id", "seq", sig.alias("sig")
    ).filter(F.col("sig").isNotNull())
    flip = (
        (F.col("sig") * F.lag("sig").over(wu) < 0).cast("int")
    )
    agg = (
        signed.select("user_id", "seq", flip.alias("flip"))
        .filter(F.col("flip").isNotNull())
        .groupBy("user_id")
        .agg(F.sum("flip").alias("n_crossovers"), F.count("*").alias("n_signals"))
    )
    return agg.orderBy(F.desc("n_crossovers"), "user_id").limit(20)


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase latency distribution: for every user whose first
    purchase comes strictly after their first click, the delay in whole
    seconds — the "how long does conversion take" number that funnel
    counts (q_funnel) deliberately leave out.

    Delays are exact integer seconds (micros floor-divided), so the
    percentile inputs are engine-identical; p50/p90 use the interpolated
    exact percentile (≡ quantile_cont). Two per-user min aggregates
    chained on user_id + one 1-row rollup — the q_funnel shape."""
    t = load_tables(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    first_click = (
        t.events.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("c_us"))
        .groupBy("user_id")
        .agg(F.min("c_us").alias("c_us"))
    )
    first_purchase_after = (
        t.events.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("p_us"))
        .join(first_click, "user_id")
        .filter(F.col("p_us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"), F.min("c_us").alias("c_us"))
    )
    delays = first_purchase_after.select(
        ((F.col("p_us") - F.col("c_us")) / F.lit(1_000_000)).cast("bigint").alias("delay_s")
    )
    n_clicked = first_click.agg(F.count("*").alias("n_clicked"))
    return (
        delays.agg(
            F.count("*").alias("n_converted"),
            F.round(F.expr("percentile(delay_s, 0.5)"), 6).alias("p50_delay_s"),
            F.round(F.expr("percentile(delay_s, 0.9)"), 6).alias("p90_delay_s"),
            F.max("delay_s").alias("max_delay_s"),
        )
        .crossJoin(F.broadcast(n_clicked))
        .select(
            "n_clicked",
            "n_converted",
            # try_divide: NULL (not an ANSI error) when the corpus has no
            # clicks at all (empty-input sweep).
            F.round(F.try_divide("n_converted", F.col("n_clicked").cast("double")), 6).alias(
                "conv_rate"
            ),
            "p50_delay_s",
            "p90_delay_s",
            "max_delay_s",
        )
    )


def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for click→purchase conversion
    (library API): S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) over the distinct
    event times, with users who clicked but never purchased CENSORED at
    their last observed event — the estimator that makes
    q_time_to_convert's latency distribution honest about non-converters
    (dropping them overstates conversion speed).

    Duration per user = first purchase after first click (event) or last
    observed event (censored), in whole seconds from the first click.
    Output one row per distinct event time: (t_s, n_risk, n_events,
    n_censored, survival).

    Scale shape: two per-user min/max aggregates + one per-duration
    rollup; the risk-set prefix sums and the Π(1−d/n) product — computed
    as exp(Σ log) — run as windows over the DISTINCT-duration frame
    (value-compressed; bounded by observed distinct times, not users).
    Differential-tested against a pure-Python KM in tests.
    """
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    first_click = (
        t.events.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("c_us"))
        .groupBy("user_id")
        .agg(F.min("c_us").alias("c_us"))
    )
    first_purchase = (
        t.events.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("p_us"))
        .join(first_click, "user_id")
        .filter(F.col("p_us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"))
    )
    last_seen = (
        t.events.select("user_id", us.alias("l_us"))
        .join(first_click, "user_id")
        .groupBy("user_id")
        .agg(F.max("l_us").alias("l_us"))
    )
    per_user = (
        first_click.join(first_purchase, "user_id", "left")
        .join(last_seen, "user_id")
        .select(
            "user_id",
            F.col("p_us").isNotNull().alias("event"),
            (
                (F.coalesce(F.col("p_us"), F.col("l_us")) - F.col("c_us"))
                / F.lit(1_000_000)
            ).cast("bigint").alias("t_s"),
        )
        .filter(F.col("t_s") >= 0)
    )
    per_t = per_user.groupBy("t_s").agg(
        F.sum(F.col("event").cast("bigint")).alias("n_events"),
        F.sum((~F.col("event")).cast("bigint")).alias("n_censored"),
    )
    w = W.orderBy("t_s").rowsBetween(W.unboundedPreceding, -1)
    w_all = W.orderBy("t_s").rowsBetween(W.unboundedPreceding, W.currentRow)
    total = per_user.agg(F.count("*").alias("n_total"))
    at_risk = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum(F.col("n_events") + F.col("n_censored")).over(w), F.lit(0)),
        )
    )
    # Π(1−d/n) as exp(Σ log), with the zero factor handled explicitly:
    # Spark's log(0) is NULL (it would poison the running sum), so a
    # "survival already hit zero" flag rides its own window instead.
    factor = 1.0 - F.col("n_events") / F.col("n_risk")
    zero_seen = F.max((factor <= 0).cast("int")).over(w_all)
    surv = F.when(zero_seen == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.when(factor > 0, F.log(factor))).over(w_all))
    )
    return at_risk.select(
        "t_s",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(surv, 8).alias("survival"),
    )


def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kaplan-Meier risk table in exact integers: one row per
    distinct conversion time with (n_risk, n_events, n_censored) — all
    BIGINT prefix sums — plus the discrete hazard d/n as a half-up
    micro-unit BIGINT. The float survival product stays on the
    `kaplan_meier` library API (pytest-differentialed); this is its
    oracle-checkable integer core.

    Scale shape: inherits kaplan_meier's (two per-user aggregates + one
    value-compressed rollup + windows over the distinct-time frame)."""
    km = kaplan_meier(spark, sf_dir)
    return km.select(
        "t_s",
        "n_risk",
        "n_events",
        "n_censored",
        half_up(F.col("n_events") * 1_000_000, F.col("n_risk")).alias("hazard_micro"),
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM customer segmentation: recency (days since last order,
    anchored at the corpus max date — data-derived, deterministic),
    frequency (order count), monetary (floor-cents revenue) → quintile
    scores via ntile over fully tie-broken orders → 3-digit segment
    rollup. Every scoring input is an exact integer and every ntile
    order ends in the unique custkey, so segment membership is
    bit-deterministic.

    Scale shape: one customer-keyed aggregate over orders; the ntile
    windows are global sorts over the CUSTOMER domain (≪ fact table) —
    at extreme customer counts swap ntile for percent_rank over the same
    order or a 2-pass histogram quantile, same downstream contract."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    anchor = t.orders.agg(F.max("o_orderdate").alias("anchor"))
    per_cust = (
        t.orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor", "last_order").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    scored = per_cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5).over(W.orderBy("recency_days", "o_custkey")).alias("r_q"),
        F.ntile(5).over(W.orderBy(F.desc("frequency"), F.col("o_custkey"))).alias("f_q"),
        F.ntile(5).over(W.orderBy(F.desc("monetary_cents"), F.col("o_custkey"))).alias("m_q"),
    )
    return (
        scored.groupBy(
            (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")).alias("segment")
        )
        .agg(
            F.count("*").alias("n_cust"),
            F.sum("monetary_cents").alias("monetary_cents"),
        )
    )


def q_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix: H = −Σ p·ln p over
    exact count ratios, folded in sorted type order (the q_mutual_info
    discipline — no unordered float summation), rounded to 6.

    Scale shape: one (user, type) counting aggregate + one per-user O(V)
    rollup; V (event types) is a bounded domain."""
    t = load_tables(spark, sf_dir)
    per = t.events.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    tot = per.groupBy("user_id").agg(
        F.sum("c").alias("n_events"), F.count("*").alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("n_events").cast("double")
    term = (-(p * F.log(p))).alias("t")
    return (
        per.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_types").alias("n_types"),
            F.round(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("event_type").alias("g"), term))
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["t"],
                ),
                6,
            ).alias("entropy"),
        )
    )


QUERIES = {
    "q_time_to_convert": q_time_to_convert,
    "q_bounce_rate": q_bounce_rate,
    "q_gap_histogram": q_gap_histogram,
    "q_burstiness": q_burstiness,
    "q_sma_crossover": q_sma_crossover,
    "q_survival_curve": q_survival_curve,
    "q_rfm_segments": q_rfm_segments,
    "q_session_entropy": q_session_entropy,
}

ORACLES = {
    "q_time_to_convert": """
        WITH first_click AS (
            SELECT user_id, min(epoch_us(ts)) AS c_us
            FROM events WHERE event_type = 'click'
            GROUP BY user_id
        ),
        converted AS (
            SELECT e.user_id,
                   min(epoch_us(e.ts)) AS p_us, min(c.c_us) AS c_us
            FROM events e JOIN first_click c USING (user_id)
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
            GROUP BY e.user_id
        ),
        delays AS (
            SELECT (p_us - c_us) // 1000000 AS delay_s FROM converted
        ),
        agg AS (
            SELECT count(*) AS n_converted,
                   round(quantile_cont(CAST(delay_s AS DOUBLE), 0.5), 6) AS p50_delay_s,
                   round(quantile_cont(CAST(delay_s AS DOUBLE), 0.9), 6) AS p90_delay_s,
                   CAST(max(delay_s) AS BIGINT) AS max_delay_s
            FROM delays
        )
        SELECT (SELECT count(*) FROM first_click) AS n_clicked,
               n_converted,
               round(n_converted / CAST((SELECT count(*) FROM first_click) AS DOUBLE), 6)
                   AS conv_rate,
               p50_delay_s, p90_delay_s, max_delay_s
        FROM agg
    """,
    "q_bounce_rate": _SESS_SQL + """,
        entry AS (
            SELECT user_id, session_seq, event_type
            FROM (SELECT user_id, session_seq, event_type,
                         row_number() OVER (PARTITION BY user_id, session_seq
                                            ORDER BY ts, event_id) AS rn
                  FROM sess)
            WHERE rn = 1
        ),
        cnt AS (
            SELECT user_id, session_seq, count(*) AS n_events
            FROM sess GROUP BY user_id, session_seq
        )
        SELECT e.event_type AS entry_type,
               count(*) AS n_sessions,
               CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
               round(avg(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END), 6) AS bounce_rate
        FROM entry e JOIN cnt USING (user_id, session_seq)
        GROUP BY 1
        ORDER BY entry_type
    """,
    "q_gap_histogram": """
        WITH gaps AS (
            SELECT epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events
        )
        SELECT CASE WHEN gap_us < 60 * 1000000 THEN 'a_under_1m'
                    WHEN gap_us < 5 * 60 * 1000000 THEN 'b_1m_5m'
                    WHEN gap_us < 30 * 60 * 1000000 THEN 'c_5m_30m'
                    ELSE 'd_over_30m' END AS bucket,
               count(*) AS n_gaps
        FROM gaps WHERE gap_us IS NOT NULL
        GROUP BY 1
        ORDER BY bucket
    """,
    "q_burstiness": """
        WITH gaps AS (
            SELECT user_id,
                   (epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS g
            FROM events
        ),
        per_user AS (
            SELECT user_id, count(*) AS n_gaps,
                   CAST(sum(g) AS BIGINT) AS sg,
                   CAST(sum(g * g) AS BIGINT) AS sg2
            FROM gaps WHERE g IS NOT NULL
            GROUP BY user_id
            HAVING count(*) >= 30
        )
        SELECT user_id, n_gaps,
               round((sqrt(greatest(CAST(sg2 AS DOUBLE) / n_gaps
                                    - (CAST(sg AS DOUBLE) / n_gaps)
                                      * (CAST(sg AS DOUBLE) / n_gaps), 0.0))
                      - CAST(sg AS DOUBLE) / n_gaps)
                     / nullif(sqrt(greatest(CAST(sg2 AS DOUBLE) / n_gaps
                                      - (CAST(sg AS DOUBLE) / n_gaps)
                                        * (CAST(sg AS DOUBLE) / n_gaps), 0.0))
                        + CAST(sg AS DOUBLE) / n_gaps, 0.0), 6) AS burstiness
        FROM per_user
        ORDER BY burstiness DESC NULLS LAST, user_id
        LIMIT 20
    """,
    "q_sma_crossover": """
        WITH base AS (
            SELECT user_id,
                   row_number() OVER w AS seq,
                   sum(CAST(floor(value * 100) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        signals AS (
            SELECT user_id, seq,
                   sign(CAST(4 * (cum - lag(cum, 5) OVER u)
                             - (cum - lag(cum, 20) OVER u) AS DOUBLE)) AS sig
            FROM base
            WINDOW u AS (PARTITION BY user_id ORDER BY seq)
        ),
        flips AS (
            SELECT user_id,
                   CAST(sig * lag(sig) OVER (PARTITION BY user_id ORDER BY seq) < 0
                        AS INTEGER) AS flip
            FROM signals WHERE sig IS NOT NULL
        )
        SELECT user_id,
               CAST(sum(flip) AS BIGINT) AS n_crossovers,
               count(*) AS n_signals
        FROM flips WHERE flip IS NOT NULL
        GROUP BY user_id
        ORDER BY n_crossovers DESC, user_id
        LIMIT 20
    """,
    "q_survival_curve": """
        WITH first_click AS (
            SELECT user_id, min(epoch_us(ts)) AS c_us
            FROM events WHERE event_type = 'click'
            GROUP BY user_id
        ),
        first_purchase AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
            FROM events e JOIN first_click c USING (user_id)
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
            GROUP BY e.user_id
        ),
        last_seen AS (
            SELECT e.user_id, max(epoch_us(e.ts)) AS l_us
            FROM events e JOIN first_click c USING (user_id)
            GROUP BY e.user_id
        ),
        per_user AS (
            SELECT c.user_id, p.p_us IS NOT NULL AS event,
                   (coalesce(p.p_us, l.l_us) - c.c_us) // 1000000 AS t_s
            FROM first_click c
            LEFT JOIN first_purchase p USING (user_id)
            JOIN last_seen l USING (user_id)
            WHERE (coalesce(p.p_us, l.l_us) - c.c_us) // 1000000 >= 0
        ),
        per_t AS (
            SELECT t_s,
                   CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS n_censored
            FROM per_user GROUP BY t_s
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM per_user),
        risk AS (
            SELECT t_s, n_events, n_censored,
                   (SELECT n_total FROM tot)
                   - coalesce(sum(n_events + n_censored)
                              OVER (ORDER BY t_s
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                              0) AS n_risk
            FROM per_t
        )
        SELECT t_s, CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
               CAST(floor((2 * n_events * 1000000 + n_risk)
                          / (2 * n_risk)) AS BIGINT) AS hazard_micro
        FROM risk
    """,
    "q_rfm_segments": """
        WITH anchor AS (SELECT max(o_orderdate) AS anchor FROM orders),
        per_cust AS (
            SELECT o_custkey,
                   CAST(datediff('day', max(o_orderdate),
                                 (SELECT anchor FROM anchor)) AS BIGINT) AS recency_days,
                   CAST(count(*) AS BIGINT) AS frequency,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS monetary_cents
            FROM orders GROUP BY o_custkey
        ),
        scored AS (
            SELECT o_custkey, monetary_cents,
                   ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_q,
                   ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
                   ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_q
            FROM per_cust
        )
        SELECT CAST(r_q * 100 + f_q * 10 + m_q AS INTEGER) AS segment,
               CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(monetary_cents) AS BIGINT) AS monetary_cents
        FROM scored GROUP BY 1
    """,
    "q_session_entropy": """
        WITH per AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY user_id, event_type
        ),
        tot AS (
            SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
                   CAST(count(*) AS BIGINT) AS n_types
            FROM per GROUP BY user_id
        )
        SELECT p.user_id, max(t.n_events) AS n_events, max(t.n_types) AS n_types,
               round(list_sum(list(
                   -(CAST(p.c AS DOUBLE) / CAST(t.n_events AS DOUBLE))
                   * ln(CAST(p.c AS DOUBLE) / CAST(t.n_events AS DOUBLE))
                   ORDER BY p.event_type)), 6) AS entropy
        FROM per p JOIN tot t ON p.user_id = t.user_id
        GROUP BY p.user_id
    """,
}


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: for every ordered type pair,
    the Jaccard similarity of their user sets — the segment-overlap
    matrix a campaign/feature analysis reads. User sets collapse to
    distinct (type, user) pairs first; the pair join runs on that
    deduped frame and all outputs are exact integers + one identical
    division.

    Scale shape: one distinct aggregate (bounded by types × users), a
    type-pair self-join co-keyed on user, O(types²) rollup."""
    t = load_tables(spark, sf_dir)
    tu = t.events.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count("*").alias("n_users"))
    a, b = tu.alias("a"), tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


QUERIES["q_audience_overlap"] = q_audience_overlap

ORACLES["q_audience_overlap"] = """
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users FROM tu GROUP BY 1),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b,
           sa.n_users AS n_a, sb.n_users AS n_b, i.n_both,
           round(CAST(i.n_both AS DOUBLE)
                 / CAST(sa.n_users + sb.n_users - i.n_both AS DOUBLE), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.type_a = sa.event_type
    JOIN sizes sb ON i.type_b = sb.event_type
"""


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers grouped by first-order month;
    for each (cohort_month, month_age) the period revenue and the
    CUMULATIVE revenue per cohort — all in exact floor-cents BIGINTs
    with an integer prefix window, the revenue twin of q_retention's
    user-count matrix.

    Scale shape: one per-customer min aggregate, one (cohort, age)
    rollup, a window over the bounded cohort×age frame."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    first = t.orders.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cohort_month")
    )
    aged = t.orders.join(first, "o_custkey").select(
        "cohort_month",
        (
            (F.year("o_orderdate") - F.year("cohort_month")) * 12
            + (F.month("o_orderdate") - F.month("cohort_month"))
        ).cast("bigint").alias("month_age"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    per = aged.groupBy("cohort_month", "month_age").agg(
        F.count("*").alias("n_orders"), F.sum("cents").alias("rev_cents")
    )
    w = W.partitionBy("cohort_month").orderBy("month_age").rowsBetween(
        W.unboundedPreceding, 0
    )
    return per.select(
        "cohort_month",
        "month_age",
        "n_orders",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("cum_rev_cents"),
    )


QUERIES["q_cohort_ltv"] = q_cohort_ltv

ORACLES["q_cohort_ltv"] = """
    WITH first AS (
        SELECT o_custkey, CAST(min(date_trunc('month', o_orderdate)) AS DATE)
                   AS cohort_month
        FROM orders GROUP BY o_custkey
    ),
    aged AS (
        SELECT f.cohort_month,
               CAST((year(o.o_orderdate) - year(f.cohort_month)) * 12
                    + (month(o.o_orderdate) - month(f.cohort_month)) AS BIGINT)
                   AS month_age,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
    ),
    per AS (
        SELECT cohort_month, month_age,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS rev_cents
        FROM aged GROUP BY 1, 2
    )
    SELECT cohort_month, month_age, n_orders, rev_cents,
           CAST(sum(rev_cents) OVER (PARTITION BY cohort_month ORDER BY month_age
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_rev_cents
    FROM per
"""


def q_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn read-out over the event stream: users whose last activity
    predates the final observed week are churned; rate per acquisition
    (first-seen) week — exact integer week arithmetic on epoch
    microseconds (the q_retention discipline), one identical division.

    Scale shape: one per-user min/max aggregate + one bounded
    cohort-week rollup with a broadcast 1-row horizon."""
    t = load_tables(spark, sf_dir)
    wk = F.unix_micros(F.date_trunc("week", F.col("ts")))
    per_user = t.events.groupBy("user_id").agg(
        F.min(wk).alias("first_wk"), F.max(wk).alias("last_wk")
    )
    # Horizon from the per-user frame (max of per-user maxes is the global
    # max): no second fact-table scan.
    horizon = per_user.agg(F.max("last_wk").alias("max_wk"))
    flagged = per_user.crossJoin(F.broadcast(horizon)).select(
        F.timestamp_micros(F.col("first_wk")).alias("cohort_week"),
        (F.col("last_wk") < F.col("max_wk")).cast("bigint").alias("churned"),
    )
    return flagged.groupBy("cohort_week").agg(
        F.count("*").alias("n_users"),
        F.sum("churned").alias("n_churned"),
        F.round(F.avg(F.col("churned").cast("double")), 6).alias("churn_rate"),
    )


QUERIES["q_churn_rate"] = q_churn_rate

ORACLES["q_churn_rate"] = """
    WITH per_user AS (
        SELECT user_id,
               min(epoch_us(date_trunc('week', ts))) AS first_wk,
               max(epoch_us(date_trunc('week', ts))) AS last_wk
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT max(epoch_us(date_trunc('week', ts))) AS max_wk FROM events)
    SELECT CAST(make_timestamp(first_wk) AS TIMESTAMP) AS cohort_week,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN last_wk < (SELECT max_wk FROM horizon)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           round(avg(CASE WHEN last_wk < (SELECT max_wk FROM horizon)
                          THEN 1.0 ELSE 0.0 END), 6) AS churn_rate
    FROM per_user
    GROUP BY first_wk
"""


def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per ISO week — the engagement ratio (average
    daily actives over weekly actives) product analytics watches for
    habit formation; 1/7 means users show up once a week, 1.0 daily.

    Two distinct-user rollups off one scan shape: (week, day, user) and
    (week, user) distinct aggregates, then a week-keyed join of two
    already-tiny frames. Counts are exact; the stickiness ratio is
    integer-exact micro fixed-point (half_up of sum_dau·10⁶ over
    n_days·wau) — no double rounding in the hash.

    Scale shape: the heavy work is the two count-distincts, both
    map-side partial-aggregable on (week[, day], user); everything after
    is O(weeks). At 100 TB swap exact distinct for the HLL sketch twin
    (q_distinct_users_approx posture) without changing this plan."""
    t = load_tables(spark, sf_dir)
    wk = F.date_trunc("week", "ts").alias("wk")
    day = F.date_trunc("day", "ts").alias("day")
    per_day = (
        t.events.select(wk, day, "user_id").distinct()
        .groupBy("wk", "day").agg(F.count("*").alias("dau"))
    )
    weekly_days = per_day.groupBy("wk").agg(
        F.sum("dau").alias("sum_dau"), F.count("*").alias("n_days")
    )
    wau = (
        t.events.select(wk, "user_id").distinct()
        .groupBy("wk").agg(F.count("*").alias("wau"))
    )
    out = weekly_days.join(wau, "wk").select(
        "wk",
        "sum_dau",
        "n_days",
        "wau",
        half_up(F.col("sum_dau") * 1_000_000, F.col("n_days") * F.col("wau")).alias(
            "stickiness_micro"
        ),
    )
    return tiny_sorted(out, "wk")


QUERIES["q_dau_wau"] = q_dau_wau

ORACLES["q_dau_wau"] = """
    WITH per_day AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               count(DISTINCT user_id) AS dau
        FROM events GROUP BY 1, 2
    ),
    weekly_days AS (
        SELECT wk, CAST(sum(dau) AS BIGINT) AS sum_dau,
               CAST(count(*) AS BIGINT) AS n_days
        FROM per_day GROUP BY wk
    ),
    wau AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
               CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM events GROUP BY 1
    )
    SELECT wk, sum_dau, n_days, wau,
           CAST(floor((2 * (sum_dau * 1000000) + n_days * wau)
                      / (2 * (n_days * wau))) AS BIGINT) AS stickiness_micro
    FROM weekly_days JOIN wau USING (wk)
    ORDER BY wk
"""


def q_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-depth histogram (the "L28/Lness" curve growth teams
    read): how many users were active on exactly k distinct days over
    the fixture window, with the cumulative user count and each bucket's
    exact micro share of the user base. The histogram's right mass is
    the habit core; q_dau_wau gives the per-week ratio view of the same
    engagement signal, this gives the full distribution.

    Counts are exact; `share_micro` is integer-exact half-up micro
    fixed-point (n_users·10⁶ over the user total), so no double enters
    the hash.

    Scale shape: one (user, day) distinct + one per-user count — both
    map-side partial-aggregable; the histogram and its windows run on
    the ≤O(days)-row bucket frame, so the single-partition cumulative
    window is bounded by the calendar, not the data."""
    t = load_tables(spark, sf_dir)
    per_user = (
        t.events.select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("active_days"))
    )
    hist = per_user.groupBy("active_days").agg(F.count("*").alias("n_users"))
    w_cum = W.orderBy("active_days").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy("active_days").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    out = hist.select(
        "active_days",
        "n_users",
        F.sum("n_users").over(w_cum).alias("cum_users"),
        half_up(F.col("n_users") * 1_000_000, F.sum("n_users").over(w_all)).alias(
            "share_micro"
        ),
    )
    return tiny_sorted(out, "active_days")


QUERIES["q_active_days"] = q_active_days

ORACLES["q_active_days"] = """
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS active_days
        FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        GROUP BY user_id
    ),
    hist AS (
        SELECT active_days, CAST(count(*) AS BIGINT) AS n_users
        FROM per_user GROUP BY active_days
    )
    SELECT active_days, n_users,
           CAST(sum(n_users) OVER (ORDER BY active_days
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum_users,
           CAST(floor((2 * (n_users * 1000000)
                       + sum(n_users) OVER ())
                      / (2 * sum(n_users) OVER ())) AS BIGINT) AS share_micro
    FROM hist
    ORDER BY active_days
"""
