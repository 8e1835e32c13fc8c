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


QUERIES = {"q_holt": q_holt}

_A, _G = HOLT_ALPHA, HOLT_GAMMA
# State is a 2-element DOUBLE list [level, trend], NOT a struct: DuckDB's
# struct-literal lambda rebinds acc.<field> to the freshly computed field
# within the same literal (sequential semantics, measured 2026-08-13), so a
# struct accumulator silently uses the NEW level inside the trend update.
# List construction has no such rebinding; the fold is then bit-identical
# to Spark's struct aggregate.
_NEW_L = f"{_A} * x[1] + {1 - _A} * (acc[1] + acc[2])"

ORACLES = {
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
}
