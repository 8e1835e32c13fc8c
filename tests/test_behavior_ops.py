"""Invariant + plan tests for the behavioral-analytics module
(operators/behavior.py). Oracle parity is in tools/check.py."""

from __future__ import annotations

import pytest

from machinelearningalgomapreduce_spark.operators import behavior as B
from machinelearningalgomapreduce_spark.operators.events import sessionize
from machinelearningalgomapreduce_spark.plans import inspect as P
from machinelearningalgomapreduce_spark.sources.catalog import load_tables


@pytest.mark.slow  # heavy lane, run with -m slow (pytest.ini r16)
def test_bounce_rate_accounts_for_every_session(spark, sf_dir):
    rows = B.q_bounce_rate(spark, sf_dir).collect()
    t = load_tables(spark, sf_dir)
    n_sessions = (
        sessionize(t.events).select("user_id", "session_seq").distinct().count()
    )
    assert sum(r.n_sessions for r in rows) == n_sessions
    for r in rows:
        assert 0 <= r.n_bounce <= r.n_sessions
        assert abs(r.bounce_rate - r.n_bounce / r.n_sessions) < 1e-6


def test_gap_histogram_counts_every_non_first_event(spark, sf_dir):
    rows = B.q_gap_histogram(spark, sf_dir).collect()
    t = load_tables(spark, sf_dir)
    n_events = t.events.count()
    n_users = t.events.select("user_id").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_events - n_users
    assert {r.bucket for r in rows} <= {
        "a_under_1m", "b_1m_5m", "c_5m_30m", "d_over_30m"
    }


def test_burstiness_is_bounded_and_supported(spark, sf_dir):
    rows = B.q_burstiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.burstiness <= 1.0
        assert r.n_gaps >= 30
    scores = [r.burstiness for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_sma_crossover_bounds_and_order(spark, sf_dir):
    rows = B.q_sma_crossover(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_crossovers < r.n_signals
    counts = [r.n_crossovers for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_one_user_shuffle_plus_bounded_aggregate(spark, sf_dir):
    # The sessionize shape: windows ride ONE user_id exchange; only the
    # bounded final aggregate (and its tiny coalesce) may add one more.
    assert P.count_exchanges(B.q_gap_histogram(spark, sf_dir)) <= 2
    assert P.count_exchanges(B.q_bounce_rate(spark, sf_dir)) <= 2
    assert P.count_exchanges(B.q_burstiness(spark, sf_dir)) <= 2
    # TakeOrdered, not a global sort:
    assert P.uses_take_ordered(B.q_burstiness(spark, sf_dir))
    assert P.uses_take_ordered(B.q_sma_crossover(spark, sf_dir))


def test_time_to_convert_matches_python_recompute(spark, sf_dir):
    rows = load_tables(spark, sf_dir).events.select(
        "user_id", "event_type", "ts"
    ).collect()
    first_click: dict[int, int] = {}
    for r in rows:
        if r.event_type == "click":
            us = int(r.ts.timestamp() * 1_000_000)
            first_click[r.user_id] = min(first_click.get(r.user_id, us), us)
    first_purchase: dict[int, int] = {}
    for r in rows:
        if r.event_type == "purchase" and r.user_id in first_click:
            us = int(r.ts.timestamp() * 1_000_000)
            if us > first_click[r.user_id]:
                first_purchase[r.user_id] = min(
                    first_purchase.get(r.user_id, us), us
                )
    delays = sorted(
        (p - first_click[u]) // 1_000_000 for u, p in first_purchase.items()
    )
    out = B.q_time_to_convert(spark, sf_dir).collect()[0]
    assert out.n_clicked == len(first_click)
    assert out.n_converted == len(delays)
    assert out.max_delay_s == delays[-1]
    assert abs(out.conv_rate - len(delays) / len(first_click)) < 1e-6
