"""Custom stateful streaming operator (applyInPandasWithState): the final
per-user state equals the batch aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.sources.catalog import load_tables
from machinelearningalgomapreduce_spark.streaming import windows as sw
from machinelearningalgomapreduce_spark.streaming.stateful import user_profiles


def test_stateful_user_profiles_match_batch(spark, sf_dir):
    stream = sw.stream_events(spark, sf_dir).select(
        "user_id", "value", F.unix_micros("ts").alias("us")
    )
    out = sw.run_to_memory(user_profiles(stream), "t_profiles", output_mode="update")
    # availableNow may run several micro-batches; the LAST emission per user
    # carries the final state.
    got = {
        r.user_id: (r.n_events, r.sum_value, r.last_us)
        for r in out.orderBy("n_events").collect()  # later emissions overwrite
    }
    batch = load_tables(spark, sf_dir).events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.max(F.unix_micros("ts")).alias("last"),
    )
    expected = {r.user_id: (r.n, r.s, r.last) for r in batch.collect()}
    assert set(got) == set(expected)
    for uid, (n, s, last) in expected.items():
        gn, gs, glast = got[uid]
        assert gn == n and glast == last, uid
        assert gs == pytest.approx(s), uid


def test_transform_with_state_profiles_match_batch(spark, sf_dir):
    """Same differential as the v1 test, on the Spark 4 transformWithState
    API (streaming/stateful_v2.py) — both stateful generations must agree
    with the batch aggregate. The TWS Python driver worker speaks a
    protobuf-based protocol; containers without google.protobuf cannot run
    it (measured: worker crashes with ImportError), so the differential
    auto-enables only where the dependency exists."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's Python worker requires protobuf (absent here)",
    )
    from machinelearningalgomapreduce_spark.streaming.stateful_v2 import user_profiles_tws

    stream = sw.stream_events(spark, sf_dir).select(
        "user_id", "value", F.unix_micros("ts").alias("us")
    )
    out = sw.run_to_memory(user_profiles_tws(stream), "t_profiles_tws", output_mode="update")
    got = {
        r.user_id: (r.n_events, r.sum_value, r.last_us)
        for r in out.orderBy("n_events").collect()
    }
    batch = load_tables(spark, sf_dir).events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.max(F.unix_micros("ts")).alias("last"),
    )
    expected = {r.user_id: (r.n, r.s, r.last) for r in batch.collect()}
    assert set(got) == set(expected)
    for uid, (n, s, last) in expected.items():
        gn, gs, glast = got[uid]
        assert gn == n and glast == last, uid
        assert gs == pytest.approx(s), uid


def test_stateful_ema_matches_batch_query(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.events import q_ema
    from machinelearningalgomapreduce_spark.streaming.stateful import user_ema

    stream = sw.stream_events(spark, sf_dir).select(
        "user_id", "value", F.unix_micros("ts").alias("us"), "event_id"
    )
    out = sw.run_to_memory(user_ema(stream), "t_ema", output_mode="update")
    got = {r.user_id: (r.n_events, r.ema_value) for r in out.orderBy("n_events").collect()}
    expected = {r.user_id: (r.n_events, r.ema_value) for r in q_ema(spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for uid, (n, ema) in expected.items():
        gn, gema = got[uid]
        assert gn == n, uid
        assert gema == pytest.approx(ema, abs=1e-6), uid
