"""Structured Streaming wrappers agree with their oracle-checked batch
twins when driven to completion with trigger(availableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.operators.events import q_events_tumbling
from machinelearningalgomapreduce_spark.streaming import windows as sw


def test_tumbling_stream_matches_batch(spark, sf_dir):
    stream = sw.tumbling_counts(sw.stream_events(spark, sf_dir))
    got = sw.run_to_memory(stream, "t_tumbling")
    batch = q_events_tumbling(spark, sf_dir).select(
        "window_start", "event_type", "n_events", "sum_value"
    )
    g = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in got.collect()}
    b = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()}
    assert g == b


def test_session_stream_counts(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.events import q_session_stats

    stream = sw.session_counts(sw.stream_events(spark, sf_dir))
    got = sw.run_to_memory(stream, "t_sessions")
    batch = q_session_stats(spark, sf_dir)
    # Same session partitioning → same number of sessions and same total events.
    assert got.count() == batch.count()
    assert (
        got.agg(F.sum("n_events")).first()[0] == batch.agg(F.sum("n_events")).first()[0]
    )


def test_stream_dedup_drops_duplicates(spark, sf_dir):
    stream = sw.dedup_late_events(sw.stream_events(spark, sf_dir))
    got = sw.run_to_memory(stream, "t_dedup", output_mode="append")
    n_ids = got.select("event_id").distinct().count()
    assert got.count() == n_ids


def test_stream_static_blocklist_filters_users(spark, sf_dir):
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    events = load_tables(spark, sf_dir).events
    blocked = events.select("user_id").distinct().limit(3)
    blocked_ids = {r.user_id for r in blocked.collect()}
    stream = sw.filter_against_blocklist(sw.stream_events(spark, sf_dir), blocked)
    got = sw.run_to_memory(stream, "t_blocklist", output_mode="append")
    # No blocked user survives, and everything else does.
    assert not ({r.user_id for r in got.select("user_id").distinct().collect()} & blocked_ids)
    expected = events.join(blocked, "user_id", "left_anti").count()
    assert got.count() == expected


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """The stream-stream interval join emits exactly the (error, click)
    pairs the batch bucketed range join generates."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables
    from machinelearningalgomapreduce_spark.streaming import windows as SW

    out = SW.run_to_memory(
        SW.interval_join_stream(SW.stream_events(spark, sf_dir)),
        "t_interval_join",
        output_mode="append",
    )
    got = {(r.event_id, r.c_ts) for r in out.collect()}

    ev = load_tables(spark, sf_dir).events
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("e_ts")
    )
    batch = errors.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 minutes"))
        & (F.col("c_ts") < F.col("e_ts")),
    )
    want = {(r.event_id, r.c_ts) for r in batch.collect()}
    assert got == want
    assert len(got) > 0
