"""Unit/invariant tests for the round-4 operator additions (link
prediction, k-core, rank-sum test, Zipf fit, domain mixing, sketch
audit, CUSUM). The bit-exact oracle differential lives in tools/check.py;
these assert the semantic invariants a hash comparison can't express."""

from __future__ import annotations

import contextlib
import datetime
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F


@contextlib.contextmanager
def _patched_events(module, spark, rows):
    """Swap a module's load_tables for one returning a literal events frame."""
    ev_df = spark.createDataFrame(rows)

    class _Cat:
        events = ev_df

    orig = module.load_tables
    module.load_tables = lambda *_a, **_k: _Cat()
    try:
        yield
    finally:
        module.load_tables = orig


def _event_row(i: int, minute: int, event_type: str, value: float) -> Row:
    return Row(
        event_id=i,
        ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minute),
        user_id=i,
        event_type=event_type,
        value=value,
        props="{}",
    )


# ----------------------------------------------------------------- k-core


def _py_kcore(edges: list[tuple[int, int]], k: int) -> set[int]:
    """Reference peel on plain Python structures."""
    cur = set(edges)
    while True:
        deg: dict[int, int] = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in cur if u in alive and v in alive}
        if nxt == cur:
            return {n for e in cur for n in e}
        cur = nxt


def test_kcore_iterate_matches_python_peel(spark):
    from machinelearningalgomapreduce_spark.operators.graph import kcore_iterate

    # A 4-clique (3-core) with a pendant path hanging off it.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = kcore_iterate(df, k=3)
    got_nodes = {n for r in got.collect() for n in (r.u, r.v)}
    assert got_nodes == _py_kcore(edges, 3) == {1, 2, 3, 4}


def test_kcore_iterate_empty_result(spark):
    from machinelearningalgomapreduce_spark.operators.graph import kcore_iterate

    df = spark.createDataFrame([(1, 2), (2, 3)], ["u", "v"])  # path: no 3-core
    assert kcore_iterate(df, k=3).count() == 0


def test_kcore_step_survivors_have_initial_degree_at_least_k(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.graph import KCORE_K, q_kcore_step

    rows = q_kcore_step(spark, sf_dir).collect()
    assert rows, "fixture graph should have a non-empty first peel"
    assert all(r.deg0 >= KCORE_K for r in rows)
    assert all(r.deg1 <= r.deg0 for r in rows)  # peeling never raises degree
    assert all((r.deg1 >= KCORE_K) == r.still_core for r in rows)


# ------------------------------------------------------------ link prediction


def test_common_neighbors_candidates_are_non_adjacent(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.graph import (
        _repeat_copurchase_edges,
        q_common_neighbors,
    )

    cand = q_common_neighbors(spark, sf_dir)
    edges = _repeat_copurchase_edges(spark, sf_dir)
    overlap = cand.join(edges, ["u", "v"]).count()
    assert overlap == 0, "predicted links must not already be edges"


def test_common_neighbors_scores_bounded(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.graph import (
        MIN_COMMON,
        q_common_neighbors,
    )

    rows = q_common_neighbors(spark, sf_dir).collect()
    assert rows, "fixture should yield candidate links"
    for r in rows:
        assert r.common >= MIN_COMMON
        assert 0.0 < r.jaccard <= 1.0
        assert r.adamic_adar > 0.0
        assert r.u < r.v


# ------------------------------------------------------------- Mann-Whitney


def test_mannwhitney_u_identities(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.evaluation import q_mannwhitney

    [r] = q_mannwhitney(spark, sf_dir).collect()
    assert 0 <= r.u_stat <= r.n_a * r.n_b
    assert r.mean_u == pytest.approx(r.n_a * r.n_b / 2.0)
    assert abs(r.z_score) < 50  # finite, sane magnitude


def test_mannwhitney_symmetric_input_z_zero(spark):
    """Identical click/purchase multisets: U equals its mean, z = 0."""
    from machinelearningalgomapreduce_spark.operators import evaluation as ev

    rows = []
    for i, v in enumerate([1.0, 2.0, 2.0, 5.0]):
        for et in ("click", "purchase"):
            rows.append(_event_row(len(rows), i, et, v))
    with _patched_events(ev, spark, rows):
        [r] = ev.q_mannwhitney(spark, "unused").collect()
    assert r.u_stat == pytest.approx(r.mean_u)
    assert r.z_score == pytest.approx(0.0)
    assert not r.significant


def _py_mannwhitney(a: list[float], b: list[float]) -> tuple[float, float]:
    """Reference U and z via average ranks (tie-corrected normal approx)."""
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    ranks: dict[int, float] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        avg = (i + 1 + j) / 2  # average of ranks i+1..j
        for k in range(i, j):
            ranks[k] = avg
        i = j
    r_a = sum(ranks[k] for k, (_, grp) in enumerate(pooled) if grp == 0)
    na, nb = len(a), len(b)
    u = r_a - na * (na + 1) / 2
    n = na + nb
    from collections import Counter

    tie3 = sum(t**3 - t for t in Counter(v for v, _ in pooled).values())
    var = na * nb * ((n + 1) * n * (n - 1) - tie3) / (12 * n * (n - 1))
    z = (u - na * nb / 2) / math.sqrt(var)
    return u, z


@given(
    vals_a=st.lists(st.integers(0, 20).map(lambda v: v / 4.0), min_size=2, max_size=12),
    vals_b=st.lists(st.integers(0, 20).map(lambda v: v / 4.0), min_size=2, max_size=12),
)
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
def test_mannwhitney_matches_python_reference(spark, vals_a, vals_b):
    from machinelearningalgomapreduce_spark.operators import evaluation as ev

    # Degenerate pools (zero variance: every value tied) divide by zero in
    # both the operator and the reference — excluded, not asserted.
    if len(set(vals_a) | set(vals_b)) == 1:
        return
    rows = [_event_row(i, i, "click", v) for i, v in enumerate(vals_a)] + [
        _event_row(100 + i, 100 + i, "purchase", v) for i, v in enumerate(vals_b)
    ]
    with _patched_events(ev, spark, rows):
        [r] = ev.q_mannwhitney(spark, "unused").collect()
    u_ref, z_ref = _py_mannwhitney(vals_a, vals_b)
    assert r.u_stat == pytest.approx(u_ref, abs=1e-9)
    assert r.z_score == pytest.approx(z_ref, abs=2e-6)


def _py_cusum_peak(counts: list[int]) -> float:
    h = len(counts)
    total = sum(counts)
    cum = 0
    best = 0
    for t, n in enumerate(counts, start=1):
        cum += n
        best = max(best, abs(cum * h - t * total))
    return best / h


@given(counts=st.lists(st.integers(1, 9), min_size=2, max_size=10))
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
def test_cusum_matches_python_reference(spark, counts):
    from machinelearningalgomapreduce_spark.operators import timeseries as tsm

    rows = []
    for hour, n in enumerate(counts):
        for k in range(n):
            rows.append(
                Row(
                    event_id=len(rows),
                    ts=datetime.datetime(2024, 1, 1, hour, k),
                    user_id=1,
                    event_type="click",
                    value=1.0,
                    props="{}",
                )
            )
    with _patched_events(tsm, spark, rows):
        [r] = tsm.q_cusum(spark, "unused").collect()
    assert r.cusum_max == pytest.approx(_py_cusum_peak(counts), abs=1e-6)
    assert r.n_hours == len(counts) and r.total == sum(counts)


# ------------------------------------------------------------------- Zipf


def test_zipf_fit_slope_negative_high_r2(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.text import q_zipf_fit

    [r] = q_zipf_fit(spark, sf_dir).collect()
    assert r.slope < 0, "frequency must fall with rank"
    assert 0.0 <= r.r2 <= 1.0
    assert r.n_terms > 0


# -------------------------------------------------------------- domain mix


def test_domain_mix_rates_and_shares(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.export import q_domain_mix

    rows = q_domain_mix(spark, sf_dir).collect()
    assert sum(r.token_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        assert 0.0 < r.sample_rate <= 1.0
        assert r.kept_tokens <= r.n_tokens
    # Sources at or below the uniform share are never downsampled.
    n = len(rows)
    for r in rows:
        if r.token_share <= 1.0 / n:
            assert r.sample_rate == 1.0


# ------------------------------------------------------------ minhash audit


def test_minhash_estimate_bounded_and_consistent(spark, sf_dir):
    from machinelearningalgomapreduce_spark.functions.hashing import N_MINHASH
    from machinelearningalgomapreduce_spark.operators.dedup import q_dedup_minhash_est

    rows = q_dedup_minhash_est(spark, sf_dir).collect()
    assert rows, "LSH should produce candidate pairs on the fixture"
    for r in rows:
        assert 0 <= r.n_match <= N_MINHASH
        assert r.est_jaccard == pytest.approx(r.n_match / N_MINHASH, abs=1e-6)
        assert 0.0 <= r.jaccard <= 1.0
        assert r.abs_err == pytest.approx(abs(r.est_jaccard - r.jaccard), abs=2e-6)
    # The sketch must carry signal: average error well under a coin flip.
    avg_err = sum(r.abs_err for r in rows) / len(rows)
    assert avg_err < 0.35


# ------------------------------------------------------------ ANN recall


def test_sim_recall_bounded_and_consistent(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.similarity import ANN_K, q_sim_recall

    rows = q_sim_recall(spark, sf_dir).collect()
    assert rows, "fixture should yield query points"
    for r in rows:
        assert r.k == ANN_K
        assert 0 <= r.n_hits <= ANN_K
        assert r.recall == pytest.approx(r.n_hits / ANN_K, abs=1e-6)


# ---------------------------------------------------------- rolling median


def test_rolling_median_first_row_is_value(spark, sf_dir):
    """Each user's first event has a 1-row frame: median == value."""
    from machinelearningalgomapreduce_spark.operators.events import q_rolling_median
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    med = q_rolling_median(spark, sf_dir)
    firsts = (
        load_tables(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(F.min_by("event_id", F.struct("ts", "event_id")).alias("event_id"),
             F.min_by("value", F.struct("ts", "event_id")).alias("value"))
    )
    joined = med.join(firsts, ["user_id", "event_id"]).collect()
    assert joined
    for r in joined:
        assert r.n_win == 1
        assert r.roll_median == pytest.approx(round(r.value, 6), abs=1e-9)


@given(vals=st.lists(st.integers(0, 40).map(lambda v: v / 8.0), min_size=1, max_size=14))
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
def test_rolling_median_matches_python_reference(spark, vals):
    import statistics

    from machinelearningalgomapreduce_spark.operators import events as evm
    from machinelearningalgomapreduce_spark.operators.events import ROLLING_MEDIAN_N

    rows = [
        Row(**{**_event_row(i, i, "click", v).asDict(), "user_id": 7})
        for i, v in enumerate(vals)
    ]
    with _patched_events(evm, spark, rows):
        got = {
            r.event_id: (r.n_win, r.roll_median)
            for r in evm.q_rolling_median(spark, "x").collect()
        }
    for i, _ in enumerate(vals):
        frame = vals[max(0, i - (ROLLING_MEDIAN_N - 1)) : i + 1]
        assert got[i][0] == len(frame)
        assert got[i][1] == pytest.approx(round(statistics.median(frame), 6), abs=1e-9)


def test_rolling_median_window_sizes_capped(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.events import (
        ROLLING_MEDIAN_N,
        q_rolling_median,
    )

    agg = q_rolling_median(spark, sf_dir).agg(
        F.max("n_win").alias("mx"), F.min("n_win").alias("mn")
    ).collect()[0]
    assert agg.mn == 1
    assert agg.mx <= ROLLING_MEDIAN_N


# ----------------------------------------------------------- MAD outliers


def test_outlier_mad_flags_subset_of_extremes(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.evaluation import q_outlier_mad

    rows = q_outlier_mad(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0 and r.n_outliers >= 0
        assert r.n_outliers < r.n  # the majority is never outlying (BP 0.5)
        assert r.max_adev >= r.mad


# ----------------------------------------------------------- session paths


def test_session_paths_shapes(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.events import (
        PATH_LEN,
        PATHS_TOP,
        q_session_paths,
    )

    rows = q_session_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= PATHS_TOP
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)  # ranked output
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= PATH_LEN


def test_session_paths_tiny_journeys(spark):
    """Two identical short journeys and one longer one: paths truncate at
    PATH_LEN and count across users."""
    from machinelearningalgomapreduce_spark.operators import events as evm

    def ev(eid, minute, user, etype):
        return Row(**{**_event_row(eid, minute, etype, 1.0).asDict(), "user_id": user})

    rows = [
        ev(1, 0, 1, "view"), ev(2, 1, 1, "click"),
        ev(3, 0, 2, "view"), ev(4, 1, 2, "click"),
        # user 3: 5 events in one session — path truncates to first 4
        ev(5, 0, 3, "view"), ev(6, 1, 3, "view"), ev(7, 2, 3, "click"),
        ev(8, 3, 3, "view"), ev(9, 4, 3, "purchase"),
    ]
    with _patched_events(evm, spark, rows):
        got = {r.path: r.n_sessions for r in evm.q_session_paths(spark, "x").collect()}
    assert got == {"view>click": 2, "view>view>click>view": 1}


# ------------------------------------------------------------ attribution


def test_attribution_counts_partition_purchases(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.events import q_attribution
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    rows = q_attribution(spark, sf_dir).collect()
    total = sum(r.n_purchases for r in rows)
    n_purch = (
        load_tables(spark, sf_dir).events.filter(F.col("event_type") == "purchase").count()
    )
    assert total == n_purch  # every purchase attributed exactly once
    # Fixture event-type vocabulary minus 'purchase' (a purchase is the
    # conversion, never the credited touch), plus 'none' for history-opening
    # purchases. (ADVICE r4: the old `| touches` made this tautological.)
    touches = {r.touch for r in rows}
    assert touches <= {"view", "click", "error", "signup", "none"}


def test_attribution_tiny_sequence(spark):
    """view → purchase → purchase: both purchases credit the view (the
    last non-purchase touch persists); a history-opening purchase with no
    prior touch lands in 'none'."""
    from machinelearningalgomapreduce_spark.operators import events as evm

    def ev(eid, minute, user, etype, value):
        return Row(**{**_event_row(eid, minute, etype, value).asDict(), "user_id": user})

    rows = [
        ev(1, 0, 1, "view", 10.0),
        ev(2, 1, 1, "purchase", 5.0),
        ev(3, 2, 1, "purchase", 7.0),
        ev(4, 3, 99, "purchase", 1.0),  # lone purchase → 'none'
    ]
    with _patched_events(evm, spark, rows):
        got = {r.touch: (r.n_purchases, r.revenue) for r in evm.q_attribution(spark, "x").collect()}
    assert got == {"view": (2, 12.0), "none": (1, 1.0)}


# ------------------------------------------------------- incremental dedup


def test_incremental_dedup_partitions_delta(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.incremental import (
        DELTA_MOD,
        q_incremental_dedup,
    )

    rows = q_incremental_dedup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_id % DELTA_MOD == 0
        # admit is exactly "neither kind of dup".
        assert r.admit == (not r.dup_of_base and not r.dup_within_delta)
        if r.dup_of_base:
            assert r.base_keep is not None and r.base_keep % DELTA_MOD != 0
    # At most one admitted or base-dup-flagged FIRST doc per content hash.
    firsts: dict[str, int] = {}
    for r in rows:
        if not r.dup_within_delta:
            assert r.content_hash not in firsts
            firsts[r.content_hash] = r.doc_id


# ------------------------------------------------------------ group sample


def test_group_sample_deterministic_and_capped(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.export import (
        GROUP_SAMPLE_N,
        q_group_sample,
    )

    a = {(r.source, r.doc_id, r.rk) for r in q_group_sample(spark, sf_dir).collect()}
    b = {(r.source, r.doc_id, r.rk) for r in q_group_sample(spark, sf_dir).collect()}
    assert a == b, "sample must be run-to-run identical"
    per_source: dict[str, int] = {}
    for src, _, rk in a:
        per_source[src] = max(per_source.get(src, 0), rk)
    assert all(1 <= mx <= GROUP_SAMPLE_N for mx in per_source.values())


# -------------------------------------------------------------- BPE train


def test_bpe_train_round0_matches_checked_merge_query(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.export import bpe_train, q_bpe_merge

    merges = bpe_train(spark, sf_dir, n_merges=5)
    assert len(merges) == 5
    top = q_bpe_merge(spark, sf_dir).collect()[0]
    # Round 0 counts the same weighted pairs with the same tie-break.
    assert merges[0] == (top.pair, top.score)
    # Each merged token is the concatenation of two existing symbols and
    # scores never increase as merges consume pair mass... not strictly
    # monotone in general, but every score stays positive and bounded by
    # the first.
    assert all(s > 0 for _, s in merges)


# -------------------------------------------------------------- seasonal


def test_seasonal_profile_shares_sum_to_one(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.events import q_seasonal_profile

    rows = q_seasonal_profile(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, slot_rows in by_type.items():
        assert sum(r.share for r in slot_rows) == pytest.approx(1.0, abs=1e-4), et
        peaks = [r for r in slot_rows if r.is_peak]
        assert len(peaks) == 1, et
        assert peaks[0].n == max(r.n for r in slot_rows), et
        assert all(0 <= r.hod <= 23 for r in slot_rows)


# ------------------------------------------------------------------- ECDF


def test_quantile_normalize_monotone_ending_at_one(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.stats import q_quantile_normalize

    rows = q_quantile_normalize(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, vrows in by_type.items():
        vrows.sort(key=lambda r: r.value)
        assert all(a.ecdf < b.ecdf for a, b in zip(vrows, vrows[1:])), et
        assert vrows[-1].ecdf == pytest.approx(1.0), et
        assert vrows[-1].cum_n == sum(r.n for r in vrows), et


# ------------------------------------------------------------------ CUSUM


def test_cusum_peak_is_interior_maximum(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.timeseries import q_cusum

    rows = q_cusum(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cusum_max >= 0.0
        assert r.n_hours >= 1
        assert r.peak_hour is not None


def test_cusum_flat_series_zero(spark):
    """A perfectly flat hourly series has zero CUSUM everywhere."""
    from machinelearningalgomapreduce_spark.operators import timeseries as tsm

    rows = [
        Row(
            event_id=i,
            ts=datetime.datetime(2024, 1, 1, hour, 0),
            user_id=1,
            event_type="click",
            value=1.0,
            props="{}",
        )
        for i, hour in enumerate(h for h in range(6) for _ in range(3))
    ]
    with _patched_events(tsm, spark, rows):
        [r] = tsm.q_cusum(spark, "unused").collect()
    assert r.cusum_max == 0.0
    assert r.total == 18 and r.n_hours == 6
