"""Semantic contracts for the round-8 session-5 monitoring & diagnostics
tier (q_ljung_box, q_lead_lag, q_ewma_control, q_durbin_watson,
q_active_days, q_embedding_drift): each result recomputed from ground
truth with independent Python sweeps over the raw fixture. The bit-exact
oracle differential lives in tools/check.py."""

from __future__ import annotations

import math
from collections import Counter

from tests.conftest import SMOKE_SF_DIR


def _daily_counts(spark):
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    ev = load_tables(spark, SMOKE_SF_DIR).events.select("event_type", "ts").collect()
    series: dict[str, Counter] = {}
    for r in ev:
        series.setdefault(r.event_type, Counter())[r.ts.date()] += 1
    return series


def test_ljung_box_matches_python_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import (
        LB_CRIT_95,
        LB_MAX_LAG,
        q_ljung_box,
    )

    series = _daily_counts(spark)
    got = {r.event_type: r for r in q_ljung_box(spark, SMOKE_SF_DIR).collect()}
    assert set(got) == set(series)
    for ty, cnts in series.items():
        xs = [cnts[day] for day in sorted(cnts)]
        n = len(xs)
        mean = sum(xs) / n
        c0 = sum(x * x for x in xs) - mean * sum(xs)
        s = 0.0
        rho1 = None
        for k in range(1, LB_MAX_LAG + 1):
            a, b = xs[k:], xs[:-k]
            ck = (
                sum(x * y for x, y in zip(a, b))
                - mean * sum(a)
                - mean * sum(b)
                + len(a) * mean * mean
            )
            rho = ck / c0
            if k == 1:
                rho1 = rho
            s += rho * rho / (n - k)
        q = n * (n + 2.0) * s
        r = got[ty]
        assert r.n_days == n
        assert r.m_lags == LB_MAX_LAG
        assert r.rho1 == round(rho1, 6)
        # same fold order ⇒ equality after the shared round
        assert abs(r.q_stat - q) < 1e-6
        assert r.reject == (1 if round(r.q_stat, 6) > LB_CRIT_95 else 0)
        # daily traffic has strong weekly structure: portmanteau must see it
        assert r.q_stat >= 0.0


def test_lead_lag_matches_python_recompute(spark):
    import datetime as dt

    from machinelearningalgomapreduce_spark.operators.timeseries import (
        XCORR_LAG_DAYS,
        q_lead_lag,
    )

    series = _daily_counts(spark)
    rows = q_lead_lag(spark, SMOKE_SF_DIR).collect()
    got = {(r.type_tgt, r.type_lead): r for r in rows}
    types = sorted(series)
    for ta in types:
        for tb in types:
            if ta == tb:
                continue
            pairs = [
                (series[ta][d], series[tb][d - dt.timedelta(days=XCORR_LAG_DAYS)])
                for d in series[ta]
                if (d - dt.timedelta(days=XCORR_LAG_DAYS)) in series[tb]
            ]
            r = got[(ta, tb)]
            assert r.n_pairs == len(pairs)
            n = float(len(pairs))
            sx = sum(p[0] for p in pairs)
            sy = sum(p[1] for p in pairs)
            sxy = sum(p[0] * p[1] for p in pairs)
            sxx = sum(p[0] * p[0] for p in pairs)
            syy = sum(p[1] * p[1] for p in pairs)
            den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            assert r.xcorr == round((n * sxy - sx * sy) / den, 6)
    # per target, lead_rank is a 1..k permutation ordered by (xcorr desc, name)
    for ta in types:
        mine = sorted(
            (r for r in rows if r.type_tgt == ta),
            key=lambda r: (-r.xcorr, r.type_lead),
        )
        assert [r.lead_rank for r in mine] == list(range(1, len(mine) + 1))


def test_ewma_control_matches_python_fold(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import (
        _EW_FAC,
        _EW_OM,
        _EW_OM2,
        EWMA_L,
        EWMA_LAMBDA,
        q_ewma_control,
    )

    series = _daily_counts(spark)
    got = {r.event_type: r for r in q_ewma_control(spark, SMOKE_SF_DIR).collect()}
    assert set(got) == set(series)
    for ty, cnts in series.items():
        xs = [float(cnts[day]) for day in sorted(cnts)]
        n = len(xs)
        mean = sum(xs) / n
        sd = math.sqrt((sum(x * x for x in xs) - mean * sum(xs)) / (n - 1.0))
        z, p = mean, 1.0
        n_alarms, first_alarm = 0, 0
        for t, x in enumerate(xs, start=1):
            z = EWMA_LAMBDA * x + _EW_OM * z
            p = p * _EW_OM2
            thr = EWMA_L * sd * math.sqrt(_EW_FAC * (1.0 - p))
            if abs(z - mean) > thr:
                n_alarms += 1
                if first_alarm == 0:
                    first_alarm = t
        r = got[ty]
        assert r.n_days == n
        assert r.mean == round(mean, 6)
        assert r.sd == round(sd, 6)
        assert r.z_final == round(z, 6)
        assert r.n_alarms == n_alarms
        assert r.first_alarm == first_alarm


def test_durbin_watson_matches_python_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import (
        DW_HI,
        DW_LO,
        q_durbin_watson,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    import datetime as dt

    ev = load_tables(spark, SMOKE_SF_DIR).events.select("event_type", "ts").collect()
    epoch = dt.date(1995, 1, 1)
    series: dict[str, Counter] = {}
    for r in ev:
        series.setdefault(r.event_type, Counter())[(r.ts.date() - epoch).days] += 1
    got = {r.event_type: r for r in q_durbin_watson(spark, SMOKE_SF_DIR).collect()}
    assert set(got) == set(series)
    for ty, cnts in series.items():
        pts = sorted(cnts.items())
        n = float(len(pts))
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        es = [y - (intercept + slope * x) for x, y in pts]
        num = sum((b - a) * (b - a) for a, b in zip(es, es[1:]))
        den = sum(e * e for e in es)
        r = got[ty]
        assert r.n_days == len(pts)
        assert abs(r.dw - num / den) < 1e-6
        assert 0.0 <= r.dw <= 4.0
        exp_flag = 1 if r.dw < DW_LO else (-1 if r.dw > DW_HI else 0)
        assert r.autocorr_flag == exp_flag


def test_active_days_matches_python_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.behavior import q_active_days
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    ev = load_tables(spark, SMOKE_SF_DIR).events.select("user_id", "ts").collect()
    per_user: dict[int, set] = {}
    for r in ev:
        per_user.setdefault(r.user_id, set()).add(r.ts.date())
    hist = Counter(len(days) for days in per_user.values())
    total = len(per_user)
    rows = q_active_days(spark, SMOKE_SF_DIR).collect()
    assert {r.active_days: r.n_users for r in rows} == dict(hist)
    cum = 0
    for r in sorted(rows, key=lambda r: r.active_days):
        cum += r.n_users
        assert r.cum_users == cum
        assert r.share_micro == (2 * r.n_users * 1_000_000 + total) // (2 * total)
    assert cum == total


def test_embedding_drift_matches_python_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.similarity import (
        EMB_DRIFT_COS,
        q_embedding_drift,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    vecs = load_tables(spark, SMOKE_SF_DIR).embeddings.select(
        "label", "embedding"
    ).collect()
    by_label: dict[int, list] = {}
    for r in vecs:
        by_label.setdefault(r.label, []).append([float(v) for v in r.embedding])
    dim = len(vecs[0].embedding)
    gmean = [
        round(sum(v[d] for vs in by_label.values() for v in vs) / len(vecs), 6)
        for d in range(dim)
    ]
    got = {r.label: r for r in q_embedding_drift(spark, SMOKE_SF_DIR).collect()}
    assert set(got) == set(by_label)
    for label, vs in by_label.items():
        cent = [round(sum(v[d] for v in vs) / len(vs), 6) for d in range(dim)]
        dot = sum(c * g for c, g in zip(cent, gmean))
        cn = math.sqrt(sum(c * c for c in cent))
        gn = math.sqrt(sum(g * g for g in gmean))
        r = got[label]
        assert r.n_vecs == len(vs)
        # rounded centroids are shared; fold order matches ⇒ tight equality
        assert abs(r.cos_to_global - dot / (cn * gn)) < 1e-6
        assert abs(r.norm_ratio - cn / gn) < 1e-6
        assert -1.0 <= r.cos_to_global <= 1.0
        assert r.drifted == (1 if r.cos_to_global < EMB_DRIFT_COS else 0)


def test_monitor_tier_exchange_budgets(spark, sf_dir):
    """Snapshot the exchange counts: in every kernel only the FIRST
    aggregate (events → the (type, day) / (user, day) / (label, dim)
    frame) touches data-scale rows; every later exchange repartitions a
    frame bounded by the calendar, the type domain, or the model. A
    budget regression here means a new shuffle crept onto the raw scan."""
    from machinelearningalgomapreduce_spark.plans import inspect as P
    from machinelearningalgomapreduce_spark.registry import queries

    budgets = {
        "q_ewma_control": 2,
        "q_ljung_box": 6,
        "q_lead_lag": 4,
        "q_durbin_watson": 4,
        "q_active_days": 4,
        "q_embedding_drift": 5,
    }
    q = queries()
    for name, budget in budgets.items():
        assert P.count_exchanges(q[name](spark, sf_dir)) <= budget, name


def test_granger_matches_numpy_lstsq(spark):
    """The closed-form exact-moment F equals an INDEPENDENT numpy
    least-squares fit of the restricted/unrestricted models per pair —
    a genuinely different solver (QR vs normal equations)."""
    import numpy as np

    from machinelearningalgomapreduce_spark.operators.timeseries import q_granger

    series = _daily_counts(spark)
    got = {
        (r.type_tgt, r.type_src): (r.n_days, r.beta_x, r.f_stat)
        for r in q_granger(spark, SMOKE_SF_DIR).collect()
    }
    types = sorted(series)
    for tgt in types:
        for src in types:
            if tgt == src:
                continue
            days_t, days_s = series[tgt], series[src]
            rows = []
            for day in sorted(days_t):
                prev = day - __import__("datetime").timedelta(days=1)
                if prev in days_t and prev in days_s:
                    rows.append((days_t[day], days_t[prev], days_s[prev]))
            if len(rows) <= 3:
                assert (tgt, src) not in got
                continue
            y = np.array([r[0] for r in rows], dtype=float)
            a = np.array([r[1] for r in rows], dtype=float)
            b = np.array([r[2] for r in rows], dtype=float)
            one = np.ones_like(y)
            rss_r = np.linalg.lstsq(np.column_stack([one, a]), y, rcond=None)[1][0]
            xu = np.column_stack([one, a, b])
            coef, res_u, *_ = np.linalg.lstsq(xu, y, rcond=None)
            rss_u = res_u[0] if len(res_u) else float(((y - xu @ coef) ** 2).sum())
            n = len(rows)
            f = (rss_r - rss_u) * (n - 3) / rss_u
            gn, gbeta, gf = got[(tgt, src)]
            assert gn == n, (tgt, src)
            assert abs(gbeta - coef[2]) < 1e-5, (tgt, src)
            assert abs(gf - f) < 1e-4, (tgt, src)
    assert len(got) == len(types) * (len(types) - 1)
