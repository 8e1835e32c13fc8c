"""Semantic contracts for the round-8 session-6 inference tier
(q_nelson_aalen, q_log_rank, q_tukey_hsd, q_g_test, q_cohens_d,
q_cliffs_delta): each result recomputed from ground truth with
independent pure-Python sweeps over the raw fixture — including the
brute-force O(n_a·n_b) Cliff's delta definition checked against the
distributed rank-identity form. The bit-exact oracle differential
lives in tools/check.py."""

from __future__ import annotations

import math

from tests.conftest import SMOKE_SF_DIR


def _events(spark):
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    return load_tables(spark, SMOKE_SF_DIR).events.select(
        "user_id", "event_type", "ts", "value"
    ).collect()


def _half_up(num: int, den: int) -> int:
    """floor((2n + d) / (2d)) — the fixedpoint.half_up twin on exact ints."""
    return (2 * num + den) // (2 * den)


def _survival_per_user(rows):
    """(event: bool, t_s: int, user_id) per first-click user: duration to
    first post-click purchase, censored at last_seen — the kaplan_meier
    contract (operators/behavior.py)."""
    first_click: dict[int, int] = {}
    last_seen: dict[int, int] = {}
    purchases: dict[int, list[int]] = {}
    for r in rows:
        us = int(r.ts.timestamp() * 1_000_000)
        u = r.user_id
        if r.event_type == "click":
            first_click[u] = min(first_click.get(u, us), us)
        if r.event_type == "purchase":
            purchases.setdefault(u, []).append(us)
        last_seen[u] = max(last_seen.get(u, us), us)
    out = []
    for u, c_us in first_click.items():
        p_candidates = [p for p in purchases.get(u, []) if p > c_us]
        if p_candidates:
            end, event = min(p_candidates), True
        else:
            end, event = last_seen[u], False
        t_s = (end - c_us) // 1_000_000
        if t_s >= 0:
            out.append((u, event, t_s))
    return out


def test_nelson_aalen_matches_python_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.inference import q_nelson_aalen

    per_user = _survival_per_user(_events(spark))
    per_t: dict[int, list[int]] = {}
    for _, event, t_s in per_user:
        d = per_t.setdefault(t_s, [0, 0])
        d[0 if event else 1] += 1
    got = q_nelson_aalen(spark, SMOKE_SF_DIR).orderBy("t_s").collect()
    assert [r.t_s for r in got] == sorted(per_t)
    n_risk = len(per_user)
    cum = 0
    for r in got:
        d, c = per_t[r.t_s]
        assert r.n_risk == n_risk
        assert r.n_events == d
        hz = _half_up(d * 1_000_000, n_risk)
        assert r.hazard_micro == hz
        cum += hz
        assert r.cumhaz_micro == cum
        n_risk -= d + c
    # cumulative hazard is nonneg and nondecreasing by construction
    assert got[-1].cumhaz_micro >= got[0].cumhaz_micro >= 0


def test_log_rank_matches_python_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.inference import q_log_rank

    per_user = _survival_per_user(_events(spark))
    per_t: dict[int, list[int]] = {}  # t -> [e0, e1, r0, r1]
    n_tot = [0, 0]
    for u, event, t_s in per_user:
        g = u % 2
        n_tot[g] += 1
        d = per_t.setdefault(t_s, [0, 0, 0, 0])
        if event:
            d[g] += 1
        d[2 + g] += 1
    at_risk = [n_tot[0], n_tot[1]]
    o1 = 0
    e1_sum = v_sum = 0.0
    for t in sorted(per_t):
        e0, e1, r0, r1 = per_t[t]
        dt, nt = e0 + e1, at_risk[0] + at_risk[1]
        if dt > 0 and nt > 1:
            o1 += e1
            e1_sum += dt * at_risk[1] / nt
            v_sum += (
                dt * (at_risk[1] / nt) * (at_risk[0] / nt) * ((nt - dt) / (nt - 1.0))
            )
        at_risk[0] -= r0
        at_risk[1] -= r1
    [r] = q_log_rank(spark, SMOKE_SF_DIR).collect()
    assert (r.n0, r.n1, r.o1) == (n_tot[0], n_tot[1], o1)
    assert abs(r.e1 - e1_sum) < 1e-5
    assert abs(r.var_sum - v_sum) < 1e-5
    assert abs(r.z - (o1 - e1_sum) / math.sqrt(v_sum)) < 1e-5


def _group_stats(rows):
    stats: dict[str, list[float]] = {}
    for r in rows:
        stats.setdefault(r.event_type, []).append(round(float(r.value), 6))
    return stats


def test_tukey_hsd_matches_python_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.inference import q_tukey_hsd

    stats = _group_stats(_events(spark))
    k = len(stats)
    n_total = sum(len(v) for v in stats.values())
    ssw = sum(
        round(
            sum(x * x for x in xs) - sum(xs) ** 2 / len(xs), 6
        )
        for xs in stats.values()
    )
    df_w = n_total - k
    mse = ssw / df_w
    rows = q_tukey_hsd(spark, SMOKE_SF_DIR).collect()
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        xa, xb = stats[r.ty_a], stats[r.ty_b]
        assert r.ty_a < r.ty_b
        assert (r.n_a, r.n_b, r.df_w) == (len(xa), len(xb), df_w)
        diff = sum(xa) / len(xa) - sum(xb) / len(xb)
        se = math.sqrt(mse / 2.0 * (1.0 / len(xa) + 1.0 / len(xb)))
        assert abs(r.mean_diff - diff) < 1e-5
        assert abs(r.q_stat - abs(diff) / se) < 1e-4


def test_g_test_matches_python_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import HOUR_BAND_WIDTH
    from machinelearningalgomapreduce_spark.operators.inference import q_g_test

    cells: dict[tuple, int] = {}
    for r in _events(spark):
        key = (r.event_type, r.ts.hour // HOUR_BAND_WIDTH)
        cells[key] = cells.get(key, 0) + 1
    rt: dict[str, int] = {}
    ct: dict[int, int] = {}
    for (ty, band), n in cells.items():
        rt[ty] = rt.get(ty, 0) + n
        ct[band] = ct.get(band, 0) + n
    nn = sum(cells.values())
    g = 2.0 * sum(
        n * math.log(n / (rt[ty] * ct[band] / nn))
        for (ty, band), n in sorted(cells.items())
    )
    [r] = q_g_test(spark, SMOKE_SF_DIR).collect()
    assert r.n_cells == len(cells)
    assert r.dof == (len(rt) - 1) * (len(ct) - 1)
    assert abs(r.g_stat - g) < 1e-5
    # G and Pearson chi2 agree asymptotically; both must be nonnegative
    assert r.g_stat >= 0.0


def test_cohens_d_matches_python_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import (
        KS_TYPE_A,
        KS_TYPE_B,
    )
    from machinelearningalgomapreduce_spark.operators.inference import q_cohens_d

    stats = _group_stats(_events(spark))
    xa, xb = stats[KS_TYPE_A], stats[KS_TYPE_B]
    na, nb = len(xa), len(xb)
    mean_diff = sum(xa) / na - sum(xb) / nb
    ssa = sum(x * x for x in xa) - sum(xa) ** 2 / na
    ssb = sum(x * x for x in xb) - sum(xb) ** 2 / nb
    s_pooled = math.sqrt((ssa + ssb) / (na + nb - 2.0))
    d = mean_diff / s_pooled
    g = d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))
    [r] = q_cohens_d(spark, SMOKE_SF_DIR).collect()
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.mean_diff - mean_diff) < 1e-5
    assert abs(r.cohens_d - d) < 1e-6
    assert abs(r.hedges_g - g) < 1e-6
    # |g| < |d| always (shrinkage correction)
    assert abs(r.hedges_g) < abs(r.cohens_d)


def test_cliffs_delta_matches_bruteforce_definition(spark):
    """The distributed rank-identity δ must equal the literal O(n_a·n_b)
    pairwise definition δ = (#(a>b) − #(a<b)) / (n_a·n_b)."""
    from machinelearningalgomapreduce_spark.operators.evaluation import (
        KS_TYPE_A,
        KS_TYPE_B,
    )
    from machinelearningalgomapreduce_spark.operators.inference import (
        CLIFF_LARGE,
        CLIFF_MEDIUM,
        CLIFF_SMALL,
        q_cliffs_delta,
    )

    stats = _group_stats(_events(spark))
    xa, xb = stats[KS_TYPE_A], stats[KS_TYPE_B]
    gt = lt = 0
    xb_sorted = sorted(xb)
    import bisect

    for a in xa:
        lo = bisect.bisect_left(xb_sorted, a)
        hi = bisect.bisect_right(xb_sorted, a)
        gt += lo
        lt += len(xb_sorted) - hi
    delta = (gt - lt) / (len(xa) * len(xb))
    [r] = q_cliffs_delta(spark, SMOKE_SF_DIR).collect()
    assert (r.n_a, r.n_b) == (len(xa), len(xb))
    assert abs(r.delta - delta) < 1e-6
    ad = abs(round(delta, 6))
    expect = (
        "negligible"
        if ad < CLIFF_SMALL
        else "small" if ad < CLIFF_MEDIUM else "medium" if ad < CLIFF_LARGE else "large"
    )
    assert r.magnitude == expect


def test_km_ci_matches_python_recompute(spark):
    """KM survival + Greenwood bands recomputed directly from the raw
    fixture; also pins the structural contracts — survival nonincreasing,
    bands bracket the estimate, bands clamped to [0, 1]."""
    from machinelearningalgomapreduce_spark.operators.inference import Z95, q_km_ci

    per_user = _survival_per_user(_events(spark))
    per_t: dict[int, list[int]] = {}
    for _, event, t_s in per_user:
        d = per_t.setdefault(t_s, [0, 0])
        d[0 if event else 1] += 1
    got = q_km_ci(spark, SMOKE_SF_DIR).orderBy("t_s").collect()
    assert [r.t_s for r in got] == sorted(per_t)
    n_risk = len(per_user)
    surv, gsum = 1.0, 0.0
    prev_surv = 1.0
    for r in got:
        d, c = per_t[r.t_s]
        assert (r.n_risk, r.n_events) == (n_risk, d)
        surv *= (n_risk - d) / n_risk
        if d < n_risk:
            gsum += d / (n_risk * (n_risk - d))
        se = surv * math.sqrt(gsum)
        assert abs(r.survival - surv) < 1e-6
        assert abs(r.se - se) < 1e-6
        assert abs(r.ci_lo - max(0.0, surv - Z95 * se)) < 1e-6
        assert abs(r.ci_hi - min(1.0, surv + Z95 * se)) < 1e-6
        assert r.ci_lo <= r.survival <= r.ci_hi
        assert 0.0 <= r.ci_lo and r.ci_hi <= 1.0
        assert r.survival <= prev_surv + 1e-12
        prev_surv = r.survival
        n_risk -= d + c


def test_rmst_matches_python_recompute(spark):
    """RMST as the literal step integral of the KM curve, plus the
    bound RMST ≤ τ and consistency with the q_km_ci survival values."""
    from machinelearningalgomapreduce_spark.operators.inference import q_rmst

    per_user = _survival_per_user(_events(spark))
    per_t: dict[int, list[int]] = {}
    for _, event, t_s in per_user:
        d = per_t.setdefault(t_s, [0, 0])
        d[0 if event else 1] += 1
    n_risk = len(per_user)
    surv, prev_t, rmst = 1.0, 0.0, 0.0
    for t in sorted(per_t):
        d, c = per_t[t]
        rmst += surv * (t - prev_t)
        surv *= (n_risk - d) / n_risk
        prev_t = t
        n_risk -= d + c
    [r] = q_rmst(spark, SMOKE_SF_DIR).collect()
    assert r.n_times == len(per_t)
    assert r.tau_s == max(per_t)
    assert abs(r.rmst_s - rmst) < 1e-4
    assert abs(r.s_tau - surv) < 1e-6
    assert 0.0 < r.rmst_s <= r.tau_s
