"""Semantic contracts for the round-9 distribution-shift tier
(q_wasserstein, q_hellinger, q_js_divergence): each result recomputed
from ground truth with independent pure-Python sweeps over the raw
fixture, against the TEXTBOOK formulas (not the operators' algebraic
rearrangements). The bit-exact oracle differential lives in
tools/check.py."""

from __future__ import annotations

import math
from collections import Counter

from tests.conftest import SMOKE_SF_DIR


def _ab_values(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import (
        KS_TYPE_A,
        KS_TYPE_B,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    rows = (
        load_tables(spark, SMOKE_SF_DIR)
        .events.filter(f"event_type in ('{KS_TYPE_A}', '{KS_TYPE_B}')")
        .select("event_type", "value")
        .collect()
    )
    a = [float(r.value) for r in rows if r.event_type == KS_TYPE_A]
    b = [float(r.value) for r in rows if r.event_type == KS_TYPE_B]
    return a, b


def test_wasserstein_matches_textbook_recompute(spark):
    """W1 via the sorted-ECDF integral — and it must also equal the dual
    'sorted quantile coupling' form when sample sizes allow a common
    refinement (here: checked against the integral form only, plus
    scale sanity: W1 of a distribution against itself is 0)."""
    from machinelearningalgomapreduce_spark.operators.evaluation import q_wasserstein

    a, b = _ab_values(spark)
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    ca = cb = 0
    cnt_a, cnt_b = Counter(a), Counter(b)
    w1 = 0.0
    for v, nxt in zip(values, values[1:]):
        ca += cnt_a[v]
        cb += cnt_b[v]
        w1 += abs(ca / na - cb / nb) * (nxt - v)
    [r] = q_wasserstein(spark, SMOKE_SF_DIR).collect()
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.w1 - w1) < 1e-6
    assert r.w1 > 0.0  # click and purchase values genuinely differ


def test_hellinger_matches_textbook_recompute(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import q_hellinger

    a, b = _ab_values(spark)
    na, nb = len(a), len(b)
    cnt_a, cnt_b = Counter(a), Counter(b)
    bc = sum(
        math.sqrt((cnt_a[v] / na) * (cnt_b[v] / nb))
        for v in set(cnt_a) | set(cnt_b)
    )
    h = math.sqrt(max(0.0, 1.0 - bc))
    [r] = q_hellinger(spark, SMOKE_SF_DIR).collect()
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.bhattacharyya - bc) < 1e-6
    assert abs(r.hellinger - h) < 1e-6
    assert 0.0 <= r.hellinger <= 1.0


def test_js_divergence_matches_textbook_recompute(spark):
    """JS recomputed with the LITERAL definition — full token union,
    explicit mixture m = (p+q)/2, including tokens absent from the
    source (p=0) — against the operator's algebraic in/out split."""
    from machinelearningalgomapreduce_spark.operators.text import q_js_divergence
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    docs = (
        load_tables(spark, SMOKE_SF_DIR)
        .documents.select("source", "text")
        .collect()
    )
    per_src: dict[str, Counter] = {}
    pool: Counter = Counter()
    for r in docs:
        toks = r.text.split(" ")
        per_src.setdefault(r.source, Counter()).update(toks)
        pool.update(toks)
    big_m = sum(pool.values())
    got = {r.source: (r.n_tokens, r.js, r.js_dist) for r in q_js_divergence(
        spark, SMOKE_SF_DIR
    ).collect()}
    assert set(got) == set(per_src)
    for src, cnt in per_src.items():
        n_s = sum(cnt.values())
        js = 0.0
        for tok, m in pool.items():
            p = cnt.get(tok, 0) / n_s
            q = m / big_m
            mm = (p + q) / 2.0
            if p > 0:
                js += 0.5 * p * math.log(p / mm)
            js += 0.5 * q * math.log(q / mm)
        gn, gjs, gdist = got[src]
        assert gn == n_s, src
        assert abs(gjs - js) < 1e-6, src
        assert 0.0 <= gjs <= math.log(2.0) + 1e-9, src
        assert abs(gdist - math.sqrt(js / math.log(2.0))) < 1e-6, src


def test_cramer_von_mises_matches_textbook_recompute(spark):
    """CvM via the literal pooled-sample definition: T = nm/(n+m)² ·
    Σ over every pooled OBSERVATION z of (F_A(z) − F_B(z))²."""
    from machinelearningalgomapreduce_spark.operators.evaluation import (
        q_cramer_von_mises,
    )

    a, b = _ab_values(spark)
    na, nb = len(a), len(b)
    pooled = sorted(a + b)
    sa, sb = sorted(a), sorted(b)
    import bisect

    t_sum = 0.0
    for z in pooled:
        fa = bisect.bisect_right(sa, z) / na
        fb = bisect.bisect_right(sb, z) / nb
        t_sum += (fa - fb) ** 2
    cvm = na * nb / (na + nb) ** 2 * t_sum
    [r] = q_cramer_von_mises(spark, SMOKE_SF_DIR).collect()
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.cvm - cvm) < 1e-6
    assert r.cvm > 0.0


def test_energy_distance_matches_bruteforce_pairwise(spark):
    """The prefix-sum identity vs the literal O(n·m) pairwise definition
    on cent-quantized values — D² must also dominate (2·W1-ish) zero and
    the distance must be positive for genuinely different cohorts."""
    from machinelearningalgomapreduce_spark.operators.evaluation import (
        q_energy_distance,
    )

    a, b = _ab_values(spark)
    ca = [math.floor(v * 100.0 + 0.5) for v in a]
    cb = [math.floor(v * 100.0 + 0.5) for v in b]
    na, nb = len(ca), len(cb)

    def pair_sum(xs, ys):
        # O((n+m) log) via sorting ys once (still the literal definition)
        ys_sorted = sorted(ys)
        import bisect

        pref = [0]
        for y in ys_sorted:
            pref.append(pref[-1] + y)
        tot = pref[-1]
        m = len(ys_sorted)
        s = 0
        for x in xs:
            k = bisect.bisect_right(ys_sorted, x)
            s += x * k - pref[k] + (tot - pref[k]) - x * (m - k)
        return s

    e2 = (
        2.0 * pair_sum(ca, cb) / (na * nb)
        - pair_sum(ca, ca) / (na * na)
        - pair_sum(cb, cb) / (nb * nb)
    ) / 100.0
    [r] = q_energy_distance(spark, SMOKE_SF_DIR).collect()
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.e2 - e2) < 1e-6
    assert abs(r.e_dist - math.sqrt(max(0.0, e2))) < 1e-6
    assert r.e2 > 0.0


def test_anderson_darling_matches_textbook_recompute(spark):
    """AD via the literal weighted-integral definition over pooled
    observations (weight 1/(H(1−H))), normalized so E[A²] ≈ 1 under H₀
    — the scale verified by simulation when the operator landed."""
    import bisect

    from machinelearningalgomapreduce_spark.operators.evaluation import (
        q_anderson_darling,
    )

    a, b = _ab_values(spark)
    na, nb = len(a), len(b)
    big_n = na + nb
    sa, sb = sorted(a), sorted(b)
    s = 0.0
    cnt = Counter(a + b)
    for v in sorted(cnt):
        ca = bisect.bisect_right(sa, v)
        cb = bisect.bisect_right(sb, v)
        k = ca + cb
        if k < big_n:
            d = ca * nb - cb * na
            s += cnt[v] * d * d / (k * (big_n - k))
    ad = s / (na * nb)
    [r] = q_anderson_darling(spark, SMOKE_SF_DIR).collect()
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.ad_stat - ad) < 1e-6
    # positive by construction; at the smoke tier the click/purchase
    # shift is mild, so no claim against the H0 mean of ~1
    assert r.ad_stat > 0.0


def test_two_sample_family_engine_parity_on_single_cohort(spark, tmp_path):
    """ADVICE-r8 defect class, closed proactively for the new family: a
    cohort with ZERO rows must not make the engines diverge (Spark
    non-ANSI division → NULL vs DuckDB IEEE → inf). Every two-sample
    query is run on a synthetic fixture containing ONLY clicks, on BOTH
    engines, and the results must agree cell-for-cell (NULL == NULL)."""
    import duckdb

    from machinelearningalgomapreduce_spark import registry
    from machinelearningalgomapreduce_spark.sources.catalog import TABLES, load_tables

    src = load_tables(spark, SMOKE_SF_DIR)
    out = tmp_path / "one_cohort"
    out.mkdir()
    for name in TABLES:
        df = src[name]
        if name == "events":
            df = df.filter("event_type = 'click'")
        else:
            df = df.limit(0)
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out}/{name}.parquet/*.parquet')"
        )

    queries = registry.queries()
    oracles = registry.oracle_sql()
    for qname in (
        "q_wasserstein",
        "q_hellinger",
        "q_cramer_von_mises",
        "q_anderson_darling",
        "q_energy_distance",
        "q_ks_test",
        "q_mannwhitney",
        "q_cliffs_delta",
        "q_cohens_d",
        "q_anova",
    ):
        sdf = queries[qname](spark, str(out))
        srows = sorted(
            tuple(None if v is None else round(float(v), 6) if isinstance(v, float) else v for v in r)
            for r in sdf.collect()
        )
        drows = sorted(
            tuple(None if v is None else round(float(v), 6) if isinstance(v, float) else v for v in r)
            for r in con.execute(oracles[qname]).fetchall()
        )
        assert srows == drows, (qname, srows, drows)
