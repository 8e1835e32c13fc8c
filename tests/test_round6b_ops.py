"""Semantic contracts for the round-6 deferred-window queries: each
oracle-checked integer/fixed-point form is cross-checked against its
float library twin or a mathematical invariant the SQL oracle cannot
express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF_DIR


def test_ppr_step_matches_float_library(spark):
    """The integer micro-unit PPR step ≈ one round of the float
    personalized_pagerank loop on the same seeds (within rounding of the
    two half_up sites)."""
    from machinelearningalgomapreduce_spark.operators.graph import (
        PPR_SEEDS, _sym_copurchase, personalized_pagerank, q_ppr_step,
    )

    sym = _sym_copurchase(spark, SMOKE_SF_DIR)
    seeds = [
        r["node"]
        for r in sym.select(F.col("src").alias("node")).distinct()
        .orderBy("node").limit(PPR_SEEDS).collect()
    ]
    fixed = {r["node"]: r["rank_micro"] for r in q_ppr_step(spark, SMOKE_SF_DIR).collect()}
    floatr = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(sym.selectExpr("src", "dst"), [str(s) for s in seeds], n_iter=1).collect()
        if r["node"] in {str(k) for k in fixed}
    }
    # personalized_pagerank casts nothing — node types differ (str vs int);
    # compare via string keys. Two half_up sites → ≤ 2 micro of drift per
    # edge contribution; allow 1e-3 absolute in rank units.
    assert fixed
    for node, micro in fixed.items():
        f = floatr.get(str(node))
        if f is not None:
            assert abs(micro / 1e6 - f) < 1e-3, (node, micro, f)


def test_modularity_matches_float_library(spark):
    from machinelearningalgomapreduce_spark.operators.graph import (
        _copurchase_edges, modularity, q_modularity,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    row = q_modularity(spark, SMOKE_SF_DIR).first()
    assert row["q_den"] == row["two_m"] * row["two_m"]
    t = load_tables(spark, SMOKE_SF_DIR)
    edges = _copurchase_edges(spark, SMOKE_SF_DIR)
    brand = t.part.select(F.col("p_partkey").alias("node"), F.col("p_brand").alias("comm"))
    q_float = modularity(edges.selectExpr("u", "v"), brand)
    assert abs(row["q_num"] / row["q_den"] - q_float) < 1e-9


def test_louvain_move_matches_float_library(spark):
    """Integer-scaled gains pick the same argmax communities as the float
    pass from singleton init (gains differ only by the exact 2m scale)."""
    from machinelearningalgomapreduce_spark.operators.graph import (
        _copurchase_edges, louvain_move_step, q_louvain_move,
    )

    got = {r["node"]: r["comm"] for r in q_louvain_move(spark, SMOKE_SF_DIR).collect()}
    edges = _copurchase_edges(spark, SMOKE_SF_DIR).selectExpr("u", "v")
    want = {r["node"]: r["comm"] for r in louvain_move_step(edges).collect()}
    assert got == want


def test_scc_pivot_matches_python_reference(spark):
    """Differential: rebuild the md5-oriented edge set in Python, run two
    BFS closures from the max-degree pivot, and assert the query returns
    EXACTLY fwd ∩ back — both membership directions verified."""
    import hashlib
    from collections import defaultdict, deque

    from machinelearningalgomapreduce_spark.operators.graph import (
        _repeat_copurchase_edges, q_scc_pivot,
    )

    got = {r["node"] for r in q_scc_pivot(spark, SMOKE_SF_DIR).collect()}
    edges = [
        (r["u"], r["v"])
        for r in _repeat_copurchase_edges(spark, SMOKE_SF_DIR).select("u", "v").collect()
    ]
    fwd_adj, back_adj, deg = defaultdict(list), defaultdict(list), defaultdict(int)
    for u, v in edges:
        even = hashlib.md5(f"dir:{u}:{v}".encode()).hexdigest()[0] in "01234567"
        s_, d_ = (u, v) if even else (v, u)
        fwd_adj[s_].append(d_)
        back_adj[d_].append(s_)
        deg[s_] += 1
        deg[d_] += 1
    pivot = max(deg, key=lambda n: (deg[n], -n))

    def closure(adj, seed):
        seen = {seed}
        q = deque([seed])
        while q:
            for nxt in adj[q.popleft()]:
                if nxt not in seen:
                    seen.add(nxt)
                    q.append(nxt)
        return seen

    want = closure(fwd_adj, pivot) & closure(back_adj, pivot)
    assert got == want


def test_levene_matches_float_library(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import (
        levene_test, q_levene,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    row = q_levene(spark, SMOKE_SF_DIR).first()
    t = load_tables(spark, SMOKE_SF_DIR)
    # Same data in float dollars: W is scale-invariant, cents are exact
    # (2-decimal prices), so the two agree to fp tolerance.
    ref = levene_test(
        t.lineitem.select("l_returnflag", "l_extendedprice"),
        "l_returnflag",
        "l_extendedprice",
    ).first()
    assert row["df1"] == ref["df1"] and row["df2"] == ref["df2"]
    assert abs(row["w_stat"] - ref["w_stat"]) < 1e-4


def test_grubbs_scores_positive_and_bounded(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import q_grubbs

    for r in q_grubbs(spark, SMOKE_SF_DIR).collect():
        # G ≤ (n−1)/√n — the attainable Grubbs maximum.
        assert 0.0 < r["g_stat"] <= (r["n"] - 1) / math.sqrt(r["n"]) + 1e-9


def test_decompose_matches_float_library_and_sums(spark):
    """Fixed-point micro columns ≈ the float decompose_series at ≤1 micro
    per rounding site, and additivity holds exactly by construction."""
    from machinelearningalgomapreduce_spark.operators.timeseries import (
        decompose_series, q_decompose,
    )

    fixed = q_decompose(spark, SMOKE_SF_DIR)
    bad = fixed.filter(
        F.col("y") * 1_000_000
        != F.col("trend_micro") + F.col("seasonal_micro") + F.col("residual_micro")
    )
    assert bad.isEmpty()
    f = {
        (r["event_type"], r["hour"]): r
        for r in decompose_series(spark, SMOKE_SF_DIR).collect()
    }
    for r in fixed.collect()[:200]:
        ref = f[(r["event_type"], r["hour"])]
        assert abs(r["trend_micro"] / 1e6 - ref["trend"]) < 2e-6
        assert abs(r["seasonal_micro"] / 1e6 - ref["seasonal"]) < 5e-6


def test_theil_sen_slope_within_pair_range(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import q_theil_sen

    rows = q_theil_sen(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2


def test_survival_curve_is_consistent(spark):
    from machinelearningalgomapreduce_spark.operators.behavior import q_survival_curve

    rows = sorted(q_survival_curve(spark, SMOKE_SF_DIR).collect(), key=lambda r: r["t_s"])
    assert rows
    # n_risk decreases by exactly the events+censored leaving each time.
    for a, b in zip(rows, rows[1:]):
        assert b["n_risk"] == a["n_risk"] - a["n_events"] - a["n_censored"]
        assert 0 <= a["hazard_micro"] <= 1_000_000


def test_rfm_segments_partition_customers(spark):
    from machinelearningalgomapreduce_spark.operators.behavior import q_rfm_segments
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    rows = q_rfm_segments(spark, SMOKE_SF_DIR).collect()
    n_cust = load_tables(spark, SMOKE_SF_DIR).orders.select("o_custkey").distinct().count()
    assert sum(r["n_cust"] for r in rows) == n_cust
    for r in rows:
        s = r["segment"]
        assert 1 <= s // 100 <= 5 and 1 <= s // 10 % 10 <= 5 and 1 <= s % 10 <= 5


def test_session_entropy_bounds(spark):
    from machinelearningalgomapreduce_spark.operators.behavior import q_session_entropy

    for r in q_session_entropy(spark, SMOKE_SF_DIR).collect():
        assert -1e-9 <= r["entropy"] <= math.log(r["n_types"]) + 1e-9


def test_rendezvous_assigns_every_document_once(spark):
    from machinelearningalgomapreduce_spark.operators.export import q_rendezvous
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    rows = q_rendezvous(spark, SMOKE_SF_DIR).collect()
    n_docs = load_tables(spark, SMOKE_SF_DIR).documents.count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_temperature_mix_matches_python_reference(spark):
    """w_s = √share_s / Σ √share — recomputed in pure Python from the
    same char counts (the library temperature_mix weights by tokens, so
    it is not the direct twin)."""
    from machinelearningalgomapreduce_spark.operators.export import q_temperature_mix

    rows = q_temperature_mix(spark, SMOKE_SF_DIR).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    total = sum(r["n_chars"] for r in rows)
    roots = {r["source"]: math.sqrt(r["n_chars"] / total) for r in rows}
    z = sum(roots[s] for s in sorted(roots))
    for r in rows:
        assert abs(r["weight"] - roots[r["source"]] / z) < 1e-6


def test_isotonic_bins_monotone_and_matches_mllib(spark):
    from machinelearningalgomapreduce_spark.operators.classifier import q_isotonic_bins

    rows = sorted(q_isotonic_bins(spark, SMOKE_SF_DIR).collect(), key=lambda r: r["bin"])
    fits = [r["fitted"] for r in rows]
    assert fits == sorted(fits), "PAV fit must be non-decreasing"
    for r in rows:
        assert 0.0 <= r["fitted"] <= 1.0
    # Weighted mean preservation: Σ n·fitted == Σ pos (PAV preserves the
    # total within each pooled block).
    assert abs(sum(r["n"] * r["fitted"] for r in rows) - sum(r["pos"] for r in rows)) < 1e-3

    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    binned = spark.createDataFrame(
        [(float(r["bin"]), float(r["pos"]) / r["n"], float(r["n"])) for r in rows],
        "bin double, rate double, w double",
    )
    data = VectorAssembler(inputCols=["bin"], outputCol="features").transform(binned)
    model = IsotonicRegression(
        featuresCol="features", labelCol="rate", weightCol="w"
    ).fit(data)
    preds = {
        r["bin"]: r["prediction"] for r in model.transform(data).collect()
    }
    for r in rows:
        assert abs(preds[float(r["bin"])] - r["fitted"]) < 1e-6


def test_kl_divergence_nonnegative(spark):
    from machinelearningalgomapreduce_spark.operators.text import q_kl_divergence

    for r in q_kl_divergence(spark, SMOKE_SF_DIR).collect():
        assert r["kl"] >= -1e-9


def test_hmm_score_matches_reference(spark):
    from machinelearningalgomapreduce_spark.operators.sequence import (
        hmm_loglik_reference, q_hmm_score, user_sequences,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    obs = {r["user_id"]: r["obs"] for r in user_sequences(t.events).collect()}
    for r in q_hmm_score(spark, SMOKE_SF_DIR).collect():
        assert r["n_obs"] == len(obs[r["user_id"]])
        assert abs(r["loglik"] - hmm_loglik_reference(obs[r["user_id"]])) < 1e-5


def test_running_share_ends_at_one(spark):
    from machinelearningalgomapreduce_spark.operators.relational import q_running_share

    rows = sorted(q_running_share(spark, SMOKE_SF_DIR).collect(), key=lambda r: r["cum_cents"])
    assert rows[-1]["cum_share"] == pytest.approx(1.0, abs=1e-9)
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)


def test_jl_projection_preserves_distances_loosely(spark):
    """JL with out_dim=4 is coarse — assert the projection is a linear
    isometry IN EXPECTATION by checking projected norms are within a wide
    band of original norms for most vectors (sanity, not the lemma)."""
    from machinelearningalgomapreduce_spark.operators.similarity import q_jl_project
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    proj = q_jl_project(spark, SMOKE_SF_DIR)
    joined = proj.join(t.embeddings, "vec_id").select(
        (F.col("p0") ** 2 + F.col("p1") ** 2 + F.col("p2") ** 2 + F.col("p3") ** 2).alias("pn"),
        F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        ).alias("on"),
    )
    frac_ok = joined.select(
        F.avg(((F.col("pn") > 0.05 * F.col("on")) & (F.col("pn") < 5.0 * F.col("on"))).cast("double"))
    ).first()[0]
    assert frac_ok > 0.6


def test_wilson_bounds_bracket_p_hat(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import q_wilson_ctr

    for r in q_wilson_ctr(spark, SMOKE_SF_DIR).collect():
        assert 0.0 <= r["wilson_lo"] <= r["p_hat"] <= r["wilson_hi"] <= 1.0


def test_benford_shares_and_chi2(spark):
    from machinelearningalgomapreduce_spark.operators.stats import q_benford

    rows = q_benford(spark, SMOKE_SF_DIR).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 2e-3 * len(rows)
    for r in rows:
        assert r["chi2_total"] >= r["chi2_contrib"] >= 0.0


def test_gap_fill_spine_is_dense_and_consistent(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import q_gap_fill

    rows = q_gap_fill(spark, SMOKE_SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["hour"])
        for a, b in zip(rs, rs[1:]):
            assert (b["hour"] - a["hour"]).total_seconds() == 3600, (et, a, b)
        for r in rs:
            if r["y"] is None:
                assert r["y_zero_fill"] == 0
            else:
                assert r["y_zero_fill"] == r["y"] == r["y_ffill"]


def test_bloom_no_false_negatives(spark):
    from machinelearningalgomapreduce_spark.operators.sketches import q_bloom_audit

    row = q_bloom_audit(spark, SMOKE_SF_DIR).first()
    assert row["n_false_neg"] == 0, "Bloom filters must never miss a member"
    assert row["n_present"] == row["n_actual"] + row["n_false_pos"]
    assert 0.0 <= row["fpr"] < 0.5


def test_skyline_is_pareto_frontier(spark):
    from machinelearningalgomapreduce_spark.operators.relational import q_skyline
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    sky = [(r["p_size"], r["price_cents"]) for r in q_skyline(spark, SMOKE_SF_DIR).collect()]
    assert sky
    t = load_tables(spark, SMOKE_SF_DIR)
    allp = [
        (r["p_size"], int(r["p_retailprice"] * 100 // 1))
        for r in t.part.collect()
    ]
    for s, p in sky:
        dominated = any(
            (s2 >= s and p2 <= p and (s2 > s or p2 < p)) for s2, p2 in allp
        )
        assert not dominated, (s, p)


def test_dedup_snm_agrees_with_minshingle_blocking(spark):
    """Pairs surfaced by BOTH blocking strategies must carry identical
    exact-Jaccard scores (the verify stage is shared semantics; only the
    candidate generators differ)."""
    from machinelearningalgomapreduce_spark.operators.dedup import (
        q_dedup_ngram_jaccard, q_dedup_snm,
    )

    snm = {
        tuple(sorted((r["doc_a"], r["doc_b"]))): r["jaccard"]
        for r in q_dedup_snm(spark, SMOKE_SF_DIR).collect()
    }
    for r in snm.values():
        assert r >= 0.5
    blocked = {
        tuple(sorted((r["doc_a"], r["doc_b"]))): r["bigram_jaccard"]
        for r in q_dedup_ngram_jaccard(spark, SMOKE_SF_DIR).collect()
    }
    both = set(snm) & set(blocked)
    for k in both:
        assert snm[k] == pytest.approx(blocked[k], abs=1e-6)


def test_acf_matches_python_reference(spark):
    """Differential: recompute the lag-L Pearson correlation of each
    type's hourly series in pure Python from the same events."""
    from collections import Counter

    from machinelearningalgomapreduce_spark.operators.timeseries import q_acf
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    got = {
        (r["event_type"], r["lag"]): (r["n_pairs"], r["acf"])
        for r in q_acf(spark, SMOKE_SF_DIR).collect()
    }
    assert got
    t = load_tables(spark, SMOKE_SF_DIR)
    rows = t.events.select("event_type", "ts").collect()
    series = Counter()
    for r in rows:
        hour = r["ts"].replace(minute=0, second=0, microsecond=0)
        series[(r["event_type"], hour)] += 1
    import datetime

    for (et, lag), (n_pairs, acf) in got.items():
        pairs = [
            (y, series[(et2, h - datetime.timedelta(hours=lag))])
            for (et2, h), y in series.items()
            if et2 == et and (et2, h - datetime.timedelta(hours=lag)) in series
        ]
        assert len(pairs) == n_pairs, (et, lag)
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
        want = (n * sxy - sx * sy) / den if den else None
        if want is None:
            assert acf is None
        else:
            assert acf == pytest.approx(want, abs=1e-5), (et, lag)


def test_mk_trend_s_in_pair_bounds(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import q_mk_trend

    for r in q_mk_trend(spark, SMOKE_SF_DIR).collect():
        n_pairs = r["n_days"] * (r["n_days"] - 1) // 2
        assert abs(r["s_stat"]) <= n_pairs
        assert r["var18"] >= 0


def test_runs_test_consistency(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import q_runs_test

    for r in q_runs_test(spark, SMOKE_SF_DIR).collect():
        # runs bounded by the classification sizes; each class nonempty
        # implies at least... runs in [1, n1+n2]; |n1-n2| small by median.
        assert 1 <= r["runs"] <= r["n1"] + r["n2"]
        assert min(r["n1"], r["n2"]) >= 0


def test_dedup_edit_agrees_with_python_levenshtein(spark):
    """Spot-verify the engine Levenshtein against a pure-Python DP on the
    actual surfaced pairs (bounded prefixes)."""
    from machinelearningalgomapreduce_spark.operators.dedup import (
        EDIT_PREFIX_CHARS, q_dedup_edit,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = q_dedup_edit(spark, SMOKE_SF_DIR).collect()
    assert rows
    texts = {
        r["doc_id"]: r["text"][:EDIT_PREFIX_CHARS]
        for r in load_tables(spark, SMOKE_SF_DIR).documents.collect()
    }
    for r in rows[:10]:
        assert r["edit_dist"] == lev(texts[r["doc_a"]], texts[r["doc_b"]])


def test_attribution_linear_credit_conserves(spark):
    """Total credit across touch types == 10⁶ per purchase (within the
    half-up rounding of the per-purchase splits)."""
    from machinelearningalgomapreduce_spark.operators.events import q_attribution_linear

    rows = q_attribution_linear(spark, SMOKE_SF_DIR).collect()
    assert rows
    n_purch = rows[0]["n_purchases"]
    total = sum(r["credit_micro"] for r in rows)
    # each purchase contributes 1e6 ± ≤2 micro of half-up drift over ≤4 types
    assert abs(total - n_purch * 1_000_000) <= 2 * n_purch


def test_srm_check_counts(spark):
    from machinelearningalgomapreduce_spark.operators.export import q_srm_check
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    row = q_srm_check(spark, SMOKE_SF_DIR).first()
    assert row["n"] == load_tables(spark, SMOKE_SF_DIR).documents.count()
    assert row["n_train"] + row["n_test"] == row["n"]
    assert row["chi2"] >= 0.0


def test_rolling_p90_bounds(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import q_rolling_p90

    for r in q_rolling_p90(spark, SMOKE_SF_DIR).collect():
        assert 1 <= r["n_window"] <= 24
        assert r["p90_24h"] >= 0.0


def test_vocab_drift_rho_in_range(spark):
    from machinelearningalgomapreduce_spark.operators.text import q_vocab_drift

    rows = q_vocab_drift(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r["rho"] <= 1.0 + 1e-9
        assert r["sum_d2"] >= 0


def test_cramers_v_in_unit_range(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import q_cramers_v

    row = q_cramers_v(spark, SMOKE_SF_DIR).first()
    assert 0.0 <= row["cramers_v"] <= 1.0
    assert row["chi2"] >= 0.0


def test_audience_overlap_bounds(spark):
    from machinelearningalgomapreduce_spark.operators.behavior import q_audience_overlap

    rows = q_audience_overlap(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["type_a"] < r["type_b"]


def test_cohort_ltv_cumulative_monotone(spark):
    from machinelearningalgomapreduce_spark.operators.behavior import q_cohort_ltv

    by_cohort = {}
    for r in q_cohort_ltv(spark, SMOKE_SF_DIR).collect():
        by_cohort.setdefault(r["cohort_month"], []).append(r)
    assert by_cohort
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r["month_age"])
        run = 0
        for r in rs:
            run += r["rev_cents"]
            assert r["cum_rev_cents"] == run


def test_churn_rate_partitions_users(spark):
    from machinelearningalgomapreduce_spark.operators.behavior import q_churn_rate
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    rows = q_churn_rate(spark, SMOKE_SF_DIR).collect()
    n_users = load_tables(spark, SMOKE_SF_DIR).events.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 0 <= r["n_churned"] <= r["n_users"]


def test_bpe_encode_matches_python_scan_and_roundtrips(spark):
    """The JVM fold application ≡ the trainer's left-greedy Python scan
    on every token, and concat(symbols) == word (lossless)."""
    from machinelearningalgomapreduce_spark.operators.export import (
        bpe_encode, bpe_merge_table,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    merges = [p for p, _ in bpe_merge_table(spark, SMOKE_SF_DIR, 8)]
    t = load_tables(spark, SMOKE_SF_DIR)
    rows = bpe_encode(t.documents.limit(20), "text", merges).collect()
    assert rows

    def apply(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for r in rows:
        assert r["encoded"].replace(" ", "") == r["word"]
        assert r["encoded"].split(" ") == apply(r["word"]), r["word"]
        assert r["n_symbols"] <= len(r["word"])


def test_hmm_smooth_matches_python_reference(spark):
    """Posterior marginals: p_map in (1/K, 1], positions complete, and a
    pure-Python forward-backward agrees on the argmax state and its
    probability for a sample of users."""
    from machinelearningalgomapreduce_spark.operators.sequence import (
        HMM_EMIT, HMM_INIT, HMM_STATES, HMM_TRANS, HMM_TYPES,
        hmm_smooth, user_sequences,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    rows = hmm_smooth(t.events).collect()
    assert rows
    by_user = {}
    for r in rows:
        assert 1.0 / HMM_STATES - 1e-9 <= r["p_map"] <= 1.0 + 1e-9
        by_user.setdefault(r["user_id"], []).append(r)
    obs = {r["user_id"]: r["obs"] for r in user_sequences(t.events).collect()}

    def fb(seq):
        sym = {s: j for j, s in enumerate(HMM_TYPES)}
        o = [sym[x] for x in seq]
        n, k = len(o), HMM_STATES
        alpha = [[HMM_INIT[i] * HMM_EMIT[i][o[0]] for i in range(k)]]
        c0 = sum(alpha[0]); alpha[0] = [x / c0 for x in alpha[0]]; scales = [c0]
        for t_ in range(1, n):
            raw = [
                sum(alpha[-1][i] * HMM_TRANS[i][j] for i in range(k)) * HMM_EMIT[j][o[t_]]
                for j in range(k)
            ]
            c = sum(raw); scales.append(c)
            alpha.append([x / c for x in raw])
        beta = [[1.0] * k for _ in range(n)]
        for t_ in range(n - 2, -1, -1):
            beta[t_] = [
                sum(HMM_TRANS[i][j] * HMM_EMIT[j][o[t_ + 1]] * beta[t_ + 1][j] for j in range(k))
                / scales[t_ + 1]
                for i in range(k)
            ]
        out = []
        for t_ in range(n):
            g = [alpha[t_][i] * beta[t_][i] for i in range(k)]
            z = sum(g); g = [x / z for x in g]
            m = max(range(k), key=lambda i: g[i])
            out.append((m, g[m]))
        return out

    for uid in list(by_user)[:5]:
        rs = sorted(by_user[uid], key=lambda r: r["pos"])
        assert len(rs) == len(obs[uid])
        ref = fb(obs[uid])
        for r, (m, p) in zip(rs, ref):
            assert r["map_state"] == m
            assert r["p_map"] == pytest.approx(p, abs=1e-9)


def test_pacf_from_acf_known_ar1():
    """For an AR(1) process acf(k) = phi^k, the true PACF is phi at lag 1
    and 0 beyond — Durbin-Levinson must recover that exactly."""
    from machinelearningalgomapreduce_spark.operators.timeseries import pacf_from_acf

    phi = 0.6
    acf = [phi ** k for k in range(1, 9)]
    pacf = pacf_from_acf(acf)
    assert pacf[0] == pytest.approx(phi, abs=1e-12)
    for v in pacf[1:]:
        assert v == pytest.approx(0.0, abs=1e-12)


def test_pacf_on_fixture_acf(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import (
        pacf_from_acf, q_acf,
    )

    by_type = {}
    for r in q_acf(spark, SMOKE_SF_DIR).collect():
        by_type.setdefault(r["event_type"], {})[r["lag"]] = r["acf"]
    assert by_type
    for et, lagmap in by_type.items():
        acf = [lagmap[k] for k in sorted(lagmap) if lagmap[k] is not None]
        pacf = pacf_from_acf(acf)
        assert len(pacf) == len(acf)
        assert pacf[0] == pytest.approx(acf[0], abs=1e-12)


def test_hhi_bounds(spark):
    from machinelearningalgomapreduce_spark.operators.stats import q_hhi

    for r in q_hhi(spark, SMOKE_SF_DIR).collect():
        # HHI ∈ (10000/n, 10000]: equality at monopoly, floor at equal shares.
        assert 10000.0 / r["n_suppliers"] - 1e-6 <= r["hhi"] <= 10000.0 + 1e-6


def test_theil_nonnegative_and_zero_on_equal(spark):
    from machinelearningalgomapreduce_spark.operators.stats import q_theil_index

    row = q_theil_index(spark, SMOKE_SF_DIR).first()
    assert row["theil_t"] >= -1e-6
    # Equal incomes → T = 0 (pure-Python sanity on the identity).
    import math
    xs = [500] * 10
    X, n = sum(xs), len(xs)
    t = sum(x * math.log(x) for x in xs) / X - math.log(X / n)
    assert abs(t) < 1e-12
