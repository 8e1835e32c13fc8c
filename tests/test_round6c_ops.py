"""Semantic contracts for the session-4 tranche: every oracle-checked
query is additionally cross-checked against a Python recomputation or a
mathematical invariant the SQL oracle cannot express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF_DIR


def test_kendall_tau_matches_python_contingency(spark):
    """τ-b recomputed in Python from the same contingency table."""
    from machinelearningalgomapreduce_spark.operators.evaluation import q_kendall_tau
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    row = q_kendall_tau(spark, SMOKE_SF_DIR).first()
    t = load_tables(spark, SMOKE_SF_DIR)
    cells = [
        (r["q"], r["l"], r["n"])
        for r in t.lineitem.groupBy(
            F.col("l_quantity").cast("bigint").alias("q"),
            F.col("l_linenumber").cast("bigint").alias("l"),
        ).agg(F.count("*").alias("n")).collect()
    ]
    c = d = 0
    for qa, la, na in cells:
        for qb, lb, nb in cells:
            if qa < qb and la < lb:
                c += na * nb
            elif qa < qb and la > lb:
                d += na * nb
    n = sum(x[2] for x in cells)
    tq: dict[int, int] = {}
    tl: dict[int, int] = {}
    for q, l, nc in cells:
        tq[q] = tq.get(q, 0) + nc
        tl[l] = tl.get(l, 0) + nc
    n0 = n * (n - 1) / 2
    tx = sum(v * (v - 1) / 2 for v in tq.values())
    ty = sum(v * (v - 1) / 2 for v in tl.values())
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    assert row["n"] == n and row["c_pairs"] == c and row["d_pairs"] == d
    assert abs(row["tau_b_micro"] / 1e6 - tau) < 2e-6
    assert -1_000_000 <= row["tau_b_micro"] <= 1_000_000


def test_jarque_bera_matches_python_moments(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import q_jarque_bera
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    rows = {r["l_returnflag"]: r for r in q_jarque_bera(spark, SMOKE_SF_DIR).collect()}
    t = load_tables(spark, SMOKE_SF_DIR)
    vals: dict[str, list[int]] = {}
    for r in t.lineitem.select("l_returnflag", "l_quantity").collect():
        vals.setdefault(r["l_returnflag"], []).append(int(r["l_quantity"]))
    assert set(rows) == set(vals)
    for flag, v in vals.items():
        n = len(v)
        mu = sum(v) / n
        m2 = sum((x - mu) ** 2 for x in v) / n
        m3 = sum((x - mu) ** 3 for x in v) / n
        m4 = sum((x - mu) ** 4 for x in v) / n
        skew = m3 / (m2 * math.sqrt(m2))
        kurt = m4 / (m2 * m2)
        jb = n / 6.0 * (skew**2 + (kurt - 3.0) ** 2 / 4.0)
        r = rows[flag]
        assert r["n"] == n
        assert abs(r["skew_micro"] / 1e6 - skew) < 2e-5, flag
        assert abs(r["kurt_micro"] / 1e6 - kurt) < 2e-5, flag
        assert abs(r["jb_micro"] / 1e6 - jb) / max(jb, 1.0) < 1e-4, flag


def test_cohens_kappa_matches_python(spark):
    from machinelearningalgomapreduce_spark.operators.evaluation import q_cohens_kappa
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    row = q_cohens_kappa(spark, SMOKE_SF_DIR).first()
    t = load_tables(spark, SMOKE_SF_DIR)
    n11 = n10 = n01 = n00 = 0
    for r in t.lineitem.select("l_quantity", "l_discount").collect():
        a = r["l_quantity"] > 25
        b = r["l_discount"] > 0.05
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    n = n11 + n10 + n01 + n00
    e = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
    kappa = (n * (n11 + n00) - e) / (n * n - e)
    assert (row["n11"], row["n10"], row["n01"], row["n00"]) == (n11, n10, n01, n00)
    assert abs(row["kappa_micro"] / 1e6 - kappa) < 2e-6
    # κ is chance-corrected: must be strictly below raw agreement.
    assert row["kappa_micro"] / 1e6 < (n11 + n00) / n


def test_mcc_matches_python(spark):
    from machinelearningalgomapreduce_spark.operators.classifier import _scored, q_mcc

    row = q_mcc(spark, SMOKE_SF_DIR).first()
    tp = fp = fn = tn = 0
    for r in _scored(spark, SMOKE_SF_DIR).collect():
        pred = r["score"] >= 0.0
        if pred and r["pos"]:
            tp += 1
        elif pred:
            fp += 1
        elif r["pos"]:
            fn += 1
        else:
            tn += 1
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert abs(row["mcc_micro"] / 1e6 - mcc) < 2e-6


def test_prefix_dup_groups_share_prefix(spark):
    """Every reported group genuinely shares its first-12-token prefix,
    and group sizes sum to the number of docs in duplicated prefixes."""
    from machinelearningalgomapreduce_spark.operators.text import q_prefix_dup
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    out = q_prefix_dup(spark, SMOKE_SF_DIR).collect()
    t = load_tables(spark, SMOKE_SF_DIR)
    prefixes: dict[str, list[int]] = {}
    for r in t.documents.select("doc_id", "text").collect():
        p = " ".join(r["text"].split(" ")[:12])
        prefixes.setdefault(p, []).append(r["doc_id"])
    dup_sizes = sorted(len(v) for v in prefixes.values() if len(v) >= 2)
    assert sorted(r["n_docs"] for r in out) == dup_sizes
    exemplars = {min(v) for v in prefixes.values() if len(v) >= 2}
    assert {r["exemplar_doc"] for r in out} == exemplars


def test_gopher_rules_match_python(spark):
    from machinelearningalgomapreduce_spark.operators.text import (
        GOPHER_MEAN_LEN_HI,
        GOPHER_MEAN_LEN_LO,
        GOPHER_MIN_WORDS,
        q_gopher_rules,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    rows = {r["rule"]: r for r in q_gopher_rules(spark, SMOKE_SF_DIR).collect()}
    t = load_tables(spark, SMOKE_SF_DIR)
    fails = {"too_short": 0, "mean_word_len": 0, "no_stopword": 0, "low_diversity": 0}
    n_docs = 0
    for r in t.documents.select("text").collect():
        words = r["text"].split(" ")
        n_docs += 1
        nw = len(words)
        sl = sum(len(w) for w in words)
        if nw < GOPHER_MIN_WORDS:
            fails["too_short"] += 1
        if not (GOPHER_MEAN_LEN_LO * nw <= sl <= GOPHER_MEAN_LEN_HI * nw):
            fails["mean_word_len"] += 1
        if words.count("the") == 0:
            fails["no_stopword"] += 1
        if 5 * len(set(words)) < 3 * nw:
            fails["low_diversity"] += 1
    assert set(rows) == set(fails)
    for rule, n_fail in fails.items():
        assert rows[rule]["n_fail"] == n_fail, rule
        assert rows[rule]["n_docs"] == n_docs


def test_dau_wau_bounds(spark):
    """1 ≤ stickiness·n_days/1e6 ≤ n_days (each weekly active shows up on
    1..n_days days), n_days ≤ 7, and sum_dau is consistent."""
    from machinelearningalgomapreduce_spark.operators.behavior import q_dau_wau

    rows = q_dau_wau(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_days"] <= 7
        assert r["wau"] <= r["sum_dau"] <= r["n_days"] * r["wau"]
        lo = 1_000_000 // (r["n_days"])
        assert lo - 1 <= r["stickiness_micro"] <= 1_000_000


def test_max_drawdown_matches_python(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import q_max_drawdown
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    out = {r["n_name"]: r for r in q_max_drawdown(spark, SMOKE_SF_DIR).collect()}
    t = load_tables(spark, SMOKE_SF_DIR)
    daily: dict[str, dict] = {}
    rows = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.date_trunc("day", "o_orderdate").alias("day"), "o_totalprice")
        .collect()
    )
    for r in rows:
        cents = round(r["o_totalprice"] * 100)
        daily.setdefault(r["n_name"], {}).setdefault(r["day"], 0)
        daily[r["n_name"]][r["day"]] += cents
    for nat, series in daily.items():
        cum = peak = 0
        dd = 0
        for day in sorted(series):
            cum += series[day]
            peak = max(peak, cum)
            dd = max(dd, peak - cum)
        assert out[nat]["max_dd_cents"] == dd, nat
        assert out[nat]["n_days"] == len(series), nat


def test_bollinger_matches_python(spark):
    from machinelearningalgomapreduce_spark.operators.timeseries import q_bollinger
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    out = {
        (r["o_orderpriority"], r["day"]): r
        for r in q_bollinger(spark, SMOKE_SF_DIR).collect()
    }
    t = load_tables(spark, SMOKE_SF_DIR)
    daily: dict[str, dict] = {}
    for r in (
        t.orders.select(
            "o_orderpriority", F.date_trunc("day", "o_orderdate").alias("day"), "o_totalprice"
        ).collect()
    ):
        daily.setdefault(r["o_orderpriority"], {}).setdefault(r["day"], 0)
        daily[r["o_orderpriority"]][r["day"]] += round(r["o_totalprice"] * 100)
    n_checked = 0
    for prio, series in daily.items():
        days = sorted(series)
        for i in range(6, len(days)):
            window = [series[d] for d in days[i - 6 : i + 1]]
            x = series[days[i]]
            s, q = sum(window), sum(v * v for v in window)
            lhs = (7 * x - s) ** 2
            rhs = 4 * (7 * q - s * s)
            expect = (1 if 7 * x - s > 0 else -1) if lhs > rhs else 0
            r = out[(prio, days[i])]
            assert r["breakout"] == expect and r["s7"] == s, (prio, days[i])
            n_checked += 1
    assert n_checked == len(out)


def test_late_shippers_bounded_by_multi_supplier_orders(spark):
    from machinelearningalgomapreduce_spark.operators.tpch import q_late_shippers
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    out = q_late_shippers(spark, SMOKE_SF_DIR).collect()
    t = load_tables(spark, SMOKE_SF_DIR)
    multi = (
        t.lineitem.select("l_orderkey", "l_suppkey").distinct()
        .groupBy("l_orderkey").agg(F.count("*").alias("k"))
        .filter(F.col("k") >= 2)
        .count()
    )
    assert out and sum(r["numwait"] for r in out) <= multi
    # descending by numwait with name tie-break
    pairs = [(r["numwait"], r["s_name"]) for r in out]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_profit_by_nation_profit_identity(spark):
    """sum_profit equals revenue − cost recomputed per (nation, year)."""
    from machinelearningalgomapreduce_spark.operators.tpch import q_profit_by_nation
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    out = q_profit_by_nation(spark, SMOKE_SF_DIR).collect()
    t = load_tables(spark, SMOKE_SF_DIR)
    joined = (
        t.lineitem.join(
            t.part.filter(F.col("p_name").like("%widget%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("y"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("p"),
        )
        .collect()
    )
    acc: dict[tuple, float] = {}
    for r in joined:
        acc[(r["nation"], r["y"])] = acc.get((r["nation"], r["y"]), 0.0) + r["p"]
    assert len(out) == len(acc)
    for r in out:
        assert abs(r["sum_profit"] - acc[(r["nation"], r["o_year"])]) < 0.02


def test_pq_codes_match_brute_nearest_pattern(spark):
    """Codes equal the brute nearest of the four explicit 16-dim patterns,
    and dist_micro is the true squared distance to the chosen pattern."""
    from machinelearningalgomapreduce_spark.operators.similarity import (
        PQ_M, PQ_SUB_DIM, q_pq_codes,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    out = {
        (r["vec_id"], r["sub"]): r
        for r in q_pq_codes(spark, SMOKE_SF_DIR).collect()
    }
    t = load_tables(spark, SMOKE_SF_DIR)
    pats = [
        [0.5] * PQ_SUB_DIM,
        [-0.5] * PQ_SUB_DIM,
        [0.5 * (1 - 2 * (d % 2)) for d in range(PQ_SUB_DIM)],
        [-0.5 * (1 - 2 * (d % 2)) for d in range(PQ_SUB_DIM)],
    ]
    vecs = t.embeddings.select("vec_id", "embedding").limit(50).collect()
    for r in vecs:
        emb = [float(x) for x in r["embedding"]]
        for sub in range(PQ_M):
            xs = emb[sub * PQ_SUB_DIM : (sub + 1) * PQ_SUB_DIM]
            dists = [sum((x - c) ** 2 for x, c in zip(xs, p)) for p in pats]
            best = min(range(4), key=lambda i: (dists[i], i))
            got = out[(r["vec_id"], sub)]
            assert got["code"] == best, (r["vec_id"], sub, dists)
            # dist_micro reflects the (round-6 quantized) true distance.
            assert abs(got["dist_micro"] / 1e6 - dists[best]) < 5e-4


def test_bootstrap_ci_brackets_observed_mean(spark):
    """The 95% bootstrap CI contains the observed mean for every type
    (B=50, Poisson weights ≈ resampling), and lo ≤ hi strictly ordered."""
    from machinelearningalgomapreduce_spark.operators.evaluation import q_bootstrap_ci
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    out = {r["event_type"]: r for r in q_bootstrap_ci(spark, SMOKE_SF_DIR).collect()}
    t = load_tables(spark, SMOKE_SF_DIR)
    obs: dict[str, list[int]] = {}
    for r in t.events.select("event_type", "value").collect():
        obs.setdefault(r["event_type"], []).append(round(r["value"] * 100))
    assert set(out) == set(obs)
    for typ, cents in obs.items():
        r = out[typ]
        assert r["n_reps"] == 50
        assert r["ci_lo_micro"] <= r["ci_hi_micro"]
        mean_micro = sum(cents) / len(cents) * 10000
        assert r["ci_lo_micro"] - 5e5 < mean_micro < r["ci_hi_micro"] + 5e5, typ


def test_density_ratio_matches_brute_python(spark):
    from machinelearningalgomapreduce_spark.operators.classicml import (
        DBSCAN_EPS, q_density_ratio,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    out = {r["vec_id"]: r for r in q_density_ratio(spark, SMOKE_SF_DIR).collect()}
    t = load_tables(spark, SMOKE_SF_DIR)
    pts = [
        (r["vec_id"], float(r["embedding"][0]), float(r["embedding"][1]))
        for r in t.embeddings.select("vec_id", "embedding").collect()
    ]
    eps2 = DBSCAN_EPS * DBSCAN_EPS
    nbrs = {
        i: [j for j, xj, yj in pts if (xi - xj) ** 2 + (yi - yj) ** 2 <= eps2]
        for i, xi, yi in pts
    }
    cnt = {i: len(v) for i, v in nbrs.items()}
    assert set(out) == set(cnt)
    for i, members in nbrs.items():
        s = sum(cnt[j] for j in members)
        r = out[i]
        assert r["cnt"] == cnt[i] and r["n_nbrs"] == len(members)
        ratio = cnt[i] * len(members) / s
        assert abs(r["ratio_micro"] / 1e6 - ratio) < 2e-6
        assert r["is_outlier"] == int(2 * cnt[i] * len(members) < s)


def test_calinski_matches_python(spark):
    from machinelearningalgomapreduce_spark.operators.similarity import q_calinski
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    row = q_calinski(spark, SMOKE_SF_DIR).first()
    t = load_tables(spark, SMOKE_SF_DIR)
    by_label: dict[int, list[list[float]]] = {}
    for r in t.embeddings.select("label", "embedding").collect():
        by_label.setdefault(r["label"], []).append([float(x) for x in r["embedding"]])
    n = sum(len(v) for v in by_label.values())
    k = len(by_label)
    dim = len(next(iter(by_label.values()))[0])
    gmean = [
        sum(v[d] for vs in by_label.values() for v in vs) / n for d in range(dim)
    ]
    w = b = 0.0
    for vs in by_label.values():
        mu = [sum(v[d] for v in vs) / len(vs) for d in range(dim)]
        w += sum(sum((v[d] - mu[d]) ** 2 for d in range(dim)) for v in vs)
        b += len(vs) * sum((mu[d] - gmean[d]) ** 2 for d in range(dim))
    ch = (b / (k - 1)) / (w / (n - k))
    assert row["n"] == n and row["k"] == k
    assert abs(row["within_scatter"] - w) / w < 1e-4
    assert abs(row["between_scatter"] - b) / max(b, 1e-9) < 1e-3
    assert abs(row["ch_micro"] / 1e6 - ch) / ch < 1e-3


def test_pq_fit_error_non_increasing_and_beats_fixed(spark):
    """Keyed-kmeans PQ training: quantization error is monotonically
    non-increasing per iteration, codebooks have the full (sub, code)
    grid, and the learned encoder beats the fixed-pattern q_pq_codes
    codebook on total error."""
    from machinelearningalgomapreduce_spark.operators.similarity import (
        PQ_M, pq_assign, pq_fit, _pq_subvectors, q_pq_codes,
    )

    cents, errors = pq_fit(spark, SMOKE_SF_DIR, k=4, n_iter=3)
    assert len(errors) == 3
    for a, b in zip(errors, errors[1:]):
        assert b <= a + 1e-6
    rows = cents.collect()
    assert {(r["sub"], r["code"]) for r in rows} == {
        (s, c) for s in range(PQ_M) for c in range(4)
    }
    learned = pq_assign(_pq_subvectors(spark, SMOKE_SF_DIR), cents)
    learned_err = learned.agg(F.sum("d2")).first()[0]
    fixed_err = (
        q_pq_codes(spark, SMOKE_SF_DIR).agg(F.sum("dist_micro")).first()[0] / 1e6
    )
    assert learned_err < fixed_err


def test_audio_features_payload_corruption_detected(spark):
    """decode_pcm is byte-faithful: flipping one byte in the data section
    changes the decoded samples, and features match a direct synthesis."""
    from machinelearningalgomapreduce_spark.multimodal.pipeline import (
        decode_pcm, encode_wav, q_audio_features,
    )

    payload = encode_wav(1, 8000, 32, seed=7)
    s = decode_pcm(payload)
    assert s == [((7 * 13 + i) % 65536) - 32768 for i in range(32)]
    corrupted = payload[:50] + bytes([payload[50] ^ 0xFF]) + payload[51:]
    assert decode_pcm(corrupted) != s
    out = q_audio_features(spark, SMOKE_SF_DIR).limit(20).collect()
    for r in out:
        d = r["doc_id"]
        n = 64 + d % 64
        samples = [((d * 13 + i) % 65536) - 32768 for i in range(n)]
        assert r["n_samples"] == n
        assert r["sum_sq"] == sum(x * x for x in samples)
        assert r["peak"] == max(abs(x) for x in samples)
        assert r["zero_cross"] == sum(
            1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0)
        )
