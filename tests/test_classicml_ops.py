"""Semantic-invariant and plan-shape tests for the classic-ML kernel
additions (operators/classicml.py). The bit-exact oracle differential
lives in tools/check.py; these assert what a hash comparison can't:
algebraic invariants (weights normalize, |ρ| ≤ 1, MI ≥ 0), agreement
with independent pure-Python reimplementations on the smoke fixture, and
the 100 TB plan shapes (grid-blocked DBSCAN, broadcast model state)."""

from __future__ import annotations

import math

import pytest

from machinelearningalgomapreduce_spark import registry
from machinelearningalgomapreduce_spark.operators import classicml as C
from machinelearningalgomapreduce_spark.plans import inspect as P
from machinelearningalgomapreduce_spark.sources.catalog import load_tables


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


# ----------------------------------------------------------- linear models


def test_perceptron_update_consistency(spark, sf_dir, queries):
    rows = queries["q_perceptron_step"](spark, sf_dir).collect()
    assert len(rows) == 64
    n_mis = {r.n_mis for r in rows}
    assert len(n_mis) == 1 and n_mis.pop() > 0
    for r in rows:
        assert abs(r.w_new - (C.PERC_W0 + r.delta)) < 1e-9


def test_adaboost_weights_normalize(spark, sf_dir, queries):
    rows = {r.is_correct: r for r in queries["q_adaboost_round"](spark, sf_dir).collect()}
    assert set(rows) == {True, False}
    total = sum(r.n_rows * r.w_new for r in rows.values())
    assert abs(total - 1.0) < 1e-6
    # Misclassified rows must gain weight relative to correct ones when ε < ½.
    eps = rows[True].eps
    assert 0.0 < eps < 1.0
    if eps < 0.5:
        assert rows[False].w_new > rows[True].w_new


def test_ridge_shrinks_toward_zero_vs_ols(spark, sf_dir, queries):
    import pandas as pd

    t = load_tables(spark, sf_dir)
    pdf = t.lineitem.select("l_linestatus", "l_quantity", "l_extendedprice").toPandas()
    out = {r.l_linestatus: r for r in queries["q_ridge_fit"](spark, sf_dir).collect()}
    for status, grp in pdf.groupby("l_linestatus"):
        x, y = grp["l_quantity"], grp["l_extendedprice"]
        ols = ((x * y).mean() - x.mean() * y.mean()) / ((x * x).mean() - x.mean() ** 2)
        got = out[status].slope_ridge
        assert abs(got) <= abs(ols) + 1e-9, (status, got, ols)
        assert got == pytest.approx(ols, rel=0.05)  # λ/n is tiny here


def test_gbt_stump_matches_numpy_sse(spark, sf_dir, queries):
    import numpy as np

    t = load_tables(spark, sf_dir)
    pdf = t.lineitem.select("l_quantity", "l_extendedprice").toPandas()
    rows = {r.thr: r for r in queries["q_gbt_stump"](spark, sf_dir).collect()}
    assert set(rows) == set(C.GBT_THRESHOLDS)
    for thr, r in rows.items():
        left = pdf[pdf.l_extendedprice <= thr]["l_quantity"].to_numpy()
        right = pdf[pdf.l_extendedprice > thr]["l_quantity"].to_numpy()
        assert r.n_l == len(left) and r.n_r == len(right)
        want = 0.0
        for side in (left, right):
            if len(side):
                want += float(((side - side.mean()) ** 2).sum())
        assert r.sse_e4 == pytest.approx(want * 10000.0, abs=5100.0)  # fixed-point e4


# ----------------------------------------------------------- link analysis


def test_hits_l2_normalized(spark, sf_dir, queries):
    rows = queries["q_hits_step"](spark, sf_dir).collect()
    assert rows and all(r.auth > 0 for r in rows)
    assert sum((r.auth_norm_micro / 1e6) ** 2 for r in rows) == pytest.approx(1.0, abs=1e-3)


def test_power_iter_l2_normalized_and_positive(spark, sf_dir, queries):
    rows = queries["q_power_iter"](spark, sf_dir).collect()
    assert rows and all(r.v2 > 0 for r in rows)
    assert sum((r.v2_norm_micro / 1e6) ** 2 for r in rows) == pytest.approx(1.0, abs=1e-3)


# ------------------------------------------------- DBSCAN / CF / baseline


def test_dbscan_core_matches_bruteforce(spark, sf_dir, queries):
    t = load_tables(spark, sf_dir)
    pts = [
        (r.vec_id, float(r.embedding[0]), float(r.embedding[1]))
        for r in t.embeddings.select("vec_id", "embedding").collect()
    ]
    eps2 = C.DBSCAN_EPS * C.DBSCAN_EPS
    want = {}
    for pid, px, py in pts:
        n = sum(1 for _, qx, qy in pts if (px - qx) ** 2 + (py - qy) ** 2 <= eps2)
        if n >= C.DBSCAN_MINPTS:
            want[pid] = n
    got = {r.vec_id: r.n_nbrs for r in queries["q_dbscan_core"](spark, sf_dir).collect()}
    assert got == want


def test_dbscan_plan_is_grid_blocked_not_cartesian(spark, sf_dir, queries):
    plan = P.formatted_plan(queries["q_dbscan_core"](spark, sf_dir))
    # The point-point join must be an equi-join on cell keys; the only
    # nested-loop allowed is the broadcast of the 9-row offset grid.
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_item_cf_ranks_and_symmetry(spark, sf_dir, queries):
    rows = queries["q_item_cf"](spark, sf_dir).collect()
    assert rows
    by_item = {}
    for r in rows:
        assert 1 <= r.rank <= C.CF_TOPK
        assert 0.0 < r.cosine <= 1.0
        by_item.setdefault(r.item, []).append(r)
    for item, rs in by_item.items():
        ranks = sorted(x.rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda x: x.rank)
        cosines = [x.cosine for x in ordered]
        assert cosines == sorted(cosines, reverse=True)


def test_rating_baseline_row_per_customer(spark, sf_dir, queries):
    t = load_tables(spark, sf_dir)
    n_cust = (
        t.lineitem.join(
            t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey
        ).select("o_custkey").distinct().count()
    )
    rows = queries["q_rating_baseline"](spark, sf_dir).collect()
    assert len(rows) == n_cust
    n_ratings = t.lineitem.count()
    assert sum(r.n_u for r in rows) == n_ratings
    # Damped biases are bounded by the raw residual range.
    assert all(abs(r.b_u) < 50.0 for r in rows)


# ------------------------------------------------- rank statistics & EM


def test_spearman_matches_pandas(spark, sf_dir, queries):
    t = load_tables(spark, sf_dir)
    pdf = t.lineitem.select("l_returnflag", "l_quantity", "l_extendedprice").toPandas()
    got = {r.l_returnflag: r.rho for r in queries["q_spearman"](spark, sf_dir).collect()}
    for flag, grp in pdf.groupby("l_returnflag"):
        # Pearson on tie-averaged ranks == Spearman (scipy-free form).
        want = (
            grp["l_quantity"].rank(method="average")
            .corr(grp["l_extendedprice"].rank(method="average"))
        )
        assert got[flag] == pytest.approx(want, abs=1e-6)
        assert -1.0 <= got[flag] <= 1.0


def test_kruskal_wallis_matches_python(spark, sf_dir, queries):
    t = load_tables(spark, sf_dir)
    pdf = t.lineitem.select("l_returnflag", "l_quantity").toPandas()
    # Independent implementation: scipy-free tie-averaged ranks.
    pdf["rank"] = pdf["l_quantity"].rank(method="average")
    n = len(pdf)
    h = 12.0 / (n * (n + 1)) * sum(
        grp["rank"].sum() ** 2 / len(grp) for _, grp in pdf.groupby("l_returnflag")
    ) - 3.0 * (n + 1)
    ties = pdf.groupby("l_quantity").size()
    c = 1.0 - float((ties**3 - ties).sum()) / (n**3 - n)
    row = queries["q_kruskal_wallis"](spark, sf_dir).collect()[0]
    assert row.n == n and row.df == 2
    assert row.h_micro / 1e6 == pytest.approx(h, abs=1e-4)
    assert row.h_corrected_micro / 1e6 == pytest.approx(h / c, abs=1e-4)


def test_em_step_component_invariants(spark, sf_dir, queries):
    rows = {r.component: r for r in queries["q_em_step"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].pi_new + rows[2].pi_new == pytest.approx(1.0, abs=1e-5)
    # Component 1 is seeded at μ=10, component 2 at μ=40: the M-step must
    # keep them ordered and inside the data range [1, 50].
    assert 1.0 <= rows[1].mu_new < rows[2].mu_new <= 50.0
    assert rows[1].var_new > 0 and rows[2].var_new > 0


def test_mutual_info_nonnegative_and_consistent(spark, sf_dir, queries):
    rows = queries["q_mutual_info"](spark, sf_dir).collect()
    assert rows
    mi = {r.mi_total for r in rows}
    assert len(mi) == 1
    mi = mi.pop()
    assert mi >= 0.0  # MI is non-negative for any joint distribution
    assert sum(r.contribution for r in rows) == pytest.approx(mi, abs=1e-9)
    total = sum(r.n_xy for r in rows)
    import pandas as pd  # noqa: F401  (parity with sibling tests' imports)

    # Independence sanity: if the two columns were independent every PMI
    # would be ~0; assert the statistic is small for this near-independent
    # fixture but still internally consistent.
    assert all(abs(r.pmi) < 5.0 for r in rows)
    assert total > 0


# ------------------------------------------------- plan shapes (100 TB)


def test_model_state_broadcast_everywhere(spark, sf_dir, queries):
    # 1-row / O(k)-row model state must ship as BroadcastExchange, never a
    # shuffled join side.
    for name in ("q_perceptron_step", "q_adaboost_round", "q_hits_step", "q_power_iter"):
        plan = P.formatted_plan(queries[name](spark, sf_dir))
        assert "BroadcastExchange" in plan, name
        assert "CartesianProduct" not in plan, name


def test_gbt_grid_broadcast_no_shuffle_of_facts(spark, sf_dir, queries):
    plan = P.formatted_plan(queries["q_gbt_stump"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    # Only the post-aggregate exchange on thr may shuffle (plus AQE reads):
    df = queries["q_gbt_stump"](spark, sf_dir)
    assert P.count_exchanges(df) <= 1


def test_em_touches_table_once(spark, sf_dir, queries):
    # The raw table feeds exactly one value-histogram aggregate.
    df = queries["q_em_step"](spark, sf_dir)
    plan = P.formatted_plan(df)
    assert plan.count("Scan parquet") <= 2  # union of two projections of one agg


# ------------------------------------------------- library iteration loops


def test_dbscan_cluster_full_partition(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    n_pts = t.embeddings.count()
    rows = C.dbscan_cluster(spark, sf_dir).collect()
    assert len(rows) == n_pts  # every point labeled exactly once
    kinds = {r.kind for r in rows}
    assert kinds <= {"core", "border", "noise"}
    core_clusters = {r.cluster for r in rows if r.kind == "core"}
    for r in rows:
        if r.kind == "noise":
            assert r.cluster is None
        elif r.kind == "border":
            assert r.cluster in core_clusters  # borders attach to a real cluster
    # Core labels must agree with q_dbscan_core's independent count.
    q_cores = {
        r.vec_id for r in C.q_dbscan_core(spark, sf_dir).collect()
    }
    assert {r.vec_id for r in rows if r.kind == "core"} == q_cores


def test_dbscan_cluster_cores_connected_share_label(spark, sf_dir):
    # Brute-force check: any two cores within eps must share a cluster.
    rows = C.dbscan_cluster(spark, sf_dir).collect()
    t = load_tables(spark, sf_dir)
    xy = {
        r.vec_id: (float(r.embedding[0]), float(r.embedding[1]))
        for r in t.embeddings.select("vec_id", "embedding").collect()
    }
    cores = [(r.vec_id, r.cluster) for r in rows if r.kind == "core"]
    eps2 = C.DBSCAN_EPS * C.DBSCAN_EPS
    for i, (a, ca) in enumerate(cores):
        for b, cb in cores[i + 1 :]:
            ax, ay = xy[a]
            bx, by = xy[b]
            if (ax - bx) ** 2 + (ay - by) ** 2 <= eps2:
                assert ca == cb, (a, b)


def test_adaboost_fit_reduces_training_error(spark, sf_dir):
    from pyspark.sql import functions as F

    model = C.adaboost_fit(spark, sf_dir, rounds=3)
    assert model and all(m["alpha"] > 0 and 0 < m["eps"] < 0.5 for m in model)
    t = load_tables(spark, sf_dir)
    y = F.when(F.col("label") >= 5, F.lit(1.0)).otherwise(F.lit(-1.0))
    base = t.embeddings.select("embedding", y.alias("y"))
    n = base.count()

    def err(mdl):
        scored = C.adaboost_predict(base, mdl)
        return scored.filter(F.col("pred") != F.col("y")).count() / n

    ensemble = err(model)
    single = err(model[:1])
    assert ensemble <= single + 1e-9  # boosting can't be worse than round 1 here
    assert ensemble < 0.5  # better than chance


def test_hits_iterate_normalized_and_stable(spark, sf_dir):
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    edges = (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("hub_id"), F.col("l_partkey").alias("auth_id")
        )
        .distinct()
    )
    a5, h5 = C.hits_iterate(edges, rounds=5)
    rows5 = a5.collect()
    assert sum(r.score**2 for r in rows5) == pytest.approx(1.0, abs=1e-6)
    assert sum(r.score**2 for r in h5.collect()) == pytest.approx(1.0, abs=1e-6)
    # Power-method convergence: one more round barely moves the vector.
    a6, _ = C.hits_iterate(edges, rounds=6)
    s5 = {r.auth_id: r.score for r in rows5}
    dot = sum(r.score * s5[r.auth_id] for r in a6.collect())
    assert dot > 0.999


def test_power_iterate_rayleigh_converges(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.graph import (
        _repeat_copurchase_edges,
    )

    edges = _repeat_copurchase_edges(spark, sf_dir)
    v, eigen = C.power_iterate(edges, rounds=6)
    assert sum(r.score**2 for r in v.collect()) == pytest.approx(1.0, abs=1e-6)
    assert len(eigen) == 6 and all(e > 0 for e in eigen)
    # Power iteration drives the Rayleigh quotient toward λ_max: the
    # estimate must grow past the crude first guess and then settle.
    assert eigen[-1] >= eigen[0] - 1e-6
    assert abs(eigen[-1] - eigen[-2]) / eigen[-1] < 1e-2


def test_em_fit_loglik_monotone(spark, sf_dir):
    out = C.em_fit(spark, sf_dir, rounds=5)
    ll = out["loglik"]
    assert len(ll) == 5
    for a, b in zip(ll, ll[1:]):
        assert b >= a - 1e-6  # EM monotonicity
    p = out["params"]
    assert 1.0 <= p["mu1"] < p["mu2"] <= 50.0
    assert 0.0 < p["pi2"] < 1.0 and p["s1"] > 0 and p["s2"] > 0


def test_shared_subtrees_reuse_exchanges(spark, sf_dir, queries):
    # The edge/basket subtree is referenced 2-3x per link-analysis query;
    # the EXECUTED plan must dedupe it via exchange reuse, not recompute
    # (the static tree repeats the subtree — only runtime reuse makes the
    # plan scale-honest). Guard: real exchanges bounded AND reuse present.
    budgets = {"q_hits_step": 8, "q_power_iter": 6, "q_item_cf": 6}
    for name, budget in budgets.items():
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = P.executed_plan(df)
        final = plan.split("== Initial Plan ==")[0]
        real = sum(
            1
            for line in final.splitlines()
            if "Exchange" in line
            and "Reused" not in line
            and "Broadcast" not in line
            and "AQEShuffleRead" not in line
        )
        assert real <= budget, (name, real)
        assert "ReusedExchange" in final, name


def test_new_single_aggregate_queries_exchange_budget(spark, sf_dir, queries):
    # Moment/contingency kernels must stay at 1-3 exchanges (one keyed
    # aggregate + at most tiny model-state shuffles), with no cartesian.
    budgets = {
        "q_ridge_fit": 1,
        "q_gbt_stump": 1,
        "q_spearman": 1,
        "q_dbscan_core": 1,
        "q_em_step": 2,
        "q_perceptron_step": 2,
        "q_adaboost_round": 3,
        # Static tree repeats the (flag, value) histogram subtree; every
        # exchange past the first moves the ≤50-row value domain, and the
        # executed plan dedupes the repeats via ReusedExchange.
        "q_kruskal_wallis": 9,
    }
    for name, budget in budgets.items():
        df = queries[name](spark, sf_dir)
        assert P.count_exchanges(df) <= budget, name
        assert "CartesianProduct" not in P.formatted_plan(df), name


def test_spearman_distributed_bit_identical(spark, sf_dir, queries):
    # The no-window twin must reproduce the window form bit-for-bit.
    win = sorted(map(tuple, queries["q_spearman"](spark, sf_dir).collect()))
    dist = sorted(map(tuple, C.spearman_distributed(spark, sf_dir).collect()))
    assert win == dist


def test_kruskal_histogram_form_has_no_data_window(spark, sf_dir, queries):
    # Ranks must come from the bounded value histogram, not a data-sized
    # rank window: the plan may contain NO rank()/row_number() window
    # function at all (only the cumulative count over the ≤50-row distinct
    # value frame), and no sort of the raw fact rows.
    plan = P.formatted_plan(queries["q_kruskal_wallis"](spark, sf_dir))
    assert "rank(" not in plan and "row_number(" not in plan
    # The only window is the running total over the aggregated value domain.
    assert plan.count("Window") <= 2  # tree node + its detail entry


def test_recommend_for_users_excludes_owned_and_ranks(spark, sf_dir):
    from pyspark.sql import functions as F

    recs = C.recommend_for_users(spark, sf_dir, top_n=5)
    rows = recs.collect()
    assert rows
    t = load_tables(spark, sf_dir)
    owned = {
        (r.o_custkey, r.l_partkey)
        for r in t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).select("o_custkey", "l_partkey").distinct().collect()
    }
    by_user = {}
    for r in rows:
        assert (r.o_custkey, r.item) not in owned  # never recommend owned
        assert r.score > 0
        by_user.setdefault(r.o_custkey, []).append(r)
    for user, rs in by_user.items():
        assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda x: x.rank)
        scores = [x.score for x in ordered]
        assert scores == sorted(scores, reverse=True)


def test_half_up_identity_matches_decimal_rounding():
    # The fixed-point rounding identity q_rating_baseline relies on:
    # floor((2N+D)/(2D)) == round-half-up(N/D) for integer N, D>0 —
    # including EXACT halves, where double round() is engine-dependent.
    from decimal import Decimal, ROUND_HALF_UP
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        n=st.integers(min_value=-(10**10), max_value=10**10),
        d=st.integers(min_value=1, max_value=10**4),
    )
    @settings(max_examples=500, deadline=None)
    def check(n, d):
        got = math.floor((2 * n + d) / (2 * d))
        want = int(
            (Decimal(n) / Decimal(d)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )
        # ROUND_HALF_UP is away-from-zero; the floor identity rounds
        # halves toward +inf. They agree except negative exact halves,
        # where the floor form is the one BOTH engines compute.
        if (2 * n) % (2 * d) == d and n < 0:
            assert got == want + 1
        else:
            assert got == want

    check()


# ------------------------------------------------- MST / single linkage


def _eps_graph_py(spark, sf_dir, eps):
    t = load_tables(spark, sf_dir)
    pts = {
        r.vec_id: (float(r.embedding[0]), float(r.embedding[1]))
        for r in t.embeddings.select("vec_id", "embedding").collect()
    }
    ids = sorted(pts)
    edges = []
    for i, a in enumerate(ids):
        ax, ay = pts[a]
        for b in ids[i + 1 :]:
            bx, by = pts[b]
            d2 = (ax - bx) ** 2 + (ay - by) ** 2
            if d2 <= eps * eps:
                edges.append((math.sqrt(d2), a, b))
    return edges


def _kruskal_py(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for w, u, v in sorted(edges):  # same (w, u, v) total order as Borůvka
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.add((u, v))
    return forest


@pytest.mark.slow  # heavy lane, run with -m slow (pytest.ini r16)
def test_boruvka_mst_matches_kruskal(spark, sf_dir):
    eps = 0.1
    py_edges = _eps_graph_py(spark, sf_dir, eps)
    want = _kruskal_py(py_edges)
    t = load_tables(spark, sf_dir)
    pts = t.embeddings.selectExpr(
        "vec_id",
        "cast(embedding[0] as double) as x",
        "cast(embedding[1] as double) as y",
    )
    from pyspark.sql import functions as F

    pairs = C._eps_pairs(pts, eps).filter(F.col("a_id") < F.col("b_id"))
    a = pts.selectExpr("vec_id as a_id", "x as ax", "y as ay")
    b = pts.selectExpr("vec_id as b_id", "x as bx", "y as by")
    weighted = (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .selectExpr(
            "a_id as u",
            "b_id as v",
            "sqrt((ax-bx)*(ax-bx) + (ay-by)*(ay-by)) as w",
        )
    )
    got = {(r.u, r.v) for r in C.boruvka_mst(weighted).collect()}
    assert got == want


@pytest.mark.slow  # heavy lane, run with -m slow (pytest.ini r16)
def test_single_linkage_equals_threshold_components(spark, sf_dir):
    # Cutting the MST at t yields exactly the connected components of the
    # t-threshold graph — verify the whole pipeline against brute CC.
    eps, thr = 0.1, 0.04
    py_edges = [(u, v) for w, u, v in _eps_graph_py(spark, sf_dir, eps) if w <= thr]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in py_edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    rows = C.single_linkage_clusters(spark, sf_dir, threshold=thr, eps=eps).collect()
    got = {}
    for r in rows:
        got.setdefault(r.cluster, set()).add(r.vec_id)
    want = {}
    t = load_tables(spark, sf_dir)
    for r in t.embeddings.select("vec_id").collect():
        want.setdefault(find(r.vec_id), set()).add(r.vec_id)
    assert sorted(map(sorted, got.values())) == sorted(map(sorted, want.values()))


def test_single_linkage_threshold_guard(spark, sf_dir):
    with pytest.raises(ValueError):
        C.single_linkage_clusters(spark, sf_dir, threshold=0.5, eps=0.1)


# ------------------------------------------------- NB predict / doc sim


def test_naive_bayes_predict_matches_python(spark, sf_dir):
    import math as m

    t = load_tables(spark, sf_dir)
    docs = [
        (r.doc_id, r.source, r.text.split(" "))
        for r in t.documents.select("doc_id", "source", "text").collect()
    ]
    # Python reference model (same Laplace smoothing as q_naive_bayes).
    from collections import Counter, defaultdict

    class_tok = defaultdict(Counter)
    class_docs = Counter()
    for _, src, toks in docs:
        class_docs[src] += 1
        class_tok[src].update(toks)
    vocab = len({tok for _, _, ts in docs for tok in ts})
    n = len(docs)

    def classify(toks):
        best = None
        for src in sorted(class_tok):
            total = sum(class_tok[src].values())
            # Mirror the query: every per-token ll rounded to 6 (model
            # parity — the floor included).
            score = round(m.log(class_docs[src] / n), 6)
            for tok in toks:
                c = class_tok[src][tok]
                score += round(m.log((c + 1) / (total + vocab)), 6)
            if best is None or score > best[1] + 1e-9 or (
                abs(score - best[1]) <= 1e-9 and src > best[0]
            ):
                best = (src, score)
        return best

    got = {
        r.doc_id: (r.pred_source, r.log_post, r.actual_source)
        for r in C.naive_bayes_predict(spark, sf_dir).collect()
    }
    assert len(got) == len(docs)
    agree = 0
    correct = 0
    for doc_id, src, toks in docs:
        want_src, want_score = classify(toks)
        pred, score, actual = got[doc_id]
        assert actual == src
        assert score == pytest.approx(want_score, abs=1e-6)
        agree += pred == want_src
        correct += pred == src
    assert agree == len(docs)  # argmax identical to the reference
    # Self-classification on training data must beat the majority class.
    assert correct / len(docs) > max(class_docs.values()) / n


def test_similar_docs_tfidf_topk_matches_python(spark, sf_dir):
    import math as m
    from collections import Counter, defaultdict

    t = load_tables(spark, sf_dir)
    docs = {
        r.doc_id: r.text.split(" ")
        for r in t.documents.select("doc_id", "text").collect()
    }
    tf = {d: Counter(ts) for d, ts in docs.items()}
    df = Counter(tok for d in tf.values() for tok in d)
    n = len(docs)
    vecs = {}
    for d, counts in tf.items():
        v = {
            tok: c * m.log(n / df[tok])
            for tok, c in counts.items()
            if df[tok] <= C.TFIDF_DF_CAP
        }
        nrm = m.sqrt(sum(x * x for x in v.values()))
        if nrm:
            vecs[d] = {tok: x / nrm for tok, x in v.items()}
    sims = defaultdict(dict)
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = vecs[a], vecs[b]
            if len(vb) < len(va):
                va, vb = vb, va
            s = sum(x * vb[tok] for tok, x in va.items() if tok in vb)
            if s > 0:
                sims[a][b] = s
                sims[b][a] = s
    rows = C.similar_docs_tfidf(spark, sf_dir, top_k=3).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    for d, rs in by_doc.items():
        want = sorted(sims[d].items(), key=lambda kv: (-kv[1], kv[0]))[: len(rs)]
        got = sorted(rs, key=lambda r: r.rank)
        for (wn, ws), g in zip(want, got):
            assert g.cos == pytest.approx(ws, abs=1e-9)
            # neighbour may differ only on an exact cosine tie
            assert g.nbr == wn or sims[d][g.nbr] == pytest.approx(ws, abs=1e-9)


def test_markov_steady_state_is_stationary(spark, sf_dir):
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.operators.events import (
        markov_steady_state,
        q_markov_chain,
    )

    pi_rows = {r.event_type: r.pi for r in markov_steady_state(spark, sf_dir).collect()}
    assert pi_rows and all(p >= 0 for p in pi_rows.values())
    assert sum(pi_rows.values()) == pytest.approx(1.0, abs=1e-6)
    # Stationarity: πP == π (exact conditional probs from counts).
    trans = q_markov_chain(spark, sf_dir).collect()
    from collections import defaultdict

    n_from = defaultdict(int)
    for r in trans:
        n_from[r.prev_type] += r.n_trans
    nxt = defaultdict(float)
    for r in trans:
        nxt[r.next_type] += pi_rows.get(r.prev_type, 0.0) * (r.n_trans / n_from[r.prev_type])
    for state, p in pi_rows.items():
        assert nxt[state] == pytest.approx(p, abs=1e-8), state


def test_markov_steady_state_renormalizes_leaking_mass(spark, sf_dir):
    """ADVICE r5: a type that only ever appears as a sequence-FINAL event
    is absorbing with no outgoing transition row, so its mass leaks on
    every multiply — π must still sum to 1 (per-round L1 renormalization).
    Fixture: every user ends on 'end', which never transitions out."""
    from pyspark.sql import Row

    from machinelearningalgomapreduce_spark.operators import events as EV

    rows = []
    eid = 0
    for u in range(6):
        seq = ["a", "b", "a", "b", "end"] if u % 2 else ["b", "a", "b", "end"]
        for i, typ in enumerate(seq):
            rows.append(Row(user_id=f"u{u}", ts=float(i), event_id=eid, event_type=typ))
            eid += 1
    df = spark.createDataFrame(rows)

    class _Cat:
        events = df

    orig = EV.load_tables
    EV.load_tables = lambda *_a, **_k: _Cat()
    try:
        pi = {r.event_type: r.pi for r in EV.markov_steady_state(spark, sf_dir).collect()}
    finally:
        EV.load_tables = orig
    assert pi and all(p >= 0 for p in pi.values())
    assert sum(pi.values()) == pytest.approx(1.0, abs=1e-9), pi


# ------------------------------------------------- CV harness / scaling


def test_kfold_assign_deterministic_and_balanced(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    a = C.kfold_assign(t.embeddings.select("vec_id"), "vec_id", k=5)
    b = C.kfold_assign(t.embeddings.select("vec_id"), "vec_id", k=5)
    fa = {r.vec_id: r.fold for r in a.collect()}
    fb = {r.vec_id: r.fold for r in b.collect()}
    assert fa == fb  # content-hash determinism
    from collections import Counter

    sizes = Counter(fa.values())
    assert set(sizes) == set(range(5))
    n = len(fa)
    for c in sizes.values():
        assert abs(c - n / 5) < 0.25 * n / 5 + 10  # roughly balanced
    # Appending data never moves an existing row's fold.
    half = C.kfold_assign(
        t.embeddings.select("vec_id").limit(200), "vec_id", k=5
    )
    for r in half.collect():
        assert fa[r.vec_id] == r.fold


def test_cross_validate_accuracy_beats_chance(spark, sf_dir):
    res = C.cross_validate_accuracy(spark, sf_dir, k=3)
    assert len(res) == 3
    assert sum(r["n_test"] for r in res) == load_tables(spark, sf_dir).embeddings.count()
    for r in res:
        assert 0.0 <= r["train_err"] <= 0.5
        assert r["test_acc"] > 0.4  # stump family: weakly better than coin


def test_standardize_and_minmax(spark, sf_dir):
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    df = t.lineitem.select("l_quantity", "l_extendedprice")
    z = C.standardize(df, ["l_quantity", "l_extendedprice"])
    stats = z.agg(
        F.avg("l_quantity"), F.stddev_pop("l_quantity"),
        F.avg("l_extendedprice"), F.stddev_pop("l_extendedprice"),
    ).first()
    assert stats[0] == pytest.approx(0.0, abs=1e-9)
    assert stats[1] == pytest.approx(1.0, abs=1e-9)
    assert stats[2] == pytest.approx(0.0, abs=1e-6)
    assert stats[3] == pytest.approx(1.0, abs=1e-9)
    m = C.minmax_scale(df, ["l_quantity"])
    lo, hi = m.agg(F.min("l_quantity"), F.max("l_quantity")).first()
    assert lo == 0.0 and hi == 1.0
    # Plan shape: statistics broadcast, data side unshuffled.
    assert "BroadcastExchange" in P.formatted_plan(z) or "BroadcastNestedLoopJoin" in P.formatted_plan(z)


def test_chunk_documents_reconstructs_streams(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.export import chunk_documents

    chunk_tokens, overlap = 16, 4
    stride = chunk_tokens - overlap
    rows = chunk_documents(spark, sf_dir, chunk_tokens, overlap).collect()
    t = load_tables(spark, sf_dir)
    originals = {
        r.doc_id: r.text.split(" ")
        for r in t.documents.select("doc_id", "text").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(originals)  # every doc chunked
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        toks = originals[doc_id]
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        # Exact stride layout: chunk i is tokens [i*stride, i*stride+W) —
        # this single property implies the overlap contract and full
        # coverage of the stream.
        for c in chunks:
            ctoks = c.chunk_text.split(" ") if c.chunk_text else []
            assert len(ctoks) == c.n_tokens <= chunk_tokens
            start = c.chunk_id * stride
            assert ctoks == toks[start : start + chunk_tokens]
        last = chunks[-1]
        assert last.chunk_id * stride + last.n_tokens == len(toks)  # no tail lost
        # ADVICE r5: no chunk may be a subset of its predecessor's window —
        # every chunk after the first must contribute ≥1 new token.
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur.chunk_id * stride + cur.n_tokens > prev.chunk_id * stride + prev.n_tokens, (
                f"{doc_id}: chunk {cur.chunk_id} adds no tokens over {prev.chunk_id}"
            )


def test_chunk_no_subset_final_chunk_regression(spark):
    """ADVICE r5 repro: a 57-token doc with chunk_tokens=64, overlap=8
    used to emit chunk 0 = all 57 tokens PLUS chunk 1 = the single token
    t56 already inside chunk 0 — duplicated content in exported training
    data. The capped start sequence must yield exactly one chunk."""
    from pyspark.sql import Row

    from machinelearningalgomapreduce_spark.operators.export import chunk_token_streams

    text = " ".join(f"t{i}" for i in range(57))
    docs = spark.createDataFrame([Row(doc_id="d0", text=text)])
    rows = chunk_token_streams(docs, chunk_tokens=64, overlap=8).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 57
    # Boundary sanity at n = stride + overlap + 1 (first two-chunk case):
    # 57 tokens with stride 48 → second chunk starts at 48, adds t56.
    text2 = " ".join(f"t{i}" for i in range(57))
    rows2 = chunk_token_streams(
        spark.createDataFrame([Row(doc_id="d1", text=text2)]), 56, 8
    ).collect()
    assert [r.chunk_id for r in sorted(rows2, key=lambda r: r.chunk_id)] == [0, 1]
    assert sorted(rows2, key=lambda r: r.chunk_id)[1].chunk_text.split(" ")[-1] == "t56"


def test_chunk_documents_rejects_bad_overlap(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.export import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(spark, sf_dir, 16, 16)


def test_fuzzy_kmeans_objective_monotone(spark, sf_dir):
    out = C.fuzzy_kmeans_fit(spark, sf_dir, rounds=4)
    obj = out["objective"]
    assert len(obj) == 4 and all(o > 0 for o in obj)
    for a, b in zip(obj, obj[1:]):
        assert b <= a + 1e-6  # alternating-minimization guarantee
    cents = out["centroids"]
    assert len(cents) == 10  # one per seed label
    dims = {len(v) for v in cents.values()}
    assert dims == {64}


def test_rank_stats_degenerate_groups_yield_null(spark, sf_dir):
    # A constant-value group has zero rank variance: rho and the
    # tie-corrected H must be NULL, not a division error or ±inf.
    from pyspark.sql import Row

    rows = [
        Row(l_returnflag="A", l_quantity=5.0, l_extendedprice=100.0 + i)
        for i in range(8)
    ] + [
        Row(l_returnflag="R", l_quantity=float(i % 3 + 1), l_extendedprice=50.0 * i)
        for i in range(9)
    ]
    df = spark.createDataFrame(rows)

    class _Cat:
        lineitem = df

    orig = C.load_tables
    C.load_tables = lambda *_a, **_k: _Cat()
    try:
        sp = {r.l_returnflag: r.rho for r in C.q_spearman(spark, sf_dir).collect()}
        assert sp["A"] is None  # constant x ⇒ vx = 0 ⇒ NULL
        assert sp["R"] is not None and -1.0 <= sp["R"] <= 1.0
        # All-one-value corpus: c = 0 ⇒ h_corrected NULL, h still defined.
        only_const = df.filter("l_returnflag = 'A'")

        class _Cat2:
            lineitem = only_const

        C.load_tables = lambda *_a, **_k: _Cat2()
        row = C.q_kruskal_wallis(spark, sf_dir).collect()[0]
        assert row.h_corrected_micro is None
    finally:
        C.load_tables = orig


def test_float_emitting_family_bit_equal_across_layouts(spark, sf_dir):
    """VERDICT r5 item 4: the float-emitting classic-ML family must be
    bit-identical under a different partition layout (7 shuffle
    partitions + tiny input splits forcing many map tasks) — the
    automated defense against shuffle-order-dependent accumulation,
    whatever bit the round-5 driver artifact actually saw."""
    import struct

    from machinelearningalgomapreduce_spark import registry

    def canon(df):
        def cell(v):
            if isinstance(v, float):
                return struct.pack("<d", v).hex()
            return repr(v)

        cols = sorted(df.columns)
        return sorted(
            "|".join(cell(r[c]) for c in cols) for r in df.collect()
        )

    qs = registry.queries()
    family = [
        "q_gbt_stump", "q_hits_step", "q_power_iter", "q_kruskal_wallis",
        "q_spearman", "q_em_step",
    ]
    baseline = {n: canon(qs[n](spark, sf_dir)) for n in family}
    shuffle0 = spark.conf.get("spark.sql.shuffle.partitions")
    split0 = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        for n in family:
            assert canon(qs[n](spark, sf_dir)) == baseline[n], (
                f"{n}: output depends on partition layout"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle0)
        spark.conf.set("spark.sql.files.maxPartitionBytes", split0)
