"""Invariant tests for the round-5 additions outside their own modules'
test files: clustering coefficient (graph.py), token budget and
train/test split (export.py). Oracle parity lives in tools/check.py."""

from __future__ import annotations

from machinelearningalgomapreduce_spark.operators import export as X
from machinelearningalgomapreduce_spark.operators import graph as G
from machinelearningalgomapreduce_spark.plans import inspect as P
from machinelearningalgomapreduce_spark.sources.catalog import load_tables


def test_clustering_coeff_matches_python_reference(spark, sf_dir):
    edges = [
        (r.u, r.v) for r in G._repeat_copurchase_edges(spark, sf_dir).collect()
    ]
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    expected = {}
    for n, ns in nbrs.items():
        d = len(ns)
        if d < 2:
            continue
        tri = sum(len(nbrs[a] & ns) for a in ns) // 2
        expected[n] = (d, tri, round(2.0 * tri / (d * (d - 1)), 6))
    rows = G.q_clustering_coeff(spark, sf_dir).collect()
    assert rows
    for r in rows:
        d, tri, coeff = expected[r.node]
        assert (r.degree, r.n_tri, r.coeff) == (d, tri, coeff), r.node
    # Top-20 really is the top of the full ranking.
    full = sorted(expected.items(), key=lambda kv: (-kv[1][2], kv[0]))
    assert [r.node for r in rows] == [n for n, _ in full[: len(rows)]]


def test_token_budget_admits_a_quality_prefix(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.text import q_quality_score

    rows = X.q_token_budget(spark, sf_dir).collect()
    assert rows
    kept = sum(r.tokens_kept for r in rows)
    # The last admitted doc may straddle the budget; everything before it
    # fits, so kept < budget + max doc length and the budget is reached
    # (the corpus has more tokens than the budget at every fixture tier).
    t = load_tables(spark, sf_dir)
    import pyspark.sql.functions as F

    total = t.documents.select(
        F.sum(F.size(F.split("text", " "))).alias("s")
    ).collect()[0].s
    assert total > X.TOKEN_BUDGET
    assert kept >= X.TOKEN_BUDGET
    max_doc = t.documents.select(
        F.max(F.size(F.split("text", " "))).alias("m")
    ).collect()[0].m
    assert kept < X.TOKEN_BUDGET + max_doc
    # Admission is by quality: no rejected doc outranks an admitted one.
    q = {r.doc_id: r.quality_score for r in q_quality_score(spark, sf_dir).collect()}
    floor_q = min(r.min_quality_admitted for r in rows)
    n_better = sum(1 for v in q.values() if v > floor_q)
    n_kept = sum(r.n_docs_kept for r in rows)
    assert n_better <= n_kept


def test_train_test_split_is_deterministic_and_stratified(spark, sf_dir):
    rows = X.q_train_test_split(spark, sf_dir).collect()
    again = X.q_train_test_split(spark, sf_dir).collect()
    assert rows == again
    t = load_tables(spark, sf_dir)
    assert sum(r.n_docs for r in rows) == t.documents.count()
    by_source: dict[str, float] = {}
    for r in rows:
        by_source[r.source] = by_source.get(r.source, 0.0) + r.frac_docs
    for src, tot in by_source.items():
        assert abs(tot - 1.0) < 1e-5, (src, tot)
    train = sum(r.n_docs for r in rows if r.split == "train")
    assert 0.6 < train / sum(r.n_docs for r in rows) < 0.95


def test_round5_export_plan_shapes(spark, sf_dir):
    # Hash split: scan-side hashing + bounded aggregate; never a join.
    plan = P.formatted_plan(X.q_train_test_split(spark, sf_dir))
    assert "Join" not in plan
    # Clustering coefficient: equi-joins only.
    plan = P.formatted_plan(G.q_clustering_coeff(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert P.uses_take_ordered(G.q_clustering_coeff(spark, sf_dir))


def test_class_separation_matches_pairwise_recompute(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators import similarity as S

    rows = {r.label: r for r in S.q_class_separation(spark, sf_dir).collect()}
    vecs = load_tables(spark, sf_dir).embeddings.collect()
    by_label: dict[int, list] = {}
    for v in vecs:
        by_label.setdefault(v.label, []).append([float(x) for x in v.embedding])
    import itertools

    for label, vs in by_label.items():
        if len(vs) < 2:
            continue
        dots = [
            sum(a * b for a, b in zip(x, y))
            for x, y in itertools.combinations(vs, 2)
        ]
        expected = sum(dots) / len(dots)
        got = rows[label].within_mean_dot
        # The operator's sum-vector identity uses decimal-quantized partial
        # sums; agreement to ~1e-4 proves the identity, not the quantizer.
        assert abs(got - expected) < 1e-3, (label, got, expected)
        assert rows[label].n == len(vs)


def test_norm_profile_orders_and_counts(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators import similarity as S

    rows = S.q_norm_profile(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == load_tables(spark, sf_dir).embeddings.count()
    for r in rows:
        assert r.min_norm <= r.mean_norm <= r.max_norm
        assert r.min_norm > 0.0


def test_anova_matches_python_recompute(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators import evaluation as E

    r = E.q_anova(spark, sf_dir).collect()[0]
    events = load_tables(spark, sf_dir).events.select("event_type", "value").collect()
    groups: dict[str, list[float]] = {}
    for e in events:
        groups.setdefault(e.event_type, []).append(e.value)
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.k == k and r.n_total == n
    assert abs(r.f_stat - f) < max(1e-4, abs(f) * 1e-5)
    assert abs(r.eta_sq - ssb / (ssb + ssw)) < 1e-5
    assert 0.0 <= r.eta_sq <= 1.0


def test_hapax_rate_matches_python_recompute(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators import text as T

    docs = load_tables(spark, sf_dir).documents.select("source", "text").collect()
    corpus: dict[str, int] = {}
    per_source_tokens: dict[str, int] = {}
    per_source_tok: dict[str, list[str]] = {}
    for d in docs:
        toks = d.text.split(" ")
        per_source_tokens[d.source] = per_source_tokens.get(d.source, 0) + len(toks)
        per_source_tok.setdefault(d.source, []).extend(toks)
        for t in toks:
            corpus[t] = corpus.get(t, 0) + 1
    rows = T.q_hapax_rate(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(per_source_tokens)
    for r in rows:
        expected_hapax = sum(1 for t in per_source_tok[r.source] if corpus[t] == 1)
        assert r.n_tokens == per_source_tokens[r.source]
        assert r.n_hapax == expected_hapax
        assert abs(r.hapax_rate - expected_hapax / r.n_tokens) < 1e-6


def test_kmeans_pp_init_matches_python_farthest_first(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import kmeans_pp_init

    k = 6
    got = kmeans_pp_init(spark, sf_dir, k=k)
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_tables(spark, sf_dir).embeddings.collect()
    }
    chosen = [min(vecs)]
    mind = {vid: float("inf") for vid in vecs}
    for _ in range(k - 1):
        c = vecs[chosen[-1]]
        for vid, v in vecs.items():
            d2 = round(sum((a - b) * (a - b) for a, b in zip(v, c)), 6)
            mind[vid] = min(mind[vid], d2)
        nxt = max(vecs, key=lambda vid: (mind[vid], -vid))
        chosen.append(nxt)
    assert got == chosen
    assert len(set(got)) == k  # farthest-first never re-picks a center


def test_ndcg_matches_python_recompute(spark, sf_dir):
    import math

    from machinelearningalgomapreduce_spark.operators import similarity as S

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_tables(spark, sf_dir).embeddings.collect()
    }
    norms = {vid: math.sqrt(sum(x * x for x in v)) for vid, v in vecs.items()}

    def cos(a, b):
        return round(
            sum(x * y for x, y in zip(vecs[a], vecs[b])) / (norms[a] * norms[b]), 6
        )

    queries = [vid for vid in vecs if vid % S.ANN_QUERY_STRIDE == 0]
    ann = {}
    for r in S.q_sim_ann(spark, sf_dir).collect():
        ann.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    k = S.ANN_K
    idcg = sum((k - p + 1) / math.log2(p + 1) for p in range(1, k + 1))
    expected = {}
    for qid in queries:
        ranked = sorted(
            (v for v in vecs if v != qid), key=lambda v: (-cos(qid, v), v)
        )[:k]
        rel = {v: k - i for i, v in enumerate(ranked)}
        dcg = sum(
            rel.get(nid, 0) / math.log2(pos + 1)
            for pos, nid in sorted(ann.get(qid, []))
        )
        expected[qid] = round(dcg / idcg, 6)
    got = {r.query_id: r.ndcg for r in S.q_ndcg(spark, sf_dir).collect()}
    assert got == expected
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_percentile_audit_sketch_is_accurate(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators import stats as ST

    rows = ST.q_percentile_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # The sketch must hold its rank guarantee at every fixture tier —
        # the whole point of the audit is that this is TRUE in practice.
        assert r.p50_ok and r.p90_ok and r.p99_ok, r
        assert r.p50 <= r.p90 <= r.p99


def test_sssp_iterate_matches_python_dijkstra(spark, sf_dir):
    import heapq

    from machinelearningalgomapreduce_spark.operators import paths as PA

    edges = PA._weighted_edges(spark, sf_dir).collect()
    adj: dict[int, list[tuple[int, int]]] = {}
    nodes = set()
    for e in edges:
        adj.setdefault(e.u, []).append((e.v, e.w))
        nodes.add(e.u)
        nodes.add(e.v)
    seeds = [n for n in nodes if n % PA.BFS_SEED_MOD == 0]
    dist = {s: 0 for s in seeds}
    heap = [(0, s) for s in seeds]
    heapq.heapify(heap)
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    got = {r.node: r.dist for r in PA.sssp_iterate(spark, sf_dir).collect()}
    assert got == dist


def test_sssp_step_is_a_prefix_of_the_fixpoint(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators import paths as PA

    rows = {r.dist: r.n_nodes for r in PA.q_sssp_step(spark, sf_dir).collect()}
    assert rows, "graph is non-empty"
    # Seeds stay at distance 0, and two relaxation rounds never produce a
    # distance below 0 or leave a seed unreached.
    assert rows.get(0, 0) >= 1
    assert all(d >= -1 for d in rows)


def test_assortativity_matches_python_recompute(spark, sf_dir):
    import math

    from machinelearningalgomapreduce_spark.operators import graph as GG

    edges = [(r.u, r.v) for r in GG._repeat_copurchase_edges(spark, sf_dir).collect()]
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    expected = round(
        (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
    )
    row = GG.q_assortativity(spark, sf_dir).collect()[0]
    assert row.n_dir_edges == n
    assert abs(row.assortativity - expected) < 2e-6
    assert -1.0 <= row.assortativity <= 1.0


def test_trend_fit_matches_python_least_squares(spark, sf_dir):
    import datetime

    from machinelearningalgomapreduce_spark.operators import timeseries as TS

    events = load_tables(spark, sf_dir).events.select("event_type", "ts").collect()
    daily: dict[tuple[str, int], int] = {}
    epoch = datetime.date(1995, 1, 1)
    for e in events:
        x = (e.ts.date() - epoch).days
        daily[(e.event_type, x)] = daily.get((e.event_type, x), 0) + 1
    by_type: dict[str, list[tuple[int, int]]] = {}
    for (et, x), y in daily.items():
        by_type.setdefault(et, []).append((x, y))
    rows = {r.event_type: r for r in TS.q_trend_fit(spark, sf_dir).collect()}
    assert set(rows) == set(by_type)
    for et, pts in by_type.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r = rows[et]
        assert r.n == n
        assert abs(r.slope_per_day - slope) < 1e-5
        assert 0.0 <= r.r2 <= 1.0


def test_referential_integrity_counts_match_tables(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators import relational as R

    rows = {r.relationship: r for r in R.q_referential_integrity(spark, sf_dir).collect()}
    t = load_tables(spark, sf_dir)
    n_li, n_o = t.lineitem.count(), t.orders.count()
    assert rows["lineitem.l_orderkey->orders"].n_child == n_li
    assert rows["orders.o_custkey->customer"].n_child == n_o
    for r in rows.values():
        assert 0 <= r.n_orphans <= r.n_child
    # The generated fixture is referentially clean — a nonzero orphan count
    # here would mean the audit (or the fixture) broke.
    assert all(r.n_orphans == 0 for r in rows.values())


def test_key_uniqueness_flags_tables_correctly(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators import relational as R

    rows = {r.table_name: r for r in R.q_key_uniqueness(spark, sf_dir).collect()}
    assert set(rows) == {
        "orders", "customer", "part", "supplier", "events", "documents", "embeddings"
    }
    for r in rows.values():
        assert r.n_distinct_keys <= r.n_rows
        assert (r.n_dup_keys == 0) == (r.n_distinct_keys == r.n_rows)


def test_weighted_pick_is_exact_and_weight_consistent(spark, sf_dir):
    import hashlib

    rows = {r.source: r for r in X.q_weighted_pick(spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir).documents.select(
        "source", "doc_id", "n_chars"
    ).collect()
    by_source: dict[str, list[tuple[int, int]]] = {}
    for d in docs:
        by_source.setdefault(d.source, []).append((d.doc_id, d.n_chars))
    assert set(rows) == set(by_source)
    for src, ds in by_source.items():
        ds.sort()
        total = sum(w for _, w in ds)
        # 15 hex chars = the 60-bit threshold (r10 review: 32 bits inverts
        # once a source's weight exceeds 2^32) — must track the operator
        thr = int(hashlib.md5(f"pick:{src}".encode()).hexdigest()[:15], 16) % total
        cum = 0
        for doc_id, w in ds:
            if cum <= thr < cum + w:
                break
            cum += w
        assert rows[src].picked_doc == doc_id, src
        assert rows[src].doc_chars == w


def test_round5_new_ops_plan_shapes(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators import behavior as B
    from machinelearningalgomapreduce_spark.operators import graph as GG
    from machinelearningalgomapreduce_spark.operators import paths as PA
    from machinelearningalgomapreduce_spark.operators import timeseries as TS

    # Equi-joins only — a cartesian in any of these is the scale bug the
    # shapes exist to avoid.
    for q in (PA.q_sssp_step, GG.q_assortativity, X.q_weighted_pick,
              X.q_token_budget, B.q_time_to_convert):
        assert "CartesianProduct" not in P.formatted_plan(q(spark, sf_dir)), q.__name__
    # Bounded-domain rollups: trend fit is one fact aggregate + one
    # (type × days) aggregate — at most two exchanges plus the tiny sort.
    assert P.count_exchanges(TS.q_trend_fit(spark, sf_dir)) <= 2
    # Assortativity's degree tables enter as broadcasts.
    assert P.count_broadcast_joins(GG.q_assortativity(spark, sf_dir)) >= 1
