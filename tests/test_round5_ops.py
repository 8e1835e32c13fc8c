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
