"""MLlib MinHashLSH variant recalls the deterministic pipeline's pairs."""

from __future__ import annotations


def test_mllib_minhash_recalls_true_pairs(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.dedup import (
        minhash_lsh_candidates,
        q_dedup_minhash,
    )

    truth = {(r.doc_a, r.doc_b) for r in q_dedup_minhash(spark, sf_dir).collect()}
    found = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_candidates(spark, sf_dir, 0.35).collect()
    }
    assert truth, "fixture should contain near-dup pairs"
    recall = len(truth & found) / len(truth)
    assert recall >= 0.9, f"recall {recall:.2f}; missed {sorted(truth - found)[:5]}"


def test_profile_counts(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.stats import q_profile
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    orders = load_tables(spark, sf_dir).orders
    prof = {r.col_name: r for r in q_profile(spark, sf_dir).collect()}
    assert set(prof) == set(orders.columns)
    n = orders.count()
    for r in prof.values():
        assert r.n_rows == n
        assert 0 <= r.n_distinct <= n
