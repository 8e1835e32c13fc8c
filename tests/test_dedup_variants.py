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


def test_brp_lsh_neighbors_overlap_brute_force(spark, sf_dir):
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.functions.vectors import sq_dist
    from machinelearningalgomapreduce_spark.operators.similarity import brp_lsh_neighbors
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    approx = {r.vec_id for r in brp_lsh_neighbors(spark, sf_dir, key_id=0, k=10).collect()}
    e = load_tables(spark, sf_dir).embeddings
    key = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("kv"))
    brute = {
        r.vec_id
        for r in (
            e.crossJoin(F.broadcast(key))
            .filter(F.col("vec_id") != 0)
            .select("vec_id", sq_dist(F.col("embedding"), F.col("kv")).alias("d"))
            .orderBy("d", "vec_id")
            .limit(10)
            .collect()
        )
    }
    # Euclidean-LSH recall on the true 10-NN set; seed fixed → deterministic.
    assert len(approx & brute) >= 5, sorted(approx & brute)


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
