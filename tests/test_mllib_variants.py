"""MLlib-backed variants of the oracle-checked pure-DF algorithms."""

from __future__ import annotations


def test_tfidf_fit(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.text import tfidf_fit

    model, transformed = tfidf_fit(spark, sf_dir)
    assert transformed.count() > 0
    row = transformed.select("tfidf").first()
    assert row.tfidf.size == 1 << 10


def test_naive_bayes_fit(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import naive_bayes_fit

    model = naive_bayes_fit(spark, sf_dir)
    assert model.numClasses >= 2  # fixture has 5 langs


def test_linreg_fit(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import linreg_fit

    model = linreg_fit(spark, sf_dir)
    assert len(model.coefficients) == 63


def test_logreg_fit(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import logreg_fit

    model = logreg_fit(spark, sf_dir)
    assert model.numClasses == 2


def test_pca_fit_variance_ordering(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import pca_fit

    model, transformed = pca_fit(spark, sf_dir, k=8)
    ev = list(model.explainedVariance)
    assert len(ev) == 8
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    row = transformed.first()
    assert len(row.pca) == 8


def test_word2vec_fit_vocab_and_synonyms(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import word2vec_fit

    model = word2vec_fit(spark, sf_dir, dim=16)
    vectors = model.getVectors()
    assert vectors.count() > 10  # fixture vocab is ~31 shared tokens
    some_word = vectors.first().word
    syns = model.findSynonyms(some_word, 3)
    assert syns.count() == 3


def test_als_fit_recommends(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import als_fit

    model = als_fit(spark, sf_dir, rank=4)
    recs = model.recommendForAllUsers(3)
    row = recs.first()
    assert len(row.recommendations) == 3
    assert model.rank == 4


def test_random_forest_fit_beats_chance(spark, sf_dir):
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.operators.ml import random_forest_fit

    model, scored = random_forest_fit(spark, sf_dir, n_trees=10)
    acc = scored.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double"))
    ).first()[0]
    # Train-set accuracy on a 50/50-ish target; chance is ~0.5.
    assert acc > 0.55, acc
    assert model.getNumTrees == 10


def test_gbt_fit_beats_chance(spark, sf_dir):
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.operators.ml import gbt_fit

    model, scored = gbt_fit(spark, sf_dir, n_iter=5)
    acc = scored.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double"))
    ).first()[0]
    assert acc > 0.55, acc
    assert model.getNumTrees == 5


def test_bisecting_kmeans_fit_partitions_all(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import bisecting_kmeans_fit

    model, assigned = bisecting_kmeans_fit(spark, sf_dir, k=10)
    n_clusters = assigned.select("prediction").distinct().count()
    assert 2 <= n_clusters <= 10
    assert assigned.count() == assigned.select("vec_id").distinct().count()


def test_gmm_fit_soft_assignments_sum_to_one(spark, sf_dir):
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.operators.ml import gmm_fit

    model, scored = gmm_fit(spark, sf_dir, k=5)
    assert len(model.weights) == 5
    assert abs(sum(model.weights) - 1.0) < 1e-6
    # Per-row responsibilities sum to 1.
    from pyspark.ml.functions import vector_to_array

    bad = (
        scored.select(
            F.abs(
                F.aggregate(
                    vector_to_array("probability"), F.lit(0.0), lambda a, x: a + x
                )
                - 1.0
            ).alias("err")
        )
        .filter(F.col("err") > 1e-6)
        .count()
    )
    assert bad == 0


def test_decision_tree_fit_beats_chance(spark, sf_dir):
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.operators.ml import decision_tree_fit

    model, scored = decision_tree_fit(spark, sf_dir, max_depth=4)
    acc = scored.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double"))
    ).first()[0]
    assert acc > 0.55, acc
    assert model.depth <= 4


def test_prefixspan_fit_finds_singletons(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import prefixspan_fit
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    pats = prefixspan_fit(spark, sf_dir, min_support=0.2).collect()
    assert pats
    # Every frequent singleton must be a genuinely frequent event type.
    t = load_tables(spark, sf_dir)
    n_users = t.events.select("user_id").distinct().count()
    from pyspark.sql import functions as F

    per_type = {
        r.event_type: r.n
        for r in t.events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for p in pats:
        seq = [list(s) for s in p.sequence]
        assert p.freq >= 0.2 * n_users
        if len(seq) == 1 and len(seq[0]) == 1:
            # singleton support == users having that type at least once
            assert p.freq == per_type[seq[0][0]]
    # Longer patterns can never out-support their prefixes (anti-monotone).
    freqs = {tuple(tuple(s) for s in p.sequence): p.freq for p in pats}
    for seq, f in freqs.items():
        if len(seq) > 1 and seq[:-1] in freqs:
            assert f <= freqs[seq[:-1]]


def test_lda_fit_topics_well_formed(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import lda_fit

    model, topics = lda_fit(spark, sf_dir, k=5)
    rows = topics.collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r.termIndices) == 5
        # Term weights are probabilities within a topic: positive, ordered.
        ws = list(r.termWeights)
        assert all(w > 0 for w in ws) and ws == sorted(ws, reverse=True)
    assert model.vocabSize() > 0


def test_svd_fit_singular_values_ordered(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import svd_fit

    s, v = svd_fit(spark, sf_dir, k=8)
    vals = list(s)
    assert len(vals) == 8
    assert all(a >= b > 0 for a, b in zip(vals, vals[1:]))
    assert v.numRows == 64 and v.numCols == 8
