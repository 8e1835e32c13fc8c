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
