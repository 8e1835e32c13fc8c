"""Oracle-checked sketch queries (md5-bucket forms): accuracy contracts
that the SQL oracle can't express — the estimates must actually be close
to the truth, not just reproducible."""

from __future__ import annotations

from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.operators import sketches as S
from tests.conftest import SMOKE_SF_DIR


def test_cm_heavy_recall_is_one(spark):
    """CM only overestimates → every TRUE φ-heavy part key must survive
    the gate (the guarantee the sketch exists to provide)."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    counts = t.lineitem.groupBy("l_partkey").agg(F.count("*").alias("n"))
    n_total = t.lineitem.count()
    true_heavy = {
        r["l_partkey"]
        for r in counts.filter(F.col("n") * S.HEAVY_PHI_INV >= n_total).collect()
    }
    kept = {r["l_partkey"] for r in S.q_cm_heavy(spark, SMOKE_SF_DIR).collect()}
    assert true_heavy <= kept, f"missed heavy hitters: {true_heavy - kept}"


def test_cm_estimates_upper_bound_truth(spark):
    """est ≥ true count for every key (min over depth cells of sums that
    each include the key's own contribution)."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    truth = t.lineitem.groupBy("l_partkey").agg(F.count("*").alias("n"))
    ests = S.q_cm_heavy(spark, SMOKE_SF_DIR)
    bad = ests.join(truth, "l_partkey").filter(F.col("est_count") < F.col("n"))
    assert bad.isEmpty()


def test_kmv_estimate_in_range(spark):
    row = S.q_kmv_distinct(spark, SMOKE_SF_DIR).first()
    assert row["k"] == min(S.KMV_K, row["true_distinct"])
    if row["k"] < S.KMV_K:  # small-range branch: the count is exact
        assert row["est_distinct"] == row["true_distinct"]
    # KMV relative error ~ 1/sqrt(k) ≈ 18%; allow 3σ.
    assert 0.4 * row["true_distinct"] <= row["est_distinct"] <= 2.5 * row["true_distinct"]


def test_hll_registers_complete_and_bounded(spark):
    rows = S.q_hll_registers(spark, SMOKE_SF_DIR).collect()
    assert len(rows) <= S.HLL_M
    for r in rows:
        assert 0 <= r["reg"] < S.HLL_M
        assert 1 <= r["max_rank"] <= S.KMV_BITS - 5 + 1


def test_hll_estimate_in_range(spark):
    row = S.q_hll_estimate(spark, SMOKE_SF_DIR).first()
    # HLL relative error ~ 1.04/sqrt(m) ≈ 18% at m=32; allow 3σ.
    assert 0.4 * row["true_distinct"] <= row["est_distinct"] <= 2.5 * row["true_distinct"]
    assert row["n_zero"] >= 0
