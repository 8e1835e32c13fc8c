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


def _split_halves(df, key):
    left = df.filter(F.col(key) % 2 == 0)
    right = df.filter(F.col(key) % 2 == 1)
    return left, right


def test_bloom_merge_equals_whole_build(spark):
    """build(A ∪ B) ≡ merge(build(A), build(B)) — exact bit-set equality."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    keys = t.lineitem.select("l_partkey").distinct()

    def bits_of(df):
        return df.select(
            F.explode(
                F.array(*[S._bloom_bit(F.col("l_partkey"), r) for r in range(S.BLOOM_K)])
            ).alias("bit_idx")
        ).distinct()

    left, right = _split_halves(keys, "l_partkey")
    whole = {r["bit_idx"] for r in bits_of(keys).collect()}
    merged = {
        r["bit_idx"]
        for r in S.bloom_merge(bits_of(left), bits_of(right)).collect()
    }
    assert whole == merged


def test_kmv_merge_equals_whole_sketch(spark):
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    hashes = t.events.select(
        S._md5_hex_int(F.col("user_id"), "kmv:", 13).alias("h")
    ).distinct()
    left, right = _split_halves(hashes, "h")
    whole = sorted(r["h"] for r in hashes.orderBy("h").limit(S.KMV_K).collect())
    merged = sorted(r["h"] for r in S.kmv_merge(left, right).collect())
    assert whole == merged


def test_hll_register_merge_equals_whole_build(spark):
    regs = S.q_hll_registers(spark, SMOKE_SF_DIR)
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    h = S._md5_hex_int(F.col("user_id"), "hll:", 13)
    keys = t.events.select(h.alias("h")).distinct()

    def regs_of(df):
        return df.select(
            F.pmod(F.col("h"), F.lit(S.HLL_M)).alias("reg"),
            F.expr(f"h DIV {S.HLL_M}").alias("w"),
        ).select(
            "reg",
            F.when(F.col("w") == 0, F.lit(S.KMV_BITS - 5 + 1))
            .otherwise(F.log2(F.col("w").bitwiseAND(-F.col("w"))).cast("int") + 1)
            .alias("rho"),
        ).groupBy("reg").agg(F.max("rho").alias("max_rank"))

    left, right = _split_halves(keys, "h")
    whole = {(r["reg"], r["max_rank"]) for r in regs.collect()}
    merged = {
        (r["reg"], r["max_rank"])
        for r in S.hll_merge_registers(regs_of(left), regs_of(right)).collect()
    }
    assert whole == merged


def test_quantile_hist_merge_equals_whole_build(spark):
    """build(A ∪ B) ≡ merge(build(A), build(B)) — exact bin-table
    equality, the algebra that lets per-shard histograms combine."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    left = t.lineitem.filter(F.pmod("l_orderkey", F.lit(2)) == 0)
    right = t.lineitem.filter(F.pmod("l_orderkey", F.lit(2)) == 1)
    whole = S.quantile_hist_build(t.lineitem, "l_extendedprice")
    merged = S.quantile_hist_merge(
        S.quantile_hist_build(left, "l_extendedprice"),
        S.quantile_hist_build(right, "l_extendedprice"),
    )
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert canon(whole) == canon(merged)


def test_quantile_hist_estimate_brackets_true_quantile(spark):
    """Each estimate must be >= the true rank-pct value and overshoot it
    by less than one bin width (the histogram's error guarantee)."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, SMOKE_SF_DIR)
    cents = sorted(
        r["c"]
        for r in t.lineitem.select(
            F.round(F.col("l_extendedprice") * 100.0, 0).cast("bigint").alias("c")
        ).collect()
    )
    n = len(cents)
    est = {
        r["pct"]: r["est_cents"]
        for r in S.q_quantile_hist(spark, SMOKE_SF_DIR).collect()
    }
    assert set(est) == set(S.QHIST_PCTS)
    for pct in S.QHIST_PCTS:
        # smallest value whose rank reaches pct% of N (ceil semantics,
        # matching cum*100 >= pct*n)
        true_q = cents[-(-pct * n // 100) - 1]
        assert est[pct] >= true_q, (pct, est[pct], true_q)
        assert est[pct] - true_q < S.QHIST_WIDTH, (pct, est[pct], true_q)


def test_quantile_hist_floor_buckets_negative_values(spark):
    """Bucketing must FLOOR, not truncate: negative cents belong to
    negative buckets, and the one-bin-width bracket guarantee must hold
    on a value column that goes below zero (truncating div folds
    (-width, 0) into bucket 0, making bucket 0 span TWO widths)."""
    rows = [(-75_000.0 / 100,), (-250.0 / 100,), (25_000.0 / 100,), (75_000.0 / 100,)]
    df = spark.createDataFrame(rows, "v double")
    hist = {r["bucket"]: r["cnt"] for r in S.quantile_hist_build(df, "v").collect()}
    assert hist == {-2: 1, -1: 1, 0: 1, 1: 1}
    est = {
        r["pct"]: r["est_cents"]
        for r in S.quantile_hist_estimate(S.quantile_hist_build(df, "v")).collect()
    }
    # p25 rank-1 value is -75000: estimate must bracket it within one width
    assert -75_000 <= est[25] < -75_000 + S.QHIST_WIDTH
