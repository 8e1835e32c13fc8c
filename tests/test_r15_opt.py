"""Round-15 optimization pins: the rewritten fast paths must be EXACTLY
the old semantics.

- vectors.py literal-dim unroll: the left-associated Add chain must be
  BITWISE identical to the sequential F.aggregate fold (same IEEE op
  sequence), on real fixture embeddings and on adversarial values.
- money.py wide split-sum: (Σ(u>>20))·2^20 + Σ(u & 0xFFFFF) recombined in
  DECIMAL(38,0) must equal the per-row-decimal sum for positives,
  negatives, nulls, and past-2^53 magnitudes.
- money.py exact_avg BIGINT sum: value-identical to the per-row-decimal
  form on grid money data.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.functions import money
from machinelearningalgomapreduce_spark.functions.vectors import (
    _indices,
    dot,
    norm,
    sq_dist,
    sq_norm,
)


def _bits(x: float | None) -> str | None:
    return None if x is None else struct.pack("<d", x).hex()


def _fold_dot(a, b, dim):
    return F.aggregate(
        _indices(a, dim), F.lit(0.0),
        lambda acc, i: acc + a[i].cast("double") * b[i].cast("double"))


def _fold_sq_dist(a, b, dim):
    return F.aggregate(
        _indices(a, dim), F.lit(0.0),
        lambda acc, i: (acc + (a[i].cast("double") - b[i].cast("double"))
                        * (a[i].cast("double") - b[i].cast("double"))))


def test_unrolled_dot_bitwise_equals_fold_on_fixtures(spark, sf_dir):
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    emb = load_tables(spark, sf_dir).embeddings.limit(200)
    rows = emb.select(
        "vec_id",
        dot(F.col("embedding"), F.col("embedding"), 64).alias("u"),
        _fold_dot(F.col("embedding"), F.col("embedding"), 64).alias("f"),
        sq_norm(F.col("embedding"), 64).alias("un"),
        norm(F.col("embedding"), 64).alias("unorm"),
    ).collect()
    assert rows
    for r in rows:
        assert _bits(r.u) == _bits(r.f), f"vec {r.vec_id}: unroll != fold"
        assert _bits(r.un) == _bits(r.f), "sq_norm(self) != dot(self,self)"


def test_unrolled_sq_dist_bitwise_equals_fold_adversarial(spark):
    # Values chosen to expose any reassociation: wildly different exponents
    # interleaved with sign flips — float32 inputs as in the fixtures.
    vals = [
        ([1e30, -1e30, 1.0, 3e-8], [0.0, 0.0, 0.0, 0.0]),
        ([0.1, 0.2, 0.3, 0.4], [0.4, 0.3, 0.2, 0.1]),
        ([-0.0, 0.0, 5e7, -5e7], [0.0, -0.0, -5e7, 5e7]),
        ([3.3333333, 1e-20, -7.77, 2.5], [1.1, -1e20, 7.77, -2.5]),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(vals)],
        "id int, a array<float>, b array<float>",
    )
    rows = df.select(
        sq_dist(F.col("a"), F.col("b"), 4).alias("u"),
        _fold_sq_dist(F.col("a"), F.col("b"), 4).alias("f"),
        dot(F.col("a"), F.col("b"), 4).alias("ud"),
        _fold_dot(F.col("a"), F.col("b"), 4).alias("fd"),
    ).collect()
    for r in rows:
        assert _bits(r.u) == _bits(r.f)
        assert _bits(r.ud) == _bits(r.fd)


def test_wide_split_sum_equals_decimal_sum(spark):
    # Positives, negatives, zero, null, and magnitudes past 2^53 whose SUM
    # exceeds 2^63 (the reason wide exists): split-sum in DECIMAL must give
    # the same cents as the old per-row DECIMAL(38,0) accumulation.
    big = (1 << 61) + 12345  # 2.3e18: three of these overflow a BIGINT sum
    units = [big, big, big, -big, 7, -13, 0, None, (1 << 54) + 1, 99]
    df = spark.createDataFrame([(u,) for u in units], "u long")

    def old_wide(units_col, d):
        s = F.sum(units_col.cast("decimal(38,0)"))
        cents = s if d == 1 else money.round_half_away(s, d)
        return cents.cast("double") / 100

    for d in (1, 100, 10000):
        got = df.agg(money.money_sum_2dp(F.col("u"), d=d, wide=True).alias("x")).collect()[0].x
        want = df.agg(old_wide(F.col("u"), d).alias("x")).collect()[0].x
        assert _bits(got) == _bits(want), f"d={d}: {got} != {want}"

    # all-null input stays NULL (sum semantics) in the split form too
    dfn = spark.createDataFrame([(None,), (None,)], "u long")
    assert dfn.agg(money.money_sum_2dp(F.col("u"), wide=True).alias("x")).collect()[0].x is None


def test_exact_avg_bigint_sum_equals_decimal_sum(spark):
    def old_exact_avg(units_col, per_unit=100, dp=6):
        s = F.sum(units_col.cast("decimal(38,0)"))
        n = F.count(F.lit(1))
        scale = 10 ** dp
        q = money.round_half_away(s * F.lit(scale), F.lit(per_unit) * n)
        return q.cast("double") / scale

    # grid money values incl. a half-boundary avg (sum=101 cents over 2 rows
    # -> 0.505 dollars: dp=6 is exact, dp=2 would be the boundary class)
    df = spark.createDataFrame([(37,), (64,), (12345,), (-9999,), (0,)], "u long")
    for per_unit, dp in ((100, 6), (1, 6), (100, 2)):
        got = df.agg(money.exact_avg(F.col("u"), per_unit, dp).alias("x")).collect()[0].x
        want = df.agg(old_exact_avg(F.col("u"), per_unit, dp).alias("x")).collect()[0].x
        assert _bits(got) == _bits(want), f"per_unit={per_unit} dp={dp}"
