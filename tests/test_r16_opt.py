"""Round-16 optimization pins.

- session.py ANSI pin (ADVICE r15, medium): the money-sum overflow posture
  ("loud, not silent") is only real if spark.sql.ansi.enabled is actually
  TRUE — get_spark must pin it and ensure_query_conf must re-assert it on
  driver-provided sessions, and a BIGINT sum past 2^63 must ABORT.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.functions import money


def test_session_pins_ansi(spark):
    # The pytest session comes from get_spark — ANSI must be ON, pinned
    # (not merely inherited from the PySpark 4.x default).
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_ensure_query_conf_restores_ansi(spark):
    from machinelearningalgomapreduce_spark.session import ensure_query_conf

    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        ensure_query_conf(spark)
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")


def test_bigint_sum_past_2_63_aborts_not_wraps(spark):
    # Three rows of ~2^62: Σ > 2^63. With ANSI on this must raise
    # ARITHMETIC_OVERFLOW; with ANSI off it would wrap silently into a
    # negative "money" value — the failure mode the pin exists to prevent.
    big = (1 << 62) + 11
    df = spark.createDataFrame([(big,), (big,), (big,)], "u long")
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(F.sum("u").alias("s")).collect()


def test_wide_split_sum_hi_leg_overflow_aborts(spark):
    # The wide split-sum's hi leg is Σ(u >> 20): per-row values up to
    # 2^42 for u ≈ 2^62, so ~2^21 such rows breach 2^63 in the LEG sum
    # even though each row is a valid BIGINT. ANSI must abort the leg, not
    # wrap it into a wrong DECIMAL recombination. (The lo leg is bounded
    # by 2^20 per row — it cannot overflow before ~8.8e12 rows, documented
    # in money.py.)
    n = (1 << 21) + (1 << 18)  # 2.36M rows: Σ(u>>20) ≈ 1.13 · 2^63
    df = spark.range(n).select(F.lit((1 << 62) + 7).alias("u"))
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(money.money_sum_2dp(F.col("u"), wide=True).alias("x")).collect()
