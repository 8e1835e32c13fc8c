"""Fixed-point arithmetic helpers (the q_rating_baseline determinism
discipline): exact scaled BIGINTs with integer-exact half-up rounding,
so no cross-engine double rounding ever sits in a hashed output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up(num: Column, den: Column) -> Column:
    """Round-half-up of the exact rational num/den (den > 0) as a BIGINT:
    floor((2·num + den) / (2·den)). Rounds toward +∞ for negative num.

    Integer-exact for operands ≤ 2^53: the double division is then
    correctly rounded in BOTH Spark and DuckDB, so the floor is
    bit-identical across engines (the q_rating_baseline discipline —
    see the cross-engine property test in tests/test_property_differential.py).
    The DuckDB oracle twin is the literal expression
    ``CAST(floor((2*N + D) / (2*D)) AS BIGINT)``.
    """
    return F.floor((2 * num + den) / (2 * den)).cast("bigint")
