"""Skew-mitigation join helpers (SURVEY.md §4.2 '100 TB posture').

AQE's skew-join splitting handles most skew at runtime
(spark.sql.adaptive.skewJoin.enabled is on by default in session.py);
`salted_join` is the explicit fallback for pathological hot keys — e.g. a
null-heavy FK or a celebrity key — where you want the blow-up bounded and
deterministic regardless of runtime statistics.

Shape: the skewed (big) side gets a deterministic salt in [0, n); the
small side is exploded n× so every (key, salt) bucket can match. The hot
key's rows now spread over n reducers instead of one. Cost: small side
replicated n× — keep n modest and the small side genuinely small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small on big[on] == small[on]` with the big side
    salted across `n_salts` buckets.

    The salt is a deterministic hash of the whole big-side row (xxhash64),
    so repeated runs partition identically. Result columns match a plain
    `big.join(small, on, how)`.

    Only 'inner' and 'left' are supported: with 'right'/'full', unmatched
    small-side rows exist once per salt replica and would surface as
    n_salts duplicate null-padded output rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer forms "
            "would emit one null-padded row per salt replica of unmatched "
            "small-side rows"
        )
    salted_big = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("bigint"))
    return salted_big.join(salted_small, [on, SALT_COL], how).drop(SALT_COL)
