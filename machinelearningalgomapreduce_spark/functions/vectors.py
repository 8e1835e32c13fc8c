"""Vector math over ARRAY<FLOAT> columns as pure Catalyst expressions.

The reference's vector type is a delimited string re-parsed per job
(SURVEY.md §1.1); ours is a native array column, and all math stays JVM-side
inside whole-stage codegen — no Python UDFs in the hot path.

Determinism: folds run sequentially over the array in both Spark and DuckDB,
and float→double casts are exact, so dot/norm/distance are bit-identical to
the oracle's `list_sum(list_transform(...))` form (SURVEY.md §5.2.3). This is
what lets cosine/k-means queries be hash-checked without rounding.

Scale: a 64-dim fold is ~64 fused multiply-adds per row of codegen'd JVM —
at 100 TB this is compute-bound and embarrassingly parallel; no shuffle is
introduced by any function here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def fsum(arr: Column) -> Column:
    """Sequential left-fold sum of a double array (order-deterministic)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return fsum(F.zip_with(as_double(a), as_double(b), lambda x, y: x * y))


def sq_norm(a: Column) -> Column:
    return fsum(F.transform(as_double(a), lambda x: x * x))


def norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sq_dist(a: Column, b: Column) -> Column:
    return fsum(F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)))
