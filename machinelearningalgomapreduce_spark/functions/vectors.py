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


def _indices(a: Column, dim: int | None) -> Column:
    # With a literal dim the sequence is constant-folded once per plan;
    # otherwise it is built per row (still cheaper than materializing
    # cast/zip intermediate arrays — measured 25% on the kNN join).
    return F.sequence(F.lit(0), F.lit(dim - 1) if dim else F.size(a) - 1)


# Unroll bound (r15, measured both ways): a literal-dim fold unrolled into
# a left-associated Add chain is the exact IEEE op sequence of the fold
# (pinned bitwise in tests/test_r15_opt.py) and for SMALL dims it runs as
# compact whole-stage-codegen arithmetic — the PQ sub-vector kernels
# (dim 8) win outright. For LARGE dims the chain is a pessimization: 64
# terms emit ~128 GetArrayItem calls in one codegen consume() whose
# per-pair cost measured 4x WORSE than the interpreted sequential fold on
# the cached bench tier (0.83 s vs 0.20 s on the kNN scoring stage), and
# past ~8000 bytecodes the JIT refuses the method outright. The fold
# stays the large-dim form.
_UNROLL_MAX_DIM = 16


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Pairwise product sum, one pass, no intermediate cast/zip arrays.

    Literal ``dim`` ≤ _UNROLL_MAX_DIM unrolls (same IEEE op sequence —
    bit-identical, see the bound's comment); larger/unknown dims keep the
    sequential fold, bit-identical to the DuckDB
    `list_sum(list_transform(...))` oracles."""
    if dim and dim <= _UNROLL_MAX_DIM:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            acc = acc + a[i].cast("double") * b[i].cast("double")
        return acc
    return F.aggregate(
        _indices(a, dim),
        F.lit(0.0),
        lambda acc, i: acc + a[i].cast("double") * b[i].cast("double"),
    )


def sq_norm(a: Column, dim: int | None = None) -> Column:
    if dim and dim <= _UNROLL_MAX_DIM:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            acc = acc + a[i].cast("double") * a[i].cast("double")
        return acc
    return F.aggregate(
        _indices(a, dim),
        F.lit(0.0),
        lambda acc, i: acc + a[i].cast("double") * a[i].cast("double"),
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(sq_norm(a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def sq_dist(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim and dim <= _UNROLL_MAX_DIM:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            d = a[i].cast("double") - b[i].cast("double")
            acc = acc + d * d
        return acc
    return F.aggregate(
        _indices(a, dim),
        F.lit(0.0),
        lambda acc, i: (
            acc + (a[i].cast("double") - b[i].cast("double"))
            * (a[i].cast("double") - b[i].cast("double"))
        ),
    )


def jl_signs(seed: str, out_dim: int, in_dim: int) -> list[list[float]]:
    """Deterministic ±1/√out_dim Johnson-Lindenstrauss projection matrix.

    Entries derive from md5(seed:i:j) parity — reproducible across runs,
    engines and partitionings with no RNG state to ship; the Achlioptas
    sign matrix satisfies the JL lemma the same as Gaussian entries."""
    import hashlib

    scale = 1.0 / out_dim**0.5
    return [
        [
            scale
            if int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest(), 16) & 1
            else -scale
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]


def random_project(
    vec: Column, seed: str, out_dim: int, in_dim: int
) -> Column:
    """JL random projection to out_dim, JVM-side: one dot product per
    output coordinate against the literal sign matrix (no Python per row,
    no shuffle — a pure projection any scan can carry). Distances are
    preserved within (1±ε) for out_dim = O(log n / ε²); the 100 TB use is
    cutting ANN/dedup embedding width before the bucketed join."""
    rows = jl_signs(seed, out_dim, in_dim)
    return F.array(
        *[
            fsum(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in row]),
                    lambda x, r: x.cast("double") * r,
                )
            )
            for row in rows
        ]
    )
