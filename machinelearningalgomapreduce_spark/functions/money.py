"""Exact fixed-point money aggregation — closes the ``round(sum(double), k)``
half-boundary class fleet-wide (r15; the q_profit_by_nation r14 recipe,
generalized and centralized).

Why the class is real: every fixture money column sits ON the 2dp grid
(probed at sf0.01 and the 10x tier, r15 — ``events.value``,
``l_extendedprice``, ``l_discount``, ``l_tax``, ``c_acctbal``,
``o_totalprice``, ``p_retailprice``; ``l_quantity`` integral), so TRUE group
sums land exactly on decimal half-boundaries with high probability (the
…728.405 case the 10x parity sweep caught on q_profit_by_nation).
``round(sum(<double>), 2)`` then resolves the boundary by the ±1-ulp
accumulated error of an ORDER-DEPENDENT double sum — Spark and DuckDB can
disagree, and Spark can even disagree with itself across partitionings.

The cure: sum exact integer fixed-point units (BIGINT per row — the double
→ units conversion ``round(col · per_dollar)`` is exact because the double
is within 1 ulp of the grid point), then round the INTEGER sum with the
half-away-from-zero identity ``sign(s) · floor((2|s| + d) / (2d))``.
Order-free, partitioning-free, engine-free.

Two division regimes:
- ``functions/fixedpoint.half_up`` uses double division — correct only for
  operands ≤ 2^53 (fine for its per-row callers).
- Aggregate sums here exceed 2^53 at the 10x tier (q_pricing_summary's
  charge sum is ~5.7e16 in 1e-6-dollar units), so :func:`_floor_div` uses
  the pmod identity on DECIMAL(38,0): ``(n − n mod d) / d`` divides
  exactly, and a decimal division whose quotient is an integer is exact at
  any scale (probed at 1.14e17 in both engines, r15).

Overflow posture: per-site sums are BIGINT by default (fastest; every
call site documents its bound — all hold through the 100x tier with ≥1.6x
headroom). Sites whose 100 TB-scale bound breaks BIGINT pass ``wide=True``
to sum via the exact hi/lo split (two BIGINT legs recombined in
DECIMAL(38,0)) — the DuckDB twin always sums to HUGEINT, so only the
Spark side needs the flag.

r16 site audit (VERDICT r15 item 8): max per-GROUP Σ|u| measured at
sf0.1 and extrapolated ×1e7 (≈ true 100 TB / the 17.6 MB tier), flip
threshold = extrapolated Σ > 1e18 (≲9× headroom under 2^63):

===========================================  =========  ========== =====
site (units)                                 Σ@sf0.1    ×1e7       wide?
===========================================  =========  ========== =====
q_pricing_summary sum_disc_price (1e-4$)     2.7e13     2.7e20     YES
q_pricing_summary sum_charge (1e-6$)         (r15)      ~e22       YES
q_pricing_summary sum_base_price (cents)     2.9e11     2.9e18     YES
q_pricing_summary avg_price row-sum (cents)  2.9e11     2.9e18     YES
q_disjunctive_pred rev (global, filtered)    ≤1.6e13    ≤1.6e20    YES
q_volume_shipping rev (≤1250 fixed groups)   data-prop  breach     YES
q_promo_revenue ratio sums (global)          1.6e13     1.6e20     YES
q_market_share ratio sums (≤7 year groups)   data-prop  breach     YES
q_sample sampled_price (3 fixed groups)      pct-prop   ~e17–e18   YES
q_matmul c_val (200 fixed cells, va·vb_c)    data²-prop breach     YES
events windows sum_value (cents/window·type) 3.5e5      3.5e12     no
customer total_spent (cents/customer)        7.4e8      7.4e15     no
q_top_supplier rev (per supplier, quarter)   const/grp  ~e12       no
q_returned_items rev (per customer)          const/grp  ~e12       no
q_small_qty cents (global, ~1% filter)       ~1.7e10    1.7e17     no*
q_global_sales_rank totacctbal (per cntry)   const-ish  ~e15       no
===========================================  =========  ========== =====
(*54x headroom; revisit if the filter selectivity assumption moves.)
Groups that scale WITH the data (per-customer, per-supplier, per-window)
keep constant Σ per group and stay BIGINT; fixed-cardinality groups
(returnflag, nation pairs, years, matmul cells) absorb the whole growth
and are flipped. Flips are value-identical by construction (pinned in
tests/test_r15_opt.py / test_r16_opt.py); DuckDB twins were always wide.

Residual (documented, not closed here): ``round()`` of a genuinely
continuous-valued double (bm25 scores, chi2 terms, ratio-of-sums) can in
principle differ across engines when the value sits within ~1 ulp of a
half-boundary — but a continuous true value is almost surely OFF every
boundary, unlike grid sums which land ON them; those sites document the
argument instead (see q_bm25 / q_chi2 docstrings).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def units(col: ColumnOrName, per_dollar: int = 100) -> Column:
    """2dp-grid double dollars → exact integer fixed-point BIGINT units.

    ``round(col · per_dollar)`` is exact for grid values: the stored double
    is the nearest double to the grid point, the product is within 1 ulp of
    the integer, and round snaps it. Same guarantee in DuckDB
    (:func:`sql_units` is the literal twin).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * per_dollar).cast("bigint")


def _floor_div(num: Column, den: Column) -> Column:
    """Exact ``floor(num / den)`` for non-negative integer-valued columns.

    pmod form: ``(num − num mod den) / den`` — the numerator divides
    exactly, so the decimal division returns the integer quotient
    untouched, exact far beyond 2^53 (probed at 1.14e17, r15).
    """
    n = num.cast("decimal(38,0)")
    return ((n - F.pmod(n, den)) / den).cast("decimal(38,0)")


def round_half_away(num: Column, den) -> Column:
    """``round-half-away-from-zero(num / den)`` as an exact integer column.

    num: integer-valued (BIGINT or DECIMAL); den: positive int or integer
    Column. The identity ``sign(num) · floor((2|num| + den) / (2·den))``
    — the q_profit_by_nation r14 form, now 2^53-safe via :func:`_floor_div`.
    """
    d = F.lit(den) if isinstance(den, int) else den
    sg = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("decimal(38,0)")
    return sg * _floor_div(F.lit(2) * F.abs(num) + d, F.lit(2) * d)


def _split_sum(units_col: Column) -> Column:
    """Exact ``Σ units`` past the BIGINT cliff (r15): for any long,
    ``u == (u >> 20)·2^20 + (u & 0xFFFFF)`` (two's complement, exact for
    negatives — arithmetic shift is floor division), so two codegen'd
    BIGINT sums recombine in DECIMAL(38,0) once per group. Bounds: lo ∈
    [0, 2^20) ⇒ Σlo holds to 8.8e12 rows; Σhi holds to Σ|u| < 9.7e24.
    NULL-only input stays NULL (both legs NULL)."""
    mask = (1 << 20) - 1
    hi = F.sum(F.shiftright(units_col, 20))
    lo = F.sum(units_col.bitwiseAND(F.lit(mask)))
    return hi.cast("decimal(38,0)") * F.lit(1 << 20) + lo.cast("decimal(38,0)")


def money_sum_2dp(units_col: Column, d: int = 1, wide: bool = False) -> Column:
    """Exact ``Σ units`` → dollars (double) on the 2dp grid.

    units_col: per-row integer fixed-point column (see :func:`units`);
    d: units-per-cent of the summand (1 for cents summands, 100 for
    1e-4-dollar products like price·discount, 10000 for 1e-6-dollar
    double products, 7 for the Q17 ``/7.0`` divisor on a cents summand, …)
    — the result is ``round_half_away(Σ / d)`` cents, cast to double and
    divided by 100 (exact: cents < 2^53 through the 100x tier at every
    call site, and the final division is correctly rounded in both
    engines). ``wide=True`` widens past the BIGINT cliff for sites whose
    unit sum can exceed 2^63 at 100 TB scale. DuckDB twin:
    :func:`sql_money_sum_2dp` (HUGEINT sum + ``//`` — always wide).

    The wide path is an exact SPLIT-SUM, not a per-row DECIMAL cast
    (r15): for any long, ``u == (u >> 20)·2^20 + (u & 0xFFFFF)`` (two's
    complement identity, exact for negatives too — arithmetic shift is
    floor division), so ``Σu == (Σ hi)·2^20 + Σ lo`` recombined in
    DECIMAL(38,0) once per GROUP. Two codegen'd BIGINT sums replace the
    Decimal128 accumulator — measured 2.1× on the q_pricing_summary
    aggregate stage at the bench tier, value-identical. Bounds: lo ∈
    [0, 2^20) ⇒ Σlo holds to 8.8e12 rows (>1 PB of lineitem); Σhi holds
    to Σ|u| < 9.7e24 (the q_pricing_summary charge sum is ~7e22 at a
    100 TB-scale 10^5x — 100× headroom); ANSI mode makes any breach
    loud, not silent.

    Empty/all-null input yields NULL (sum semantics) so existing
    ``coalesce(…, 0.0)`` wrappers keep working.
    """
    s = _split_sum(units_col) if wide else F.sum(units_col)
    cents = s if d == 1 else round_half_away(s, d)
    return cents.cast("double") / 100


def exact_avg(units_col: Column, per_unit: int = 100, dp: int = 6,
              wide: bool = False) -> Column:
    """``round-half-away(avg(col), dp)`` computed exactly from grid units.

    value = Σu / (per_unit · n); at dp digits that is
    ``round_half_away(Σu · 10^dp, per_unit · n) / 10^dp`` — both the sum
    and the rounding are integer-exact, so the avg is order-free even when
    n makes the true value land on a dp half-boundary (possible for grid
    data: cents-sum/100n is rational with a small denominator).

    The SUM itself runs in BIGINT (Σu tops out ~6e12 at the 10x tier and
    ~6e16 at a 100 TB-scale 10^5x — 150× headroom under 2^63, and ANSI
    mode makes a breach loud, not silent); only the GROUP-level result is
    cast to DECIMAL(38,0) before the ·10^dp widening, which is where the
    2^63 cliff actually lives (Σu·10^6 ≈ 6e18 at the 10x tier already).
    Same integers, same result as the previous per-row-decimal form —
    BIGINT vs DECIMAL accumulation of identical integers is value-equal —
    but the per-row decimal cast + Decimal128 adds are gone (r15:
    q_pricing_summary carried 3 of these; measured on the aggregate
    stage). ``wide=True`` (r16) swaps the row sum for the exact hi/lo
    split (:func:`_split_sum`) for sites whose Σu itself approaches 2^63
    at 100 TB scale (see the module audit table) — value-identical.
    DuckDB twin: :func:`sql_exact_avg` (HUGEINT, unchanged).
    """
    s = _split_sum(units_col) if wide else F.sum(units_col).cast("decimal(38,0)")
    n = F.count(F.lit(1))
    scale = 10 ** dp
    q = round_half_away(s * F.lit(scale), F.lit(per_unit) * n)
    return q.cast("double") / scale


def exact_ratio(num_units: Column, den_units: Column, dp: int = 6,
                scale: float = 1.0, wide: bool = False) -> Column:
    """``round(Σnum · scale / Σden, dp)`` with both sums exact integers.

    The sums are order-free BIGINTs; casting each to double is correctly
    rounded (identically in both engines, even past 2^53), so both engines
    round the SAME double. ``wide=True`` (r16) swaps both sums for the
    exact hi/lo split (:func:`_split_sum`; decimal→double cast is also
    correctly rounded) for sites whose Σ breaches 2^63 at 100 TB scale —
    value-identical. Residual: a continuous-valued ratio almost surely
    sits off every dp half-boundary (module docstring), unlike the
    grid-sum class this module closes. DuckDB twin: :func:`sql_exact_ratio`.
    """
    if wide:
        n = _split_sum(num_units).cast("double")
        d = _split_sum(den_units).cast("double")
    else:
        n = F.sum(num_units).cast("double")
        d = F.sum(den_units).cast("double")
    return F.round(n * scale / d, dp)


# --------------------------------------------------------------- SQL twins
# Literal DuckDB fragments for the oracle strings, kept beside the Spark
# builders so the two sides cannot drift. DuckDB sums integers to HUGEINT
# (never overflows here) and ``//`` is exact integer division on HUGEINT.

def sql_units(expr: str, per_dollar: int = 100) -> str:
    return f"CAST(round(({expr}) * {per_dollar}) AS BIGINT)"


def _sql_half_away(num: str, den: str) -> str:
    return (f"(CASE WHEN {num} < 0 THEN -((2 * (-({num})) + {den}) // (2 * {den})) "
            f"ELSE ((2 * ({num}) + {den}) // (2 * {den})) END)")


def sql_money_sum_2dp(units_expr: str, d: int = 1) -> str:
    s = f"sum({units_expr})"
    cents = s if d == 1 else _sql_half_away(s, str(d))
    return f"CAST({cents} AS DOUBLE) / 100"


def sql_exact_avg(units_expr: str, per_unit: int = 100, dp: int = 6) -> str:
    scale = 10 ** dp
    num = f"(sum({units_expr}) * {scale})"
    den = f"({per_unit} * count(*))"
    return f"CAST({_sql_half_away(num, den)} AS DOUBLE) / {scale}"


def sql_exact_ratio(num_units: str, den_units: str, dp: int = 6,
                    scale: str = "1.0") -> str:
    return (f"round(CAST(sum({num_units}) AS DOUBLE) * {scale} "
            f"/ CAST(sum({den_units}) AS DOUBLE), {dp})")
