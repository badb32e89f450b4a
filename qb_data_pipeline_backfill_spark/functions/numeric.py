"""Numeric expression helpers shared across the query surface.

Floating-point sums are not associative: with Spark's partial (map-
side) aggregation the addition order depends on partitioning, so
``ROUND(SUM(double), 2)`` can flip its last digit between runs or
between engines when the true sum sits near a rounding boundary.
The fix used across every registered query: sum an exact
``DECIMAL(18, 6)`` (associative, engine-independent), round, and cast
back to double. The DuckDB oracles apply the identical
``CAST(ROUND(SUM(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)`` shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decimal_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive SUM of a double: exact decimal accumulate →
    round(`scale`) → double.

    Spark widens the accumulator (DECIMAL(28,6) for a DECIMAL(18,6)
    input), so 100 TB of partials cannot overflow for values < 1e12.

    Rejected alternative: a scaled-integer sum
    (``SUM(CAST(ROUND(x*1e6) AS BIGINT))/1e6``) compiles ~1 s faster
    per query locally (long adds vs BigDecimal), but its accumulator
    caps at 2^63 micro-units ≈ 9e12 in value — a 100 TB fact table's
    grand totals (~1e17) overflow it, where the decimal accumulator
    still has 5 orders of headroom and fails loudly under ANSI beyond
    that.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(18,6)")), scale).cast("double")


def micro_units(col: Column | str) -> Column:
    """Exact integer micro-units of a double carrying ≤ 6 true
    decimals: ``CAST(x AS DECIMAL(18,6)) * 10^6`` as DECIMAL(38,0).
    The decimal cast is exact for such values (unlike ``x * 1e6`` in
    double, which can land off the integer). Shared by the profile /
    outlier / covariance operators.

    DuckDB oracle shape:
    ``CAST(CAST(x AS DECIMAL(18,6)) * 1000000 AS HUGEINT)``
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(18,6)") * F.lit(10**6)).cast("decimal(38,0)")


def _exact_int_div(a: Column, b: Column) -> Column:
    """Exact integer quotient of non-negative decimal integers.

    ``(a - pmod(a, b)) / b``: the numerator is exactly divisible, so
    the decimal division lands on an integer and Catalyst's quotient-
    scale rounding (HALF_UP at the adjusted scale) has nothing to
    round — exact at any magnitude, unlike ``floor(a / b)`` whose
    pre-floor rounding can cross an integer when the true quotient is
    within 5e-7 of it (live risk once group counts pass ~2e6 rows).
    """
    return ((a - F.pmod(a, b)) / b).cast("long")


def decimal_avg(col: Column | str, scale: int = 4) -> Column:
    """Order- and engine-independent mean of a double column of ANY
    sign, truncated toward zero at ``scale`` decimals.

    Why not ``ROUND(AVG(x), s)``: Spark rounds a double through Java's
    shortest-decimal string (``BigDecimal.valueOf``), DuckDB rounds
    the binary value — on a half boundary (e.g. a true mean of
    38.37875) they flip opposite ways. And the double SUM inside AVG
    is partial-order dependent to begin with. Fix: exact
    DECIMAL(18,6) sum -> integer micro-units -> exact integer
    division at 1e-``scale`` units -> small-int / 10^scale, which is
    exact in a double. No rounding of an inexact value ever happens
    on either engine.

    The division TRUNCATES toward zero (``trunc_int_div``), matching
    DuckDB's integer ``//`` — verified: HUGEINT ``-7 // 2`` is -3.
    The previous floor-division (pmod construction) agreed only for
    non-negative sums; a NEGATIVE mean silently diverged from the
    oracle by one unit in the last place (r7 latent defect — the
    covariance path already truncated).

    DuckDB oracle shape (scale=4):
    ``CAST(CAST(SUM(CAST(x AS DECIMAL(18,6))) * 1000000 AS HUGEINT)
    // (100 * COUNT(x)) AS DOUBLE) / 10000.0``
    """
    c = F.col(col) if isinstance(col, str) else col
    micro = (F.sum(c.cast("decimal(18,6)")) * F.lit(10**6)).cast("decimal(38,0)")
    div = (F.count(c) * F.lit(10 ** (6 - scale))).cast("decimal(38,0)")
    return (trunc_int_div(micro, div) / F.lit(float(10**scale))).alias("avg")


def trunc_int_div(num: Column, den: Column) -> Column:
    """Exact integer quotient TRUNCATED toward zero for a possibly-
    negative numerator (positive denominator) — matching DuckDB's
    integer ``//``, which truncates where ``_exact_int_div``'s pmod
    construction floors."""
    mag = _exact_int_div(F.abs(num), den)
    return F.when(num < 0, -mag).otherwise(mag)


def dyadic_mean(col: Column | str, bits: int = 20) -> Column:
    """Engine-exact mean of a float/double column of ANY sign, in
    dyadic (power-of-two) units.

    The decimal-cast helpers above round a double to decimal digits —
    and a float whose exact binary expansion sits ON a decimal half
    boundary (e.g. multiples of 1/128 at 6dp) rounds HALF_UP through
    Java's string path but away-from-zero on the binary value in
    DuckDB: a real one-unit divergence hit by the k-means gate (safe
    for this repo's business doubles, which carry <=2 true decimals,
    but NOT for full-precision floats like embeddings). Also note
    DuckDB's integer ``//`` truncates toward zero while
    ``_exact_int_div`` floors — they agree only for non-negative
    numerators, so the sign is handled explicitly here. Dyadic
    quantization has no rounding boundary at all: ``x * 2^bits`` is
    EXACT in binary (pure exponent shift) and ``floor`` of an exact
    double is unambiguous, so both engines produce identical integers;
    the truncated integer mean over those is then exact, and dividing
    by ``2^bits`` is again exact in a double.

    DuckDB oracle shape (bits=20):
    ``CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1048576) AS HUGEINT))
    // COUNT(x) AS DOUBLE) / 1048576.0`` (``//`` truncates there).
    """
    c = F.col(col) if isinstance(col, str) else col
    m = F.floor(c.cast("double") * F.lit(float(2**bits))).cast("decimal(38,0)")
    s1 = F.sum(m)
    n = F.count(c).cast("decimal(38,0)")
    return trunc_int_div(s1, n) / F.lit(float(2**bits))


def int_ratio(num: Column, den: Column, scale: int = 4) -> Column:
    """num/den for non-negative integer columns, truncated to ``scale``
    decimals, exact on both engines at any magnitude.

    DuckDB oracle shape (scale=4):
    ``CAST(CAST(num AS HUGEINT) * 10000 // den AS DOUBLE) / 10000.0``
    """
    scaled = (num.cast("decimal(38,0)") * F.lit(10**scale)).cast("decimal(38,0)")
    return _exact_int_div(scaled, den.cast("decimal(38,0)")) / F.lit(float(10**scale))
