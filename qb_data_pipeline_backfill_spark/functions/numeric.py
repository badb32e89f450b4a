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
