"""As-of (backward temporal) join — an operator Spark's join set lacks.

``asof_join_backward(left, right, ...)`` attaches to every left row the
single right row with the greatest right-time ≤ left-time for the same
key (LEFT OUTER semantics: unmatched left rows keep NULL payload).
The classic uses: point-in-time feature lookup ("the customer's last
order as of this event"), slowly-changing-dimension resolution, and
trade/quote alignment.

Implementation is the scale-correct *union + ordered-window carry-
forward* plan, NOT a range join:

1. project both sides to ``(key, time, side, payload)`` — right rows
   carry their payload struct, left rows a typed NULL;
2. union and run ``last(payload, ignorenulls=True)`` over a window
   ``partitionBy(key).orderBy(time, side)`` with a rows-frame ending at
   the current row — each left row sees exactly the latest right
   payload at-or-before its time (right sorts before left on ties, so
   "at" is inclusive);
3. keep the left rows.

Cost: ONE shuffle on the key + a per-key sort — linear, no candidate
explosion. The naive alternatives both die at 100 TB: a range-predicate
join becomes a broadcast-nested-loop (quadratic per key), and a
per-left-row MAX subquery re-scans the right side. Hot keys are the
only skew risk; pre-salt with ``functions.skew`` or rely on AQE.

The right side must be unique per (key, time) — enforce upstream (e.g.
``validate_batch`` or a groupBy) — otherwise "the" as-of row is
ill-defined in ANY engine (DuckDB's ASOF JOIN picks arbitrarily too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
) -> DataFrame:
    """LEFT-OUTER backward as-of join.

    Returns all ``left`` columns plus every ``right`` column (NULL
    where no right row exists at-or-before the left row's time).
    Right column names must not collide with left's.
    """
    r_payload_cols = right.columns
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias("__r"),
    )
    r_struct_type = r.schema["__r"].dataType
    l = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    unioned = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType)).unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).select(
        *[F.col("__l").getField(c).alias(c) for c in left.columns],
        *[F.col("__m").getField(c).alias(c) for c in r_payload_cols],
    )
