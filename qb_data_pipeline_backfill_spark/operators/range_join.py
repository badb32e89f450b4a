"""Range (point-in-interval) join — the second temporal join Spark's
built-in join set lacks (the first, backward as-of, lives in
``operators.asof``).

``interval_join(points, intervals, ...)`` pairs every point row with
every interval row whose ``[start, end)`` span contains the point's
time (bound inclusivity configurable), optionally also matching an
equality key. Classic uses: attribution windows ("events within 1 h
after a purchase"), maintenance/outage overlap, IP-range lookup on a
numeric axis.

Why not ``points.join(intervals, t >= s & t < e)``? Without an equi
conjunct Catalyst can only run an inequality join as a broadcast
nested loop (quadratic, and the broadcast side must fit in memory) —
a non-starter at 100 TB. Even WITH a key conjunct, the hash join
probes every interval the key ever had, then post-filters: a user
with years of history pays for all of it on every point.

The scale-correct plan is **bucketization**: quantize the time axis
into fixed ``bucket_seconds`` cells, explode each interval to the
cells it covers, compute each point's single cell, and equi-join on
``(key?, cell)`` — a plain shuffle hash/sort-merge join Catalyst
already knows how to distribute — then re-check the exact bounds.
Each point lives in exactly one cell, so a (point, interval) pair can
meet in at most one cell: no post-join dedup is needed.

Cost model: intervals are replicated ``ceil(len/bucket) + 1`` times —
pick ``bucket_seconds`` on the order of the typical interval length
(replication ≤ 2×) and never much smaller. Skewed cells (flash-crowd
hours) are ordinary equi-join skew: AQE's skew-join split or
``functions.skew`` salting applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_time: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    point_key: str | None = None,
    interval_key: str | None = None,
    include_start: bool = True,
    include_end: bool = False,
) -> DataFrame:
    """INNER join of points to the intervals containing them.

    Defaults to the half-open ``[start, end)`` convention. Pass
    ``point_key``/``interval_key`` together to also require key
    equality (both or neither). Output = all ``points`` columns +
    all ``intervals`` columns; names must not collide (rename
    upstream). Intervals with ``end < start`` match nothing.
    """
    if (point_key is None) != (interval_key is None):
        raise ValueError("pass both point_key and interval_key, or neither")
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")

    def bucket(col):  # epoch seconds (fractional kept) -> cell ordinal
        return F.floor(col.cast("double") / F.lit(float(bucket_seconds))).cast("long")

    p = points.select(
        F.struct(*[F.col(c) for c in points.columns]).alias("__p"),
        F.col(point_time).alias("__t"),
        *([F.col(point_key).alias("__k")] if point_key else []),
    ).withColumn("__cell", bucket(F.col("__t")))

    iv = intervals.filter(F.col(end_col) >= F.col(start_col)).select(
        F.struct(*[F.col(c) for c in intervals.columns]).alias("__i"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        *([F.col(interval_key).alias("__ik")] if interval_key else []),
    )
    iv = iv.withColumn(
        "__cell", F.explode(F.sequence(bucket(F.col("__s")), bucket(F.col("__e"))))
    )

    on = [p["__cell"] == iv["__cell"]]
    if point_key:
        on.append(p["__k"] == iv["__ik"])
    lo = F.col("__t") >= F.col("__s") if include_start else F.col("__t") > F.col("__s")
    hi = F.col("__t") <= F.col("__e") if include_end else F.col("__t") < F.col("__e")

    joined = p.join(iv, on[0] if len(on) == 1 else on[0] & on[1], "inner").filter(lo & hi)
    return joined.select(
        *[F.col("__p").getField(c).alias(c) for c in points.columns],
        *[F.col("__i").getField(c).alias(c) for c in intervals.columns],
    )
