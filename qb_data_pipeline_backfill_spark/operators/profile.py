"""Dataset profiling: one-pass numeric column statistics.

The data-quality report an ingestion pipeline runs before accepting a
batch: per-column row/null/distinct counts, range, exact sum/mean, and
population variance. Generalizes the reference's ad-hoc volumetry and
integrity checks (reference: mage_data/.../integrity queries — COUNT/
COUNT(DISTINCT) per table) into a reusable per-COLUMN profile.

Cross-engine determinism: doubles are cast to exact DECIMAL(18,6) and
then to integer micro-units, so sums, means, and the variance
numerator ``n·Σm² − (Σm)²`` are integer arithmetic on both engines —
no float accumulation order anywhere (see functions/numeric.py for
why ``ROUND(double_sum)`` is never safe). Variance is truncated to
4dp by exact integer division.

100 TB posture: the melt (explode to (col_name, value)) multiplies
rows by the column count but keeps the scan single-pass; the aggregate
is map-side combinable on a low-cardinality key (one group per
column). COUNT(DISTINCT) adds Spark's expand-based exact path —
swap ``approx_count_distinct`` in at corpus scale (the engine's
``approx_distinct_report`` query shows that path gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.functions.numeric import (
    _exact_int_div,
    decimal_avg,
    decimal_sum,
    micro_units,
    trunc_int_div,
)


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: counts, range, exact sum/mean/variance."""
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("double").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.value")

    m = micro_units("value")
    # r17 (guide §2.3): with countDistinct inline, Spark's one-pass
    # two-phase distinct plan keys phase 1 on (col_name, value) and
    # drags every partial buffer — three decimal(38) sums among them —
    # through the exchange once per DISTINCT (column, value) pair.
    # Splitting lets the plain statistics partial-aggregate down to
    # one buffer per column (a metadata-sized exchange) and the
    # distinct count shuffle bare (col_name, value) pairs with no
    # payload; the rejoin is |cols| rows, broadcast. Two melt passes,
    # but the melt is a codegen'd Generate over one scan — measured
    # cheaper than the wide distinct exchange.
    stats = melted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        decimal_sum("value").alias("sum_value"),
        decimal_avg("value").alias("mean_value"),
        F.count("value").alias("_n"),
        F.sum(m).cast("decimal(38,0)").alias("_s1"),
        F.sum(m * m).cast("decimal(38,0)").alias("_s2"),
    )
    nd = melted.groupBy("col_name").agg(
        F.countDistinct("value").alias("n_distinct")
    )
    agg = stats.join(F.broadcast(nd), "col_name")
    n = F.col("_n").cast("decimal(38,0)")
    # Population variance, exact: (n·Σm² − (Σm)²) / n² in micro²-units,
    # floor-truncated to 4dp of value² via one exact integer division.
    var_num = (n * F.col("_s2") - F.col("_s1") * F.col("_s1")).cast("decimal(38,0)")
    var_den = (n * n * F.lit(10**8)).cast("decimal(38,0)")
    return agg.select(
        "col_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_value",
        "max_value",
        "sum_value",
        "mean_value",
        (_exact_int_div(var_num, var_den) / F.lit(1e4)).alias("var_pop"),
    )


def outlier_flags(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_sigmas: int = 3,
) -> DataFrame:
    """Per-group z-score outlier flags with an EXACT integer test.

    ``|x − mean| > k·sigma`` is equivalent to
    ``(n·m − S1)² > k²·(n·S2 − S1²)`` with m, S1, S2 in integer
    micro-units — both sides are exact integers on both engines, so
    the flag is bit-reproducible (a float formulation would wobble on
    values near the fence). Plan: one map-side-combinable aggregate
    per group + a broadcast join back (group cardinality is small by
    construction of a grouping) + a narrow flag expression.
    """
    m = micro_units(value_col)
    stats = df.groupBy(*group_cols).agg(
        F.count(value_col).cast("decimal(38,0)").alias("_n"),
        F.sum(m).cast("decimal(38,0)").alias("_s1"),
        F.sum(m * m).cast("decimal(38,0)").alias("_s2"),
    )
    # null-safe group join: a NULL group key forms its own group in the
    # aggregate and its rows must not silently vanish from a row-level
    # flag operator (r7 review)
    st = stats
    conds = []
    for g in group_cols:
        st = st.withColumnRenamed(g, f"__g_{g}")
        conds.append(F.col(g).eqNullSafe(F.col(f"__g_{g}")))
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    joined = df.withColumn("_m", m).join(F.broadcast(st), cond).drop(
        *[f"__g_{g}" for g in group_cols]
    )
    dev = (F.col("_n") * F.col("_m") - F.col("_s1")).cast("decimal(38,0)")
    var_n2 = (
        F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1")
    ).cast("decimal(38,0)")
    return joined.withColumn(
        "is_outlier", dev * dev > F.lit(n_sigmas**2) * var_n2
    ).drop("_m", "_n", "_s1", "_s2")


def covariance_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise population covariances, exact cross-engine.

    One aggregate over the table computes every Σmᵃ and Σmᵃmᵇ in
    integer micro-units (values carry ≤ 6 true decimals), then
    cov = (n·Σmᵃmᵇ − Σmᵃ·Σmᵇ) / n² — truncated to 4dp by exact
    integer division (truncation, matching DuckDB ``//``, because a
    covariance is signed). One row per unordered pair (a < b by
    position). Rows with a null in either column are the caller's
    concern (the synthetic profile columns are non-null); listwise
    deletion would need per-pair counts.
    """
    m = {c: micro_units(c) for c in cols}
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(m[c]).cast("decimal(38,0)").alias(f"_s_{cols.index(c)}") for c in cols],
        *[
            F.sum(m[a] * m[b]).cast("decimal(38,0)").alias(f"_p_{i}")
            for i, (a, b) in enumerate(pairs)
        ],
    )
    n = F.col("_n").cast("decimal(38,0)")
    den = (n * n * F.lit(10**8)).cast("decimal(38,0)")
    structs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            (
                trunc_int_div(
                    (
                        n * F.col(f"_p_{i}")
                        - F.col(f"_s_{cols.index(a)}")
                        * F.col(f"_s_{cols.index(b)}")
                    ).cast("decimal(38,0)"),
                    den,
                )
                / F.lit(1e4)
            ).alias("cov_pop"),
        )
        for i, (a, b) in enumerate(pairs)
    ]
    return agg.select(F.explode(F.array(*structs)).alias("s")).select(
        "s.col_a", "s.col_b", "s.cov_pop"
    )


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two slices of a measure.

    The batch-acceptance drift monitor a training pipeline runs before
    a new crawl/extract lands next to the reference corpus: fixed-width
    histogram over ``[lo, hi)`` (edge bins absorb out-of-range values),
    Laplace-smoothed bin shares p (ref) and q (cur), and the per-bin
    PSI term ``(p − q)·ln(p/q)``. PSI > 0.2 is the conventional
    "distribution shifted, investigate" fence.

    Cross-engine determinism: bin ids, counts, and shares are exact
    (integer counts, one identical double division); the single
    transcendental ``ln`` is evaluated on bit-identical inputs on both
    engines and the term is immediately quantized to integer
    micro-units (``psi_term_micro``), so the grand total is an
    order-free integer sum — no float accumulation anywhere.

    100 TB posture: each side is one map-side-combinable aggregate on a
    ``n_bins``-cardinality key (a metadata-sized result regardless of
    input size); the spine join and total are broadcast of ≤ n_bins
    rows. Two scans total, no shuffle wider than n_bins groups.
    """
    def binned(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(hist_bin(value_col, lo=lo, hi=hi, n_bins=n_bins))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    return psi_from_counts(
        binned(ref, "ref_n"), binned(cur, "cur_n"), n_bins=n_bins
    )


def hist_bin(value_col: str, *, lo: float, hi: float, n_bins: int):
    """Fixed-width histogram bin id over ``[lo, hi)``, edge bins
    absorbing out-of-range values — the shared binning expression of
    the batch and streaming drift monitors (identical bin boundaries
    are what make their results comparable).

    NULL measures map to a NULL bin and fall out of the histogram
    (identically on both engines); a caller whose column is nullable
    should filter or impute first, or null-rate drift silently hides —
    pair with the null counts of ``profile_numeric``."""
    width = (hi - lo) / n_bins
    return (
        F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )
        .cast("long")
        .alias("bin")
    )


def psi_from_counts(
    ref_counts: DataFrame, cur_counts: DataFrame, *, n_bins: int
) -> DataFrame:
    """PSI report from pre-aggregated ``(bin, ref_n)`` / ``(bin,
    cur_n)`` histograms (see ``distribution_drift`` for the contract —
    this half is shared with the streaming monitor, whose cur-side
    histogram is maintained by the streaming engine)."""
    spine = ref_counts.sparkSession.range(n_bins).withColumnRenamed(
        "id", "bin"
    )
    counts = (
        spine.join(
            F.broadcast(ref_counts.withColumnRenamed("ref_n", "_r")),
            "bin",
            "left",
        )
        .join(
            F.broadcast(cur_counts.withColumnRenamed("cur_n", "_c")),
            "bin",
            "left",
        )
        .select(
            "bin",
            F.coalesce("_r", F.lit(0)).alias("ref_n"),
            F.coalesce("_c", F.lit(0)).alias("cur_n"),
        )
    )
    tot = counts.agg(
        F.sum("ref_n").alias("_rt"), F.sum("cur_n").alias("_ct")
    )
    p = (F.col("ref_n") + F.lit(1.0)) / (F.col("_rt") + F.lit(float(n_bins)))
    q = (F.col("cur_n") + F.lit(1.0)) / (F.col("_ct") + F.lit(float(n_bins)))
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_n",
        "cur_n",
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        F.round((p - q) * F.log(p / q) * F.lit(1e6), 0)
        .cast("long")
        .alias("psi_term_micro"),
    )
    total = terms.agg(
        (F.sum("psi_term_micro") / F.lit(1e6)).alias("psi_total")
    )
    return terms.crossJoin(F.broadcast(total))
