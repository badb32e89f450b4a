"""Declarative constraint validation: a data-quality gate as a report.

Generalizes the reference's inline validation (NOT-NULL filter + keyed
dedup before load, reference: transformers/validate_customers_py.py)
into the declarative contract check an ingestion pipeline runs before
accepting a batch: named rules → one report row per rule with checked/
violation counts and a pass flag. The report is cheap to alert on and
cheap to store next to the batch.

Two rule families:

- **Row rules** (``rules``): any boolean Column over the row (not-null,
  range, enum membership, cross-column). Evaluated in ONE pass —
  each rule is a conditional-count aggregate, map-side combinable,
  no shuffle beyond the single global aggregate.
- **Anti-join rules** (``ref_rules``): referential integrity — rows
  whose key has no match in a dimension. Each is a LEFT ANTI join
  (broadcast when the dimension is small) counted per rule.

100 TB posture: row rules cost one scan regardless of rule count;
anti-join rules broadcast dimension keys (project the key column
only). Uniqueness checks belong to the dedup family
(``operators/ingest.py``), not here — a global COUNT DISTINCT is a
different cost class and should be a deliberate choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    rules: dict[str, Column],
    ref_rules: dict[str, tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """One row per rule: ``(rule, n_checked, n_violations, passed)``.

    ``rules`` maps rule name → boolean Column that is True when the row
    SATISFIES the constraint (null counts as a violation).
    ``ref_rules`` maps rule name → ``(fk_col, dim_df, dim_key)``; a row
    violates when its fk value has no match in the dimension.
    """
    aggs = []
    for name, pred in rules.items():
        aggs.append(
            F.struct(
                F.lit(name).alias("rule"),
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0))
                .cast("long")
                .alias("n_violations"),
            ).alias(name)
        )
    report = (
        df.agg(*aggs)
        .select(F.explode(F.array(*[F.col(n) for n in rules])).alias("s"))
        .select("s.rule", "s.n_checked", "s.n_violations")
    )

    for name, (fk, dim, dim_key) in (ref_rules or {}).items():
        # no forced broadcast: a referential dimension (customer,
        # user) is fact-scaled — it grows with the corpus, so the
        # anti-join strategy is AQE's call from the measured size of
        # the distinct-key side (same reasoning as the de-hinted
        # Q3/Q5 analogs in plans/analytics.py, round 11)
        keys = dim.select(F.col(dim_key).alias(fk)).distinct()
        n_checked = df.select(fk)
        n_bad = n_checked.join(keys, fk, "left_anti")
        row = n_checked.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
        ).crossJoin(n_bad.agg(F.count(F.lit(1)).alias("n_violations")))
        report = report.unionByName(row)

    return report.withColumn("passed", F.col("n_violations") == 0)
