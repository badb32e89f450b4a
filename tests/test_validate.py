"""Declarative constraint validation (operators/validate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators.validate import constraint_report


def test_row_rules_count_violations_including_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 99.0)], ["id", "amount"]
    )
    got = {
        r["rule"]: r
        for r in constraint_report(
            df,
            rules={
                "amount_positive": F.col("amount") > 0,
                "amount_capped": F.col("amount") <= 50,
                "id_present": F.col("id").isNotNull(),
            },
        ).collect()
    }
    # -3 fails, NULL fails (null predicate = violation)
    assert got["amount_positive"]["n_violations"] == 2
    assert got["amount_positive"]["n_checked"] == 4
    assert not got["amount_positive"]["passed"]
    # 99 fails, NULL fails
    assert got["amount_capped"]["n_violations"] == 2
    assert got["id_present"]["n_violations"] == 0
    assert got["id_present"]["passed"]


def test_referential_rule_counts_orphans(spark):
    facts = spark.createDataFrame([(1,), (2,), (2,), (9,)], ["fk"])
    dim = spark.createDataFrame([(1,), (2,)], ["k"])
    got = {
        r["rule"]: r
        for r in constraint_report(
            facts,
            rules={"fk_present": F.col("fk").isNotNull()},
            ref_rules={"fk_exists": ("fk", dim, "k")},
        ).collect()
    }
    assert got["fk_exists"]["n_checked"] == 4
    assert got["fk_exists"]["n_violations"] == 1  # fk=9
    assert not got["fk_exists"]["passed"]
