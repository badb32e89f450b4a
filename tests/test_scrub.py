"""PII scrubbing (operators/scrub.py)."""

from __future__ import annotations

from qb_data_pipeline_backfill_spark.operators.scrub import scrub_pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return scrub_pii(df).collect()[0]


def test_email_and_ip_redacted_and_counted(spark):
    r = _one(spark, "mail a.user+tag@sub.example.co.uk from 192.168.0.1 twice: b@x.io")
    assert r["n_email"] == 2 and r["n_ipv4"] == 1
    assert "<EMAIL>" in r["redacted"] and "<IPV4>" in r["redacted"]
    assert "@" not in r["redacted"] and "192.168" not in r["redacted"]
    assert r["has_pii"] is True


def test_ssn_vs_phone_no_cross_matching(spark):
    r = _one(spark, "id 123-45-6789 and line +1-800-555-0199 end")
    assert r["n_ssn"] == 1 and r["n_phone"] == 1
    assert "<SSN>" in r["redacted"] and "<PHONE>" in r["redacted"]


def test_clean_text_untouched(spark):
    r = _one(spark, "nothing sensitive here at all")
    assert r["redacted"] == "nothing sensitive here at all"
    assert r["has_pii"] is False
    assert r["n_email"] == r["n_ssn"] == r["n_phone"] == r["n_ipv4"] == 0


def test_custom_pattern_set_and_order(spark):
    # Only one custom pattern: digits. Email untouched.
    pats = {"num": "[0-9]+"}
    df = spark.createDataFrame([(1, "a@b.co 42")], ["doc_id", "text"])
    r = scrub_pii(df, patterns=pats).collect()[0]
    assert r["n_num"] == 1
    assert r["redacted"] == "a@b.co <NUM>"
