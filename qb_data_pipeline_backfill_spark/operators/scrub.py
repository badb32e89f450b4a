"""PII scrubbing: pattern redaction + detection counts over a corpus.

A pre-training curation pass must strip emails, phone numbers, id
numbers, and addresses before text reaches a training mix. This
operator family applies an ordered set of regex redactions JVM-side
(``regexp_replace`` / ``regexp_count`` — codegen'd, no Python in the
hot path) and emits per-document detection counts so downstream
policy (drop vs redact vs quarantine) stays a cheap filter.

Patterns are deliberately conservative, linear-time constructs
(character classes + bounded repetition — no backtracking blowups,
valid in both Java regex and RE2) so the same pattern set is portable
across engines; swap in org-specific patterns via the ``patterns``
argument. Order matters and is preserved: earlier redactions must not
manufacture or destroy later matches (e.g. email runs before the
bare-number patterns so the digits in a local-part are already gone).

100 TB posture: per-row narrow expressions only — no shuffle, no UDF;
scales linearly and pushes through whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: email first (may contain digit runs), then structured ids,
# then bare network/phone shapes.
DEFAULT_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def _redact_token(name: str) -> str:
    return f"<{name.upper()}>"


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Append redacted text + per-pattern counts + a has_pii flag.

    Counts are measured on the ORIGINAL text (each pattern counted
    independently); redactions are then applied sequentially in
    pattern order, so ``redacted`` reflects the ordered policy.
    """
    pats = patterns if patterns is not None else DEFAULT_PATTERNS
    out = df
    redacted: Column = F.col(text_col)
    for name, pat in pats.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
        redacted = F.regexp_replace(redacted, pat, _redact_token(name))
    out = out.withColumn("redacted", redacted)
    flag = None
    for name in pats:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn(
        "has_pii", flag if flag is not None else F.lit(False)
    )
