r"""The Python extension surface: UDTF and grouped-agg pandas UDF.

The reference's only custom-code hook is an arbitrary-Python
whole-DataFrame transform (reference
`transformers/fill_in_missing_values.py:21-37`; SURVEY.md §2C calls
out that it has no UDF/UDAF/UDTF surface otherwise). The engine's
equivalents, each demonstrated here with a full oracle gate:

- ``mapInPandas`` / Arrow batches — operators/multimodal.py
- ``applyInPandasWithState`` — streaming/jobs.py
- **UDTF** (one row in, many rows out, registered for SQL LATERAL) —
  ``udtf_term_counts`` below
- **grouped-agg pandas UDF** (a UDAF) — ``pandas_udaf_cents_sum``

Both are deliberately NOT the hot path: every production operator in
this engine is JVM-side codegen (doc_chunking is the codegen'd
equivalent of a chunking UDTF; decimal_sum of the UDAF). These
queries exist to prove the extension points work end-to-end — for
logic that genuinely cannot be expressed as Catalyst expressions —
and that their results hash-match an exact oracle. Row-at-a-time
UDTF cost grows linearly with corpus size; at 100 TB prefer the
codegen twin or an Arrow-batched mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.plans.registry import register


@register(
    "udtf_term_counts",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(
            regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        FROM documents
        WHERE doc_id % 25 = 0
    )
    SELECT doc_id, term, COUNT(*) AS n
    FROM toks WHERE length(term) > 0
    GROUP BY doc_id, term
    """,
    doc="Python UDTF (table function) registered for SQL LATERAL "
    "joins: per-document term counts, one input row fanning out to "
    "|vocab(doc)| output rows. The API-surface twin of the codegen'd "
    "token operators — gated against the exact SQL aggregate.",
)
def udtf_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="term string, n long")
    class TermCounts:
        def eval(self, text: str):
            from collections import Counter

            norm = " ".join(text.lower().strip().split())
            counts = Counter(t for t in norm.split(" ") if t)
            for term in sorted(counts):
                yield term, counts[term]

    spark.udtf.register("term_counts", TermCounts)
    from qb_data_pipeline_backfill_spark.tables import load_table

    load_table(spark, sf_dir, "documents").filter(
        F.pmod(F.col("doc_id"), F.lit(25)) == 0
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.term, s.n FROM udtf_docs, LATERAL term_counts(text) s"
    )


@register(
    "pandas_udaf_cents_sum",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDF (Arrow-batched UDAF): per-type "
    "integer-cents sum — order-insensitive by construction, so the "
    "Arrow partial batches cannot flip a digit. The extension-point "
    "twin of functions.decimal_sum.",
)
def pandas_udaf_cents_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cents_sum(v):
        # floor(v*100 + 0.5), NOT pandas .round(): .round() is
        # half-to-even while DuckDB's ROUND is half-away-from-zero, so
        # any value*100 landing exactly on x.5 would differ by a cent
        # between the engines. floor(+0.5) is identical on both sides.
        import numpy as np

        return int(np.floor(v * 100 + 0.5).astype("int64").sum())

    # `from __future__ import annotations` stringifies hints, which the
    # pandas_udf signature inference rejects — attach them as objects.
    _cents_sum.__annotations__ = {"v": pd.Series, "return": int}
    cents_sum = pandas_udf(_cents_sum, "long")

    from qb_data_pipeline_backfill_spark.tables import load_table

    def _count_impl(v):
        return len(v)

    _count_impl.__annotations__ = {"v": pd.Series, "return": int}
    pd_count = pandas_udf(_count_impl, "long")

    # Spark disallows mixing group-agg pandas UDFs with JVM aggregates
    # in one agg() — both aggregates go through the Arrow path.
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        pd_count("value").alias("n"),
        cents_sum("value").alias("cents"),
    )
