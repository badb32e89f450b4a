"""ExactSubstr hot-class probe (VERDICT r13 #4).

The class-min and dup-count steps of operators/suffix.py key on
substring-class ids; the most popular class (whitespace runs) funnels
through ONE task in the window-function form — a corpus-scale
ceiling. skew_safe=True recomputes the same values through map-side-
combinable aggregates + AQE-splittable joins.

This probe measures both paths on two corpora and verifies identical
output:

- HOT: documents sharing one giant whitespace run (a large fraction
  of all positions in a single class) — the adversarial shape;
- FLAT: the gate fixture shape (sf documents, natural text) — what
  the checkpoint-per-round overhead costs when there is no skew.

Usage: python tools/substr_skew_probe.py [sf_dir] [n_hot_docs] [run_len]
Prints one human-readable block; paste the numbers into SCALING §15.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qb_data_pipeline_backfill_spark.operators import suffix as SX  # noqa: E402
from qb_data_pipeline_backfill_spark.session import get_spark  # noqa: E402
from qb_data_pipeline_backfill_spark.tables import load_table  # noqa: E402


def _time_spans(df, skew_safe: bool, min_len: int = 20):
    t0 = time.monotonic()
    rows = sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in SX.exact_substring_spans(
            df, min_len=min_len, skew_safe=skew_safe
        ).collect()
    )
    return time.monotonic() - t0, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    run_len = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    spark = get_spark()

    # HOT corpus: n_hot docs, each = unique head + run_len identical
    # spaces + unique tail. The space-run positions all collapse into
    # a handful of classes, one of which holds ~n_hot*run_len rows.
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.format_string("head-%08d ", F.col("id")),
            F.lit(" " * run_len),
            F.format_string(" tail-%08d", F.col("id")),
        ).alias("text"),
    )
    hot_positions = n_hot * (run_len + 22)
    t_win_hot, r_win_hot = _time_spans(hot, skew_safe=False)
    t_agg_hot, r_agg_hot = _time_spans(hot, skew_safe=True)
    assert r_win_hot == r_agg_hot, "HOT: paths disagree"

    # FLAT corpus: the gate fixture shape (every 3rd document)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.pmod(F.col("doc_id"), F.lit(3)) == 0
    )
    t_win_flat, r_win_flat = _time_spans(docs, skew_safe=False)
    t_agg_flat, r_agg_flat = _time_spans(docs, skew_safe=True)
    assert r_win_flat == r_agg_flat, "FLAT: paths disagree"

    print(
        f"HOT  ({n_hot} docs x {run_len}-space run, ~{hot_positions} "
        f"positions, one class holds ~{n_hot * run_len}):"
    )
    print(f"  window path    {t_win_hot:7.2f} s")
    print(f"  skew_safe path {t_agg_hot:7.2f} s  "
          f"({t_win_hot / t_agg_hot:.2f}x)")
    print(f"FLAT ({sf_dir} documents %3, {docs.count()} docs):")
    print(f"  window path    {t_win_flat:7.2f} s")
    print(f"  skew_safe path {t_agg_flat:7.2f} s  "
          f"({t_win_flat / t_agg_flat:.2f}x)")
    print(f"outputs identical on both corpora "
          f"({len(r_win_hot)} / {len(r_win_flat)} spans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
