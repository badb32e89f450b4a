"""Measured scaling probe: do the headline operators stay linear?

Two measurements, each reported as a per-row cost ratio where ~<=1.0
means linear-or-better and >>1 means something superlinear (a widening
shuffle, a collapsing partition, a quadratic join) crept in:

1. **sf ladder** — run each operator at sf0.01 and sf0.1 (the
   driver's own 10x step with genuinely distinct data, the honest
   corpus scaling: synthetic replication of a text corpus either
   duplicates content, which inflates near-dup PAIR OUTPUT
   quadratically by construction, or perturbs it, which changes the
   per-row workload; both measure the synthetic data, not the
   operator — measured both ways before settling on the ladder).
   ratio = t(sf0.1) / (10 * t(sf0.01)).
2. **row replication (events only)** — union k id-shifted copies of
   the sf0.1 events table (identical value distributions, k x rows,
   k x users) and compare t(kx) / (k * t(1x)). Safe for keyed event
   analytics because the keys are shifted into disjoint ranges.

Usage: python tools/scaling_probe.py [k] [sf_root]
Prints one JSON line; human summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def replicated(df: DataFrame, id_cols: list[str], k: int, shift: int) -> DataFrame:
    """k copies with ids shifted into disjoint ranges (same value
    distributions, k x cardinality on every id key)."""
    parts = []
    for i in range(k):
        part = df
        for c in id_cols:
            part = part.withColumn(c, F.col(c) + F.lit(i * shift))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _run(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _timed(build, *args) -> float:
    build(*args).write.format("noop").mode("overwrite").save()  # warm codegen
    return min(_run(build(*args)) for _ in range(2))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_root = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata"
    sf_small, sf_big, ladder_k = "sf0.01", "sf0.1", 10

    from pyspark.sql.window import Window

    from qb_data_pipeline_backfill_spark.operators import curation as C
    from qb_data_pipeline_backfill_spark.operators import dedup as D
    from qb_data_pipeline_backfill_spark.operators.rollup import (
        continuous_aggregate,
        finalize,
        rollup,
    )
    from qb_data_pipeline_backfill_spark.session import get_spark
    from qb_data_pipeline_backfill_spark.tables import load_table

    spark = get_spark("scaling-probe", extra_conf={"spark.driver.memory": "8g"})
    spark.range(1000).selectExpr("sum(id)").collect()  # JIT warmup

    def docs(sf: str) -> DataFrame:
        return load_table(spark, f"{sf_root}/{sf}", "documents").repartition(
            spark.sparkContext.defaultParallelism
        )

    def events(sf: str) -> DataFrame:
        return load_table(spark, f"{sf_root}/{sf}", "events")

    for sf in (sf_small, sf_big):  # page-cache warmup
        docs(sf).write.format("noop").mode("overwrite").save()
        events(sf).write.format("noop").mode("overwrite").save()

    def rolling(e: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_micros(F.col("ts")))
            .rangeBetween(-86400000000, 0)
        )
        return e.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum("value").over(w).alias("s"),
        )

    def daily(e: DataFrame) -> DataFrame:
        hourly = continuous_aggregate(e, "ts", ["event_type"], ["value"], 3600)
        return finalize(
            rollup(hourly, ["event_type"], ["value"], 86400),
            ["event_type"],
            ["value"],
        )

    from qb_data_pipeline_backfill_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )
    from qb_data_pipeline_backfill_spark.operators.graph import pagerank_exact

    def li(sf: str) -> DataFrame:
        return load_table(spark, f"{sf_root}/{sf}", "lineitem")

    def orders(sf: str) -> DataFrame:
        return load_table(spark, f"{sf_root}/{sf}", "orders")

    def bloom_pruned(sf: str) -> DataFrame:
        dim = orders(sf).filter(F.col("o_totalprice") > 400000).select("o_orderkey")
        return bloom_probe(
            li(sf).select("l_orderkey"), "l_orderkey", bloom_build(dim, "o_orderkey")
        )

    def pagerank(sf: str) -> DataFrame:
        l = li(sf).select("l_orderkey", "l_partkey")
        a, b = l.alias("a"), l.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
            .distinct()
        )
        return pagerank_exact(pairs, iters=3)

    ladder_cases = {
        "minhash_lsh": lambda sf: D.minhash_lsh_pairs(docs(sf)),
        "exact_dedup": lambda sf: D.exact_dedup(docs(sf)),
        "doc_chunking": lambda sf: C.chunk_documents(docs(sf)),
        "rolling_24h_window": lambda sf: rolling(events(sf)),
        "hypertable_daily": lambda sf: daily(events(sf)),
        "bloom_prune_scan": bloom_pruned,
        "pagerank_3iter": pagerank,
    }

    out = {"ladder_k": ladder_k, "replicate_k": k, "ladder": {}, "replicate": {}}
    for name, build in ladder_cases.items():
        t_small = _timed(build, sf_small)
        t_big = _timed(build, sf_big)
        ratio = t_big / (ladder_k * t_small) if t_small > 0 else float("nan")
        out["ladder"][name] = {
            "t_sf0.01_sec": round(t_small, 3),
            "t_sf0.1_sec": round(t_big, 3),
            "per_row_ratio": round(ratio, 3),
        }
        print(
            f"ladder {name}: sf0.01={t_small:.2f}s sf0.1={t_big:.2f}s "
            f"per-row ratio={ratio:.2f}",
            file=sys.stderr,
        )

    ev = events(sf_big)
    rep_cases = {
        "rolling_24h_window": lambda kk: rolling(
            ev if kk == 1 else replicated(ev, ["event_id", "user_id"], kk, 10_000_000)
        ),
        "hypertable_daily": lambda kk: daily(
            ev if kk == 1 else replicated(ev, ["event_id"], kk, 10_000_000)
        ),
    }
    for name, build in rep_cases.items():
        t1 = _timed(build, 1)
        tk = _run(build(k))
        ratio = tk / (k * t1) if t1 > 0 else float("nan")
        out["replicate"][name] = {
            "t_1x_sec": round(t1, 3),
            f"t_{k}x_sec": round(tk, 3),
            "per_row_ratio": round(ratio, 3),
        }
        print(
            f"replicate {name}: 1x={t1:.2f}s {k}x={tk:.2f}s "
            f"per-row ratio={ratio:.2f}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
