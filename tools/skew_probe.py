"""Skew-join stress probe: measured plain-vs-salted join on a
zipf-style hot key.

SCALING.md covers linearity; this probe covers the other 100 TB
killer, KEY SKEW. Construction:

- fact: N rows where HALF carry one hot key (key=0) and the rest are
  uniform over 10k keys — the zipf head/tail shape of real join keys
  (user ids, merchant ids, null-surrogates).
- dim: 10k+1 keys. Broadcast is DISABLED for the probe
  (autoBroadcastJoinThreshold=-1): at the modeled scale the dim is
  too big to broadcast, which is exactly when functions/skew.py's
  salted_join exists. With broadcast on, none of this matters — the
  engine broadcasts and there is no shuffle to skew.
- AQE stays ON (the engine's real config). Its skew-join splitting
  does not fire here: splitting triggers on partition BYTES
  (skewedPartitionThresholdInBytes=256MB default) — a hot key can
  serialize a reducer long before its partition looks big in bytes,
  and below the threshold one task still sorts/joins half the fact
  side while 31 cores idle.

Measured: wall time of plain shuffle join vs salted_join (n_salts=32),
same aggregation over the join output, min of PASSES passes each.

Usage: python tools/skew_probe.py [n_rows] [n_salts]
Prints one JSON line; human summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.functions.skew import salted_join
from qb_data_pipeline_backfill_spark.session import get_spark


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_salts = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    spark = get_spark(
        "skew-probe",
        extra_conf={
            "spark.driver.memory": "8g",
            # model the non-broadcastable dim of the 100 TB case
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )

    # fact: 50% hot key 0, rest uniform over [1, 10000] — deterministic
    # (no rand(): retried tasks must rebuild identical data).
    fact = spark.range(n_rows).select(
        F.when(F.pmod("id", F.lit(2)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)) + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    dim = spark.range(10_001).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("w")
    )

    def plain():
        return (
            fact.join(dim, "k")
            .groupBy("w")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        )

    def salted():
        return (
            salted_join(fact, dim, "k", n_salts=n_salts)
            .groupBy("w")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        )

    # correctness first: identical aggregates either way
    a = {r["w"]: (r["n"], r["sv"]) for r in plain().collect()}
    b = {r["w"]: (r["n"], r["sv"]) for r in salted().collect()}
    assert a == b, "salted join changed the join result"

    def timed(build) -> float:
        build().write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    t_plain = timed(plain)
    t_salted = timed(salted)
    out = {
        "probe": "skew_join",
        "n_rows": n_rows,
        "hot_key_share": 0.5,
        "n_salts": n_salts,
        "plain_sec": t_plain,
        "salted_sec": t_salted,
        "speedup": round(t_plain / t_salted, 2),
        "passes": passes,
    }
    print(
        f"plain {t_plain}s vs salted {t_salted}s "
        f"({out['speedup']}x) on {n_rows} rows, half on one key",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
