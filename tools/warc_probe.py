"""WARC parse throughput probe: MB/s through warc_parse's mapInPandas
pass, plus the global_shuffle topology contrast (exchange-by-shard +
per-shard window vs the single-partition global-window anti-pattern).

Usage: python tools/warc_probe.py [n_records] [n_rows_shuffle]
Prints one JSON line; human summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qb_data_pipeline_backfill_spark.operators import sample as SA
from qb_data_pipeline_backfill_spark.operators import webtext as W
from qb_data_pipeline_backfill_spark.session import get_spark

_BODY = ("key agg row scan slow fast table value part hash merge batch " * 40).strip()


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark("warc-probe")

    # --- WARC parse throughput ------------------------------------------
    payload = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + _BODY
    )
    rec = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Record-ID: <urn:doc:%d>\r\n"
        "WARC-Target-URI: http://example.test/%d\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n" + payload + "\r\n\r\n"
    )
    per_blob = 50
    blob_expr = F.concat(
        *[
            F.format_string(rec, F.col("id") * per_blob + i,
                            F.col("id") * per_blob + i)
            for i in range(per_blob)
        ]
    )
    blobs = (
        spark.range(n_records // per_blob)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(blob_expr.alias("warc"))
        .persist()
    )
    total_bytes = blobs.select(
        F.sum(F.octet_length("warc")).alias("b")
    ).collect()[0]["b"]
    t0 = time.time()
    n_parsed = W.warc_parse(blobs, "warc").count()
    warc_s = time.time() - t0
    blobs.unpersist()

    # --- shuffle topology contrast ---------------------------------------
    df = spark.range(n_rows).withColumnRenamed("id", "doc_id").persist()
    df.count()
    t0 = time.time()
    SA.global_shuffle(df, ["doc_id"], 64, salt="p").select(
        F.max("pos")
    ).collect()
    shard_s = time.time() - t0
    t0 = time.time()
    key = SA.hash_full(["doc_id"], salt="p")
    df.withColumn("pos", F.row_number().over(Window.orderBy(key))).select(
        F.max("pos")
    ).collect()
    global_s = time.time() - t0
    df.unpersist()

    out = {
        "warc_records": n_parsed,
        "warc_mb": round(total_bytes / 1e6, 1),
        "warc_sec": round(warc_s, 2),
        "warc_mb_per_s": round(total_bytes / 1e6 / warc_s, 1),
        "shuffle_rows": n_rows,
        "shard_window_sec": round(shard_s, 2),
        "global_window_sec": round(global_s, 2),
    }
    print(json.dumps(out))
    print(
        f"warc_parse: {n_parsed} records, {out['warc_mb']} MB in "
        f"{out['warc_sec']} s = {out['warc_mb_per_s']} MB/s | "
        f"global_shuffle({n_rows} rows, 64 shards): shard-window "
        f"{out['shard_window_sec']} s vs single-partition global window "
        f"{out['global_window_sec']} s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
