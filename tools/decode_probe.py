"""Decode-surface throughput probe: MB/s through the Arrow
mapInPandas codec paths (PPM image decode, WAV audio decode, AVI
demux) at realistic payload sizes.

The codecs are the engine's only Python-heavy hot path; this probe
puts a measured number on them so 'UDFs are the slow path' stays a
quantified engineering decision, not a vibe. Pure-Python parsers set
the FLOOR — a production deployment swaps PIL/ffmpeg into the same
mapInPandas slot (identical schema/batching) and only this stage
speeds up.

Usage: python tools/decode_probe.py [n_images] [side]
Prints one JSON line; human summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import multimodal as M
from qb_data_pipeline_backfill_spark.session import get_spark


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    spark = get_spark("decode-probe", extra_conf={"spark.driver.memory": "8g"})

    # realistic payloads: side x side RGB PPMs (~150 KB at 224),
    # synthesized once executor-side and persisted so the probe times
    # DECODE, not synthesis.
    def synth(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                header = f"P6\n{side} {side}\n255\n".encode()
                px = ((np.arange(side * side * 3) + mid) % 256).astype(np.uint8)
                rows.append({"media_id": mid, "content": header + px.tobytes()})
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = (
        spark.range(n_images)
        .repartition(32)
        .mapInPandas(synth, "media_id long, content binary")
        .persist()
    )
    total_mb = (
        media.select(F.sum(F.length("content"))).collect()[0][0] / 1e6
    )

    def timed(df) -> float:
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    # (a) decode → emit raw pixel arrays → JVM-side aggregate: the
    # multimodal_decode_stats shape, paying Arrow transfer of every
    # pixel plus a higher-order-function fold per row.
    decoded = M.decode_media(media)
    stats = decoded.select(
        "media_id",
        F.aggregate("pixels", F.lit(0.0), lambda a, x: a + x).alias("s"),
    )
    t_pixels = timed(stats)

    # (b) decode → reduce INSIDE the batch → emit scalars: the shape a
    # real feature extractor should use (pixels never cross Arrow).
    from qb_data_pipeline_backfill_spark.operators.multimodal import _decode_ppm

    def fused(batches):
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, px = _decode_ppm(bytes(content))
                rows.append(
                    {"media_id": mid, "s": float(px.sum(dtype="int64"))}
                )
            yield pd.DataFrame(rows, columns=["media_id", "s"])

    t_fused = timed(media.mapInPandas(fused, "media_id long, s double"))
    out = {
        "probe": "decode_throughput",
        "n_images": n_images,
        "side": side,
        "total_mb": round(total_mb, 1),
        "pixels_out_sec": round(t_pixels, 2),
        "pixels_out_mb_s": round(total_mb / t_pixels, 1),
        "fused_sec": round(t_fused, 2),
        "fused_mb_s": round(total_mb / t_fused, 1),
        "fused_mb_s_per_core": round(total_mb / t_fused / 32, 2),
        "passes": passes,
    }
    print(
        f"{n_images} x {side}x{side} PPM = {total_mb:.0f} MB: "
        f"emit-pixels {t_pixels:.2f}s ({out['pixels_out_mb_s']:.0f} MB/s) vs "
        f"fused decode+reduce {t_fused:.2f}s ({out['fused_mb_s']:.0f} MB/s)",
        file=sys.stderr,
    )
    print(json.dumps(out))
    media.unpersist()


if __name__ == "__main__":
    main()
