"""Decode-surface throughput probe: MB/s through the Arrow
mapInPandas codec paths (PPM image decode, WAV audio decode, AVI
demux) at realistic payload sizes.

The codecs are the engine's only Python-heavy hot path; this probe
puts a measured number on them so 'UDFs are the slow path' stays a
quantified engineering decision, not a vibe. Pure-Python parsers set
the FLOOR — a production deployment swaps PIL/ffmpeg into the same
mapInPandas slot (identical schema/batching) and only this stage
speeds up.

Usage: python tools/decode_probe.py [n_images] [side] [fmt]
fmt in {ppm, png, jpeg} (default ppm). PNG payloads are real
deflate-compressed files (filter 0 scanlines — the vectorizable
decode path; the per-byte unfilter loops of Sub/Up/Avg/Paeth are
strictly slower, so this row is the PNG path's CEILING). JPEG
payloads are real baseline Huffman streams; the bit-serial entropy
decode is the measured floor a C codec would replace.
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
    fmt = sys.argv[3] if len(sys.argv) > 3 else "ppm"
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    spark = get_spark("decode-probe", extra_conf={"spark.driver.memory": "8g"})

    # realistic payloads: side x side RGB files (~150 KB raw at 224),
    # synthesized once executor-side and persisted so the probe times
    # DECODE, not synthesis.
    def synth(batches):
        import zlib

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                if fmt == "png":
                    # incompressible noise so deflated bytes ~= raw
                    # bytes and MB/s measures real work, not a ramp
                    # that deflate crushes 200x
                    px = np.random.default_rng(mid).integers(
                        0, 256, side * side * 3, dtype=np.uint8
                    )
                else:
                    px = ((np.arange(side * side * 3) + mid) % 256).astype(np.uint8)
                if fmt == "ppm":
                    header = f"P6\n{side} {side}\n255\n".encode()
                    content = header + px.tobytes()
                elif fmt == "png":
                    # real PNG, filter-0 scanlines built vectorized
                    rowsb = px.reshape(side, side * 3)
                    raw = np.zeros((side, side * 3 + 1), dtype=np.uint8)
                    raw[:, 1:] = rowsb
                    ihdr = (
                        side.to_bytes(4, "big") * 2
                        + bytes([8, 2, 0, 0, 0])
                    )
                    content = (
                        M._PNG_SIG
                        + M._png_chunk(b"IHDR", ihdr)
                        + M._png_chunk(
                            b"IDAT", zlib.compress(raw.tobytes(), 6)
                        )
                        + M._png_chunk(b"IEND", b"")
                    )
                elif fmt == "jpeg":
                    content = M._encode_jpeg(mid, side, side)
                else:
                    raise SystemExit(f"unknown fmt {fmt!r}")
                rows.append({"media_id": mid, "content": content})
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
    _dec = {
        "ppm": M._decode_ppm,
        "png": M._decode_png,
        "jpeg": M._decode_jpeg,
    }[fmt]

    def fused(batches):
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, px = _dec(bytes(content))
                rows.append(
                    {"media_id": mid, "s": float(px.sum(dtype="int64"))}
                )
            yield pd.DataFrame(rows, columns=["media_id", "s"])

    t_fused = timed(media.mapInPandas(fused, "media_id long, s double"))
    out = {
        "probe": "decode_throughput",
        "fmt": fmt,
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
        f"{n_images} x {side}x{side} {fmt.upper()} = {total_mb:.0f} MB: "
        f"emit-pixels {t_pixels:.2f}s ({out['pixels_out_mb_s']:.0f} MB/s) vs "
        f"fused decode+reduce {t_fused:.2f}s ({out['fused_mb_s']:.0f} MB/s)",
        file=sys.stderr,
    )
    print(json.dumps(out))
    media.unpersist()


if __name__ == "__main__":
    main()
