"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride through the pipeline as opaque ``binary``
columns with a typed metadata struct — the lakehouse pattern: bytes
stay columnar in Parquet, metadata is queryable, and decode happens
late, batched, at the edge of the plan via Arrow (mapInPandas).

The container ships no image/audio codecs, so the decode step is
STUBBED: ``decode_media`` raises ``NotImplementedError`` unless a
decoder is importable, and ``byte_features`` (a deterministic,
codec-free feature extractor) demonstrates the real Spark plumbing —
schema, Arrow batching, partition preservation — end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Envelope for any media payload: opaque bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.IntegerType(), False),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_histogram", T.ArrayType(T.LongType()), False),
    ]
)


def synthesize_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake media: bytes = md5(text) ⊕ md5(reverse(text))
    concatenated — a stand-in for real image bytes that exercises the
    exact same binary-column plumbing (Parquet binary encoding, Arrow
    transfer, metadata struct) with reproducible content.
    """
    content = F.concat(
        F.unhex(F.md5(F.col(text_col))),
        F.unhex(F.md5(F.reverse(F.col(text_col)))),
        F.unhex(F.md5(F.concat(F.lit("salt:"), F.col(text_col)))),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        content.alias("content"),
        F.struct(
            # Fake dimensions derived from content length/hash — typed
            # metadata a real ingest would parse from the header.
            (F.crc32(F.col(text_col)) % 1920 + 1).cast("int").alias("width"),
            (F.crc32(F.reverse(F.col(text_col))) % 1080 + 1).cast("int").alias("height"),
            F.length(content).cast("int").alias("n_bytes"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def byte_features(media: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas processes whole Arrow record batches (not rows), keeps
    the input partitioning (no shuffle), and returns a stable typed
    schema — the template every real decoder (image resize, audio
    resample, frame sampling) plugs into.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                hist = [0] * n_buckets
                for byte in b:
                    hist[byte * n_buckets // 256] += 1
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(b),
                        "byte_mean": round(sum(b) / len(b), 4) if b else 0.0,
                        "byte_histogram": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(extract, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 16, every_nth: int = 2
) -> DataFrame:
    """Deterministic frame sampling over a video-like binary payload.

    The payload is treated as concatenated fixed-size frames (real
    codecs expose the same iterator shape through their demuxer); every
    ``every_nth`` frame is emitted as its own row. One input row fans
    out to ceil(n_frames / every_nth) output rows inside the Arrow
    batch — the exact fan-out pattern a real ffmpeg-backed sampler
    plugs into, with no codec required.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                for idx in range(0, len(b) // frame_bytes, every_nth):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "frame": b[idx * frame_bytes : (idx + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(sample, FRAME_SCHEMA)


def decode_media(media: DataFrame, target_width: int = 224, target_height: int = 224) -> DataFrame:
    """Decode + resize the binary payload into pixel arrays.

    STUB: requires an image codec (PIL/opencv), which this container
    does not ship. The Spark-side contract is fixed — batch-wise
    mapInPandas, output schema (media_id, pixels array<float>, width,
    height) — so a real decoder drops in without plan changes.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "decode_media requires an image codec (PIL); not available in "
            "this environment. byte_features demonstrates the identical "
            "mapInPandas plumbing with a codec-free extractor."
        ) from e

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("pixels", T.ArrayType(T.FloatType()), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        from PIL import Image

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                img = Image.open(io.BytesIO(bytes(content))).resize(
                    (target_width, target_height)
                )
                rows.append(
                    {
                        "media_id": media_id,
                        "pixels": [float(p) for p in img.convert("L").getdata()],
                        "width": target_width,
                        "height": target_height,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.select("media_id", "content").mapInPandas(decode, out_schema)
