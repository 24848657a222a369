"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; all Spark-side plumbing (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested. The actual media
decode is STUBBED — the decode libraries aren't in this environment —
behind :func:`decode_stub`, which produces a deterministic fake feature
row so pipelines exercise end-to-end. Swap ``_decode_payload`` for a
real (PIL/ffmpeg/torchaudio) implementation in production.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_media(documents: DataFrame) -> DataFrame:
    """Simulate a multimodal table: the text payload re-encoded as an
    opaque binary column + metadata struct (media_type round-robins so
    downstream dispatch-by-type is exercised)."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata from the binary column — pure column exprs (no
    decode): byte length + content digest."""
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.md5(F.col("payload")).alias("content_md5"),
    )


def _decode_payload(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """STUB decode: deterministic fake (width, height, n_frames) from the
    payload bytes. Replace with a real decoder in production; raise to
    surface that media decoding is intentionally not implemented here."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % 2147483647
    if media_type == "image":
        return (64 + h % 1024, 64 + (h // 7) % 1024, 1)
    if media_type == "audio":
        return (0, 0, 1 + h % 48000)
    if media_type == "video":
        return (64 + h % 1024, 64 + (h // 7) % 1024, 1 + h % 3600)
    raise NotImplementedError(f"unknown media type: {media_type}")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` so each executor processes record batches (binary
    payloads never pass through the driver); the decode itself is the
    deterministic stub above.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            dims = [
                _decode_payload(mt, bytes(p))
                for mt, p in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
