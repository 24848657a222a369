"""Worked example: a multimodal ingest pass, end to end.

Run:  python examples/media_pipeline.py

Mixed image/audio payloads (every codec profile the engine really
decodes: baseline + progressive JPEG, all-profile PNG, GIF incl.
animation, BMP incl. RLE8, PCM/float WAV) flow through the standard
training-data media stages:

  metadata walk → feature extraction (dims / frame counts) →
  frame-index sampling fan-out → pixel resize to a thumbnail →
  perceptual image dedup (dHash pairs + clusters) →
  audio loudness/clipping QC → resample-rate normalization →
  audio fingerprint dedup

Every stage is an Arrow-batched ``mapInPandas`` over the binary
column — payloads never visit the driver, and the ``decoded`` flag
separates real decodes from the deterministic stub path so damaged or
exotic payloads flow through flagged instead of failing the job.
"""

import math
import sys

sys.path.insert(0, ".")

from bb_bigdata_log_tools_spark.operators.gifcodec import make_gif  # noqa: E402
from bb_bigdata_log_tools_spark.operators.jpegcodec import make_jpeg  # noqa: E402
from bb_bigdata_log_tools_spark.operators.multimodal import (  # noqa: E402
    audio_pcm_stats,
    audio_resample,
    dedup_audio,
    dedup_image_cluster,
    extract_features,
    make_bmp_palette,
    make_png_rows,
    make_wav,
    media_frame_sample,
    media_resize,
)
from bb_bigdata_log_tools_spark.session import get_spark  # noqa: E402


def _rows(w, h, f=1):
    return [
        [((x * 7 * f) % 256, (y * 11) % 256, (x + y * f) % 256)
         for x in range(w)]
        for y in range(h)
    ]


def main(spark=None) -> None:
    owns_session = spark is None
    if owns_session:
        spark = get_spark("media-pipeline-example")
        spark.sparkContext.setLogLevel("ERROR")

    sine = [int(20000 * math.sin(i / 7.0)) for i in range(4000)]
    payloads = [
        (0, "image", make_jpeg(64, 48, _rows(64, 48), subsample=2)),
        (1, "image", make_jpeg(64, 48, _rows(64, 48, 2), progressive=True)),
        (2, "image", make_png_rows(40, 30, _rows(40, 30), filter_type=4,
                                   interlace=True)),
        (3, "image", make_gif(
            32, 24,
            [[((x % 4) * 60, (y % 4) * 50, 40) for x in range(32)]
             for y in range(24)],
            extra_frames=[
                ([[((x % 4) * 60, (y % 4) * 50, 120) for x in range(32)]
                  for y in range(24)], None)
            ] * 4,
        )),
        (4, "image", make_bmp_palette(24, 24, [
            [((x // 3 % 4) * 60, (y // 3 % 4) * 50, 30) for x in range(24)]
            for y in range(24)
        ], bpp=8, rle=True)),
        (5, "audio", make_wav(8000, 1, samples=sine)),
        (6, "audio", make_wav(16000, 1,
                              samples=[v / 32768.0 for v in sine],
                              float_fmt=True)),
        (7, "image", b"not decodable bytes"),  # stub-flag path
        # the same pixels as doc 0, saved progressive — a re-encoded
        # duplicate only perceptual hashing can catch
        (8, "image", make_jpeg(64, 48, _rows(64, 48), subsample=2,
                               progressive=True)),
    ]
    media = spark.createDataFrame(
        payloads, "doc_id long, media_type string, payload binary"
    )

    print("=== features (dims, frame counts, decoded flags) ===")
    extract_features(media).orderBy("doc_id").show(truncate=False)

    print("=== frame sampling (animated GIF fans out) ===")
    media_frame_sample(media, every_n=2).orderBy(
        "doc_id", "frame_idx"
    ).show(truncate=False)

    print("=== thumbnail resize (all four image codecs) ===")
    media_resize(media, 16, 12).orderBy("doc_id").show(truncate=False)

    print("=== image near-dup clusters (doc 8 re-encodes doc 0) ===")
    dedup_image_cluster(media).show(truncate=False)

    print("=== audio QC (loudness / clipping) ===")
    audio_pcm_stats(media).orderBy("doc_id").show(truncate=False)

    print("=== rate normalization to 16 kHz ===")
    audio_resample(media, 16_000).orderBy("doc_id").show(truncate=False)

    print("=== audio near-dup (same sine at int16 and float) ===")
    dedup_audio(media).show(truncate=False)

    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
