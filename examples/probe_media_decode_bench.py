"""Round-10 depth probe (SURVEY r10 plan item c): per-image cost of
the EXIF-normalized decode/resize path at Arrow-batch scale.

The media keys are fixture-driven (15 pinned payloads) and stay out of
bench.py — a bench row would time fixture SYNTHESIS, not the decode.
This probe measures the thing a bench row would want: ms/image of
`media_resize_record` (the ONE pure copy the Spark operator maps over
Arrow batches) across realistic JPEG shapes, batch-sized (N=400 per
shape), so the per-round artifact records decode throughput directly.

Pure Python/numpy — no Spark session; the Spark-side cost of the
operator is this per-record cost plus Arrow transfer of the payloads.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from bb_bigdata_log_tools_spark.operators.jpegcodec import make_jpeg
from bb_bigdata_log_tools_spark.operators.multimodal import (
    media_resize_record,
)

N = 400


def rows(w, h, seed):
    return [
        [((x * 7 + y * 13 + seed) % 256,
          (x * 3 + y * 5 + seed) % 256,
          (x * 11 + y * 2 + seed) % 256) for x in range(w)]
        for y in range(h)
    ]


shapes = [
    ("64x64 4:4:4 baseline", dict(width=64, height=64, subsample=1)),
    ("64x64 4:2:0", dict(width=64, height=64, subsample=2)),
    ("128x96 4:2:0 restarts", dict(width=128, height=96, subsample=2,
                                   restart_interval=4)),
    ("64x64 progressive", dict(width=64, height=64, progressive=True)),
]

for label, kw in shapes:
    w, h = kw["width"], kw["height"]
    payloads = [make_jpeg(rows=rows(w, h, s % 17), **kw) for s in range(8)]
    # warm (numpy allocations, code paths)
    for p in payloads:
        media_resize_record(p, 32, 32)
    t0 = time.perf_counter()
    ok = 0
    for i in range(N):
        out = media_resize_record(payloads[i % 8], 32, 32)
        ok += out[-1]
    dt = time.perf_counter() - t0
    print(f"{label}: {1000 * dt / N:.2f} ms/image "
          f"({N / dt:.0f} img/s/core, {ok}/{N} decoded)")
