"""WebDataset-style tar-shard source.

The de-facto layout for large multimodal training corpora is a set of
``.tar`` shards whose members group by basename: ``000123.jpg`` +
``000123.txt`` + ``000123.json`` form one sample (the WebDataset
convention, https://github.com/webdataset/webdataset). This source
reads such shards into a DataFrame of (shard, sample key, extension,
payload) rows — the binary-column + typed-metadata model the
multimodal operators consume.

Scale notes (100 TB): shards are the parallelism unit — Spark's
``binaryFile`` source assigns whole tar files to tasks (one shard ≈
one task, the same contract WebDataset's own loader uses), so a
10k-shard corpus fans out across the cluster with zero coordination.
Tar parsing runs executor-side over Arrow batches (``mapInPandas``);
member payloads never pass through the driver. Sample reassembly
(grouping rows by key) is a narrow per-shard operation because a
sample's members are contiguous within one shard by construction —
``samples_from_members`` groups WITHOUT a shuffle using
``shard, key`` partitioning only when asked to.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("sample_key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read ``.tar`` shards under ``path`` (glob ok) into one row per
    tar member: (shard, sample_key, ext, n_bytes, payload).

    ``sample_key`` is the member basename up to the FIRST dot and
    ``ext`` everything after it (WebDataset's split rule, so
    ``x.seg.png`` → key ``x``, ext ``seg.png``). Directories and
    non-regular members are skipped.
    """
    shards = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("shard", "sample_key", "ext", "n_bytes", "payload")}
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        base = os.path.basename(m.name)
                        key, dot, ext = base.partition(".")
                        f = tf.extractfile(m)
                        payload = f.read() if f is not None else b""
                        out["shard"].append(shard_path)
                        out["sample_key"].append(key)
                        out["ext"].append(ext if dot else "")
                        out["n_bytes"].append(len(payload))
                        out["payload"].append(payload)
            yield pd.DataFrame(out)

    return shards.select("path", "content").mapInPandas(parse, MEMBER_SCHEMA)


def samples_from_members(members: DataFrame) -> DataFrame:
    """Reassemble member rows into one row per SAMPLE:
    (shard, sample_key, exts array, payloads map ext→binary).

    The groupBy keys on (shard, sample_key); at scale, members of a
    sample are adjacent in one shard, so with shard-partitioned input
    this aggregation is map-side dominant (each task sees whole
    samples).
    """
    return (
        members.groupBy("shard", "sample_key")
        .agg(
            F.sort_array(F.collect_list("ext")).alias("exts"),
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct(F.col("ext"), F.col("payload")))
                )
            ).alias("payloads"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )


def write_webdataset_local(
    rows: list[tuple[str, str, bytes]], out_dir: str, shard_size: int = 1000
) -> list[str]:
    """Fixture/test helper: write (sample_key, ext, payload) triples
    into ``.tar`` shards of ``shard_size`` SAMPLES each, members
    grouped by key in insertion order (the layout real WebDataset
    writers produce). Driver-local by design — production shard
    writing belongs to the data-producing job."""
    os.makedirs(out_dir, exist_ok=True)
    by_key: dict[str, list[tuple[str, bytes]]] = {}
    order: list[str] = []
    for key, ext, payload in rows:
        if key not in by_key:
            by_key[key] = []
            order.append(key)
        by_key[key].append((ext, payload))
    paths = []
    for s in range(0, len(order), shard_size):
        path = os.path.join(out_dir, f"shard-{s // shard_size:06d}.tar")
        with tarfile.open(path, "w") as tf:
            for key in order[s : s + shard_size]:
                for ext, payload in by_key[key]:
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(payload)
                    tf.addfile(info, io.BytesIO(payload))
        paths.append(path)
    return paths
