"""Gzip text source — GzipTextInputFormat parity.

Spark's text source decompresses .gz transparently (one task per file,
gzip being unsplittable — the same constraint the reference's
``mapreduce/gzip/GzipTextInputFormat.java`` lives with). This module
just names the capability and pins the semantics with a helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_gzip_text(spark: SparkSession, path: str) -> DataFrame:
    """(line) rows from .gz (or plain) text files.

    NOTE for 100 TB: gzip files are unsplittable — one task per file.
    Prefer many medium files (or zstd/bzip2) for ingest parallelism.
    """
    return spark.read.text(path).select(F.col("value").alias("line"))
