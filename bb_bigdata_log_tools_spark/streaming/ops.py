"""Structured Streaming analogs of the batch log tools.

The reference is batch-only (MR jobs over closed hourly files); a Spark
engine gets the streaming versions almost for free, and they matter in
production: grep over a *live* ingest feed and continuously-maintained
hourly ingest stats (the streaming LogStats).

- :func:`stream_grep` — ``readStream`` (text or any streaming source
  adapted to the log schema) → the same codegen'd regex/time filter the
  batch ``grep`` uses → any sink. A tail -f | grep for the cluster.
- :func:`stream_hourly_stats` — event-time windowed counts/bytes with a
  watermark bounding state: late lines beyond the watermark are dropped
  exactly like LogStats' closed-hour accounting.

Scale notes: both are narrow (filter) or keyed-window (hour, component)
operators — state size is |components × open windows|, independent of
throughput; shuffle only on the window keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_grep(
    lines: DataFrame,
    regex: str,
    case_insensitive: bool = False,
    message_col: str = "message",
) -> DataFrame:
    """Filter a streaming DataFrame by unanchored regex (loggrep live).

    ``lines`` is any streaming DF with a ``message`` column (e.g.
    ``spark.readStream.text(dir)`` renamed, or a Kafka value decode).
    """
    pattern = f"(?i){regex}" if case_insensitive else regex
    return lines.filter(F.col(message_col).rlike(pattern))


def stream_hourly_stats(
    lines: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "event_time",
    key_col: str = "component",
) -> DataFrame:
    """Hourly ingest volumes over event time with bounded state.

    Output schema: (window_start, window_end, <key>, line_count,
    total_bytes) — the streaming equivalent of
    ``operators.index.log_stats_hourly``.
    """
    return (
        lines.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.sum(F.octet_length("message")).alias("total_bytes"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "line_count",
            "total_bytes",
        )
    )
