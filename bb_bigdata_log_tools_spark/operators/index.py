"""Log indexing & ingest statistics.

Parity targets:
- ``/root/reference/src/com/blackberry/logdriver/util/IndexLogs.java`` —
  walk the log tree, aggregate per (dc, service, type, component):
  start/end dates, total/data/incoming/archive sizes.
- ``.../util/LogStats.java`` — per-hour data volumes for a component in
  [start, end); min/max/total over the window.
- ``.../util/QueryIndex.java`` — serve/filter that index.

The reference does this by driver-side filesystem recursion; Spark-first
it is a ``groupBy`` over partition/metadata columns with map-side partial
aggregation — the shuffle carries only (key, partial-agg) pairs, i.e.
kilobytes at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def log_index(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Aggregate per-component index: first/last timestamp, line count,
    byte size (IndexLogs.java's Component record, minus FS-specific
    archive/incoming splits which become ``status`` keys when present)."""
    keys = keys or [c for c in ("dc", "service", "log_type", "component") if c in df.columns]
    if not keys:
        keys = ["component"] if "component" in df.columns else ["event_type"]
    return (
        df.groupBy(*keys)
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("line_count"),
            F.sum(F.octet_length("message")).alias("total_bytes"),
        )
        .orderBy(*keys)
    )


def log_stats_hourly(
    df: DataFrame,
    start_ms: int | None = None,
    end_ms: int | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """Hourly ingest volumes (LogStats.getDataOverTime): per key and hour,
    the line count and byte volume inside [start, end)."""
    keys = keys or (["component"] if "component" in df.columns else ["event_type"])
    out = df
    if start_ms is not None:
        out = out.filter(F.col("ts") >= F.lit(start_ms))
    if end_ms is not None:
        out = out.filter(F.col("ts") < F.lit(end_ms))
    hour = F.date_trunc("hour", F.timestamp_millis(F.col("ts"))).alias("hour_ts")
    return (
        out.groupBy(*keys, hour)
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.sum(F.octet_length("message")).alias("total_bytes"),
        )
        .orderBy(*keys, "hour_ts")
    )


def query_index(
    index_df: DataFrame,
    service_like: str | None = None,
    active_at_ms: int | None = None,
) -> DataFrame:
    """QueryIndex.java: filter the index by service substring and/or a
    timestamp that must fall inside the component's [start, end] range."""
    out = index_df
    key = "service" if "service" in out.columns else out.columns[0]
    if service_like is not None:
        out = out.filter(F.col(key).contains(service_like))
    if active_at_ms is not None:
        out = out.filter(
            (F.col("start_ts") <= F.lit(active_at_ms))
            & (F.col("end_ts") >= F.lit(active_at_ms))
        )
    return out
