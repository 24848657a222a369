"""Log-table adapters.

The engine's canonical log schema (see ``schema.py``) mirrors the
reference's flattened Boom line. Any tabular source can be adapted into
it; ``events_as_logs`` maps the synthetic ``events`` table:

========== =============================
log column events expression
========== =============================
ts         epoch millis of ``ts``
message    ``event_type || ' ' || props``
event_id   ``event_id``
create_time epoch millis of ``ts``
block_no   ``user_id``
line_no    ``event_id``
========== =============================

``EVENTS_AS_LOGS_SQL`` is the *identical* mapping in ANSI/DuckDB SQL so
oracle queries share the exact adapter definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_AS_LOGS_SQL = """
    SELECT epoch_ms(ts) AS ts,
           event_type || ' ' || coalesce(props, '') AS message,
           event_id,
           epoch_ms(ts) AS create_time,
           user_id AS block_no,
           event_id AS line_no
    FROM events
"""


def events_as_logs(events: DataFrame) -> DataFrame:
    """Adapt the events table into the canonical log-line schema."""
    return events.select(
        F.unix_millis("ts").alias("ts"),
        F.concat(
            F.col("event_type"), F.lit(" "), F.coalesce(F.col("props"), F.lit(""))
        ).alias("message"),
        F.col("event_id"),
        F.unix_millis("ts").alias("create_time"),
        F.col("user_id").alias("block_no"),
        F.col("event_id").alias("line_no"),
    )


def write_first_item_text(
    df: DataFrame, path: str, col: str | None = None, mode: str = "overwrite"
) -> None:
    """First-item-only text sink — the
    ``pig/FirstItemOnlyStoreFunc.java:1`` analog: write ONLY the first
    (or a named) column of each row as a raw text line, silently
    dropping every other field. The reference uses it after the Pig
    format+sort to emit the formatted log line while discarding the
    (time, createTime, blockNo, lineNo) sort keys; the CLI's ``--out``
    path routes through here.

    Distributed: each partition writes its own part file — no driver
    funnel. When the input is a sorted range partitioning (the
    format_and_sort output), part files land in lexicographic order, so
    ``cat part-*`` preserves the total order.
    """
    first = col or df.columns[0]
    df.select(F.col(first).cast("string")).write.mode(mode).text(path)


def write_log_store(logs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write canonical log lines as parquet partitioned by (date, hour).

    This is the engine's native storage layout: the reference's
    ``/service/.../<yyyyMMdd>/<HH>/...`` directory scheme becomes Hive
    partitioning, so Catalyst partition pruning replaces the hand-rolled
    path resolution of the *ByTime tools. At 100 TB this is the layout
    that makes a one-hour query read one-hour's bytes.
    """
    (
        logs.withColumn("date", F.date_format(F.timestamp_millis(F.col("ts")), "yyyyMMdd"))
        .withColumn("hour", F.date_format(F.timestamp_millis(F.col("ts")), "HH"))
        # repartition on the partition keys first: otherwise every write
        # task emits a sliver file into every (date, hour) directory —
        # tasks × partitions small files instead of one file per dir
        .repartition("date", "hour")
        .write.partitionBy("date", "hour")
        .mode(mode)
        .parquet(path)
    )


def read_log_store(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def cat_by_time(spark, path: str, start_ms: int, end_ms: int) -> DataFrame:
    """CatByTime on the partitioned store: the time window becomes BOTH
    a partition filter (directory pruning — check ``PartitionFilters``
    in the scan) and a row-level ts predicate (exact half-open window).
    """
    from datetime import datetime, timedelta, timezone

    df = read_log_store(spark, path)
    d0 = datetime.fromtimestamp(start_ms / 1000, tz=timezone.utc)
    d1 = datetime.fromtimestamp(max(start_ms, end_ms - 1) / 1000, tz=timezone.utc)
    dates = []
    d = d0.date()
    while d <= d1.date():
        dates.append(d.strftime("%Y%m%d"))
        d += timedelta(days=1)
    out = df.filter(
        F.col("date").isin(dates)
        & (F.col("ts") >= F.lit(start_ms))
        & (F.col("ts") < F.lit(end_ms))
    )
    return out.select("ts", "message", "event_id", "create_time", "block_no", "line_no")
