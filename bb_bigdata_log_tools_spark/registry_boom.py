"""Registry part 3: Boom-format and timestamp-parsing operators
(SURVEY.md §2a rows 11-14, 16).

``boom_read``'s oracle is the PINNED expected decode of the reference
repo's own golden .bm test file (independently cross-checked against
``reference-files/logcat-reference.txt`` in tests/test_boom_golden.py),
so the driver's t2 gate also covers the Avro container decoder.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.functions.timestamps import (
    format_timestamp,
    parse_rfc3164,
    parse_rfc5424,
)
from bb_bigdata_log_tools_spark.operators.util import small_sort
from bb_bigdata_log_tools_spark.session import table
from bb_bigdata_log_tools_spark.sources.boom import (
    read_boom,
    read_boom_local,
    read_boom_split,
)

BM_DIR = (
    "/root/reference/testcases/logsearch/logsearch-testservice/logs/"
    "20120228/10/logsearch-test/data"
)


def q_boom_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed decode of the reference golden .bm file (fixed input —
    independent of sf_dir)."""
    return read_boom(spark, BM_DIR)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _build_boom_values() -> str:
    bm = None
    for f in os.listdir(BM_DIR):
        if f.endswith(".bm"):
            bm = os.path.join(BM_DIR, f)
    rows = sorted(read_boom_local(bm))
    vals = ",\n  ".join(
        f"({r[0]}, {_sql_quote(r[1])}, {r[2]}, {r[3]}, {r[4]}, {r[5]})" for r in rows
    )
    return f"""
SELECT CAST(ts AS BIGINT) AS ts, message,
       CAST(event_id AS INTEGER) AS event_id,
       CAST(create_time AS BIGINT) AS create_time,
       CAST(block_no AS BIGINT) AS block_no,
       CAST(line_no AS BIGINT) AS line_no
FROM (VALUES
  {vals}
) AS t(ts, message, event_id, create_time, block_no, line_no)
"""


SQL_BOOM_READ = _build_boom_values() if os.path.isdir(BM_DIR) else None

# FastSearch-parity pushdown: Spark side filters INSIDE the decoder
# (block byte-scan before record decode, sources/boom.py:scan_boom_bytes);
# the oracle filters the pinned unfiltered decode in SQL — an
# independent read-then-filter check of the same contract.
PUSHDOWN_TERMS = ["contains", "Greek"]


def q_boom_read_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushed substring search on the reference golden .bm file
    (``util/FastSearch.java:76`` semantics; fixed input, independent of
    sf_dir)."""
    return read_boom(spark, BM_DIR, search_terms=PUSHDOWN_TERMS)


SQL_BOOM_READ_PUSHDOWN = (
    f"""
SELECT * FROM ({SQL_BOOM_READ}) AS unfiltered
WHERE message LIKE '%{PUSHDOWN_TERMS[0]}%' OR message LIKE '%{PUSHDOWN_TERMS[1]}%'
"""
    if SQL_BOOM_READ is not None
    else None
)


def q_ts_parse_rfc5424(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: events ts → RFC5424 string → parse back to epoch ms.

    Exercises the full parser path (fractional seconds + offset) on real
    data; output is (event_id, ts_string, parsed_ms).
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id", F.unix_millis("ts").alias("ms")
    )
    s = ev.withColumn("ts_string", format_timestamp(F.col("ms"), "RFC5424"))
    return s.select(
        "event_id", "ts_string", parse_rfc5424(F.col("ts_string")).alias("parsed_ms")
    ).transform(lambda d: small_sort(d, "event_id"))


SQL_TS_PARSE_RFC5424 = """
SELECT event_id,
       strftime(date_trunc('ms', ts), '%Y-%m-%dT%H:%M:%S.%g') || '+00:00' AS ts_string,
       epoch_ms(date_trunc('ms', ts)) AS parsed_ms
FROM events
ORDER BY event_id
"""


def q_ts_parse_rfc3164(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syslog-format round-trip with pinned ref_year=2024 (events data
    is all Jan 2024, so no year-boundary correction triggers; the
    boundary cases are unit-tested in tests/test_timestamps.py)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", F.unix_millis("ts").alias("ms")
    )
    s = ev.withColumn("ts_string", format_timestamp(F.col("ms"), "RFC3164"))
    return s.select(
        "event_id",
        "ts_string",
        parse_rfc3164(F.col("ts_string"), ref_year=2024).alias("parsed_ms"),
    ).transform(lambda d: small_sort(d, "event_id"))


SQL_TS_PARSE_RFC3164 = """
SELECT event_id,
       strftime(ts, '%b %d %H:%M:%S') AS ts_string,
       epoch_ms(date_trunc('second', ts)) AS parsed_ms
FROM events
ORDER BY event_id
"""

def q_boom_read_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The golden .bm decoded through the SYNC-SPLIT ranged reader with
    a 512-byte split (forcing many ranges over one small file) — must
    equal the whole-file decode exactly (fixed input, independent of
    sf_dir)."""
    return read_boom_split(spark, BM_DIR, split_bytes=512)


BOOM_QUERIES = {
    "boom_read": q_boom_read,
    "boom_read_split": q_boom_read_split,
    "boom_read_pushdown": q_boom_read_pushdown,
    "ts_parse_rfc5424": q_ts_parse_rfc5424,
    "ts_parse_rfc3164": q_ts_parse_rfc3164,
}

BOOM_ORACLES = {
    k: v
    for k, v in {
        "boom_read": SQL_BOOM_READ,
        "boom_read_split": SQL_BOOM_READ,
        "boom_read_pushdown": SQL_BOOM_READ_PUSHDOWN,
        "ts_parse_rfc5424": SQL_TS_PARSE_RFC5424,
        "ts_parse_rfc3164": SQL_TS_PARSE_RFC3164,
    }.items()
    if v is not None
}
