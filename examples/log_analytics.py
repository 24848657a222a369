"""Worked example: the LogTools workflow on the Spark engine.

Run:  python examples/log_analytics.py [sf_dir]

Covers the reference tools a log operator uses daily — cat/grep over a
time window, hourly stats, burst suppression, anomaly flags — plus the
SQL surface. Everything is lazy DataFrame algebra until .show().
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bb_bigdata_log_tools_spark.operators import logops  # noqa: E402
from bb_bigdata_log_tools_spark.operators.analytics import (  # noqa: E402
    events_robust_anomaly,
)
from bb_bigdata_log_tools_spark.operators.index import log_stats_hourly  # noqa: E402
from bb_bigdata_log_tools_spark.session import get_spark, table  # noqa: E402
from bb_bigdata_log_tools_spark.sources.logs import events_as_logs  # noqa: E402
from bb_bigdata_log_tools_spark.sqlapi import sql  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> None:
    owns_session = spark is None
    if owns_session:
        spark = get_spark()
    logs = events_as_logs(table(spark, sf_dir, "events"))

    # loggrep: regex over a time window (predicate pushdown to the scan)
    logops.grep(logs, '"k": 4[0-9]}', 0, 10**15).show(5, truncate=60)

    # hourly volumes (map-side partial aggregation), keyed by the
    # message's leading token; log_stats_hourly needs the raw ms `ts`
    log_stats_hourly(
        logs.select(
            "ts",
            F.split("message", " ").getItem(0).alias("component"),
            "message",
        )
    ).show(5)

    # syslog-style "last message repeated N times"
    logops.log_dedup_window(logs).show(5, truncate=40)

    # Drain-style template mining: one row per message KIND
    logops.log_templates(logs).show(5, truncate=40)

    # day-over-day volume trend per component (went-quiet detector)
    logops.log_volume_trend(logs).show(5)

    # robust anomaly flags on the hourly series
    events_robust_anomaly(table(spark, sf_dir, "events")).show(5)

    # the same engine through plain SQL
    sql(
        spark,
        sf_dir,
        """SELECT event_type, count(*) AS n FROM events
           GROUP BY 1 ORDER BY n DESC""",
    ).show()

    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
