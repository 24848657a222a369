"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``bb_bigdata_log_tools_spark/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full logcat pipeline (time-window cat →
    RFC5424 format → total order) over sf0.001 events-as-logs."""
    from bb_bigdata_log_tools_spark.registry import q_log_format_sort

    return q_log_format_sort(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bb_bigdata_log_tools_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bb_bigdata_log_tools_spark.registry import ORACLES

    return dict(ORACLES)
