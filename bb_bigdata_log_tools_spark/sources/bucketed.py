"""Bucketed-table support: co-located joins/aggregations without a
shuffle.

At 100 TB the dominant cost of repeated fact-fact joins (events ⋈
events, lineitem ⋈ orders) is re-shuffling the same data on the same
key every query. Writing the table bucketed by that key once
(``bucketBy`` + ``saveAsTable``) lets every subsequent sort-merge join
or aggregation reuse the on-disk partitioning: the plan shows NO
Exchange on the bucketed side (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
