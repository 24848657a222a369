"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB-equivalent oracle
SQL string (SURVEY.md §2 inventory).

Conventions that keep the oracle comparison exact:
- every computed column is aliased identically on both sides;
- floating-point aggregates are ``round(x, 4)`` on both sides (removes
  last-ulp summation-order noise);
- DuckDB ``sum(INTEGER/BIGINT)`` returns HUGEINT → oracles cast to
  BIGINT to match Spark's LongType;
- content hashing is md5-based (identical in both engines, see
  ``functions/hashing.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators import analytics, index, logops
from bb_bigdata_log_tools_spark.session import table
from bb_bigdata_log_tools_spark.sources.logs import EVENTS_AS_LOGS_SQL, events_as_logs

QueryFn = Callable[[SparkSession, str], DataFrame]

# Fixed query window: 2024-01-05T00:00Z .. 2024-01-20T00:00Z (events span
# all of Jan 2024 at every SF).
START_MS = 1704412800000
END_MS = 1705708800000

_LOGS_CTE = f"WITH logs AS ({EVENTS_AS_LOGS_SQL})"


def _logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_logs(table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# §2a reference-derived operators
# --------------------------------------------------------------------------


def q_log_cat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return logops.cat(_logs(spark, sf_dir), START_MS, END_MS)


SQL_LOG_CAT = f"""{_LOGS_CTE}
SELECT ts, message, event_id, create_time, block_no, line_no
FROM logs WHERE ts >= {START_MS} AND ts < {END_MS}
"""


def q_log_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return logops.grep(_logs(spark, sf_dir), '"k": 4[0-9]}', START_MS, END_MS)


SQL_LOG_GREP = f"""{_LOGS_CTE}
SELECT ts, message, event_id, create_time, block_no, line_no
FROM logs
WHERE ts >= {START_MS} AND ts < {END_MS}
  AND regexp_matches(message, '"k": 4[0-9]}}')
"""


def q_log_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return logops.search(
        _logs(spark, sf_dir), "PURCHASE", START_MS, END_MS, case_insensitive=True
    )


SQL_LOG_SEARCH = f"""{_LOGS_CTE}
SELECT ts, message, event_id, create_time, block_no, line_no
FROM logs
WHERE ts >= {START_MS} AND ts < {END_MS}
  AND contains(lower(message), lower('PURCHASE'))
"""


def q_log_multisearch_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    return logops.multisearch(
        _logs(spark, sf_dir), ["error", "signup"], START_MS, END_MS
    )


SQL_LOG_MULTISEARCH_OR = f"""{_LOGS_CTE}
SELECT ts, message, event_id, create_time, block_no, line_no
FROM logs
WHERE ts >= {START_MS} AND ts < {END_MS}
  AND (contains(message, 'error') OR contains(message, 'signup'))
"""


def q_log_multisearch_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    return logops.multisearch(
        _logs(spark, sf_dir),
        ["error", '"k": 8'],
        START_MS,
        END_MS,
        match_all=True,
    )


SQL_LOG_MULTISEARCH_AND = f"""{_LOGS_CTE}
SELECT ts, message, event_id, create_time, block_no, line_no
FROM logs
WHERE ts >= {START_MS} AND ts < {END_MS}
  AND contains(message, 'error') AND contains(message, '"k": 8')
"""


def q_log_format_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return logops.format_and_sort(
        logops.cat(_logs(spark, sf_dir), START_MS, END_MS)
    )


SQL_LOG_FORMAT_SORT = f"""{_LOGS_CTE}
SELECT strftime(date_trunc('ms', epoch_ms(ts)::TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%g')
         || '+00:00' || ' ' || message AS line,
       ts, message, event_id, create_time, block_no, line_no
FROM logs
WHERE ts >= {START_MS} AND ts < {END_MS}
ORDER BY ts, create_time, block_no, line_no
"""


def q_log_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = _logs(spark, sf_dir).withColumn(
        "component", F.split(F.col("message"), " ").getItem(0)
    )
    return index.log_index(logs, keys=["component"])


SQL_LOG_INDEX = f"""{_LOGS_CTE}
SELECT string_split(message, ' ')[1] AS component,
       min(ts) AS start_ts,
       max(ts) AS end_ts,
       count(*) AS line_count,
       CAST(sum(strlen(message)) AS BIGINT) AS total_bytes
FROM logs
GROUP BY 1 ORDER BY 1
"""


def q_log_stats_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = _logs(spark, sf_dir).withColumn(
        "component", F.split(F.col("message"), " ").getItem(0)
    )
    return index.log_stats_hourly(logs, START_MS, END_MS, keys=["component"])


SQL_LOG_STATS_HOURLY = f"""{_LOGS_CTE}
SELECT string_split(message, ' ')[1] AS component,
       date_trunc('hour', epoch_ms(ts)::TIMESTAMP) AS hour_ts,
       count(*) AS line_count,
       CAST(sum(strlen(message)) AS BIGINT) AS total_bytes
FROM logs
WHERE ts >= {START_MS} AND ts < {END_MS}
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# §2b analytics
# --------------------------------------------------------------------------


def _round4(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 4))
    return df


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = analytics.tpch_q1(table(spark, sf_dir, "lineitem"))
    return _round4(
        out,
        ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc"],
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = analytics.tpch_q3(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
    )
    return _round4(out, ["revenue"])


SQL_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 4) DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = analytics.tpch_q5(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"),
    )
    return _round4(out, ["revenue"])


SQL_TPCH_Q5 = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = analytics.events_sessionize(table(spark, sf_dir, "events"))
    return _round4(out, ["total_value"])


SQL_EVENTS_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(sum(new_session)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM s
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def q_events_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = analytics.events_topk_users(table(spark, sf_dir, "events"))
    return _round4(out, ["total_value"])


SQL_EVENTS_TOPK_USERS = """
WITH totals AS (
  SELECT event_type, user_id, sum(value) AS tv, count(*) AS n_events
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, user_id, round(tv, 4) AS total_value, n_events,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY tv DESC, user_id) AS INTEGER) AS rank
  FROM totals
)
SELECT event_type, user_id, total_value, n_events, rank
FROM ranked WHERE rank <= 5
ORDER BY event_type, rank
"""


# --------------------------------------------------------------------------
# registry assembly
# --------------------------------------------------------------------------

from bb_bigdata_log_tools_spark.registry_boom import (  # noqa: E402
    BOOM_ORACLES,
    BOOM_QUERIES,
)
from bb_bigdata_log_tools_spark.registry_analytics2 import (  # noqa: E402
    ANALYTICS2_ORACLES,
    ANALYTICS2_QUERIES,
)
from bb_bigdata_log_tools_spark.registry_misc import (  # noqa: E402
    MISC_ORACLES,
    MISC_QUERIES,
)
from bb_bigdata_log_tools_spark.registry_pipeline import (  # noqa: E402
    PIPELINE_ORACLES,
    PIPELINE_QUERIES,
)
from bb_bigdata_log_tools_spark.registry_avro import (  # noqa: E402
    AVRO_ORACLES,
    AVRO_QUERIES,
)
from bb_bigdata_log_tools_spark.registry_streaming import (  # noqa: E402
    STREAMING_ORACLES,
    STREAMING_QUERIES,
)
from bb_bigdata_log_tools_spark.registry_curation import (  # noqa: E402
    CURATION_ORACLES,
    CURATION_QUERIES,
)
from bb_bigdata_log_tools_spark.registry_textprep import (  # noqa: E402
    TEXTPREP_ORACLES,
    TEXTPREP_QUERIES,
)
from bb_bigdata_log_tools_spark.registry_sinks import (  # noqa: E402
    SINK_ORACLES,
    SINK_QUERIES,
)
from bb_bigdata_log_tools_spark.registry_datasetops import (  # noqa: E402
    DATASETOPS_ORACLES,
    DATASETOPS_QUERIES,
)

_ALL_QUERIES: dict[str, QueryFn] = {
    "log_cat": q_log_cat,
    "log_grep": q_log_grep,
    "log_search": q_log_search,
    "log_multisearch_or": q_log_multisearch_or,
    "log_multisearch_and": q_log_multisearch_and,
    "log_format_sort": q_log_format_sort,
    "log_index": q_log_index,
    "log_stats_hourly": q_log_stats_hourly,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "events_sessionize": q_events_sessionize,
    "events_topk_users": q_events_topk_users,
    **PIPELINE_QUERIES,
    **BOOM_QUERIES,
    **MISC_QUERIES,
    **ANALYTICS2_QUERIES,
    **AVRO_QUERIES,
    **CURATION_QUERIES,
    **TEXTPREP_QUERIES,
    **DATASETOPS_QUERIES,
    **STREAMING_QUERIES,
    **SINK_QUERIES,
}

# The external correctness gate verifies only the FIRST 50 ``queries()``
# keys each round. Rotate keys that have not yet received a driver-hard
# green row (everything registered after position 50 in rounds 1-3, plus
# new round-4 keys) to the front so every key accumulates hard evidence
# across rounds. Keys absent from the priority list keep their original
# relative order after it.
#
# Round-12 rotation (policy above, executed): (a) the seven new
# round-12 keys at the head so they earn driver evidence immediately;
# (b) the 31-key r7-vintage tail (oldest evidence on the tree —
# log_search onward, deferred from the round-11 rotation); (c) the r8
# cohort (CORRECTNESS_r08 order) fills the remaining window slots —
# html_extract_text through ann_topk_bruteforce make the 50 with
# seven new keys at the head; the r8 tail (ann_lsh_bucketed onward)
# leads round 13. After r12 no key's driver evidence is older than r8.
_WINDOW_PRIORITY: list[str] = [
    # --- round-12 new keys ---
    "sitemap_parse",
    "crawl_redirects",
    "fetch_conditional",
    "fetch_horizon",
    "sitemap_refresh",
    "cdx_store_prune",
    "warc_site_export",
    # --- the 31-key r7-vintage tail (deferred from round 11) ---
    "log_search",
    "log_multisearch_or",
    "log_multisearch_and",
    "log_index",
    "log_stats_hourly",
    "log_query_index",
    "log_cat_by_time",
    "boom_read",
    "ts_parse_rfc5424",
    "ts_parse_rfc3164",
    "text_to_boom",
    "gzip_text_read",
    "hfind",
    "multimodal_decode",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
    "tpch_q21",
    "tpch_q22",
    "events_sessionize",
    "events_topk_users",
    "events_funnel",
    "events_moving_avg",
    "events_hourly_anomaly",
    "text_ngram_counts",
    "dedup_exact",
    "dedup_ngram_jaccard",
    # --- r8 cohort (CORRECTNESS_r08 order; the first 12 fit this
    # round's 50-key window — ann_topk_bruteforce is the last in —
    # and the tail from ann_lsh_bucketed onward leads round 13) ---
    "html_extract_text",
    "html_extract_links",
    "html_extract_metadata",
    "image_dhash",
    "dedup_image",
    "dedup_image_cluster",
    "audio_fingerprint",
    "dedup_audio",
    "bpe_train_bytes",
    "bpe_apply_bytes",
    "dedup_embedding",
    "ann_topk_bruteforce",
    # --- r8 tail (leads the round-13 window) ---
    "ann_lsh_bucketed",
    "text_lang_id",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "text_repetition",
    "avro_generic_read",
    "avro_block_scan",
    "avro_block_merge",
    "tpch_q8",
    "tpch_q9",
    "tpch_q12",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "stream_grep",
    "stream_hourly_stats",
    "stream_dedup",
    "stream_funnel_match",
    "ann_recall_eval",
    "ann_topk_ivf",
    "bm25_search",
    "chunk_dedup_stats",
    "chunk_documents",
    "decontaminate",
    "dedup_cross_source",
    "dedup_incremental",
    "domain_mix_weights",
    "events_asof_join",
    "events_interval_join",
    "events_retention",
    "events_rfm",
    "kmeans_embeddings",
    "pack_sequences",
    "pii_scrub",
]

QUERIES: dict[str, QueryFn] = {
    k: _ALL_QUERIES[k] for k in _WINDOW_PRIORITY if k in _ALL_QUERIES
}
QUERIES.update(_ALL_QUERIES)  # existing keys keep position; rest append

ORACLES: dict[str, str] = {
    "log_cat": SQL_LOG_CAT,
    "log_cat_by_time": SQL_LOG_CAT,
    "log_grep": SQL_LOG_GREP,
    "log_search": SQL_LOG_SEARCH,
    "log_multisearch_or": SQL_LOG_MULTISEARCH_OR,
    "log_multisearch_and": SQL_LOG_MULTISEARCH_AND,
    "log_format_sort": SQL_LOG_FORMAT_SORT,
    "log_index": SQL_LOG_INDEX,
    "log_stats_hourly": SQL_LOG_STATS_HOURLY,
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q5": SQL_TPCH_Q5,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_topk_users": SQL_EVENTS_TOPK_USERS,
    **PIPELINE_ORACLES,
    **BOOM_ORACLES,
    **MISC_ORACLES,
    **ANALYTICS2_ORACLES,
    **AVRO_ORACLES,
    **CURATION_ORACLES,
    **TEXTPREP_ORACLES,
    **DATASETOPS_ORACLES,
    **STREAMING_ORACLES,
    **SINK_ORACLES,
}
