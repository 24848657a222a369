"""Registry part 9: dataset-layout / reporting queries — training-shard
shuffling, per-source dataset statistics, domain-blocklist filtering,
cohort retention, and SemDeDup-style semantic dedup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bb_bigdata_log_tools_spark.operators import analytics, datasetops, similarity
from bb_bigdata_log_tools_spark.operators.curation import (
    URL_DOMAIN_PATTERN,
    URL_PATTERN,
)
from bb_bigdata_log_tools_spark.registry_curation import (
    _INJECT_URL_SQL,
    _inject_urls,
)
from bb_bigdata_log_tools_spark.session import ensure_parallelism, table

N_SHARDS = 16

_MD5_BUCKET = (
    "(('0x' || substring(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 15))"
    "::BIGINT)"
)


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return datasetops.shuffle_shards(
        table(spark, sf_dir, "documents"), N_SHARDS
    )


SQL_SHUFFLE_SHARDS = f"""
WITH s AS (
  SELECT doc_id,
         CAST({_MD5_BUCKET.format(salt='shard')} % {N_SHARDS} AS INTEGER)
           AS shard,
         {_MD5_BUCKET.format(salt='pos')} AS pos_key
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY pos_key, doc_id)
            AS INTEGER) AS shard_pos
FROM s
ORDER BY shard, shard_pos
"""


def q_dataset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return datasetops.dataset_stats(table(spark, sf_dir, "documents"))


SQL_DATASET_STATS = """
WITH t AS (
  SELECT source, lang, n_chars,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS doc_tokens
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(doc_tokens) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       round(avg(n_chars), 2) AS mean_chars,
       round(quantile_cont(n_chars, 0.5), 2) AS median_chars,
       max(n_chars) AS max_chars
FROM t GROUP BY source ORDER BY source
"""


BLOCKLIST = ["cdn1.net", "site2.example.com"]


def q_filter_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _inject_urls(table(spark, sf_dir, "documents"))
    return (
        datasetops.filter_blocklist(docs, BLOCKLIST, text_col="text2")
        .select("doc_id", "source", "n_urls")
        .orderBy("doc_id")
    )


SQL_FILTER_BLOCKLIST = f"""
WITH aug AS (
  SELECT doc_id, source, {_INJECT_URL_SQL} AS text2 FROM documents
), u AS (
  SELECT doc_id, source,
         regexp_extract_all(text2, '{URL_PATTERN}') AS urls
  FROM aug
), e AS (
  SELECT doc_id, source, CAST(len(urls) AS INTEGER) AS n_urls,
         list_transform(urls,
           x -> lower(regexp_extract(x, '{URL_DOMAIN_PATTERN}', 1))) AS domains
  FROM u
)
SELECT doc_id, source, n_urls
FROM e
WHERE NOT list_has_any(domains,
      [{", ".join("'" + d + "'" for d in BLOCKLIST)}])
ORDER BY doc_id
"""


RETENTION_MAX_OFFSET = 14


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_retention(
        ensure_parallelism(table(spark, sf_dir, "events")), RETENTION_MAX_OFFSET
    )


SQL_EVENTS_RETENTION = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), fact AS (
  SELECT user_id, day,
         min(day) OVER (PARTITION BY user_id) AS cohort_day
  FROM days
), cells AS (
  SELECT cohort_day,
         CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM fact
  WHERE date_diff('day', cohort_day, day) <= {RETENTION_MAX_OFFSET}
  GROUP BY 1, 2
), sizes AS (
  SELECT cohort_day, n_active AS cohort_size FROM cells WHERE day_offset = 0
)
SELECT c.cohort_day, c.day_offset, c.n_active, s.cohort_size,
       round(c.n_active * 1.0 / s.cohort_size, 4) AS retention
FROM cells c JOIN sizes s USING (cohort_day)
ORDER BY cohort_day, day_offset
"""


SEMDEDUP = dict(threshold=0.3, n_cells=8, dim=64)

_COS = (
    "list_dot_product({a}, {b}) / sqrt(list_dot_product({a}, {a}))"
    " / sqrt(list_dot_product({b}, {b}))"
)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_parallelism(table(spark, sf_dir, "embeddings"))
    return similarity.semdedup(emb, **SEMDEDUP)


SQL_SEMDEDUP = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cen AS (SELECT vec_id AS c_id, emb AS c_emb FROM e
        WHERE vec_id < {SEMDEDUP['n_cells']}),
assign AS (
  SELECT e.vec_id, cen.c_id,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY
           {_COS.format(a='e.emb', b='cen.c_emb')} DESC, cen.c_id) AS rnk
  FROM e CROSS JOIN cen
),
cells AS (SELECT vec_id, c_id AS cell FROM assign WHERE rnk = 1),
pairs AS (
  SELECT cb.vec_id AS vec_id, ca.cell AS cell, ca.vec_id AS neighbor,
         round({_COS.format(a='ae.emb', b='be.emb')}, 4) AS cos_sim
  FROM cells ca
  JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
  JOIN e ae ON ae.vec_id = ca.vec_id
  JOIN e be ON be.vec_id = cb.vec_id
)
SELECT vec_id, cell, min(neighbor) AS dup_of,
       round(max(cos_sim), 4) AS max_cos
FROM pairs WHERE cos_sim >= {SEMDEDUP['threshold']}
GROUP BY vec_id, cell
ORDER BY vec_id
"""


DATASETOPS_QUERIES = {
    "shuffle_shards": q_shuffle_shards,
    "dataset_stats": q_dataset_stats,
    "filter_blocklist": q_filter_blocklist,
    "events_retention": q_events_retention,
    "semdedup": q_semdedup,
}

DATASETOPS_ORACLES = {
    "shuffle_shards": SQL_SHUFFLE_SHARDS,
    "dataset_stats": SQL_DATASET_STATS,
    "filter_blocklist": SQL_FILTER_BLOCKLIST,
    "events_retention": SQL_EVENTS_RETENTION,
    "semdedup": SQL_SEMDEDUP,
}
