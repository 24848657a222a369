"""Registry part 4: query_index, multimodal metadata, LSH-bucketed ANN,
hfind, gzip text read, text→boom round-trip (SURVEY.md §2 rows 9, 10,
16, 17, 29, 34).

Every entry here is fully oracle-gated; the filesystem operators
(hfind, gzip read, boom round-trip) run over pinned fixtures so their
oracles are deterministic VALUES lists.
"""

from __future__ import annotations

import gzip
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.functions.hashing import permutation_params
from bb_bigdata_log_tools_spark.operators import index, similarity
from bb_bigdata_log_tools_spark.session import ensure_parallelism, table
from bb_bigdata_log_tools_spark.sources.logs import EVENTS_AS_LOGS_SQL, events_as_logs

_LOGS_CTE = f"WITH logs AS ({EVENTS_AS_LOGS_SQL})"

# active-at probe instant: 2024-01-15T00:00Z
ACTIVE_AT_MS = 1705276800000


def q_log_query_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = events_as_logs(table(spark, sf_dir, "events")).withColumn(
        "component", F.split(F.col("message"), " ").getItem(0)
    )
    idx = index.log_index(logs, keys=["component"])
    return index.query_index(idx, service_like="s", active_at_ms=ACTIVE_AT_MS)


SQL_LOG_QUERY_INDEX = f"""{_LOGS_CTE},
idx AS (
  SELECT string_split(message, ' ')[1] AS component,
         min(ts) AS start_ts,
         max(ts) AS end_ts,
         count(*) AS line_count,
         CAST(sum(strlen(message)) AS BIGINT) AS total_bytes
  FROM logs GROUP BY 1
)
SELECT * FROM idx
WHERE contains(component, 's')
  AND start_ts <= {ACTIVE_AT_MS} AND end_ts >= {ACTIVE_AT_MS}
ORDER BY component
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        attach_media,
        media_metadata,
    )

    docs = table(spark, sf_dir, "documents")
    return media_metadata(attach_media(docs)).orderBy("doc_id")


SQL_MULTIMODAL_META = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
         AS media_type,
       CAST(strlen(text) AS INTEGER) AS n_bytes,
       md5(text) AS content_md5
FROM documents
ORDER BY doc_id
"""


def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_parallelism(table(spark, sf_dir, "embeddings"))
    return similarity.ann_topk_lsh(emb, n_queries=20, k=10, n_planes=4)


def _plane_sql(j: int, dim: int = 64) -> str:
    params = permutation_params(4 * dim)
    signs = [1.0 if params[j * dim + i][0] % 2 == 1 else -1.0 for i in range(dim)]
    arr = "[" + ", ".join(str(s) for s in signs) + "]"
    return f"CASE WHEN list_dot_product(emb, {arr}) > 0 THEN {1 << j} ELSE 0 END"


SQL_ANN_LSH_BUCKETED = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
b AS (
  SELECT vec_id, emb,
         CAST({' + '.join(_plane_sql(j) for j in range(4))} AS BIGINT) AS bucket
  FROM e
),
q AS (SELECT vec_id AS q_id, emb AS q_emb, bucket AS q_bucket FROM b WHERE vec_id < 20),
scored AS (
  SELECT q.q_id, b.vec_id AS n_id,
         round(list_dot_product(q.q_emb, b.emb)
               / sqrt(list_dot_product(q.q_emb, q.q_emb))
               / sqrt(list_dot_product(b.emb, b.emb)), 4) AS cos_sim
  FROM b JOIN q ON b.bucket = q.q_bucket AND b.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, n_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY cos_sim DESC, n_id) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, n_id, cos_sim, rank FROM ranked WHERE rank <= 10
ORDER BY q_id, rank
"""


# hfind fixture: a deterministic tree with pinned names/sizes/mtimes so
# the filesystem operator gets a real VALUES-list oracle (same pattern
# as the gzip fixture below). Layout (sizes in bytes, mtimes pinned):
#   app.log 120 | app.log.bak 60 | xapp.log 35 | notes.txt 10
#   sub/error.log 240 | sub/tmp.log 40 | sub/sub2/deep.log 500
_HFIND_FILES = [
    ("app.log", 120),
    ("app.log.bak", 60),
    ("xapp.log", 35),
    ("notes.txt", 10),
    ("sub/error.log", 240),
    ("sub/tmp.log", 40),
    ("sub/sub2/deep.log", 500),
]
_HFIND_T0 = 1704067200  # 2024-01-01T00:00:00Z, +1 day per file


def _hfind_fixture_root() -> str:
    root = os.path.join(tempfile.gettempdir(), "bb_hfind_fixture")
    shutil.rmtree(root, ignore_errors=True)
    for i, (rel, size) in enumerate(_HFIND_FILES):
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(b"x" * size)
        os.utime(p, (_HFIND_T0 + i * 86400,) * 2)
    for d in [os.path.join(root, "sub/sub2"), os.path.join(root, "sub"), root]:
        os.utime(d, (_HFIND_T0,) * 2)
    return root


def q_hfind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two predicate probes over the pinned fixture tree, unioned:

    - probe 'anchored_glob': name 'app*' must match app.log + app.log.bak
      but NOT xapp.log (start-anchored full-name glob semantics);
    - probe 'size_depth': '*.log' files >= 100 bytes within depth 2 —
      exercises type/size/depth predicates together.
    """
    from bb_bigdata_log_tools_spark.sources.hfind import hfind

    root = _hfind_fixture_root()
    cols = [
        "name",
        F.col("size").cast("long").alias("size"),
        "depth",
        F.col("mtime_ms").cast("long").alias("mtime_ms"),
    ]
    a = hfind(spark, root, name_glob="app*", file_type="f").select(
        F.lit("anchored_glob").alias("probe"), *cols
    )
    b = hfind(
        spark, root, name_glob="*.log", file_type="f", min_size=100, max_depth=2
    ).select(F.lit("size_depth").alias("probe"), *cols)
    return a.unionAll(b).orderBy("probe", "name")


def _hfind_oracle() -> str:
    rows = []
    by_rel = {rel: (size, _HFIND_T0 + i * 86400) for i, (rel, size) in enumerate(_HFIND_FILES)}
    for rel in ["app.log", "app.log.bak"]:
        size, mt = by_rel[rel]
        rows.append(("anchored_glob", os.path.basename(rel), size, 1, mt * 1000))
    for rel in ["app.log", "sub/error.log"]:
        size, mt = by_rel[rel]
        rows.append(("size_depth", os.path.basename(rel), size, rel.count("/") + 1, mt * 1000))
    vals = ",\n  ".join(f"('{p}', '{n}', {s}, {d}, {m})" for p, n, s, d, m in rows)
    return (
        "SELECT probe, name, CAST(size AS BIGINT) AS size,"
        " CAST(depth AS INTEGER) AS depth, CAST(mtime_ms AS BIGINT) AS mtime_ms\n"
        f"FROM (VALUES\n  {vals}\n) AS t(probe, name, size, depth, mtime_ms)\n"
        "ORDER BY probe, name"
    )


REF_TEXT = "/root/reference/testcases/logsearch/logsearch-test-file.txt"


def q_gzip_text_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a .gz text file (prepared deterministically from the
    reference's fixed test corpus) through the text source."""
    from bb_bigdata_log_tools_spark.sources.gziptext import read_gzip_text

    gz_dir = os.path.join(tempfile.gettempdir(), "bb_gzip_read")
    os.makedirs(gz_dir, exist_ok=True)
    gz_path = os.path.join(gz_dir, "logsearch-test-file.txt.gz")
    if not os.path.exists(gz_path):
        with open(REF_TEXT, "rb") as f_in, gzip.open(gz_path, "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
    return read_gzip_text(spark, gz_path).orderBy("line")


def _gzip_oracle() -> str | None:
    if not os.path.exists(REF_TEXT):
        return None
    with open(REF_TEXT, encoding="utf-8") as f:
        lines = [line.rstrip("\n") for line in f]
    vals = ",\n  ".join("('" + line.replace("'", "''") + "')" for line in lines)
    return f"SELECT line FROM (VALUES\n  {vals}\n) AS t(line) ORDER BY line"


def q_text_to_boom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: reference text corpus → .bm (distributed write) →
    boom read. The oracle is the pinned parse of the fixed input."""
    from bb_bigdata_log_tools_spark.sources.boom import read_boom, text_to_boom

    out_dir = os.path.join(tempfile.gettempdir(), "bb_text_to_boom")
    shutil.rmtree(out_dir, ignore_errors=True)
    text_to_boom(spark, REF_TEXT, out_dir)
    return (
        read_boom(spark, out_dir)
        .select("ts", "message")
        .orderBy("ts", "message")
    )


def _text_to_boom_oracle() -> str | None:
    if not os.path.exists(REF_TEXT):
        return None
    # The parse the converter performs, expressed over the same pinned
    # input: split at first space, RFC5424-parse the head, keep the tail.
    with open(REF_TEXT, encoding="utf-8") as f:
        lines = [line.rstrip("\n") for line in f if line.strip()]
    vals = ",\n  ".join("('" + line.replace("'", "''") + "')" for line in lines)
    return f"""
WITH raw(value) AS (VALUES
  {vals}
)
SELECT epoch_ms(CAST(string_split(value, ' ')[1] AS TIMESTAMP)) AS ts,
       substring(value, strpos(value, ' ') + 1) AS message
FROM raw
WHERE TRY_CAST(string_split(value, ' ')[1] AS TIMESTAMP) IS NOT NULL
ORDER BY ts, message
"""




def q_log_cat_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cat over the partitioned parquet log store (built once per sf_dir
    in /tmp): the time window prunes (date, hour) partitions — the
    Catalyst-native replacement for CatByTime's path walking. Same
    result contract as ``log_cat`` → same oracle."""
    from bb_bigdata_log_tools_spark.registry import END_MS, START_MS
    from bb_bigdata_log_tools_spark.sources.logs import cat_by_time, write_log_store

    import hashlib

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]  # stable across processes
    store = os.path.join(tempfile.gettempdir(), f"bb_log_store_{key}")
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        write_log_store(events_as_logs(table(spark, sf_dir, "events")), store)
    return cat_by_time(spark, store, START_MS, END_MS)


MISC_QUERIES = {
    "log_cat_by_time": q_log_cat_by_time,
    "log_query_index": q_log_query_index,
    "multimodal_meta": q_multimodal_meta,
    "ann_lsh_bucketed": q_ann_lsh_bucketed,
    "hfind": q_hfind,
    "gzip_text_read": q_gzip_text_read,
    "text_to_boom": q_text_to_boom,
}

MISC_ORACLES = {
    k: v
    for k, v in {
        "log_query_index": SQL_LOG_QUERY_INDEX,
        "multimodal_meta": SQL_MULTIMODAL_META,
        "ann_lsh_bucketed": SQL_ANN_LSH_BUCKETED,
        "hfind": _hfind_oracle(),
        "gzip_text_read": _gzip_oracle(),
        "text_to_boom": _text_to_boom_oracle(),
    }.items()
    if v is not None
}

