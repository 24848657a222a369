"""Registry part 8: text-preparation queries (chunking, tf-idf
keywords, weighted sampling) over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bb_bigdata_log_tools_spark.operators import textprep
from bb_bigdata_log_tools_spark.session import ensure_parallelism, table

CHUNK_WINDOW = 64
CHUNK_OVERLAP = 16
_STRIDE = CHUNK_WINDOW - CHUNK_OVERLAP
TFIDF_K = 5

_BUCKET_SQL = (
    "(('0x' || substring(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    " % 10000 + 10000) % 10000"
)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprep.chunk_documents(
        table(spark, sf_dir, "documents"), CHUNK_WINDOW, CHUNK_OVERLAP
    )


SQL_CHUNK_DOCUMENTS = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS start_tok
  FROM t
  WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(start_tok // {_STRIDE} AS BIGINT) AS chunk_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(toks[start_tok + 1 : start_tok + {CHUNK_WINDOW}]) AS INTEGER)
         AS n_chunk_tokens,
       array_to_string(toks[start_tok + 1 : start_tok + {CHUNK_WINDOW}], ' ')
         AS chunk_text
FROM c
ORDER BY doc_id, chunk_id
"""


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprep.tfidf_keywords(table(spark, sf_dir, "documents"), TFIDF_K)


SQL_TFIDF_KEYWORDS = f"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS term
    FROM documents
  )
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, tf.term AS term, tf,
         round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1), 4) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TFIDF_K}
ORDER BY doc_id, rank
"""


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprep.sample_weighted(table(spark, sf_dir, "documents"))


SQL_SAMPLE_WEIGHTED = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
  FROM t
), p AS (
  SELECT doc_id,
         round(0.4 * least(n_chars / 500.0, 1.0)
               + 0.3 * (n_distinct_tokens / greatest(n_tokens, 1))
               + 0.3 * (alpha_chars / greatest(n_chars, 1)), 4) AS p_keep
  FROM f
)
SELECT doc_id, p_keep FROM p
WHERE {_BUCKET_SQL} < p_keep * 10000
ORDER BY doc_id
"""


TEXTPREP_QUERIES = {
    "chunk_documents": q_chunk_documents,
    "tfidf_keywords": q_tfidf_keywords,
    "sample_weighted": q_sample_weighted,
}

TEXTPREP_ORACLES = {
    "chunk_documents": SQL_CHUNK_DOCUMENTS,
    "tfidf_keywords": SQL_TFIDF_KEYWORDS,
    "sample_weighted": SQL_SAMPLE_WEIGHTED,
}


DUP_WINDOW = 16


def q_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprep.chunk_dedup_stats(
        table(spark, sf_dir, "documents"), DUP_WINDOW
    )


SQL_CHUNK_DEDUP_STATS = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {DUP_WINDOW})) AS start_tok
  FROM t WHERE len(toks) > 0
), ch AS (
  SELECT doc_id,
         md5(array_to_string(toks[start_tok + 1 : start_tok + {DUP_WINDOW}],
                             ' ')) AS chunk_h
  FROM c
), dfc AS (
  SELECT chunk_h, CAST(count(*) AS BIGINT) AS chunk_df
  FROM (SELECT DISTINCT doc_id, chunk_h FROM ch) GROUP BY 1
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN chunk_df > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       round(sum(CASE WHEN chunk_df > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         AS dup_chunk_ratio
FROM ch JOIN dfc USING (chunk_h)
GROUP BY doc_id
ORDER BY doc_id
"""


TEXTPREP_QUERIES["chunk_dedup_stats"] = q_chunk_dedup_stats
TEXTPREP_ORACLES["chunk_dedup_stats"] = SQL_CHUNK_DEDUP_STATS


BM25_TERMS = ["spark", "vector", "window"]
BM25_K = 20


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprep.bm25_search(
        table(spark, sf_dir, "documents"), BM25_TERMS, BM25_K
    )


_BM25_TERM_LIST = ", ".join(f"'{t}'" for t in BM25_TERMS)

SQL_BM25_SEARCH = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), lens AS (
  SELECT doc_id, len(toks) AS dl FROM t
), sc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM lens
), hits AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
  WHERE term IN ({_BM25_TERM_LIST})
  GROUP BY 1, 2
), dfs AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY 1
), scored AS (
  SELECT doc_id,
         round(sum(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1)
           * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
         ), 4) AS bm25
  FROM hits JOIN dfs USING (term) JOIN lens USING (doc_id) CROSS JOIN sc
  GROUP BY doc_id
), ranked AS (
  SELECT doc_id, bm25,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER)
           AS rank
  FROM scored
)
SELECT doc_id, bm25, rank FROM ranked WHERE rank <= {BM25_K}
ORDER BY rank
"""


TEXTPREP_QUERIES["bm25_search"] = q_bm25_search
TEXTPREP_ORACLES["bm25_search"] = SQL_BM25_SEARCH


# --------------------------------------------------------------------------
# round-5: tf-idf cosine pairs + char entropy
# --------------------------------------------------------------------------

TFIDF_COS_THRESHOLD = 0.5
TFIDF_COS_MAX_DF_FRAC = 0.2


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprep.tfidf_cosine_pairs(
        ensure_parallelism(table(spark, sf_dir, "documents")),
        TFIDF_COS_THRESHOLD,
        TFIDF_COS_MAX_DF_FRAC,
    )


SQL_TFIDF_COSINE_PAIRS = f"""
WITH tf AS (
  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY doc_id, tok
),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
dfreq AS (
  SELECT tok, count(*) AS df, n_docs FROM tf CROSS JOIN nd GROUP BY tok, n_docs
  HAVING count(*) <= {TFIDF_COS_MAX_DF_FRAC} * n_docs
),
w AS (
  SELECT doc_id, tok, tf * ln(n_docs / df) AS w
  FROM tf JOIN dfreq USING (tok)
),
norms AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id1, doc_id2,
       round(dot / (na.nrm * nb.nrm), 4) AS cos_sim
FROM dots
JOIN norms na ON doc_id1 = na.doc_id
JOIN norms nb ON doc_id2 = nb.doc_id
WHERE round(dot / (na.nrm * nb.nrm), 4) >= {TFIDF_COS_THRESHOLD}
ORDER BY doc_id1, doc_id2
"""


def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bb_bigdata_log_tools_spark.operators import textqc

    return textqc.text_entropy(table(spark, sf_dir, "documents"))


SQL_TEXT_ENTROPY = """
WITH chars AS (
  SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
  WHERE c <> ''
  GROUP BY doc_id, c
),
tot AS (
  SELECT doc_id, sum(n) AS len, count(*) AS n_distinct FROM chars GROUP BY doc_id
)
SELECT chars.doc_id,
       CAST(max(len) AS BIGINT) AS n_chars,
       CAST(max(n_distinct) AS BIGINT) AS n_distinct_chars,
       round(-sum((n / len) * ln(n / len)), 4) AS char_entropy
FROM chars JOIN tot ON chars.doc_id = tot.doc_id
GROUP BY chars.doc_id
ORDER BY chars.doc_id
"""


TEXTPREP_QUERIES["tfidf_cosine_pairs"] = q_tfidf_cosine_pairs
TEXTPREP_ORACLES["tfidf_cosine_pairs"] = SQL_TFIDF_COSINE_PAIRS
TEXTPREP_QUERIES["text_entropy"] = q_text_entropy
TEXTPREP_ORACLES["text_entropy"] = SQL_TEXT_ENTROPY


# --------------------------------------------------------------------------
# round-6: BPE merge-candidate statistics (tokenizer-fit diagnostic)
# --------------------------------------------------------------------------

BPE_TOP_N = 50


def q_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprep.bpe_pair_stats(
        ensure_parallelism(table(spark, sf_dir, "documents")), BPE_TOP_N
    )


SQL_BPE_PAIR_STATS = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(text, '\\s+')) AS tok FROM documents
),
pairs AS (
  SELECT substr(tok, i, 2) AS pair
  FROM (SELECT tok, unnest(generate_series(1, len(tok) - 1)) AS i
        FROM toks WHERE len(tok) >= 2)
),
counts AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM pairs GROUP BY pair
),
top AS (SELECT * FROM counts ORDER BY n_occurrences DESC, pair LIMIT {BPE_TOP_N})
SELECT pair, n_occurrences FROM top ORDER BY pair
"""

TEXTPREP_QUERIES["bpe_pair_stats"] = q_bpe_pair_stats
TEXTPREP_ORACLES["bpe_pair_stats"] = SQL_BPE_PAIR_STATS


# --------------------------------------------------------------------------
# round-7: iterative BPE tokenizer training (unrolled-oracle, the kmeans
# discipline)
# --------------------------------------------------------------------------

_BPE_MERGES = 3


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_train

    return bpe_train(
        ensure_parallelism(table(spark, sf_dir, "documents")), _BPE_MERGES
    )


def _bpe_train_oracle(n_merges: int = _BPE_MERGES) -> str:
    # each iteration unrolled as three CTEs (pair counts, best pair,
    # merged vocab) — the full-fidelity oracle pattern established by
    # kmeans_embeddings' 2-iteration unroll
    parts = [
        """
WITH v AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
t0 AS (
  SELECT w, freq,
         list_aggr(list_transform(range(1, length(w) + 1),
                                  i -> ' ' || w[i] || ' '),
                   'string_agg', '') || ' </w> ' AS toks
  FROM v
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f""",
p{i} AS (
  SELECT p, CAST(sum(freq) AS BIGINT) AS pair_freq
  FROM (
    SELECT freq, arr[j] || chr(1) || arr[j + 1] AS p
    FROM (SELECT freq, string_split(trim(toks), '  ') AS arr FROM t{i - 1}),
         LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS j)
  ) GROUP BY p
),
b{i} AS (
  SELECT string_split(p, chr(1))[1] AS l,
         string_split(p, chr(1))[2] AS r,
         pair_freq
  FROM p{i} ORDER BY pair_freq DESC, p ASC LIMIT 1
),
t{i} AS (
  SELECT w, freq,
         replace(toks, ' ' || b.l || '  ' || b.r || ' ',
                 ' ' || b.l || b.r || ' ') AS toks
  FROM t{i - 1}, b{i} b
)""")
    selects = [
        f"""SELECT {i} AS step, l AS "left", r AS "right",
       l || r AS merged, pair_freq FROM b{i}"""
        for i in range(1, n_merges + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY step"


TEXTPREP_QUERIES["bpe_train"] = q_bpe_train
TEXTPREP_ORACLES["bpe_train"] = _bpe_train_oracle()


# --------------------------------------------------------------------------
# round-7: apply the trained BPE merges back to the corpus
# --------------------------------------------------------------------------


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the vocabulary bpe_train learns
    on this corpus — the tokenizer loop's APPLY half, the number a
    token-budgeted mix actually consumes."""
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_apply

    return bpe_apply(
        ensure_parallelism(table(spark, sf_dir, "documents")), _BPE_MERGES
    )


def _bpe_apply_oracle(n_merges: int = _BPE_MERGES) -> str:
    # reuse the unrolled train chain through t{n} (the final merged
    # vocab), then tokenize: per-word token count = len(split(toks)),
    # joined back to the exploded corpus and summed per document
    train = _bpe_train_oracle(n_merges)
    chain = train.split("\nSELECT 1 AS step", 1)[0]
    # _bpe_train_oracle ends with the UNION ALL selects; strip them by
    # cutting at the first top-level SELECT after the CTE chain
    cut = chain.rfind(")")
    ctes = chain[: cut + 1]
    return f"""{ctes},
wt AS (
  SELECT w, CAST(len(string_split(trim(toks), '  ')) AS BIGINT) AS n_toks
  FROM t{n_merges}
),
dw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wt.n_toks) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, w FROM dw WHERE w <> '') d JOIN wt USING (w)
GROUP BY doc_id
ORDER BY doc_id
"""


TEXTPREP_QUERIES["bpe_apply"] = q_bpe_apply
TEXTPREP_ORACLES["bpe_apply"] = _bpe_apply_oracle()


# --------------------------------------------------------------------------
# round-8: HTML boilerplate extraction (the web-crawl pipeline's first
# operator) — the fixture page is SYNTHESIZED from the documents table
# by the same template in Spark and in the oracle SQL, so it exercises
# every adversarial class (comments, script/style payloads, nav/footer
# chrome, link-only lists, entity-encoded text, short stubs, mixed
# prose-with-inline-links) at any scale factor.
# --------------------------------------------------------------------------

#: (literal | ("col", name)) template parts — one source of truth for
#: the Spark concat and the SQL concat below.
_HTML_TEMPLATE: tuple = (
    '<html lang="',
    ("col", "lang"),
    '"><head><title>Doc ',
    ("col", "doc_id"),
    ' &amp; friends</title><meta name="description" content="Doc ',
    ("col", "doc_id"),
    " from ",
    ("col", "source"),
    ' in the crawl archive"><meta name="keywords" content="logs,spark,',
    ("col", "source"),
    '"><style>body{color:#222;font: 14px sans}</style>'
    '<script type="text/javascript">var t = "page view words that must'
    ' never leak into extracted text"; track(t);</script></head>'
    '<body><header><h1>Big Crawl Site Chrome Heading</h1></header>'
    '<nav><a href="/">Home</a> <a href="/about">About us</a>'
    ' <a href="/browse">Browse every section</a></nav>'
    "<!-- editorial draft note for ",
    ("col", "doc_id"),
    ": do not index this comment text --><div id=\"main\"><h2>Document ",
    ("col", "doc_id"),
    " from ",
    ("col", "source"),
    "</h2><p>",
    ("col", "text"),
    "</p><p>Short note.</p><p>Discuss &amp; share &quot;doc ",
    ("col", "doc_id"),
    '&quot; with friends in language ',
    ("col", "lang"),
    ' today.</p><ul><li><a href="/d/1">more like document one</a></li>'
    '<li><a href="/d/2">more like document two</a></li>'
    '<li><a href="/d/3">more like document three</a></li></ul>'
    '<p>See also <a href="/d/',
    ("col", "doc_id"),
    '">the related entry</a> plus a longer run of ordinary prose words'
    " keeping the anchor density of this closing paragraph low.</p>"
    "</div><footer>Copyright 2026 ",
    ("col", "source"),
    " network. All rights reserved.</footer></body></html>",
)


def _html_spark_col():
    from pyspark.sql import functions as F

    parts = []
    for p in _HTML_TEMPLATE:
        if isinstance(p, tuple):
            parts.append(F.col(p[1]).cast("string"))
        else:
            parts.append(F.lit(p))
    return F.concat(*parts)


def _html_sql_expr() -> str:
    parts = []
    for p in _HTML_TEMPLATE:
        if isinstance(p, tuple):
            parts.append(f"CAST({p[1]} AS VARCHAR)")
        else:
            parts.append("'" + p.replace("'", "''") + "'")
    return " || ".join(parts)


def q_html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ensure_parallelism: the op is scan-parallel zero-shuffle, so its
    # wall clock is bounded by the INPUT partitioning — the single-file
    # parquet read would otherwise run the whole regex pipeline in one
    # task (round-8 probe: 3.8 s single-task vs 0.6 s spread).
    from bb_bigdata_log_tools_spark.operators.html import html_extract_text

    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    pages = docs.select("doc_id", _html_spark_col().alias("html"))
    return html_extract_text(pages)


def _html_extract_oracle() -> str:
    from bb_bigdata_log_tools_spark.operators.html import html_extract_sql

    src = (
        f"SELECT doc_id, {_html_sql_expr()} AS html FROM documents"
    )
    return html_extract_sql(src)


TEXTPREP_QUERIES["html_extract_text"] = q_html_extract_text
TEXTPREP_ORACLES["html_extract_text"] = _html_extract_oracle()


# --------------------------------------------------------------------------
# round-8: byte-level BPE (GPT-2 style) — regex pretokens, hex-pair
# byte alphabet, unrolled-oracle like bpe_train.
# --------------------------------------------------------------------------

_BPE_BYTES_MERGES = 4


def _bpe_bytes_chain(n_merges: int) -> str:
    """The byte-level unrolled CTE chain: v = regex-pretoken freqs,
    t0 = wrapped hex-pair byte tokens (no </w>), then the same
    p{i}/b{i}/t{i} merge blocks as the char-level oracle."""
    from bb_bigdata_log_tools_spark.operators.textprep import (
        BYTE_PRETOKEN_PATTERN,
    )

    parts = [
        f"""
WITH v AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_extract_all(text, '{BYTE_PRETOKEN_PATTERN}'))
          AS w FROM documents)
  GROUP BY w
),
t0 AS (
  SELECT w, freq,
         list_aggr(list_transform(range(1, length(hex(encode(w))) // 2 + 1),
                                  i -> ' ' || substr(hex(encode(w)),
                                                     CAST(2*i - 1 AS INTEGER),
                                                     2) || ' '),
                   'string_agg', '') AS toks
  FROM v
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f""",
p{i} AS (
  SELECT p, CAST(sum(freq) AS BIGINT) AS pair_freq
  FROM (
    SELECT freq, arr[j] || chr(1) || arr[j + 1] AS p
    FROM (SELECT freq, string_split(trim(toks), '  ') AS arr FROM t{i - 1}),
         LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS j)
  ) GROUP BY p
),
b{i} AS (
  SELECT string_split(p, chr(1))[1] AS l,
         string_split(p, chr(1))[2] AS r,
         pair_freq
  FROM p{i} ORDER BY pair_freq DESC, p ASC LIMIT 1
),
t{i} AS (
  SELECT w, freq,
         replace(toks, ' ' || b.l || '  ' || b.r || ' ',
                 ' ' || b.l || b.r || ' ') AS toks
  FROM t{i - 1}, b{i} b
)""")
    return "".join(parts)


def q_bpe_train_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_train_bytes

    return bpe_train_bytes(
        ensure_parallelism(table(spark, sf_dir, "documents")),
        _BPE_BYTES_MERGES,
    )


def _bpe_train_bytes_oracle(n_merges: int = _BPE_BYTES_MERGES) -> str:
    chain = _bpe_bytes_chain(n_merges)
    selects = [
        f"""SELECT {i} AS step, l AS "left", r AS "right",
       l || r AS merged, pair_freq FROM b{i}"""
        for i in range(1, n_merges + 1)
    ]
    return chain + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY step"


def q_bpe_apply_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_apply_bytes

    return bpe_apply_bytes(
        ensure_parallelism(table(spark, sf_dir, "documents")),
        _BPE_BYTES_MERGES,
    )


def _bpe_apply_bytes_oracle(n_merges: int = _BPE_BYTES_MERGES) -> str:
    from bb_bigdata_log_tools_spark.operators.textprep import (
        BYTE_PRETOKEN_PATTERN,
    )

    chain = _bpe_bytes_chain(n_merges)
    return f"""{chain},
wt AS (
  SELECT w, CAST(len(string_split(trim(toks), '  ')) AS BIGINT) AS n_toks
  FROM t{n_merges}
),
dw AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{BYTE_PRETOKEN_PATTERN}'))
         AS w
  FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_pretokens,
       CAST(sum(wt.n_toks) AS BIGINT) AS n_tokens
FROM dw JOIN wt USING (w)
GROUP BY doc_id
ORDER BY doc_id
"""


TEXTPREP_QUERIES["bpe_train_bytes"] = q_bpe_train_bytes
TEXTPREP_ORACLES["bpe_train_bytes"] = _bpe_train_bytes_oracle()
TEXTPREP_QUERIES["bpe_apply_bytes"] = q_bpe_apply_bytes
TEXTPREP_ORACLES["bpe_apply_bytes"] = _bpe_apply_bytes_oracle()


# --------------------------------------------------------------------------
# round-8: the link-graph side of the synthesized pages — the crawl
# frontier html_extract_text deliberately throws away.
# --------------------------------------------------------------------------


def q_html_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bb_bigdata_log_tools_spark.operators.html import html_extract_links

    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    pages = docs.select("doc_id", _html_spark_col().alias("html"))
    return html_extract_links(pages)


def _html_links_oracle() -> str:
    from bb_bigdata_log_tools_spark.operators.html import (
        html_extract_links_sql,
    )

    src = f"SELECT doc_id, {_html_sql_expr()} AS html FROM documents"
    return html_extract_links_sql(src)


TEXTPREP_QUERIES["html_extract_links"] = q_html_extract_links
TEXTPREP_ORACLES["html_extract_links"] = _html_links_oracle()


# --------------------------------------------------------------------------
# round-8: page metadata extraction — the third HTML stage (title /
# lang attribute / description / keywords feed quality filters, dedup
# keys, and the language-ID prior).
# --------------------------------------------------------------------------


def q_html_extract_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bb_bigdata_log_tools_spark.operators.html import (
        html_extract_metadata,
    )

    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    pages = docs.select("doc_id", _html_spark_col().alias("html"))
    return html_extract_metadata(pages)


def _html_metadata_oracle() -> str:
    from bb_bigdata_log_tools_spark.operators.html import (
        html_extract_metadata_sql,
    )

    src = f"SELECT doc_id, {_html_sql_expr()} AS html FROM documents"
    return html_extract_metadata_sql(src)


TEXTPREP_QUERIES["html_extract_metadata"] = q_html_extract_metadata
TEXTPREP_ORACLES["html_extract_metadata"] = _html_metadata_oracle()
