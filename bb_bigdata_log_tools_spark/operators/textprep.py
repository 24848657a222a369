"""Corpus text-preparation operators: RAG-style chunking, tf-idf
keyword extraction, and quality-weighted deterministic sampling — the
retrieval/indexing-side companions to the curation stages in
``curation.py``.

Everything is built-in column expressions or standard agg/window
relational shapes; no Python UDFs, no driver-side collects. Sampling
keys on md5 (bit-identical in Spark and DuckDB — functions/hashing.py),
never ``rand()``, so results are stable across engines, retries, and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.functions.hashing import md5_long
from bb_bigdata_log_tools_spark.operators.util import small_sort

#: Hash-bucket denominator shared with curation sampling (0.01 %).
SAMPLE_DENOM = 10_000


def chunk_documents(
    documents: DataFrame,
    window: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size overlapping token windows per document — the chunking
    stage of a RAG / embedding-index pipeline (and the retrieval-side
    counterpart of ``pack_sequences``' training layout).

    Chunks start every ``window − overlap`` tokens and carry up to
    ``window`` tokens each; the trailing chunk may be short. Output per
    chunk: (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text).

    100 TB shape: pure per-row column algebra — split once, fan out via
    ``posexplode(sequence(...))``, slice+join per chunk. Scan-parallel,
    no shuffle; the fan-out factor is ~n_tokens/stride per doc, the
    same rows an indexer must embed anyway.
    """
    if window < 1 or overlap < 0:
        # loud: window=0 slices zero-token chunks for every doc
        raise ValueError(f"need window >= 1 and overlap >= 0, got {window}/{overlap}")
    if overlap >= window:
        raise ValueError(f"overlap {overlap} must be < window {window}")
    stride = window - overlap
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride))
    chunk_toks = F.slice(F.col("toks"), F.col("start_tok") + 1, window)
    return (
        documents.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select("doc_id", "toks", F.posexplode(starts).alias("chunk_id", "start_tok"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.size(chunk_toks).alias("n_chunk_tokens"),
            F.array_join(chunk_toks, " ").alias("chunk_text"),
        )
        .transform(lambda d: small_sort(d, "doc_id", "chunk_id"))
    )


def tfidf_keywords(
    documents: DataFrame,
    k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` keywords by tf-idf over whitespace terms.

    score = tf · (ln((N+1)/(df+1)) + 1) (smoothed idf), rounded to 4dp;
    ranking uses the ROUNDED score with the term string as tie-break so
    the top-k set is fully deterministic and engine-independent (raw
    ln() may differ in the last ulp between libms; rounding before the
    rank removes that from the comparison).

    100 TB shape: one explode → (doc, term) tf aggregation (map-side
    partials), a |vocab|-row document-frequency aggregate joined back on
    term, the corpus size N broadcast as a 1-row scalar, and the top-k
    window partitioned by doc_id — every shuffle is keyed and
    partial-aggregated; nothing is quadratic.
    """
    tf = (
        documents.select(
            "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .transform(lambda d: small_sort(d, "doc_id", "rank"))
    )


def sample_weighted(
    documents: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Quality-weighted deterministic Bernoulli sample: each document is
    kept with probability equal to its ``text_quality`` composite score
    — the "sample good data more" selection step between scoring and
    training-set assembly.

    The coin is ``md5('w:' || doc_id) mod 10000 < round(score,4)·10000``
    — deterministic, engine-exact, retry-stable (the same doc always
    gets the same verdict), and independent of the stratified sampler's
    hash stream (different salt). Output: kept rows with their
    ``p_keep``.

    100 TB shape: one scan, zero shuffle — the score and the coin are
    both per-row column algebra.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length(F.col(text_col))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    score = F.round(
        F.lit(0.4) * F.least(n_chars / F.lit(500.0), F.lit(1.0))
        + F.lit(0.3) * (n_distinct / F.greatest(n_tokens, F.lit(1)))
        + F.lit(0.3) * (alpha_chars / F.greatest(n_chars, F.lit(1))),
        4,
    )
    bucket = F.pmod(
        md5_long(F.concat(F.lit("w:"), F.col(key_col).cast("string"))),
        F.lit(SAMPLE_DENOM),
    )
    return (
        documents.withColumn("p_keep", score)
        .filter(bucket < F.col("p_keep") * SAMPLE_DENOM)
        .select("doc_id", "p_keep")
        .transform(lambda d: small_sort(d, "doc_id"))
    )


def chunk_dedup_stats(
    documents: DataFrame,
    window: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicate-chunk profile — the fixed-window analog
    of line-level dedup (RefinedWeb/CCNet remove lines repeated across
    pages; this corpus has no line structure, so non-overlapping
    ``window``-token chunks stand in).

    Per document: total chunks, chunks whose md5 also appears in some
    OTHER document, and the duplicate ratio — the signal used to drop
    boilerplate-heavy documents.

    100 TB shape: chunk fan-out is scan-parallel; the chunk-hash
    document-frequency aggregate is the one shuffle and carries
    (hash, count) only — never chunk text. The per-doc roll-up reuses
    the exploded relation (no second corpus scan: the chunk relation
    re-aggregates by doc_id).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(window))
    chunk_toks = F.slice(F.col("toks"), F.col("start_tok") + 1, window)
    chunks = (
        documents.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select("doc_id", "toks", F.posexplode(starts).alias("chunk_id", "start_tok"))
        .select(
            "doc_id",
            F.md5(F.array_join(chunk_toks, " ")).alias("chunk_h"),
        )
    )
    # document frequency per chunk hash: in how many DISTINCT docs does
    # this exact chunk occur?
    df_counts = (
        chunks.distinct()
        .groupBy("chunk_h")
        .agg(F.count("*").alias("chunk_df"))
    )
    return (
        chunks.join(df_counts, "chunk_h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("chunk_df") > 1).cast("long")).alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 4).alias(
                "dup_chunk_ratio"
            ),
        )
        .transform(lambda d: small_sort(d, "doc_id"))
    )


def bm25_search(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Ranked full-text search: Okapi BM25 top-k documents for a bag of
    query terms — the retrieval operator a log/document corpus needs
    beyond boolean grep.

    idf = ln((N − df + 0.5)/(df + 0.5) + 1) (the +1 form, always
    positive); score sums idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).

    100 TB shape: the exploded term stream is filtered to the query's
    terms BEFORE any shuffle (the corpus-sized explode never leaves the
    map side); (doc, term) tf and per-term df are partial aggregates
    over that filtered sliver; N/avgdl are 1-row broadcasts; ranking
    rounds the score so cross-engine ties resolve identically by
    (score desc, doc_id).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    # two cheap pushdown scans beat materializing the tokenized corpus:
    # lens reads only lengths, hits explodes map-side and filters first.
    base = documents.select("doc_id", toks.alias("toks"))
    lens = base.select("doc_id", F.size("toks").alias("dl"))
    scalars = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = hits.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        hits.join(F.broadcast(dfs), "term")
        .join(lens, "doc_id")
        .join(F.broadcast(scalars))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 4).alias("bm25"))
    )
    # global rank over MATCHING docs only (those sharing a query term) —
    # for selective queries that relation is small; for stop-word-like
    # queries swap in a per-partition top-k pre-filter before this rank.
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "bm25", "rank")
    )


def clean_text(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization pass that precedes tokenization in every corpus
    pipeline: URLs and emails become placeholder tokens, whitespace
    runs collapse, edges trim. Output keeps before/after char counts
    so the aggregate cleaning impact is one `sum` away.

    Pure codegen regexp chain — scan-parallel, zero shuffle; patterns
    are the same RE2/Java-compatible ones the PII scrubber uses.
    """
    from bb_bigdata_log_tools_spark.operators.curation import (
        PII_PATTERNS,
        URL_PATTERN,
    )

    cleaned = F.regexp_replace(F.col(text_col), URL_PATTERN, "<URL>")
    cleaned = F.regexp_replace(cleaned, PII_PATTERNS["email"], "<EMAIL>")
    cleaned = F.trim(F.regexp_replace(cleaned, " +", " "))
    return documents.select(
        "doc_id",
        F.length(F.col(text_col)).alias("n_chars_before"),
        cleaned.alias("text_clean"),
        F.length(cleaned).alias("n_chars_after"),
    ).transform(lambda d: small_sort(d, "doc_id"))


def near_template_clusters(documents: DataFrame, min_docs: int = 2) -> DataFrame:
    """Template-family detection: documents built from the SAME parts —
    numbers masked (``[0-9]+`` → ``#``), then the SORTED DISTINCT token
    set as the family fingerprint. Catches the machine-generated
    boilerplate class (receipts, log dumps, listings: same words,
    varying numbers) AND word-shuffled template families (same
    vocabulary, permuted order) that near-dup LSH finds pair-by-pair
    but a single canonical hash finds in ONE pass.

    Output: one row per template family with ≥ ``min_docs`` members —
    (template_md5, n_docs, n_sources, min_doc_id, template_preview).

    100 TB shape: scan → regexp_replace/array_sort (codegen'd column
    algebra) → md5 groupBy with map-side partial agg; single shuffle on
    the digest, output bounded by |families|. This is the cheapest
    dedup signal in the family — run it BEFORE the quadratic-candidate
    ops and drop whole families.
    """
    masked = F.regexp_replace(F.col("text"), "[0-9]+", "#")
    tmpl = F.array_join(
        F.array_sort(F.array_distinct(F.split(masked, " "))), " "
    )
    return (
        documents.select(
            "doc_id",
            "source",
            F.md5(tmpl).alias("template_md5"),
            F.substring(tmpl, 1, 60).alias("template_prefix"),
        )
        .groupBy("template_md5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.min("template_prefix").alias("template_preview"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .transform(lambda d: small_sort(d, "min_doc_id"))
    )


def tfidf_cosine_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    max_df_frac: float = 0.2,
    sort: bool = True,
) -> DataFrame:
    """Document-pair cosine similarity over tf-idf weighted token
    vectors — the classic sparse-vector near-dup/related-docs signal
    that complements set-based Jaccard (it weighs WHICH tokens are
    shared, so two docs sharing rare vocabulary outrank two sharing
    stopwords).

    Relational sparse algebra, no vectors materialized: tf per
    (doc, token) → document frequencies → idf = ln(N/df) weights →
    inverted-index self-join on token accumulating Σ w₁w₂ → divide by
    the precomputed L2 norms. Tokens present in more than
    ``max_df_frac`` of the corpus are dropped BEFORE the join — the
    standard fractional stopword cap: a token in 20 % of N docs fans
    out (0.2N)² pairs while its idf ≈ ln(5) carries almost no signal
    (the ``jaccard_pairs`` discipline, scale-relative instead of
    absolute so the knob survives any corpus size); norms are computed
    on the capped relation so the cosine stays exact over the kept
    vocabulary.

    Output: (doc_id1, doc_id2, cos_sim) with cos_sim ≥ ``threshold``.

    100 TB shape: two partial-agg groupBys + one df-capped equi-join;
    per-token join output is bounded by C(max_df_frac·N, 2) ONLY for
    tokens that are themselves rare enough to carry signal.
    """
    n_docs = documents.select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    tf = (
        documents.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") <= F.lit(max_df_frac) * F.col("n_docs"))
        .select("tok", "df", "n_docs")
    )
    w = (
        tf.join(dfreq, "tok")
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = w.alias("a")
    b = w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id1"),
            F.col("b.doc_id").alias("doc_id2"),
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.alias("na")
    nb = norms.alias("nb")
    return (
        dots.join(na, F.col("doc_id1") == F.col("na.doc_id"))
        .join(nb, F.col("doc_id2") == F.col("nb.doc_id"))
        .select(
            "doc_id1",
            "doc_id2",
            F.round(
                F.col("dot") / (F.col("na.nrm") * F.col("nb.nrm")), 4
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .transform(
            lambda d: small_sort(d, "doc_id1", "doc_id2") if sort else d
        )
    )


def bpe_pair_stats(
    documents: DataFrame,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """The first iteration of BPE vocabulary training (Sennrich et al.
    2016): corpus-wide frequencies of ADJACENT CHARACTER PAIRS within
    whitespace tokens — the statistic the merge step maximizes. Running
    it as a standalone report is the standard tokenizer-fit diagnostic
    (which merges a vocab trained on this corpus would learn first, how
    concentrated the pair mass is).

    Pure column algebra: split → explode tokens → substring pairs via
    transform over an index sequence → one partial-agg groupBy(pair);
    the shuffle carries (2-char pair, count) only. Top-N by
    (count desc, pair) via TakeOrderedAndProject — no global sort.

    Output: (pair, n_occurrences), deterministic ordering.
    """
    toks = documents.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return (
        counts.orderBy(F.desc("n_occurrences"), F.col("pair"))
        .limit(top_n)
        .orderBy("pair")
    )


def bpe_train(
    documents: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus (Sennrich et al.
    2016): the iterative tokenizer-training loop itself, one step up
    from the single-snapshot :func:`bpe_pair_stats` diagnostic.

    The classic formulation — and the whole 100 TB story: the corpus
    is scanned ONCE into the (word, freq) vocabulary relation, and
    every merge iteration runs on that |vocab|-sized table (pair
    explode → weighted count → argmax → apply merge), never touching
    the corpus again. Each word starts as wrapped single-char tokens
    plus the ``</w>`` end-of-word marker; the best pair per step is
    picked by (frequency DESC, pair ASC) — a deterministic tie-break,
    TakeOrdered(1), never a global sort.

    Merge application uses a WRAPPED-TOKEN string form (every token
    as " tok ", concatenated) so plain ``replace`` of " L  R " with
    " LR " merges left-to-right non-overlapping occurrences with
    byte-identical semantics in Spark and DuckDB — including adjacent
    repeats ("L R L R" → "LR LR"), which a single-space encoding gets
    wrong because neighbors would share the delimiter. Lineage is
    localCheckpoint-bounded per iteration (the kmeans discipline).

    Output: one row per merge step —
    (step, left, right, merged, pair_freq).
    """
    merge_rows, _ = _bpe_vocab_merges(documents, n_merges, text_col)
    return _merges_df(documents.sparkSession, merge_rows)


def _bpe_vocab_merges(
    documents: DataFrame, n_merges: int, text_col: str
) -> tuple[list, DataFrame]:
    """Shared BPE core: build the wrapped-token (word, freq, toks)
    vocab relation, run ``n_merges`` merge iterations on it, and return
    (driver-side (step, left, right, pair_freq) tuples, final merged
    vocab). Used by
    :func:`bpe_train` (wants the merge list) and :func:`bpe_apply`
    (wants the tokenized vocab). Stops early if the corpus EXHAUSTS
    (every word fully merged → no pairs left): the merge list ends and
    the last non-empty vocab is returned — the empty `best` must not
    cross-join the vocab away."""
    words = (
        documents.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, F.lit(1)),
    )
    wrapped = F.concat(
        F.aggregate(
            chars,
            F.lit(""),
            lambda acc, c: F.concat(acc, F.lit(" "), c, F.lit(" ")),
        ),
        F.lit(" </w> "),
    )
    cur = words.select("w", "freq", wrapped.alias("toks")).localCheckpoint()
    return _bpe_merge_loop(cur, n_merges)


def _merges_df(spark, merge_rows: list) -> DataFrame:
    """(step, left, right, merged, pair_freq) DataFrame from the
    driver-side merge list both trainers collect — values identical to
    the old per-step 1-row union chain, in one createDataFrame."""
    return spark.createDataFrame(
        [(s, lt, rt, lt + rt, fq) for s, lt, rt, fq in merge_rows],
        "step int, left string, right string, merged string, pair_freq long",
    ).orderBy("step")


def _bpe_merge_loop(cur: DataFrame, n_merges: int) -> tuple[list, DataFrame]:
    """The tokenizer-agnostic BPE merge iteration over a wrapped-token
    (w, freq, toks) vocab relation — shared by the char-level
    (:func:`bpe_train`, ``</w>``-marked) and byte-level
    (:func:`bpe_train_bytes`, hex-pair) front ends. Semantics and
    tie-breaks exactly as documented on :func:`bpe_train`.

    Returns ([(step, left, right, pair_freq), ...], final vocab). The
    per-step argmax is ONE row pulled to the driver (the same 1-row
    scalar class as the existing broadcast-crossJoin scalars), so each
    step is a single TakeOrdered job and the merge applies as a literal
    ``replace`` — the r12 optimization round removed the per-step
    best-checkpoint + isEmpty + broadcast-crossJoin + vocab-checkpoint
    choreography (4-5 jobs/step → 1; guide §1.2/§2.4). The vocab
    relation stays a narrow replace chain over its initial checkpoint,
    re-materialized every 8 merges only to bound expression depth for
    large ``n_merges``."""
    sep = "\x01"  # pair-key separator: never occurs in corpus tokens
    merge_rows: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        arr = F.split(F.trim(F.col("toks")), "  ")
        # a FULLY-MERGED word (single token, e.g. "a</w>" after the
        # (a, </w>) merge wins) contributes no pairs: guard the
        # size-1 case, where sequence(1, size-1) = sequence(1, 0)
        # silently DESCENDS to [1, 0] and element_at(arr, 2) throws —
        # the oracle's generate_series(1, 0) is simply empty.
        pairs = F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - 1),
                lambda i: F.concat(
                    F.element_at(arr, i),
                    F.lit(sep),
                    F.element_at(arr, i + F.lit(1)),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        pc = (
            cur.select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        best = (
            pc.orderBy(F.desc("pair_freq"), F.asc("p"))
            .limit(1)
            .select(
                F.split_part(F.col("p"), F.lit(sep), F.lit(1)).alias("left"),
                F.split_part(F.col("p"), F.lit(sep), F.lit(2)).alias("right"),
                "pair_freq",
            )
            .first()
        )
        if best is None:
            break
        left, right, pair_freq = best["left"], best["right"], best["pair_freq"]
        merge_rows.append((step, left, right, pair_freq))
        cur = cur.withColumn(
            "toks",
            F.replace(
                F.col("toks"),
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}{right} "),
            ),
        )
        if step % 8 == 0:
            cur = cur.localCheckpoint()
    return merge_rows, cur


def bpe_apply(
    documents: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sort: bool = True,
) -> DataFrame:
    """Tokenize the corpus with the merges :func:`bpe_train` learns on
    it — the APPLY half of the tokenizer loop, reporting what a
    token-budgeted training mix actually needs: per-document token
    counts under the trained vocabulary.

    100 TB shape: merges are learned and applied on the |vocab|-sized
    relation (the word, never the document, carries the token string),
    so the per-document cost is ONE explode + ONE equi-join on the
    word key + a partial-agg groupBy — the corpus is scanned twice
    (vocab build, tokenize join) and never holds per-word token
    strings in a document row. The (word → n_tokens) relation is
    domain-bound, not corpus-bound.

    Output: (doc_id, n_words, n_tokens) — n_tokens counts the </w>
    markers (one per word) as the classic open-vocabulary formulation
    does.
    """
    _, vocab = _bpe_vocab_merges(documents, n_merges, text_col)
    wt = vocab.select(
        "w",
        F.size(F.split(F.trim(F.col("toks")), "  ")).cast("long").alias(
            "n_toks"
        ),
    )
    dw = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.col("w") != "")
    out = (
        dw.join(wt, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    return small_sort(out, "doc_id") if sort else out


# --------------------------------------------------------------------------
# Byte-level BPE with regex pre-tokenization (GPT-2 style)
# --------------------------------------------------------------------------

#: Regex pre-tokenizer, the GPT-2 shape reduced to a dialect-portable
#: core (no lookaround — RE2 has none, so the oracle can run the SAME
#: pattern): a word with its leading space, a number run, a punctuation
#: run, or a residual space run. Leftmost-first alternation in both
#: Java regex and RE2.
BYTE_PRETOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


def _bpe_bytes_vocab(documents: DataFrame, text_col: str) -> DataFrame:
    """(pretoken, freq, toks) vocab relation for byte-level BPE: the
    corpus is scanned ONCE into regex pretokens (spaces live INSIDE
    tokens — no ``</w>`` marker, the GPT-2 convention), and each
    pretoken's UTF-8 bytes become wrapped 2-hex-digit tokens ("20",
    "61", …). Hex pairs are the byte-fallback alphabet itself: every
    possible byte has a token, so NOTHING is out-of-vocabulary — the
    property char-level BPE lacks."""
    pre = documents.select(
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BYTE_PRETOKEN_PATTERN), F.lit(0)
            )
        ).alias("w")
    )
    words = pre.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    hx = F.hex(F.encode(F.col("w"), "UTF-8"))
    byte_toks = F.transform(
        F.sequence(F.lit(1), (F.length(hx) / F.lit(2)).cast("int")),
        lambda i: hx.substr(i * F.lit(2) - F.lit(1), F.lit(2)),
    )
    wrapped = F.aggregate(
        byte_toks,
        F.lit(""),
        lambda acc, c: F.concat(acc, F.lit(" "), c, F.lit(" ")),
    )
    return words.select("w", "freq", wrapped.alias("toks")).localCheckpoint()


def bpe_train_bytes(
    documents: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Byte-level BPE training (the GPT-2 formulation): regex
    pre-tokenization (:data:`BYTE_PRETOKEN_PATTERN`), UTF-8 bytes as
    the base alphabet (hex-pair tokens), then the same vocab-relation
    merge loop as :func:`bpe_train` — corpus scanned once, every
    iteration bounded by |pretoken vocab|, argmax by
    (freq DESC, pair ASC), left-to-right non-overlapping application.

    vs the char-level trainer: spaces are INSIDE tokens (a merge can
    learn " the" as one unit, which is where real subword vocabs get
    their compression), and the byte alphabet gives total coverage —
    any input byte sequence tokenizes, no ``<unk>``.

    Output: (step, left, right, merged, pair_freq) — token strings are
    hex byte sequences ("20", "74", merged "2074" = " t").
    """
    merge_rows, _ = _bpe_merge_loop(
        _bpe_bytes_vocab(documents, text_col), n_merges
    )
    return _merges_df(documents.sparkSession, merge_rows)


def bpe_apply_bytes(
    documents: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    sort: bool = True,
) -> DataFrame:
    """Tokenize the corpus with the byte-level merges
    :func:`bpe_train_bytes` learns on it: per-document pretoken and
    token counts under the trained vocabulary — the number a
    token-budgeted mix consumes under a production-shaped tokenizer.

    Same 100 TB shape as :func:`bpe_apply`: merges live on the
    |pretoken-vocab|-sized relation; the per-document pass is one
    regex extract + explode, one equi-join on the pretoken, one
    partial-agg groupBy. Because the alphabet is total (every byte is
    a token), ``n_tokens`` covers every input byte — no OOV loss.

    Output: (doc_id, n_pretokens, n_tokens).
    """
    _, vocab = _bpe_merge_loop(
        _bpe_bytes_vocab(documents, text_col), n_merges
    )
    wt = vocab.select(
        "w",
        F.size(F.split(F.trim(F.col("toks")), "  ")).cast("long").alias(
            "n_toks"
        ),
    )
    dw = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BYTE_PRETOKEN_PATTERN), F.lit(0)
            )
        ).alias("w"),
    )
    out = (
        dw.join(wt, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pretokens"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    return small_sort(out, "doc_id") if sort else out
