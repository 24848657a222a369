"""Corpus-curation operators: deterministic stratified sampling,
incremental (against-reference) dedup, PII detection/scrubbing, URL
extraction, a composite quality filter, benchmark decontamination,
and context-window sequence packing — the selection/cleaning/layout
stages of an LLM training-data pipeline.

Everything is built-in column expressions (codegen, scan-parallel);
the only shuffles are the ones the semantics require (the anti-join in
incremental dedup, the per-domain aggregate in url_domain_stats).
Sampling and filtering are pure maps — at 100 TB they run at scan
speed with full predicate/column pushdown underneath.

Determinism: sampling keys on md5 (bit-identical in Spark and any
ANSI SQL engine — see functions/hashing.py), never on `rand()`, so a
sample is reproducible across engines, retries, and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.functions.hashing import md5_long
from bb_bigdata_log_tools_spark.operators.util import small_sort

#: Hash-bucket denominator for sampling fractions (0.01 % resolution).
SAMPLE_DENOM = 10_000

# PII patterns — deliberately simple ASCII regexes that parse
# identically under Java regex (Spark) and RE2 (DuckDB): no lookaround,
# no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
}

URL_PATTERN = r"https?://[A-Za-z0-9.-]+[A-Za-z0-9](/[^ ]*)?"
URL_DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+[A-Za-z0-9])"


def sample_bucket(strata: Column, key: Column) -> Column:
    """Deterministic bucket in [0, SAMPLE_DENOM) from md5(strata:key).

    Including the stratum in the hash makes per-stratum samples
    independent (the same key can be in-sample for one stratum and
    out-of-sample for another).
    """
    return F.pmod(
        md5_long(F.concat_ws(":", strata, key.cast("string"))),
        F.lit(SAMPLE_DENOM),
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: keep a hash-chosen fraction of
    each stratum (``fractions[stratum]``, else ``default_fraction``).

    100 TB shape: one scan, zero shuffle, no state — rows are kept by a
    pure hash predicate, so the sample is stable under retries and
    needs no per-stratum counting pass. (Exact-count sampling would
    need a window/shuffle; fraction-based is the scan-speed form.)
    """
    for frac in fractions.values():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction out of range: {frac}")
    thresh = F.lit(int(default_fraction * SAMPLE_DENOM))
    for stratum, frac in sorted(fractions.items()):
        thresh = (
            F.when(F.col(strata_col) == stratum, F.lit(int(frac * SAMPLE_DENOM)))
            .otherwise(thresh)
        )
    return df.filter(sample_bucket(F.col(strata_col), F.col(key_col)) < thresh)


def dedup_incremental(
    batch: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``batch`` whose content hash does NOT appear in ``seen``
    — the "don't re-ingest what's already in the corpus" step of an
    incremental pipeline.

    Implemented as a LEFT ANTI join on the FULL 128-bit md5 content
    hash (the dedup_exact identity — a 60-bit key collides at ~1e10
    seen docs often enough to silently and permanently drop unique
    documents from ingestion): both sides shuffle on the hash
    (uniformly distributed — no skew by construction), map-side
    distinct on the seen side keeps the shuffle at one row per
    distinct hash. At 100 TB the seen-side hash set is usually orders
    of magnitude smaller than its text and often broadcast-able; AQE
    picks broadcast when it fits, and an approximate pre-filter
    (bloom) would only change the constant, not the shape.

    COMPATIBILITY NOTE (v2 hash key, round 7): the internal join key
    — and the ``content_h`` column any pipeline persists from this
    step's lineage — changed from the truncated 60-bit ``md5_long``
    BIGINT to the full 128-bit md5 as a 32-char hex STRING. A
    seen-hash table persisted under the old numeric key must be
    re-derived from its text (or re-hashed) before joining against
    this version; the two keys are not comparable. If shuffle width
    matters, ``unhex(md5(..))`` as a 16-byte BINARY compare is the
    drop-in narrower form — same semantics, half the key bytes.
    """
    h = F.md5(F.encode(F.col(text_col), "UTF-8"))
    seen_hashes = seen.select(h.alias("content_h")).distinct()
    return batch.withColumn("content_h", h).join(
        seen_hashes, "content_h", "left_anti"
    ).drop("content_h")


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Detect and mask PII: per-kind match counts (``pii_<kind>``), a
    total, and the text with every match replaced by ``<KIND>``.

    Pure regexp column expressions — scan-parallel, no shuffle. The
    patterns are the standard cheap pre-filters (emails, IPv4, NANP
    phone numbers); a production pass would chain model-based NER
    behind this filter, gated on ``pii_total > 0`` so the expensive
    path only sees flagged documents.

    Each kind is COUNTED on the progressively-scrubbed text (the same
    string its replacement then runs on), so every count equals the
    number of ``<KIND>`` masks actually emitted — counting everything
    on the original text reported a phantom unmasked phone inside an
    already-masked email (patterns can overlap).
    """
    out = df
    scrubbed = F.col(text_col)
    total = F.lit(0)
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(f"pii_{kind}", F.regexp_count(scrubbed, F.lit(pat)))
        total = total + F.col(f"pii_{kind}")
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.withColumn("pii_total", total).withColumn(out_col, scrubbed)


def url_extract(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document URL stats: ``n_urls`` and the (lowercased) domain
    of each URL (``domains`` array, document order)."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    return df.withColumn("n_urls", F.size(urls)).withColumn(
        "domains",
        F.transform(
            urls, lambda u: F.lower(F.regexp_extract(u, URL_DOMAIN_PATTERN, 1))
        ),
    )


def url_domain_stats(
    df: DataFrame, text_col: str = "text", blocklist: list[str] | None = None
) -> DataFrame:
    """Corpus-wide per-domain document/occurrence counts with a
    blocked flag — the input to per-domain quota and blocklist
    filtering.

    explode → groupBy(domain): the shuffle carries (domain, counts)
    only (map-side partial agg), never document text.
    """
    blocked = [d.lower() for d in (blocklist or [])]
    domains = url_extract(df, text_col).select(
        F.explode("domains").alias("domain")
    )
    out = domains.groupBy("domain").agg(F.count("*").alias("n_occurrences"))
    if blocked:
        flag = F.array_contains(F.array(*[F.lit(d) for d in blocked]), F.col("domain"))
    else:
        flag = F.lit(False)
    return out.withColumn("blocked", flag)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 50,
    max_chars: int = 100_000,
    min_tokens: int = 10,
    max_mean_token_len: float = 12.0,
    min_unique_ratio: float = 0.3,
) -> DataFrame:
    """Composite gopher-style quality gate: length, token count, mean
    token length, and unique-token ratio, with a first-failing-rule
    label (``fail_reason``, 'ok' when kept).

    One pass of pure column expressions over whitespace tokens; the
    caller filters on ``keep`` (kept as a column so audits can group by
    fail_reason without a second scan).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    # sum of token lengths == non-space char count (exact under repeated
    # or leading/trailing spaces too; translate stays in codegen)
    sum_tok_len = F.length(F.translate(F.col(text_col), " ", ""))
    mean_tok_len = F.when(n_tokens > 0, sum_tok_len / n_tokens).otherwise(F.lit(0.0))
    uniq_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct(toks)) / n_tokens
    ).otherwise(F.lit(0.0))
    reason = (
        F.when(n_chars < min_chars, F.lit("too_short"))
        .when(n_chars > max_chars, F.lit("too_long"))
        .when(n_tokens < min_tokens, F.lit("too_few_tokens"))
        .when(mean_tok_len > max_mean_token_len, F.lit("long_tokens"))
        .when(uniq_ratio < min_unique_ratio, F.lit("repetitive"))
        .otherwise(F.lit("ok"))
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens_q", n_tokens)
        .withColumn("mean_token_len", F.round(mean_tok_len, 4))
        .withColumn("unique_ratio", F.round(uniq_ratio, 4))
        .withColumn("fail_reason", reason)
        .withColumn("keep", reason == "ok")
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    sort: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with a held-out evaluation set — the standard
    pre-training hygiene pass that keeps eval answers out of the
    training corpus.

    Output per training doc: ``n_shingle_hits`` (distinct shared
    n-gram hashes), ``n_bench_docs`` (distinct benchmark documents
    hit), ``contaminated`` (any hit). md5-shingle hashing matches the
    dedup family, so the SQL oracle reproduces it exactly.

    100 TB shape: benchmarks are MB-scale while the corpus is TB-scale,
    so the benchmark shingle set is BROADCAST — the corpus side is one
    scan + map-side hash probe with NO corpus shuffle; only the
    (tiny) per-doc hit counts aggregate.
    """
    from bb_bigdata_log_tools_spark.operators.dedup import doc_shingle_hashes

    train_sh = doc_shingle_hashes(
        documents.select("doc_id", F.col(text_col).alias("text")), n
    )
    bench_sh = (
        doc_shingle_hashes(
            benchmark.select("doc_id", F.col(text_col).alias("text")), n
        )
        .select(F.col("doc_id").alias("bench_id"), "h")
        .distinct()
    )
    hits = (
        train_sh.join(F.broadcast(bench_sh), "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_shingle_hits"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )
    return (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shingle_hits"), F.lit(0)).alias("n_shingle_hits"),
            F.coalesce(F.col("n_bench_docs"), F.lit(0)).alias("n_bench_docs"),
            (F.coalesce(F.col("n_shingle_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
        .transform(lambda d: small_sort(d, "doc_id") if sort else d)
    )


def pack_sequences(
    documents: DataFrame,
    window_tokens: int = 512,
    text_col: str = "text",
    sort: bool = True,
) -> DataFrame:
    """Context-window packing layout: concatenate documents in doc_id
    order and chop the token stream into fixed ``window_tokens``
    windows — the "concat-then-chunk" packing used to build pretraining
    batches. Output per doc: token count, the window (``bin_id``) and
    offset where the document starts, and whether it straddles a window
    boundary.

    100 TB shape: a global prefix sum done the scalable way — NO
    single-partition window over the corpus. Documents map to ordered
    range buckets (``part_id``), a per-bucket cumulative sum (parallel
    window), then the per-bucket totals (one tiny row each) are
    prefix-summed and broadcast back as offsets.

    ``part_id`` is computed DETERMINISTICALLY from doc_id against the
    broadcast global (min, max) bounds — not from
    ``repartitionByRange + spark_partition_id()``, whose sampled range
    boundaries depend on RDD identity. ``parts`` feeds two plan
    branches (the per-bucket cumsum and the bucket-totals prefix); with
    sampled boundaries, any failure of Catalyst to reuse the exchange
    (AQE replan, future edits) could give the branches different
    partitionings and silently corrupt bin offsets. A closed-form
    bucket id makes both branches agree by construction, at the cost of
    one column-pruned min/max scan. Monotonic double rounding keeps the
    mapping order-preserving for arbitrary 64-bit ids; bucket balance
    matches id distribution (uniform for dense or hash-like ids), and
    imbalance only affects parallelism, never values.
    """
    if window_tokens < 1:
        # loud: integer division by a zero window yields NULL bin ids
        # in Spark (no error) — silently corrupt packing layout
        raise ValueError(f"window_tokens must be >= 1, got {window_tokens}")
    n_part = documents.sparkSession.sparkContext.defaultParallelism
    toks = F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    bounds = documents.agg(
        F.min("doc_id").alias("doc_lo"), F.max("doc_id").alias("doc_hi")
    )
    # cast BEFORE subtracting: long − long wraps when ids span more
    # than half the int64 range (e.g. signed 64-bit content hashes as
    # ids), breaking the docstring's order-preserving guarantee; the
    # double subtraction loses only low-bit precision, which shifts
    # bucket BOUNDARIES (parallelism), never the ordering values
    span = (
        F.col("doc_hi").cast("double") - F.col("doc_lo").cast("double") + 1.0
    )
    bucket = F.least(
        F.lit(n_part - 1),
        F.floor(
            (F.col("doc_id").cast("double") - F.col("doc_lo").cast("double"))
            / span
            * n_part
        ),
    ).cast("int")
    parts = (
        documents.select("doc_id", toks.cast("long").alias("n_tokens"))
        .join(F.broadcast(bounds))
        .withColumn("part_id", bucket)
        .drop("doc_lo", "doc_hi")
        .repartition(n_part, "part_id")
    )
    w_in = (
        Window.partitionBy("part_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    # n_part rows total — the single-partition window here is over the
    # partition-summary relation, not the data.
    w_pref = Window.orderBy("part_id").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        parts.groupBy("part_id")
        .agg(F.sum("n_tokens").alias("part_total"))
        .select(
            "part_id",
            F.coalesce(F.sum("part_total").over(w_pref), F.lit(0)).alias("prefix"),
        )
    )
    return (
        parts.withColumn("within_part", within)
        .join(F.broadcast(prefix), "part_id")
        .select(
            "doc_id",
            "n_tokens",
            F.floor((F.col("prefix") + F.col("within_part")) / window_tokens).alias(
                "bin_id"
            ),
            ((F.col("prefix") + F.col("within_part")) % window_tokens).alias(
                "bin_offset"
            ),
            (
                ((F.col("prefix") + F.col("within_part")) % window_tokens)
                + F.col("n_tokens")
                > window_tokens
            ).alias("crosses_boundary"),
        )
        .transform(lambda d: small_sort(d, "doc_id") if sort else d)
    )


def domain_mix_weights(
    documents: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled domain mixing weights: each source's sampling
    weight ∝ (its token share)^alpha, normalized — the standard
    multinomial-temperature recipe for balancing web-scale sources
    (alpha=1 reproduces natural proportions, alpha→0 uniform).

    Output per source: n_docs, n_tokens, token_share, weight.

    100 TB shape: one scan with map-side partial aggregation down to
    |sources| rows; the share/weight normalizations are over that tiny
    relation (two single-row aggregates broadcast back). No data-sized
    shuffle anywhere.
    """
    toks = F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    per_src = documents.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks.cast("long")).alias("n_tokens"),
    )
    totals = per_src.agg(F.sum("n_tokens").alias("tot_tokens"))
    shared = per_src.crossJoin(F.broadcast(totals)).withColumn(
        "token_share", F.col("n_tokens") / F.col("tot_tokens")
    )
    pow_sum = shared.agg(
        F.sum(F.pow(F.col("token_share"), F.lit(alpha))).alias("pow_sum")
    )
    return (
        shared.crossJoin(F.broadcast(pow_sum))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("token_share"), 6).alias("token_share"),
            F.round(
                F.pow(F.col("token_share"), F.lit(alpha)) / F.col("pow_sum"), 6
            ).alias("weight"),
        )
        .transform(lambda d: small_sort(d, "source"))
    )


def unigram_perplexity(
    documents: DataFrame,
    text_col: str = "text",
    sort: bool = True,
) -> DataFrame:
    """Per-document perplexity under a unigram LM trained on the corpus
    itself — the cheap LM-quality signal (CCNet-style) that flags
    gibberish (high perplexity) and boilerplate (low perplexity)
    without a neural model.

    p(w) = corpus_count(w) / corpus_tokens; per doc,
    cross_entropy = mean over tokens of -ln p(w); perplexity =
    exp(cross_entropy). No smoothing needed: scoring the training
    corpus means every token is in-vocabulary.

    100 TB shape: token explode → vocabulary aggregate (map-side
    partials; vocabulary is millions of rows vs trillions of tokens),
    then the per-doc pass re-joins tokens to the vocabulary —
    AQE broadcasts the vocab side when it fits, else it is a uniform
    hash join on the token string. Two scans total, both at full
    parallelism.
    """
    toks = documents.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("token"),
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("tot"))
    return (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("cnt") / F.col("tot"))), 4).alias(
                "cross_entropy"
            ),
        )
        .withColumn(
            "perplexity", F.round(F.exp(F.col("cross_entropy")), 4)
        )
        .transform(lambda d: small_sort(d, "doc_id") if sort else d)
    )


def sample_exact_stratified(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Exact-count deterministic stratified sample: exactly
    ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by ranking the md5 hash order — the fixed-size
    eval-set builder (fraction-based :func:`sample_stratified` can't
    guarantee counts).

    Deterministic: the hash order is a pure function of
    (stratum, key), so the same rows are chosen on any engine, retry,
    or partitioning.

    100 TB shape: one shuffle keyed on the stratum for the window
    rank — unavoidable for exact counts (they are a per-stratum global
    property). Parallelism is |strata|-bounded in the window stage;
    for few-strata corpora prefer the fraction-based sampler, which is
    zero-shuffle (this trade is the documented reason both exist).
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    order = sample_bucket(F.col(strata_col), F.col(key_col))
    w = Window.partitionBy(strata_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .drop("sample_rank")
    )


def perplexity_buckets(
    documents: DataFrame,
    cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style perplexity bucketing: label each document
    head / middle / tail by where its unigram perplexity falls against
    exact corpus quantile cutoffs (head = lowest perplexity). The usual
    curation policy trains on head+middle and drops or re-samples tail.

    The cutoffs are a 1-row broadcast from the per-doc perplexity
    relation (computed once, unsorted) — no global rank window over the
    corpus, same shape as events_rfm. Exact ``percentile`` keeps the
    oracle bit-comparable; percentile_approx is the PB-scale swap.
    The cutoffs are floor-quantized to the same 4-dp resolution as the
    perplexity values: engines interpolate the quantile with different
    (mathematically equal) float expressions, and an ulp of cutoff
    difference would flip boundary documents between buckets.
    """
    ppl = unigram_perplexity(documents, text_col, sort=False).localCheckpoint()

    def _cut(p: float, name: str):
        q = F.percentile("perplexity", F.lit(p))
        return (F.floor(q * 10000 + F.lit(0.5)) / 10000).alias(name)

    cutoffs = ppl.agg(_cut(cuts[0], "c1"), _cut(cuts[1], "c2"))
    return (
        ppl.join(F.broadcast(cutoffs))
        .select(
            "doc_id",
            "perplexity",
            F.when(F.col("perplexity") <= F.col("c1"), "head")
            .when(F.col("perplexity") <= F.col("c2"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .transform(lambda d: small_sort(d, "doc_id"))
    )


def oov_rate(
    documents: DataFrame,
    vocab_size: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a frequency-ranked
    top-N vocabulary built from the corpus itself — the tokenizer-fit
    signal (high OOV = the vocab/tokenizer does not cover the doc's
    register or language).

    The vocabulary ranks (count desc, token asc — deterministic ties)
    via one window over the |vocab|-row aggregate, which is orders of
    magnitude smaller than the corpus; at PB scale swap the exact rank
    for a min-count threshold chosen from an approx histogram. The
    corpus-sized pass is a broadcast LEFT join of tokens against the
    ≤N-row vocab.
    """
    toks = documents.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("token"),
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= vocab_size)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_rate"),
        )
        .transform(lambda d: small_sort(d, "doc_id"))
    )


def token_budget_plan(
    documents: DataFrame,
    budget_frac: float = 0.5,
    alpha: float = 0.7,
    text_col: str = "text",
) -> DataFrame:
    """Sampling-quota planning for a token budget: given a target of
    ``budget_frac`` × corpus tokens distributed by the temperature-
    scaled :func:`domain_mix_weights`, compute each source's token
    target, its document quota at observed mean document length, and
    the fill ratio (>1 means the mix wants more of this source than it
    has — the upsampling signal).

    Everything downstream of domain_mix_weights operates on the
    \\|sources\\|-row relation: two broadcast scalar joins, zero extra
    corpus passes. Integer floors keep targets/quotas cross-engine
    exact.
    """
    mix = domain_mix_weights(documents, text_col=text_col, alpha=alpha)
    total = mix.agg(F.sum("n_tokens").alias("corpus_tokens"))
    return (
        mix.join(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight",
            F.floor(F.col("weight") * F.col("corpus_tokens") * budget_frac)
            .cast("long")
            .alias("target_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight",
            "target_tokens",
            # ratio FIRST in double: target_tokens * n_docs as long·long
            # overflows int64 at real corpus scale (2.5e13 tokens ×
            # 2e9 docs ≫ 2^63) and wraps silently in non-ANSI mode; a
            # zero-token source (all-empty texts) floors to quota 0
            # instead of NULL
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.least(
                    F.col("n_docs"),
                    F.floor(
                        F.col("target_tokens")
                        / F.col("n_tokens")
                        * F.col("n_docs")
                    ).cast("long"),
                )
            )
            .alias("quota_docs"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("target_tokens") / F.col("n_tokens"), 4))
            .alias("fill_ratio"),
        )
        .transform(lambda d: small_sort(d, "source"))
    )


def ip_prefix_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-/8-prefix IPv4 occurrence stats with RFC1918/loopback
    classification — the "who are we talking to" rollup of a log
    corpus (reference: the grep/search tools leave extraction to the
    user; this is the built-in network-analytics sibling of
    :func:`pii_scrub`).

    explode(regexp_extract_all) → groupBy(octet1): the shuffle carries
    (prefix, counts) only — map-side partial agg, text never moves.
    """
    ips = df.select(
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(PII_PATTERNS["ipv4"]), 0
            )
        ).alias("ip")
    ).select(
        F.split(F.col("ip"), r"\.").getItem(0).cast("int").alias("octet1"),
        F.split(F.col("ip"), r"\.").getItem(1).cast("int").alias("octet2"),
        "ip",
    )
    private = (
        F.col("octet1").isin(10, 127)
        | ((F.col("octet1") == 172) & F.col("octet2").between(16, 31))
        | ((F.col("octet1") == 192) & (F.col("octet2") == 168))
    )
    return (
        ips.withColumn("is_private", private)
        .groupBy("octet1")
        .agg(
            F.count(F.lit(1)).alias("n_ips"),
            F.countDistinct("ip").alias("n_distinct"),
            F.count(F.when(F.col("is_private"), 1)).alias("n_private"),
        )
        .orderBy("octet1")
    )


def sample_reservoir(
    df: DataFrame,
    n: int = 100,
    key_col: str = "doc_id",
    salts: int = 32,
    seed_tag: str = "rs",
) -> DataFrame:
    """Exact-N deterministic corpus sample — the distributed stand-in
    for reservoir sampling: rank every row by a seeded content hash and
    keep the global N smallest. Deterministic (re-runs and retries pick
    the same rows), uniform (md5 rank is uniform), and EXACT-N (unlike
    ``df.sample``'s Bernoulli fraction).

    TWO-PHASE global top-N (the ``grouped_topk`` machinery with one
    logical group): a single global rank window would sort the corpus
    in ONE task; phase 1 ranks within ``key % salts`` partitions and
    keeps N survivors each, phase 2 ranks the ≤ N·salts survivors —
    provably containing the true global top-N.
    """
    rank = md5_long(F.concat(F.lit(seed_tag + ":"), F.col(key_col).cast("string")))
    # hash() so string keys salt too — pmod on a string casts to NULL,
    # collapsing every row into ONE window partition (the single-task
    # sort this function exists to prevent); the salt assignment never
    # changes the OUTPUT (global top-N ⊆ phase-1 survivors under any
    # assignment) — the sample_weighted_exact fix applied here too.
    salt = F.pmod(F.hash(F.col(key_col)), F.lit(salts))
    w1 = Window.partitionBy(salt).orderBy(rank.asc(), F.col(key_col).asc())
    survivors = (
        df.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= n)
        .drop("r1")
    )
    w2 = Window.partitionBy().orderBy(rank.asc(), F.col(key_col).asc())
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= n)
    )


def bigram_perplexity(
    documents: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    sort: bool = True,
) -> DataFrame:
    """Per-document perplexity under an add-k-smoothed BIGRAM LM trained
    on the corpus itself — one order up from
    :func:`unigram_perplexity`: it also penalizes improbable word
    ORDER, so shuffled/templated text that fools the unigram model
    (same words, scrambled) scores high here. The honest relational
    stand-in for the KenLM-style n-gram scorers CCNet/Gopher use.

    P(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁·) + k·V); per doc,
    cross_entropy = mean −ln P over its bigrams, perplexity = exp.
    Smoothing is REQUIRED at order 2 (a doc's bigram may be corpus-rare
    even when both words are common); k and V are identical on both
    engines so the score is bit-stable after 4dp rounding.

    100 TB shape: the bigram fan-out is built JVM-side per row
    (transform over the token array, no self-join), then one vocabulary
    aggregate and one context aggregate (both map-side partial), and
    the per-doc pass joins bigrams → counts (AQE broadcasts the count
    relations while they fit, hash join otherwise). Three scans of the
    token stream, all full-parallel.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    tcol = F.col("toks")
    bigram_arr = F.transform(
        F.sequence(F.lit(2), F.size(tcol)),
        lambda i: F.concat(
            F.element_at(tcol, i - 1), F.lit(" "), F.element_at(tcol, i)
        ),
    )
    bi = (
        documents.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigram_arr).alias("bigram"))
    )
    bigram_counts = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    ctx = (
        bi.select(F.split(F.col("bigram"), " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab_size = (
        documents.select(F.explode(toks).alias("t"))
        .agg(F.countDistinct("t").cast("double").alias("v"))
    )
    scored = (
        bi.join(bigram_counts, "bigram")
        .withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    -F.log(
                        (F.col("c12") + F.lit(k))
                        / (F.col("c1") + F.lit(k) * F.col("v"))
                    )
                ),
                4,
            ).alias("cross_entropy"),
        )
        .withColumn("perplexity", F.round(F.exp(F.col("cross_entropy")), 4))
    )
    return small_sort(scored, "doc_id") if sort else scored


def mlm_mask_preview(
    documents: DataFrame,
    mask_rate_denom: int = 7,
    text_col: str = "text",
    sort: bool = True,
) -> DataFrame:
    """Deterministic masked-LM corruption preview: every token whose
    seeded hash lands in the 1/``mask_rate_denom`` bucket is replaced
    with ``[MASK]`` (≈14 % at the default — the BERT-class rate), and
    the masked tokens become the target sequence — the
    inspect-before-training view of an MLM data transform, and the
    template for applying it at export time.

    The coin is md5('mask:' || doc_id || ':' || position) — per-token,
    deterministic, engine-exact and retry-stable (the ``sample_weighted``
    discipline; rand() would unmask differently on every run/engine).

    Output: (doc_id, n_tokens, n_masked, corrupted_text, targets).

    100 TB shape: pure per-row column algebra (array HOFs over the
    token array) — one scan, zero shuffle, zero Python.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    with_doc = documents.select("doc_id", toks.alias("toks"))
    idx = F.sequence(F.lit(1), F.size(F.col("toks")))
    coin = lambda i: F.pmod(  # noqa: E731
        md5_long(
            F.concat(
                F.lit("mask:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                i.cast("string"),
            )
        ),
        F.lit(mask_rate_denom),
    )
    masked_flags = F.transform(idx, lambda i: coin(i) == 0)
    corrupted = F.zip_with(
        F.col("toks"),
        F.col("flags"),
        lambda t, m: F.when(m, F.lit("[MASK]")).otherwise(t),
    )
    targets = F.zip_with(
        F.col("toks"),
        F.col("flags"),
        lambda t, m: F.when(m, t).otherwise(F.lit(None).cast("string")),
    )
    return (
        with_doc.withColumn("flags", masked_flags)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(F.filter(F.col("flags"), lambda m: m)).alias("n_masked"),
            F.array_join(corrupted, " ").alias("corrupted_text"),
            F.array_join(targets, " ").alias("targets"),  # nulls skipped
        )
        .transform(lambda d: small_sort(d, "doc_id") if sort else d)
    )


def bloom_decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    m_bits: int = 4096,
    k_hashes: int = 3,
    text_col: str = "text",
    sort: bool = True,
) -> DataFrame:
    """Benchmark decontamination through a BLOOM FILTER instead of the
    exact shingle set (Bloom 1970) — the memory-constant variant of
    :func:`decontaminate`: the benchmark compresses to ``m_bits`` bits
    regardless of its shingle count, at the price of a bounded
    false-positive rate (≈ (1−e^{−kn/m})^k). The output reports BOTH
    the bloom decision and the exact one, so it doubles as the
    filter's own FP-rate report.

    Bit positions by double hashing (Kirsch & Mitzenmacher 2006):
    g1 = h mod m, g2 = odd(h >> 12), pos_k = (g1 + k·g2) mod m — pure
    int64 algebra (shiftright, never float division), bit-identical in
    DuckDB. ``m_bits`` must be a power of two so ``h // m`` is a shift.

    Output per doc: (doc_id, n_bloom_hits, n_exact_hits, flagged_bloom,
    flagged_exact, false_positive). Bloom has no false negatives, so
    n_bloom_hits ≥ n_exact_hits always.

    100 TB shape: the bloom position set is ≤ m_bits rows — BROADCAST
    (vs. decontaminate's full benchmark shingle set, which for a large
    benchmark may not fit); the corpus side is one scan + k-way map-side
    probe, no TEXT shuffle — the per-doc hit groupBy does exchange the
    k-expanded (doc_id, h) hash relation, but it is narrow (hashes
    only, map-side partial agg), never the documents themselves.
    """
    from bb_bigdata_log_tools_spark.operators.dedup import doc_shingle_hashes

    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    shift = m_bits.bit_length() - 1

    def positions(src: DataFrame) -> DataFrame:
        g1 = F.pmod(F.col("h"), F.lit(m_bits))
        g2 = F.pmod(F.shiftright(F.col("h"), shift), F.lit(m_bits)) * 2 + 1
        k = F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("k")
        return src.select("*", k).select(
            "*", F.pmod(g1 + F.col("k") * g2, F.lit(m_bits)).alias("pos")
        )

    train_sh = doc_shingle_hashes(
        documents.select("doc_id", F.col(text_col).alias("text")), n
    ).distinct()
    bench_sh = (
        doc_shingle_hashes(
            benchmark.select("doc_id", F.col(text_col).alias("text")), n
        )
        .select("h")
        .distinct()
    )
    bloom = positions(bench_sh).select("pos").distinct()
    probed = (
        positions(train_sh)
        .join(F.broadcast(bloom).withColumn("present", F.lit(1)), "pos", "left")
        .groupBy("doc_id", "h")
        .agg((F.count("present") == k_hashes).alias("bloom_hit"))
    )
    exact_hits = train_sh.join(
        F.broadcast(bench_sh), "h"
    ).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_exact_hits"))
    bloom_hits = probed.filter("bloom_hit").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bloom_hits")
    )
    out = (
        documents.select("doc_id")
        .join(bloom_hits, "doc_id", "left")
        .join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0)) > 0).alias("flagged_bloom"),
            (F.coalesce("n_exact_hits", F.lit(0)) > 0).alias("flagged_exact"),
            (
                (F.coalesce("n_bloom_hits", F.lit(0)) > 0)
                & (F.coalesce("n_exact_hits", F.lit(0)) == 0)
            ).alias("false_positive"),
        )
    )
    return small_sort(out, "doc_id") if sort else out


def canonical_url(col: Column) -> Column:
    """RFC-3986-style canonical form of a URL column (ONE copy, shared
    by :func:`dedup_url` and :func:`crawl_frontier`): scheme+host
    lowercased (case-insensitive per the RFC; path case PRESERVED),
    fragment stripped (never sent to the server), pure-tracking
    ``?utm_*`` query strings stripped (``?utm_source=x&id=1`` keeps
    its query — ``id`` distinguishes resources), trailing slash
    stripped."""
    head = F.lower(F.regexp_extract(col, r"^(https?://[^/?#]+)", 1))
    tail = F.regexp_replace(col, r"^https?://[^/?#]+", "")
    tail = F.regexp_replace(tail, "#.*$", "")
    tail = F.regexp_replace(tail, r"\?utm_[^&#? ]*(&utm_[^&#? ]*)*$", "")
    tail = F.regexp_replace(tail, "/$", "")
    return F.concat(head, tail)


def cdx_urlkey(col: Column) -> Column:
    """SURT-style urlkey (Sort-friendly URI Reordering Transform) for
    a URL column — the CDX index key Common Crawl's cluster.idx sorts
    by: scheme dropped, host lowercased with a single leading ``www.``
    stripped and its labels REVERSED comma-joined (``com,example``),
    then ``)`` + lowercased path (trailing slash stripped, fragment
    dropped; a ROOT/empty path keys as ``)/`` — Common Crawl's
    cluster.idx spells the root capture ``com,example)/``, and a
    bare ``)`` would sort a site's root OUTSIDE its own prefix
    range) + ``?`` + alphabetically sorted query params. URLs of the
    same site cluster under one key prefix regardless of spelling —
    what makes a prefix lookup over a sorted index work.

    Pinned simplifications (documented, both twins identical): ports
    are not specially handled (a ``host:8080`` rides inside the last
    reversed label) and per-param ``%``-decoding is skipped — the
    transform is deterministic either way, which is what the index
    needs."""
    host = F.lower(F.regexp_extract(col, r"^https?://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    key_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.lower(
        F.regexp_replace(
            F.regexp_replace(col, r"^https?://[^/?#]+", ""), "#.*$", ""
        )
    )
    path0 = F.regexp_replace(
        F.regexp_replace(rest, r"\?.*$", ""), "/$", ""
    )
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    q = F.regexp_extract(rest, r"\?(.*)$", 1)
    qsorted = F.array_join(F.array_sort(F.split(q, "&")), "&")
    return F.concat(
        key_host,
        F.lit(")"),
        path,
        F.when(q != "", F.concat(F.lit("?"), qsorted)).otherwise(F.lit("")),
    )


def cdx_urlkey_sql(expr: str) -> str:
    """The :func:`cdx_urlkey` transform as a DuckDB expression over
    ``expr`` (a SQL fragment yielding the URL) — the oracle twin,
    built step-for-step like the Column version."""
    host = f"regexp_replace(lower(regexp_extract({expr}, '^https?://([^/?#]+)', 1)), '^www\\.', '')"
    key_host = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    rest = f"lower(regexp_replace(regexp_replace({expr}, '^https?://[^/?#]+', ''), '#.*$', ''))"
    path0 = f"regexp_replace(regexp_replace({rest}, '\\?.*$', ''), '/$', '')"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    q = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    qsorted = f"array_to_string(list_sort(string_split({q}, '&')), '&')"
    return (
        f"{key_host} || ')' || {path} || "
        f"CASE WHEN {q} <> '' THEN '?' || {qsorted} ELSE '' END"
    )


def dedup_url(
    df: DataFrame, text_col: str = "text", sort: bool = True
) -> DataFrame:
    """URL canonicalization + dedup — the crawl-frontier / document-key
    hygiene pass that collapses trivially-distinct spellings of the
    same resource before URL-keyed dedup or fetch scheduling.
    Canonical form: :func:`canonical_url`. Output per canonical URL:
    the distinct raw-variant count and total occurrence count.

    100 TB shape: extraction is per-row regex column algebra in the
    scan; the only shuffle carries (canonical_url, counts) with
    map-side partials — classic high-cardinality-key aggregate, no skew
    beyond genuinely popular URLs (which AQE splits).
    """
    urls = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
        ).alias("url")
    )
    out = (
        urls.select("url", canonical_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.countDistinct("url").alias("n_variants"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )
    return small_sort(out, "canonical_url") if sort else out


def frontier_urls(
    links: DataFrame,
    base_col: str = "base_url",
    href_col: str = "href",
) -> DataFrame:
    """The stateless absolutize + canonicalize projection shared by
    :func:`crawl_frontier` (batch aggregate) and the streaming
    incremental-frontier mode (which cannot aggregate the same way):
    (doc_id, url, canonical_url) per resolvable anchor. Pure per-row
    column algebra — runs identically on a batch or streaming
    relation. Absolutization policy: :func:`_absolutize_href`, the
    one copy shared with :func:`resolve_redirects`."""
    absolute = _absolutize_href(F.col(href_col), F.col(base_col))
    return (
        links.select(F.col("doc_id"), absolute.alias("url"))
        .filter(F.col("url").isNotNull())
        .select(
            "doc_id", "url", canonical_url(F.col("url")).alias("canonical_url")
        )
    )


def crawl_frontier(
    links: DataFrame,
    base_col: str = "base_url",
    href_col: str = "href",
    sort: bool = True,
) -> DataFrame:
    """Next-fetch list from an extracted link relation (the output of
    ``html_extract_links`` joined with each page's base URL): the
    crawl-scheduler input that closes the loop crawl → extract →
    frontier → crawl.

    Absolutization policy (documented, keep-going): absolute
    ``http(s)://`` hrefs pass through; site-relative hrefs (leading
    ``/``) join the linking page's scheme+host; protocol-relative
    (``//``) and path-relative/mailto/javascript hrefs are DROPPED —
    resolving them needs the full page URL path or scheme negotiation,
    and a frontier prefers precision over recall (a dropped link is
    re-discoverable, a malformed fetch wastes a slot). Canonical form:
    :func:`canonical_url` — the same algebra as :func:`dedup_url`, so
    frontier keys and document keys collapse identically.

    Output per canonical URL: n_variants (distinct raw spellings),
    n_occurrences (total anchors), n_pages (distinct linking pages).
    100 TB shape: per-row column algebra in the scan + ONE
    (canonical_url, counts) aggregate with map-side partials.
    """
    urls = frontier_urls(links, base_col=base_col, href_col=href_col)
    out = (
        urls.groupBy("canonical_url")
        .agg(
            F.countDistinct("url").alias("n_variants"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_pages"),
        )
    )
    return small_sort(out, "canonical_url") if sort else out


# --------------------------------------------------------------------------
# robots.txt politeness gate (RFC 9309) — the fetch-permission filter
# between the crawl frontier and the fetcher. No reference-repo
# counterpart (logs, not crawls); this is the LLM-pipeline axis, same
# tier as crawl_frontier/dedup_url above.
# --------------------------------------------------------------------------

#: Regex metacharacters a robots rule path may contain, escaped to
#: LITERALS before ``*`` becomes ``.*`` — ONE ordered list, applied as
#: an identical replace chain by the Spark operator and the SQL twin
#: (backslash first so later escapes aren't double-escaped; ``$`` here
#: is an INNER dollar — a trailing ``$`` is split off beforehand and
#: becomes the end anchor, per RFC 9309 §2.2.3).
ROBOTS_REGEX_ESCAPES = (
    "\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$",
)


def _robots_pattern(value: Column) -> Column:
    """Anchored regex for one robots rule path: literal except ``*``
    (any chars) and a TRAILING ``$`` (end anchor)."""
    ends = value.endswith("$")
    body = F.when(
        ends, F.substring(value, F.lit(1), F.length(value) - 1)
    ).otherwise(value)
    for ch in ROBOTS_REGEX_ESCAPES:
        body = F.replace(body, F.lit(ch), F.lit("\\" + ch))
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), body, F.when(ends, F.lit("$")).otherwise(F.lit(""))
    )


def robots_rules(
    robots: DataFrame,
    agent: str = "bbbot",
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Parse a (host, robots.txt) relation into the rule set that
    applies to ``agent`` — RFC 9309 group semantics:

    - lines split on LF (CR stripped), ``#`` comments removed,
      directives case-insensitive;
    - consecutive ``User-agent`` lines open ONE group; rules before
      any group are ignored;
    - a group applies if one of its agent tokens equals ``agent``
      (case-insensitive); when ANY group on the host names the agent
      exactly, only those groups apply, else the ``*`` groups
      (token-equality product matching — the RFC's substring product
      matching is a documented simplification here);
    - empty Allow/Disallow values carry no restriction and are
      dropped.

    Output: (host, is_allow, rule, rule_len, pattern) — ``pattern`` is
    the anchored match regex (:func:`_robots_pattern`), ``rule_len``
    the RFC's specificity (octet length of the raw rule path).
    Identical rules appearing in several applicable groups are NOT
    deduplicated — the rank in :func:`robots_filter` picks one row of
    an identical tuple either way, and skipping the dedup keeps the
    whole derivation on one partitioning.

    100 TB shape: one robots.txt per host — the relation is |hosts|
    rows of KB-bounded text, scanned ONCE: group assignment and group
    applicability are a window chain over the same host clustering
    (no self-joins, one exchange), then a per-row filter+project. The
    frontier-sized table never enters this function.
    """
    flags = _robots_flags(robots, agent, host_col, robots_col)
    applicable = F.when(
        F.col("host_has_exact") == 1, F.col("grp_exact") == 1
    ).otherwise(F.col("grp_wild") == 1)
    # Most real rules are plain path prefixes — matched with a codegen
    # startswith (no regex). Only rules containing '*' or a trailing
    # '$' get a compiled pattern (non-literal regex recompiles per
    # evaluation in both engines; keeping it off the common case
    # matters when the frontier is the 100 TB side).
    has_wild = F.col("value").contains("*") | F.col("value").endswith("$")
    return flags.filter(
        F.col("kind").isin("allow", "disallow")
        & (F.col("value") != "")
        & applicable
    ).select(
        "host",
        (F.col("kind") == "allow").alias("is_allow"),
        F.col("value").alias("rule"),
        F.length("value").alias("rule_len"),
        F.when(has_wild, _robots_pattern(F.col("value"))).alias("pattern"),
    )


def _robots_flags(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """The shared robots.txt group algebra: one row per group line
    (ua / allow / disallow / delay) with (host, ln, kind, value,
    group_id, grp_exact, grp_wild, host_has_exact) — the single-scan
    window chain :func:`robots_rules` and :func:`robots_crawl_delay`
    both filter. ``Crawl-delay`` lines are GROUP lines (they end a
    user-agent run like rules do) — mirrored in the SQL twin and the
    test reference. PINNED DIVERGENCE from Google's open-source
    robots.txt parser: that parser ignores unrecognized/delay lines
    without terminating the UA collection, so a delay line BETWEEN
    consecutive User-agent lines assigns the surrounding rules to one
    group there and to two groups here; ``Sitemap`` lines (parsed
    group-independently by :func:`robots_sitemaps`) do not split a
    run in either parser. The choice here keeps every directive the
    group algebra consumes on one uniform rule — fuzz-differenced
    against the pure-Python reference in tests/test_round9_ops.py."""
    lines = F.split(
        F.regexp_replace(F.col(robots_col), "\r", ""), "\n"
    )
    x = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(lines).alias("ln", "raw"),
    )
    # RFC whitespace is space OR TAB (%x20/%x09) — strip BOTH ends
    # explicitly ([\t ]); engine trim() functions strip spaces only,
    # which would mis-classify tab-indented lines.
    line = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), "#.*$", ""), "^[\t ]+", ""
        ),
        "[\t ]+$",
        "",
    )
    low = F.lower(line)
    kind = (
        F.when(low.rlike("^user-agent[\t ]*:"), "ua")
        .when(low.rlike("^allow[\t ]*:"), "allow")
        .when(low.rlike("^disallow[\t ]*:"), "disallow")
        .when(low.rlike("^crawl-delay[\t ]*:"), "delay")
        .otherwise("other")
    )
    value = F.regexp_replace(line, "(?i)^[a-z-]+[\t ]*:[\t ]*", "")
    parsed = x.select(
        "host", "ln", kind.alias("kind"), value.alias("value")
    ).filter(F.col("kind") != "other")

    w = Window.partitionBy("host").orderBy("ln")
    prev_kind = F.lag("kind").over(w)
    new_group = (
        (F.col("kind") == "ua")
        & (prev_kind.isNull() | (prev_kind != "ua"))
    ).cast("int")
    grouped = parsed.withColumn("group_id", F.sum(new_group).over(w))

    agent_lc = agent.lower()
    is_ua = F.col("kind") == "ua"
    wg = Window.partitionBy("host", "group_id")
    wh = Window.partitionBy("host")
    return grouped.withColumns(
        {
            "grp_exact": F.max(
                (is_ua & (F.lower(F.col("value")) == agent_lc)).cast("int")
            ).over(wg),
            "grp_wild": F.max(
                (is_ua & (F.col("value") == "*")).cast("int")
            ).over(wg),
        }
    ).withColumn("host_has_exact", F.max("grp_exact").over(wh))


def robots_crawl_delay(
    robots: DataFrame,
    agent: str = "bbbot",
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Per-host ``Crawl-delay`` (seconds) applying to ``agent`` — the
    scheduler's politeness interval next to :func:`robots_filter`'s
    allow/deny. Same group-applicability algebra as the rules (exact
    agent groups shadow ``*``); when several applicable groups carry a
    delay the MAXIMUM wins (the conservative politeness choice —
    documented, since the de-facto standard leaves multiplicity
    unspecified). Non-numeric values are ignored. Hosts with no
    applicable delay produce no row (scheduler default applies).

    Output: (host, crawl_delay double), one row per host.
    """
    flags = _robots_flags(robots, agent, host_col, robots_col)
    applicable = F.when(
        F.col("host_has_exact") == 1, F.col("grp_exact") == 1
    ).otherwise(F.col("grp_wild") == 1)
    delays = flags.filter(
        (F.col("kind") == "delay")
        & F.col("value").rlike(r"^[0-9]+(\.[0-9]+)?$")
        & applicable
    )
    return delays.groupBy("host").agg(
        F.max(F.col("value").cast("double")).alias("crawl_delay")
    )


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """``Sitemap:`` URLs from robots.txt — group-INDEPENDENT per the
    sitemaps.org protocol (they apply regardless of user-agent, so no
    agent parameter). URL case is preserved. Output: (host,
    sitemap_url), one row per sitemap line, distinct."""
    lines = F.split(
        F.regexp_replace(F.col(robots_col), "\r", ""), "\n"
    )
    x = robots.select(
        F.col(host_col).alias("host"),
        F.explode(lines).alias("raw"),
    )
    line = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), "#.*$", ""), "^[\t ]+", ""
        ),
        "[\t ]+$",
        "",
    )
    url = F.regexp_replace(line, "(?i)^sitemap[\t ]*:[\t ]*", "")
    return (
        x.select("host", line.alias("line"), url.alias("sitemap_url"))
        .filter(
            F.lower(F.col("line")).rlike("^sitemap[\t ]*:")
            & (F.col("sitemap_url") != "")
        )
        .select("host", "sitemap_url")
        .distinct()
    )


def robots_filter(
    frontier: DataFrame,
    robots: DataFrame,
    agent: str = "bbbot",
    url_col: str = "url",
    sort: bool = True,
) -> DataFrame:
    """The politeness gate: per frontier URL, is fetching allowed for
    ``agent`` under the host's robots.txt? RFC 9309 precedence — the
    MOST SPECIFIC matching rule (longest path, octets) wins; an
    equal-length Allow beats Disallow; no matching rule (or no
    robots.txt for the host) means allowed.

    Output: (url, host, allowed, matched_rule) — ``matched_rule`` is
    the winning rule path ('' when none matched). Cardinality
    contract: ONE ROW PER DISTINCT URL — the decision rank partitions
    by ``url``, so duplicate frontier rows collapse (a robots verdict
    is a property of the URL, not of the row; callers needing
    per-row passthrough join this output back on ``url``).

    100 TB shape: the frontier joins the per-host rule relation on
    ``host`` — rules are |hosts|-sized (broadcast when small, AQE
    otherwise) and fan-out per URL is bounded by the robots.txt size;
    the decision is one window rank over that bounded fan-out,
    partitioned by URL (no global ordering anywhere). Matching is a
    per-row regex on path+query — scan-parallel, no driver round-trip.
    """
    rules = robots_rules(robots, agent=agent)
    host = F.lower(F.regexp_extract(F.col(url_col), "^https?://([^/?#]+)", 1))
    path0 = F.regexp_replace(
        F.regexp_replace(F.col(url_col), "^https?://[^/?#]+", ""),
        "#.*$",
        "",
    )
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    u = frontier.select(
        F.col(url_col).alias("url"), host.alias("host"), path.alias("path")
    )
    j = u.join(rules, "host", "left")
    # prefix rules (pattern null) match with startswith — codegen, no
    # per-row regex compile; wildcard rules fall back to RLIKE
    matched = F.when(
        F.col("rule").isNull(), F.lit(False)
    ).when(
        F.col("pattern").isNull(), F.col("path").startswith(F.col("rule"))
    ).otherwise(F.expr("path rlike pattern"))
    # Decision = max(struct(m, rule_len, ia, rule)) per URL — the same
    # winner the previous row_number window picked (its orderBy was
    # desc on exactly these four columns, and struct comparison is
    # field-by-field), but as a groupBy it gets MAP-SIDE PARTIAL
    # aggregation: the per-URL rule fan-out collapses before the
    # exchange instead of shuffling every candidate row into a
    # per-URL sort (guide §2.3 "aggregate before you shuffle"). Null
    # fields (the left join's no-rules row) only occur in 1-row groups
    # — a host either has rules or it has none — so null ordering
    # cannot differ from the window's NULLS LAST desc.
    best = (
        j.select(
            "url",
            "host",
            matched.cast("int").alias("m"),
            "rule_len",
            F.coalesce(F.col("is_allow").cast("int"), F.lit(0)).alias("ia"),
            "rule",
        )
        .groupBy("url", "host")
        .agg(F.max(F.struct("m", "rule_len", "ia", "rule")).alias("b"))
        .select(
            "url",
            "host",
            ((F.col("b.m") == 0) | (F.col("b.ia") == 1)).alias("allowed"),
            F.when(F.col("b.m") == 1, F.col("b.rule"))
            .otherwise(F.lit(""))
            .alias("matched_rule"),
        )
    )
    return small_sort(best, "url") if sort else best


def frontier_schedule(
    frontier: DataFrame,
    robots: DataFrame,
    agent: str = "bbbot",
    default_delay: float = 1.0,
    url_col: str = "url",
    priority_col: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Per-host fetch waves — the scheduler output that closes the
    crawl loop: :func:`crawl_frontier` (what to fetch) ×
    :func:`robots_filter` (may we) × :func:`robots_crawl_delay` (how
    fast) × :func:`robots_sitemaps` (host-declared seeds).

    Semantics:

    - frontier URLs pass the RFC 9309 allow gate; disallowed URLs are
      DROPPED (the gate's verdict, not a scheduling choice);
    - sitemap URLs from robots.txt join as SEEDS (``is_seed=1``) —
      they are host-declared fetch targets, so they bypass the gate
      and rank before every frontier URL on their host (their host is
      the sitemap URL's own, which may differ from the declaring
      host); a URL that is both seed and frontier schedules once, as
      a seed;
    - ``wave`` = rank within host ordered by (is_seed DESC, priority
      DESC, url) — priority comes from ``priority_col`` (e.g.
      crawl_frontier's n_occurrences), 0 when absent; duplicate
      frontier rows collapse to one fetch (the robots_filter
      cardinality contract);
    - ``fetch_offset_s`` = (wave - 1) × the host's Crawl-delay
      (``default_delay`` when the host declares none) — the earliest
      polite fetch time relative to the host's first fetch.

    Output: (url, host, is_seed, priority, wave, crawl_delay,
    fetch_offset_s).

    Reference parity: the closest analog is the reference's
    hand-rolled hourly path scheduler (fs/PathInfo.java's time-walk
    over date-partitioned paths); this engine's version derives the
    schedule relationally from crawl + politeness inputs instead of a
    clock walk.

    100 TB shape: the gate is robots_filter's bounded fan-out join;
    everything after is ONE exchange on ``host`` (the wave rank) over
    the allowed frontier — per-host ordering only, no global sort.
    Hot hosts are real skew here, but a wave is meaningful only
    within a host, so the partition IS the unit of work; a host too
    hot for one task is a host you shard by wave range downstream.
    """
    gate = robots_filter(frontier, robots, agent=agent, url_col=url_col,
                         sort=False)
    allowed = gate.filter(F.col("allowed")).select("url", "host")
    if priority_col is not None:
        # cast BEFORE max (the SQL twin's max(CAST(...)) order): a
        # string priority column would otherwise max lexicographically
        # ('9' > '10') and diverge from the oracle
        prio = frontier.groupBy(F.col(url_col).alias("url")).agg(
            F.max(F.col(priority_col).cast("double")).alias("priority")
        )
        allowed = allowed.join(prio, "url", "left").withColumn(
            "priority", F.coalesce(F.col("priority"), F.lit(0.0))
        )
    else:
        allowed = allowed.withColumn("priority", F.lit(0.0))
    allowed = allowed.withColumn("is_seed", F.lit(0))
    seeds = (
        robots_sitemaps(robots)
        .select(F.col("sitemap_url").alias("url"))
        .filter(F.col("url").rlike("^https?://"))
        .select(
            "url",
            F.lower(
                F.regexp_extract("url", "^https?://([^/?#]+)", 1)
            ).alias("host"),
            F.lit(0.0).alias("priority"),
            F.lit(1).alias("is_seed"),
        )
    )
    merged = (
        allowed.unionByName(seeds)
        .groupBy("url", "host")
        .agg(
            F.max("is_seed").alias("is_seed"),
            F.max("priority").alias("priority"),
        )
    )
    delays = robots_crawl_delay(robots, agent=agent)
    wv = Window.partitionBy("host").orderBy(
        F.desc("is_seed"), F.desc("priority"), F.asc("url")
    )
    out = (
        merged.join(delays, "host", "left")
        .withColumn(
            "crawl_delay",
            F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay))),
        )
        .withColumn("wave", F.row_number().over(wv))
        .select(
            "url",
            "host",
            "is_seed",
            "priority",
            "wave",
            "crawl_delay",
            ((F.col("wave") - 1) * F.col("crawl_delay")).alias(
                "fetch_offset_s"
            ),
        )
    )
    return small_sort(out, "host", "wave") if sort else out


def _robots_sql_ctes(
    urls_sql: str, robots_sql: str, agent: str = "bbbot"
) -> str:
    """The shared WITH-clause body of the robots SQL family — line
    split, group algebra, escape-replace chain, per-URL decision rank
    (CTEs ``robots`` … ``best``). :func:`robots_filter_sql` closes it
    with the gate projection; :func:`frontier_schedule_sql` extends
    it with delay/sitemap/wave CTEs. One copy, so the twins cannot
    drift from each other."""
    esc_chain = "body"
    for ch in ROBOTS_REGEX_ESCAPES:
        q = ch.replace("'", "''")
        esc_chain = f"replace({esc_chain}, '{q}', '\\{q}')"
    agent_lc = agent.lower().replace("'", "''")
    return f"""
WITH robots AS ({robots_sql}),
urls AS ({urls_sql}),
lns AS (
  SELECT host, i AS ln,
         regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(lines[i], '\r', '', 'g'), '#.*$', ''),
           '^[\t ]+', ''), '[\t ]+$', '') AS line
  FROM (SELECT host, string_split(robots_txt, chr(10)) AS lines
        FROM robots) r,
       LATERAL (SELECT unnest(generate_series(1, len(lines))) AS i)
),
parsed0 AS (
  SELECT host, ln,
         CASE WHEN regexp_matches(lower(line), '^user-agent[\t ]*:') THEN 'ua'
              WHEN regexp_matches(lower(line), '^allow[\t ]*:') THEN 'allow'
              WHEN regexp_matches(lower(line), '^disallow[\t ]*:')
                THEN 'disallow'
              WHEN regexp_matches(lower(line), '^crawl-delay[\t ]*:')
                THEN 'delay'
              ELSE 'other' END AS kind,
         regexp_replace(line, '(?i)^[a-z-]+[\t ]*:[\t ]*', '') AS value
  FROM lns
),
parsed AS (SELECT * FROM parsed0 WHERE kind <> 'other'),
flagged AS (
  SELECT host, ln, kind, value,
         CASE WHEN kind = 'ua' AND coalesce(
                lag(kind) OVER (PARTITION BY host ORDER BY ln), ''
              ) <> 'ua' THEN 1 ELSE 0 END AS new_group
  FROM parsed
),
grouped AS (
  SELECT host, ln, kind, value,
         sum(new_group) OVER (PARTITION BY host ORDER BY ln) AS group_id
  FROM flagged
),
flags AS (
  SELECT host, ln, kind, value, group_id,
         max(CASE WHEN kind = 'ua' AND lower(value) = '{agent_lc}'
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY host, group_id) AS grp_exact,
         max(CASE WHEN kind = 'ua' AND value = '*' THEN 1 ELSE 0 END)
           OVER (PARTITION BY host, group_id) AS grp_wild
  FROM grouped
),
flags2 AS (
  SELECT *, max(grp_exact) OVER (PARTITION BY host) AS host_has_exact
  FROM flags
),
rule_bodies AS (
  SELECT host, (kind = 'allow') AS is_allow,
         value AS rule, length(value) AS rule_len,
         value LIKE '%$' AS ends_dollar,
         CASE WHEN value LIKE '%$'
              THEN substr(value, 1, length(value) - 1)
              ELSE value END AS body
  FROM flags2
  WHERE kind IN ('allow', 'disallow') AND value <> ''
    AND CASE WHEN host_has_exact = 1 THEN grp_exact = 1
             ELSE grp_wild = 1 END
),
rules AS (
  SELECT host, is_allow, rule, rule_len,
         CASE WHEN contains(rule, '*') OR ends_dollar
              THEN '^' || replace({esc_chain}, '*', '.*')
                   || CASE WHEN ends_dollar THEN '$' ELSE '' END
              END AS pattern
  FROM rule_bodies
),
u AS (
  SELECT url,
         lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS host,
         CASE WHEN regexp_replace(regexp_replace(url,
                '^https?://[^/?#]+', ''), '#.*$', '') = '' THEN '/'
              ELSE regexp_replace(regexp_replace(url,
                '^https?://[^/?#]+', ''), '#.*$', '') END AS path
  FROM urls
),
j AS (
  SELECT u.url, u.host, r.rule, r.rule_len,
         CASE WHEN r.rule IS NULL THEN 0
              WHEN r.pattern IS NULL
                THEN CASE WHEN starts_with(u.path, r.rule)
                          THEN 1 ELSE 0 END
              WHEN regexp_matches(u.path, r.pattern) THEN 1
              ELSE 0 END AS m,
         coalesce(CASE WHEN r.is_allow THEN 1 ELSE 0 END, 0) AS ia
  FROM u LEFT JOIN rules r ON u.host = r.host
),
best AS (
  SELECT url, host, rule, m, ia,
         row_number() OVER (PARTITION BY url
                            ORDER BY m DESC, rule_len DESC,
                                     ia DESC, rule DESC) AS rn
  FROM j
)"""


def robots_filter_sql(
    urls_sql: str, robots_sql: str, agent: str = "bbbot"
) -> str:
    """The SAME politeness gate as :func:`robots_filter` in DuckDB SQL
    (oracle / SQL surface), built from the same constants — identical
    line split, group algebra, escape-replace chain, window rank.
    ``urls_sql`` must yield a ``url`` column, ``robots_sql`` a
    ``(host, robots_txt)`` relation. (DuckDB string literals take
    backslashes literally — this text is for the DuckDB dialect; the
    Spark engine runs the same algebra via the DataFrame twin.)"""
    return (
        _robots_sql_ctes(urls_sql, robots_sql, agent)
        + """
SELECT url, host, (m = 0 OR ia = 1) AS allowed,
       CASE WHEN m = 1 THEN rule ELSE '' END AS matched_rule
FROM best WHERE rn = 1
ORDER BY url
"""
    )


def _schedule_sql_ctes(
    urls_sql: str,
    robots_sql: str,
    agent: str = "bbbot",
    default_delay: float = 1.0,
    with_priority: bool = False,
) -> str:
    """The shared gate→seeds→delays→wave CTE chain ending in ``sched``
    — one copy under :func:`frontier_schedule_sql` and
    :func:`fetch_timeline_sql`, so the scheduler and the budget
    simulator cannot drift."""
    prio = (
        "coalesce((SELECT max(CAST(priority AS DOUBLE)) FROM urls uu"
        " WHERE uu.url = g.url), 0.0)"
        if with_priority
        else "0.0"
    )
    return (
        _robots_sql_ctes(urls_sql, robots_sql, agent)
        + f""",
gated AS (
  SELECT g.url, g.host, 0 AS is_seed, {prio} AS priority
  FROM best g WHERE g.rn = 1 AND (g.m = 0 OR g.ia = 1)
),
sitemaps AS (
  SELECT DISTINCT
         regexp_replace(line, '(?i)^sitemap[\t ]*:[\t ]*', '') AS url
  FROM lns
  WHERE regexp_matches(lower(line), '^sitemap[\t ]*:')
    AND regexp_replace(line, '(?i)^sitemap[\t ]*:[\t ]*', '') <> ''
),
seeds AS (
  SELECT url,
         lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS host,
         1 AS is_seed, 0.0 AS priority
  FROM sitemaps WHERE regexp_matches(url, '^https?://')
),
merged AS (
  SELECT url, host, max(is_seed) AS is_seed, max(priority) AS priority
  FROM (SELECT * FROM gated UNION ALL SELECT * FROM seeds)
  GROUP BY url, host
),
delays AS (
  SELECT host, max(CAST(value AS DOUBLE)) AS crawl_delay
  FROM flags2
  WHERE kind = 'delay'
    AND regexp_matches(value, '^[0-9]+(\\.[0-9]+)?$')
    AND CASE WHEN host_has_exact = 1 THEN grp_exact = 1
             ELSE grp_wild = 1 END
  GROUP BY host
),
sched AS (
  SELECT m.url, m.host, m.is_seed, m.priority,
         CAST(row_number() OVER (
           PARTITION BY m.host
           ORDER BY m.is_seed DESC, m.priority DESC, m.url
         ) AS INTEGER) AS wave,
         coalesce(d.crawl_delay, {default_delay!r}) AS crawl_delay
  FROM merged m LEFT JOIN delays d ON m.host = d.host
)"""
    )


def frontier_schedule_sql(
    urls_sql: str,
    robots_sql: str,
    agent: str = "bbbot",
    default_delay: float = 1.0,
    with_priority: bool = False,
) -> str:
    """:func:`frontier_schedule` in DuckDB SQL, extending the shared
    robots CTE body with delay / sitemap / wave CTEs. ``urls_sql``
    must yield ``url`` (plus ``priority`` when ``with_priority``);
    ``robots_sql`` a ``(host, robots_txt)`` relation."""
    return (
        _schedule_sql_ctes(
            urls_sql, robots_sql, agent, default_delay, with_priority
        )
        + """
SELECT url, host, is_seed, priority, wave, crawl_delay,
       (wave - 1) * crawl_delay AS fetch_offset_s
FROM sched
ORDER BY host, wave
"""
    )


def _timeline_sql_ctes(
    urls_sql: str,
    robots_sql: str,
    now: str,
    ttl_s: int = 7 * 86400,
    agent: str = "bbbot",
    default_delay: float = 1.0,
    with_priority: bool = False,
) -> str:
    """The shared schedule chain extended with the staleness join and
    the robots re-fetch injection, ending in a ``timeline`` CTE — one
    copy under :func:`fetch_timeline_sql` and
    :func:`fetch_conditional_sql`, so the budget simulator and the
    conditional-revisit planner cannot drift."""
    return (
        _schedule_sql_ctes(
            urls_sql, robots_sql, agent, default_delay, with_priority
        )
        + f""",
aged AS (
  SELECT host,
         date_diff('second', CAST(fetched_at AS TIMESTAMP),
                   TIMESTAMP '{now}') AS robots_age_s
  FROM robots),
st AS (
  SELECT s.*, coalesce(a.robots_age_s > {int(ttl_s)}, TRUE) AS stale
  FROM sched s LEFT JOIN aged a ON s.host = a.host),
timeline AS (
  SELECT url, host, is_seed, 0 AS is_robots_fetch, priority, wave,
         crawl_delay,
         (CASE WHEN stale THEN wave ELSE wave - 1 END) * crawl_delay
           AS fetch_offset_s
  FROM st
  UNION ALL
  SELECT 'https://' || host || '/robots.txt' AS url, host,
         0 AS is_seed, 1 AS is_robots_fetch, 0.0 AS priority,
         0 AS wave, max(crawl_delay) AS crawl_delay,
         0.0 AS fetch_offset_s
  FROM st WHERE stale GROUP BY host
)"""
    )


def fetch_timeline_sql(
    urls_sql: str,
    robots_sql: str,
    now: str,
    ttl_s: int = 7 * 86400,
    agent: str = "bbbot",
    default_delay: float = 1.0,
    with_priority: bool = False,
) -> str:
    """:func:`fetch_timeline` in DuckDB SQL — the shared schedule CTE
    chain closed with the staleness join and the robots re-fetch
    injection (:func:`_timeline_sql_ctes`). ``robots_sql`` must yield
    (host, robots_txt, fetched_at)."""
    return (
        _timeline_sql_ctes(
            urls_sql, robots_sql, now, ttl_s, agent, default_delay,
            with_priority,
        )
        + """
SELECT url, host, is_seed, is_robots_fetch, priority, wave,
       crawl_delay, fetch_offset_s
FROM timeline
ORDER BY host, wave
"""
    )


def fetch_timeline(
    frontier: DataFrame,
    robots: DataFrame,
    now: str,
    ttl_s: int = 7 * 86400,
    agent: str = "bbbot",
    default_delay: float = 1.0,
    url_col: str = "url",
    priority_col: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """The politeness-BUDGET simulator — what the fetcher actually
    executes when the robots cache is allowed to expire:
    :func:`frontier_schedule`'s per-host waves composed with
    :func:`robots_staleness`, with the robots.txt RE-FETCH injected
    into the timeline. Per host:

    - FRESH robots cache: the schedule is frontier_schedule's —
      wave k fetches at (k-1) × crawl_delay;
    - STALE (or never-fetched) cache: a synthetic
      ``https://<host>/robots.txt`` fetch takes wave 0 / offset 0
      (the verdicts are provisional until the policy is re-read —
      RFC 9309 §2.4), and every URL wave shifts one delay later
      (wave k fetches at k × crawl_delay) — the politeness COST of
      the refresh is visible in the offsets, which is the budget
      question this op answers.

    Output: (url, host, is_seed, is_robots_fetch, priority, wave,
    crawl_delay, fetch_offset_s) — robots fetches carry
    ``is_robots_fetch = 1``, wave 0.

    100 TB shape: frontier_schedule's plan (bounded gate join + ONE
    host exchange) plus a |hosts|-sized staleness join and a
    per-host aggregate for the injected rows — nothing new touches
    the frontier at scale."""
    sched = frontier_schedule(
        frontier,
        robots,
        agent=agent,
        default_delay=default_delay,
        url_col=url_col,
        priority_col=priority_col,
        sort=False,
    )
    ages = robots_staleness(robots, now, ttl_s, sort=False).select(
        "host", "robots_stale"
    )
    # one evaluation of the schedule: `s` feeds BOTH the URL timeline
    # and the injected-robots aggregate, and lazily that re-ran
    # frontier_schedule's whole plan (gate join + wave window) twice.
    # The checkpoint holds the operator's own output-sized relation
    # (|frontier| narrow rows), nothing larger.
    s = (
        sched.join(ages, "host", "left")
        .withColumn(
            "stale", F.coalesce(F.col("robots_stale"), F.lit(True))
        )
        .localCheckpoint()
    )
    urls = s.select(
        "url",
        "host",
        "is_seed",
        F.lit(0).alias("is_robots_fetch"),
        "priority",
        "wave",
        "crawl_delay",
        (
            F.when(F.col("stale"), F.col("wave")).otherwise(
                F.col("wave") - 1
            )
            * F.col("crawl_delay")
        ).alias("fetch_offset_s"),
    )
    rob = (
        s.filter(F.col("stale"))
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
        .select(
            F.concat(
                F.lit("https://"), F.col("host"), F.lit("/robots.txt")
            ).alias("url"),
            "host",
            F.lit(0).alias("is_seed"),
            F.lit(1).alias("is_robots_fetch"),
            F.lit(0.0).alias("priority"),
            F.lit(0).alias("wave"),
            "crawl_delay",
            F.lit(0.0).alias("fetch_offset_s"),
        )
    )
    out = urls.unionByName(rob)
    return small_sort(out, "host", "wave") if sort else out


def robots_staleness(
    robots: DataFrame,
    now: str,
    ttl_s: int = 7 * 86400,
    host_col: str = "host",
    fetched_col: str = "fetched_at",
    sort: bool = True,
) -> DataFrame:
    """Robots-cache freshness model — the politeness tier's refresh
    policy: a cached robots.txt is only as good as its age (RFC 9309
    §2.4: crawlers may cache the file, SHOULD refresh it; Google
    documents 24 h in practice — ``ttl_s`` is the knob). Input is the
    age-stamped robots relation (host, robots_txt, fetched_at);
    output per host: ``robots_age_s`` (seconds since fetch at
    ``now``), ``robots_stale`` (age past TTL → re-fetch before
    trusting the cached rules), ``refetch_after_s`` (seconds of
    validity remaining — the scheduler's refresh countdown, 0 once
    stale).

    Age is a timestamp DIFFERENCE (both ends converted under the same
    session zone), so timezone offsets cancel and the oracle twin
    (:func:`robots_staleness_sql`) computes the identical integer.

    100 TB shape: pure per-row column algebra over the |hosts|-sized
    relation — no shuffle (the sort is presentation only)."""
    age = (
        F.unix_timestamp(F.lit(now).cast("timestamp"))
        - F.unix_timestamp(F.col(fetched_col).cast("timestamp"))
    ).cast("bigint")
    out = robots.select(
        F.col(host_col).alias("host"),
        F.col(fetched_col).alias("fetched_at"),
        age.alias("robots_age_s"),
        (age > F.lit(int(ttl_s))).alias("robots_stale"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.lit(int(ttl_s)).cast("bigint") - age,
        ).alias("refetch_after_s"),
    )
    return small_sort(out, "host") if sort else out


def robots_staleness_sql(
    robots_sql: str, now: str, ttl_s: int = 7 * 86400
) -> str:
    """:func:`robots_staleness` in DuckDB SQL — ``robots_sql`` must
    yield (host, …, fetched_at)."""
    return f"""
WITH robots AS ({robots_sql}),
aged AS (
  SELECT host, fetched_at,
         date_diff('second', CAST(fetched_at AS TIMESTAMP),
                   TIMESTAMP '{now}') AS robots_age_s
  FROM robots)
SELECT host, fetched_at, robots_age_s,
       robots_age_s > {int(ttl_s)} AS robots_stale,
       greatest(CAST(0 AS BIGINT), {int(ttl_s)} - robots_age_s)
         AS refetch_after_s
FROM aged
ORDER BY host
"""


def robots_filter_aged(
    frontier: DataFrame,
    robots: DataFrame,
    now: str,
    ttl_s: int = 7 * 86400,
    agent: str = "bbbot",
    url_col: str = "url",
    sort: bool = True,
) -> DataFrame:
    """Gate decisions that carry their cache provenance:
    :func:`robots_filter`'s verdicts joined with
    :func:`robots_staleness`, so a scheduler can tell "allowed under
    a FRESH policy" from "allowed under one that needs re-fetching"
    (a stale-cache verdict is provisional). Hosts with NO cached
    robots.txt read as stale with null age — "never fetched" means
    fetch robots.txt before trusting the implicit allow, the same
    posture RFC 9309 takes toward unreachable files.

    Output: (url, host, allowed, matched_rule, robots_age_s,
    robots_stale) — robots_filter's cardinality contract (one row per
    distinct URL) is preserved; the join adds columns, never rows
    (staleness is per-host, the gate output carries each URL's host
    exactly once).

    100 TB shape: robots_filter's bounded fan-out join + one
    |hosts|-sized left join on host (broadcast when small, AQE
    otherwise) — no new exchange over the frontier."""
    gate = robots_filter(
        frontier, robots, agent=agent, url_col=url_col, sort=False
    )
    ages = robots_staleness(robots, now, ttl_s, sort=False).select(
        "host", "robots_age_s", "robots_stale"
    )
    out = gate.join(ages, "host", "left").select(
        "url",
        "host",
        "allowed",
        "matched_rule",
        "robots_age_s",
        F.coalesce(F.col("robots_stale"), F.lit(True)).alias(
            "robots_stale"
        ),
    )
    return small_sort(out, "url") if sort else out


def robots_filter_aged_sql(
    urls_sql: str,
    robots_sql: str,
    now: str,
    ttl_s: int = 7 * 86400,
    agent: str = "bbbot",
) -> str:
    """:func:`robots_filter_aged` in DuckDB SQL — the shared robots
    CTE body closed with the gate projection plus the per-host age
    join. ``robots_sql`` must yield (host, robots_txt, fetched_at)."""
    return (
        _robots_sql_ctes(urls_sql, robots_sql, agent)
        + f""",
aged AS (
  SELECT host,
         date_diff('second', CAST(fetched_at AS TIMESTAMP),
                   TIMESTAMP '{now}') AS robots_age_s
  FROM robots)
SELECT b.url, b.host, (b.m = 0 OR b.ia = 1) AS allowed,
       CASE WHEN b.m = 1 THEN b.rule ELSE '' END AS matched_rule,
       a.robots_age_s,
       coalesce(a.robots_age_s > {int(ttl_s)}, TRUE) AS robots_stale
FROM best b LEFT JOIN aged a ON b.host = a.host
WHERE b.rn = 1
ORDER BY b.url
"""
    )


def crawl_refresh(
    captures: DataFrame,
    now_date: str,
    url_col: str = "url",
    date_col: str = "capture_date",
    digest_col: str = "digest",
    change_prior: float = 0.1,
    sort: bool = True,
) -> DataFrame:
    """Re-crawl prioritizer — which URLs to fetch NEXT, ranked by
    capture age × observed change rate. The input is the capture
    history the engine already emits: (url, capture date, payload
    digest) rows from the CDX index (:func:`write_cdx` lines carry
    all three) or the revisit/digest relation
    (``write_warc_deduped``'s linkage — an identical digest on a
    re-crawl IS a no-change observation).

    Per URL: ``n_captures``; ``last_capture``; ``age_days`` (against
    ``now_date``); ``change_rate`` = digest-changes / re-crawls
    (a capture whose digest differs from the previous capture of the
    same URL counts as one change; single-capture URLs rate 0 — no
    re-crawl evidence yet); ``refresh_priority`` = age_days ×
    (change_rate + ``change_prior``) — a page that changed on most
    re-crawls outranks a static page of the same age, while the
    additive prior keeps never-changing (and never-re-crawled) pages
    from starving: their priority still grows with age, just
    ``change_prior``× slower.

    100 TB shape: ONE exchange on url — the lag window and the
    groupBy share the url partitioning (Catalyst reuses it), per-URL
    history is bounded by the re-crawl count, and no global sort
    exists anywhere (the sort here is presentation only; a real
    scheduler takes the top-K per host downstream)."""
    hist = captures.select(
        F.col(url_col).alias("url"),
        F.col(date_col).alias("capture_date"),
        F.col(digest_col).alias("digest"),
    )
    w = Window.partitionBy("url").orderBy("capture_date", "digest")
    prev = F.lag("digest").over(w)
    changed = F.when(prev.isNull(), F.lit(0)).otherwise(
        (F.col("digest") != prev).cast("int")
    )
    agg = (
        hist.withColumn("changed", changed)
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.max("capture_date").alias("last_capture"),
            F.sum("changed").alias("n_changes"),
        )
    )
    age_days = F.datediff(
        F.lit(now_date).cast("date"), F.col("last_capture").cast("date")
    )
    rate = F.when(
        F.col("n_captures") > 1,
        F.col("n_changes") / (F.col("n_captures") - 1),
    ).otherwise(F.lit(0.0))
    out = agg.select(
        "url",
        F.col("n_captures").cast("bigint").alias("n_captures"),
        "last_capture",
        age_days.cast("int").alias("age_days"),
        rate.alias("change_rate"),
        (age_days.cast("double") * (rate + F.lit(float(change_prior))))
        .alias("refresh_priority"),
    )
    return small_sort(out, "url") if sort else out


def _refresh_sql_ctes(
    captures_sql: str, now_date: str, change_prior: float = 0.1
) -> str:
    """The crawl_refresh CTE chain (no leading WITH), ending in a
    ``refresh`` CTE carrying the full output projection — one copy
    under :func:`crawl_refresh_sql` and
    :func:`fetch_conditional_sql`. The division casts to DOUBLE
    explicitly (DuckDB divides integers integrally; Spark's ``/`` is
    always fractional)."""
    return f"""caps AS ({captures_sql}),
hist AS (
  SELECT url, capture_date, digest,
         CASE WHEN lag(digest) OVER (PARTITION BY url
                ORDER BY capture_date, digest) IS NULL THEN 0
              WHEN digest <> lag(digest) OVER (PARTITION BY url
                ORDER BY capture_date, digest) THEN 1
              ELSE 0 END AS changed
  FROM caps),
agg AS (
  SELECT url, count(*) AS n_captures,
         max(capture_date) AS last_capture,
         sum(changed) AS n_changes
  FROM hist GROUP BY url),
scored AS (
  SELECT url, CAST(n_captures AS BIGINT) AS n_captures, last_capture,
         CAST(date_diff('day', CAST(last_capture AS DATE),
                        DATE '{now_date}') AS INTEGER) AS age_days,
         CASE WHEN n_captures > 1
              THEN CAST(n_changes AS DOUBLE) / (n_captures - 1)
              ELSE 0.0 END AS change_rate
  FROM agg),
refresh AS (
  SELECT url, n_captures, last_capture, age_days, change_rate,
         age_days * (change_rate + {float(change_prior)!r})
           AS refresh_priority
  FROM scored
)"""


def crawl_refresh_sql(
    captures_sql: str, now_date: str, change_prior: float = 0.1
) -> str:
    """:func:`crawl_refresh` in DuckDB SQL — the shared CTE chain
    (:func:`_refresh_sql_ctes`) closed with the output projection.
    ``captures_sql`` must yield (url, capture_date, digest)."""
    return (
        "WITH "
        + _refresh_sql_ctes(captures_sql, now_date, change_prior)
        + """
SELECT url, n_captures, last_capture, age_days, change_rate,
       refresh_priority
FROM refresh
ORDER BY url
"""
    )


def _absolutize_href(href: Column, base_url: Column) -> Column:
    """Absolutized URL from an href-like column against its base —
    the ONE absolutization policy shared by the frontier
    (:func:`frontier_urls`) and the redirect resolver: absolute
    ``http(s)://`` values pass through; site-relative (leading ``/``
    but not ``//``) join the base's LOWERCASED scheme+host (the host
    is case-insensitive and the frontier keys on the lowercase
    spelling); everything else (protocol-relative, path-relative,
    mailto/javascript) is null — precision over recall, same
    reasoning as :func:`crawl_frontier`."""
    origin = F.lower(
        F.regexp_extract(base_url, r"^(https?://[^/?#]+)", 1)
    )
    return (
        F.when(href.rlike("^https?://"), href)
        .when(href.startswith("//"), F.lit(None).cast("string"))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.lit(None).cast("string"))
    )


def resolve_redirects(
    captures: DataFrame,
    url_col: str = "url",
    status_col: str = "http_status",
    location_col: str = "location",
    max_hops: int = 5,
    sort: bool = True,
) -> DataFrame:
    """Bounded redirect-chain resolution over a capture relation —
    the frontier's 3xx axis: each ``Location`` header a crawl stored
    (``read_warc_headers``) is an edge url → absolutized target, and
    every captured URL walks its chain to a final target so the
    frontier schedules the page that actually serves content, not a
    hop in the middle.

    Edge relation: rows with 3xx status and a non-empty location;
    targets absolutize against the capture URL under the frontier's
    policy (:func:`_absolutize_href` — non-resolvable targets drop
    the edge). A URL captured more than once keeps ONE edge: the
    lexicographically smallest target (deterministic; callers with a
    capture-date column should pre-filter to the latest capture).

    The walk: ≤ ``max_hops`` steps, each a left join of the current
    positions against the edge relation; a step onto a URL already in
    the walked path sets ``looped`` and freezes the position (the
    loop guard — a 301 cycle must not spin), as does hop exhaustion.
    Output per distinct input URL: (url, final_url, n_hops, looped).
    ``n_hops`` = 0 means a direct (non-redirecting) capture.

    100 TB shape: only URLs that ARE redirects enter the walk — the
    direct majority of the corpus exits through one semi/anti join
    pair instead of riding |max_hops| joins (plan-audited: without
    the split, every 200-capture shuffles once per hop). The walk
    itself is ``max_hops`` (a small constant) hash joins on the URL
    key over the |redirect|-sized active set (typically ≪ corpus;
    AQE broadcasts the edge side when small) and no iteration count
    depends on data. The path array is bounded by ``max_hops`` + 1
    entries."""
    src = F.col(url_col)
    # ONE evaluation of the capture source: `edges` and `urls` both
    # derive from it, and with two independent checkpoints (the r12
    # shape) a WARC-header source paid the full store decode TWICE —
    # once per checkpoint job (r13: one decode, plan-audited via job
    # counts). The checkpointed relation is thin ((url, status,
    # location) — header-sized strings), the same materialization
    # class as the `urls` relation it feeds.
    caps = captures.select(
        src.alias("url"), F.col(status_col), F.col(location_col)
    ).localCheckpoint()
    cap_url = F.col("url")
    edges = (
        caps.filter(
            (F.col(status_col) >= 300)
            & (F.col(status_col) < 400)
            & (F.coalesce(F.col(location_col), F.lit("")) != "")
        )
        .select(
            cap_url.alias("src"),
            _absolutize_href(F.col(location_col), cap_url).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
        # evaluated once: the edge relation is referenced by every hop
        # join plus the semi/anti split. |redirects|-sized, narrow.
        .localCheckpoint()
    )
    urls = (
        caps.select("url")
        .distinct()
        # feeds both the direct (anti) and walking (semi) branches:
        # checkpointed so the distinct's exchange runs once, not per
        # branch; one distinct-URL row per capture, narrow
        .localCheckpoint()
    )
    srcs = edges.select(F.col("src").alias("url"))
    # the direct majority: no outgoing edge, final immediately
    direct = urls.join(srcs, "url", "left_anti").select(
        "url",
        F.col("url").alias("cur"),
        F.lit(0).alias("n_hops"),
        F.array(F.col("url")).alias("path"),
        F.lit(False).alias("looped"),
    )
    state = urls.join(srcs, "url", "left_semi").select(
        "url",
        F.col("url").alias("cur"),
        F.lit(0).alias("n_hops"),
        F.array(F.col("url")).alias("path"),
        F.lit(False).alias("looped"),
    )
    for _ in range(int(max_hops)):
        j = state.join(edges, state["cur"] == edges["src"], "left")
        revisit = F.array_contains(F.col("path"), F.col("dst"))
        stepped = F.col("dst").isNotNull() & ~revisit
        loop_hit = F.col("dst").isNotNull() & revisit
        state = j.select(
            "url",
            F.when(stepped, F.col("dst"))
            .otherwise(F.col("cur"))
            .alias("cur"),
            (F.col("n_hops") + stepped.cast("int")).alias("n_hops"),
            F.when(stepped, F.array_append("path", F.col("dst")))
            .otherwise(F.col("path"))
            .alias("path"),
            (F.col("looped") | loop_hit).alias("looped"),
        )
    out = state.unionByName(direct).select(
        "url",
        F.col("cur").alias("final_url"),
        "n_hops",
        "looped",
    )
    return small_sort(out, "url") if sort else out


def resolve_redirects_sql(
    captures_sql: str, max_hops: int = 5
) -> str:
    """:func:`resolve_redirects` in DuckDB SQL — the same bounded
    walk as a recursive CTE with the identical path-array loop guard
    (the unrolled joins and the guarded recursion visit the same
    states because each src keeps exactly one edge). ``captures_sql``
    must yield (url, http_status, location)."""
    return f"""
WITH RECURSIVE caps AS ({captures_sql}),
e AS (
  SELECT url AS src,
         min(CASE WHEN regexp_matches(location, '^https?://')
                    THEN location
                  WHEN starts_with(location, '/')
                       AND NOT starts_with(location, '//')
                    THEN lower(regexp_extract(url,
                           '^(https?://[^/?#]+)', 1)) || location
                  END) AS dst
  FROM caps
  WHERE http_status >= 300 AND http_status < 400
    AND coalesce(location, '') <> ''
  GROUP BY url
  HAVING min(CASE WHEN regexp_matches(location, '^https?://')
                    THEN location
                  WHEN starts_with(location, '/')
                       AND NOT starts_with(location, '//')
                    THEN lower(regexp_extract(url,
                           '^(https?://[^/?#]+)', 1)) || location
                  END) IS NOT NULL
),
walk AS (
  SELECT url, url AS cur, 0 AS n_hops, [url] AS path, FALSE AS looped
  FROM (SELECT DISTINCT url FROM caps)
  UNION ALL
  SELECT w.url,
         CASE WHEN list_contains(w.path, e.dst)
              THEN w.cur ELSE e.dst END AS cur,
         w.n_hops + CASE WHEN list_contains(w.path, e.dst)
                         THEN 0 ELSE 1 END AS n_hops,
         CASE WHEN list_contains(w.path, e.dst)
              THEN w.path ELSE list_append(w.path, e.dst) END AS path,
         w.looped OR list_contains(w.path, e.dst) AS looped
  FROM walk w JOIN e ON w.cur = e.src
  WHERE w.n_hops < {int(max_hops)} AND NOT w.looped
),
final AS (
  SELECT url, cur AS final_url, n_hops, looped,
         row_number() OVER (PARTITION BY url
                            ORDER BY n_hops DESC,
                                     CAST(looped AS INTEGER) DESC)
           AS rn
  FROM walk
)
SELECT url, final_url, n_hops, looped
FROM final WHERE rn = 1
ORDER BY url
"""


#: The five predefined XML entities, decode order pinned: ``&amp;``
#: LAST (unescaping it first would conjure entities out of literal
#: text like ``&amp;lt;``). One list, walked identically by the Spark
#: operator and any SQL twin.
XML_ENTITY_DECODES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _xml_unescape(col: Column) -> Column:
    for ent, ch in XML_ENTITY_DECODES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _xml_field(block: Column, tag: str) -> Column:
    """Text content of the first ``<tag>…</tag>`` element inside an
    XML fragment column — whitespace-trimmed, entity-decoded, null
    when the element is absent or empty."""
    return F.nullif(
        _xml_unescape(
            F.regexp_extract(
                block, rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1
            )
        ),
        F.lit(""),
    )


def sitemap_parse(
    payloads: DataFrame,
    roots: list[str] | None = None,
    url_col: str = "sitemap_url",
    xml_col: str = "xml",
    max_depth: int = 3,
    sort: bool = True,
) -> DataFrame:
    """sitemaps.org XML → the crawl seed relation: ``<urlset>``
    documents yield one row per ``<url>`` entry ((sitemap_url, host,
    url, lastmod, changefreq, priority, depth)); ``<sitemapindex>``
    documents recurse — each ``<sitemap><loc>`` child resolves
    against the SAME payload relation (the fetched-sitemap store) and
    its entries surface at ``depth`` + 1, bounded by ``max_depth``
    with a visited-set loop guard (an index citing itself — or two
    indexes citing each other — terminates instead of spinning).

    ``payloads`` is the fetched-sitemap relation (url → XML text;
    gzip ``.xml.gz`` bodies decompress at fetch/read time — e.g.
    ``gzip_text_read`` — this operator is transport-agnostic);
    ``roots`` selects the entry points (None = every payload row is a
    root, depth 0). Parsing is the documented subset grammar shared
    with the SQL twin: plain ``<url>``/``<sitemap>`` blocks,
    ``<loc>``/``<lastmod>``/``<changefreq>``/``<priority>`` children,
    whitespace-trimmed, the five predefined XML entities decoded
    (:data:`XML_ENTITY_DECODES`); CDATA and attribute-carrying entry
    tags are out of scope (documented). Entries without a ``<loc>``
    drop; ``priority`` casts to double (null when absent/malformed);
    ``host`` comes from the entry URL.

    Downstream: ``lastmod`` feeds :func:`crawl_refresh` as a change
    prior (a sitemap-declared modification after the last capture is
    re-crawl evidence the digest history can't see yet) and the
    (url, priority) projection feeds :func:`frontier_schedule` as
    ranked seeds via its ``priority_col``.

    100 TB shape: the per-document block explode is scan-parallel
    column algebra (one regexp pass per payload, fan-out = entries
    per sitemap, spec-capped at 50k); the recursion is ``max_depth``
    (a small constant) hash joins on the sitemap URL key against the
    |sitemaps|-sized payload relation — never a join over the
    extracted URL rows."""
    base = payloads.select(
        F.col(url_col).alias("sitemap_url"), F.col(xml_col).alias("xml")
    )
    if int(max_depth) > 0:
        # the payload relation is re-joined at every recursion depth;
        # lazily each join re-evaluated the caller's payload pipeline
        # (for the staged-store shape, a full XML rebuild). One
        # materialization of the input-sized relation instead.
        base = base.localCheckpoint()
    level = (
        base.filter(F.col("sitemap_url").isin(list(roots)))
        if roots is not None
        else base
    )
    visited = level.select("sitemap_url")
    parts = []
    for depth in range(int(max_depth) + 1):
        blocks = F.explode(
            F.regexp_extract_all(
                F.col("xml"), F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1)
            )
        )
        entries = level.select(
            "sitemap_url", blocks.alias("block")
        ).select(
            "sitemap_url",
            _xml_field(F.col("block"), "loc").alias("url"),
            _xml_field(F.col("block"), "lastmod").alias("lastmod"),
            _xml_field(F.col("block"), "changefreq").alias(
                "changefreq"
            ),
            _xml_field(F.col("block"), "priority")
            .try_cast("double")
            .alias("priority"),
            F.lit(depth).alias("depth"),
        )
        parts.append(entries.filter(F.col("url").isNotNull()))
        if depth == int(max_depth):
            break
        kids = F.explode(
            F.regexp_extract_all(
                F.col("xml"),
                F.lit(r"(?s)<sitemap>(.*?)</sitemap>"),
                F.lit(1),
            )
        )
        children = (
            level.select(kids.alias("block"))
            .select(_xml_field(F.col("block"), "loc").alias("sitemap_url"))
            .filter(F.col("sitemap_url").isNotNull())
            .distinct()
        )
        nxt = children.join(base, "sitemap_url").join(
            visited, "sitemap_url", "left_anti"
        )
        # no distinct: the anti join is membership-only, and children
        # is already distinct per level — deduping the union would
        # add one aggregate exchange per depth for nothing.
        # checkpoint per level: each level feeds TWO regex consumers
        # (entries + children) and the next level's lineage — without
        # the cut, depth d re-ran every earlier level's big-XML regex
        # passes (the per-entry extraction is the dominant scan).
        # The emptiness probe rides the checkpoint job (Observation
        # fires on the eager checkpoint action) instead of a separate
        # isEmpty job per depth (r13 optimization round).
        obs = Observation()
        nxt = nxt.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint()
        if int(obs.get["n"]) == 0:
            # recursion exhausted: deeper levels are empty by
            # construction, so skipping them only removes no-op jobs
            break
        visited = visited.union(nxt.select("sitemap_url"))
        level = nxt
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    host = F.lower(F.regexp_extract(F.col("url"), "^https?://([^/?#]+)", 1))
    out = out.select(
        "sitemap_url",
        host.alias("host"),
        "url",
        "lastmod",
        "changefreq",
        "priority",
        "depth",
    )
    return small_sort(out, "url", "sitemap_url") if sort else out


def fetch_conditional(
    timeline: DataFrame,
    validators: DataFrame,
    refresh: DataFrame,
    priority_threshold: float = 1.0,
    sort: bool = True,
) -> DataFrame:
    """Conditional-revisit planning — the If-None-Match /
    If-Modified-Since budget saving made visible: each
    :func:`fetch_timeline` row joins the cache validators its last
    capture stored (``read_warc_headers``: ETag / Last-Modified) and
    its :func:`crawl_refresh` priority, and is marked
    ``validate_only`` when a validator exists AND the refresh
    priority sits below ``priority_threshold`` — a low-urgency page
    with a validator costs one conditional GET (usually a 304, no
    body) instead of a full fetch.

    ``validators``: (url, etag, last_modified) — multiple captures of
    a URL merge field-wise by ``max`` ('' loses to any value;
    deterministic; pre-filter to the latest capture when header
    history matters). ``refresh``: (url, refresh_priority). Rows
    never drop and never multiply (both joins are per-URL aggregates
    on the left-join key). Policy pins: robots fetches are NEVER
    validate_only (the policy file must be re-read in full), and a
    URL with no capture history (null refresh_priority) fetches in
    full — "never seen" is not "low priority".

    Output: the timeline columns + (etag, last_modified,
    has_validator, refresh_priority, validate_only).

    100 TB shape: two per-URL hash joins added to fetch_timeline's
    plan — validators and refresh are |URL|-keyed relations with
    map-side-combined aggregates; no new exchange over the frontier
    beyond the join keys, no window, no driver state."""
    v = (
        validators.select(
            "url",
            F.coalesce(F.col("etag"), F.lit("")).alias("etag"),
            F.coalesce(F.col("last_modified"), F.lit("")).alias(
                "last_modified"
            ),
        )
        .groupBy("url")
        .agg(
            F.max("etag").alias("etag"),
            F.max("last_modified").alias("last_modified"),
        )
    )
    r = refresh.select("url", "refresh_priority")
    j = timeline.join(v, "url", "left").join(r, "url", "left")
    etag = F.coalesce(F.col("etag"), F.lit(""))
    lastmod = F.coalesce(F.col("last_modified"), F.lit(""))
    has_v = (etag != "") | (lastmod != "")
    out = j.select(
        "url",
        "host",
        "is_seed",
        "is_robots_fetch",
        "priority",
        "wave",
        "crawl_delay",
        "fetch_offset_s",
        etag.alias("etag"),
        lastmod.alias("last_modified"),
        has_v.alias("has_validator"),
        "refresh_priority",
        (
            has_v
            & (F.col("is_robots_fetch") == 0)
            & F.col("refresh_priority").isNotNull()
            & (
                F.col("refresh_priority")
                < F.lit(float(priority_threshold))
            )
        ).alias("validate_only"),
    )
    return small_sort(out, "host", "wave", "url") if sort else out


def fetch_conditional_sql(
    urls_sql: str,
    robots_sql: str,
    validators_sql: str,
    captures_sql: str,
    now: str,
    now_date: str,
    ttl_s: int = 7 * 86400,
    agent: str = "bbbot",
    default_delay: float = 1.0,
    with_priority: bool = False,
    change_prior: float = 0.1,
    priority_threshold: float = 1.0,
) -> str:
    """:func:`fetch_conditional` in DuckDB SQL — the shared timeline
    CTE chain (:func:`_timeline_sql_ctes`) composed with the shared
    refresh chain (:func:`_refresh_sql_ctes`) and the validator
    merge, closed with the validate_only projection. No algebra is
    restated — both chains are the same text the standalone twins
    close over, so the composition cannot drift from its parts."""
    thr = float(priority_threshold)
    return (
        _timeline_sql_ctes(
            urls_sql, robots_sql, now, ttl_s, agent, default_delay,
            with_priority,
        )
        + ",\n"
        + _refresh_sql_ctes(captures_sql, now_date, change_prior)
        + f""",
validators AS (
  SELECT url, max(coalesce(etag, '')) AS etag,
         max(coalesce(last_modified, '')) AS last_modified
  FROM ({validators_sql}) GROUP BY url
)
SELECT t.url, t.host, t.is_seed, t.is_robots_fetch, t.priority,
       t.wave, t.crawl_delay, t.fetch_offset_s,
       coalesce(v.etag, '') AS etag,
       coalesce(v.last_modified, '') AS last_modified,
       (coalesce(v.etag, '') <> ''
        OR coalesce(v.last_modified, '') <> '') AS has_validator,
       r.refresh_priority,
       ((coalesce(v.etag, '') <> ''
         OR coalesce(v.last_modified, '') <> '')
        AND t.is_robots_fetch = 0
        AND r.refresh_priority IS NOT NULL
        AND r.refresh_priority < {thr!r}) AS validate_only
FROM timeline t
LEFT JOIN validators v ON t.url = v.url
LEFT JOIN refresh r ON t.url = r.url
ORDER BY t.host, t.wave, t.url
"""
    )


def fetch_horizon(timeline: DataFrame, sort: bool = True) -> DataFrame:
    """Per-host horizon summary of a :func:`fetch_timeline` — the
    crawl-budget question rolled up: how many fetches does each host
    owe (URL waves + injected robots re-fetches + seeds), at what
    politeness delay, and how long until the host's queue drains
    (``makespan_s`` = the last wave's offset — wall-clock lower bound
    under one-connection-per-host politeness).

    Output per host: (host, n_fetches, n_robots_fetches, n_seeds,
    crawl_delay, makespan_s).

    100 TB shape: ONE |hosts|-sized aggregate over the timeline with
    map-side partials — no window, no join, nothing beyond the
    timeline's own plan."""
    out = timeline.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fetches"),
        F.sum("is_robots_fetch").cast("bigint").alias(
            "n_robots_fetches"
        ),
        F.sum("is_seed").cast("bigint").alias("n_seeds"),
        F.max("crawl_delay").alias("crawl_delay"),
        F.max("fetch_offset_s").alias("makespan_s"),
    )
    return small_sort(out, "host") if sort else out


def fetch_horizon_sql(
    urls_sql: str,
    robots_sql: str,
    now: str,
    ttl_s: int = 7 * 86400,
    agent: str = "bbbot",
    default_delay: float = 1.0,
    with_priority: bool = False,
) -> str:
    """:func:`fetch_horizon` in DuckDB SQL — the shared timeline CTE
    chain (:func:`_timeline_sql_ctes`) closed with the per-host
    rollup."""
    return (
        _timeline_sql_ctes(
            urls_sql, robots_sql, now, ttl_s, agent, default_delay,
            with_priority,
        )
        + """
SELECT host, CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(sum(is_robots_fetch) AS BIGINT) AS n_robots_fetches,
       CAST(sum(is_seed) AS BIGINT) AS n_seeds,
       max(crawl_delay) AS crawl_delay,
       max(fetch_offset_s) AS makespan_s
FROM timeline
GROUP BY host
ORDER BY host
"""
    )


def sitemap_refresh(
    captures: DataFrame,
    entries: DataFrame,
    now_date: str,
    url_col: str = "url",
    date_col: str = "capture_date",
    digest_col: str = "digest",
    lastmod_col: str = "lastmod",
    change_prior: float = 0.1,
    sort: bool = True,
) -> DataFrame:
    """:func:`crawl_refresh` with the sitemap ``lastmod`` fused in as
    a change prior (the :func:`sitemap_parse` feed the r11 VERDICT
    called for): a sitemap-declared modification AFTER a URL's last
    capture is re-crawl evidence the digest history can't see yet —
    it joins the history as ONE synthetic observation (capture_date =
    the declared date, digest = ``sitemap:<date>`` — distinct from
    any payload digest, so it counts as a change) and the standard
    prioritizer runs over the fused relation. Declarations at or
    before the last capture say nothing new and fuse nothing; URLs
    with no capture history take no prior (a never-crawled URL
    belongs to the frontier, not the re-crawl queue); per URL the
    LATEST declared lastmod wins; lastmod truncates to its date part
    (W3C datetime allows full timestamps, capture dates here are
    days).

    100 TB shape: crawl_refresh's single url exchange plus one
    |urls|-keyed aggregate on each side of the synth join — the
    sitemap relation is seed-sized, broadcast when small."""
    hist = captures.select(
        F.col(url_col).alias("url"),
        F.col(date_col).alias("capture_date"),
        F.col(digest_col).alias("digest"),
    )
    last = hist.groupBy("url").agg(
        F.max("capture_date").alias("last_cap")
    )
    sm = (
        entries.filter(F.col(lastmod_col).isNotNull())
        .select(
            F.col(url_col).alias("url"),
            F.substring(F.col(lastmod_col), 1, 10).alias("lm"),
        )
        .groupBy("url")
        .agg(F.max("lm").alias("lm"))
    )
    synth = (
        sm.join(last, "url")
        .filter(F.col("lm") > F.col("last_cap"))
        .select(
            "url",
            F.col("lm").alias("capture_date"),
            F.concat(F.lit("sitemap:"), F.col("lm")).alias("digest"),
        )
    )
    return crawl_refresh(
        hist.unionByName(synth),
        now_date,
        change_prior=change_prior,
        sort=sort,
    )


def sitemap_refresh_sql(
    captures_sql: str,
    entries_sql: str,
    now_date: str,
    change_prior: float = 0.1,
) -> str:
    """:func:`sitemap_refresh` in DuckDB SQL — the synth-observation
    fusion CTEs feeding the SHARED refresh chain
    (:func:`_refresh_sql_ctes`), so the fused prioritizer cannot
    drift from the plain one. ``entries_sql`` must yield
    (url, lastmod)."""
    fused = f"""caps0 AS ({captures_sql}),
last AS (SELECT url, max(capture_date) AS last_cap
         FROM caps0 GROUP BY url),
sm AS (
  SELECT url, max(substr(lastmod, 1, 10)) AS lm
  FROM ({entries_sql}) WHERE lastmod IS NOT NULL GROUP BY url),
synth AS (
  SELECT s.url, s.lm AS capture_date, 'sitemap:' || s.lm AS digest
  FROM sm s JOIN last l ON s.url = l.url WHERE s.lm > l.last_cap),
fused AS (
  SELECT url, capture_date, digest FROM caps0
  UNION ALL
  SELECT url, capture_date, digest FROM synth)"""
    return (
        "WITH "
        + fused
        + ",\n"
        + _refresh_sql_ctes(
            "SELECT url, capture_date, digest FROM fused",
            now_date,
            change_prior,
        )
        + """
SELECT url, n_captures, last_capture, age_days, change_rate,
       refresh_priority
FROM refresh
ORDER BY url
"""
    )


def corpus_curate(
    documents: DataFrame,
    benchmark: DataFrame,
    qf: dict | None = None,
    decon_n: int = 3,
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    sort: bool = True,
) -> DataFrame:
    """The END-TO-END curation decision list — one row per document
    through the full standard pre-training pipeline, first applicable
    reason wins:

    1. ``quality`` — fails the gopher-style :func:`quality_filter`
       (detail = the failing rule);
    2. ``dup_exact`` / ``dup_near`` — dropped by
       :func:`~bb_bigdata_log_tools_spark.operators.dedup.dedup_resolve`
       (detail = the transitively-resolved keeper doc_id);
    3. ``contaminated`` — shares an n-gram with the held-out benchmark
       (:func:`decontaminate`, detail = hit count);
    4. ``kept`` — detail carries the deterministic train/val/test
       split from :func:`~bb_bigdata_log_tools_spark.operators.
       datasetops.split_assign`.

    The per-stage ops are this pipeline's diagnostics; this is the
    deliverable (the :func:`~bb_bigdata_log_tools_spark.operators.dedup.
    dedup_resolve` pattern, widened to the whole pipeline). Tiers are
    evaluated on the FULL corpus and combined by precedence — a
    deliberate, documented policy: decisions stay stable when
    thresholds of an earlier tier move, at the cost of a dup keeper
    possibly being itself quality-dropped (consumers keep only rows
    marked 'kept', so no dangling reference escapes).

    100 TB shape: quality and split are zero-shuffle scan algebra; the
    dedup tier rides the salted LSH + checkpointed components pipeline;
    decontamination broadcasts the benchmark shingles. The four
    decision relations join on doc_id — counts/labels only, never text.
    """
    from bb_bigdata_log_tools_spark.operators.datasetops import split_assign
    from bb_bigdata_log_tools_spark.operators.dedup import dedup_resolve

    qf = qf or {}
    q = quality_filter(documents, **qf).select("doc_id", "fail_reason")
    r = dedup_resolve(documents, sort=False).withColumnRenamed(
        "decision", "dup_decision"
    )
    c = decontaminate(documents, benchmark, n=decon_n, sort=False).select(
        "doc_id", "n_shingle_hits", "contaminated"
    )
    s = split_assign(
        documents, val_frac=val_frac, test_frac=test_frac
    ).select("doc_id", "split")
    decision = (
        F.when(F.col("fail_reason") != "ok", F.lit("quality"))
        .when(F.col("dup_decision") == "exact", F.lit("dup_exact"))
        .when(F.col("dup_decision") == "near", F.lit("dup_near"))
        .when(F.col("contaminated"), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    detail = (
        F.when(F.col("fail_reason") != "ok", F.col("fail_reason"))
        .when(
            F.col("dup_decision").isin("exact", "near"),
            F.col("keeper_doc_id").cast("string"),
        )
        .when(F.col("contaminated"), F.col("n_shingle_hits").cast("string"))
        .otherwise(F.col("split"))
    )
    out = (
        q.join(r, "doc_id")
        .join(c, "doc_id")
        .join(s, "doc_id")
        .select("doc_id", decision.alias("decision"), detail.alias("detail"))
    )
    return small_sort(out, "doc_id") if sort else out


def sample_weighted_exact(
    df: DataFrame,
    n: int = 100,
    weight_col: str = "wt",
    key_col: str = "doc_id",
    max_tickets: int = 256,
    salts: int = 32,
    seed_tag: str = "wx",
) -> DataFrame:
    """Exact-N PROPORTIONAL-TO-WEIGHT sample WITHOUT replacement in
    pure integer arithmetic — the deterministic, cross-engine-exact
    analog of Efraimidis-Spirtes u^(1/w) keys (whose float ``pow``
    is not bit-stable between engines, so it could never pass a
    hash-exact oracle).

    Ticket scheme: a row with weight w holds min(ceil(w),
    ``max_tickets``) tickets; ticket t hashes to md5(seed:key:t) and
    the row's DRAW KEY is its minimum ticket hash. Ordering rows by
    draw key is a weighted random permutation: the first pick owns the
    global minimum ticket, every ticket is equally likely to be that
    minimum, so P(first = row) = tickets_row / Σ tickets, and
    successive minima draw without replacement ∝ weight.
    ``max_tickets`` quantizes very heavy weights (documented cap —
    beyond it a row's marginal probability gain per weight unit drops
    to zero; raise it when the weight distribution is heavy-tailed),
    and ``ceil`` quantizes fractional weights UP to whole tickets
    (every eligible row holds ≥ 1 — without the clamp a weight in
    (0,1) would cast to 0 tickets and Spark's ``sequence(1, 0)``
    silently DESCENDS to the two-element [1, 0], handing the row MORE
    tickets than a weight-1 row). Rows with weight ≤ 0 are never
    sampled.

    100 TB shape: the draw key is a PER-ROW JVM expression
    (array_min over ≤ max_tickets md5s — no ticket explode, no
    shuffle); selection is the salted TWO-PHASE top-N
    (sample_reservoir's machinery): phase 1 ranks inside key%salts
    partitions keeping n survivors each, phase 2 ranks the ≤ n·salts
    survivors — never a global single-task sort.

    Output: input columns + (draw_key, sample_rank), the n winners.
    """
    from bb_bigdata_log_tools_spark.functions.hashing import md5_long

    key_s = F.col(key_col).cast("string")
    ntick = F.least(
        F.ceil(F.col(weight_col)).cast("long"), F.lit(max_tickets)
    )
    draw = F.array_min(
        F.transform(
            F.sequence(F.lit(1), ntick.cast("int")),
            lambda t: md5_long(
                F.concat(
                    F.lit(seed_tag + ":"), key_s, F.lit(":"), t.cast("string")
                )
            ),
        )
    )
    eligible = df.filter(F.col(weight_col) > 0).withColumn("draw_key", draw)
    # hash() so string keys salt too; the salt assignment never changes
    # the OUTPUT (the global top-n is a subset of phase-1 survivors
    # under any assignment), only the phase-1 partitioning.
    salt = F.pmod(F.hash(F.col(key_col)), F.lit(salts))
    w1 = Window.partitionBy(salt).orderBy(
        F.col("draw_key").asc(), F.col(key_col).asc()
    )
    survivors = (
        eligible.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= n)
        .drop("r1")
    )
    w2 = Window.partitionBy().orderBy(
        F.col("draw_key").asc(), F.col(key_col).asc()
    )
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= n)
    )


def sample_weighted_stratified(
    df: DataFrame,
    n_per_group: int = 20,
    group_col: str = "source",
    weight_col: str = "wt",
    key_col: str = "doc_id",
    max_tickets: int = 256,
    salts: int = 8,
    seed_tag: str = "ws",
) -> DataFrame:
    """Exact-N-per-GROUP proportional-to-weight sample WITHOUT
    replacement — :func:`sample_weighted_exact`'s ticketed min-hash
    draw ranked WITHIN each stratum. The training-mix shape: "give me
    N documents per source, long/high-quality ones proportionally more
    likely", reproducible bit-for-bit (pure integer md5 arithmetic —
    no float ``pow``, so it hash-matches across engines).

    Ticket scheme as in :func:`sample_weighted_exact` (min(ceil(w),
    ``max_tickets``) tickets per row, draw key = min ticket md5; rows
    with weight ≤ 0 never sampled); a group smaller than
    ``n_per_group`` eligible rows returns all of them.

    100 TB shape: the draw key is a per-row JVM expression (no ticket
    explode); ranking is the salted TWO-PHASE top-N per group — phase
    1 partitions by (group, key%salts) keeping n survivors each, so
    ONE giant stratum (the common skew: a dominant crawl source) never
    becomes a single-task sort; phase 2 ranks the ≤ n·salts survivors
    per group. Both windows shuffle only the survivors' columns.
    """
    from bb_bigdata_log_tools_spark.functions.hashing import md5_long

    key_s = F.col(key_col).cast("string")
    ntick = F.least(
        F.ceil(F.col(weight_col)).cast("long"), F.lit(max_tickets)
    )
    draw = F.array_min(
        F.transform(
            F.sequence(F.lit(1), ntick.cast("int")),
            lambda t: md5_long(
                F.concat(
                    F.lit(seed_tag + ":"), key_s, F.lit(":"), t.cast("string")
                )
            ),
        )
    )
    eligible = df.filter(F.col(weight_col) > 0).withColumn("draw_key", draw)
    # hash() so string keys salt too (sample_weighted_exact's fix); the
    # salt never changes the OUTPUT (each group's top-n is a subset of
    # its phase-1 survivors under any assignment).
    salt = F.pmod(F.hash(F.col(key_col)), F.lit(salts))
    w1 = Window.partitionBy(F.col(group_col), salt).orderBy(
        F.col("draw_key").asc(), F.col(key_col).asc()
    )
    survivors = (
        eligible.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= n_per_group)
        .drop("r1")
    )
    w2 = Window.partitionBy(F.col(group_col)).orderBy(
        F.col("draw_key").asc(), F.col(key_col).asc()
    )
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= n_per_group)
    )


def crawl_curate(
    pages: DataFrame,
    benchmark: DataFrame,
    decon_n: int = 3,
    min_kept_chars: int = 120,
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    persist_extraction: bool = False,
    sort: bool = True,
) -> DataFrame:
    """END-TO-END crawl curation — :func:`corpus_curate`'s decision
    list widened to START FROM RAW PAGES: one row per crawled page
    through extraction → thin-gate → exact dedup → decontamination →
    split, first applicable reason wins:

    1. ``thin`` — boilerplate-only or near-empty extraction
       (``n_kept = 0`` or ``kept_chars < min_kept_chars``; detail =
       kept_chars): the crawl's 404-shell/link-farm/redirect-stub
       tier, which never reaches text-level quality filters;
    2. ``dup_exact`` — another page extracted to byte-identical text
       (detail = keeper doc_id). Near-dup is deliberately left to the
       LSH tier already certified by corpus_curate/dedup_resolve —
       this capstone certifies the crawl COMPOSITION, not a second
       copy of that machinery;
    3. ``contaminated`` — extracted text shares a word ``decon_n``-gram
       with the EXTERNAL held-out ``benchmark`` (doc_id, text) set
       (detail = hit count). The benchmark must be external: crawl
       pages share site chrome, so benchmarking against extracted
       pages themselves would flag the whole corpus via template
       n-grams;
    4. ``kept`` — detail carries the deterministic split
       (md5('csplit:' || doc_id), corpus-portable because crawl pages
       have no source column).

    Input: (doc_id, html). Pair with ``read_warc`` +
    ``warc_extract_text``'s uri→doc_id recovery to run from crawl
    bytes.

    100 TB shape: extraction is zero-shuffle scan algebra; the exact
    tier shuffles only (md5(text), doc_id) pairs — the text column
    never moves; decontamination broadcasts the benchmark shingles;
    tier relations join on doc_id counts/labels only.

    The extraction feeds TWO consumers (the thin/exact tier and the
    shingle tier), so lazily it RUNS TWICE — the deliberate default:
    re-running a scan-parallel regex pass is usually cheaper at scale
    than materializing terabytes of extracted text in the block
    manager. Pass ``persist_extraction=True`` to localCheckpoint the
    extraction once instead (right when the crawl READ dominates the
    regex cost, or the corpus comfortably fits cluster storage).
    """
    from bb_bigdata_log_tools_spark.operators.dedup import (
        doc_shingle_hashes,
    )
    from bb_bigdata_log_tools_spark.operators.html import html_extract_text

    ext = html_extract_text(pages, sort=False)
    docs = ext.select("doc_id", "text", "n_kept", "kept_chars")
    if persist_extraction:
        docs = docs.localCheckpoint()

    th = docs.select(
        "doc_id", "n_kept", "kept_chars", F.md5("text").alias("th")
    )
    keepers = th.groupBy("th").agg(F.min("doc_id").alias("exact_keeper"))
    e = th.join(keepers, "th").select(
        "doc_id", "n_kept", "kept_chars", "exact_keeper"
    )

    train_sh = doc_shingle_hashes(docs.select("doc_id", "text"), decon_n)
    bench_sh = (
        doc_shingle_hashes(benchmark.select("doc_id", "text"), decon_n)
        .select("h")
        .distinct()
    )
    hits = (
        train_sh.join(F.broadcast(bench_sh), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n_shingle_hits"))
    )

    denom = 10_000
    cut_val = int(val_frac * denom)
    cut_test = cut_val + int(test_frac * denom)
    sh = F.pmod(
        md5_long(F.concat(F.lit("csplit:"), F.col("doc_id").cast("string"))),
        F.lit(denom),
    )
    split = (
        F.when(sh < cut_val, F.lit("val"))
        .when(sh < cut_test, F.lit("test"))
        .otherwise(F.lit("train"))
    )

    thin = (F.col("n_kept") == 0) | (F.col("kept_chars") < min_kept_chars)
    dup = F.col("doc_id") != F.col("exact_keeper")
    contam = F.coalesce(F.col("n_shingle_hits"), F.lit(0)) > 0
    decision = (
        F.when(thin, F.lit("thin"))
        .when(dup, F.lit("dup_exact"))
        .when(contam, F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    detail = (
        F.when(thin, F.col("kept_chars").cast("string"))
        .when(dup, F.col("exact_keeper").cast("string"))
        .when(contam, F.col("n_shingle_hits").cast("string"))
        .otherwise(split)
    )
    out = e.join(hits, "doc_id", "left").select(
        "doc_id", decision.alias("decision"), detail.alias("detail")
    )
    return small_sort(out, "doc_id") if sort else out
