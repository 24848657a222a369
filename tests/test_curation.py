"""Curation operators: stratified sampling determinism, incremental
dedup, PII scrub, URL stats, quality filter, IVF ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators import curation, similarity
from bb_bigdata_log_tools_spark.session import ensure_parallelism, table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_sample_deterministic_and_stratified(spark):
    rows = [(i, "en" if i % 2 == 0 else "de", f"text {i}") for i in range(400)]
    df = _docs(spark, rows)
    s1 = curation.sample_stratified(df, "lang", {"en": 0.5, "de": 0.0})
    got = [tuple(r) for r in s1.orderBy("doc_id").collect()]
    # deterministic: identical on a second run
    assert got == [tuple(r) for r in s1.orderBy("doc_id").collect()]
    langs = {r[1] for r in got}
    assert langs == {"en"}  # de fraction 0 -> dropped entirely
    # fraction ~0.5 of the 200 en docs (hash-based, not exact)
    assert 60 <= len(got) <= 140


def test_sample_rejects_bad_fraction(spark):
    df = _docs(spark, [(1, "en", "x")])
    with pytest.raises(ValueError, match="fraction"):
        curation.sample_stratified(df, "lang", {"en": 1.5})


def test_dedup_incremental_antijoin(spark):
    seen = _docs(spark, [(1, "en", "alpha"), (2, "en", "beta")])
    batch = _docs(
        spark,
        [(10, "en", "alpha"), (11, "en", "gamma"), (12, "en", "beta"), (13, "en", "delta")],
    )
    out = curation.dedup_incremental(batch, seen).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [11, 13]
    assert "content_h" not in curation.dedup_incremental(batch, seen).columns


def test_pii_scrub_counts_and_masks(spark):
    df = _docs(
        spark,
        [
            (1, "en", "mail a.b@x-corp.io or 10.1.2.3 call 555-123-4567 end"),
            (2, "en", "clean text no pii"),
        ],
    )
    out = {r.doc_id: r for r in curation.pii_scrub(df).collect()}
    assert (out[1].pii_email, out[1].pii_ipv4, out[1].pii_phone) == (1, 1, 1)
    assert out[1].text_scrubbed == "mail <EMAIL> or <IPV4> call <PHONE> end"
    assert out[2].pii_total == 0 and out[2].text_scrubbed == out[2].text


def test_url_stats_blocklist(spark):
    df = _docs(
        spark,
        [
            (1, "en", "x https://A.example.com/path y http://b.net"),
            (2, "en", "z https://a.example.com no-url-here"),
        ],
    )
    out = {
        r.domain: r
        for r in curation.url_domain_stats(df, blocklist=["b.net"]).collect()
    }
    assert out["a.example.com"].n_occurrences == 2  # lowercased merge
    assert out["b.net"].blocked and not out["a.example.com"].blocked


def test_quality_filter_reasons(spark):
    df = _docs(
        spark,
        [
            (1, "en", "tiny"),
            (2, "en", " ".join(f"w{i}" for i in range(30))),  # ok
            (3, "en", " ".join(["dup"] * 40)),  # repetitive
            (4, "en", " ".join(["superlongtokenxxxxxxxxxxxxxxx"] * 25)),  # long tokens
        ],
    )
    out = {
        r.doc_id: r
        for r in curation.quality_filter(
            df, min_chars=20, min_tokens=10, max_mean_token_len=12.0,
            min_unique_ratio=0.3,
        ).collect()
    }
    assert out[1].fail_reason == "too_short"
    assert out[2].fail_reason == "ok" and out[2].keep
    assert out[3].fail_reason == "repetitive"
    assert out[4].fail_reason == "long_tokens"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with n_probe=n_cells degenerates to exact search: results
    must equal brute force. With n_probe=2 recall stays useful."""
    emb = ensure_parallelism(table(spark, sf_dir, "embeddings"))
    exact = {
        (r.q_id, r.n_id)
        for r in similarity.ann_topk_bruteforce(emb, n_queries=5, k=5).collect()
    }
    full_probe = {
        (r.q_id, r.n_id)
        for r in similarity.ann_topk_ivf(
            emb, n_queries=5, k=5, n_cells=4, n_probe=4
        ).collect()
    }
    assert full_probe == exact
    approx = {
        (r.q_id, r.n_id)
        for r in similarity.ann_topk_ivf(
            emb, n_queries=5, k=5, n_cells=4, n_probe=2
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_decontaminate_edges(spark):
    from bb_bigdata_log_tools_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "totally unrelated content here with other words"),
            (2, "quick brown fox is a common phrase fragment"),
            (3, "ab"),  # shorter than n words -> single whole-text shingle
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 0")
    out = {r.doc_id: r for r in decontaminate(docs, bench, n=3).collect()}
    assert out[0].contaminated and out[0].n_bench_docs == 1  # self-overlap
    assert not out[1].contaminated and out[1].n_shingle_hits == 0
    assert out[2].contaminated  # shares "quick brown fox"
    assert not out[3].contaminated
    # empty benchmark: nothing can be contaminated
    empty = decontaminate(docs, docs.filter("doc_id < 0"), n=3).collect()
    assert all(not r.contaminated for r in empty) and len(empty) == 4


def test_pack_sequences_layout(spark):
    from bb_bigdata_log_tools_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in [(0, 3), (1, 4), (2, 10), (3, 2)]],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pack_sequences(docs, window_tokens=8).collect()}
    # cumulative starts: 0, 3, 7, 17
    assert (rows[0].bin_id, rows[0].bin_offset, rows[0].crosses_boundary) == (0, 0, False)
    assert (rows[1].bin_id, rows[1].bin_offset, rows[1].crosses_boundary) == (0, 3, False)
    assert (rows[2].bin_id, rows[2].bin_offset, rows[2].crosses_boundary) == (0, 7, True)
    assert (rows[3].bin_id, rows[3].bin_offset, rows[3].crosses_boundary) == (2, 1, False)
    # total ordering invariant: bin_id*W + offset is the exclusive cumsum
    starts = sorted((r.bin_id * 8 + r.bin_offset, r.doc_id) for r in rows.values())
    assert [d for _, d in starts] == [0, 1, 2, 3]


def test_pack_sequences_invariants_random(spark):
    """start offsets reconstruct the exclusive cumulative sum exactly,
    for random doc lengths and a window that forces many crossings."""
    import random

    from bb_bigdata_log_tools_spark.operators.curation import pack_sequences

    rng = random.Random(11)
    lens = [rng.randint(0, 40) for _ in range(120)]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    W = 64
    got = {r.doc_id: r for r in pack_sequences(docs, window_tokens=W).collect()}
    cum = 0
    for i, n in enumerate(lens):
        r = got[i]
        assert r.n_tokens == n
        assert r.bin_id * W + r.bin_offset == cum, f"doc {i}"
        assert r.crosses_boundary == (r.bin_offset + n > W)
        cum += n


def test_sample_exact_stratified_counts_and_determinism(spark):
    from bb_bigdata_log_tools_spark.operators.curation import (
        sample_exact_stratified,
    )

    docs = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3] if i < 90 else "tiny") for i in range(95)],
        "doc_id long, lang string",
    )
    a = sample_exact_stratified(docs, "lang", 7).collect()
    by_lang = {}
    for r in a:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert all(len(v) == 7 for k, v in by_lang.items() if k != "tiny")
    assert len(by_lang["tiny"]) == 5  # stratum smaller than N -> all rows
    b = sample_exact_stratified(docs, "lang", 7).collect()
    assert {(r.lang, r.doc_id) for r in a} == {(r.lang, r.doc_id) for r in b}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample_exact_stratified(docs, "lang", 0)


def test_embedding_quantize_invariants(spark):
    import random

    from bb_bigdata_log_tools_spark.operators.similarity import embedding_quantize

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-3, 3) for _ in range(16)]) for i in range(30)]
    rows.append((30, [0.0] * 16))  # zero vector: scale 0, qvec all zero
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in embedding_quantize(df).collect()}
    for i, vec in rows:
        r = got[i]
        assert all(-127 <= q <= 127 for q in r.qvec)
        if i == 30:
            assert r.scale == 0.0 and set(r.qvec) == {0} and r.max_abs_err == 0.0
        else:
            # symmetric quantization: worst error <= scale/2 (+ rounding slack)
            scale = max(abs(x) for x in vec) / 127.0
            assert r.max_abs_err <= scale / 2 + 1e-4


def test_log_dedup_window_conservation(spark, sf_dir):
    """Burst suppression must conserve lines: sum(n_repeats) == total
    lines, every burst's first event is a real line, and bursts of the
    same message are separated by more than the gap."""
    from bb_bigdata_log_tools_spark.operators.logops import log_dedup_window
    from bb_bigdata_log_tools_spark.session import table
    from bb_bigdata_log_tools_spark.sources.logs import events_as_logs
    from pyspark.sql import functions as F

    logs = events_as_logs(table(spark, sf_dir, "events"))
    total = logs.count()
    bursts = log_dedup_window(logs, gap_ms=3_600_000)
    assert bursts.agg(F.sum("n_repeats")).collect()[0][0] == total
    # successive bursts of one message start > gap after the previous
    # burst's START (bursts are disjoint, so this is the weak-but-exact
    # invariant checkable without re-deriving burst extents)
    rows = bursts.orderBy("message", "burst_start").collect()
    prev = {}
    for r in rows:
        if r.message in prev:
            assert r.burst_start - prev[r.message] > 3_600_000
        prev[r.message] = r.burst_start


def test_perplexity_buckets_partition_and_order(spark, sf_dir):
    """Buckets partition the corpus ~in thirds and respect the
    perplexity order: max(head) <= min(middle) boundary-consistent with
    the cutoffs, every doc labeled exactly once."""
    from bb_bigdata_log_tools_spark.operators.curation import perplexity_buckets
    from bb_bigdata_log_tools_spark.session import table
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    b = perplexity_buckets(docs)
    n = docs.count()
    assert b.count() == n
    agg = {
        r["bucket"]: (r["n"], r["lo"], r["hi"])
        for r in b.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("perplexity").alias("lo"),
            F.max("perplexity").alias("hi"),
        )
        .collect()
    }
    assert set(agg) == {"head", "middle", "tail"}
    assert agg["head"][2] <= agg["middle"][1]
    assert agg["middle"][2] <= agg["tail"][1]
    # thirds within quantile-tie tolerance
    for k in agg:
        assert abs(agg[k][0] - n / 3) < n * 0.15, (k, agg[k][0], n)


def test_oov_rate_vocab_size_monotone(spark, sf_dir):
    """A larger vocabulary can only lower (or keep) each doc's OOV
    count, and vocab_size >= |corpus vocab| drives OOV to zero."""
    from bb_bigdata_log_tools_spark.operators.curation import oov_rate
    from bb_bigdata_log_tools_spark.session import table
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    small = oov_rate(docs, 32).selectExpr("doc_id", "n_oov AS oov_small")
    big = oov_rate(docs, 256).selectExpr("doc_id", "n_oov AS oov_big")
    joined = small.join(big, "doc_id")
    assert joined.filter(F.col("oov_big") > F.col("oov_small")).count() == 0
    allv = oov_rate(docs, 10_000_000)
    assert allv.agg(F.sum("n_oov")).collect()[0][0] == 0
