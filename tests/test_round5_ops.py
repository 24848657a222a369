"""Cross-checks for the round-5 operators: suffix-array LCS vs a
brute-force DP oracle, reservoir-sample invariants, entropy bounds,
cohort-matrix conservation."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _lcs_len(s1: str, s2: str) -> int:
    """O(n·m) DP longest-common-substring — the brute-force oracle."""
    best = 0
    prev = [0] * (len(s2) + 1)
    for a in s1:
        cur = [0]
        for j, b in enumerate(s2, 1):
            v = prev[j - 1] + 1 if a == b else 0
            cur.append(v)
            if v > best:
                best = v
        prev = cur
    return best


def test_suffix_array_matches_bruteforce_lcs(spark):
    """dedup_substring's diagonal-islands construction must equal the DP
    longest-common-substring for every pair whose LCS clears gram_len —
    planted shared spans, shuffled fillers, repeated grams inside docs."""
    from bb_bigdata_log_tools_spark.operators.dedup import dedup_substring

    shared_a = "the quick brown fox jumps over the lazy dog tonight"
    shared_b = "pack my box with five dozen liquor jugs"
    docs = [
        (0, "xxxx " + shared_a + " yyyy"),
        (1, "zz " + shared_a + " qq " + shared_b),
        (2, shared_b + " standalone tail content here"),
        (3, "completely unrelated words nothing shared at all okay"),
        (4, "ababababababababababababababab repetitive self similar"),
        (5, "ababababababababababababababab repetitive self similar"),
        (6, "short"),
    ]
    g, min_len = 8, 12
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id1, r.doc_id2): r.lcs_len
        for r in dedup_substring(df, gram_len=g, min_len=min_len, max_df=10_000).collect()
    }
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            l = _lcs_len(docs[i][1], docs[j][1])
            if l >= min_len:
                want[(i, j)] = l
    assert got == want, (got, want)


def test_reservoir_sample_exact_n_deterministic_and_prefix_stable(spark):
    """Exact N rows, identical across re-runs, and the top-N/2 of the
    same corpus is a PREFIX of the top-N (rank stability — the property
    that makes incremental sample growth cheap)."""
    from bb_bigdata_log_tools_spark.operators.curation import sample_reservoir

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = sample_reservoir(df, 50).collect()
    s2 = sample_reservoir(df, 50).collect()
    assert len(s1) == 50 and sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    top25 = {r.doc_id for r in sample_reservoir(df, 25).collect()}
    top50_first = {r.doc_id for r in s1 if r.sample_rank <= 25}
    assert top25 == top50_first


def test_entropy_bounds_and_extremes(spark):
    """0 for a one-char doc; ln(k) exactly for a uniform k-char doc;
    always within [0, ln(n_distinct)]."""
    from bb_bigdata_log_tools_spark.operators.textqc import text_entropy

    docs = [
        (0, "aaaaaaaa"),
        (1, "abcd" * 10),   # uniform over 4 chars -> ln(4)
        (2, "aab"),
        (3, "the quick brown fox"),
    ]
    out = {r.doc_id: r for r in text_entropy(
        spark.createDataFrame(docs, "doc_id long, text string")
    ).collect()}
    assert out[0].char_entropy == 0.0
    assert abs(out[1].char_entropy - round(math.log(4), 4)) < 1e-9
    for i, text in docs:
        r = out[i]
        assert 0.0 <= r.char_entropy <= round(math.log(r.n_distinct_chars), 4) + 1e-9
        assert r.n_chars == len(text)


def test_cohort_matrix_conserves_users(spark, sf_dir):
    """Column 0 of the cohort matrix (offset 0) counts every user once,
    and no cell exceeds its cohort's size."""
    from bb_bigdata_log_tools_spark.operators.analytics import events_cohort_matrix
    from bb_bigdata_log_tools_spark.session import table

    ev = table(spark, sf_dir, "events")
    m = events_cohort_matrix(ev).collect()
    n_users = ev.select("user_id").distinct().count()
    week0 = {r.cohort_week: r.n_users for r in m if r.week_offset == 0}
    assert sum(week0.values()) == n_users  # every user appears in its cohort at offset 0
    for r in m:
        assert r.n_users <= week0[r.cohort_week]
        assert r.week_offset >= 0


def test_sketch_accuracy_and_hll_mergeability(spark):
    """HLL/KMV estimates must land within their theoretical error bands
    at 10k distinct values, and the HLL register relation must be
    MERGEABLE: sketching two halves separately and max-merging the
    registers equals sketching the union (the property that lets a
    100 TB run union daily sketches without rescanning)."""
    import pyspark.sql.functions as F

    from bb_bigdata_log_tools_spark.functions.hashing import md5_long
    from bb_bigdata_log_tools_spark.operators.sketches import (
        HASH_BITS,
        approx_distinct_hll,
        approx_distinct_kmv,
    )

    n = 10_000
    df = (
        spark.range(0, n * 3)
        .select(
            F.lit("g").alias("event_type"),
            (F.col("id") % n).alias("user_id"),  # every value 3×
        )
    )
    hll = approx_distinct_hll(df, "event_type", "user_id").collect()[0]
    kmv = approx_distinct_kmv(df, "event_type", "user_id").collect()[0]
    assert hll.n_exact == n and kmv.n_exact == n
    assert hll.rel_error < 3 * 1.04 / (256 ** 0.5), hll  # 3σ at p=8
    assert kmv.rel_error < 3 / (62 ** 0.5), kmv          # 3σ at k=64

    # mergeability: registers(first half) max-merged with
    # registers(second half) == registers(union)
    p, m = 8, 256
    wbits = HASH_BITS - p
    h = md5_long(F.col("user_id").cast("string"))
    reg = F.pmod(h, F.lit(m))
    w = F.floor(h / F.lit(m)).cast("long")
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )

    def registers(d):
        return (
            d.select(reg.alias("reg"), rho.alias("rho"))
            .groupBy("reg")
            .agg(F.max("rho").alias("mx"))
        )

    lo = df.filter(F.col("user_id") < n // 2)
    hi = df.filter(F.col("user_id") >= n // 2)
    merged = (
        registers(lo).unionAll(registers(hi))
        .groupBy("reg")
        .agg(F.max("mx").alias("mx"))
    )
    whole = registers(df)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_triangle_census_clique_vs_chain(spark):
    """A 4-clique of identical docs yields C(4,3)=4 triangles and
    coefficient 1.0; a pure similarity chain yields 0 triangles."""
    from bb_bigdata_log_tools_spark.operators.dedup import dedup_graph_triangles

    base = " ".join(f"w{j}" for j in range(12))
    clique = [(i, base) for i in range(4)]
    filler = [(100 + i, " ".join(f"u{i}x{j}" for j in range(12))) for i in range(6)]
    df = spark.createDataFrame(clique + filler, "doc_id long, text string")
    row = dedup_graph_triangles(df).collect()[0]
    assert row.n_edges == 6 and row.n_triangles == 4
    assert row.clustering_coefficient == 1.0


def test_winnowing_guarantee_and_containment(spark):
    """The winnowing guarantee: any shared substring of length ≥
    k + window − 1 yields at least one shared fingerprint; an embedded
    short doc scores containment 1.0 against its container (which plain
    Jaccard would miss)."""
    from bb_bigdata_log_tools_spark.operators.dedup import (
        dedup_winnowing,
        winnowing_fingerprints,
    )

    short = "the common shared span here"
    docs = [
        (0, "prefix junk A " + short + " suffix junk B"),
        (1, short),
        (2, "totally different content with nothing alike at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {r.doc_id: set() for r in df.collect()}
    for r in winnowing_fingerprints(df, k=8, window=4).collect():
        fps[r.doc_id].add(r.fp)
    assert fps[0] & fps[1]          # guarantee: shared span → shared fp
    assert not (fps[1] & fps[2])    # disjoint content → disjoint fps
    pairs = dedup_winnowing(df, k=8, window=4, threshold=0.5).collect()
    got = {(r.doc_id1, r.doc_id2): r.containment for r in pairs}
    assert got.get((0, 1)) == 1.0   # embedded doc fully contained
    assert (1, 2) not in got and (0, 2) not in got
