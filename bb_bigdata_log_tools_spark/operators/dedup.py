"""Deduplication operators over the ``documents`` table.

Five variants, all expressed as pure Catalyst column algebra (no Python
in the hot path) with md5-derived hashing so a SQL oracle reproduces
them bit-for-bit (see ``functions/hashing.py``):

- :func:`dedup_exact` — content-hash groupBy.
- :func:`dedup_ngram_jaccard` — word n-gram shingles, inverted-index
  self-join, exact Jaccard ≥ τ.
- :func:`dedup_minhash_lsh` — minhash signatures, banded LSH candidate
  buckets, exact-Jaccard verification of candidates.
- :func:`dedup_simhash` — 64-bit simhash, 16-bit-chunk pigeonhole
  blocking, Hamming ≤ k.
- embedding near-dup lives in ``operators/similarity.py``.

Scale notes (100 TB): the exact-Jaccard self-join is the quadratic
hazard; minhash-LSH and simhash-chunk blocking bound the join fan-out by
bucketing (band-hash / chunk equality) — the shuffles key on band/chunk
signatures, hot buckets are handled by AQE skew-join splitting, and
everything before the joins is a single scan with map-side column work.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators.util import small_sort
from bb_bigdata_log_tools_spark.functions.hashing import (
    MERSENNE_31,
    md5_long,
    permutation_params,
)


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingle strings of a text column."""
    if n < 1:
        # loud: n=0 silently yields empty-string shingles that make
        # EVERY document match every other (the salts=0 bug class)
        raise ValueError(f"shingle n must be >= 1, got {n}")
    c = F.col(c) if isinstance(c, str) else c
    words = F.split(c, " ")
    count = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def doc_shingle_hashes(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, h) — distinct md5-int64 hashes of word n-gram shingles."""
    return documents.select(
        "doc_id", F.explode(word_shingles(F.col("text"), n)).alias("shingle")
    ).select("doc_id", md5_long(F.col("shingle")).alias("h"))


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup: group by content md5; keep the smallest doc_id as the
    canonical copy. Single shuffle on the 128-bit digest; map-side
    partial agg makes it cheap even at 100 TB."""
    return (
        documents.groupBy(F.md5(F.col("text")).alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .transform(lambda d: small_sort(d, "keep_doc_id"))
    )


def jaccard_pairs(
    sh: DataFrame, threshold: float, max_df: int | None = None
) -> DataFrame:
    """Exact Jaccard from a (doc_id, h) shingle-hash relation.

    Inverted-index self-join on the shingle hash → count of common
    shingles per pair; set sizes joined back in; J = common/(|A|+|B|-common).

    ``max_df`` drops shingles whose document frequency exceeds the cap
    BEFORE the join (standard practice: a shingle present in half the
    corpus contributes DF² candidate pairs while carrying no near-dup
    signal). This bounds the quadratic fan-out of hot shingles; set
    sizes are computed on the capped relation so the Jaccard stays an
    exact set similarity over the kept shingles.
    """
    if max_df is not None:
        hot = (
            sh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("h")
        )
        sh = sh.join(hot, "h", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id1"), F.col("b.doc_id").alias("doc_id2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(sa, F.col("doc_id1") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_id2") == F.col("sb.doc_id"))
        .select(
            "doc_id1",
            "doc_id2",
            F.round(
                F.col("common")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .transform(lambda d: small_sort(d, "doc_id1", "doc_id2"))
    )


def dedup_ngram_jaccard(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    max_df: int | None = 10_000,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard ≥ τ.

    The inverted-index join's worst case is quadratic in the hottest
    shingle's document frequency; ``max_df`` caps that fan-out (see
    :func:`jaccard_pairs`). Correct baseline for small/mid corpora and
    the oracle for the LSH variant below, which is the 100 TB path.
    ``shingles`` lets a caller that already materialized the (doc_id, h)
    relation (e.g. the recall eval, which feeds two finders) skip the
    explode pass.
    """
    sh = shingles if shingles is not None else doc_shingle_hashes(documents, n)
    return jaccard_pairs(sh, threshold, max_df)


def _sig_agg_exprs(num_perm: int, seed: int) -> list[Column]:
    """The ``num_perm`` min-hash aggregates, each parsed JVM-side from
    ONE SQL string: the chained-Column formulation cost ~0.7 s of py4j
    round trips per call (~9 gateway hops x num_perm — r12 profiling),
    pure driver latency repeated by every key in the LSH family. The
    parsed expression tree (integer literals, pmod arithmetic, min) is
    identical, so signatures are bit-for-bit unchanged."""
    return [
        F.expr(
            f"min(pmod({a} * pmod(h, {MERSENNE_31}) + {b}, {MERSENNE_31}))"
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(permutation_params(num_perm, seed))
    ]


def _band_struct_exprs(num_perm: int, bands: int) -> list[Column]:
    """band structs as single-parse SQL strings (same py4j rationale as
    :func:`_sig_agg_exprs`); band_sig is md5 of the comma-joined band
    slice, reproducible in any SQL engine."""
    rows_per_band = num_perm // bands
    out = []
    for bidx in range(bands):
        piece = ", ".join(
            f"cast(m{bidx * rows_per_band + r} as string)"
            for r in range(rows_per_band)
        )
        out.append(
            F.expr(
                f"struct({bidx} as band_idx, "
                f"md5(concat_ws(',', {piece})) as band_sig)"
            )
        )
    return out


def minhash_signature_relational(
    sh: DataFrame, num_perm: int = 64, seed: int = 2024
) -> DataFrame:
    """(doc_id, m0..m{num_perm-1}) minhash signature from a (doc_id, h)
    shingle-hash relation.

    One groupBy with ``num_perm`` plain-arithmetic ``min`` aggregates:
    unlike an array-of-transforms formulation (Spark higher-order
    functions are interpreted, not codegen'd), every expression here
    runs inside whole-stage codegen with map-side partial aggregation —
    ~10× faster and the shape that scales.
    """
    return sh.groupBy("doc_id").agg(*_sig_agg_exprs(num_perm, seed))


def minhash_bands(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(doc_id, band_idx, band_sig) — banded minhash signature."""
    return minhash_bands_from_hashes(doc_shingle_hashes(documents, n), num_perm, bands)


def minhash_bands_from_hashes(
    sh: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Banded signature from a (doc_id, h) relation.

    band_sig is the md5 of the comma-joined band slice, so the band
    bucketing is reproducible in any SQL engine.
    """
    if bands <= 0 or num_perm % bands != 0:
        # bands > num_perm would make rows_per_band 0 → every band_sig
        # is md5('') and the LSH bucket join degenerates to the full
        # N²/2 cross product; a non-divisor silently drops trailing
        # permutations and changes the tuned S-curve. Fail loudly (the
        # dedup_simhash parameter-validation convention).
        raise ValueError(
            f"bands ({bands}) must divide num_perm ({num_perm})"
        )
    sig = minhash_signature_relational(sh, num_perm)
    band_cols = _band_struct_exprs(num_perm, bands)
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select(
        "doc_id",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_sig").alias("band_sig"),
    )


def dedup_minhash_lsh(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    salts: int = 8,
    shingles: DataFrame | None = None,
    sort: bool = True,
) -> DataFrame:
    """Minhash-LSH near-dup: banded buckets → candidate pairs → exact
    Jaccard verification ≥ τ.

    The only joins key on (band_idx, band_sig) buckets and on the
    candidate set — sub-quadratic; this is the scale path for
    ``dedup_ngram_jaccard``. With 16 bands × 4 rows the S-curve puts
    ~0.5 collision probability at J≈0.5, so τ=0.6 keeps false negatives
    negligible while the verification join removes false positives.

    HOT-BUCKET SKEW: a bucket of B near-identical docs emits C(B,2)
    candidate pairs from ONE join task. AQE's skew-join split does NOT
    help here — it keys on input partition BYTES, and a hot LSH bucket
    is output skew over tiny input (empirically verified: the skew=true
    marker never appears on this join; see tests/test_skew_probe.py).
    The structural fix is the same explicit salt used by
    ``dedup_embedding``: the left side salts by ``doc_id % salts``, the
    right side replicates across the salt domain, and the bucket join
    adds the salt key — every pair still produced exactly once, with
    each bucket's quadratic output spread over ``salts`` tasks. Costs
    ~10-15% extra shuffle of the thin band relation on uniform corpora;
    bounds the straggler task ``salts``-fold on pathological ones.
    ``salts=1`` recovers the unsalted plan.
    """
    # ONE exchange computes, per doc, the banded signature AND the
    # shingle-hash set (plus its size): the r12 optimization round
    # replaced the original 4-branch plan — which re-evaluated the
    # (doc_id, h) shingle pipeline once for the signature aggregation,
    # once per verification side and once for the set sizes, and
    # shuffled the corpus-sized shingle relation on three different
    # keys — with a single groupBy(doc_id) whose output is
    # localCheckpointed and re-read by every branch. At 100 TB the
    # checkpoint holds the same bytes those extra shuffles would have
    # written to the same local disks, while the corpus is scanned and
    # shingled ONCE instead of four times; the verification join then
    # ships shingle sets only to CANDIDATE pairs (the LSH-bounded
    # slice), never the whole relation (guide §2.3/§2.4). Jaccard is
    # |array_intersect| over the per-doc sets — identical to the old
    # hash-equality join count (shingle hashes are distinct per doc).
    sh = shingles if shingles is not None else doc_shingle_hashes(documents, n)
    if bands <= 0 or num_perm % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_perm ({num_perm})"
        )
    docrel = (
        sh.groupBy("doc_id")
        .agg(*_sig_agg_exprs(num_perm, 2024), F.collect_set("h").alias("hs"))
        .withColumn("sz", F.size("hs"))
        .localCheckpoint()
    )
    band_cols = _band_struct_exprs(num_perm, bands)
    bands_df = docrel.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select(
        "doc_id",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_sig").alias("band_sig"),
    )
    a = bands_df.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(salts))).alias("a")
    b = bands_df.withColumn(
        "salt", F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(salts - 1).cast("long"))
        )
    ).alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id1"), F.col("b.doc_id").alias("doc_id2"))
        .distinct()
    )
    pa = docrel.select(
        F.col("doc_id").alias("doc_id1"),
        F.col("hs").alias("h1"),
        F.col("sz").alias("sz1"),
    )
    pb = docrel.select(
        F.col("doc_id").alias("doc_id2"),
        F.col("hs").alias("h2"),
        F.col("sz").alias("sz2"),
    )
    common = F.size(F.array_intersect(F.col("h1"), F.col("h2")))
    out = (
        candidates.join(pa, "doc_id1")
        .join(pb, "doc_id2")
        .select(
            "doc_id1",
            "doc_id2",
            F.round(
                common / (F.col("sz1") + F.col("sz2") - common), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return small_sort(out, "doc_id1", "doc_id2") if sort else out


def simhash64(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit simhash over word-unigram md5 hashes
    weighted by term frequency.

    bit_i(simhash) = 1 iff Σ_tokens tf·(±1 by bit_i(md5_long(token))) > 0.

    Computed as ONE groupBy(doc_id) with 60 signed-sum aggregate
    expressions (not a 60× bit-explode): the shuffle carries
    |doc×token| rows once and each bit is a map-side partial sum —
    the shape that survives a 100 TB corpus.
    """
    tf = (
        documents.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("doc_id", md5_long(F.col("tok")).alias("h"), "tf")
    )
    # single-parse SQL strings: the chained-Column form built ~120
    # expression chains (~800 py4j gateway hops, ~0.7 s of pure driver
    # latency per call — r12 profiling); the parsed trees (shiftright/
    # bitwise-and aggregates, left-assoc long sum) are identical, so
    # simhash values are bit-for-bit unchanged.
    bit_sums = tf.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(case when (shiftright(h, {i}) & 1) = 1 "
                f"then tf else -tf end)"
            ).alias(f"s{i}")
            for i in range(60)
        ]
    )
    hash_expr = F.expr(
        " + ".join(
            f"(case when s{i} > 0 then {1 << i}L else 0L end)"
            for i in range(60)
        )
    )
    return bit_sums.select("doc_id", hash_expr.alias("simhash"))


def dedup_simhash(
    documents: DataFrame, max_hamming: int = 3, salts: int = 8
) -> DataFrame:
    """Simhash near-dup pairs with Hamming distance ≤ k.

    Blocking: split the 60-bit hash into ``max_hamming + 1`` chunks
    (k=3 → 4×15-bit); by pigeonhole any pair with Hamming ≤ k differs in
    at most k chunks, so it shares at least one exact chunk and the
    self-join keys on (chunk_idx, chunk_value) buckets instead of the
    full cross product. The chunk count is DERIVED from the parameter —
    a fixed chunking would silently drop pairs for larger k. The
    Hamming check on survivors uses ``bit_count(xor)`` (one codegen'd
    instruction).

    HOT-CHUNK SKEW: a template family collapsing to one chunk value
    puts C(B,2) candidate pairs in ONE join task, and AQE's byte-keyed
    skew split cannot see output skew over tiny input (same exposure
    ``dedup_minhash_lsh`` documents). Same structural fix: left side
    salts by ``doc_id % salts``, right side replicates across the salt
    domain, and the chunk join adds the salt key — every pair produced
    exactly once, each hot chunk's quadratic output spread over
    ``salts`` tasks. ``salts=1`` recovers the unsalted plan.
    """
    if not 0 <= max_hamming <= 11:
        # >11 would need chunks under 5 bits: buckets so coarse the
        # blocking join degenerates toward all-pairs. Refuse rather
        # than silently drop pairs or explode. (hamming_pairs enforces
        # the same 5-bit floor generically; this keeps the historical
        # message for the text-simhash entry point.)
        raise ValueError(f"max_hamming must be in [0, 11], got {max_hamming}")
    pairs = hamming_pairs(
        simhash64(documents), "simhash", 60, max_hamming, salts=salts
    )
    return pairs.select(
        F.col("id1").alias("doc_id1"),
        F.col("id2").alias("doc_id2"),
        "hamming",
    ).transform(lambda d: small_sort(d, "doc_id1", "doc_id2"))


def hamming_pairs(
    hashes: DataFrame,
    hash_col: str,
    n_bits: int,
    max_hamming: int,
    id_col: str = "doc_id",
    salts: int = 8,
) -> DataFrame:
    """Generic Hamming-distance-≤k pair join over an ``n_bits``-wide
    integer hash column — the :func:`dedup_simhash` blocking pattern
    (pigeonhole chunking + hot-chunk salting) factored out so OTHER
    fingerprint families can ride it: 64-bit perceptual image hashes
    (:func:`~bb_bigdata_log_tools_spark.operators.multimodal.dedup_image`),
    audio fingerprints, any fixed-width signature.

    Split the hash into ``max_hamming + 1`` chunks; any pair within
    Hamming ≤ k differs in at most k chunks, so it agrees exactly on at
    least one — the self-join keys on (chunk_idx, chunk_val) buckets,
    never all-pairs. Survivors pay one ``bit_count(xor)``. Hot-chunk
    output skew (a near-constant image corpus collapses to few chunk
    values) is spread structurally: left side salts by ``id % salts``,
    right side replicates over the salt domain — AQE cannot split
    quadratic OUTPUT over tiny input, the salt can (same argument as
    dedup_simhash / dedup_embedding).

    Output: (id1, id2, hamming), id1 < id2, exactly once per pair.
    """
    if salts < 1:
        # salts=0 would make pmod(__id, 0) NULL on the left and
        # sequence(0, -1) empty-ish on the right — the join silently
        # matches nothing. Fail loudly like the other guards.
        raise ValueError(f"salts must be >= 1, got {salts}")
    n_chunks = max_hamming + 1
    if n_chunks > n_bits:
        raise ValueError(
            f"max_hamming={max_hamming} needs {n_chunks} chunks but the "
            f"hash is only {n_bits} bits wide"
        )
    base, rem = divmod(n_bits, n_chunks)
    if base < 5:
        # chunks under 5 bits bucket so coarsely the blocking join
        # degenerates toward all-pairs — refuse, like dedup_simhash
        raise ValueError(
            f"max_hamming={max_hamming} over {n_bits} bits gives "
            f"{base}-bit chunks (< 5): blocking would degenerate"
        )
    widths = [base + 1 if i < rem else base for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    h = F.col("__h")
    src = hashes.select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    )
    # shiftrightunsigned: bit 63 may be set (negative long) — a signed
    # shift would smear the sign bit across every high chunk
    def _mask(width: int) -> int:
        # two's-complement: a 64-bit all-ones mask is -1 as a Java
        # long; (1 << 64) - 1 overflows F.lit (found by the
        # any-width property sweep at max_hamming=0, n_bits=64)
        m = (1 << width) - 1
        return m - (1 << 64) if m >= 1 << 63 else m

    chunks = src.select(
        "__id",
        "__h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned(h, offsets[i])
                        .bitwiseAND(F.lit(_mask(widths[i])))
                        .alias("chunk_val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select(
        "__id",
        "__h",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_val").alias("chunk_val"),
    )
    a = chunks.withColumn(
        "salt", F.pmod(F.col("__id"), F.lit(salts))
    ).alias("a")
    b = chunks.withColumn(
        "salt",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(salts - 1).cast("long"))
        ),
    ).alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id1"),
            F.col("b.__id").alias("id2"),
            F.bit_count(
                F.col("a.__h").bitwiseXOR(F.col("b.__h"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 25,
    sort: bool = True,
) -> DataFrame:
    """(doc_id, cluster_id) connected components over a near-dup pair
    graph — the step that turns pairwise duplicates into "keep one per
    cluster" decisions (transitive dup chains A~B~C collapse even when
    A~C was never emitted).

    Min-label propagation with POINTER JUMPING: every node starts
    labeled with its own id; each round takes the min of its own and
    its neighbors' labels, then short-circuits label ← label(label)
    (path halving). Round 1 is folded into the initialization exchange
    (the identity-label distinct() and the first groupBy-min are the
    same shuffle), so graphs whose clusters have small diameter — the
    near-dup case — pay one confirmation round, not two full ones. The jump makes convergence O(log diameter) rounds
    instead of O(diameter) — a 2^25-hop chain converges within the
    default ``max_iter`` — at the cost of one extra self-join on the
    (small) label relation per round. Each round is joins + an
    aggregation keyed on node id, and ``localCheckpoint`` truncates the
    growing lineage — the standard Spark shape for iterative graph
    algorithms (no driver-side adjacency, works at any pair count).

    Raises RuntimeError if the loop exhausts ``max_iter`` without
    reaching a fixpoint (labels would be silently wrong otherwise).
    """
    # Materialize the pair graph ONCE: every propagation round joins
    # against it, and without this the (expensive) upstream pair
    # pipeline — e.g. the full minhash-LSH plan — would re-execute per
    # iteration.
    edges = pairs.select("doc_id1", "doc_id2").localCheckpoint()
    bidir = edges.unionByName(
        edges.select(
            F.col("doc_id2").alias("doc_id1"), F.col("doc_id1").alias("doc_id2")
        )
    )
    # Round 1 folded into initialization (r12 optimization round, guide
    # §2.4): the identity-label init was a distinct() — one exchange
    # that computed nothing. The SAME exchange as a groupBy-min also
    # performs round 1's propagation for free: with identity labels,
    # min over {node} ∪ neighbor-labels is exactly least(node,
    # min(neighbor)). The pointer jump below matches the loop's, so
    # `labels` here is bit-identical to the old code's state after its
    # first loop round — which is the FIXPOINT for the
    # bounded-diameter clusters near-dup graphs are made of, leaving
    # the loop a single confirmation round instead of two full ones.
    # (Round 1 always changes a label when a non-self edge exists, so
    # skipping its convergence count never misses a fixpoint the
    # loop's own count would have caught.)
    prop0 = (
        bidir.groupBy("doc_id1")
        .agg(F.min("doc_id2").alias("nbr_label"))
        .select(
            F.col("doc_id1").alias("node"),
            F.least(F.col("doc_id1"), F.col("nbr_label")).alias("label"),
        )
    )
    labels = (
        prop0.alias("l1")
        .join(prop0.alias("l2"), F.col("l1.label") == F.col("l2.node"))
        .select(
            F.col("l1.node").alias("node"), F.col("l2.label").alias("label")
        )
        .localCheckpoint()
    )
    changed = 1
    for _ in range(max_iter - 1):
        # ONE join + ONE aggregation per propagation (r12: the previous
        # shape paid a second, labels-side join to re-attach own labels
        # — unioning the self rows into the message relation folds that
        # join into the same exchange the aggregation already pays;
        # min over {own} ∪ neighbor-labels is identical algebra). The
        # self rows also carry old_label so convergence stays a
        # filter+count over this round's checkpoint.
        msgs = (
            bidir.join(labels, bidir.doc_id2 == labels.node)
            .select("doc_id1", "label")
            # null literal typed from the label column, not a hardcoded
            # long: string-keyed pair frames must not depend on union
            # type coercion
            .withColumn(
                "own", F.lit(None).cast(labels.schema["label"].dataType)
            )
            .unionByName(
                labels.select(
                    F.col("node").alias("doc_id1"),
                    "label",
                    F.col("label").alias("own"),
                )
            )
        )
        propagated = msgs.groupBy("doc_id1").agg(
            F.min("label").alias("label"),
            F.min("own").alias("old_label"),
        ).select(F.col("doc_id1").alias("node"), "label", "old_label")
        # pointer jumping: label ← label(label). Every label is a valid
        # node id (labels are mins over node ids), so the inner self-join
        # resolves every row; label(label) ≤ label by monotonicity.
        # The convergence count rides the checkpoint job itself
        # (Observation metrics fire on the eager checkpoint's action) —
        # the previous separate filter+count paid one extra job + driver
        # gap per round (r13 optimization round).
        obs = Observation()
        new_labels = (
            propagated.alias("l1")
            .join(
                propagated.alias("l2"),
                F.col("l1.label") == F.col("l2.node"),
            )
            .select(
                F.col("l1.node").alias("node"),
                F.col("l2.label").alias("label"),
                F.col("l1.old_label").alias("old_label"),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("label") != F.col("old_label")).cast("long")
                ).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = int(obs.get["chg"] or 0)
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    if changed != 0 and max_iter <= 1:
        # max_iter=1 runs zero confirmation rounds after the folded
        # round-1 init; an edge-free graph is trivially converged
        # (labels empty), so don't demand a confirmation round for it.
        if labels.isEmpty():
            changed = 0
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — raise max_iter"
        )
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    # sort=False output is a projection over the loop's checkpoint —
    # already materialized, safe for consumers to reference repeatedly
    return small_sort(out, "doc_id") if sort else out


def dedup_cluster(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    sort: bool = True,
) -> DataFrame:
    """Near-dup clusters: minhash-LSH pairs → connected components.

    Output (doc_id, cluster_id) for every document that participates in
    at least one near-dup pair; cluster_id is the smallest doc_id in the
    component (the canonical keeper).

    The pair feed skips its presentation sort (components re-checkpoint
    the edge list anyway — sorting into one partition first was a
    wasted job + a parallelism funnel; r12 optimization round).
    """
    return connected_components(
        dedup_minhash_lsh(documents, n, num_perm, bands, threshold, sort=False),
        sort=sort,
    )


def dedup_keep_best(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    sort: bool = True,
) -> DataFrame:
    """End-to-end near-dup RESOLUTION: cluster (minhash-LSH pairs →
    connected components, :func:`dedup_cluster`) then keep the
    highest-quality document per cluster — the selection policy that
    turns a dedup report into an actual drop list.

    Output: one row per REMOVED document — (doc_id, cluster_id,
    kept_doc_id, quality_score, kept_score). Ties on the rounded
    quality score keep the lowest doc_id.

    100 TB shape: the cluster relation is |near-dup docs| (small by
    construction); quality scoring is scan-parallel; the per-cluster
    argmax window runs over the cluster relation only, never the
    corpus.
    """
    from bb_bigdata_log_tools_spark.operators.textqc import text_quality

    clusters = dedup_cluster(documents, n, num_perm, bands, threshold, sort=False)
    # sort=False: the default small_sort would localCheckpoint + count
    # + globally sort the CORPUS-sized quality relation, and the join
    # below reshuffles it anyway (the dedup_resolve discipline)
    quality = text_quality(documents, sort=False).select(
        "doc_id", "quality_score"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    # checkpointed: `ranked` feeds BOTH the keeper pick and the drop
    # list below — without it the corpus-sized quality scan + window
    # would re-evaluate once per branch (r12 optimization round); the
    # relation is |near-dup participants| rows, tiny next to the corpus
    ranked = (
        clusters.join(quality, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .localCheckpoint()
    )
    kept = ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("quality_score").alias("kept_score"),
    )
    # `kept` is one row per near-dup cluster — unbounded on a
    # duplicate-heavy corpus (10⁸⁺ clusters on a 100 TB crawl), so no
    # broadcast hint: the join is equi-keyed on cluster_id and AQE
    # broadcasts only while `kept` actually fits.
    out = (
        ranked.filter(F.col("rn") > 1)
        .join(kept, "cluster_id")
        .select(
            "doc_id", "cluster_id", "kept_doc_id", "quality_score", "kept_score"
        )
    )
    return small_sort(out, "doc_id") if sort else out


def dedup_cross_source(
    documents: DataFrame, prefix_chars: int = 80
) -> DataFrame:
    """Cross-source duplication matrix: for every source pair, how many
    distinct leading-``prefix_chars`` fingerprints they share — the
    "who copies from whom" report that decides which sources to
    de-prioritize or dedup against each other (mirror sites, scraped
    re-posts, syndicated boilerplate).

    Prefix fingerprints (not full-content md5) because real mirrors
    append trailers/ads — the shared HEAD is the robust signal.

    100 TB shape: the self-join keys on the fingerprint, so each
    fingerprint's bucket is at most |sources| rows (distinct-projected
    BEFORE the join) — per-bucket work is bounded by |sources|²
    regardless of corpus size, and the output is at most
    |sources|²/2 rows.
    """
    fp = F.md5(F.substring(F.col("text"), 1, prefix_chars))
    d = documents.select(fp.alias("fp"), "source").distinct()
    return (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
        .transform(lambda d2: small_sort(d2, "source_a", "source_b"))
    )


def source_similarity(
    documents: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Source-level content-overlap matrix: Jaccard similarity between
    every pair of sources over their word-``n``-gram vocabularies —
    the corpus-composition view of duplication (which sources cover the
    same material), complementing the per-document dedup family.

    Shape: explode to (source, ngram) distinct — the one corpus-sized
    shuffle, carrying hashes of n-grams, not text — then per-source
    set sizes (tiny, broadcast) and an inverted-index self-join keyed
    on the n-gram: per-ngram work is bounded by |sources|² and the
    output by |sources|²/2 rows at any corpus size.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    sg = (
        documents.select("source", F.explode(grams).alias("g"))
        .select("source", F.md5("g").alias("gh"))
        .distinct()
        # one evaluation of the corpus explode+distinct: lazily this
        # relation fed THREE consumers (sizes + both self-join sides),
        # re-running the corpus scan/explode/shuffle each time
        .localCheckpoint()
    )
    sizes = sg.groupBy("source").agg(F.count("*").alias("n_grams"))
    # inverted index instead of a self-join: per-gram sorted source
    # list → ordered pair expansion. Equivalent to the old
    # (a.gh = b.gh AND a.source < b.source) join because sg is unique
    # on (source, gh) — each gram contributes exactly one row per
    # source pair — and ONE exchange on gh replaces the join's two
    # side shuffles of the same relation. Per-gram fan-out stays
    # bounded by C(|sources|, 2).
    pair_expr = F.expr(
        "flatten(transform(ss, (x, i) -> transform("
        "slice(ss, i + 2, size(ss)), "
        "y -> named_struct('source_a', x, 'source_b', y))))"
    )
    inter = (
        sg.groupBy("gh")
        .agg(F.sort_array(F.collect_list("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("size_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("size_b")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
        .transform(lambda d: small_sort(d, "source_a", "source_b"))
    )


def dedup_edit_distance(
    documents: DataFrame,
    max_dist: int = 8,
    prefix_len: int = 16,
    len_band: int = 16,
    sort: bool = True,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate pairs by Levenshtein edit distance, blocked so
    the quadratic comparison never touches the full corpus.

    Block key = (first ``prefix_len`` chars, ``n_chars // len_band``):
    two docs within ``max_dist`` edits of each other that share a
    prefix meet in the SAME or ADJACENT length bands (their lengths
    differ by ≤ max_dist ≤ len_band), so each group also joins the
    next band up via a bridge copy — without it, a pair straddling a
    band boundary (lengths 31 and 34 at len_band=16) was silently
    lost even with identical prefixes. Emission is exactly-once:
    equal-band pairs order by gid, cross-band pairs emit from the
    lower band. Only candidates pay the O(len²) ``levenshtein`` (JVM
    codegen, nothing Python-side). The prefix block trades recall for
    bound (edits inside the first ``prefix_len`` chars split a pair
    across blocks) — the standard windowed-blocking compromise;
    tighten with a second pass on suffix blocks if recall matters more
    than cost. Requires ``len_band ≥ max_dist`` for the adjacent-band
    property to hold.

    ``max_block`` caps the per-block fan-out the same way ``max_df``
    caps hot shingles in :func:`jaccard_pairs`: a block of B docs emits
    C(B,2) pairs, so one giant template/boilerplate block would
    dominate the whole job. Blocks over the cap are dropped BEFORE the
    self-join (a groupBy-count over the thin block-key relation) — a
    capped block is almost always exact-duplicate spam that
    :func:`dedup_exact` already resolves at hash speed.

    EXACT-DUP COLLAPSE: real corpora are duplicate-heavy, and a text
    with k copies would otherwise pay the O(len²) levenshtein on all
    C(k,2) identical pairs AND k² times per distinct-text partner. The
    join therefore runs on one representative per (block, text) group —
    levenshtein is computed ONCE per distinct-text pair — and member
    lists expand back to doc-id pairs afterwards (intra-group pairs are
    distance 0 by construction, no edit distance evaluated at all). A
    10× duplicate-replication probe drops from ~76 s to seconds;
    byte-identical output either way.
    """
    if len_band < max_dist:
        raise ValueError(
            "dedup_edit_distance requires len_band >= max_dist "
            f"(got len_band={len_band}, max_dist={max_dist}): the "
            "adjacent-band completeness guarantee only holds when a "
            "pair's length difference (<= max_dist) cannot span more "
            "than one band boundary — a smaller band silently loses "
            "pairs two bands apart"
        )
    blocked = documents.select(
        "doc_id",
        "text",
        F.substring("text", 1, prefix_len).alias("blk_prefix"),
        F.floor(F.col("n_chars") / len_band).alias("blk_len"),
    )
    if max_block is not None:
        hot = (
            blocked.groupBy("blk_prefix", "blk_len")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") > max_block)
            .select("blk_prefix", "blk_len")
        )
        blocked = blocked.join(hot, ["blk_prefix", "blk_len"], "left_anti")
    # Explicit width on the join keys: the group aggregate's output is
    # BYTE-small, so AQE would coalesce the downstream self-join to one
    # partition and serialize every levenshtein evaluation (the
    # quadratic-OUTPUT-vs-tiny-input blindspot dedup_embedding's salted
    # join documents). REPARTITION_BY_NUM is not coalescible.
    n_part = documents.sparkSession.sparkContext.defaultParallelism
    groups = (
        blocked.groupBy("blk_prefix", "blk_len", "text")
        .agg(
            F.min("doc_id").alias("gid"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .repartition(n_part, "blk_prefix", "blk_len")
    )
    # intra-group: all C(k,2) ordered pairs of identical texts, dist 0
    m = F.col("members")
    intra_pairs = F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + 2, F.greatest(F.size(m) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("doc_id1"), y.alias("doc_id2")),
            ),
        )
    )
    intra = (
        groups.filter(F.size(m) > 1)
        .select(F.explode(intra_pairs).alias("p"))
        .select(
            F.col("p.doc_id1"),
            F.col("p.doc_id2"),
            F.lit(0).cast("int").alias("edit_dist"),
        )
    )
    # inter-group: levenshtein once per distinct-text pair, then expand.
    # The left side carries a BRIDGE copy in band+1 so boundary-
    # straddling pairs meet; the (band<, or gid< at equal band) rule
    # emits each pair exactly once — equal-band pairs match only via
    # the jband == blk_len copy, cross-band only from the lower band.
    a = (
        groups.withColumn(
            "jband",
            F.explode(F.array(F.col("blk_len"), F.col("blk_len") + F.lit(1))),
        )
        .repartition(n_part, "blk_prefix", "jband")
        .alias("a")
    )
    b = groups.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.blk_prefix") == F.col("b.blk_prefix"))
            & (F.col("a.jband") == F.col("b.blk_len"))
            & (
                (F.col("a.blk_len") < F.col("b.blk_len"))
                | (
                    (F.col("a.blk_len") == F.col("b.blk_len"))
                    & (F.col("a.gid") < F.col("b.gid"))
                )
            ),
        )
        .select(
            F.col("a.members").alias("ma"),
            F.col("b.members").alias("mb"),
            F.levenshtein(F.col("a.text"), F.col("b.text")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
        .select(F.explode("ma").alias("x"), "mb", "edit_dist")
        .select("x", F.explode("mb").alias("y"), "edit_dist")
        .select(
            F.least("x", "y").alias("doc_id1"),
            F.greatest("x", "y").alias("doc_id2"),
            "edit_dist",
        )
    )
    return intra.unionAll(inter).transform(
        lambda d: small_sort(d, "doc_id1", "doc_id2") if sort else d
    )


def minhash_recall_eval(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    num_perm: int = 64,
    bands: int = 16,
    max_df: int = 10_000,
) -> DataFrame:
    """Recall/precision of the banded MinHash-LSH pair finder against
    the exact n-gram-Jaccard ground truth — the eval a pipeline runs
    before trusting approximate dedup at full scale (mirrors
    :func:`~.similarity.ann_recall_eval` for the ANN path).

    Both pair sets come from the production operators, so the eval
    exercises the real plans; the comparison is a full outer join on
    the (small, pair-level) outputs plus one global aggregate — cost is
    dominated by the two finders themselves. The (doc_id, h) shingle
    relation is CAPPED at ``max_df`` once and materialized ONCE
    (localCheckpoint), then fed to BOTH finders — so truth and approx
    score the SAME Jaccard definition. Feeding the LSH side the
    uncapped relation made threshold-boundary pairs flip between the
    sets for cap reasons unrelated to LSH recall (capped truth J vs
    uncapped verification J disagree whenever a shared shingle is
    hotter than max_df).
    """
    raw = doc_shingle_hashes(documents, n)
    hot = (
        raw.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("h")
    )
    sh = raw.join(hot, "h", "left_anti").localCheckpoint()
    truth = dedup_ngram_jaccard(
        documents, n, threshold, max_df, shingles=sh
    ).select("doc_id1", "doc_id2", F.lit(1).alias("in_truth"))
    approx = dedup_minhash_lsh(
        documents, n, num_perm, bands, threshold, shingles=sh, sort=False
    ).select("doc_id1", "doc_id2", F.lit(1).alias("in_approx"))
    return (
        truth.join(approx, ["doc_id1", "doc_id2"], "full_outer")
        .agg(
            F.count("in_truth").alias("n_true"),
            F.count("in_approx").alias("n_approx"),
            F.count(F.when(F.col("in_truth") * F.col("in_approx") == 1, 1)).alias(
                "n_hits"
            ),
        )
        .select(
            "n_true",
            "n_approx",
            "n_hits",
            F.round(F.col("n_hits") / F.greatest(F.col("n_true"), F.lit(1)), 4).alias(
                "recall"
            ),
            F.round(
                F.col("n_hits") / F.greatest(F.col("n_approx"), F.lit(1)), 4
            ).alias("precision"),
        )
    )


def shingle_novelty(documents: DataFrame, n: int = 3) -> DataFrame:
    """Per-document novelty: the fraction of a document's word
    n-gram shingles whose FIRST corpus appearance (minimum doc_id) is
    this document — the corpus-growth signal behind "is new data still
    adding content or just re-crawling?" curves.

    One shingle explode feeds both sides: the first-seen relation is a
    groupBy(h) min aggregate (map-side partial, |shingles| rows), and
    the per-doc score re-joins it on the shingle hash — the same
    two-pass inverted-index shape as unigram_perplexity, no quadratic
    pair join anywhere.
    """
    sh = doc_shingle_hashes(documents, n).localCheckpoint()
    first = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 4).alias("novelty"),
        )
        .transform(lambda d: small_sort(d, "doc_id"))
    )


def cluster_size_stats(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-dup cluster size distribution: how many clusters of each
    size the minhash-LSH + connected-components pipeline finds — the
    dedup health report (a few huge clusters = boilerplate/template
    contamination; many pairs = ordinary near-dups).

    All post-clustering work is two aggregates over the (doc, cluster)
    relation, which is bounded by the number of near-dup PARTICIPANTS,
    not the corpus.
    """
    clusters = dedup_cluster(documents, n, num_perm, bands, threshold, sort=False)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
        )
        .transform(lambda d: small_sort(d, "cluster_size"))
    )


def dedup_pagerank(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the near-dup graph (minhash-LSH pairs,
    symmetrized): a fixed number of power iterations ranks documents by
    duplication centrality — hub documents sit inside dense template
    families, the long tail are one-off near-dups. The iterative-graph
    sibling of :func:`connected_components` (label propagation) and
    k-means (centroid iteration).

    Scale shape: each iteration is one join of the rank relation
    (|participants| rows) to the edge list plus a groupBy-sum — no
    driver-side graph, lineage cut per iteration via localCheckpoint
    (the dedup_cluster discipline). Fixed ``iters`` keeps the oracle
    expressible as unrolled SQL; ranks round to 6 dp so cross-engine
    float-sum ordering cannot flip the output.
    """
    # checkpoint BEFORE the symmetrizing union: both union branches
    # reference `pairs`, and an unmaterialized feed would re-run the
    # whole LSH plan once per branch (r12 optimization round)
    pairs = dedup_minhash_lsh(
        documents, n, num_perm, bands, threshold, sort=False
    ).localCheckpoint()
    # narrow union over the pairs checkpoint — its two consumers below
    # (join side + degree aggregate) each re-read the checkpoint, which
    # is cheaper than materializing a second copy of the edge bytes
    edges = pairs.select(
        F.col("doc_id1").alias("src"), F.col("doc_id2").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_id2").alias("src"), F.col("doc_id1").alias("dst"))
    )
    # Static relations leave the loop (r12 optimization round, guide
    # §2.4): the degree is joined to the edge list ONCE (it never
    # changes), the symmetric graph makes the per-iteration
    # nodes-left-join provably total (every node has in-edges, so the
    # contribution relation's key set IS the node set and the coalesce
    # never fired), and iteration 1's rank join is folded away (rank0
    # is the constant 1/n — the same division arrives as a literal).
    # Per-edge arithmetic is unchanged; only join bookkeeping moved.
    edgesd = (
        edges.join(
            edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")), "src"
        )
        .select("src", "dst", "deg")
        .localCheckpoint()
    )
    n_nodes = edgesd.select("src").distinct().count()
    if n_nodes == 0:
        # Clean corpus: no near-dup pairs → no graph. Return an empty
        # (doc_id, rank) frame instead of dividing by zero below.
        return edgesd.select(F.col("src").alias("doc_id")).withColumn(
            "rank", F.lit(0.0).cast("double")
        )
    ranks = None
    for _ in range(iters):
        if ranks is None:
            per_edge = edgesd.select(
                F.col("dst"), (F.lit(1.0 / n_nodes) / F.col("deg")).alias("c")
            )
        else:
            per_edge = edgesd.join(ranks, edgesd.src == ranks.doc_id).select(
                F.col("dst"), (F.col("rank") / F.col("deg")).alias("c")
            )
        ranks = (
            per_edge.groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
            .select(
                F.col("dst").alias("doc_id"),
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + damping * F.col("in_sum")
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    if ranks is None:
        # iters=0: uniform initial ranks (the pre-fold behavior; the
        # fold starts from the 1/n literal, so the relation was never
        # materialized)
        ranks = (
            edgesd.select(F.col("src").alias("doc_id"))
            .distinct()
            .withColumn("rank", F.lit(1.0 / n_nodes))
        )
    return (
        ranks.select("doc_id", F.round("rank", 6).alias("rank"))
        .transform(lambda d: small_sort(d, F.desc("rank"), F.asc("doc_id")))
    )


def dedup_substring(
    documents: DataFrame,
    gram_len: int = 20,
    min_len: int = 30,
    max_df: int = 64,
) -> DataFrame:
    """Suffix-array-style duplicated-substring detection (the
    cross-document half of Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better", arXiv:2107.06499): for every
    document pair sharing a verbatim substring of ≥ ``min_len`` chars,
    report the longest common run.

    A true distributed suffix array is overkill on Spark; the
    equivalent relational shape is POSITIONAL gram matching — the same
    diagonal trick a suffix-array dedup exploits, expressed as joins:

    1. every overlapping ``gram_len``-char gram of every doc, WITH its
       position (posexplode; one row per char — the suffix-array's
       leaf set);
    2. grams occurring > ``max_df`` times corpus-wide are dropped
       BEFORE the join (boilerplate grams carry no pair signal and
       would fan out quadratically — the max_df discipline of
       ``jaccard_pairs``, which also bounds per-gram join output to
       C(max_df, 2) so no salting is needed);
    3. self-join on gram hash (doc_id1 < doc_id2): co-occurrence at
       (p1, p2) lies on diagonal p1−p2 — consecutive positions on one
       diagonal are one contiguous shared substring;
    4. islands trick per (pair, diagonal): run_len = longest streak of
       consecutive p1 (p1 − row_number is constant within a streak),
       and the shared-substring length is gram_len + run − 1.

    Output: (doc_id1, doc_id2, lcs_len) — the longest verbatim shared
    span per pair, ≥ ``min_len``, exact as long as every shared gram of
    the winning span survives the df cap.

    100 TB shape: the positions relation is O(total chars) = corpus
    scale but narrow (doc_id, pos, 60-bit hash); everything downstream
    is df-capped equi-joins and partial-agg groupBys. gram_len trades
    recall (spans shorter than gram_len are invisible) against
    positions-relation width — 20-50 is the paper's working range.
    """
    c = F.col("text")
    grams = (
        documents.filter(F.length(c) >= gram_len)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length(c) - F.lit(gram_len - 1)),
                    lambda i: F.substring(c, i, gram_len),
                )
            ).alias("pos", "gram"),
        )
        .select("doc_id", "pos", md5_long(F.col("gram")).alias("h"))
    )
    hot = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("h")
    )
    kept = grams.join(hot, "h", "left_anti")
    # inverted index instead of a self-join: per-gram-hash sorted
    # (doc_id, pos) list → ordered pair expansion. Equivalent to the
    # old (a.h = b.h AND a.doc_id < b.doc_id) join because `kept` is
    # unique on (doc_id, pos) — each co-occurrence contributes exactly
    # one (pair, p1, diag) row — and ONE exchange on h replaces the
    # join's two side shuffles of the corpus-scale positions relation.
    # collect_list buffers are bounded: hot grams (df > max_df) are
    # dropped BEFORE the group, so a list holds ≤ max_df entries. No
    # distinct afterwards for the same reason as before: rows are
    # unique by construction.
    pair_expr = F.expr(
        "flatten(transform(ms, (x, i) -> transform("
        "filter(slice(ms, i + 2, size(ms)), y -> y.doc_id != x.doc_id), "
        "y -> named_struct('doc_id1', x.doc_id, 'doc_id2', y.doc_id, "
        "'p1', x.pos, 'diag', x.pos - y.pos))))"
    )
    hits = (
        kept.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "pos"))).alias("ms"))
        .filter(F.size("ms") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.doc_id1", "p.doc_id2", "p.p1", "p.diag")
    )
    w = Window.partitionBy("doc_id1", "doc_id2", "diag").orderBy("p1")
    runs = (
        hits.withColumn("grp", F.col("p1") - F.row_number().over(w))
        .groupBy("doc_id1", "doc_id2", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    return (
        runs.groupBy("doc_id1", "doc_id2")
        .agg((F.max("run") + F.lit(gram_len - 1)).alias("lcs_len"))
        .filter(F.col("lcs_len") >= min_len)
        .transform(lambda d: small_sort(d, "doc_id1", "doc_id2"))
    )


def dedup_graph_triangles(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
) -> DataFrame:
    """Triangle census of the near-dup graph: triangle count, wedge
    (open-triple) count, and the global clustering coefficient
    3·triangles/wedges — the template-cohesion metric that separates
    dense copy FAMILIES (every member similar to every other,
    coefficient → 1) from similarity CHAINS (A~B~C but A≁C,
    coefficient → 0), which need different dedup policies (drop the
    family vs keep chain endpoints).

    Node-iterator triangle counting in relational form: orient every
    edge small→large id (each triangle counted exactly once as
    i<j<k), then wedges(i: j,k) ⋈ edges(j,k). The classical
    distributed-graph sibling of :func:`connected_components`
    (propagation) and :func:`dedup_pagerank` (power iteration).

    Output: one row — (n_edges, n_wedges, n_triangles,
    clustering_coefficient).

    Scale shape: the pair graph is |near-dup pairs| (bounded by the
    LSH candidate discipline); the wedge join keys on the second
    vertex and its fan-out is Σ deg(v)² — the standard bound, small on
    near-dup graphs whose dense parts are exactly the families the
    report exists to find.
    """
    pairs = dedup_minhash_lsh(documents, n, num_perm, bands, threshold, sort=False)
    # n_edges is observed during the checkpoint job (no separate count
    # job — r13 optimization round)
    eobs = Observation()
    edges = pairs.select(
        F.least("doc_id1", "doc_id2").alias("u"),
        F.greatest("doc_id1", "doc_id2").alias("v"),
    ).distinct().observe(
        eobs, F.count(F.lit(1)).alias("n")
    ).localCheckpoint()
    # symmetrize for wedge counting: a wedge is an UNDIRECTED
    # center-with-two-neighbors triple (n1 < n2); each triangle
    # contributes 3 wedges (one per center) and every one of them
    # closes, so closed = 3·triangles exactly.
    und = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    a = und.alias("a")
    b = und.alias("b")
    wedges = a.join(
        b,
        (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v")),
    ).select(F.col("a.v").alias("w1"), F.col("b.v").alias("w2"))
    # ONE pass over the wedge join: the previous shape counted wedges
    # and closed wedges with two separate actions, re-evaluating the
    # (expensive) wedge self-join for each. A LEFT join against the
    # (distinct, hence unique-keyed) edge list marks closure without
    # duplicating rows, so both counts come from a single aggregate —
    # one job, one wedge-join evaluation (r13 optimization round).
    e2 = edges.alias("e2")
    stats = (
        wedges.join(
            e2,
            (F.col("w1") == F.col("e2.u")) & (F.col("w2") == F.col("e2.v")),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_wedges"),
            F.count(F.col("e2.u")).alias("n_closed"),
        )
        .first()
    )
    n_edges = int(eobs.get["n"])
    n_wedges = stats["n_wedges"]
    n_closed = stats["n_closed"]
    n_tri = n_closed // 3
    coeff = round(n_closed / n_wedges, 4) if n_wedges else 0.0
    spark = documents.sparkSession
    return spark.createDataFrame(
        [(n_edges, n_wedges, n_tri, coeff)],
        "n_edges long, n_wedges long, n_triangles long, clustering_coefficient double",
    )


def contrastive_pairs(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
) -> DataFrame:
    """Contrastive training triplets mined from the near-dup graph:
    every minhash-LSH pair becomes an (anchor, positive), and each gets
    a DETERMINISTIC hard-ish negative — the corpus document whose
    seeded hash rank follows the anchor's (cyclically), skipping the
    positive. The standard self-supervised data-prep for embedding /
    retrieval models (near-dups are free positives; the md5-seeded
    negative pick is uniform, retry-stable, and engine-exact, unlike
    rand()).

    Output: (anchor_id, positive_id, negative_id, jaccard).

    100 TB shape: the pair relation is LSH-bounded; the negative pick
    is a bucketed-parallel global rank over the corpus ids plus an
    equi-join on the anchor's rank successor — no corpus self-join, no
    rand(). The rank is exact-global WITHOUT an unpartitioned window
    (which would sort every corpus id in ONE task): the 60-bit seeded
    hash's top 6 bits form 64 ORDERED buckets, ids rank within their
    bucket in parallel, and the tiny 64-row bucket-count relation
    yields the offsets — rank = offset + local rank reproduces the
    single-window ordering bit-for-bit.
    """
    pairs = dedup_minhash_lsh(documents, n, num_perm, bands, threshold, sort=False)
    rank_h = md5_long(F.concat(F.lit("neg:"), F.col("doc_id").cast("string")))
    # Checkpoint the thin (doc_id, rh) relation and observe its row
    # count during that job: the previous separate count() paid a full
    # corpus scan for one scalar, then the ranking below re-scanned —
    # now the corpus is scanned once and both consumers (count + rank)
    # read the 16-byte/row checkpoint (r13 optimization round).
    iobs = Observation()
    ids = (
        documents.select("doc_id", rank_h.alias("rh"))
        .observe(iobs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_docs = int(iobs.get["n"])
    # top 6 of the 60 hash bits → 64 buckets whose boundaries respect
    # the (rh, doc_id) global order; md5-collision ties share a bucket
    bkt = F.shiftright(F.col("rh"), 60 - 6)
    wloc = Window.partitionBy("bkt").orderBy("rh", "doc_id")
    loc = ids.withColumn("bkt", bkt).withColumn(
        "lrk", F.row_number().over(wloc)
    )
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )  # 64-row relation: the single-task window is trivially small
    offs = (
        loc.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("off", F.coalesce(F.sum("c").over(woff), F.lit(0)))
        .select("bkt", "off")
    )
    ranked = (
        loc.join(F.broadcast(offs), "bkt")
        .select("doc_id", (F.col("off") + F.col("lrk")).alias("rk"))
    )
    r_anchor = ranked.alias("ra")
    r1 = ranked.alias("r1")
    r2 = ranked.alias("r2")
    r3 = ranked.alias("r3")

    def _ok(side: str):
        return (F.col(f"{side}.doc_id") != F.col("doc_id1")) & (
            F.col(f"{side}.doc_id") != F.col("doc_id2")
        )

    out = (
        pairs.join(r_anchor, F.col("doc_id1") == F.col("ra.doc_id"))
        .join(
            r1,
            F.col("r1.rk") == F.pmod(F.col("ra.rk"), F.lit(n_docs)) + 1,
        )
        .join(
            r2,
            F.col("r2.rk") == F.pmod(F.col("ra.rk") + 1, F.lit(n_docs)) + 1,
        )
        .join(
            r3,
            F.col("r3.rk") == F.pmod(F.col("ra.rk") + 2, F.lit(n_docs)) + 1,
        )
        .select(
            F.col("doc_id1").alias("anchor_id"),
            F.col("doc_id2").alias("positive_id"),
            # first rank-successor that is neither the anchor nor the
            # positive; at most two of three consecutive successors can
            # collide, so one of r1/r2/r3 is always valid for n_docs ≥ 3.
            # Below that the triplet is degenerate → NULL, not a bogus
            # (anchor, positive, anchor) row.
            F.when(_ok("r1"), F.col("r1.doc_id"))
            .when(_ok("r2"), F.col("r2.doc_id"))
            .when(_ok("r3"), F.col("r3.doc_id"))
            .alias("negative_id"),
            "jaccard",
        )
        .transform(lambda d: small_sort(d, "anchor_id", "positive_id"))
    )
    return out


def winnowing_fingerprints(
    documents: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every character k-gram, then keep the
    MINIMUM hash of each sliding window of ``window`` consecutive
    k-grams — the guarantee is that any shared
    substring of length ≥ k + window − 1 contributes at least one
    shared fingerprint, at ~2/(window+1) selection density. The
    position-robust sibling of :func:`dedup_substring`: winnowing pays
    O(docs · selected) instead of O(total chars) downstream.

    Output: (doc_id, fp) — DISTINCT selected fingerprint hashes.

    100 TB shape: pure per-row array algebra (k-gram hashes → window
    minima via transform over index ranges) — one scan, no shuffle;
    the distinct is per (doc, fp) with map-side partials.
    """
    if k < 1 or window < 1:
        # loud: k=0 hashes empty grams (every doc shares every
        # fingerprint), window=0 takes array_min of an empty slice
        # (null fps) — both silently corrupt the near-dup relation
        raise ValueError(f"need k >= 1 and window >= 1, got {k}/{window}")
    c = F.col(text_col)
    n_grams = F.length(c) - F.lit(k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: md5_long(F.substring(c, i, k)),
    )
    n_windows = F.size(F.col("grams")) - F.lit(window - 1)
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
        lambda w: F.array_min(F.slice(F.col("grams"), w, window)),
    )
    # no trailing .distinct(): array_distinct already dedups within the
    # doc and doc_id differs across docs, so (doc_id, fp) rows are
    # unique by construction — the old distinct was a full extra
    # corpus exchange for a no-op
    return (
        documents.filter(F.length(c) >= k + window - 1)
        .select("doc_id", grams.alias("grams"))
        .select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
    )


def dedup_winnowing(
    documents: DataFrame,
    k: int = 8,
    window: int = 4,
    threshold: float = 0.5,
    max_df: int = 64,
) -> DataFrame:
    """Near-dup pairs by WINNOWING fingerprint overlap — the MOSS-style
    similarity report: pairs sharing ≥ ``threshold`` of the smaller
    document's selected fingerprints (the containment coefficient,
    which unlike Jaccard also catches a short document embedded in a
    long one). Fingerprints hotter than ``max_df`` are dropped before
    the join (the boilerplate cap); join fan-out per fingerprint is
    bounded by C(max_df, 2).

    Output: (doc_id1, doc_id2, n_shared, containment).
    """
    # one evaluation of the fingerprint subtree: lazily it fed FOUR
    # consumers (hot, sizes, both self-join sides), re-running the
    # per-char k-gram hashing each time
    fps = winnowing_fingerprints(documents, k, window).localCheckpoint()
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("fp")
    )
    kept = fps.join(hot, "fp", "left_anti")
    # inverted index instead of a self-join: per-fingerprint sorted doc
    # list → ordered pair expansion. Equivalent to the old
    # (a.fp = b.fp AND a.doc_id < b.doc_id) join because kept is unique
    # on (doc_id, fp); ONE exchange on fp replaces the join's two side
    # shuffles, and the fan-out per fingerprint stays bounded by
    # C(max_df, 2) (hot fingerprints are dropped before the group).
    grouped = (
        kept.groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .localCheckpoint()  # feeds both sizes and the pair expansion
    )
    sizes = (
        grouped.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> transform("
        "slice(ds, i + 2, size(ds)), "
        "y -> named_struct('doc_id1', x, 'doc_id2', y))))"
    )
    shared = (
        grouped.filter(F.size("ds") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.doc_id1").alias("doc_id1"),
            F.col("p.doc_id2").alias("doc_id2"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(sa, F.col("doc_id1") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_id2") == F.col("sb.doc_id"))
        .select(
            "doc_id1",
            "doc_id2",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least(F.col("sa.sz"), F.col("sb.sz")), 4
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
        .transform(lambda d: small_sort(d, "doc_id1", "doc_id2"))
    )


def dedup_resolve(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    sort: bool = True,
) -> DataFrame:
    """The END-TO-END drop list: one keep/drop decision per document,
    combining the dedup strategies in precedence order — what a user
    actually runs to dedupe a corpus (the per-method ops are the
    diagnostics; this is the deliverable).

    Reasons, first applicable wins:
    - ``exact``: byte-identical content, not the min-id copy;
    - ``near``: in a minhash-LSH connected component, not the min-id
      representative (transitive chains collapse);
    - ``kept``: everything else.

    Deterministic min-id keeper policy on both tiers (swap
    :func:`dedup_keep_best`'s quality argmax in where quality should
    decide). Output: (doc_id, decision, keeper_doc_id) where
    keeper_doc_id is TRANSITIVELY resolved — it always names a doc the
    list marks 'kept', never an intermediate keeper that is itself
    dropped.

    100 TB shape: the exact tier is one window over the md5 groups;
    the near tier rides the LSH + components pipeline (salted,
    bounded); decisions union without ever joining the corpus to
    itself.
    """
    exact_w = Window.partitionBy(F.md5(F.col("text")))
    exact = documents.select(
        "doc_id",
        F.min("doc_id").over(exact_w).alias("exact_keeper"),
    )
    clusters = dedup_cluster(documents, n, num_perm, bands, threshold, sort=False)
    out = (
        exact.join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("doc_id") != F.col("exact_keeper"), F.lit("exact"))
            .when(
                F.col("cluster_id").isNotNull()
                & (F.col("doc_id") != F.col("cluster_id")),
                F.lit("near"),
            )
            .otherwise(F.lit("kept"))
            .alias("decision"),
            # keeper_doc_id is fully resolved to the FINAL kept doc: an
            # exact-dropped doc's exact keeper may itself be near-dropped
            # (exact keeper != cluster rep), so use the doc's own cluster
            # rep when one exists — byte-identical dups share identical
            # minhash signatures, hence the same component, and the min-id
            # rep of a component is always 'kept' (it is also the min of
            # its own exact group). No one-hop dangling references.
            F.when(
                F.col("doc_id") != F.col("exact_keeper"),
                F.coalesce(F.col("cluster_id"), F.col("exact_keeper")),
            )
            .when(
                F.col("cluster_id").isNotNull()
                & (F.col("doc_id") != F.col("cluster_id")),
                F.col("cluster_id"),
            )
            .otherwise(F.col("doc_id"))
            .alias("keeper_doc_id"),
        )
    )
    # sort=False lets composers (corpus_curate) skip the small-result
    # sort: its localCheckpoint+repartition(1) would run eagerly only
    # for the order to be destroyed by the downstream doc_id joins
    return small_sort(out, "doc_id") if sort else out


def minhash_bucket_stats(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    sort: bool = True,
) -> DataFrame:
    """LSH TUNING diagnostic: per-band bucket-size distribution of the
    banded minhash signature — the report that tells you whether the
    (num_perm, bands) choice is generating a sane candidate load BEFORE
    the pair join runs. ``candidate_pairs`` = Σ C(size, 2) per band is
    exactly the pair-join output the dedup pipeline will pay for;
    ``max_bucket`` is the straggler that the salt spreads
    (:func:`dedup_minhash_lsh`). Run it when onboarding a new corpus:
    a boilerplate-heavy source shows up as a few enormous buckets here
    long before a 10× probe would.

    Output per band: (band_idx, n_buckets, n_docs, max_bucket,
    n_colliding, candidate_pairs). Two partial-agg groupBys over the
    thin (doc_id, band) relation — never touches text after the
    signature scan.
    """
    b = minhash_bands(documents, n, num_perm, bands)
    sizes = b.groupBy("band_idx", "band_sig").agg(
        F.count(F.lit(1)).alias("sz")
    )
    out = (
        sizes.groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("sz").alias("n_docs"),
            F.max("sz").alias("max_bucket"),
            F.sum((F.col("sz") > 1).cast("long")).alias("n_colliding"),
            # integer `div`: the product is even, and exact int math
            # avoids the 2^53 double hazard entirely
            F.sum(F.expr("sz * (sz - 1) div 2")).alias("candidate_pairs"),
        )
        .select(
            F.col("band_idx").cast("int").alias("band_idx"),
            "n_buckets",
            "n_docs",
            "max_bucket",
            "n_colliding",
            "candidate_pairs",
        )
    )
    return small_sort(out, "band_idx") if sort else out


def dedup_lines(
    documents: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    sep: str = "\n",
    sort: bool = True,
) -> DataFrame:
    """LINE-level cross-corpus dedup — the C4 cleaning discipline
    (Raffel et al. 2020, §2.2: discard any line occurring more than
    once in the corpus): boilerplate lines (navigation chrome, cookie
    banners, "all rights reserved") repeat across thousands of pages
    while real prose lines are unique, so dropping every line whose
    corpus-wide occurrence count reaches ``min_count`` strips
    boilerplate without touching content. The eighth lexical dedup
    family — the only one operating BELOW document granularity on
    exact units (the winnowing/suffix-array families find fuzzy
    overlap; this one removes exact repeated lines in place).

    Line key = lower(trim(line)); a line repeated within ONE document
    counts too (C4 behavior). Documents come back REASSEMBLED: kept
    lines in original order, so the output is a drop-in cleaned
    corpus.

    100 TB shape: posexplode is narrow; ONE hash shuffle on the line
    key builds the counts (map-side partial agg) and the count join
    reuses that partitioning; reassembly is one doc_id shuffle with
    collect_list over (pos, line) structs — state per doc is the
    document itself, never the corpus. No broadcast of the flagged
    set is needed (adversarially boilerplate-heavy corpora can have
    millions of repeated lines — the join stays sound regardless).

    Output: (doc_id, n_lines, n_removed, n_chars_kept, kept_md5).
    """
    # F.split takes a Java REGEX but sep is a LITERAL separator (the
    # reassembly array_join and the DuckDB oracle's string_split both
    # treat it literally): escape it, or sep="|" / "." would split on
    # every character.
    lines = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "pos", "line"
        ),
    ).withColumn("k", F.lower(F.trim("line")))
    counts = lines.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    joined = lines.join(counts, "k")
    removed = F.col("cnt") >= min_count
    kept_structs = F.array_sort(
        F.collect_list(F.when(~removed, F.struct("pos", "line")))
    )
    kept_text = F.array_join(
        F.transform(kept_structs, lambda s: s["line"]), sep
    )
    out = (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(removed.cast("long")).alias("n_removed"),
            kept_text.alias("kept"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_removed",
            F.length("kept").alias("n_chars_kept"),
            F.md5(F.encode("kept", "UTF-8")).alias("kept_md5"),
        )
    )
    return small_sort(out, "doc_id") if sort else out
