"""Distinct-count sketches, implemented from scratch as pure column
algebra — deterministic, so the DuckDB oracle reproduces every register
and estimate bit-for-bit (unlike ``approx_count_distinct``, whose
engine-internal HLL cannot be cross-checked).

Five classical sketch families (the quantile histogram at the end of
this module works on raw values, the rest share the same md5-derived
60-bit hash space):

- :func:`approx_distinct_hll` — HyperLogLog (Flajolet et al. 2007):
  per (group, register) max leading-zero rank, harmonic-mean estimate
  with the standard small-range correction. The sketch STATE is a
  relational (group, register, max_rho) table — i.e. mergeable by
  ``max`` groupBy, which is exactly how a 100 TB run unions partial
  sketches across partitions/days without touching raw data again.
- :func:`approx_distinct_kmv` — K-Minimum-Values (Bar-Yossef et al.
  2002): the k smallest distinct hashes per group; est =
  (k−1)·H/h₍ₖ₎ for hash space of size H. State is the k-row bottom
  set per group — mergeable by re-ranking the union.
- :func:`cms_freq_estimate` — Count-Min (Cormode & Muthukrishnan
  2005): depth×width counter relation, mergeable by ``sum``; frequency
  estimates = min over depth rows, never an underestimate.
- :func:`overlap_kmv` — KMV set ALGEBRA (Beyer et al. 2007): pairwise
  union-size and Jaccard estimates computed from the per-group bottom-k
  sketches alone.
- :func:`quantile_sketch` — mergeable sign × octave × second-bit
  histogram (≤ ~256 bins per group over the whole int64 domain);
  quantile estimates from bin midpoints, ≤ 25% relative error by
  construction, counters mergeable by ``sum`` like the CMS state.

Scale notes (100 TB): both sketches reduce to one partial-agg groupBy
over (group, derived-column) — the shuffle carries registers or bottom-k
candidates, never raw values; memory per group is m=2^p registers or k
hashes. This is the point of sketches: distinct-count a trillion rows
with KB-scale state per group. The leading-zero rank uses
``length(bin(w))`` (minimal binary string, identical in Spark and
DuckDB) — integer logic, no float log2 boundary hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.functions.hashing import md5_long
from bb_bigdata_log_tools_spark.operators.util import small_sort

#: md5_long yields 60-bit non-negative hashes.
HASH_BITS = 60


def _alpha(m: int) -> float:
    """Standard HLL bias-correction constant for m ≥ 128."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register_relation(
    df: DataFrame, group_col: str, value_col: str, p: int
) -> DataFrame:
    """(grp, reg, mx) HLL register relation — the ONE copy of the
    register/rho derivation shared by the batch sketch and
    ``streaming.ops.stream_hll_registers`` (``max`` is associative and
    idempotent, so the same plan runs batch or streaming). NULL values
    are ignored (countDistinct semantics): md5_long(NULL) is NULL and
    would otherwise create a phantom (reg=NULL, mx=NULL) row that
    inflates ``present`` without contributing to the harmonic sum —
    skewing both the raw and small-range estimates."""
    m = 1 << p
    wbits = HASH_BITS - p
    h = md5_long(F.col(value_col).cast("string"))
    reg = F.pmod(h, F.lit(m))
    # exact integer h // 2^p: shiftright, never double division — doubles
    # are exact only to 2^53, so floor(h/m) on a 60-bit hash can round up
    # near power-of-two boundaries and produce an invalid rho=0 register.
    w = F.shiftright(h.cast("long"), p)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), reg.alias("reg"), rho.alias("rho"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("mx"))
    )


def distinct_hash_relation(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(grp, h) distinct md5-hash relation feeding the KMV family.
    NULL values are ignored (countDistinct semantics): md5_long(NULL)
    is NULL and sorts NULLS FIRST, so it would steal rank 1 in the
    bottom-k windows and shift every real hash's rank."""
    h = md5_long(F.col(value_col).cast("string"))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), h.alias("h"))
        .distinct()
    )


def kmv_bottom_k_from_hashes(
    hashes: DataFrame, k: int, salts: int = 16
) -> DataFrame:
    """(grp, h, rk) bottom-k relation from a (grp, h) hash relation —
    the ONE copy of the salted two-phase KMV build shared by
    ``approx_distinct_kmv`` and ``overlap_kmv`` (a single per-group
    rank window would sort |distinct(group)| hashes in ONE task — the
    grouped_topk discipline)."""
    w1 = Window.partitionBy(
        "grp", F.pmod(F.col("h"), F.lit(salts))
    ).orderBy("h")
    survivors = (
        hashes.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .drop("r1")
    )
    wnd = Window.partitionBy("grp").orderBy("h")
    return survivors.withColumn("rk", F.row_number().over(wnd)).filter(
        F.col("rk") <= k
    )


def kmv_bottom_k(
    df: DataFrame, group_col: str, value_col: str, k: int, salts: int = 16
) -> DataFrame:
    """Bottom-k DISTINCT-hash sketch straight from a raw relation —
    :func:`distinct_hash_relation` piped into
    :func:`kmv_bottom_k_from_hashes`."""
    return kmv_bottom_k_from_hashes(
        distinct_hash_relation(df, group_col, value_col), k, salts
    )


def approx_distinct_hll(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 8,
    sort: bool = True,
) -> DataFrame:
    """HyperLogLog distinct estimate per group, with the exact count
    alongside (so the output doubles as the sketch's own accuracy
    report; expected relative error ≈ 1.04/√m ≈ 6.5 % at p=8).

    Register math: h = md5-int64(value); register = h mod m; the
    remaining ``HASH_BITS − p`` bits form w; rho = (bits − p) −
    msb(w) + 1 (leading zeros + 1), with w = 0 → bits − p + 1.
    Estimate = α·m²/Σ2^(−M_j), small-range corrected to m·ln(m/V) when
    E ≤ 2.5m and V (empty registers) > 0.

    Output: (group, n_exact, hll_estimate, rel_error).
    """
    m = 1 << p
    regs = hll_register_relation(df, group_col, value_col, p)
    # harmonic sum over PRESENT registers; absent registers contribute
    # 2^0 = 1 each → add (m − present) after the aggregate.
    agg = regs.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s_present"),
        F.count(F.lit(1)).alias("present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("present"))
    zeros = F.lit(m) - F.col("present")
    raw = F.lit(_alpha(m) * m * m) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(value_col).alias("n_exact")
    )
    return (
        agg.select("grp", F.round(est, 2).alias("hll_estimate"))
        .join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            "hll_estimate",
            F.round(
                F.abs(F.col("hll_estimate") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ).alias("rel_error"),
        )
        .transform(lambda d: small_sort(d, group_col) if sort else d)
    )


def approx_distinct_kmv(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 64,
    sort: bool = True,
) -> DataFrame:
    """K-Minimum-Values distinct estimate per group: keep the k smallest
    DISTINCT hashes; the k-th smallest pins the hash density, est =
    (k−1)·H/h₍ₖ₎ over hash space H = 2^60. Groups with fewer than k
    distinct values report their exact count (the sketch is exact below
    its capacity — the standard KMV contract).

    Output: (group, n_exact, kmv_estimate, rel_error). Expected
    relative error ≈ 1/√(k−2) ≈ 12.6 % at k=64.
    """
    ranked = kmv_bottom_k(df, group_col, value_col, k)
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("kth"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << HASH_BITS)) / F.col("kth")
    )
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(value_col).alias("n_exact")
    )
    return (
        agg.select("grp", F.round(est, 2).alias("kmv_estimate"))
        .join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            "kmv_estimate",
            F.round(
                F.abs(F.col("kmv_estimate") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ).alias("rel_error"),
        )
        .transform(lambda d: small_sort(d, group_col) if sort else d)
    )


def cms_buckets(
    df: DataFrame,
    value_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """The Count-Min sketch STATE as a relation: (d, bucket, cnt) for
    ``depth`` independent hash rows of ``width`` buckets (Cormode &
    Muthukrishnan 2005). Like the HLL register table, the state is
    mergeable by ``sum`` groupBy — partial sketches from partitions /
    days / streams union without re-reading raw data, which is the
    whole 100 TB story: frequency-estimate a trillion rows with
    depth×width counters. With ``weight_col`` the counters accumulate
    ``sum(weight)`` instead of row counts (the weighted sketch) — ONE
    copy of the hash family serves both.

    Hash row d uses md5_long('cms<d>:' || value) % width — pure integer
    column algebra, bit-identical in DuckDB. NULL values are ignored
    (the countDistinct convention of the sketch family): a NULL hashes
    to NULL and would otherwise count into a phantom NULL bucket.
    """
    rows = F.explode(
        F.array(*[F.lit(d) for d in range(depth)])
    ).alias("d")
    df = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("string")
    cols = [v.alias("v")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("w"))
    keyed = (
        df.select(*cols)
        .select("*", rows)
        .select(
            "d",
            F.pmod(
                md5_long(F.concat(F.lit("cms"), F.col("d").cast("string"), F.lit(":"), F.col("v"))),
                F.lit(width),
            ).alias("bucket"),
            *([F.col("w")] if weight_col is not None else []),
        )
        .groupBy("d", "bucket")
    )
    if weight_col is not None:
        return keyed.agg(F.sum("w").alias("cnt"))
    return keyed.agg(F.count(F.lit(1)).alias("cnt"))


def cms_freq_estimate(
    df: DataFrame,
    value_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
    top_n: int = 20,
    sort: bool = True,
) -> DataFrame:
    """Count-Min frequency estimates for the top-N heaviest items, with
    the exact count alongside (the output doubles as the sketch's own
    accuracy report — CMS guarantees estimate ≥ exact, overestimate ≤
    εN with ε = e/width at the chosen failure probability).

    estimate(v) = min over d of sketch[d][hash_d(v)]; the min over
    depth rows bounds collision inflation.

    Output: (item, n_exact, cms_estimate, overestimate).

    100 TB shape: the sketch build is ONE partial-agg groupBy over
    (d, bucket) — depth×width counters total; the exact side here is
    report-only (a second groupBy on the value) and is what a sketch
    deployment drops.
    """
    # exact side ignores NULLs exactly like the sketch build does
    # (cms_buckets filters them) — a NULL group could otherwise enter
    # the top-N and probe a phantom bucket
    df = df.filter(F.col(value_col).isNotNull())
    sketch = cms_buckets(df, value_col, depth, width)
    exact = (
        df.select(F.col(value_col).cast("string").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return cms_estimate_from_sketch(sketch, exact, depth, width, top_n, sort)


def cms_weighted(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    depth: int = 4,
    width: int = 256,
    top_n: int = 20,
    sort: bool = True,
) -> DataFrame:
    """WEIGHTED Count-Min: counters accumulate ``sum(weight)`` instead
    of row counts, estimating each item's total non-negative weight —
    the token/byte-weighted corpus statistic a curation pipeline needs
    ("which items contribute the most tokens", not "which appear most
    often"). Same hash family and min-over-depth estimator as the
    unweighted sketch (one copy — ``cms_estimate_from_sketch``); the
    CMS guarantee estimate ≥ exact holds because weights are ≥ 0, and
    the counter relation still merges by ``sum`` across partitions /
    days / streams.

    Output: (item, w_exact, w_estimate, overestimate).

    100 TB shape: identical to ``cms_freq_estimate`` — the build is
    ONE partial-agg groupBy to depth×width counters; the exact side is
    the report-only accuracy column.
    """
    # exact side ignores NULLs like the sketch build (cms_buckets)
    df = df.filter(F.col(value_col).isNotNull())
    sketch = cms_buckets(df, value_col, depth, width, weight_col=weight_col)
    exact = (
        df.select(
            F.col(value_col).cast("string").alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .groupBy("v")
        .agg(F.sum("w").alias("n_exact"))
    )
    out = cms_estimate_from_sketch(
        sketch, exact, depth, width, top_n, sort=False
    ).select(
        "item",
        F.col("n_exact").alias("w_exact"),
        F.col("cms_estimate").alias("w_estimate"),
        "overestimate",
    )
    return small_sort(out, "item") if sort else out


def cms_estimate_from_sketch(
    sketch: DataFrame,
    exact: DataFrame,
    depth: int = 4,
    width: int = 256,
    top_n: int = 20,
    sort: bool = True,
) -> DataFrame:
    """The CMS probe/estimate step over a PREBUILT counter relation —
    shared by the batch sketch and the streaming drain (the hash family
    and min-over-depth closed form must stay in lockstep with the
    DuckDB oracle; one copy, not two). ``sketch`` is (d, bucket, cnt);
    ``exact`` is (v, n_exact) and supplies the top-N probe targets.
    """
    # TakeOrderedAndProject (orderBy+limit), not a single-partition rank
    # window — the heavy-hitter report stays distributed at any |items|.
    top = exact.orderBy(F.desc("n_exact"), F.col("v")).limit(top_n)
    probes = top.select(
        "v",
        "n_exact",
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    ).select(
        "v",
        "n_exact",
        "d",
        F.pmod(
            md5_long(F.concat(F.lit("cms"), F.col("d").cast("string"), F.lit(":"), F.col("v"))),
            F.lit(width),
        ).alias("bucket"),
    )
    # LEFT join + coalesce(cnt, 0): a probe whose bucket rows are absent
    # from the sketch (possible when sketch and probes come from
    # different inputs, e.g. a partially drained stream) must report
    # estimate 0, not silently vanish from the report.
    est = (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
        .groupBy("v", "n_exact")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    out = est.select(
        F.col("v").alias("item"),
        "n_exact",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n_exact")).alias("overestimate"),
    )
    return small_sort(out, "item") if sort else out


def overlap_kmv(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 64,
    sort: bool = True,
) -> DataFrame:
    """KMV set ALGEBRA between groups (Beyer et al. 2007): estimated
    union size and Jaccard overlap of every group pair's distinct-value
    sets, computed from the per-group bottom-k sketches alone — with
    the exact numbers alongside as the accuracy report.

    The property that makes this scale: bottomk(A ∪ B) ⊆ bottomk(A) ∪
    bottomk(B), and for any h ≤ kth(A ∪ B) ≤ kth(A): h ∈ A ⟺
    h ∈ bottomk(A). So union/intersection estimates for EVERY pair are
    computed from |groups| × k sketch rows — the raw values are
    scanned exactly once to build the sketches, and the pairwise
    algebra never touches them again. That is the 100 TB story:
    per-source/day sketches persist at KB scale and answer overlap
    questions later without re-reading data. Pairs with union < k are
    EXACT (the sketch holds the whole set — standard KMV contract).

    Estimates: est_union = (k−1)·H/h₍ₖ₎; jaccard_est = |bottomk(A∪B) ∩
    A ∩ B| / k (ρ of the union sketch).

    Output: (grp_a, grp_b, n_union_exact, union_est, jaccard_exact,
    jaccard_est).
    """
    hashes = distinct_hash_relation(df, group_col, value_col)
    # per-group bottom-k sketch (salted two-phase, the KMV discipline —
    # one shared copy with approx_distinct_kmv)
    sketch = kmv_bottom_k_from_hashes(hashes, k).select("grp", "h")
    groups = sketch.select("grp").distinct()
    gpairs = (
        groups.alias("ga")
        .join(groups.alias("gb"), F.col("ga.grp") < F.col("gb.grp"))
        .select(F.col("ga.grp").alias("grp_a"), F.col("gb.grp").alias("grp_b"))
    )
    # pair × sketch-union relation: ≤ 2k rows per pair
    pa = gpairs.join(
        sketch.select(F.col("grp").alias("grp_a"), "h"), "grp_a"
    ).select("grp_a", "grp_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    pb = gpairs.join(
        sketch.select(F.col("grp").alias("grp_b"), "h"), "grp_b"
    ).select("grp_a", "grp_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    uni = (
        pa.unionByName(pb)
        .groupBy("grp_a", "grp_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wu = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    topk = uni.withColumn("rk", F.row_number().over(wu)).filter(F.col("rk") <= k)
    agg = topk.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("kth"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")).alias(
            "n_both"
        ),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(1 << HASH_BITS)) / F.col("kth"))
    jacc_est = F.col("n_both") / F.col("n_kept")
    # exact side (report-only): full distinct sets per pair
    ea = gpairs.join(
        hashes.select(F.col("grp").alias("grp_a"), "h"), "grp_a"
    ).select("grp_a", "grp_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    eb = gpairs.join(
        hashes.select(F.col("grp").alias("grp_b"), "h"), "grp_b"
    ).select("grp_a", "grp_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    ex = (
        ea.unionByName(eb)
        .groupBy("grp_a", "grp_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .groupBy("grp_a", "grp_b")
        .agg(
            F.count(F.lit(1)).alias("n_union_exact"),
            F.sum(
                ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")
            ).alias("n_inter_exact"),
        )
    )
    out = (
        agg.join(ex, ["grp_a", "grp_b"])
        .select(
            "grp_a",
            "grp_b",
            "n_union_exact",
            F.round(union_est, 2).alias("union_est"),
            F.round(
                F.col("n_inter_exact") / F.col("n_union_exact"), 4
            ).alias("jaccard_exact"),
            F.round(jacc_est, 4).alias("jaccard_est"),
        )
    )
    return small_sort(out, "grp_a", "grp_b") if sort else out


def _octave_keys(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int,
    extra: dict | None = None,
) -> DataFrame:
    """Per-row sign × octave × sub-bit keys (grp, s, o, b [, extra…]) —
    the shared bin algebra of the quantile-sketch family. ``extra`` maps
    output name → source expression (evaluated against ``df``, carried
    through by name). Pure integer column expressions, bit-identical in
    DuckDB (see quantile_sketch)."""
    grp = F.col(group_col)
    v = F.col(value_col)
    extra = dict(extra or {})  # name -> expr, applied in the FIRST select
    names = [F.col(nm) for nm in extra]
    # NULL values are ignored (the countDistinct convention all sketch
    # ops follow): floor(NULL·scale) is NULL, which would otherwise
    # produce a (s=1, o=NULL, b=0) phantom bin that inflates n and
    # sorts NULLS FIRST into every cumulative sum.
    df = df.filter(v.isNotNull())
    scaled = F.floor(v * F.lit(float(scale)))  # long
    return (
        df.select(
            grp.alias("grp"),
            F.when(scaled < 0, F.lit(-1)).otherwise(F.lit(1)).alias("s"),
            F.abs(scaled).alias("a"),
            *[expr.alias(nm) for nm, expr in extra.items()],
        )
        .select(
            "grp",
            "s",
            F.when(F.col("a") == 0, F.lit(0))
            .otherwise(F.length(F.bin(F.col("a"))))
            .cast("long")
            .alias("o"),
            "a",
            *names,
        )
        .select(
            "grp",
            "s",
            "o",
            F.when(
                F.col("o") >= 2,
                F.expr("shiftright(a, cast(o - 2 as int)) % 2"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("b"),
            *names,
        )
    )


def _bin_key_col():
    return (F.col("s") * (F.col("o") * 2 + F.col("b"))).alias("bin_key")


def _bin_mid_col(scale: int):
    return (
        (
            F.when(F.col("o") == 0, F.lit(0.0))
            .when(F.col("o") == 1, F.col("s").cast("double"))
            .otherwise(
                F.col("s")
                * (
                    F.pow(F.lit(2.0), F.col("o") - 1)
                    + F.col("b") * F.pow(F.lit(2.0), F.col("o") - 2)
                    + F.pow(F.lit(2.0), F.col("o") - 2) / 2
                )
            )
        )
        / F.lit(float(scale))
    ).alias("mid")


def quantile_estimate_from_bins(
    sk: DataFrame, qs: tuple, scale: int
) -> DataFrame:
    """(grp, s, o, b, cnt) octave-bin relation → (grp, q, n, r,
    est_raw): the ONE copy of the bin-navigate estimate shared by the
    batch :func:`quantile_sketch` and the drained streaming bins
    (stream_quantile) — the relation merges by ``sum`` so the same
    closed form reads either source. The pick windows run over the
    ≤256-bin relation, never values."""
    bin_key = _bin_key_col()
    mid = _bin_mid_col(scale)
    wcum = Window.partitionBy("grp").orderBy("bin_key")
    cum = sk.select("grp", "cnt", bin_key, mid).withColumn(
        "cum", F.sum("cnt").over(wcum)
    )
    qrows = (
        sk.groupBy("grp")
        .agg(F.sum("cnt").alias("n"))
        .select(
            "grp",
            "n",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        )
        .withColumn("r", F.ceil(F.col("q") * F.col("n")).cast("long"))
    )
    return (
        qrows.join(F.broadcast(cum), "grp")
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("grp", "q", "n", "r")
        .agg(F.min_by("mid", "bin_key").alias("est_raw"))
    )


def quantile_sketch(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    qs: tuple = (0.5, 0.9, 0.99),
    scale: int = 1000,
    sort: bool = True,
) -> DataFrame:
    """Mergeable QUANTILE sketch — the fifth classical sketch family
    beside HLL/KMV/CMS/Bloom: a sign × octave × second-bit histogram
    (≤ ~256 bins per group for the whole int64 domain, ≤ 25% relative
    bin half-width) whose counter relation merges by ``sum`` exactly
    like the CMS state. Per (group, q) the sketch's bin-midpoint
    estimate is reported with the EXACT rank-``ceil(q·n)`` value
    alongside — like the other sketch ops, the output doubles as the
    sketch's own accuracy report, and the exact side is what a
    production deployment drops.

    Bin rule is pure integer algebra, bit-identical in DuckDB:
    ``a = |floor(v·scale)|``; octave ``o = length(bin(a))`` (0 for
    a=0 — the HLL leading-zero trick, no float log2 boundary hazard);
    sub-bit ``b = (a >> (o-2)) & 1``. For o ≥ 2 the bin
    [2^(o-1)+b·2^(o-2), +2^(o-2)) has relative width ≤ 1/2, so the
    midpoint estimate is within 25% of any value in it. The ≤25%
    bound therefore holds for |floor(v·scale)| ≥ 2; the single o=1
    bin [1/scale, 2/scale) has no sub-bit and reports its low edge
    (s·1/scale), whose relative error approaches 50% as v → 2/scale
    — values within 2/scale of zero sit below the sketch's
    resolution floor by construction. Estimate = midpoint of the
    first bin (ascending signed bin key) whose cumulative count
    reaches the target rank.

    100 TB shape: the sketch build is ONE partial-agg groupBy over
    (group, sign, octave, sub) — the shuffle carries bins, never
    values; the pick windows run over the ≤256-bin relation. The
    report-only exact side is TWO-PHASE (no per-group sort of raw
    values): a fine histogram at the sketch's own 1/scale resolution
    (partial-agg groupBy; relation size is value-DOMAIN-bound, not
    row-count-bound) locates the one bucket containing each target
    rank, then ``row_number`` runs only over the rows inside a target
    bucket — the grouped_topk_per_source survivors discipline.

    Output: (``group_col``, q, n, sketch_est, exact_val, abs_err).
    """
    grp = F.col(group_col)
    v = F.col(value_col)
    # exact side must ignore NULLs exactly like the bin side
    # (_octave_keys filters them) or n and the histogram diverge
    df = df.filter(v.isNotNull())
    scaled = F.floor(v * F.lit(float(scale)))  # long
    keys = _octave_keys(df, group_col, value_col, scale)
    sk = keys.groupBy("grp", "s", "o", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    est = quantile_estimate_from_bins(sk, qs, scale)
    qrows = est.select("grp", "q", "n", "r")
    # exact side, phase 1: fine histogram at 1/scale resolution,
    # cumulated per group to find, for each rank r, its one bucket and
    # the count strictly before that bucket.
    hist = (
        df.select(grp.alias("grp"), scaled.alias("k"))
        .groupBy("grp", "k")
        .agg(F.count(F.lit(1)).alias("kcnt"))
    )
    wk = Window.partitionBy("grp").orderBy("k")
    hcum = hist.withColumn("kcum", F.sum("kcnt").over(wk))
    tgt = (
        qrows.join(hcum, "grp")
        .filter(F.col("kcum") >= F.col("r"))
        .groupBy("grp", "q", "r")
        .agg(F.min_by(F.struct("k", "kcnt", "kcum"), "k").alias("t"))
        .select(
            "grp",
            "q",
            "r",
            F.col("t.k").alias("k"),
            (F.col("t.kcum") - F.col("t.kcnt")).alias("cum_before"),
        )
    )
    # phase 2: rank ONLY the survivors inside a target bucket (per
    # (grp, q) at most one bucket's rows — never the whole group).
    surv = df.select(grp.alias("grp"), v.alias("val"), scaled.alias("k")).join(
        F.broadcast(tgt), ["grp", "k"]
    )
    wq = Window.partitionBy("grp", "q").orderBy("val")
    exact = (
        surv.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == F.col("r") - F.col("cum_before"))
        .select("grp", "q", F.col("val").alias("exact_raw"))
    )
    out = (
        est.join(exact, ["grp", "q"])
        .select(
            F.col("grp").alias(group_col),
            "q",
            "n",
            F.round("est_raw", 4).alias("sketch_est"),
            F.round("exact_raw", 4).alias("exact_val"),
            F.round(F.abs(F.col("est_raw") - F.col("exact_raw")), 4).alias(
                "abs_err"
            ),
        )
    )
    return small_sort(out, group_col, "q") if sort else out


def quantile_sketch_weighted(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    scale: int = 1,
    sort: bool = True,
) -> DataFrame:
    """WEIGHTED quantile sketch: the q-quantile is the smallest value v
    with cumulative WEIGHT(values ≤ v) ≥ ceil(q·W) — e.g. "the document
    length below which half the corpus TOKENS lie", the token-weighted
    statistic that drives packing/budget decisions (an unweighted doc
    median badly misstates where the token mass sits).

    Same sign × octave × sub-bit bins as :func:`quantile_sketch` (one
    copy of the bin algebra — ``_octave_keys``); the counters are
    ``sum(weight)`` so the state stays a ≤ ~256-bins-per-group relation
    that merges by ``sum``, and the same o ≥ 2 ≤ 25% bound applies to
    the estimate. Non-negative integer weights required (rank
    arithmetic stays exact cross-engine).

    Exact side (report-only) is the same two-phase navigate-then-
    survivors shape as the unweighted sketch, with RANGE-frame running
    weights: cumulative-at-v includes ALL ties of v in both engines,
    so the pick ``min(v) where cum ≥ r`` is deterministic without a
    tie-break column.

    Output: (``group_col``, q, w_total, sketch_est, exact_val, abs_err).
    """
    grp = F.col(group_col)
    v = F.col(value_col)
    w = F.col(weight_col).cast("long")
    # NULL values/weights are ignored (the countDistinct convention;
    # _octave_keys also drops NULL values for the bin side)
    df = df.filter(v.isNotNull() & F.col(weight_col).isNotNull())
    scaled = F.floor(v * F.lit(float(scale)))  # long
    keys = _octave_keys(df, group_col, value_col, scale, extra={"w": w})
    sk = keys.groupBy("grp", "s", "o", "b").agg(F.sum("w").alias("cnt"))
    # the shared bin-navigate estimate (ONE copy — see
    # quantile_estimate_from_bins); its n IS the total weight here
    est = quantile_estimate_from_bins(sk, qs, scale).withColumnRenamed(
        "n", "w_total"
    )
    qrows = est.select("grp", "q", "w_total", "r")
    # exact side, two-phase (see quantile_sketch): fine weight histogram
    # at 1/scale resolution locates each rank's bucket …
    hist = (
        df.select(grp.alias("grp"), scaled.alias("k"), w.alias("w"))
        .groupBy("grp", "k")
        .agg(F.sum("w").alias("kw"))
    )
    wk = Window.partitionBy("grp").orderBy("k")
    hcum = hist.withColumn("kcum", F.sum("kw").over(wk))
    tgt = (
        qrows.join(hcum, "grp")
        .filter(F.col("kcum") >= F.col("r"))
        .groupBy("grp", "q", "r")
        .agg(F.min_by(F.struct("k", "kw", "kcum"), "k").alias("t"))
        .select(
            "grp",
            "q",
            "r",
            F.col("t.k").alias("k"),
            (F.col("t.kcum") - F.col("t.kw")).alias("cum_before"),
        )
    )
    # … then only the in-bucket survivors carry a running RANGE-frame
    # weight; min(val) over the qualifying suffix is the exact quantile.
    surv = df.select(
        grp.alias("grp"), v.alias("val"), scaled.alias("k"), w.alias("w")
    ).join(F.broadcast(tgt), ["grp", "k"])
    wq = Window.partitionBy("grp", "q").orderBy("val")
    exact = (
        surv.withColumn("cw", F.sum("w").over(wq))
        .filter(F.col("cum_before") + F.col("cw") >= F.col("r"))
        .groupBy("grp", "q")
        .agg(F.min("val").alias("exact_raw"))
    )
    out = est.join(exact, ["grp", "q"]).select(
        F.col("grp").alias(group_col),
        "q",
        "w_total",
        F.round("est_raw", 4).alias("sketch_est"),
        F.round(F.col("exact_raw").cast("double"), 4).alias("exact_val"),
        F.round(
            F.abs(F.col("est_raw") - F.col("exact_raw")), 4
        ).alias("abs_err"),
    )
    return small_sort(out, group_col, "q") if sort else out
