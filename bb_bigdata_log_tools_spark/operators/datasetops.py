"""Dataset-layout and corpus-reporting operators: deterministic
training-shard shuffling, per-source dataset statistics, and
domain-blocklist filtering.

These cover the last mile of a training-data pipeline (after dedup /
quality filtering / packing): laying documents out into shuffled
shards for the trainer, reporting per-source composition for mixture
decisions, and enforcing a domain blocklist.

Scale notes (100 TB):
- ``shuffle_shards`` replaces the classic "global random shuffle"
  (a full sort by rand() — one giant range shuffle) with a hash
  shard assignment + per-shard ordering key. The only exchange is
  the hash partition on ``shard`` that shard-writing needs anyway,
  and the per-shard sort is the write-time sort. Deterministic
  (md5-keyed), so re-runs and retries produce bit-identical shards.
- ``dataset_stats`` is one groupBy(source) with map-side partial
  aggregation for the sums/counts. The exact median is the one
  non-partial aggregate; swap ``F.percentile`` for
  ``F.percentile_approx`` at petabyte scale (noted inline).
- ``filter_blocklist`` with a literal blocklist is a pure
  scan-parallel filter (zero shuffle, zero join); the DataFrame
  variant broadcasts the blocklist so the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.functions.hashing import md5_long
from bb_bigdata_log_tools_spark.operators.curation import url_extract
from bb_bigdata_log_tools_spark.operators.util import small_sort


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 32,
    key_col: str = "doc_id",
    sort: bool = True,
) -> DataFrame:
    """Deterministic training-shard assignment and intra-shard order.

    ``shard = md5("shard:" + key) mod n_shards`` spreads documents
    uniformly; ``shard_pos`` orders each shard by an independent md5
    draw, so the concatenation of shards is a reproducible global
    pseudorandom permutation of the corpus — the property trainers
    need from "shuffle the dataset" without a full sort-by-rand()
    range shuffle. Writing is then ``repartition(n_shards, shard)``
    + ``sortWithinPartitions(shard_pos)``; the window below is that
    same exchange+sort expressed as a query.

    Per-shard parallelism is 1 task, which matches the one-file-per-
    shard write target; pick ``n_shards`` ≳ executor count.
    """
    key = F.col(key_col).cast("string")
    shard = F.pmod(
        md5_long(F.concat(F.lit("shard:"), key)), F.lit(n_shards)
    ).cast("int")
    pos_key = md5_long(F.concat(F.lit("pos:"), key))
    w = Window.partitionBy("shard").orderBy("pos_key", key_col)
    return (
        df.select(key_col, shard.alias("shard"), pos_key.alias("pos_key"))
        .withColumn("shard_pos", F.row_number().over(w))
        .select(key_col, "shard", "shard_pos")
        .transform(
            lambda d: small_sort(d, "shard", "shard_pos") if sort else d
        )
    )


def dataset_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    chars_col: str = "n_chars",
    sort: bool = True,
) -> DataFrame:
    """Per-source corpus composition report: document/char/token
    totals, language spread, and the mean/median/max document length
    — the input to domain-mixture and re-weighting decisions.

    One groupBy with map-side partial aggregation; the exact median
    (``F.percentile``) is the only holistic aggregate — at petabyte
    scale substitute ``F.percentile_approx`` (t-digest sketch, fully
    partial) at the cost of oracle exactness.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    per_doc = df.select(
        group_col,
        "lang",
        F.col(chars_col).alias("doc_chars"),
        F.size(toks).alias("doc_tokens"),
    )
    return (
        per_doc.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_chars").alias("total_chars"),
            F.sum("doc_tokens").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(F.avg("doc_chars"), 2).alias("mean_chars"),
            F.round(F.percentile("doc_chars", F.lit(0.5)), 2).alias(
                "median_chars"
            ),
            F.max("doc_chars").alias("max_chars"),
        )
        .transform(lambda d: small_sort(d, group_col) if sort else d)
    )


def filter_blocklist(
    df: DataFrame,
    blocklist: list[str] | DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Drop documents that link to any blocklisted domain.

    A ``list`` blocklist is inlined as a literal array —
    ``arrays_overlap`` makes the whole operator a scan-parallel
    filter with zero shuffle (the right shape for the usual few-
    thousand-entry blocklist). A ``DataFrame`` blocklist (column
    ``domain``) is broadcast and anti-joined on an
    ``array_contains`` condition, so the corpus side still never
    shuffles; use this for multi-million-row blocklists that should
    not be embedded in the plan.

    Output: the surviving documents plus ``n_urls`` (and the
    extracted ``domains`` dropped — they were only needed for the
    check).
    """
    docs = url_extract(df, text_col)
    if isinstance(blocklist, DataFrame):
        out = docs.join(
            F.broadcast(blocklist),
            F.array_contains(F.col("domains"), F.col("domain")),
            "left_anti",
        )
    else:
        lits = F.array(*[F.lit(d.lower()) for d in blocklist])
        out = docs.filter(~F.arrays_overlap(F.col("domains"), lits))
    return out.drop("domains")


def length_histogram(
    df: DataFrame,
    text_col: str = "text",
    bin_width: int = 20,
    sort: bool = True,
) -> DataFrame:
    """Token-length histogram of the corpus: fixed-width bins over the
    per-document whitespace token count, with doc counts and the share
    of total documents per bin — the standard pre-training length
    profile (truncation/padding budgeting, outlier spotting).

    One scan + one tiny groupBy(bin): the shuffle carries |bins| rows.
    The total-docs scalar joins back by broadcast (1-row cross join),
    so share is computed without a second corpus pass.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    binned = df.select(
        (F.floor(F.size(toks) / bin_width) * bin_width)
        .cast("long")
        .alias("bin_start")
    )
    # |bins| rows; checkpoint so the total-docs scalar and the join both
    # reuse ONE corpus aggregation instead of re-scanning per branch.
    hist = (
        binned.groupBy("bin_start")
        .agg(F.count("*").alias("n_docs"))
        .localCheckpoint()
    )
    total = hist.agg(F.sum("n_docs").alias("total"))
    return (
        hist.join(F.broadcast(total))
        .select(
            "bin_start",
            "n_docs",
            F.round(F.col("n_docs") / F.col("total"), 4).alias("share"),
        )
        .transform(lambda d: small_sort(d, "bin_start") if sort else d)
    )


def split_assign(
    df: DataFrame,
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    key_col: str = "doc_id",
    stratify_col: str = "source",
) -> DataFrame:
    """Deterministic stratified train/val/test assignment.

    The md5 bucket is salted with the stratum, so each source
    contributes ~``val_frac``/``test_frac`` of ITS documents to each
    holdout (per-stratum independence — the same property the
    samplers use); keying on content-independent ids keeps the split
    stable across re-runs, engines, and corpus growth (a document
    never migrates between splits when other documents are added).

    One scan, zero shuffle — the split column is pure hash algebra.
    """
    denom = 1_000_000
    bucket = F.pmod(
        md5_long(
            F.concat_ws(
                ":",
                F.lit("split"),
                F.col(stratify_col),
                F.col(key_col).cast("string"),
            )
        ),
        F.lit(denom),
    )
    val_cut = int(val_frac * denom)
    test_cut = val_cut + int(test_frac * denom)
    split = (
        F.when(bucket < val_cut, F.lit("val"))
        .when(bucket < test_cut, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def events_path_transitions(
    events: DataFrame, min_count: int = 1, sort: bool = True
) -> DataFrame:
    """First-order user-journey transition matrix: for consecutive
    events of each user (ordered by ``ts``, ``event_id`` as the
    deterministic tiebreak), count (prev_type → next_type) transitions
    and the within-prev-type probability.

    One shuffle partitions by user (the lag window), then the
    transition counts reduce map-side into at most |types|² rows; the
    per-prev-type totals come from a second window over that tiny
    aggregate, not a second pass over events.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("prev_type")
    return (
        pairs.withColumn(
            "prob", F.round(F.col("n") / F.sum("n").over(wt), 4)
        )
        .filter(F.col("n") >= min_count)
        .transform(
            lambda d: small_sort(d, "prev_type", "next_type") if sort else d
        )
    )


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column data-quality profile: null count, exact distinct
    count, min/max (native-typed, then stringified), and mean
    stringified length — the schema-audit pass a pipeline runs before
    trusting a new drop of data.

    ONE scan computes every per-column aggregate in a single
    partial-aggregable ``agg`` (count_distinct is the only
    shuffle-heavy term; at petabyte scale swap
    ``approx_count_distinct`` — HLL, fully map-side); the wide 1-row
    result is unpivoted driver-side into |columns| rows via ``stack``,
    which touches no data.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.round(F.avg(F.length(F.col(c).cast("string"))), 4).alias(
                f"{c}__avg_len"
            ),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max, {c}__avg_len"
        for c in cols
    )
    return (
        wide.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value, avg_len)"
        )
        .orderBy("column_name")
    )


def _interleave_bits(x, y, bits: int = 16):
    """Morton/Z-order interleave of two non-negative ints (x even bits,
    y odd bits) as a fold of codegen shift/mask expressions — no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(
    events: DataFrame,
    n_buckets: int = 64,
    bits: int = 8,
) -> DataFrame:
    """Z-order (Morton-curve) layout audit over (user_id, hour): assign
    every row the bucket its interleaved-bit sort key falls into and
    report each bucket's span in BOTH dimensions — the data-skipping
    argument for multi-column clustered writes (a reader filtering on
    either user OR time prunes most buckets, which a single-column sort
    can only offer for its leading column).

    The z-value is a pure codegen shift/mask fold (no UDF, no shuffle);
    the only exchange is the |buckets|-row aggregate. A production
    writer would ``repartitionByRange(z)`` + sortWithinPartitions(z) to
    materialize this layout; the audit here is engine-checkable: bucket
    spans are deterministic integer arithmetic in any SQL engine. Both
    dimensions are linearly rescaled into the ``bits``-wide coordinate
    range against broadcast min/max scalars (a global min/max window
    would funnel the corpus through one partition), so bucket occupancy
    is non-trivial at every data scale; integer ``div`` keeps the
    rescale bit-exact cross-engine.
    """
    hour = F.floor(F.unix_millis(F.col("ts")) / F.lit(3_600_000))
    base = events.select(F.col("user_id").cast("long").alias("uid"), hour.alias("h"))
    bounds = base.agg(
        F.min("uid").alias("u0"),
        F.max("uid").alias("u1"),
        F.min("h").alias("h0"),
        F.max("h").alias("h1"),
    )
    side = 1 << bits

    def _scaled(col: str, lo: str, hi: str):
        return F.expr(f"(({col} - {lo}) * {side}) div ({hi} - {lo} + 1)")

    shift = 2 * bits - max(n_buckets - 1, 1).bit_length()
    scaled = base.join(F.broadcast(bounds)).select(
        "uid",
        (F.col("h") - F.col("h0")).alias("hrel"),
        _scaled("uid", "u0", "u1").alias("ux"),
        _scaled("h", "h0", "h1").alias("hx"),
    )
    return (
        scaled.select(
            "uid", "hrel",
            _interleave_bits(F.col("ux"), F.col("hx"), bits).alias("z"),
        )
        .groupBy(F.shiftright(F.col("z"), shift).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("uid").alias("min_user"),
            F.max("uid").alias("max_user"),
            F.min("hrel").alias("min_hour"),
            F.max("hrel").alias("max_hour"),
        )
        .orderBy("z_bucket")
    )


def compaction_plan(
    events: DataFrame,
    target_bytes: int = 1_000_000,
) -> DataFrame:
    """Small-file compaction planning over hourly log partitions: size
    each hour (lines, message bytes), then bin consecutive hours into
    merge groups of ~``target_bytes`` via a running-total prefix sum —
    the LogMaintenance filemerge planner re-expressed as a query
    (reference: LogMaintenance.java merge sweep; FileManager.java moves).

    The corpus pays ONE groupBy(hour) with map-side partials; the
    prefix-sum window runs over the tiny |hours|-row relation (a global
    window there is deliberate and bounded — same reasoning as
    events_hourly_anomaly). A group's id is the bin its STARTING byte
    offset falls in, so groups are contiguous, deterministic, and
    re-derivable incrementally.
    """
    hours = (
        events.select(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.octet_length(
                F.concat(
                    F.col("event_type"),
                    F.lit(" "),
                    F.coalesce(F.col("props"), F.lit("")),
                )
            ).alias("b"),
        )
        .groupBy("hour_start")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.sum("b").alias("bytes"))
    )
    w = Window.orderBy("hour_start").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hours.withColumn("cum", F.sum("bytes").over(w))
        .withColumn(
            "merge_group",
            F.floor((F.col("cum") - F.col("bytes")) / F.lit(target_bytes)),
        )
        .groupBy("merge_group")
        .agg(
            F.min("hour_start").alias("first_hour"),
            F.max("hour_start").alias("last_hour"),
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("n_lines").alias("n_lines"),
            F.sum("bytes").alias("total_bytes"),
        )
        .orderBy("merge_group")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff: how many rows were added, removed, changed
    (same key, different content hash), or unchanged between two drops
    — the data-diff gate a pipeline runs before promoting a new crawl.

    One full outer join on the key comparing content md5s; the shuffle
    carries (key, hash) only — never the text — and the output is four
    summary rows, so the op is join-bounded at any corpus size.
    """
    o = old.select(
        F.col(key_col).alias("k"), F.md5(F.col(text_col)).alias("h_old")
    )
    n = new.select(
        F.col(key_col).alias("k"), F.md5(F.col(text_col)).alias("h_new")
    )
    status = (
        o.join(n, "k", "full_outer")
        .select(
            F.when(F.col("h_old").isNull(), "added")
            .when(F.col("h_new").isNull(), "removed")
            .when(F.col("h_old") != F.col("h_new"), "changed")
            .otherwise("unchanged")
            .alias("status")
        )
    )
    return (
        status.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


def grouped_topk(
    df: DataFrame,
    group_col: str = "source",
    order_col: str = "n_chars",
    tie_col: str = "doc_id",
    k: int = 5,
    salts: int = 8,
    sort: bool = True,
) -> DataFrame:
    """Exact top-k rows per group (largest ``order_col``, ties broken by
    ascending ``tie_col``) — the "best documents per source" selection a
    mixture builder runs before manual review.

    TWO-PHASE top-k: a single window over ``group_col`` sorts every
    group in one task, so one giant group (half the corpus from one
    crawl source) becomes one straggler sorting 50 TB. Phase 1 ranks
    within (group, ``tie_col % salts``) — each task sorts ≤ |group|/salts
    rows — and keeps k survivors per salt; phase 2 ranks the ≤ k·salts
    survivors per group exactly. The survivor superset provably contains
    the true top-k (any true top-k row is top-k within its own salt), so
    the result is identical to the one-window plan at any scale.
    """
    salt = F.pmod(F.col(tie_col), F.lit(salts))
    w1 = Window.partitionBy(group_col, salt.alias("salt")).orderBy(
        F.desc(order_col), F.asc(tie_col)
    )
    survivors = (
        df.select(group_col, order_col, tie_col)
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .drop("r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(tie_col))
    out = survivors.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )
    return small_sort(out, group_col, "rank") if sort else out


def shard_skew_report(
    df: DataFrame, n_shards: int = 32, key_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Layout QC for the shard assignment: per-shard row and byte-weight
    totals plus corpus-level skew statistics (max/mean ratios) — the
    check a pipeline runs BEFORE writing 10k shards, because one
    overweight shard becomes the straggler of every downstream epoch.
    Uses the same md5 shard hash as :func:`shuffle_shards`, so the
    report audits exactly the layout the writer would produce.

    Output: one row per shard + a 'TOTAL' row carrying the skew ratios
    (max_rows/mean_rows, max_weight/mean_weight).

    100 TB shape: one partial-agg groupBy on the shard id; the skew
    roll-up runs over the |shards|-row aggregate.
    """
    from bb_bigdata_log_tools_spark.functions.hashing import md5_long

    shard = F.pmod(
        md5_long(F.concat(F.lit("shard:"), F.col(key_col).cast("string"))),
        F.lit(n_shards),
    ).cast("int")
    per_shard = (
        df.select(shard.alias("shard"), F.col(weight_col).alias("w"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("w").alias("total_weight"),
        )
    )
    totals = per_shard.agg(
        F.lit(-1).cast("int").alias("shard"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("total_weight").alias("total_weight"),
        F.round(F.max("n_rows") / F.avg("n_rows"), 4).alias("row_skew"),
        F.round(F.max("total_weight") / F.avg("total_weight"), 4).alias(
            "weight_skew"
        ),
    )
    detail = per_shard.select(
        "shard", "n_rows", "total_weight",
        F.lit(None).cast("double").alias("row_skew"),
        F.lit(None).cast("double").alias("weight_skew"),
    )
    return detail.unionAll(totals).transform(lambda d: small_sort(d, "shard"))
