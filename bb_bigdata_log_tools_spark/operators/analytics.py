"""General analytics operators: TPC-H-style queries over the star schema
and windowed event analytics.

These prove the engine is a full query engine (joins, aggregation,
window functions), not just a scan-filter tool — the capability the
reference delegates to Pig. Join strategy notes:

- FIXED-cardinality dimensions (region=5, nation=25, supplier — sub-MB
  at any SF) are broadcast explicitly — no shuffle of the fact table for
  those joins;
- SF-SCALING relations (customer, anything derived from lineitem) are
  never force-broadcast: Catalyst size stats / AQE pick broadcast while
  they fit `autoBroadcastJoinThreshold` and degrade gracefully to a
  shuffle join at 100x scale instead of OOMing executors;
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key once and
  AQE coalesces post-shuffle partitions;
- top-k uses window rank bounded per partition (map-side partial sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators.util import small_sort


def tpch_q1(lineitem: DataFrame, ship_before: str = "1998-09-02") -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape on our schema)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_before).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def tpch_q3(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1996-03-15",
) -> DataFrame:
    """Shipping priority: 3-way join + agg + top-10.

    customer SCALES with SF (~150k rows x SF) so it is NOT force-broadcast:
    Catalyst/AQE picks broadcast while it fits `autoBroadcastJoinThreshold`
    and falls back to a shuffle join at large SF. orders⋈lineitem is the
    one guaranteed shuffle.
    """
    cut = F.lit(cutoff).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cut)
    li = lineitem.filter(F.col("l_shipdate") > cut)
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def tpch_q5(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """Local supplier volume: 6-way join, fixed dims broadcast, agg by nation.

    Join-strategy policy for 100 TB: only FIXED-cardinality dimensions
    (region=5, nation=25, supplier ~10k rows — all sub-MB at any SF) are
    force-broadcast. customer grows with scale factor (~15M rows at SF100),
    so its join is left to Catalyst/AQE: broadcast while under the size
    threshold, shuffle-hash/sort-merge beyond it — a forced broadcast there
    would OOM executors at 100x.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    reg = region.filter(F.col("r_name") == region_name)
    return (
        lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def events_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionize events per user with an inactivity gap: classic
    lag-window + cumulative-sum session ids, all JVM-side window exprs.

    One shuffle on user_id; at scale, pre-bucketing the events table by
    user_id makes this shuffle-free.
    """
    order_cols = ["ts"] + (["event_id"] if "event_id" in events.columns else [])
    w = Window.partitionBy("user_id").orderBy(*order_cols)
    gap_ms = gap_minutes * 60 * 1000
    with_gap = events.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)),
                F.lit(gap_ms + 1),
            )
            > gap_ms
        ).cast("int"),
    )
    sessions = with_gap.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def events_topk_users(events: DataFrame, k: int = 5) -> DataFrame:
    """Top-k users by total value within each event_type (window rank)."""
    totals = events.groupBy("event_type", "user_id").agg(
        F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("event_type", "rank")
    )


def tpch_q6(lineitem: DataFrame) -> DataFrame:
    """Forecasting revenue change: pure scan + filter + scalar agg —
    the no-shuffle-but-final-agg baseline (predicates all push down)."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


def tpch_q10(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """Returned-item reporting: join facts, broadcast fixed dims, top-k
    customers by lost revenue.

    nation (25 rows) is force-broadcast; customer scales with SF, so its
    join strategy is left to Catalyst/AQE (see tpch_q5 docstring).
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    li = lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def events_funnel(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """Ordered funnel: per user, did signup → click → purchase happen in
    that temporal order? Window min-timestamps per step, then ordering
    predicates — one shuffle on user_id."""
    steps = steps or ["signup", "click", "purchase"]
    firsts = (
        events.filter(F.col("event_type").isin(steps))
        .groupBy("user_id")
        .pivot("event_type", steps)
        .agg(F.min("ts"))
    )
    cond_reached = [F.col(steps[0]).isNotNull()]
    for prev, cur in zip(steps, steps[1:]):
        cond_reached.append(F.col(cur).isNotNull() & (F.col(cur) > F.col(prev)))
    out = firsts
    reached = None
    for i, c in enumerate(cond_reached):
        reached = c if reached is None else (reached & c)
        out = out.withColumn(f"reached_{steps[i]}", reached.cast("int"))
    return out.select(
        "user_id", *[f"reached_{s}" for s in steps]
    ).orderBy("user_id")


def tpch_q18(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
    k: int = 20,
) -> DataFrame:
    """Large-volume customer (TPC-H Q18 shape): HAVING-filtered semi-join.

    The inner aggregate (orders whose total quantity exceeds the
    threshold) semi-joins back against the facts. It is DERIVED FROM
    LINEITEM and therefore grows with data volume — no forced broadcast;
    AQE broadcasts it at runtime while the post-HAVING set is small and
    falls back to a shuffled join when it isn't. Both sides shuffle on
    l_orderkey/o_orderkey, so the joins reuse one co-partitioning.
    """
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        lineitem.join(big_orders.select("l_orderkey"), "l_orderkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(k)
    )


def events_moving_avg(events: DataFrame, window_minutes: int = 60) -> DataFrame:
    """Per-user trailing moving average of `value` over a TIME-RANGE
    window frame (RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW on
    the epoch-ms ordering) — the frame follows event time, not row
    count, so sparse and dense activity periods are treated alike."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-window_minutes * 60 * 1000, 0)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "value",
            F.round(F.avg("value").over(w), 4).alias("moving_avg"),
            F.count(F.lit(1)).over(w).alias("n_in_window"),
        )
        .orderBy("user_id", "ts_ms", "event_id")
    )


def text_ngram_counts(documents: DataFrame, n: int = 2, k: int = 50) -> DataFrame:
    """Corpus-wide top-k word n-grams: explode n-grams → count → rank.

    The canonical corpus statistic; partial aggregation makes the
    shuffle carry (ngram, partial count) pairs only.
    """
    words = F.split(F.col("text"), " ")
    count = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), count), lambda i: F.concat_ws(" ", F.slice(words, i, n))
    )
    return (
        documents.select(F.explode(grams).alias("ngram"))
        .filter(F.col("ngram") != "")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(k)
    )


def tpch_q4(orders: DataFrame, lineitem: DataFrame,
            date_from: str = "1996-01-01", date_to: str = "1997-01-01") -> DataFrame:
    """Order-priority checking (TPC-H Q4, adapted to the cut-down
    schema: the EXISTS predicate tests late shipment ``l_shipdate >
    o_orderdate`` since l_commitdate/l_receiptdate are absent).

    Shape: LEFT SEMI join — the lineitem side is reduced to the equi
    key + one comparison column before the shuffle, and the semi join
    emits each order at most once (no fan-out, no dedup pass). The
    groupBy is 5 groups — map-side partials collapse it.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    return (
        ords.join(
            lineitem.select("l_orderkey", "l_shipdate"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q7(lineitem: DataFrame, supplier: DataFrame, orders: DataFrame,
            customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Volume shipping (TPC-H Q7, adapted: no date window — the
    cut-down corpus keeps the year split; nations joined twice, supplier
    side and customer side, excluding intra-nation flows).

    Shape: nation (25 rows, fixed) broadcasts on BOTH sides; supplier /
    customer / orders scale with SF so their join strategy is left to
    Catalyst + AQE. Group keys are (nation, nation, year) — tiny agg.
    """
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q14(lineitem: DataFrame, part: DataFrame,
             date_from: str = "1996-01-01", date_to: str = "1996-02-01") -> DataFrame:
    """Promotion effect (TPC-H Q14, adapted: ``p_type = 'PROMO'`` exact
    match — the cut-down part table has single-word types).

    Shape: the lineitem side is date-pruned at the scan; part scales
    with SF so the join strategy stays with AQE; the result is one
    scalar from a conditional aggregate (no second pass).
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def tpch_q22(customer: DataFrame, orders: DataFrame, nation: DataFrame,
             inactive_since: str = "1999-01-01") -> DataFrame:
    """Global sales opportunity (TPC-H Q22, adapted: grouping is by
    nation — the cut-down schema has no phone country codes — and
    "no recent orders" replaces "no orders" so the result is non-empty
    on a corpus where every customer ordered at least once).

    Shape: the positive-balance average is one scalar broadcast back
    (cross join with a 1-row aggregate); the recent-orders side reduces
    to DISTINCT custkeys before a LEFT ANTI join; nation broadcasts.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit(inactive_since).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


def events_hourly_anomaly(
    events: DataFrame,
    trailing_hours: int = 24,
    min_history: int = 12,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Hourly ingest-volume anomaly detection per event type: z-score of
    each hour's count against the trailing ``trailing_hours`` hourly
    counts — the ops-facing "why did volume spike at 3am" question a
    log engine should answer natively.

    Hours with fewer than ``min_history`` trailing observations get a
    NULL z (insufficient baseline), as do zero-variance baselines.

    Scale shape: one shuffle down to (event_type × hour) counts —
    map-side partials make it scan-bound — then the window runs over
    that tiny aggregate relation partitioned by event_type (parallel
    across types, never over raw events).
    """
    hourly = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-trailing_hours, -1)
    )
    mean = F.avg("n_events").over(w)
    std = F.stddev_samp("n_events").over(w)
    hist = F.count(F.lit(1)).over(w)
    z = F.when(
        (hist >= min_history) & (std > 0), (F.col("n_events") - mean) / std
    )
    return (
        hourly.select(
            "event_type",
            "hour_ts",
            "n_events",
            F.round(z, 4).alias("z_score"),
            F.coalesce(F.abs(z) >= z_threshold, F.lit(False)).alias("anomalous"),
        )
        .orderBy("event_type", "hour_ts")
    )


def tpch_q21(supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
             late_days: int = 60, k: int = 10) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21, adapted: "late"
    means ``l_shipdate > o_orderdate + late_days`` — the cut-down
    schema has no commit/receipt dates — and the nation filter is
    dropped).

    Shape: the classic double-correlated subquery compiles to ONE
    LEFT SEMI (some other supplier exists on the order) plus ONE
    LEFT ANTI (no other supplier was also late) against the same
    slim (orderkey, suppkey, shipdate) projection — both joins carry
    the equi key, so they shuffle-partition on l_orderkey; no fan-out
    aggregation or distinct is needed anywhere.
    """
    deadline = F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    l1 = (
        lineitem.alias("l1")
        .join(orders, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l1.l_shipdate") > deadline)
        .select(
            F.col("l1.l_orderkey").alias("okey"),
            F.col("l1.l_suppkey").alias("skey"),
            deadline.alias("deadline"),
        )
    )
    others = lineitem.select(
        F.col("l_orderkey").alias("o2key"),
        F.col("l_suppkey").alias("s2key"),
        F.col("l_shipdate").alias("ship2"),
    )
    waited = (
        l1.join(
            others,
            (F.col("o2key") == F.col("okey")) & (F.col("s2key") != F.col("skey")),
            "left_semi",
        )
        .join(
            others,
            (F.col("o2key") == F.col("okey"))
            & (F.col("s2key") != F.col("skey"))
            & (F.col("ship2") > F.col("deadline")),
            "left_anti",
        )
    )
    return (
        waited.join(supplier, F.col("skey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def tpch_q12(lineitem: DataFrame, orders: DataFrame, late_days: int = 30) -> DataFrame:
    """Shipping priority audit (TPC-H Q12, adapted: the cut-down schema
    has no l_shipmode, so lines bucket into late/ontime by
    ``l_shipdate vs o_orderdate + late_days`` — same
    conditional-count-after-join shape).

    Shape: one fact-fact equi join on the order key, then conditional
    sums into a 2-row group — map-side partials collapse the shuffle to
    per-partition partial rows.
    """
    bucket = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"),
        F.lit("late"),
    ).otherwise(F.lit("ontime"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


def tpch_q13(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13): LEFT OUTER join
    keeps zero-order customers, then a DOUBLE aggregation — orders per
    customer, then customers per order count.

    Shape: both aggregations have map-side partials; the second runs
    over |customers| rows keyed by a small-cardinality count, so the
    histogram shuffle is trivial. No distinct, no window.
    """
    c_orders = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q15(supplier: DataFrame, lineitem: DataFrame,
             date_from: str = "1996-01-01", date_to: str = "1996-04-01") -> DataFrame:
    """Top supplier (TPC-H Q15): quarterly revenue view, then the
    supplier(s) achieving its maximum.

    Shape: one date-pruned scan aggregated to |suppliers| rows; the max
    is a 1-row aggregate broadcast back as an equality filter (no
    second scan of lineitem, no window over the full relation); the
    supplier join is an equi join on the supplier key. Revenue is
    rounded to 4dp BEFORE the max comparison on both engines so the
    equality is exact.
    """
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def tpch_q8(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_3",
    target_region: str = "ASIA",
    p_type: str = "ECONOMY",
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """National market share (TPC-H Q8, adapted: ``p_type`` is an exact
    single-word match on the cut-down part table; otherwise the full
    7-relation shape survives the schema cuts intact).

    Shape: orders is date-pruned at the scan and part type-pruned at the
    scan; both scale with SF so their joins stay with AQE. nation (25
    rows, used twice) and the region filter (1 row) are explicit
    broadcasts on the customer and supplier sides. Market share is a
    conditional-sum ratio inside ONE aggregation keyed by o_year — no
    second pass, map-side partials collapse the shuffle.
    """
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = region.filter(F.col("r_name") == target_region).select("r_regionkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(
            part.filter(F.col("p_type") == p_type).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == target_nation, vol).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q17(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#11",
    qty_factor: float = 0.2,
) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17, adapted: the cut-down
    part table has no ``p_container``, so the brand filter alone selects
    the part subset; the correlated avg-quantity shape is unchanged).

    Shape: the brand-filtered part subset (|parts|/25 rows) joins
    lineitem ONCE; the per-part 0.2·avg(quantity) threshold aggregates
    that same joined relation (map-side partials) and re-joins it by
    part key. Neither pass touches full lineitem twice, and no
    per-part correlated subquery executes per row — the decorrelated
    form Catalyst would also produce for the SQL.
    """
    li_p = lineitem.join(
        part.filter(F.col("p_brand") == brand).select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("p_partkey", "l_quantity", "l_extendedprice")
    thr = li_p.groupBy(F.col("p_partkey").alias("t_partkey")).agg(
        (F.lit(qty_factor) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li_p.join(thr, F.col("p_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def tpch_q19(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Discounted revenue (TPC-H Q19, adapted: the cut-down schema has
    no ``p_container``/``l_shipmode``/``l_shipinstruct``, so each of the
    three disjuncts pairs (p_brand, p_size band, l_quantity band) — the
    same OR-of-band-predicates shape).

    Shape: one equi join on the part key; the OR residual stays a
    codegen filter after the join, and Catalyst extracts the part-only
    disjunction (brand/size) down to the part scan, so the build side
    carries only candidate parts at any SF.
    """
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def events_retention(
    events: DataFrame, max_day_offset: int = 14, sort: bool = True
) -> DataFrame:
    """Cohort retention: users are cohorted by their first active day;
    each (cohort_day, day_offset) cell counts how many of that cohort
    were active ``day_offset`` days later, with the retention rate
    against the cohort's day-0 size.

    Plan: one distinct over (user_id, activity day) — the only
    corpus-sized shuffle, keyed on user_id so the min-day cohort
    window reuses the same partitioning — then a tiny
    (cohort, offset) aggregate and a broadcast join of the |days|-row
    cohort-size relation. At 100 TB the per-user state is two dates;
    nothing driver-side.
    """
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id")
    fact = days.withColumn("cohort_day", F.min("day").over(w)).withColumn(
        "day_offset", F.datediff(F.col("day"), F.col("cohort_day"))
    )
    cells = (
        fact.filter(F.col("day_offset") <= max_day_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )
    sizes = cells.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_active").alias("cohort_size")
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias(
                "retention"
            ),
        )
        .transform(
            lambda d: small_sort(d, "cohort_day", "day_offset") if sort else d
        )
    )


def events_asof_join(
    events: DataFrame,
    left_type: str = "error",
    right_type: str = "click",
    sort: bool = True,
) -> DataFrame:
    """As-of join: for every ``left_type`` event, the most recent
    ``right_type`` event of the same user at-or-before it (ties on ts
    resolved to the highest event_id).

    Spark has no native as-of join; the scalable expression is the
    union trick — tag both sides, sort per user by (ts, side, id), and
    carry the last-seen right row forward with ``last(..., ignorenulls)``
    over an unbounded-preceding window. ONE shuffle on user_id and a
    linear per-user pass, versus the quadratic blow-up of the naive
    range-join (``l.ts >= r.ts`` non-equi condition) that Catalyst
    would execute as a per-user cross product. At 100 TB, bucketing
    events by user_id makes even that single shuffle disappear.

    Output: (event_id, user_id, ts, matched_event_id, matched_ts,
    lag_us) with nulls when no right event precedes the left one.
    """
    sides = events.filter(
        F.col("event_type").isin([left_type, right_type])
    ).select(
        "event_id",
        "user_id",
        "ts",
        # right rows sort BEFORE left rows at equal ts → ts<= semantics
        F.when(F.col("event_type") == right_type, F.lit(0))
        .otherwise(F.lit(1))
        .alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    right_id = F.when(F.col("side") == 0, F.col("event_id"))
    right_ts = F.when(F.col("side") == 0, F.col("ts"))
    return (
        sides.withColumn("matched_event_id", F.last(right_id, True).over(w))
        .withColumn("matched_ts", F.last(right_ts, True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "matched_event_id",
            "matched_ts",
            (F.unix_micros("ts") - F.unix_micros("matched_ts")).alias("lag_us"),
        )
        .transform(lambda d: small_sort(d, "event_id") if sort else d)
    )


def events_asof_inner_strict(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    sort: bool = True,
) -> DataFrame:
    """INNER, STRICT as-of join — SQL `ASOF JOIN` parity: for every
    ``left_type`` event, the most recent ``right_type`` event of the
    same user STRICTLY before it; left events with no predecessor are
    dropped (inner semantics, DuckDB's `ASOF JOIN … ON l.ts > r.ts`).

    Two deltas vs :func:`events_asof_join`: (a) strictness — at equal
    ts the left row sorts BEFORE the right row in the union pass, so a
    simultaneous right event is not yet visible to the carry-forward;
    (b) the right side is pre-collapsed to one row per (user, ts)
    (max event_id) so the ASOF tie-break is well-defined in BOTH
    engines — DuckDB's ASOF leaves duplicate-timestamp picks
    unspecified, and an oracle needs determinism.

    Same scale story as events_asof_join: the union trick is ONE
    user_id shuffle + a linear per-user window pass — never the
    per-user cross product a naive `l.ts > r.ts` range join plans to.

    Output: (event_id, user_id, ts, matched_event_id, matched_ts,
    lag_us), inner rows only.
    """
    left = events.filter(F.col("event_type") == left_type).select(
        "event_id", "user_id", "ts", F.lit(0).alias("side")
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select("event_id", "user_id", "ts", F.lit(1).alias("side"))
    )
    sides = left.unionByName(right)
    # left (side 0) before right (side 1) at equal ts → strict ts<
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    right_id = F.when(F.col("side") == 1, F.col("event_id"))
    right_ts = F.when(F.col("side") == 1, F.col("ts"))
    return (
        sides.withColumn("matched_event_id", F.last(right_id, True).over(w))
        .withColumn("matched_ts", F.last(right_ts, True).over(w))
        .filter((F.col("side") == 0) & F.col("matched_event_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            "matched_event_id",
            "matched_ts",
            (F.unix_micros("ts") - F.unix_micros("matched_ts")).alias("lag_us"),
        )
        .transform(lambda d: small_sort(d, "event_id") if sort else d)
    )


def time_rollup(events: DataFrame, sort: bool = True) -> DataFrame:
    """Multi-grain time rollup (hour → day → week), hypertable-style:
    the hour aggregate is computed from the raw events (the ONE
    corpus-sized shuffle), and the day/week grains re-aggregate the
    previous grain — |hours| and |days| rows respectively, so the
    coarser grains are effectively free. This is the continuous-
    aggregate cascade pattern; a naive GROUPING SETS over raw events
    would scan and shuffle the corpus once per grain.

    Output: (grain, bucket_start, n_events, total_value) for grain in
    {hour, day, week} — weeks truncate to Monday in both Spark and the
    oracle.
    """
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_start")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    # |hours| rows; checkpointing pins ONE corpus scan — the union and
    # the day grain both reuse the materialized hour relation instead
    # of re-running the raw aggregate per plan branch.
    ).localCheckpoint()
    daily = hourly.groupBy(
        F.date_trunc("day", "bucket_start").alias("bucket_start")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("total_value"), 2).alias("total_value"),
    ).localCheckpoint()
    weekly = daily.groupBy(
        F.date_trunc("week", "bucket_start").alias("bucket_start")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("total_value"), 2).alias("total_value"),
    )
    out = (
        hourly.select(F.lit("hour").alias("grain"), "*")
        .unionByName(daily.select(F.lit("day").alias("grain"), "*"))
        .unionByName(weekly.select(F.lit("week").alias("grain"), "*"))
    )
    return out.transform(
        lambda d: small_sort(d, "grain", "bucket_start") if sort else d
    )


def tpch_q9(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    name_frag: str = "widget",
) -> DataFrame:
    """Product-type profit by nation and year (TPC-H Q9, adapted: the
    cut-down schema has no partsupp, so the ``ps_supplycost·l_quantity``
    cost term is dropped and profit degenerates to discounted revenue —
    the join/aggregation shape is unchanged).

    part is name-pruned at the scan; supplier (fixed cardinality) and
    nation broadcast; orders contributes only the year column. One
    fact-fact shuffle (lineitem⋈orders), one small agg.
    """
    p = part.filter(F.col("p_name").contains(name_frag)).select("p_partkey")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def tpch_q16(
    part: DataFrame,
    lineitem: DataFrame,
    excl_brand: str = "Brand#5",
    excl_type: str = "MEDIUM",
    sizes: tuple = (1, 5, 10, 15, 20, 25, 30, 35),
) -> DataFrame:
    """Supplier count per part spec (TPC-H Q16, adapted: lineitem
    stands in for the absent partsupp as the part↔supplier bridge, and
    the o_comment complaint-supplier exclusion is dropped — orders
    carries no comment column here).

    part is filter-pruned at the scan and is the (broadcastable) build
    side; the distinct-supplier count shuffles (brand, type, size,
    suppkey) once — partial distinct map-side.
    """
    p = part.filter(
        (F.col("p_brand") != excl_brand)
        & (~F.col("p_type").like(f"{excl_type}%"))
        & F.col("p_size").isin(list(sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def tpch_q20(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    name_frag: str = "bolt",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    qty_factor: float = 1.0,
) -> DataFrame:
    """Potential part promotion (TPC-H Q20, adapted: without
    ``ps_availqty`` the excess-stock predicate becomes "suppliers whose
    shipped quantity of candidate parts in the window exceeds
    ``qty_factor`` × the all-supplier mean" — the same decorrelated
    scalar-threshold + semi-join shape as the original; the original's
    single-nation cut is dropped because the synthetic supplier table
    is too small at low SF for any one nation to be non-empty across
    scales — nation joins in for the output column instead).

    One scan of lineitem builds per-supplier quantities; the mean is a
    1-row broadcast (no second corpus pass — the per-supplier relation
    is checkpointed and reused); nation filter broadcasts into
    supplier. Ordered by s_name like the original.
    """
    cand = part.filter(F.col("p_name").contains(name_frag)).select("p_partkey")
    qty = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(cand, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
        .localCheckpoint()
    )
    mean_qty = qty.agg(F.avg("supp_qty").alias("mean_qty"))
    heavy = (
        qty.join(F.broadcast(mean_qty))
        .filter(F.col("supp_qty") > qty_factor * F.col("mean_qty"))
        .select("l_suppkey", "supp_qty")
    )
    n = nation.select("n_nationkey", "n_name")
    return (
        supplier.join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_name",
            "n_name",
            "s_acctbal",
            F.round("supp_qty", 2).alias("shipped_qty"),
        )
        .orderBy("s_name")
    )


def events_rfm(
    events: DataFrame,
    buckets: int = 5,
    value_types: list[str] | None = None,
) -> DataFrame:
    """RFM user scoring: recency (days since last purchase-type event,
    vs the corpus max day), frequency (event count), monetary
    (value sum), each bucketed 1..``buckets`` against exact quantile
    cutoffs.

    Scale design: scores come from BROADCAST percentile cutoffs
    (``buckets−1`` scalars per metric), NOT from an ntile/row_number
    window — a global rank window needs a single-partition pass over
    all users, which is the classic RFM scale trap; cutoff comparisons
    are scan-parallel. Exact ``percentile`` keeps the DuckDB oracle
    bit-comparable; swap ``percentile_approx`` at petabyte scale.
    Higher score = better (recency is inverted).
    """
    value_types = value_types or ["purchase"]
    per_user = (
        events.filter(F.col("event_type").isin(value_types))
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count("*").alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        # tiny (|users| rows); checkpoint so the max-day scalar and the
        # cutoff aggregates reuse one corpus aggregation.
        .localCheckpoint()
    )
    ref = per_user.agg(F.max("last_day").alias("ref_day"))
    base = per_user.join(F.broadcast(ref)).select(
        "user_id",
        F.datediff("ref_day", "last_day").alias("recency_days"),
        "frequency",
        "monetary",
    ).localCheckpoint()
    pcts = [i / buckets for i in range(1, buckets)]
    cuts = base.agg(
        *[
            F.percentile(c, F.array(*[F.lit(p) for p in pcts])).alias(f"c_{c}")
            for c in ["recency_days", "frequency", "monetary"]
        ]
    )

    def score(col: str) -> Column:
        s = F.lit(1)
        for i in range(buckets - 1):
            s = s + (F.col(col) > F.col(f"c_{col}")[i]).cast("int")
        return s

    out = base.join(F.broadcast(cuts)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(buckets + 1) - score("recency_days")).alias("r_score"),
        score("frequency").alias("f_score"),
        score("monetary").alias("m_score"),
    )
    return out.transform(lambda d: small_sort(d, "user_id"))


def events_interval_join(
    events: DataFrame,
    n_windows: int = 20,
    window_hours: int = 4,
    sort: bool = True,
) -> DataFrame:
    """Keyless interval join, bucketized: activity windows (here: a
    ``window_hours`` span from each top-value user's first event)
    joined against ALL events falling inside them — no shared equi key
    between the two sides.

    The naive expression (``e.ts BETWEEN w.start AND w.end`` alone) is
    a non-equi join Catalyst can only run as a broadcast nested loop —
    fine for 20 windows, quadratic death for millions. The scalable
    shape used here: explode each window into its covered hour buckets
    and equi-join on the bucket, then apply the exact range predicate.
    Cost is |events| + Σ window-spans — linear, shuffle keyed on the
    hour bucket — and the same plan carries any number of windows.

    Output: (window_id, window_start, n_events, total_value) over the
    half-open [start, start + window_hours h) span.
    """
    totals = events.groupBy("user_id").agg(
        F.sum("value").alias("tv"), F.min("ts").alias("window_start")
    )
    rank_w = Window.orderBy(F.desc("tv"), F.asc("user_id"))
    windows = (
        totals.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= n_windows)
        .select(
            F.col("user_id").alias("window_id"),
            "window_start",
            F.expr(f"window_start + INTERVAL {window_hours} HOURS").alias(
                "window_end"
            ),
        )
        # |n_windows| rows; the rank window ran over the small per-user
        # totals relation, not the corpus.
        .localCheckpoint()
    )
    buckets = windows.select(
        "window_id",
        "window_start",
        "window_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "window_start"),
                F.date_trunc("hour", "window_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hb"),
    )
    ev = events.withColumn("hb", F.date_trunc("hour", "ts"))
    return (
        ev.join(buckets, "hb")
        .filter(
            (F.col("ts") >= F.col("window_start"))
            & (F.col("ts") < F.col("window_end"))
        )
        .groupBy("window_id", "window_start")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .transform(lambda d: small_sort(d, "window_id") if sort else d)
    )


def events_dau_wau(events: DataFrame) -> DataFrame:
    """Daily and trailing-7-day active users per calendar day.

    One corpus-sized distinct over (day, user); DAU is a tiny groupBy.
    WAU joins the |days|-row calendar grid (broadcast — its size is
    bounded by elapsed days, not data volume) against the distinct
    day/user relation on a 7-day range predicate, then counts distinct
    users per grid day. The non-equi join is safe precisely because
    the build side is the calendar, never the corpus.
    """
    days = events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct().localCheckpoint()
    dau = days.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    grid = dau.select(F.col("day").alias("grid_day"))
    wau = (
        days.join(
            F.broadcast(grid),
            (F.col("day") <= F.col("grid_day"))
            & (F.col("day") >= F.date_sub(F.col("grid_day"), 6)),
        )
        .groupBy("grid_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.day == wau.grid_day)
        .select("day", "dau", "wau")
        .transform(lambda d: small_sort(d, "day"))
    )


def sessions_summary(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session-behavior profile over the sessionized stream:
    session count, event totals, mean events per session, and mean
    session duration (ms). Aggregates the |sessions| relation that
    :func:`events_sessionize` already produces — no extra corpus pass.
    """
    s = events_sessionize(events, gap_minutes)
    dur_ms = F.unix_millis("session_end") - F.unix_millis("session_start")
    return (
        s.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
            F.round(F.avg("n_events"), 4).alias("mean_events"),
            F.round(F.avg(dur_ms), 2).alias("mean_duration_ms"),
        )
        .transform(lambda d: small_sort(d, "user_id"))
    )


def events_value_quantiles(
    events: DataFrame, pcts: tuple = (0.25, 0.5, 0.75, 0.95, 0.99)
) -> DataFrame:
    """Per-event-type value distribution: count, mean, and exact
    interpolated percentiles — the ops-dashboard summary for a metric
    stream. Exact ``percentile`` keeps the oracle bit-comparable; at
    petabyte scale swap ``percentile_approx`` (t-digest, fully
    map-side-combinable) per the dataset_stats precedent.
    """
    aggs = [
        F.count("*").alias("n"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    ] + [
        F.round(F.percentile("value", F.lit(p)), 4).alias(
            f"p{int(p * 100)}"
        )
        for p in pcts
    ]
    return (
        events.groupBy("event_type").agg(*aggs).orderBy("event_type")
    )


def tpch_q2(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    size_lo: int = 10,
    size_hi: int = 20,
    limit: int = 100,
    sort: bool = True,
) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2, adapted: the cut-down schema
    has no partsupp, so the part↔supplier cost relation is derived from
    lineitem — per (part, supplier) the minimum observed unit price
    stands in for ``ps_supplycost``; ``p_brand`` replaces the absent
    ``p_mfgr`` output column and the exact ``p_size``/``%TYPE`` cut
    becomes a size band so every SF is non-empty).

    Shape parity with the original: the correlated ``= (SELECT min…)``
    subquery is decorrelated into a per-part min aggregate joined back
    — in Spark the cost relation shuffles ONCE on (partkey, suppkey)
    to build unit costs, the region-filtered supplier/nation/region
    dims broadcast into it, and the per-part min (≤ |part| rows) joins
    back as a broadcast, so lineitem is scanned exactly once. Unit
    costs are exact double arithmetic in both engines, so the min
    equality is bit-stable cross-engine; the displayed cost uses the
    floor-quantize contract (``floor(x·10⁴+0.5)/10⁴``) rather than
    ``round`` because price/quantity quotients land on exact 4-dp
    halves often enough that round-half conventions diverge.
    """
    costs = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    )
    dims = (
        supplier.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = costs.join(
        F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey")
    ).localCheckpoint()
    min_cost = eligible.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    p = part.filter(F.col("p_size").between(size_lo, size_hi)).select(
        "p_partkey", "p_brand"
    )
    # min_cost (one row per part) and p (size-band part projection) are
    # both O(|part|) — unbounded at scale, so they are NOT broadcast-
    # hinted: the joins are equi-keyed on partkey and AQE broadcasts
    # them at small SF while falling back to a shuffle join when |part|
    # outgrows the driver's broadcast cap (hundreds of millions of rows
    # at SF10³⁺ would OOM a forced broadcast).
    out = (
        eligible.join(
            min_cost,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            (F.floor(F.col("supplycost") * 10000 + F.lit(0.5)) / 10000).alias(
                "supplycost"
            ),
        )
    )
    if sort:
        out = small_sort(
            out,
            F.desc("s_acctbal"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
        )
    # limit applies regardless of sort: sort=False yields an UNORDERED
    # top-`limit` rather than silently dropping the bound.
    return out.limit(limit)


def tpch_q11(
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    mean_factor: float = 1.25,
) -> DataFrame:
    """Important-stock identification (TPC-H Q11, adapted: without
    ``ps_availqty × ps_supplycost`` the per-part inventory value proxy
    is discounted revenue shipped by the target nation's suppliers, and
    the SF-scaled ``sum(value) × fraction`` cutoff becomes
    ``mean_factor × avg(value)`` — a scale-free threshold with the same
    group-by + HAVING-against-global-scalar shape, selecting the upper
    value tail at every SF).

    One lineitem scan (nation-filtered suppliers broadcast in), one
    aggregate by part; the global mean is a 1-row broadcast against the
    checkpointed per-part relation — no second corpus pass.
    """
    supp = (
        supplier.join(
            F.broadcast(
                nation.filter(F.col("n_name") == nation_name).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (
        lineitem.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
        )
        .localCheckpoint()
    )
    mean = val.agg(F.avg("value").alias("mean_value"))
    return (
        val.join(F.broadcast(mean))
        .filter(F.col("value") > mean_factor * F.col("mean_value"))
        .select("partkey", F.round("value", 4).alias("value"))
        .transform(lambda d: small_sort(d, F.desc("value"), F.asc("partkey")))
    )


def events_robust_anomaly(
    events: DataFrame, k: float = 3.0, sort: bool = True
) -> DataFrame:
    """Robust (median/MAD) hourly volume outliers per event type — the
    resistant-statistics sibling of :func:`events_hourly_anomaly`: a
    handful of huge bursts cannot drag the baseline the way they drag a
    mean/stddev z-score, so sustained incidents still stand out.

    The corpus pays ONE groupBy(type, hour); the median and the median
    absolute deviation are exact percentiles over that tiny hourly
    relation (two cheap aggregates + broadcast joins back). Hourly
    counts are integers, so medians and deviations are exact .0/.5
    doubles — bit-stable cross-engine without any quantize contract.
    Flag: |n − median| > k·MAD (MAD 0 → any deviation flags).
    """
    hourly = (
        events.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    med = hourly.groupBy(F.col("event_type").alias("m_type")).agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    dev = hourly.join(
        F.broadcast(med), F.col("event_type") == F.col("m_type")
    ).withColumn("abs_dev", F.abs(F.col("n") - F.col("med")))
    mad = dev.groupBy(F.col("event_type").alias("d_type")).agg(
        F.percentile("abs_dev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), F.col("event_type") == F.col("d_type"))
        .filter(F.col("abs_dev") > k * F.col("mad"))
        .select("event_type", "hour_start", "n", "med", "mad", "abs_dev")
        .transform(
            lambda d: small_sort(d, "event_type", "hour_start") if sort else d
        )
    )


def funnel_time_stats(
    events: DataFrame, steps: list[str] | None = None
) -> DataFrame:
    """Time-to-convert distribution for ordered funnel completions:
    over users whose signup → click → purchase happened in temporal
    order, the count and exact quantiles of first-step→last-step
    duration — the "how long does conversion take" report on top of
    :func:`events_funnel`.

    Same single user_id shuffle as the funnel (pivot of per-step first
    timestamps); the stats are one global aggregate over the
    |converted-users| relation. Durations are epoch-ms integers, so
    exact percentiles are .0/.5 doubles — bit-stable cross-engine.
    """
    steps = steps or ["signup", "click", "purchase"]
    firsts = (
        events.filter(F.col("event_type").isin(steps))
        .groupBy("user_id")
        .pivot("event_type", steps)
        .agg(F.min("ts"))
    )
    ordered = firsts
    for a, b in zip(steps, steps[1:]):
        ordered = ordered.filter(
            F.col(a).isNotNull() & F.col(b).isNotNull() & (F.col(b) > F.col(a))
        )
    dur = F.unix_millis(F.col(steps[-1])) - F.unix_millis(F.col(steps[0]))
    return ordered.select(dur.alias("dur_ms")).agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("dur_ms").alias("min_ms"),
        F.percentile("dur_ms", F.lit(0.5)).alias("p50_ms"),
        F.percentile("dur_ms", F.lit(0.9)).alias("p90_ms"),
        F.max("dur_ms").alias("max_ms"),
    )


def events_seasonality(events: DataFrame) -> DataFrame:
    """Traffic seasonality profile: event counts and share by
    (day-of-week, hour-of-day) cell — the capacity-planning heat map.

    One partial-agg groupBy; shares via a broadcast 1-row total. The
    day-of-week comes from integer epoch-day arithmetic
    (``(days + 4) % 7``, Sunday = 0 — 1970-01-01 was a Thursday → 4)
    instead of calendar functions, because engines disagree on
    dayofweek numbering (Spark 1=Sunday, DuckDB 0=Sunday, ISO 1=Monday)
    but integer division is bit-identical everywhere.
    """
    ms = F.unix_millis(F.col("ts"))
    cells = (
        events.select(
            ((F.floor(ms / F.lit(86_400_000)) + 4) % 7).alias("dow"),
            (F.floor(ms / F.lit(3_600_000)) % 24).alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    total = cells.agg(F.sum("n").alias("total"))
    return (
        cells.join(F.broadcast(total))
        .select(
            "dow",
            "hour",
            "n",
            F.round(F.col("n") / F.col("total"), 4).alias("share"),
        )
        .orderBy("dow", "hour")
    )


def events_autocorrelation(
    events: DataFrame, lags: tuple = (1, 24, 168)
) -> DataFrame:
    """Autocorrelation of the hourly event-volume series at the given
    lags (1 h, 1 day, 1 week) — the seasonality detector behind "is
    this traffic daily-periodic?".

    The corpus collapses to the |hours|-row series once (dense grid via
    an hour-index join so missing hours count as zero); each lag is a
    self-join of that tiny series shifted by the lag plus one Pearson
    aggregate — no window over the corpus, no driver-side series.
    Pearson r rounds at 4 dp (float sums over ≤|hours| terms are
    ulp-stable far below that).
    """
    hour = F.floor(F.unix_millis(F.col("ts")) / F.lit(3_600_000))
    hourly = (
        events.select(hour.alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    bounds = hourly.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = (
        bounds.select(
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
        )
        .join(hourly, "h", "left")
        .select("h", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
        .localCheckpoint()
    )
    out = None
    for lag in lags:
        a = grid.alias("a")
        b = grid.select(
            (F.col("h") + lag).alias("h"), F.col("n").alias("n_lag")
        ).alias("b")
        joined = a.join(b, "h")
        r = joined.agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.round(
                (
                    F.avg(F.col("n") * F.col("n_lag"))
                    - F.avg("n") * F.avg("n_lag")
                )
                / (F.stddev_pop("n") * F.stddev_pop("n_lag")),
                4,
            ).alias("acf"),
        ).select(F.lit(lag).alias("lag_hours"), "n_pts", "acf")
        out = r if out is None else out.unionAll(r)
    return out.orderBy("lag_hours")


def events_forecast_baseline(
    events: DataFrame, season_hours: int = 168
) -> DataFrame:
    """Backtest of the two classic forecast baselines on the hourly
    volume series per event type: naive (ŷₜ = yₜ₋₁) vs seasonal-naive
    (ŷₜ = yₜ₋₁₆₈, same hour last week). Reported MAE per type answers
    "is this traffic predictable, and is it weekly-seasonal?" before
    anyone reaches for a model.

    The corpus collapses once to the (type, hour) series; both
    baselines are shifted self-joins of that tiny relation and one
    aggregate. Volumes are integer counts, so the MAEs are exact
    rationals rounded at 4 dp — cross-engine stable.
    """
    hour = F.floor(F.unix_millis(F.col("ts")) / F.lit(3_600_000))
    hourly = (
        events.groupBy(F.col("event_type"), hour.alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )

    def _mae(lag: int, name: str) -> DataFrame:
        prev = hourly.select(
            F.col("event_type").alias("p_type"),
            (F.col("h") + lag).alias("h"),
            F.col("n").alias("n_prev"),
        )
        return (
            hourly.join(
                prev,
                (F.col("event_type") == F.col("p_type"))
                & (hourly.h == prev.h),
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias(f"n_pts_{name}"),
                F.round(F.avg(F.abs(F.col("n") - F.col("n_prev"))), 4).alias(
                    f"mae_{name}"
                ),
            )
        )
    return (
        _mae(1, "naive")
        .join(_mae(season_hours, "seasonal"), "event_type")
        .orderBy("event_type")
    )


def events_cohort_matrix(events: DataFrame) -> DataFrame:
    """Weekly cohort-retention matrix: users bucketed by first-seen
    week (the cohort), distinct active users per (cohort_week,
    weeks-since-cohort) cell — the classic retention triangle.

    Weeks are integer epoch-week arithmetic (``unix_millis //
    7·86400000``) rather than calendar truncation, because engines
    disagree on week-start conventions while integer division is
    bit-identical everywhere (the ``events_seasonality`` discipline).

    100 TB shape: per-user min (one partial-agg shuffle on user_id),
    join back keyed on user_id (both sides already hash on it — AQE
    broadcasts the cohort relation only while it fits; no hint, it is
    O(|users|)), then one partial-agg groupBy over the small
    (cohort, offset) domain via distinct-user pre-aggregation.
    """
    wk = F.floor(F.unix_millis(F.col("ts")) / F.lit(604_800_000))
    uw = events.select(F.col("user_id"), wk.alias("week"))
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        uw.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()  # distinct (user, cell) BEFORE the count — partial-agg friendly
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return small_sort(cells, "cohort_week", "week_offset")


def events_value_ntile_histogram(events: DataFrame, tiles: int = 10) -> DataFrame:
    """Equal-count (ntile) histogram of ``value`` per event type:
    bucket boundaries and means for ``tiles`` quantile buckets — the
    exact-distribution profile behind outlier thresholds.

    Deterministic: the ntile ordering includes event_id so ties split
    identically in any engine (SQL-standard ntile remainder rule:
    earlier tiles get the extra row).

    Scale note: exact ntile sorts each event_type partition — one
    range-ish sort per type (salting cannot apply; ranks are global
    per type). This is the EXACT profile for audit-scale runs;
    at 100 TB steady state use ``events_value_quantiles``
    (approx-percentile, partial-agg only) and reserve this for
    samples — the pairing the docstrings of both ops point at.
    """
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    t = events.select("event_type", "event_id", "value").withColumn(
        "tile", F.ntile(tiles).over(w)
    )
    return (
        t.groupBy("event_type", "tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
            F.round(F.avg("value"), 4).alias("mean_value"),
        )
        .transform(lambda d: small_sort(d, "event_type", "tile"))
    )


def events_user_lifespan(events: DataFrame) -> DataFrame:
    """User-lifespan histogram: days between a user's first and last
    event, bucketed — the engagement-duration profile behind churn and
    cohort analyses (the aggregate complement of the per-cell
    :func:`events_cohort_matrix`).

    Integer epoch-day arithmetic end-to-end (the cross-engine
    bit-stability discipline); avg_events is a ratio of exact integer
    aggregates rounded at the end.

    100 TB shape: per-user min/max/count (one partial-agg shuffle on
    user_id), then a partial-agg groupBy over the tiny lifespan-days
    domain. No joins, no windows.
    """
    ms = F.unix_millis(F.col("ts"))
    per_user = events.groupBy("user_id").agg(
        F.min(ms).alias("first_ms"),
        F.max(ms).alias("last_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
    lifespan = (
        F.floor(F.col("last_ms") / F.lit(86_400_000))
        - F.floor(F.col("first_ms") / F.lit(86_400_000))
    ).alias("lifespan_days")
    return (
        per_user.select(lifespan, "n_events")
        .groupBy("lifespan_days")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("n_events"), 2).alias("avg_events"),
        )
        .transform(lambda d: small_sort(d, "lifespan_days"))
    )


def events_bot_detection(
    events: DataFrame,
    burst_threshold: int = 5,
    total_threshold: int = 200,
) -> DataFrame:
    """Bot / automation flagging: users whose peak per-minute event
    burst or total volume exceeds human-plausible thresholds — the
    anti-abuse screen run before engagement analytics (one scripted
    client can dominate every top-k and cohort otherwise).

    Per user: total events, peak events in any tumbling minute, number
    of active minutes, and the flag reasons. Tumbling (not sliding)
    windows keep the aggregate exact, cheap, and cross-engine stable
    (integer epoch-minute buckets).

    100 TB shape: one partial-agg groupBy on (user, minute) — the
    shuffle carries minute buckets, not events — then a per-user
    rollup; no windows over raw events, no joins.
    """
    minute = F.floor(F.unix_millis(F.col("ts")) / F.lit(60_000))
    per_min = (
        events.select("user_id", minute.alias("minute"))
        .groupBy("user_id", "minute")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_user = per_min.groupBy("user_id").agg(
        F.sum("n").alias("total_events"),
        F.max("n").alias("peak_minute_events"),
        F.count(F.lit(1)).alias("active_minutes"),
    )
    return (
        per_user.select(
            "user_id",
            "total_events",
            "peak_minute_events",
            "active_minutes",
            (F.col("peak_minute_events") >= burst_threshold).alias("burst_flag"),
            (F.col("total_events") >= total_threshold).alias("volume_flag"),
        )
        .filter(F.col("burst_flag") | F.col("volume_flag"))
        .transform(lambda d: small_sort(d, "user_id"))
    )


def events_conversion_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    window_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Last-touch conversion attribution: credit each conversion to the
    user's most recent NON-conversion event within the lookback window
    — the marketing/product attribution query behind "what drives
    purchases". Unattributed conversions (nothing in the window) are
    reported under touch_type = '(none)'.

    Implemented with the as-of union+window trick (one shuffle on
    user_id, a single last_value window over the merged stream — no
    range join, no per-user cross product): touches and conversions
    interleave in (ts, kind) order; each conversion reads the running
    "last touch" carried by the window, then the window-bound filter
    applies. Output: (touch_type, n_conversions, avg_gap_min).
    """
    ms = F.unix_millis(F.col("ts"))
    touches = events.filter(F.col("event_type") != conversion_type).select(
        "user_id", ms.alias("ms"),
        F.col("event_type").alias("touch_type"),
        F.lit(0).alias("kind"),
        "event_id",
    )
    convs = events.filter(F.col("event_type") == conversion_type).select(
        "user_id", ms.alias("ms"),
        F.lit(None).cast("string").alias("touch_type"),
        F.lit(1).alias("kind"),
        "event_id",
    )
    merged = touches.unionAll(convs)
    # event_id as the final key makes the ordering total: two touches for
    # the same user at the same millisecond would otherwise make
    # last_value nondeterministic across runs and engines.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = (
        merged.withColumn(
            "last_touch", F.last("touch_type", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_touch_ms",
            F.last(
                F.when(F.col("kind") == 0, F.col("ms")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("kind") == 1)
        .select(
            F.when(
                F.col("last_touch_ms").isNotNull()
                & (F.col("ms") - F.col("last_touch_ms") <= window_ms),
                F.col("last_touch"),
            )
            .otherwise(F.lit("(none)"))
            .alias("touch_type"),
            (F.col("ms") - F.col("last_touch_ms")).alias("gap_ms"),
            (
                F.col("last_touch_ms").isNotNull()
                & (F.col("ms") - F.col("last_touch_ms") <= window_ms)
            ).alias("in_window"),
        )
    )
    return (
        attributed.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(
                F.avg(F.when(F.col("in_window"), F.col("gap_ms") / 60000.0)), 2
            ).alias("avg_gap_min"),
        )
        .transform(lambda d: small_sort(d, "touch_type"))
    )


def events_rollup_cube(events: DataFrame) -> DataFrame:
    """Multi-grain traffic cube: event counts and value sums for every
    combination of (event_type, day-of-week) INCLUDING the marginal and
    grand totals — one CUBE aggregation instead of four separate
    groupBys (Spark expands the grouping sets in a single shuffle with
    partial aggregation per set).

    NULL grouping keys are replaced with '(all)' / -1 sentinels so the
    totals are first-class rows (and the oracle comparison is
    null-free). Integer epoch-day dow (Sunday = 0, the
    ``events_seasonality`` convention).
    """
    dow = (
        (F.floor(F.unix_millis(F.col("ts")) / F.lit(86_400_000)) + 4) % 7
    ).alias("dow")
    return (
        events.select(F.col("event_type"), dow, F.col("value"))
        .cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("(all)")).alias("event_type"),
            F.coalesce(F.col("dow"), F.lit(-1)).alias("dow"),
            "n",
            "value_sum",
        )
        .transform(lambda d: small_sort(d, "event_type", "dow"))
    )


def events_user_pivot(events: DataFrame, types: list[str] | None = None) -> DataFrame:
    """Per-user wide activity profile: one column per event type (the
    PIVOT shape feature stores and BI exports want). The type list is
    EXPLICIT — ``pivot(col)`` without values would scan once just to
    discover them, and a 100 TB pipeline pins its event taxonomy
    anyway (unknown types land in nothing rather than new columns).
    """
    types = types or ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
        .transform(lambda d: small_sort(d, "user_id"))
    )
