"""Structured Streaming analogs of the batch log tools.

The reference is batch-only (MR jobs over closed hourly files); a Spark
engine gets the streaming versions almost for free, and they matter in
production: grep over a *live* ingest feed and continuously-maintained
hourly ingest stats (the streaming LogStats).

- :func:`stream_grep` — ``readStream`` (text or any streaming source
  adapted to the log schema) → the same codegen'd regex/time filter the
  batch ``grep`` uses → any sink. A tail -f | grep for the cluster.
- :func:`stream_hourly_stats` — event-time windowed counts/bytes with a
  watermark bounding state: late lines beyond the watermark are dropped
  exactly like LogStats' closed-hour accounting.

Scale notes: both are narrow (filter) or keyed-window (hour, component)
operators — state size is |components × open windows|, independent of
throughput; shuffle only on the window keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_grep(
    lines: DataFrame,
    regex: str,
    case_insensitive: bool = False,
    message_col: str = "message",
) -> DataFrame:
    """Filter a streaming DataFrame by unanchored regex (loggrep live).

    ``lines`` is any streaming DF with a ``message`` column (e.g.
    ``spark.readStream.text(dir)`` renamed, or a Kafka value decode).
    """
    pattern = f"(?i){regex}" if case_insensitive else regex
    return lines.filter(F.col(message_col).rlike(pattern))


def stream_hourly_stats(
    lines: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "event_time",
    key_col: str = "component",
    message_col: str = "message",
) -> DataFrame:
    """Hourly ingest volumes over event time with bounded state.

    Output schema: (window_start, window_end, <key>, line_count,
    total_bytes) — the streaming equivalent of
    ``operators.index.log_stats_hourly``. ``message_col`` names the
    byte-counted text column (the stream_grep convention — ts/key were
    already parameterized, the text column must be too).
    """
    return (
        lines.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.sum(F.octet_length(message_col)).alias("total_bytes"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "line_count",
            "total_bytes",
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "event_time",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful streaming operator: per-user session tracking with
    an inactivity gap, via ``applyInPandasWithState``.

    State per user: (session_start_ms, last_ts_ms, n_events). A batch's
    events extend the open session or close it and open a new one;
    closed sessions are emitted as rows (user_id, session_start,
    session_end, n_events). The event-time watermark bounds state: users
    idle past the watermark have their final session flushed on timeout.

    This is the streaming analog of ``operators.analytics.
    events_sessionize`` — state size is O(active users), independent of
    throughput; the only shuffle keys on user_id.

    Cross-batch late-data contract (within the watermark; the per-key
    analog of stream_skew_asof_join's as-of-arrival rule): a late event
    inside or gap-adjacent to the OPEN session merges into it
    (``last_ms`` never moves backwards — a regressed frontier caused
    spurious gap splits and premature timeout flushes); a late event
    older than the open session by more than the gap closes immediately
    as its own 1-event session, since its true session may already be
    emitted and append mode cannot retract. In a bounded drain (one
    batch per key) the in-batch sort makes the output equal the batch
    sessionize exactly — FULL oracle.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    gap_ms = gap_minutes * 60 * 1000

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start", T.LongType()),
            T.StructField("session_end", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = "start_ms LONG, last_ms LONG, n LONG"

    def update(key, pdfs, state: "GroupState"):
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                start_ms, last_ms, n = state.get
                closed.append((user_id, start_ms, last_ms, n))
                state.remove()
        else:
            ts_list = []
            for pdf in pdfs:
                # Exact integer ns→ms floor (float .timestamp() can be off
                # by 1 ms at exact-millisecond boundaries).
                ms = (
                    pd.to_datetime(pdf[ts_col])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1_000_000
                )
                ts_list.extend(int(v) for v in ms)
            ts_list.sort()
            if state.exists:
                start_ms, last_ms, n = state.get
            else:
                start_ms, last_ms, n = None, None, 0
            for t in ts_list:
                if start_ms is None:
                    start_ms, last_ms, n = t, t, 1
                elif t - last_ms > gap_ms:
                    closed.append((user_id, start_ms, last_ms, n))
                    start_ms, last_ms, n = t, t, 1
                elif t >= start_ms:
                    # within-span or forward extension; last_ms must
                    # NEVER move backwards (a cross-batch late event
                    # older than last_ms used to regress it, causing
                    # spurious gap splits and premature timeout flush)
                    last_ms, n = max(last_ms, t), n + 1
                elif start_ms - t <= gap_ms:
                    # late event just before the open session: extend
                    # the span backwards — the batch answer merges it
                    start_ms, n = t, n + 1
                else:
                    # late singleton older than the open session by
                    # more than the gap: its true session may already
                    # be emitted (append mode cannot retract), so it
                    # closes immediately as its own 1-event session —
                    # the documented as-of-arrival late contract
                    closed.append((user_id, t, t, 1))
            if start_ms is not None:
                state.update((start_ms, last_ms, n))
                state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_funnel_match(
    events: DataFrame,
    steps: list[str] | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Custom stateful streaming operator: sequential funnel matching
    (MATCH_RECOGNIZE-style) via ``applyInPandasWithState``.

    Per user, a stage machine advances on the first event of the next
    step with a STRICTLY later timestamp than the previous advance;
    when the final step fires, one row (user_id, completed_us) is
    emitted and the user is marked done (repeat completions are
    suppressed). This is TRUE sequence matching — unlike the batch
    ``events_funnel``'s first-occurrence ordering test, a user with
    click < signup < click < purchase still converts here.

    Greedy earliest-advance yields the globally earliest completion
    (any valid (s, c, p) chain admits the earliest signup and the
    earliest qualifying click), so the emission equals the batch
    nested-EXISTS min — which is exactly the DuckDB oracle.

    State per user: (stage, last_us, done) — 3 longs, and ONLY for
    users whose machine has advanced: non-step events are filtered
    before the groupBy and a no-advance batch writes no state, so the
    NoTimeout state store is bounded by FUNNEL PARTICIPANTS, not by
    every user the stream has ever seen. Emission is immediate (no
    watermark/timeout dependence, so the bounded drain needs no
    sentinel).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    steps = steps or ["signup", "click", "purchase"]
    step_idx = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("completed_us", T.LongType()),
        ]
    )
    state_schema = "stage LONG, last_us LONG, done LONG"

    def update(key, pdfs, state: "GroupState"):
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover — no timeout configured
            return
        stage, last_us, done = state.get if state.exists else (0, -1, 0)
        evts = []
        for pdf in pdfs:
            us = (
                pd.to_datetime(pdf[ts_col])
                .astype("datetime64[ns]")
                .astype("int64")
                // 1_000
            )
            evts.extend(
                (int(t), step_idx[ty])
                for t, ty in zip(us, pdf[type_col])
                if ty in step_idx
            )
        # strict-inequality advance needs (ts, step) order: at equal ts
        # the EARLIER step sorts first and the later step cannot use it
        # (t > last_us fails) — matching the oracle's strict <.
        evts.sort()
        out = []
        advanced = False
        for t, idx in evts:
            if done:
                break
            if idx == stage and (stage == 0 or t > last_us):
                stage += 1
                last_us = t
                advanced = True
                if stage == n_steps:
                    out.append((user_id, t))
                    done = 1
        # only write state for users whose machine moved: combined with
        # the pre-groupBy step filter, a user never emitting a funnel
        # step allocates NO permanent state row (NoTimeout state is
        # never evicted — unconditional update() grew it with every
        # distinct user ever seen, funnel participant or not)
        if advanced or state.exists:
            state.update((stage, last_us, done))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "completed_us"])

    return (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_watermarked_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Event-time windowed counts emitted in APPEND mode: a window's
    row is published exactly once, when the watermark
    (``max event time − watermark delay``) passes its end — the
    finalize-on-watermark semantics production alert/rollup feeds want,
    vs the re-emit-everything COMPLETE mode of
    :func:`stream_hourly_stats`.

    State is bounded by the watermark: closed windows are evicted after
    emission, so an unbounded run holds only the windows inside the
    delay horizon. On a bounded (``availableNow``) drain the emitted
    set is exactly the windows with ``window_end ≤ max(ts) − delay`` —
    deterministic, so the batch oracle filters on the same cutoff.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Stream-static join: enrich a streaming fact feed with a static
    (batch) dimension — the standard lookup-table pattern. Spark
    re-plans the static side per micro-batch (so a refreshed dim table
    is picked up) and broadcasts it when it fits; the stream side never
    buffers state, so this stays append-mode and stateless.
    """
    return stream.join(F.broadcast(dim), key, "left")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within_ms: int = 3_600_000,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
) -> DataFrame:
    """Watermarked stream-stream inner join: match each left event to
    right events of the same key within ``within_ms`` AFTER it (click →
    purchase attribution). Both sides carry watermarks and the join
    condition bounds event-time skew, so Spark evicts buffered rows
    once the watermark passes — state stays proportional to the time
    window, not the stream.
    """
    # Millisecond-precision bound: building the interval in ms keeps
    # non-multiple-of-1000 windows (e.g. 1500 ms) exact instead of
    # silently flooring to whole seconds; the watermark is rounded UP
    # to a safe horizon (eviction may only be later, never earlier).
    wm_secs = -(-within_ms * 2 // 1000)  # ceil-div
    wm = f"{wm_secs} seconds"
    lt, rt = F.col(left_ts), F.col(right_ts)
    return (
        left.withWatermark(left_ts, wm)
        .join(
            right.withWatermark(right_ts, wm),
            (F.col(f"l_{key}") == F.col(f"r_{key}"))
            & (rt >= lt)
            & (rt <= lt + F.expr(f"INTERVAL {within_ms} MILLISECONDS")),
            "inner",
        )
    )


def stream_skew_asof_join(
    events: DataFrame,
    within_ms: int = 3_600_000,
    left_type: str = "purchase",
    right_type: str = "click",
    reorder_ms: int | None = None,
    ts_col: str = "event_time",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
    watermark: str = "30 days",
) -> DataFrame:
    """Stream as-of attribution with PER-KEY watermark skew handling:
    for every ``left_type`` event, the latest ``right_type`` event of
    the same user at-or-before it within ``within_ms`` (inner, ties on
    ts to the highest event id).

    Why a custom operator: the built-in stream-stream join evicts
    buffered state at the GLOBAL watermark, so tolerating one source
    that lags by hours (a device uploading late, a skewed Kafka
    partition) forces a delay that long for EVERY key — and state for
    the whole stream is retained for the whole skew horizon. Here the
    GLOBAL watermark is set conservatively large (correctness: late
    data still reaches the operator, and only drives idle-key
    timeouts), while each key trims its own buffer by its OWN
    frontier: per-key watermark = max event time seen for that key −
    ``reorder_ms``. State per key is O(right events inside
    within+reorder of the key's frontier) regardless of how far the
    key lags the rest of the stream.

    Late-data contract (the per-key analog of stream_rate_limit's
    straggler rule): a left event older than its key's per-key
    watermark is DROPPED (its candidate right rows may already be
    evicted; emitting a partial match could disagree with the batch
    answer), and a right event that old can no longer match anything.
    Matching is AS-OF ARRIVAL for the right side: each left row is
    resolved against the right rows seen so far (within a batch the
    per-key sort repairs ordering; ``reorder_ms`` only bounds buffer
    EVICTION). A right row that arrives in a LATER batch than a left
    row it precedes in event time does not retro-match — append mode
    cannot retract an emission. The alternative (holding every left
    row for ``reorder_ms`` before resolving) restores cross-batch
    reorder exactness at the cost of emission latency and a flush
    signal for stream tails; a deployment wanting that trades on the
    same seam. In a bounded drain (one batch per key) the per-key
    sort makes the output equal the batch LATERAL as-of exactly —
    FULL oracle.

    Output: (user_id, purchase_id, click_id, purchase_ts, click_ts,
    lag_ms).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    if reorder_ms is None:
        reorder_ms = within_ms

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("purchase_id", T.LongType()),
            T.StructField("click_id", T.LongType()),
            T.StructField("purchase_ts", T.LongType()),
            T.StructField("click_ts", T.LongType()),
            T.StructField("lag_ms", T.LongType()),
        ]
    )
    state_schema = "c_ts ARRAY<LONG>, c_id ARRAY<LONG>, frontier LONG"

    def update(key, pdfs, state: "GroupState"):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        rows = []  # (ts_ms, side, id): side 0 = right/click first at ties
        for pdf in pdfs:
            ms = (
                pd.to_datetime(pdf[ts_col])
                .astype("datetime64[ns]")
                .astype("int64")
                // 1_000_000
            )
            for t, ty, eid in zip(ms, pdf[type_col], pdf[id_col]):
                if ty == right_type:
                    rows.append((int(t), 0, int(eid)))
                elif ty == left_type:
                    rows.append((int(t), 1, int(eid)))
        if not rows and not state.exists:
            return
        rows.sort()
        if state.exists:
            c_ts, c_id, frontier = state.get
            buf = sorted(zip(c_ts, c_id))
        else:
            buf, frontier = [], None
        key_wm = frontier - reorder_ms if frontier is not None else None
        matched = []
        for t, side, eid in rows:
            if side == 0:
                buf.append((t, eid))
                # cross-batch out-of-order: keep buf (ts, id)-sorted
                if len(buf) > 1 and buf[-2] > buf[-1]:
                    buf.sort()
            else:
                if key_wm is not None and t < key_wm:
                    continue  # per-key-late left row: drop, never partial-match
                best = None
                for ct, cid in reversed(buf):
                    if ct <= t:
                        if t - ct <= within_ms:
                            best = (ct, cid)
                        break
                if best is not None:
                    matched.append(
                        (user_id, eid, best[1], t, best[0], t - best[0])
                    )
        batch_max = rows[-1][0] if rows else None
        if frontier is None:
            new_frontier = batch_max
        elif batch_max is None:
            new_frontier = frontier
        else:
            new_frontier = max(frontier, batch_max)
        if new_frontier is not None:
            key_wm = new_frontier - reorder_ms
            buf = [(t, i) for t, i in buf if t + within_ms >= key_wm]
            state.update(
                ([t for t, _ in buf], [i for _, i in buf], new_frontier)
            )
            state.setTimeoutTimestamp(new_frontier + within_ms + reorder_ms)
        if matched:
            yield pd.DataFrame(
                matched,
                columns=[
                    "user_id",
                    "purchase_id",
                    "click_id",
                    "purchase_ts",
                    "click_ts",
                    "lag_ms",
                ],
            )

    return (
        events.filter(F.col(type_col).isin([left_type, right_type]))
        .withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_rate_limit(
    events: DataFrame,
    limit: int = 1,
    window_ms: int = 86_400_000,
    ts_col: str = "event_time",
    user_col: str = "user_id",
    id_col: str = "event_id",
    watermark: str = "2 days",
) -> DataFrame:
    """Custom stateful streaming operator: per-user rate limiting —
    admit at most ``limit`` events per epoch-aligned tumbling window,
    emitting accepted events as they arrive (alert throttling / notify-
    once-per-day semantics).

    State per user: (window_start, count) — O(active users), refreshed
    on window rollover, evicted by the event-time timeout one window
    past the watermark. Within a batch events process in (ts, id)
    order, and the admit decision depends only on the per-(user,window)
    arrival rank, so a single-batch drain equals the batch
    row_number-per-window query exactly — FULL oracle. Across batches,
    a legal-but-late event for a window OLDER than the user's current
    one is DROPPED (its window's count is gone; admitting it could
    break the ≤limit contract), so multi-batch out-of-order runs
    under-admit for straggler windows rather than ever over-admitting.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("win_start", T.LongType()),
        ]
    )
    state_schema = "win LONG, n LONG"

    def update(key, pdfs, state: "GroupState"):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        rows = []
        for pdf in pdfs:
            ms = (
                pd.to_datetime(pdf[ts_col])
                .astype("datetime64[ns]")
                .astype("int64")
                // 1_000_000
            )
            rows.extend(
                (int(t), int(e)) for t, e in zip(ms, pdf[id_col])
            )
        rows.sort()
        win, n = state.get if state.exists else (None, 0)
        accepted = []
        for t, eid in rows:
            w = (t // window_ms) * window_ms
            if win is not None and w < win:
                # Pre-watermark straggler for a window whose count was
                # already advanced past: admitting it could exceed the
                # per-window limit (the old count is gone), so drop it
                # rather than reset `win` backwards and re-admit up to
                # `limit` events for BOTH windows.
                continue
            if w != win:
                win, n = w, 0
            if n < limit:
                accepted.append((user_id, eid, t, w))
                n += 1
        if win is not None:
            state.update((win, n))
            state.setTimeoutTimestamp(win + 2 * window_ms)
        if accepted:
            yield pd.DataFrame(
                accepted, columns=["user_id", "event_id", "ts_ms", "win_start"]
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_session_window(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user session aggregation via Spark's NATIVE
    ``session_window`` — the built-in dynamic-gap operator
    (state-store-backed window merge, append emission when the
    watermark passes ``last_event + gap``). The Spark-first counterpart
    of :func:`stream_sessionize`'s hand-rolled
    ``applyInPandasWithState`` sessionizer: use THIS one when the
    output you need is per-session aggregates (the built-in merge is
    JVM-side and codegen-friendly); reach for the custom operator only
    when per-session logic outgrows declarative aggregation.

    Output: (user_id, session_start, session_end, n_events) with
    ``session_end = last event + gap`` (Spark's convention).
    """
    gap = f"{gap_minutes} minutes"
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.unix_millis(F.col("session_window.start")).alias("session_start"),
            F.unix_millis(F.col("session_window.end")).alias("session_end"),
            "n_events",
        )
    )


def stream_to_boom_tree(
    lines: DataFrame,
    root: str,
    dc: str,
    service: str,
    log_type: str,
    component: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Live-ingest sink: stream canonical log lines INTO the reference's
    hourly ``.bm`` tree — the role the reference delegates to its
    external Flume/ingest pipeline, expressed as Structured Streaming
    ``foreachBatch`` over the existing batch tree writer
    (``sources.boom.write_boom_tree``, the
    ``mapreduce/boom/PigBoomHourlyOutputFormat.java`` analog).

    Every micro-batch appends one ``part-<epoch>-<batch>`` file set per
    touched hour directory, so the tree stays readable by `logcat`/
    maintenance MID-STREAM and each batch's files are new names (no
    overwrite races with a concurrent compaction holding the lease).
    Exactly-once within a restart: foreachBatch may re-run a batch on
    recovery, and the batch id is part of the file name, so a re-run
    overwrites ITS OWN files rather than duplicating lines.

    Returns the started StreamingQuery (caller awaits/stops).
    """
    from bb_bigdata_log_tools_spark.sources.boom import write_boom_tree

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_boom_tree(
            batch_df,
            root,
            dc,
            service,
            log_type,
            component,
            file_tag=f"b{batch_id:06d}",
        )

    writer = lines.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hll_registers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 8,
) -> DataFrame:
    """Streaming HyperLogLog: maintain the (group, register, max_rho)
    relation as a live streaming aggregation — the mergeable-sketch
    property IS the streaming story: ``max`` is an associative,
    idempotent aggregate, so registers stay exact under any micro-batch
    slicing, replays included, with O(groups × 2^p) state and no
    watermark needed. The estimate is computed from the drained
    register table (see the registry entry) — same math, same oracle,
    as the batch :func:`~bb_bigdata_log_tools_spark.operators.sketches.
    approx_distinct_hll`.
    """
    from bb_bigdata_log_tools_spark.operators.sketches import (
        hll_register_relation,
    )

    # the batch builder IS the streaming plan — pure streaming-
    # compatible column algebra, one copy (the stream_cms_buckets /
    # stream_quantile_bins discipline: a second register/rho derivation
    # here could silently diverge from the batch oracle).
    return hll_register_relation(events, group_col, value_col, p)


def stream_cms_buckets(
    events: DataFrame,
    value_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming Count-Min: maintain the (d, bucket, cnt) counter
    relation as a live COMPLETE-mode aggregation — ``sum`` is
    associative, so the counters are EXACT under any micro-batch
    slicing; O(depth × width) state, no watermark needed. Same hash
    family as the batch :func:`~bb_bigdata_log_tools_spark.operators.
    sketches.cms_buckets`, so the drained counter table feeds the same
    closed-form estimate and the batch oracle applies verbatim.

    Replay caveat (vs HLL's idempotent ``max``): ``sum`` counters are
    NOT idempotent, so exactly-once sinks/checkpointing are required
    under retries — the standard CMS-over-streams contract.

    The plan IS the batch builder's — :func:`cms_buckets` is pure
    streaming-compatible column algebra, so this delegates rather than
    carrying a second copy that could silently diverge from the
    "batch oracle applies verbatim" contract.
    """
    from bb_bigdata_log_tools_spark.operators.sketches import cms_buckets

    return cms_buckets(events, value_col=value_col, depth=depth, width=width)


def stream_quantile_bins(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    scale: int = 1000,
) -> DataFrame:
    """Streaming quantile sketch state: maintain the (grp, s, o, b,
    cnt) sign × octave × sub-bit bin relation as a live COMPLETE-mode
    aggregation — ``sum`` is associative, so the bins are EXACT under
    any micro-batch slicing; O(groups × ~256 bins) state, no watermark
    needed. Same bin algebra as the batch :func:`~bb_bigdata_log_tools_
    spark.operators.sketches.quantile_sketch` (``_octave_keys`` is pure
    streaming-compatible column algebra — one copy, like the CMS pair),
    so the drained bin table feeds the same bin-navigate estimate and
    the batch oracle's bin CTEs apply verbatim.

    Replay caveat (the stream_cms_buckets contract): ``sum`` counters
    are not idempotent — exactly-once sinks/checkpointing required
    under retries.
    """
    from bb_bigdata_log_tools_spark.operators.sketches import _octave_keys

    keys = _octave_keys(events, group_col, value_col, scale)
    return keys.groupBy("grp", "s", "o", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
