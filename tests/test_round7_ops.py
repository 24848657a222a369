"""Round-7 operators: invariants the oracle hash-match alone doesn't
state — weighted CMS never underestimates, the weighted quantile bound
holds where documented (o ≥ 2), and weighted sketch state stays
mergeable by sum."""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.session import table


def test_cms_weighted_never_underestimates(spark, sf_dir):
    from bb_bigdata_log_tools_spark.registry_datasetops import q_cms_weighted_freq

    out = q_cms_weighted_freq(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    for r in out:
        # nonneg weights -> the CMS guarantee carries over: est >= exact
        assert r.w_estimate >= r.w_exact
        assert r.overestimate == r.w_estimate - r.w_exact


def test_weighted_quantile_error_bound(spark, sf_dir):
    from bb_bigdata_log_tools_spark.registry_datasetops import (
        q_weighted_quantile_sketch,
    )

    out = q_weighted_quantile_sketch(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.w_total > 0
        # documented bound: <= 25% relative error where the exact value
        # has octave >= 2 (|floor(v*scale)| >= 2; scale=1, n_chars >= 2)
        if abs(r.exact_val) >= 2:
            assert abs(r.sketch_est - r.exact_val) <= 0.25 * abs(r.exact_val) + 1e-9, r


def test_weighted_quantile_state_mergeable(spark, sf_dir):
    """Doubling every row doubles all weights, leaving every weighted
    rank in the same bins — the merge-by-sum property."""
    from bb_bigdata_log_tools_spark.operators.sketches import (
        quantile_sketch_weighted,
    )

    docs = table(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    d = docs.select("lang", "n_chars", toks.cast("long").alias("w"))
    one = {
        (r.lang, r.q): (r.sketch_est, r.exact_val)
        for r in quantile_sketch_weighted(d, "lang", "n_chars", "w", scale=1).collect()
    }
    two = {
        (r.lang, r.q): (r.sketch_est, r.exact_val)
        for r in quantile_sketch_weighted(
            d.unionAll(d), "lang", "n_chars", "w", scale=1
        ).collect()
    }
    assert one == two


def test_sketches_ignore_null_values(spark, sf_dir):
    """Every sketch op follows the countDistinct convention: NULL
    values contribute NOTHING. Pre-fix, md5_long(NULL)=NULL created a
    phantom HLL register (inflating `present`), stole rank 1 in the
    KMV bottom-k windows (NULLS FIRST), counted into a phantom CMS
    bucket, and binned into a (s=1, o=NULL) quantile bin that inflated
    n and every cumulative sum."""
    from bb_bigdata_log_tools_spark.operators.sketches import (
        approx_distinct_hll,
        approx_distinct_kmv,
        cms_freq_estimate,
        overlap_kmv,
        quantile_sketch,
    )

    clean = spark.createDataFrame(
        [("a", i % 37, float(i % 11)) for i in range(300)]
        + [("b", i % 19, float(i % 7)) for i in range(150)],
        "event_type string, user_id long, value double",
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [("a", None, None)] * 25 + [("b", None, None)] * 10,
            "event_type string, user_id long, value double",
        )
    )
    for op in (
        lambda d: approx_distinct_hll(d),
        lambda d: approx_distinct_kmv(d, k=16),
        lambda d: cms_freq_estimate(d, top_n=5),
        lambda d: overlap_kmv(d, k=16),
        lambda d: quantile_sketch(d),
    ):
        assert sorted(map(tuple, op(clean).collect())) == sorted(
            map(tuple, op(dirty).collect())
        )


def _skew_stream_from_dir(spark, src):
    from pyspark.sql import functions as F

    return (
        spark.readStream.format("text")
        .option("path", str(src))
        .option("maxFilesPerTrigger", 1)
        .load()
        .withColumn("event_time", F.to_timestamp(F.substring("value", 1, 19)))
        .withColumn("user_id", F.split("value", " ").getItem(1).cast("long"))
        .withColumn("event_type", F.split("value", " ").getItem(2))
        .withColumn("event_id", F.split("value", " ").getItem(3).cast("long"))
        .select("event_id", "user_id", "event_type", "event_time")
    )


def test_stream_skew_asof_per_key_watermark(spark, tmp_path):
    """The per-key frontier must let a key that LAGS the stream by
    hours still match, while the lagging key's own buffer is trimmed by
    its OWN frontier — the property the built-in stream-stream join
    (global-watermark eviction) cannot express without retaining every
    key's state for the whole skew horizon.

    Batch 1 (file a): fast user 1 at 10:00-12:00. Batch 2 (file b,
    later mtime): slow user 2 arrives with 06:00-06:30 events — six
    hours behind user 1's frontier. With within=1h the slow pair must
    still match (its OWN frontier is 06:30), and user 1's second
    purchase matches its in-window click across batches."""
    import time

    from bb_bigdata_log_tools_spark.streaming.ops import stream_skew_asof_join

    src = tmp_path / "skew"
    src.mkdir()
    (src / "a.txt").write_text(
        "2024-01-01T10:00:00 1 click 100\n"
        "2024-01-01T10:30:00 1 purchase 101\n"
        "2024-01-01T12:00:00 1 click 102\n"
    )
    time.sleep(1.1)  # file-source orders by mtime: b drains after a
    (src / "b.txt").write_text(
        "2024-01-01T06:00:00 2 click 200\n"
        "2024-01-01T06:30:00 2 purchase 201\n"
        "2024-01-01T12:30:00 1 purchase 103\n"
    )
    out = stream_skew_asof_join(
        _skew_stream_from_dir(spark, src), within_ms=3_600_000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("skew_asof")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.user_id, r.purchase_id, r.click_id, r.lag_ms)
        for r in spark.sql("SELECT * FROM skew_asof").collect()
    }
    # fast key, batch 1: purchase 101 <- click 100 (30 min)
    assert (1, 101, 100, 1_800_000) in rows
    # SLOW key, batch 2, six hours behind the global frontier: still
    # matched, because eviction is per-key, not global
    assert (2, 201, 200, 1_800_000) in rows
    # fast key cross-batch: purchase 103 (12:30) <- click 102 (12:00)
    assert (1, 103, 102, 1_800_000) in rows
    assert len(rows) == 3


def test_stream_skew_asof_state_trims_by_own_frontier(spark, tmp_path):
    """A click that falls out of a key's own (within + reorder) horizon
    is evicted and cannot match a much later purchase — state is
    bounded by the key's frontier, and a per-key-late purchase is
    dropped rather than partially matched."""
    import time

    from bb_bigdata_log_tools_spark.streaming.ops import stream_skew_asof_join

    src = tmp_path / "trim"
    src.mkdir()
    (src / "a.txt").write_text(
        "2024-01-01T00:00:00 5 click 500\n"
        "2024-01-01T09:00:00 5 click 501\n"  # frontier 09:00
    )
    time.sleep(1.1)
    (src / "b.txt").write_text(
        # purchase at 00:10 is BELOW the key watermark (09:00 - 1h
        # reorder = 08:00): dropped, not matched against evicted 500
        "2024-01-01T00:10:00 5 purchase 502\n"
        # purchase at 09:30 matches the in-horizon click 501
        "2024-01-01T09:30:00 5 purchase 503\n"
    )
    out = stream_skew_asof_join(
        _skew_stream_from_dir(spark, src),
        within_ms=3_600_000,
        reorder_ms=3_600_000,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("skew_trim")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM skew_trim").collect()
    }
    assert rows == {(503, 501)}


def test_stream_skew_asof_right_rows_match_as_of_arrival(spark, tmp_path):
    """Documented contract: the right side matches AS-OF ARRIVAL — a
    click delivered in a LATER batch than a purchase it precedes in
    event time does not retro-match (append mode cannot retract), while
    a later purchase of the same key does see it."""
    import time

    from bb_bigdata_log_tools_spark.streaming.ops import stream_skew_asof_join

    src = tmp_path / "arrival"
    src.mkdir()
    (src / "a.txt").write_text(
        "2024-01-01T10:00:00 9 click 900\n"
        "2024-01-01T10:30:00 9 purchase 901\n"
    )
    time.sleep(1.1)
    (src / "b.txt").write_text(
        # event-time 10:20 precedes purchase 901, but arrives after it
        "2024-01-01T10:20:00 9 click 902\n"
        "2024-01-01T10:40:00 9 purchase 903\n"
    )
    out = stream_skew_asof_join(
        _skew_stream_from_dir(spark, src), within_ms=3_600_000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("skew_arrival")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM skew_arrival").collect()
    }
    # 901 resolved in batch 1 against click 900 (902 not yet arrived);
    # 903 resolved in batch 2 against the now-buffered 902
    assert rows == {(901, 900), (903, 902)}


def test_stream_sessionize_cross_batch_late_events(spark, tmp_path):
    """The session frontier must NEVER move backwards: a cross-batch
    late event inside/adjacent to the open session merges into it
    (pre-fix it regressed last_ms, splitting the session spuriously and
    emitting session_end < session_start), and a late event older than
    the open session by more than the gap closes immediately as its own
    1-event session (its true session may already be emitted)."""
    import time

    from bb_bigdata_log_tools_spark.streaming.ops import stream_sessionize

    src = tmp_path / "late_sess"
    src.mkdir()
    (src / "a.txt").write_text(
        "2024-01-01T12:00:00 7 click 1\n"
        "2024-01-01T12:10:00 7 click 2\n"  # open session [12:00, 12:10]
    )
    time.sleep(1.1)
    (src / "b.txt").write_text(
        "2024-01-01T10:00:00 7 click 3\n"  # > gap older: late singleton
        "2024-01-01T11:55:00 7 click 4\n"  # gap-adjacent: extends start
        "2024-01-01T12:35:00 7 click 5\n"  # forward extension
        "2024-01-01T13:30:00 7 click 6\n"  # > gap: closes the session
    )
    out = stream_sessionize(
        _skew_stream_from_dir(spark, src),
        gap_minutes=30,
        ts_col="event_time",
        watermark="3 hours",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM late_sess").collect()
    }
    base = 1704067200000  # 2024-01-01T00:00:00Z
    h, m = 3_600_000, 60_000
    assert rows == {
        (base + 10 * h, base + 10 * h, 1),  # late singleton
        # merged open session: backward-extended to 11:55, forward to
        # 12:35, five events (2 from batch 1 + late 4 + 5... the late
        # singleton 3 is its own row), closed by the 13:30 gap
        (base + 11 * h + 55 * m, base + 12 * h + 35 * m, 4),
    }
    for start, end, _ in rows:
        assert start <= end


def test_write_boom_tree_bytes_deterministic(spark, tmp_path):
    """The one-task-per-hourly-file writer sorts lines before encoding
    and publishes via atomic rename — two runs over the same input must
    produce byte-identical trees (retry/rerun reproducibility)."""
    import hashlib
    import os

    from bb_bigdata_log_tools_spark.session import table
    from bb_bigdata_log_tools_spark.sources.boom import write_boom_tree
    from bb_bigdata_log_tools_spark.sources.logs import events_as_logs

    logs = events_as_logs(table(spark, "/root/testdata/sf0.001", "events"))

    def tree_digest(root):
        n = write_boom_tree(logs, root, "dc1", "svc1", "logs", "comp1")
        digests = {}
        for dirpath, _dirs, files in os.walk(root):
            for f in sorted(files):
                p = os.path.join(dirpath, f)
                rel = os.path.relpath(p, root)
                digests[rel] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return n, digests

    n1, d1 = tree_digest(str(tmp_path / "t1"))
    n2, d2 = tree_digest(str(tmp_path / "t2"))
    assert n1 == n2 > 0
    assert d1 == d2
    assert not any(".inprogress" in k for k in d1)


def test_dedup_lines_strips_boilerplate_keeps_prose(spark, sf_dir):
    """C4 discipline on a controlled corpus: corpus-repeated lines
    (boilerplate planted in two docs, plus an intra-doc repeat) are
    stripped; unique prose lines survive in original order."""
    from bb_bigdata_log_tools_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal prose one\nunique line alpha"),
            (2, "cookie banner\nreal prose two"),  # case-insensitive repeat
            (3, "solo document line\nrepeat me\nrepeat me"),  # intra-doc
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_lines(docs, min_count=2).collect()}
    assert out[1].n_lines == 3 and out[1].n_removed == 1
    assert out[2].n_lines == 2 and out[2].n_removed == 1
    assert out[3].n_lines == 3 and out[3].n_removed == 2
    import hashlib

    assert out[1].kept_md5 == hashlib.md5(
        b"real prose one\nunique line alpha"
    ).hexdigest()
    assert out[3].kept_md5 == hashlib.md5(b"solo document line").hexdigest()


def test_dedup_lines_registry_removes_at_least_planted(spark, sf_dir):
    """Registry fixture: every doc carrying planted boilerplate removes
    AT LEAST those lines (the synthetic corpus also contains duplicate
    documents whose real lines legitimately repeat corpus-wide)."""
    from bb_bigdata_log_tools_spark.registry_pipeline import q_dedup_lines

    rows = {r.doc_id: r for r in q_dedup_lines(spark, sf_dir).collect()}
    assert rows
    for doc_id, r in rows.items():
        planted = (1 if doc_id % 7 == 0 else 0) + (1 if doc_id % 11 == 0 else 0)
        assert r.n_removed >= planted, (doc_id, r)
        assert r.n_lines > planted


def test_sample_weighted_exact_semantics(spark, sf_dir):
    """Ticketed min-hash draw: exact-N, zero-weight rows never drawn,
    rerun-deterministic, and adding tickets (weight) can only improve
    (never worsen) a row's draw key — the monotonicity that makes the
    scheme proportional-to-weight."""
    from pyspark.sql import functions as F

    from bb_bigdata_log_tools_spark.operators.curation import (
        sample_weighted_exact,
    )

    base = spark.createDataFrame(
        [(i, (i % 5) * 10) for i in range(200)], "doc_id long, wt long"
    )
    out1 = sample_weighted_exact(base, n=20).collect()
    out2 = sample_weighted_exact(base, n=20).collect()
    assert [r.doc_id for r in out1] == [r.doc_id for r in out2]
    assert len(out1) == 20
    zero_ids = {i for i in range(200) if (i % 5) == 0}
    assert not ({r.doc_id for r in out1} & zero_ids)
    # monotonicity: doubling every weight only lowers each draw key
    doubled = base.withColumn("wt", F.col("wt") * 2)
    k1 = {
        r.doc_id: r.draw_key
        for r in sample_weighted_exact(base, n=200).collect()
    }
    k2 = {
        r.doc_id: r.draw_key
        for r in sample_weighted_exact(doubled, n=200).collect()
    }
    for doc_id, dk in k1.items():
        assert k2[doc_id] <= dk


def test_sample_weighted_exact_fractional_and_string_keys(spark, sf_dir):
    """Public-seam hardening: a fractional weight in (0,1) quantizes UP
    to exactly ONE ticket — without the ceil clamp it cast to 0 and
    Spark's sequence(1, 0) silently DESCENDED to [1, 0], handing the
    row TWO tickets (more than a weight-1.0 row).  And string keys
    salt through hash() instead of failing pmod analysis."""
    from pyspark.sql import functions as F

    from bb_bigdata_log_tools_spark.operators.curation import (
        sample_weighted_exact,
    )

    frac = spark.createDataFrame(
        [(1, 0.5), (2, 1.0)], "doc_id long, wt double"
    )
    rows = {r.doc_id: r for r in sample_weighted_exact(frac, n=2).collect()}
    assert set(rows) == {1, 2}
    # one ticket each: draw key IS md5("wx:<id>:1"), so recomputing it
    # with an explicit single-ticket weight must match bit-for-bit
    one = {
        r.doc_id: r.draw_key
        for r in sample_weighted_exact(
            frac.withColumn("wt", F.lit(1.0)), n=2
        ).collect()
    }
    assert rows[1].draw_key == one[1] and rows[2].draw_key == one[2]

    skey = spark.createDataFrame(
        [(f"doc-{i}", (i % 3) + 1) for i in range(50)],
        "doc_id string, wt long",
    )
    out = sample_weighted_exact(skey, n=10, key_col="doc_id").collect()
    assert len(out) == 10
    assert [r.sample_rank for r in out] == list(range(1, 11))


def test_bpe_train_fully_merged_word(spark, sf_dir):
    """A word whose tokens fully merge into ONE token must contribute
    no pairs to later steps instead of crashing: sequence(1, size-1)
    with size=1 descends to [1, 0] and element_at(arr, 2) threw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT before the size guard.  Corpus
    'a a a a': step 1 merges (a, </w>) making every word the single
    token 'a</w>'; step 2 must yield no merge row, not an abort."""
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_train

    docs = spark.createDataFrame([(1, "a a a a")], "doc_id long, text string")
    out = bpe_train(docs, n_merges=2).collect()
    assert len(out) == 1
    assert (out[0].step, out[0].left, out[0].right, out[0].pair_freq) == (
        1, "a", "</w>", 4,
    )


def test_dedup_lines_literal_separator(spark, sf_dir):
    """sep is a LITERAL separator, not a regex: '|' must split on pipes
    only (pre-fix, F.split treated it as regex alternation and
    exploded every character into its own 'line')."""
    from bb_bigdata_log_tools_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame(
        [(1, "keep me|boiler|x"), (2, "unique line|boiler|y")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup_lines(docs, sep="|").collect()}
    assert rows[1].n_lines == 3 and rows[1].n_removed == 1
    assert rows[2].n_lines == 3 and rows[2].n_removed == 1
    assert rows[1].n_chars_kept == len("keep me|x")


def test_stream_quantile_equals_batch_sketch(spark, sf_dir):
    """The drained complete-mode bins must equal the batch sketch's
    bins exactly (sum is associative under any micro-batch slicing),
    so the streaming estimates equal the batch sketch_est column
    bit-for-bit on the same fixture."""
    from bb_bigdata_log_tools_spark.registry_datasetops import (
        q_quantile_sketch,
    )
    from bb_bigdata_log_tools_spark.registry_streaming import (
        q_stream_quantile,
    )

    batch = {
        (r.event_type, r.q): (r.n, r.sketch_est)
        for r in q_quantile_sketch(spark, sf_dir).collect()
    }
    stream = {
        (r.event_type, r.q): (r.n, r.sketch_est)
        for r in q_stream_quantile(spark, sf_dir).collect()
    }
    assert stream == batch


def test_bpe_train_textbook_semantics(spark, sf_dir):
    """BPE on a controlled corpus: pair STATS count every adjacent
    occurrence (overlapping — the classic get_stats), merge APPLICATION
    is left-to-right non-overlapping, ties break (freq DESC, pair ASC),
    and later merges build on earlier merged tokens."""
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_train

    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab ab")], "doc_id long, text string"
    )
    out = bpe_train(docs, n_merges=2).collect()
    # step 1: 'aaab' = [a,a,a,b,</w>] x3 -> (a,a) counts BOTH adjacent
    # occurrences: 2*3 = 6; (a,b) = 3+1; (b,</w>) = 3+1 -> merge (a,a)
    assert (out[0].left, out[0].right, out[0].pair_freq) == ("a", "a", 6)
    assert out[0].merged == "aa"
    # step 2: 'aaab' -> [aa,a,b,</w>] (non-overlapping application):
    # (aa,a)=3, (a,b)=3+1=4, (b,</w>)=3+1=4 -> tie: 'a\x01b' < 'b\x01<'
    # -> merge (a, b)
    assert (out[1].left, out[1].right, out[1].pair_freq) == ("a", "b", 4)
    assert out[1].merged == "ab"


def test_sample_weighted_stratified_semantics(spark, sf_dir):
    """Per-group exact-N: every group with >= n eligible rows yields
    exactly n, smaller groups yield all eligible rows, zero-weight
    rows never drawn, ranks are contiguous 1..k within each group,
    and rerun-deterministic."""
    from bb_bigdata_log_tools_spark.operators.curation import (
        sample_weighted_stratified,
    )

    # group g0: 50 rows, g1: 3 rows, g2: only zero-weight rows
    data = (
        [(i, "g0", 5 + i % 7) for i in range(50)]
        + [(100 + i, "g1", 2) for i in range(3)]
        + [(200 + i, "g2", 0) for i in range(4)]
    )
    base = spark.createDataFrame(data, "doc_id long, source string, wt long")
    out1 = sample_weighted_stratified(base, n_per_group=10).collect()
    out2 = sample_weighted_stratified(base, n_per_group=10).collect()
    assert sorted((r.source, r.sample_rank, r.doc_id) for r in out1) == sorted(
        (r.source, r.sample_rank, r.doc_id) for r in out2
    )
    by_group = {}
    for r in out1:
        by_group.setdefault(r.source, []).append(r.sample_rank)
    assert sorted(by_group["g0"]) == list(range(1, 11))
    assert sorted(by_group["g1"]) == [1, 2, 3]  # all eligible, < n
    assert "g2" not in by_group  # zero-weight stratum empty
    # stratified with ONE group == the flat weighted sample's ranking
    from bb_bigdata_log_tools_spark.operators.curation import (
        sample_weighted_exact,
    )

    one = base.filter("source = 'g0'")
    flat = sample_weighted_exact(one, n=10, seed_tag="ws").collect()
    strat = [r for r in out1 if r.source == "g0"]
    assert sorted(r.doc_id for r in flat) == sorted(r.doc_id for r in strat)


def test_sample_weighted_stratified_plan_no_global_sort(spark, sf_dir):
    """Phase-1 window partitions by (group, salt): the plan must not
    contain a partition-less (single-task) window sort."""
    from bb_bigdata_log_tools_spark.operators.curation import (
        sample_weighted_stratified,
    )

    base = spark.createDataFrame(
        [(i, "s%d" % (i % 3), 1 + i % 9) for i in range(100)],
        "doc_id long, source string, wt long",
    )
    plan = sample_weighted_stratified(base, n_per_group=5)._jdf.queryExecution(
    ).executedPlan().toString()
    win_lines = [
        ln for ln in plan.splitlines() if ln.lstrip().startswith(("Window", "+- Window"))
        or "Window [" in ln
    ]
    assert win_lines, plan  # the operator is window-based
    for ln in win_lines:
        # Spark prints Window [exprs], [partition spec], [order spec] —
        # every window here must partition by source (phase 1 adds the
        # salt); a partition-less spec would be the single-task sort
        # this operator exists to avoid
        assert "[source" in ln, ln


def test_ticket_draw_inclusion_proportional_to_weight():
    """Statistical validation of the ticketed min-hash draw SCHEME
    (pure Python, engine-independent — the same md5 arithmetic
    sample_weighted_exact/stratified run in Spark): over 400 fixed
    seed tags, a weight-4 row is included ~3.7x as often as a
    weight-1 row in an 8-of-40 draw (slightly below 4x because
    without-replacement draws compress the ratio), and inclusion
    rates are monotone in weight. Fully deterministic: md5 over
    fixed strings, no RNG."""
    import hashlib
    import statistics

    def draw_key(tag, key, w, cap=256):
        return min(
            int(hashlib.md5(f"{tag}:{key}:{t}".encode()).hexdigest()[:15], 16)
            for t in range(1, min(w, cap) + 1)
        )

    weights = {i: (i % 4) + 1 for i in range(40)}
    n_pick, trials = 8, 400
    counts = {i: 0 for i in weights}
    for tag in range(trials):
        ranked = sorted(weights, key=lambda i: draw_key(tag, i, weights[i]))
        for i in ranked[:n_pick]:
            counts[i] += 1
    by_w = {}
    for i, w in weights.items():
        by_w.setdefault(w, []).append(counts[i] / trials)
    means = {w: statistics.mean(v) for w, v in by_w.items()}
    assert means[1] < means[2] < means[3] < means[4]
    ratio = means[4] / means[1]
    assert 3.2 <= ratio <= 4.2, ratio
