"""Round-6 operators: invariants the oracle hash-match alone doesn't
state explicitly — CMS never underestimates, Bloom never misses,
URL canonicalization collapses exactly the injected variant classes."""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.session import table


def test_cms_never_underestimates(spark, sf_dir):
    from bb_bigdata_log_tools_spark.operators.sketches import cms_freq_estimate

    out = cms_freq_estimate(table(spark, sf_dir, "events"), "user_id").collect()
    # top-20 report, capped by the distinct-user count at tiny SF
    assert 0 < len(out) <= 20
    for r in out:
        # the defining CMS guarantee: estimate >= exact, always
        assert r.cms_estimate >= r.n_exact
        assert r.overestimate == r.cms_estimate - r.n_exact


def test_bloom_no_false_negatives(spark, sf_dir):
    from bb_bigdata_log_tools_spark.operators.curation import bloom_decontaminate

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    out = bloom_decontaminate(docs, bench).collect()
    assert len(out) > 0
    exact_flagged = 0
    for r in out:
        # Bloom admits false positives but NEVER false negatives
        assert r.n_bloom_hits >= r.n_exact_hits
        if r.flagged_exact:
            exact_flagged += 1
            assert r.flagged_bloom
        assert r.false_positive == (r.flagged_bloom and not r.flagged_exact)
    assert exact_flagged > 0  # the benchmark subset itself self-hits


def test_dedup_url_collapses_variant_classes(spark, sf_dir):
    from bb_bigdata_log_tools_spark.registry_curation import q_dedup_url

    out = q_dedup_url(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # canonical forms carry no fragment / utm query / trailing slash
        # and a lowercase host
        assert "#" not in r.canonical_url
        assert "utm_" not in r.canonical_url
        assert not r.canonical_url.endswith("/")
        host = r.canonical_url.split("//")[1].split("/")[0]
        assert host == host.lower()
        assert r.n_variants >= 1
    # at sf0.001 (500 docs) every (site, path) class receives all four
    # injected spellings -> at least one canonical group with >1 variant
    assert any(r.n_variants > 1 for r in out)


def test_bpe_pair_stats_deterministic_topn(spark, sf_dir):
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_pair_stats

    docs = table(spark, sf_dir, "documents")
    a = [tuple(r) for r in bpe_pair_stats(docs, 25).collect()]
    b = [tuple(r) for r in bpe_pair_stats(docs, 25).collect()]
    assert a == b and len(a) == 25
    assert all(len(p) == 2 for p, _n in a)


def test_cms_plan_partial_agg(spark, sf_dir):
    """The sketch build must partial-aggregate map-side (two
    HashAggregate phases around one exchange) — the mergeable-counter
    property realized in the plan."""
    from bb_bigdata_log_tools_spark.operators.sketches import cms_buckets

    plan = (
        cms_buckets(table(spark, sf_dir, "events"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2, plan[:1200]
    assert "rangepartitioning" not in plan.lower()


def test_corpus_curate_decisions(spark, sf_dir):
    """The capstone emits every document exactly once, decisions span
    multiple classes at fixture scale, and 'kept' details are splits."""
    from bb_bigdata_log_tools_spark.registry_curation import q_corpus_curate

    docs = table(spark, sf_dir, "documents")
    out = q_corpus_curate(spark, sf_dir).collect()
    assert len(out) == docs.count()
    classes = {r.decision for r in out}
    assert "kept" in classes and len(classes) >= 2, classes
    for r in out:
        if r.decision == "kept":
            assert r.detail in ("train", "val", "test")
        elif r.decision in ("dup_exact", "dup_near"):
            keeper = int(r.detail)
            assert keeper != r.doc_id
    # every dup keeper must itself be a kept doc (transitive resolution)
    kept_or_self = {r.doc_id for r in out if r.decision in ("kept", "contaminated", "quality")}
    for r in out:
        if r.decision in ("dup_exact", "dup_near"):
            k = int(r.detail)
            dec = next(x.decision for x in out if x.doc_id == k)
            assert dec not in ("dup_exact", "dup_near"), (r.doc_id, k, dec)


def test_parquet_footer_max_and_int96_fallback(spark, sf_dir, tmp_path):
    """The stream_sessionize sentinel reads max(ts) from parquet footer
    stats; INT96-encoded timestamps carry no stats and must return None
    (scan fallback), TIMESTAMP_MICROS must return the exact max."""
    from pyspark.sql import functions as F

    from bb_bigdata_log_tools_spark.registry_streaming import _parquet_footer_max

    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)

    d_int96 = str(tmp_path / "int96")
    spark.conf.set(key, "INT96")
    ev.write.mode("overwrite").parquet(d_int96)
    assert _parquet_footer_max(d_int96, "ts") is None

    d_micros = str(tmp_path / "micros")
    spark.conf.set(key, "TIMESTAMP_MICROS")
    ev.write.mode("overwrite").parquet(d_micros)
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)
    fm = _parquet_footer_max(d_micros, "ts")
    assert fm is not None
    scan_max = ev.agg(F.max("ts")).collect()[0][0]
    assert fm.replace(tzinfo=None) == scan_max
    # missing column name -> honest None
    assert _parquet_footer_max(d_micros, "no_such_col") is None
    # empty dir -> None
    assert _parquet_footer_max(str(tmp_path / "empty"), "ts") is None


def test_overlap_kmv_sketch_contract(spark, sf_dir):
    """Pairs whose true union fits in the sketch are EXACT; estimates
    stay within the expected KMV error envelope otherwise."""
    from bb_bigdata_log_tools_spark.operators.sketches import overlap_kmv

    out = overlap_kmv(table(spark, sf_dir, "events"), k=64).collect()
    assert len(out) > 0
    for r in out:
        if r.n_union_exact < 64:  # sketch holds the whole union
            assert r.union_est == float(r.n_union_exact)
            assert r.jaccard_est == r.jaccard_exact
        else:
            assert abs(r.union_est - r.n_union_exact) / r.n_union_exact < 0.5
            assert abs(r.jaccard_est - r.jaccard_exact) <= 0.3


def test_decontaminate_text_col_plumbs_through(spark, sf_dir):
    """Both decontamination variants accept a non-default text column
    (doc_shingle_hashes hardcodes 'text' internally — the call sites
    must alias; a bare .select('doc_id', text_col) crashed)."""
    from bb_bigdata_log_tools_spark.operators.curation import (
        bloom_decontaminate,
        decontaminate,
    )

    docs = table(spark, sf_dir, "documents").withColumnRenamed("text", "body")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    exact = decontaminate(docs, bench, text_col="body").collect()
    bloom = bloom_decontaminate(docs, bench, text_col="body").collect()
    assert len(exact) > 0 and len(bloom) > 0
    # same docs flagged as the default-column run on the same data
    flagged = {r.doc_id for r in exact if r.contaminated}
    assert flagged == {r.doc_id for r in bloom if r.flagged_exact}


def test_quantile_sketch_error_bound(spark, sf_dir):
    """The defining guarantee of the sign/octave/sub-bit histogram: the
    bin's relative half-width is <= 25%, so the midpoint estimate of
    the rank-r bin is within 25% of the true rank-r value whenever that
    value is >= 2/scale (below that, bins are exact points)."""
    from bb_bigdata_log_tools_spark.registry_datasetops import q_quantile_sketch

    out = q_quantile_sketch(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.n > 0
        if abs(r.exact_val) >= 0.002:
            assert r.abs_err <= 0.25 * abs(r.exact_val) + 1e-9, r
        # the estimate is always a bin midpoint: reconstructable sign
        assert (r.sketch_est >= 0) == (r.exact_val >= 0) or r.sketch_est == 0


def test_quantile_sketch_state_bounded_and_mergeable(spark, sf_dir):
    """The sketch state is <= ~256 bins per group (bounded for the whole
    int64 domain) and merges by sum: building one sketch over a 2x
    duplicated corpus equals doubling the counters of the original."""
    from pyspark.sql import functions as F

    from bb_bigdata_log_tools_spark.operators.sketches import quantile_sketch

    ev = table(spark, sf_dir, "events").select("event_type", "value")
    doubled = ev.unionByName(ev)
    a = {
        (r.event_type, r.q): r.sketch_est
        for r in quantile_sketch(ev).collect()
    }
    b = {
        (r.event_type, r.q): r.sketch_est
        for r in quantile_sketch(doubled).collect()
    }
    # doubling every count leaves all quantile ranks in the same bins
    assert a == b


def test_cms_missing_bucket_probe_reports_zero(spark, sf_dir):
    """A probe item whose bucket rows are absent from the sketch (e.g. a
    partially drained stream) must surface with estimate 0, never drop
    from the report (ADVICE r6): left join + coalesce(cnt, 0)."""
    from bb_bigdata_log_tools_spark.operators.sketches import (
        cms_buckets,
        cms_estimate_from_sketch,
    )

    ev = table(spark, sf_dir, "events")
    # sketch built from clicks only; probes drawn from ALL event types,
    # so some probe buckets have no sketch rows at all
    sketch = cms_buckets(ev.filter(F.col("event_type") == "click"), "user_id")
    exact = ev.groupBy(F.col("user_id").cast("string").alias("v")).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    out = cms_estimate_from_sketch(sketch, exact, top_n=20).collect()
    assert len(out) == min(20, exact.count())
    for r in out:
        assert r.cms_estimate >= 0
