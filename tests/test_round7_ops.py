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
