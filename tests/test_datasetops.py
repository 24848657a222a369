"""Invariant tests for the dataset-layout operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators import analytics, datasetops, similarity
from bb_bigdata_log_tools_spark.session import table


def test_shuffle_shards_is_permutation(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n = docs.count()
    out = datasetops.shuffle_shards(docs, 8)
    assert out.count() == n
    # every doc exactly once
    assert out.select("doc_id").distinct().count() == n
    # shard_pos is 1..size within each shard, no gaps
    chk = out.groupBy("shard").agg(
        F.count("*").alias("sz"), F.max("shard_pos").alias("mx"),
        F.min("shard_pos").alias("mn"),
    )
    bad = chk.filter((F.col("mx") != F.col("sz")) | (F.col("mn") != 1)).count()
    assert bad == 0
    # deterministic: second run bit-identical
    again = datasetops.shuffle_shards(docs, 8)
    assert out.exceptAll(again).count() == 0


def test_shuffle_shards_balanced(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    sizes = [
        r.sz
        for r in datasetops.shuffle_shards(docs, 8)
        .groupBy("shard")
        .agg(F.count("*").alias("sz"))
        .collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) < 2 * min(sizes), sizes


def test_filter_blocklist_df_equals_list(spark, sf_dir):
    """The broadcast-DataFrame variant must select exactly the same
    surviving documents as the literal-array variant."""
    from bb_bigdata_log_tools_spark.registry_curation import _inject_urls

    docs = _inject_urls(table(spark, sf_dir, "documents"))
    bl = ["cdn1.net", "site2.example.com"]
    a = datasetops.filter_blocklist(docs, bl, text_col="text2").select("doc_id")
    bl_df = spark.createDataFrame([(d,) for d in bl], "domain string")
    b = datasetops.filter_blocklist(docs, bl_df, text_col="text2").select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # and it actually filtered something
    assert a.count() < docs.count()


def test_events_retention_invariants(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    out = analytics.events_retention(ev).collect()
    assert out, "empty retention matrix"
    for r in out:
        assert 0 < r.retention <= 1.0
        assert r.n_active <= r.cohort_size
        if r.day_offset == 0:
            assert r.retention == 1.0


def test_semdedup_flags_subset_and_keeps_representative(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    out = similarity.semdedup(emb, 0.3, 8, 64)
    rows = out.collect()
    flagged = {r.vec_id for r in rows}
    for r in rows:
        # a removed vector's nearest kept/earlier neighbor is lower-id
        assert r.dup_of < r.vec_id
        assert r.max_cos >= 0.3
    # the kept set is non-empty (never removes everything)
    assert len(flagged) < emb.count()


def test_time_rollup_grains_consistent(spark, sf_dir):
    """Re-aggregated day/week totals must equal their finer grains."""
    ev = table(spark, sf_dir, "events")
    rows = analytics.time_rollup(ev).collect()
    by_grain = {}
    for r in rows:
        g = by_grain.setdefault(r.grain, [0, 0.0])
        g[0] += r.n_events
        g[1] += r.total_value
    assert by_grain["hour"][0] == by_grain["day"][0] == by_grain["week"][0]
    assert abs(by_grain["hour"][1] - by_grain["day"][1]) < 0.5
    assert abs(by_grain["day"][1] - by_grain["week"][1]) < 0.5
    # hour rows dominate
    n = {g: sum(1 for r in rows if r.grain == g) for g in by_grain}
    assert n["hour"] > n["day"] >= n["week"]


def test_asof_join_semantics(spark, sf_dir):
    """Every match must be the latest right event at-or-before left."""
    ev = table(spark, sf_dir, "events")
    out = analytics.events_asof_join(ev).collect()
    assert out
    matched = [r for r in out if r.matched_event_id is not None]
    assert matched, "no as-of matches at all"
    for r in matched[:50]:
        assert r.lag_us >= 0
    # spot-check one user against a brute-force python scan
    import collections

    rights = collections.defaultdict(list)
    for e in ev.filter(F.col("event_type") == "click").collect():
        rights[e.user_id].append((e.ts, e.event_id))
    for r in matched[:20]:
        cand = [(t, i) for (t, i) in rights[r.user_id] if t <= r.ts]
        assert max(cand) == (r.matched_ts, r.matched_event_id)


def test_kmeans_invariants(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    out = similarity.kmeans_embeddings(emb, 8, 2, 64)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert all(0 <= r.cluster < 8 for r in rows)
    # deterministic across runs
    again = similarity.kmeans_embeddings(emb, 8, 2, 64)
    assert out.exceptAll(again).count() == 0


def test_split_assign_stability_and_fractions(spark, sf_dir):
    """A document's split never changes when the corpus changes
    (content-independent hash), and holdout fractions are in the right
    ballpark per stratum."""
    docs = table(spark, sf_dir, "documents")
    full = {
        r.doc_id: r.split
        for r in datasetops.split_assign(docs).select("doc_id", "split").collect()
    }
    half = {
        r.doc_id: r.split
        for r in datasetops.split_assign(docs.filter(F.col("doc_id") % 2 == 0))
        .select("doc_id", "split")
        .collect()
    }
    for k, v in half.items():
        assert full[k] == v
    n = len(full)
    n_train = sum(1 for v in full.values() if v == "train")
    assert 0.8 <= n_train / n <= 0.98
