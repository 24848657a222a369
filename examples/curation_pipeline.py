"""Worked example: an LLM training-data curation pass, end to end.

Run:  python examples/curation_pipeline.py [sf_dir]

template triage → quality feature matrix → gate → PII scrub →
exact + substring + near dedup → perplexity bucketing → deterministic
split → shard layout. Every step is lazy; the pipeline is one Catalyst
plan per action, and each operator documents its 100 TB shape in its
docstring.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bb_bigdata_log_tools_spark.operators import (  # noqa: E402
    curation,
    datasetops,
    dedup,
    textprep,
    textqc,
)
from bb_bigdata_log_tools_spark.session import get_spark, table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> None:
    owns_session = spark is None
    if owns_session:
        spark = get_spark()
    docs = table(spark, sf_dir, "documents")

    # 0. cheapest signals first: whole template families in one pass,
    #    then the full per-doc quality feature matrix (what a learned
    #    filter would train on)
    fams = textprep.near_template_clusters(docs)
    print("template families:", fams.count())
    textqc.quality_feature_matrix(docs).show(3)

    # 1. gopher-style quality gate (pure scan, no shuffle)
    gated = curation.quality_filter(docs).filter(F.col("keep")).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    # 2. PII scrub (codegen regexes)
    scrubbed = curation.pii_scrub(gated)
    print("pii rows:", scrubbed.filter(F.col("pii_total") > 0).count())

    # 3. exact dedup drop list, duplicated-substring spans, near-dup
    #    clusters
    dupes = dedup.dedup_exact(gated).filter(F.col("n_copies") > 1)
    print("dup groups:", dupes.count())
    spans = dedup.dedup_substring(gated, gram_len=20, min_len=30)
    print("substring-dup pairs:", spans.count())
    clusters = dedup.dedup_cluster(gated)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id"))
    kept = gated.join(drop.select("doc_id"), "doc_id", "left_anti")
    print("kept after near-dedup:", kept.count())

    # 4. perplexity buckets (broadcast quantile cutoffs)
    curation.perplexity_buckets(kept).groupBy("bucket").count().show()

    # 5. deterministic stratified split + shard layout
    split = datasetops.split_assign(kept)
    split.groupBy("split").count().show()
    datasetops.shuffle_shards(kept, n_shards=8).show(5)

    # 6. or run the whole thing as ONE decision list — quality gate,
    #    exact/near dedup (transitively-resolved keepers), benchmark
    #    decontamination, split — the corpus_curate capstone:
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    decisions = curation.corpus_curate(docs, bench)
    decisions.groupBy("decision").count().orderBy("decision").show()

    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
