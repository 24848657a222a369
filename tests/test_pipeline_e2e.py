"""End-to-end curation pipeline: the ops composed the way a real
training-data job runs them — filter → scrub → near-dup drop → split →
shard → export — with conservation invariants at each stage."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators.curation import pii_scrub, quality_filter
from bb_bigdata_log_tools_spark.operators.datasetops import split_assign
from bb_bigdata_log_tools_spark.operators.dedup import dedup_keep_best
from bb_bigdata_log_tools_spark.session import table
from bb_bigdata_log_tools_spark.sources.jsonl import read_jsonl, write_jsonl_shards


def test_full_curation_pipeline(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate
    qf = quality_filter(docs)
    kept = qf.filter(F.col("keep")).select("doc_id", "text", "lang", "source", "n_chars")
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. PII scrub (replaces text, keeps every row)
    scrubbed = pii_scrub(kept).withColumn("text", F.col("text_scrubbed"))
    assert scrubbed.count() == n1

    # 3. near-dup drop list (computed on the ORIGINAL corpus — clusters
    # must reference doc ids that still exist upstream of the filter)
    drops = dedup_keep_best(docs)
    drop_ids = {r.doc_id for r in drops.select("doc_id").collect()}
    deduped = scrubbed.filter(~F.col("doc_id").isin(list(drop_ids) or [-1]))
    n2 = deduped.count()
    assert n2 <= n1

    # 4. split + 5. shard + 6. export train shards as JSONL
    final = split_assign(deduped).filter(F.col("split") == "train").select(
        "doc_id", "source", "text"
    )
    n3 = final.count()
    assert 0 < n3 <= n2
    out = str(tmp_path / "train")
    written = write_jsonl_shards(final, out, n_shards=4)
    assert written == n3

    # conservation: every exported doc survived every stage; no dropped
    # or held-out doc leaks into the training set
    back = read_jsonl(spark, os.path.join(out, "shard=*"))
    exported = {r.doc_id for r in back.select("doc_id").collect()}
    assert len(exported) == n3
    assert not (exported & drop_ids), "near-dup drop leaked into export"
    holdout = {
        r.doc_id
        for r in split_assign(deduped)
        .filter(F.col("split") != "train")
        .select("doc_id")
        .collect()
    }
    assert not (exported & holdout), "holdout doc leaked into training set"

    # the export is line-valid JSONL with the expected fields
    a_file = sorted(glob.glob(os.path.join(out, "shard=*", "part-*")))[0]
    with open(a_file) as fh:
        first = json.loads(fh.readline())
    assert set(first) >= {"doc_id", "source", "text"}
