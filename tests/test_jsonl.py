"""Round-trip tests for the JSONL shard sink."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators.datasetops import shuffle_shards
from bb_bigdata_log_tools_spark.session import table
from bb_bigdata_log_tools_spark.sources.jsonl import read_jsonl, write_jsonl_shards


def test_jsonl_shard_roundtrip(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    n = write_jsonl_shards(docs, out, n_shards=4)
    assert n == docs.count()
    # 4 shard dirs, each non-empty
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == 4
    back = read_jsonl(spark, os.path.join(out, "shard=*"))
    assert back.count() == n
    # content round-trips (doc_id set identical)
    a = {r.doc_id for r in docs.select("doc_id").collect()}
    b = {r.doc_id for r in back.select("doc_id").collect()}
    assert a == b


def test_jsonl_shard_order_is_deterministic(spark, sf_dir, tmp_path):
    """Line order inside a shard file must follow shard_pos — i.e. two
    exports of the same data are byte-comparable."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_jsonl_shards(docs, p1, n_shards=2)
    write_jsonl_shards(docs, p2, n_shards=2)

    def shard_lines(root):
        out = {}
        for d in sorted(glob.glob(os.path.join(root, "shard=*"))):
            lines = []
            for f in sorted(glob.glob(os.path.join(d, "part-*"))):
                with open(f) as fh:
                    lines += [json.loads(line)["doc_id"] for line in fh]
            out[os.path.basename(d)] = lines
        return out

    s1, s2 = shard_lines(p1), shard_lines(p2)
    assert s1 == s2
    # and matches the declared shard_pos order
    layout = shuffle_shards(docs, 2)
    for shard in (0, 1):
        want = [
            r.doc_id
            for r in layout.filter(F.col("shard") == shard)
            .orderBy("shard_pos")
            .collect()
        ]
        assert s1[f"shard={shard}"] == want
