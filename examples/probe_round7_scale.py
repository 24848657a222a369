"""Round-7 10x scale probes for the late newcomers.

Protocol (BASELINE.md, round-6 sweep): same JVM, warm; replicate sf0.1
documents 10x with DISTINCT doc_ids but IDENTICAL texts and compare
wall clock 1x vs 10x. This duplication-heavy shape is adversarial for
each op in its own way:

- dedup_lines: EVERY line becomes corpus-repeated (10 copies), so the
  count join carries the maximal flagged fraction and the hottest line
  keys (blank/boilerplate) get 10x hotter.
- bpe_train: the corpus scan grows 10x but the (word, freq) vocab
  relation keeps the SAME row count (freqs just scale) -- the probe
  verifies the merge iterations really are vocab-bound, not
  corpus-bound.
- sample_weighted_exact: 10x rows through the per-row draw-key
  expression and the salted two-phase top-N (phase-2 survivor bound is
  n*salts regardless of input rows).

Pass bar: <2x wall for 10x rows, or the op needs a fix.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from bb_bigdata_log_tools_spark.session import get_spark, table
from bb_bigdata_log_tools_spark.operators import dedup, textprep
from bb_bigdata_log_tools_spark.operators.curation import (
    sample_weighted_exact,
)
from bb_bigdata_log_tools_spark.registry_textprep import _BPE_MERGES
from bb_bigdata_log_tools_spark.registry_curation import _SWX_N, _SWX_CAP

spark = get_spark("probe-r7")
spark.sparkContext.setLogLevel("ERROR")
docs1 = table(spark, "/root/testdata/sf0.1", "documents").localCheckpoint()
docs10 = docs1
for k in range(1, 10):
    docs10 = docs10.unionByName(
        docs1.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000_000))
    )
docs10 = docs10.repartition(32).localCheckpoint()
print("rows:", docs1.count(), docs10.count(), flush=True)


def swx(d):
    toks = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    return sample_weighted_exact(
        d.select("doc_id", toks.cast("long").alias("wt")),
        n=_SWX_N,
        max_tickets=_SWX_CAP,
    )


OPS = {
    "dedup_lines": lambda d: dedup.dedup_lines(d),
    "bpe_train": lambda d: textprep.bpe_train(d, n_merges=_BPE_MERGES),
    "sample_weighted_exact": swx,
}

for name, fn in OPS.items():
    # warm once at 1x (untimed), then time 1x and 10x
    fn(docs1).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter(); fn(docs1).write.format("noop").mode("overwrite").save()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); out = fn(docs10); out.write.format("noop").mode("overwrite").save()
    t10 = time.perf_counter() - t0
    print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s ratio={t10/t1:.2f}", flush=True)
spark.stop()
