"""Round-7 third-session 10x scale probe: sample_weighted_stratified.

Protocol (BASELINE.md, round-6 sweep): same JVM, warm; replicate sf0.1
documents 10x with DISTINCT doc_ids but IDENTICAL texts and compare
wall clock 1x vs 10x. The duplication shape is adversarial here
because every stratum grows 10x while n_per_group stays fixed — the
phase-1 (group, salt) windows each sort 10x the rows, but the phase-2
survivor bound (n_per_group * salts per group) is input-size
independent, so wall should scale like one scan + one bounded shuffle.

Pass bar: <2x wall for 10x rows, or the op needs a fix.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from bb_bigdata_log_tools_spark.session import get_spark, table
from bb_bigdata_log_tools_spark.operators.curation import (
    sample_weighted_stratified,
)
from bb_bigdata_log_tools_spark.registry_curation import _SWS_N, _SWS_CAP

spark = get_spark("probe-r7s3")
spark.sparkContext.setLogLevel("ERROR")
docs1 = table(spark, "/root/testdata/sf0.1", "documents").localCheckpoint()
docs10 = docs1
for k in range(1, 10):
    docs10 = docs10.unionByName(
        docs1.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000_000))
    )
docs10 = docs10.repartition(32).localCheckpoint()


def run(docs):
    toks = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    d = docs.select("doc_id", "source", toks.cast("long").alias("wt"))
    out = sample_weighted_stratified(
        d, n_per_group=_SWS_N, group_col="source", max_tickets=_SWS_CAP
    )
    t0 = time.time()
    n = out.count()
    return n, time.time() - t0


run(docs1)  # warm
n1, t1 = run(docs1)
n10, t10 = run(docs10)
print(f"1x:  rows={n1}  wall={t1:.2f}s")
print(f"10x: rows={n10} wall={t10:.2f}s  ratio={t10 / t1:.2f}x")
spark.stop()
