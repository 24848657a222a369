"""Round-6 10x scale probes for the quadratic-risk newcomers.

Protocol (BASELINE.md): same JVM, warm; replicate sf0.1 documents 10x
with DISTINCT doc_ids but IDENTICAL texts -- the adversarial
duplication-heavy shape that inflates candidate pairs ~100x inside
copy families -- and compare wall clock 1x vs 10x. Pass bar: <2x wall
for 10x rows, or the op needs a fix.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from bb_bigdata_log_tools_spark.session import get_spark, table
from bb_bigdata_log_tools_spark.operators import dedup
from bb_bigdata_log_tools_spark.operators import textprep
from bb_bigdata_log_tools_spark.registry_pipeline import (
    WINNOW_K, WINNOW_W, WINNOW_T, WINNOW_MAX_DF,
    SUBSTR_GRAM, SUBSTR_MIN_LEN, SUBSTR_MAX_DF,
)
from bb_bigdata_log_tools_spark.registry_textprep import (
    TFIDF_COS_THRESHOLD, TFIDF_COS_MAX_DF_FRAC,
)

spark = get_spark("probe-r6")
spark.sparkContext.setLogLevel("ERROR")
docs1 = table(spark, "/root/testdata/sf0.1", "documents").localCheckpoint()
docs10 = docs1
for k in range(1, 10):
    docs10 = docs10.unionByName(
        docs1.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000_000))
    )
docs10 = docs10.repartition(32).localCheckpoint()
print("rows:", docs1.count(), docs10.count(), flush=True)

OPS = {
    "dedup_winnowing": lambda d: dedup.dedup_winnowing(d, WINNOW_K, WINNOW_W, WINNOW_T, WINNOW_MAX_DF),
    "dedup_suffix_array": lambda d: dedup.dedup_substring(d, SUBSTR_GRAM, SUBSTR_MIN_LEN, SUBSTR_MAX_DF),
    "dedup_graph_triangles": lambda d: dedup.dedup_graph_triangles(d),
    "tfidf_cosine_pairs": lambda d: textprep.tfidf_cosine_pairs(d, TFIDF_COS_THRESHOLD, TFIDF_COS_MAX_DF_FRAC),
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
