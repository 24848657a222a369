"""Round-9 10x scale probes: the WARC loop and crawl_curate.

Protocol (BASELINE.md sweep discipline): same JVM, warm; compare wall
clock 1x vs 10x input against each operator's claimed scaling shape.

- write_warc + read_warc claim shard-per-task scan parallelism: the
  write is one exchange + one task per shard, the read one task per
  file. With shard count scaled 1x→10x alongside rows (the real
  deployment shape — CC keeps ~1 GB files and grows the file COUNT),
  wall must stay at or under ~10x with no superlinear blowup.
- crawl_curate composes extraction (scan-parallel) + exact-dup
  (md5/doc_id shuffle) + decontamination (broadcast probe; benchmark
  FIXED while the corpus grows — the real shape) + split: ratio ≤
  ~10x expected, shuffle rows scale linearly with input.

Pass bar: both ratios <= ~10x for 10x rows.
"""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators.curation import crawl_curate
from bb_bigdata_log_tools_spark.registry_textprep import _html_spark_col
from bb_bigdata_log_tools_spark.session import get_spark, table
from bb_bigdata_log_tools_spark.sources.warc import read_warc, write_warc

spark = get_spark("probe-r9")
spark.sparkContext.setLogLevel("ERROR")

docs1 = (
    table(spark, "/root/testdata/sf0.1", "documents")
    .repartition(32)
    .localCheckpoint()
)
docs10 = docs1
for k in range(1, 10):
    docs10 = docs10.unionByName(
        docs1.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000_000))
    )
docs10 = docs10.repartition(32).localCheckpoint()


def pages_of(docs):
    return docs.select(
        "doc_id",
        _html_spark_col().alias("html"),
        F.concat(
            F.lit("https://crawl.example/d/"),
            F.col("doc_id").cast("string"), F.lit(".html"),
        ).alias("target_uri"),
        F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
    )


def run_warc_loop(docs, n_shards):
    out = tempfile.mkdtemp(prefix="probe9_warc_")
    try:
        t0 = time.time()
        write_warc(pages_of(docs), out, n_shards=n_shards).collect()
        t_write = time.time() - t0
        t0 = time.time()
        n = read_warc(spark, out + "/*.warc.gz").count()
        t_read = time.time() - t0
        return t_write, t_read, n
    finally:
        shutil.rmtree(out, ignore_errors=True)


def run_curate(docs, bench):
    p = pages_of(docs).select("doc_id", "html")
    out = crawl_curate(p, bench, sort=False)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


bench = docs1.filter(F.col("doc_id") % 25 == 0).select(
    "doc_id", "text"
).localCheckpoint()

for name, fn in (("warmup", None),):
    run_warc_loop(docs1.limit(500), 4)

w1, r1, n1 = run_warc_loop(docs1, 8)
w10, r10, n10 = run_warc_loop(docs10, 80)
print(f"warc write 1x: {w1:.2f}s ({n1} recs)  10x: {w10:.2f}s ({n10} recs)"
      f"  ratio {w10 / w1:.2f}x")
print(f"warc read  1x: {r1:.2f}s  10x: {r10:.2f}s  ratio {r10 / r1:.2f}x")

c1 = run_curate(docs1, bench)
c1 = min(c1, run_curate(docs1, bench))  # warm pair, keep faster
c10 = run_curate(docs10, bench)
print(f"crawl_curate 1x: {c1:.2f}s  10x: {c10:.2f}s  ratio {c10 / c1:.2f}x")
