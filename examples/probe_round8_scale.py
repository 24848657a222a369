"""Round-8 10x scale probes: html_extract_text and dedup_image.

Protocol (BASELINE.md sweep discipline): same JVM, warm; compare wall
clock 1x vs 10x input and check the ratio against the operator's
claimed scaling shape.

- html_extract_text claims scan-parallel zero-shuffle: 10x pages is
  exactly 10x independent per-row work over the same 32 cores, so the
  wall ratio must stay AT OR UNDER ~10x (sub-linear when the 1x run is
  task-overhead-dominated) and, more importantly, show NO superlinear
  blowup — there is no join or aggregate to degrade.
- dedup_image's adversarial shape is ALL-DUPLICATE payloads (every
  image identical): all N rows land in the SAME dHash chunk buckets,
  output is C(N,2) pairs — the hot-chunk salt must spread the
  quadratic OUTPUT across tasks. Wall must scale with the OUTPUT pair
  count (which IS quadratic: 10x rows = 100x pairs), not degrade to a
  single straggler task; the probe therefore reports pairs/sec rather
  than raw wall ratio.

Pass bar: html wall ratio <= ~10x for 10x rows (linear or better);
dedup_image per-pair cost ratio <= 1x-ish between the sizes (per-pair
cost flat or amortizing = the salt spread the quadratic output).
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.session import get_spark, table
from bb_bigdata_log_tools_spark.operators.html import html_extract_text
from bb_bigdata_log_tools_spark.operators.multimodal import dedup_image
from bb_bigdata_log_tools_spark.registry_textprep import _html_spark_col
from bb_bigdata_log_tools_spark.registry_misc import _dhash_payloads

spark = get_spark("probe-r8")
spark.sparkContext.setLogLevel("ERROR")

# ---- html_extract_text: 1x vs 10x synthesized pages -----------------
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


def run_html(docs):
    pages = docs.select("doc_id", _html_spark_col().alias("html"))
    out = html_extract_text(pages, sort=False)
    t0 = time.time()
    # noop sink: count() would let Catalyst prune the extraction away
    out.write.format("noop").mode("overwrite").save()
    n = out.count()
    return time.time() - t0, n


run_html(docs1)  # warm
t1, n1 = run_html(docs1)
t10, n10 = run_html(docs10)
print(f"html_extract_text 1x: {t1:.2f}s ({n1} rows) "
      f"10x: {t10:.2f}s ({n10} rows)  wall ratio {t10 / t1:.2f}x")

# ---- dedup_image: all-duplicate adversarial payloads ----------------
base = [p for _i, mt, p in _dhash_payloads() if mt == "image"][0]


def media_df(n):
    return spark.createDataFrame(
        [(i, base, "image") for i in range(n)],
        "doc_id long, payload binary, media_type string",
    ).repartition(32).localCheckpoint()


def run_dedup(df):
    out = dedup_image(df)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    n = out.count()
    return time.time() - t0, n


m1, m10 = media_df(120), media_df(1200)
run_dedup(m1)  # warm
ta, pa = run_dedup(m1)
tb, pb = run_dedup(m10)
print(f"dedup_image all-dup 120: {ta:.2f}s ({pa} pairs, {pa/ta:.0f}/s) "
      f"1200: {tb:.2f}s ({pb} pairs, {pb/tb:.0f}/s)  "
      f"per-pair cost ratio {(tb/pb)/(ta/pa):.2f}x")

# ---- bpe_train_bytes: 10x duplicated corpus ---------------------------
# The merge loop is |pretoken vocab|-bound: duplicating the corpus 10x
# leaves the vocab IDENTICAL (same pretokens, 10x frequencies), so the
# per-iteration work is unchanged and only the one vocab-building scan
# grows. Wall should be near-flat — the strongest possible scaling
# shape, and the reason BPE training survives 100 TB.
from bb_bigdata_log_tools_spark.operators.textprep import bpe_train_bytes


def run_bpe(docs):
    t0 = time.time()
    n = bpe_train_bytes(docs, n_merges=4).count()
    return time.time() - t0, n


run_bpe(docs1)  # warm
tb1, nb1 = run_bpe(docs1)
tb10, nb10 = run_bpe(docs10)
print(f"bpe_train_bytes 1x: {tb1:.2f}s ({nb1} merges) "
      f"10x: {tb10:.2f}s ({nb10} merges)  wall ratio {tb10 / tb1:.2f}x")

spark.stop()
