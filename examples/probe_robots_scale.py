"""Round-9 continuation 10x scale probe: robots_filter.

Protocol (BASELINE.md, round-6 sweep): same JVM, warm; replicate the
sf0.1 documents-derived frontier 10x with DISTINCT doc_ids (so URLs
stay distinct — the rank partitions by url) against the FIXED
five-host robots fixture and compare wall clock 1x vs 10x. The shape
is adversarial for the politeness gate in the way a real crawl is:
the frontier grows, the rule relation does not — per-URL work is the
bounded rules-per-host fan-out (startswith for prefix rules, regex
only for wildcard rules) plus the pre-shuffle WindowGroupLimit that
reduces each URL to one row before the rank exchange.

Pass bar: <2x wall for 10x rows, or the op needs a fix.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators.curation import robots_filter
from bb_bigdata_log_tools_spark.registry_sinks import (
    _ROBOTS_FIXTURE,
    _frontier_url_spark,
)
from bb_bigdata_log_tools_spark.session import get_spark, table

spark = get_spark("probe-robots")
spark.sparkContext.setLogLevel("ERROR")

docs1 = table(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "source"
).localCheckpoint()
docs10 = docs1
for k in range(1, 10):
    docs10 = docs10.unionByName(
        docs1.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000_000))
    )
docs10 = docs10.repartition(32).localCheckpoint()

robots = spark.createDataFrame(_ROBOTS_FIXTURE, "host string, robots_txt string")


def run(docs, label):
    frontier = _frontier_url_spark(docs)
    t0 = time.time()
    n = robots_filter(frontier, robots, sort=False).count()
    dt = time.time() - t0
    print(f"{label}: {n} rows in {dt:.2f} s")
    return dt


run(docs1, "warmup-1x")
t1 = run(docs1, "1x")
t10 = run(docs10, "10x")
print(f"ratio: {t10 / t1:.2f}x wall for 10x rows")

# Second regime: the RULES side grows with |hosts| (one robots.txt per
# host — the realistic web shape where the rule relation cannot be a
# tiny fixture). One host per document, three rules each; frontier =
# one URL per host. Wall must stay scan-shaped in |hosts|: the window
# chain is per-host-partition work, the join fan-out stays 3.
def many_hosts(docs, label):
    hosts = docs.select(
        F.concat(F.lit("h"), F.col("doc_id").cast("string"),
                 F.lit(".test")).alias("host"),
        F.concat(
            F.lit("User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
                  "Disallow: /d"),
            (F.col("doc_id") % 10).cast("string"), F.lit("*.pdf$\n"),
        ).alias("robots_txt"),
    )
    frontier = docs.select(
        F.concat(
            F.lit("https://h"), F.col("doc_id").cast("string"),
            F.lit(".test/private/"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("ok/f")).otherwise(
                F.lit("f")
            ),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    t0 = time.time()
    n = robots_filter(frontier, hosts, sort=False).count()
    dt = time.time() - t0
    print(f"{label}: {n} urls x per-host rules in {dt:.2f} s")
    return dt

many_hosts(docs1, "warmup-hosts")
h1 = many_hosts(docs1, "5k-hosts")
h10 = many_hosts(docs10, "50k-hosts")
print(f"hosts ratio: {h10 / h1:.2f}x wall for 10x hosts")
spark.stop()
