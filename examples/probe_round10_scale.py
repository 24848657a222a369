"""Round-10 scale probes.

1. MEMORY: iter_warc_records over a giant SINGLE-member .warc.gz (the
   un-indexed-upload shape — no member boundaries to split on). The
   r9 reader joined the full decompressed stream before parsing, so
   peak RSS tracked the inflated size (~10x the compressed bytes on
   text); the chunk-fed rolling buffer must hold peak RSS ~flat while
   the decompressed size grows 10x. Measured in SUBPROCESSES
   (ru_maxrss is a high-water mark — unreusable within one process).

2. WALL: frontier_schedule under the robots_filter probe protocol —
   fixed politeness fixture, documents-derived frontier replicated
   10x with distinct doc_ids (same JVM, warm). Pass bar: <2x wall for
   10x rows. Plus the many-hosts regime: one robots.txt per host,
   BOTH sides 10x.
"""
import os
import subprocess
import sys
import tempfile
import textwrap
import time

sys.path.insert(0, "/root/repo")


# ---------------------------------------------------------------- memory
def build_file(path: str, n_records: int) -> int:
    import gzip

    from bb_bigdata_log_tools_spark.sources.warc import (
        build_http_response,
        build_warc_record,
    )

    # moderately compressible bodies (like real HTML), one gzip member
    # for the WHOLE stream
    total = 0
    with gzip.open(path, "wb", compresslevel=6) as f:
        for i in range(n_records):
            body = (f"<p>page {i} " + "lorem ipsum dolor sit amet " * 40
                    + "</p>").encode()
            rec = build_warc_record(
                "response", f"<urn:doc:{i}>", f"https://x.test/{i}.html",
                "2026-01-01T00:00:00Z", build_http_response(body),
            )
            f.write(rec)
            total += len(rec)
    return total


def peak_rss_parse(path: str) -> tuple[int, int]:
    """(n_records, peak_rss_kb) of parsing `path` in a subprocess."""
    code = textwrap.dedent(f"""
        import resource, sys
        sys.path.insert(0, "/root/repo")
        from bb_bigdata_log_tools_spark.sources.warc import iter_warc_records
        blob = open({path!r}, "rb").read()
        n = sum(1 for _ in iter_warc_records(blob))
        print(n, resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)
    """)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True,
    ).stdout.split()
    return int(out[0]), int(out[1])


with tempfile.TemporaryDirectory() as td:
    p1 = os.path.join(td, "one.warc.gz")
    p10 = os.path.join(td, "ten.warc.gz")
    d1 = build_file(p1, 2_000)
    d10 = build_file(p10, 20_000)
    n1, r1 = peak_rss_parse(p1)
    n10, r10 = peak_rss_parse(p10)
    print(f"1x:  {n1} records, decompressed {d1 >> 20} MiB, "
          f"compressed {os.path.getsize(p1) >> 10} KiB, "
          f"peak RSS {r1 / 1024:.0f} MiB")
    print(f"10x: {n10} records, decompressed {d10 >> 20} MiB, "
          f"compressed {os.path.getsize(p10) >> 10} KiB, "
          f"peak RSS {r10 / 1024:.0f} MiB")
    print(f"decompressed ratio: {d10 / d1:.1f}x, "
          f"peak-RSS ratio: {r10 / r1:.2f}x "
          f"(flat = the rolling buffer holds)")


# ---------------------------------------------------------------- wall
from pyspark.sql import functions as F  # noqa: E402

from bb_bigdata_log_tools_spark.operators.curation import (  # noqa: E402
    frontier_schedule,
)
from bb_bigdata_log_tools_spark.registry_sinks import (  # noqa: E402
    _ROBOTS_SCHED_FIXTURE,
    _frontier_url_spark,
)
from bb_bigdata_log_tools_spark.session import get_spark, table  # noqa: E402

spark = get_spark("probe-r10")
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

robots = spark.createDataFrame(
    _ROBOTS_SCHED_FIXTURE, "host string, robots_txt string"
)


def run(docs, label):
    frontier = _frontier_url_spark(docs, with_priority=True)
    t0 = time.time()
    n = frontier_schedule(
        frontier, robots, priority_col="priority", sort=False
    ).count()
    dt = time.time() - t0
    print(f"{label}: {n} rows in {dt:.2f} s")
    return dt


run(docs1, "warmup-1x")
t1 = run(docs1, "1x")
t10 = run(docs10, "10x")
print(f"frontier 10x ratio: {t10 / t1:.2f}x wall for 10x rows")

# many-hosts regime: one robots.txt (with delay + sitemap) per host,
# frontier AND rules both grow 10x
def many_hosts(docs, label):
    hosts = docs.select(
        F.concat(F.lit("h"), F.col("doc_id").cast("string"),
                 F.lit(".example")).alias("host")
    )
    robots_n = hosts.select(
        "host",
        F.concat(
            F.lit("User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
                  "Crawl-delay: 2\nSitemap: https://"),
            F.col("host"), F.lit("/map.xml\n"),
        ).alias("robots_txt"),
    )
    frontier = hosts.select(
        F.concat(F.lit("https://"), F.col("host"), F.lit("/private/p1"))
        .alias("url")
    ).unionAll(
        hosts.select(
            F.concat(F.lit("https://"), F.col("host"), F.lit("/ok/a"))
            .alias("url")
        )
    )
    t0 = time.time()
    n = frontier_schedule(frontier, robots_n, sort=False).count()
    dt = time.time() - t0
    print(f"{label}: {n} rows in {dt:.2f} s")
    return dt


many_hosts(docs1, "warmup-hosts-1x")
h1 = many_hosts(docs1, "hosts-1x")
h10 = many_hosts(docs10, "hosts-10x")
print(f"many-hosts 10x-both-sides ratio: {h10 / h1:.2f}x")

# ---------------------------------------------------------- dedup skew
# write_warc_deduped's adversarial shape: EVERY payload identical ->
# one digest owns the whole corpus. Keeper selection is an aggregate
# + AQE-skew-split join (a window over the digest would serialize
# this shape in one task with no mitigation). Pass bar: all-dup wall
# tracks all-unique wall at the same row count.
import shutil  # noqa: E402
import tempfile  # noqa: E402

from bb_bigdata_log_tools_spark.sources.warc import (  # noqa: E402
    write_warc_deduped,
)


def skew_pages(n, dup):
    body = (
        F.lit("<p>" + "same body " * 50 + "</p>")
        if dup
        else F.concat(F.lit("<p>uniq "), F.col("id").cast("string"),
                      F.lit(" body</p>"))
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        body.alias("html"),
        F.concat(F.lit("https://x.test/"),
                 F.col("id").cast("string")).alias("target_uri"),
        F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
    ).repartition(32)


def skew_run(n, dup, label):
    out = tempfile.mkdtemp(prefix="dedupskew_")
    t0 = time.time()
    man = write_warc_deduped(skew_pages(n, dup), out, n_shards=8).collect()
    dt = time.time() - t0
    print(f"{label}: n={n} dup={dup} -> "
          f"{sum(m.n_records for m in man)} recs in {dt:.2f} s")
    shutil.rmtree(out, ignore_errors=True)
    return dt


skew_run(20_000, True, "dedup warm")
d1 = skew_run(20_000, True, "all-dup 1x")
d10 = skew_run(200_000, True, "all-dup 10x")
u10 = skew_run(200_000, False, "all-uniq 10x")
print(f"all-dup 10x ratio: {d10 / d1:.2f}x; "
      f"all-dup vs all-uniq at 10x: {d10 / u10:.2f}x")
spark.stop()
