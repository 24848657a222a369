"""Round-11 scale probes.

1. CDX RANGE PRUNING: the headline claim of `cdx_range_scan` is that a
   domain-prefix query costs what the SITE costs, not what the CORPUS
   costs. Probe: build a range-layout store at N urls over H hosts,
   then 10N urls over 10H hosts (per-site size FIXED), and compare

   - the prefix scan's wall at 1x vs 10x corpus (bar: ~flat — the
     covering-shard list keeps the scanned bytes site-sized), and
   - shards scanned vs total shards at 10x (the pruning ratio the
     hash layout cannot achieve: it must scan ALL shards).

2. CRAWL_REFRESH WALL: 10x capture history (distinct urls — the
   high-cardinality regime where the url exchange dominates) under
   the same-JVM warm protocol. Bar: <2x wall for 10x rows.

Run:  python examples/probe_round11_scale.py
"""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bb_bigdata_log_tools_spark.session import get_spark  # noqa: E402


def build_store(spark, out: str, n_urls: int, n_hosts: int,
                n_shards: int) -> None:
    from bb_bigdata_log_tools_spark.sources.warc import write_cdx

    recs = (
        spark.range(n_urls)
        .select(
            F.concat(
                F.lit("https://host"),
                (F.col("id") % n_hosts).cast("string"),
                F.lit(".test/p"),
                F.col("id").cast("string"),
            ).alias("target_uri"),
            F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
            F.lit("text/html").alias("http_content_type"),
            F.lit(200).cast("int").alias("http_status"),
            F.encode(
                F.concat(F.lit("body-"), F.col("id").cast("string")),
                "UTF-8",
            ).alias("payload"),
        )
    )
    write_cdx(recs, out, n_shards=n_shards, layout="range")


def probe_cdx_range(spark) -> None:
    from bb_bigdata_log_tools_spark.sources.warc import (
        cdx_range_scan,
        covering_range_shards,
        read_cdx_ranges,
    )

    work = tempfile.mkdtemp(prefix="probe_cdx_range_")
    try:
        per_site = 2_000
        shapes = [("1x", 50 * per_site, 50, 16),
                  ("10x", 500 * per_site, 500, 16)]
        walls = {}
        for tag, n_urls, n_hosts, n_shards in shapes:
            out = f"{work}/{tag}"
            build_store(spark, out, n_urls, n_hosts, n_shards)
            bounds = read_cdx_ranges(out)
            # probe a mid-range host; warm once, time second run
            prefix = f"test,host{n_hosts // 2})"
            shards = covering_range_shards(bounds, prefix)
            cdx_range_scan(spark, out, prefix).count()
            t0 = time.perf_counter()
            n = cdx_range_scan(spark, out, prefix).count()
            walls[tag] = time.perf_counter() - t0
            print(
                f"  {tag}: {n_urls} urls / {n_hosts} hosts ->"
                f" prefix scan {n} rows in {walls[tag]:.2f}s,"
                f" scanned {len(shards)}/{len(bounds)} shards"
            )
            assert n == per_site
            if tag == "10x":
                assert len(shards) < len(bounds), (
                    "prefix probe failed to prune at 10x"
                )
        ratio = walls["10x"] / walls["1x"]
        print(f"  corpus 10x -> prefix-scan wall {ratio:.2f}x"
              f" (bar: site-sized, ~flat)")
        assert ratio < 2.0, f"prefix scan scaled with the corpus: {ratio:.2f}x"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_crawl_refresh(spark) -> None:
    from bb_bigdata_log_tools_spark.operators.curation import crawl_refresh

    def caps(n_urls: int):
        return (
            spark.range(n_urls * 3)
            .select(
                F.concat(
                    F.lit("https://h"),
                    (F.col("id") % n_urls).cast("string"),
                    F.lit(".test/x"),
                ).alias("url"),
                F.date_format(
                    F.date_add(
                        F.lit("2026-05-01").cast("date"),
                        (F.col("id") % 60).cast("int"),
                    ),
                    "yyyy-MM-dd",
                ).alias("capture_date"),
                F.md5(F.col("id").cast("string")).alias("digest"),
            )
        )

    walls = {}
    for tag, n in [("1x", 100_000), ("10x", 1_000_000)]:
        crawl_refresh(caps(n), "2026-08-16", sort=False).count()  # warm
        t0 = time.perf_counter()
        out = crawl_refresh(caps(n), "2026-08-16", sort=False).count()
        walls[tag] = time.perf_counter() - t0
        print(f"  {tag}: {n * 3} captures -> {out} urls"
              f" in {walls[tag]:.2f}s")
    ratio = walls["10x"] / walls["1x"]
    print(f"  10x rows -> {ratio:.2f}x wall"
          f" (linear would be 10x; bar: <10x = no superlinear blowup)")
    assert ratio < 10.0, f"crawl_refresh superlinear: {ratio:.2f}x at 10x"


def main() -> None:
    spark = get_spark("probe-round11", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    print("CDX range-layout pruning probe:")
    probe_cdx_range(spark)
    print("crawl_refresh wall probe:")
    probe_crawl_refresh(spark)
    spark.stop()


if __name__ == "__main__":
    main()
