"""Worked example: a web-crawl training-data pipeline, end to end.

Run:  python examples/crawl_pipeline.py [sf_dir]

crawl bytes (.warc.gz) → record parse → HTML extraction (text /
links / metadata) → curation decision list (thin-gate, exact dedup,
decontamination, split) → WET export of the kept text → the crawl
loop CLOSED: frontier → robots gate → per-host fetch waves
(frontier_schedule), plus the WAT metadata export, the dedup
(revisit-record) export, and the FRESHNESS axis (range-layout CDX
prefix queries, robots-cache expiry, re-crawl prioritization) — all
four Common Crawl artifacts and the scheduler as one lazy DataFrame
program. Every operator documents
its 100 TB shape in its docstring; the only driver-side
materializations here are the prints and the ≤ n_shards sink
manifests.
"""

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bb_bigdata_log_tools_spark.operators.curation import (  # noqa: E402
    crawl_curate,
    crawl_frontier,
    frontier_schedule,
    robots_crawl_delay,
    robots_filter,
)
from bb_bigdata_log_tools_spark.operators.html import (  # noqa: E402
    html_extract_links,
    html_extract_metadata,
    html_extract_text,
)
from bb_bigdata_log_tools_spark.session import get_spark, table  # noqa: E402
from bb_bigdata_log_tools_spark.sources.warc import (  # noqa: E402
    read_warc,
    write_warc,
    write_warc_deduped,
    write_wat,
    write_wet,
)


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> None:
    owns_session = spark is None
    if owns_session:
        spark = get_spark("crawl-pipeline-example")
        spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="crawl_example_")
    try:
        # -- 0. simulate the crawler: synthesize pages and ship them
        #       as .warc.gz (in production this store already exists)
        docs = table(spark, sf_dir, "documents")
        from bb_bigdata_log_tools_spark.registry_textprep import (
            _html_spark_col,
        )

        pages_src = docs.select(
            "doc_id",
            _html_spark_col().alias("html"),
            F.concat(
                F.lit("https://crawl.example/d/"),
                F.col("doc_id").cast("string"), F.lit(".html"),
            ).alias("target_uri"),
            F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
        )
        crawl_dir = f"{work}/crawl"
        man = write_warc(pages_src, crawl_dir, n_shards=4).collect()
        print(f"crawl store: {sum(m.n_records for m in man)} records in "
              f"{len(man)} .warc.gz shards")

        # -- 1. read the crawl: one task per file, payloads never
        #       visit the driver
        recs = read_warc(spark, crawl_dir + "/*.warc.gz")
        pages = recs.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        ).select(
            F.regexp_extract("target_uri", r"/d/(\d+)\.html$", 1)
            .cast("long").alias("doc_id"),
            F.make_valid_utf8(F.col("payload").cast("string")).alias("html"),
        )

        # -- 2. the three extraction artifacts (CC's WARC/WET/WAT)
        text = html_extract_text(pages, sort=False)
        links = html_extract_links(pages, sort=False)
        meta = html_extract_metadata(pages, sort=False)
        print("extraction:",
              f"{text.count()} pages,",
              f"{links.count()} outlinks,",
              f"{meta.filter(F.col('title') != '').count()} titled")

        # -- 3. curation decisions (thin / dup_exact / contaminated /
        #       kept+split) against a held-out benchmark
        bench = docs.filter(F.col("doc_id") % 25 == 0).select(
            "doc_id", "text"
        )
        decisions = crawl_curate(pages, bench, sort=False)
        decisions.groupBy("decision").count().orderBy("decision").show()

        # -- 4. export the kept text as WET conversion records
        kept = text.join(
            decisions.filter(F.col("decision") == "kept").select("doc_id"),
            "doc_id",
        ).select(
            "doc_id", "text",
            F.concat(
                F.lit("https://crawl.example/d/"),
                F.col("doc_id").cast("string"), F.lit(".html"),
            ).alias("target_uri"),
            F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
        )
        wet_man = write_wet(kept, f"{work}/wet", n_shards=2).collect()
        print(f"WET export: {sum(m.n_records for m in wet_man)} kept pages"
              f" in {len(wet_man)} shards")

        # -- 5. close the crawl loop: extracted links -> next-fetch
        #       frontier -> robots.txt politeness gate (RFC 9309)
        with_base = links.join(
            pages.select(
                "doc_id",
                F.concat(
                    F.lit("https://crawl.example/d/"),
                    F.col("doc_id").cast("string"), F.lit(".html"),
                ).alias("base_url"),
            ),
            "doc_id",
        )
        frontier = crawl_frontier(with_base, sort=False).select(
            F.col("canonical_url").alias("url")
        )
        robots = spark.createDataFrame(
            [("crawl.example",
              "User-agent: *\nDisallow: /d/1\nAllow: /d/1.html\n"
              "Crawl-delay: 2\nSitemap: https://crawl.example/map.xml\n")],
            "host string, robots_txt string",
        )
        gated = robots_filter(frontier, robots, sort=False)
        n_ok = gated.filter(F.col("allowed")).count()
        delays = {r.host: r.crawl_delay
                  for r in robots_crawl_delay(robots).collect()}
        print(f"frontier: {gated.count()} candidate URLs,"
              f" {n_ok} allowed by robots.txt,"
              f" crawl-delay {delays.get('crawl.example')} s")

        # -- 6. the SCHEDULER: gate x delay x sitemap seeds -> per-host
        #       fetch waves (what the fetcher actually consumes)
        sched = frontier_schedule(frontier, robots, default_delay=1.0)
        first = sched.limit(3).collect()
        print("fetch waves:", [
            (r.url, r.wave, r.fetch_offset_s) for r in first
        ])

        # -- 7. the remaining CC artifacts: WAT metadata JSON per page,
        #       and the dedup export (duplicate payloads stored as
        #       revisit records referencing the keeper — storage drops
        #       by the duplicate mass)
        meta = pages.join(
            links.groupBy("doc_id").agg(
                F.sort_array(F.collect_list("href")).alias("hrefs")
            ),
            "doc_id", "left",
        ).select(
            "doc_id",
            F.concat(
                F.lit('{"url":"https://crawl.example/d/'),
                F.col("doc_id").cast("string"),
                F.lit('.html","outlinks":['),
                F.when(F.coalesce(F.size("hrefs"), F.lit(0)) == 0, F.lit(""))
                .otherwise(F.concat(F.lit('"'), F.array_join("hrefs", '","'),
                                    F.lit('"'))),
                F.lit("]}"),
            ).alias("wat_json"),
            F.concat(F.lit("https://crawl.example/d/"),
                     F.col("doc_id").cast("string"),
                     F.lit(".html")).alias("target_uri"),
            F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
        )
        wat_man = write_wat(meta, f"{work}/wat", n_shards=2).collect()
        print(f"WAT export: {sum(m.n_records for m in wat_man)} metadata"
              f" records in {len(wat_man)} shards")
        cap = pages.select(
            "doc_id", "html",
            F.concat(F.lit("https://crawl.example/d/"),
                     F.col("doc_id").cast("string"),
                     F.lit(".html")).alias("target_uri"),
            F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
        )
        # simulate re-crawls: every 40th page captured again at a
        # second URL — same payload, so the dedup export stores the
        # second capture as a revisit record
        recrawls = cap.filter(F.col("doc_id") % 40 == 7).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "html",
            F.concat(F.lit("https://mirror.example/d/"),
                     F.col("doc_id").cast("string"),
                     F.lit(".html")).alias("target_uri"),
            "warc_date",
        )
        dedup_man = write_warc_deduped(
            cap.unionByName(recrawls), f"{work}/dedup", n_shards=2,
        ).collect()
        revisits = read_warc(spark, f"{work}/dedup/*.warc.gz").filter(
            F.col("warc_type") == "revisit"
        ).count()
        print(f"dedup export: {sum(m.n_records for m in dedup_man)} records,"
              f" {revisits} stored as revisit (empty-body) records")

        # -- 8. the FRESHNESS axis: a range-layout CDX index serving
        #       domain-prefix queries (only the covering shards are
        #       scanned), robots-cache expiry, and the re-crawl
        #       prioritizer over the capture/digest history
        from bb_bigdata_log_tools_spark.operators.curation import (
            crawl_refresh,
            robots_staleness,
        )
        from bb_bigdata_log_tools_spark.sources.warc import (
            cdx_range_scan,
            write_cdx,
        )

        captures = read_warc(spark, f"{work}/dedup/*.warc.gz").filter(
            F.col("warc_type").isin("response", "revisit")
        )
        n_idx = write_cdx(
            captures, f"{work}/cdx", n_shards=2, layout="range"
        )
        mirror = cdx_range_scan(spark, f"{work}/cdx", "example,mirror)")
        print(f"CDX range index: {n_idx} lines;"
              f" mirror.example/* -> {mirror.count()} captures"
              f" (covering shards only)")
        aged = robots.join(
            spark.createDataFrame(
                [("crawl.example", "2026-08-01 00:00:00")],
                "host string, fetched_at string",
            ),
            "host",
        )
        stale = robots_staleness(
            aged, now="2026-08-16 00:00:00", ttl_s=7 * 86400
        )
        print("robots cache:", [
            (r.host, r.robots_age_s, bool(r.robots_stale))
            for r in stale.collect()
        ])
        refresh = crawl_refresh(
            captures.select(
                F.col("target_uri").alias("url"),
                F.substring("warc_date", 1, 10).alias("capture_date"),
                F.col("payload_digest").alias("digest"),
            ),
            now_date="2026-08-16",
        )
        top = refresh.orderBy(
            F.desc("refresh_priority"), "url"
        ).limit(3).collect()
        print("re-crawl priorities:", [
            (r.url, r.age_days, round(r.refresh_priority, 2)) for r in top
        ])

        # -- 9. SERVE a page back out of the archive — the pywb loop:
        #       located CDX (search axis ⋈ storage axis) routes the
        #       URL to its byte range; the fetch reads ONLY that
        #       gzip member, not the store
        from bb_bigdata_log_tools_spark.sources.warc import (
            parse_warc_idx,
            warc_fetch,
        )

        glob = f"{work}/dedup/*.warc.gz"
        located = read_warc(spark, glob).join(
            parse_warc_idx(spark, glob), ["file", "rec_pos"]
        )
        write_cdx(located, f"{work}/cdx_located", n_shards=2,
                  locate=True)
        served = warc_fetch(
            spark, f"{work}/cdx_located",
            ["https://crawl.example/d/7.html"], n_shards=2,
        ).collect()
        print(f"served: {served[0].target_uri} ->"
              f" {len(bytes(served[0].payload))} bytes"
              f" (one ranged member read)")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
