"""Round-12 scale probes.

1. SITE EXPORT vs CORPUS (`warc_fetch_prefix`): the headline claim of
   the LOCATED range layout is that exporting one site's bytes costs
   what the SITE costs, not what the ARCHIVE costs. Probe: a
   fixed-size probe site (200 captures) inside a 1x and a 10x corpus
   store; compare the prefix export's warm wall. Bar: ~flat (the
   _RANGES manifest routes to the site's covering shards; the data
   read is the site's members only).

2. REDIRECT WALK vs CORPUS (`resolve_redirects`): direct URLs (the
   corpus majority) must exit through the semi/anti split instead of
   riding every hop join. Probe: 100k and 1M captures at a fixed 2%
   redirect rate. Bar: <2x wall for 10x rows (the walk shuffles only
   the redirect subset).

3. SITEMAP PARSE vs STORE COUNT (`sitemap_parse`): the block explode
   is scan-parallel and the recursion joins touch only the
   |sitemaps|-sized payload key. Probe: 5k and 50k urlset documents
   of 20 entries each. Bar: <2x wall for 10x documents.

Run:  python examples/probe_round12_scale.py
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bb_bigdata_log_tools_spark.session import get_spark  # noqa: E402


def build_located_store(spark, base: str, n_docs: int) -> str:
    from bb_bigdata_log_tools_spark.sources.warc import (
        parse_warc_idx,
        read_warc,
        write_cdx,
        write_warc,
    )

    pages = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("<p>"), F.repeat(F.lit("x"), 500),
            F.col("id").cast("string"), F.lit("</p>"),
        ).alias("html"),
        F.concat(
            F.lit("https://host"),
            F.when(F.col("id") < 200, F.lit("P")).otherwise(
                (F.col("id") % 53).cast("string")
            ),
            F.lit(".test/p"), F.col("id").cast("string"),
            F.lit(".html"),
        ).alias("target_uri"),
        F.lit("2026-05-01T00:00:00Z").alias("warc_date"),
    )
    store = os.path.join(base, "warc")
    write_warc(pages, store, n_shards=16).collect()
    glob = store + "/*.warc.gz"
    located = read_warc(spark, glob).join(
        parse_warc_idx(spark, glob), ["file", "rec_pos"]
    )
    cdx = os.path.join(base, "cdx")
    write_cdx(located, cdx, n_shards=16, layout="range", locate=True)
    return cdx


def probe_site_export(spark) -> None:
    from bb_bigdata_log_tools_spark.sources.warc import (
        warc_fetch_prefix,
    )

    walls = {}
    for n, tag in ((5_000, "1x"), (50_000, "10x")):
        base = tempfile.mkdtemp(prefix=f"p12_export_{tag}_")
        try:
            cdx = build_located_store(spark, base, n)
            warc_fetch_prefix(spark, cdx, "test,hostp)").count()  # warm
            t = time.time()
            c = warc_fetch_prefix(spark, cdx, "test,hostp)").count()
            walls[tag] = time.time() - t
            print(
                f"  corpus={n}: exported {c} records,"
                f" warm {walls[tag]:.2f}s"
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)
    print(
        f"  10x/1x wall ratio: {walls['10x'] / walls['1x']:.2f}"
        " (bar: ~flat — cost scales with the site)"
    )


def probe_redirects(spark) -> None:
    from bb_bigdata_log_tools_spark.operators.curation import (
        resolve_redirects,
    )

    def caps(n):
        return spark.range(n).select(
            F.concat(
                F.lit("https://h"), (F.col("id") % 97).cast("string"),
                F.lit(".test/p"), F.col("id").cast("string"),
            ).alias("url"),
            F.when(F.col("id") % 50 == 0, F.lit(301))
            .otherwise(F.lit(200))
            .alias("http_status"),
            F.when(
                F.col("id") % 50 == 0,
                F.concat(F.lit("/q"), F.col("id").cast("string")),
            )
            .otherwise(F.lit(""))
            .alias("location"),
        )

    walls = {}
    for n, tag in ((100_000, "1x"), (1_000_000, "10x")):
        resolve_redirects(caps(n), sort=False).count()  # warm
        t = time.time()
        resolve_redirects(caps(n), sort=False).count()
        walls[tag] = time.time() - t
        print(f"  captures={n}: warm {walls[tag]:.2f}s")
    print(
        f"  10x/1x wall ratio: {walls['10x'] / walls['1x']:.2f}"
        " (bar: <2 — only the redirect subset walks)"
    )


def probe_sitemaps(spark) -> None:
    from bb_bigdata_log_tools_spark.operators.curation import (
        sitemap_parse,
    )

    def pay(nsm):
        return spark.range(nsm).select(
            F.concat(
                F.lit("https://a.com/sm"), F.col("id").cast("string"),
                F.lit(".xml"),
            ).alias("sitemap_url"),
            F.concat(
                F.lit("<urlset>"),
                F.concat_ws(
                    "",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(19)),
                        lambda j: F.concat(
                            F.lit("<url><loc>https://a.com/p"),
                            F.col("id").cast("string"), F.lit("_"),
                            j.cast("string"),
                            F.lit("</loc></url>"),
                        ),
                    ),
                ),
                F.lit("</urlset>"),
            ).alias("xml"),
        )

    walls = {}
    for nsm, tag in ((5_000, "1x"), (50_000, "10x")):
        sitemap_parse(pay(nsm), sort=False).count()  # warm
        t = time.time()
        c = sitemap_parse(pay(nsm), sort=False).count()
        walls[tag] = time.time() - t
        print(f"  sitemaps={nsm}: {c} entries, warm {walls[tag]:.2f}s")
    print(
        f"  10x/1x wall ratio: {walls['10x'] / walls['1x']:.2f}"
        " (bar: <2 — scan-parallel block explode)"
    )


def main() -> None:
    spark = get_spark("probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    print("1. site export vs corpus (warc_fetch_prefix):")
    probe_site_export(spark)
    print("2. redirect walk vs corpus (resolve_redirects):")
    probe_redirects(spark)
    print("3. sitemap parse vs store count (sitemap_parse):")
    probe_sitemaps(spark)
    spark.stop()


if __name__ == "__main__":
    main()
