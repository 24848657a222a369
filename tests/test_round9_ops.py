"""Round-9: EXIF orientation parsing + orientation-normalized dHash."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bb_bigdata_log_tools_spark.operators.jpegcodec import make_jpeg
from bb_bigdata_log_tools_spark.operators.multimodal import (
    _apply_exif_orientation,
    add_exif_orientation,
    image_dhash_value,
    make_bmp,
    parse_exif_orientation,
)


def _pattern(w=36, h=24):
    return [
        [((x * 7 + y * 13) % 256,) * 3 for x in range(w)] for y in range(h)
    ]


def test_parse_exif_orientation_roundtrip():
    base = make_jpeg(12, 8, _pattern(12, 8))
    assert parse_exif_orientation(base) == 1  # no APP1
    for o in range(1, 9):
        assert parse_exif_orientation(add_exif_orientation(base, o)) == o
    # big-endian (MM) TIFF variant
    tagged = add_exif_orientation(base, 6)
    mm = tagged.replace(
        b"II" + struct.pack("<HIH", 42, 8, 1),
        b"MM" + struct.pack(">HIH", 42, 8, 1),
    ).replace(
        struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", 6, 0),
        struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", 6, 0),
    )
    assert parse_exif_orientation(mm) == 6


def test_parse_exif_orientation_malformed():
    base = make_jpeg(12, 8, _pattern(12, 8))
    assert parse_exif_orientation(b"notajpeg") == 1
    assert parse_exif_orientation(make_bmp(2, 2, _pattern(2, 2))) == 1
    # out-of-range value -> default
    weird = add_exif_orientation(base, 8).replace(
        struct.pack("<HH", 8, 0), struct.pack("<HH", 9, 0)
    )
    assert parse_exif_orientation(weird) == 1
    # APP1 without Exif header is skipped harmlessly
    junk = base[:2] + b"\xff\xe1" + struct.pack(">H", 10) + b"x" * 8 + base[2:]
    assert parse_exif_orientation(junk) == 1
    with pytest.raises(ValueError):
        add_exif_orientation(base, 0)


@pytest.mark.parametrize("orientation", range(1, 9))
def test_dhash_orientation_invariance(orientation):
    """A raster stored under ANY EXIF orientation hashes (nearly)
    identically to the upright master once normalized — rotated
    camera re-exports of one photo dedup together."""
    master = np.asarray(_pattern(), dtype=np.uint8)
    # find the stored raster whose normalization yields the master
    stored = None
    for cand in (
        master, master[:, ::-1], master[::-1, ::-1], master[::-1],
        master.transpose(1, 0, 2), master.transpose(1, 0, 2)[:, ::-1],
        master.transpose(1, 0, 2)[::-1, ::-1], master.transpose(1, 0, 2)[::-1],
    ):
        up = _apply_exif_orientation(cand, orientation)
        if up.shape == master.shape and (up == master).all():
            stored = cand
            break
    assert stored is not None
    h, w = stored.shape[0], stored.shape[1]
    srows = [[tuple(int(c) for c in px) for px in r] for r in stored]
    tagged = add_exif_orientation(make_jpeg(w, h, srows), orientation)
    base = image_dhash_value(
        make_jpeg(master.shape[1], master.shape[0],
                  [[tuple(int(c) for c in px) for px in r] for r in master])
    )
    got = image_dhash_value(tagged)
    ham = bin((base ^ got) & ((1 << 64) - 1)).count("1")
    assert ham <= 2, (orientation, ham)  # JPEG re-encode noise only


def test_dhash_exact_in_mixed_null_batch(spark):
    """REGRESSION: a single Arrow batch mixing a non-decodable payload
    (dhash None) with full-64-bit hashes must return the hashes EXACT.
    pandas' default coercion turns an int64+None column into float64,
    silently rounding values beyond 2^53 — caught when the round-9
    EXIF fixtures landed in the same partition as the junk payload."""
    from bb_bigdata_log_tools_spark.operators.multimodal import image_dhash

    rows = _pattern()
    jpg = make_jpeg(36, 24, rows)
    want = image_dhash_value(jpg)
    assert abs(want) > 1 << 53  # the pattern exercises the danger zone
    df = spark.createDataFrame(
        [(0, bytearray(b"junk" * 8), "image"), (1, bytearray(jpg), "image")],
        "doc_id long, payload binary, media_type string",
    ).coalesce(1)  # force ONE batch so None and the hash share it
    got = {r.doc_id: r.dhash for r in image_dhash(df).collect()}
    assert got == {0: None, 1: want}


def test_audio_fp_exact_in_mixed_null_batch(spark):
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        audio_fingerprint,
        audio_fingerprint_value,
        make_wav,
    )

    wav = make_wav(
        8000, 1, 400,
        samples=[int(20000 * ((i * 37) % 17 - 8) / 8) for i in range(400)],
    )
    want = audio_fingerprint_value(wav)
    df = spark.createDataFrame(
        [(0, bytearray(b"junk" * 9), "audio"), (1, bytearray(wav), "audio")],
        "doc_id long, payload binary, media_type string",
    ).coalesce(1)
    got = {r.doc_id: r.fingerprint for r in audio_fingerprint(df).collect()}
    assert got == {0: None, 1: want}


def test_crawl_curate_plan_shape(spark):
    """Capstone plan: no cartesian, benchmark shingles broadcast, and
    the page text column never enters a shuffle exchange."""
    from bb_bigdata_log_tools_spark.operators.curation import crawl_curate

    pages = spark.createDataFrame(
        [(i, f"<p>some prose body number {i} long enough to keep"
             " for the extraction gate to accept it</p>")
         for i in range(30)],
        "doc_id long, html string",
    )
    bench = spark.createDataFrame(
        # 3-gram "body number 3" exists only in page 3's prose
        [(0, "body number 3")], "doc_id long, text string"
    )
    df = crawl_curate(  # sort=False: plan before the checkpoint cut
        pages, bench, min_kept_chars=30, sort=False
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # bench shingle probe
    rows = {r.doc_id: (r.decision, r.detail) for r in df.collect()}
    assert rows[3][0] == "contaminated"
    assert sum(1 for d, _ in rows.values() if d == "kept") > 0


def test_crawl_curate_tiers(spark):
    """Precedence and detail per tier: thin beats dup beats
    contamination beats split."""
    from bb_bigdata_log_tools_spark.operators.curation import crawl_curate

    body = ("<p>" + " ".join(f"w{i}" for i in range(40)) + "</p>")
    pages = spark.createDataFrame(
        [
            (1, body),                      # original
            (2, body),                      # exact re-crawl -> dup of 1
            (3, "<p>tiny</p>"),             # under the thin gate
            (4, "<p>" + " ".join(f"q{i}" for i in range(40)) + "</p>"),
        ],
        "doc_id long, html string",
    )
    bench = spark.createDataFrame(
        [(9, "w5 w6 w7")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.decision, r.detail)
        for r in crawl_curate(pages, bench, min_kept_chars=30).collect()
    }
    # "tiny" is under the extractor's 25-char block gate, so nothing
    # is kept at all: detail = kept_chars = 0
    assert got[3] == ("thin", "0")
    assert got[2] == ("dup_exact", "1")
    assert got[1][0] == "contaminated"  # keeper still contaminated
    assert got[4][0] == "kept" and got[4][1] in ("train", "val", "test")


def test_parse_pixels_np_equals_list_decode():
    """The frombuffer raster fast path (image_parse_pixels_np) must be
    byte-identical to the generic list decode for every BMP profile it
    claims: 24/32bpp, bottom-up and top-down, widths that exercise the
    4-byte row padding."""
    import struct as _s

    from bb_bigdata_log_tools_spark.operators.multimodal import (
        image_parse_pixels,
        image_parse_pixels_np,
    )

    def bmp(width, height, rows, bpp=24, top_down=False):
        row_size = ((width * bpp + 31) // 32) * 4
        pix = bytearray()
        ys = range(height) if top_down else range(height - 1, -1, -1)
        for y in ys:
            line = bytearray()
            for x in range(width):
                line += bytes(rows[y][x])
                if bpp == 32:
                    line += b"\xAA"  # alpha byte, dropped by both paths
            line += b"\x00" * (row_size - len(line))
            pix += line
        off = 54
        return (
            b"BM" + _s.pack("<IHHI", off + len(pix), 0, 0, off)
            + _s.pack("<IiiHHIIiiII", 40, width,
                      -height if top_down else height,
                      1, bpp, 0, len(pix), 0, 0, 0, 0)
            + bytes(pix)
        )

    rng_rows = lambda w, h: [
        [((x * 31 + y * 7) % 256, (x * 5 + y) % 256, (x + y * 3) % 256)
         for x in range(w)] for y in range(h)
    ]
    for w, h in [(1, 1), (3, 2), (5, 4), (8, 8), (7, 3)]:
        rows = rng_rows(w, h)
        for bpp in (24, 32):
            for td in (False, True):
                p = bmp(w, h, rows, bpp=bpp, top_down=td)
                got = image_parse_pixels_np(p)
                want = image_parse_pixels(p)
                assert got is not None and want is not None, (w, h, bpp, td)
                gw, gh, arr = got
                ww, wh, lrows = want
                assert (gw, gh) == (ww, wh)
                flat = [tuple(int(c) for c in arr[y][x])
                        for y in range(gh) for x in range(gw)]
                wflat = [tuple(lrows[y][x])
                         for y in range(wh) for x in range(ww)]
                assert flat == wflat, (w, h, bpp, td)


def test_crawl_curate_degenerate_corpora(spark):
    """Adversarial corpus shapes (the test_robustness discipline):
    an ALL-IDENTICAL crawl resolves to one keeper + N-1 dup_exact;
    an ALL-BOILERPLATE crawl is all thin; an empty benchmark never
    contaminates."""
    from bb_bigdata_log_tools_spark.operators.curation import crawl_curate

    body = "<p>" + " ".join(f"tok{i}" for i in range(30)) + "</p>"
    same = spark.createDataFrame(
        [(i, body) for i in range(40)], "doc_id long, html string"
    )
    empty_bench = spark.createDataFrame(
        [], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.decision, r.detail)
        for r in crawl_curate(same, empty_bench, min_kept_chars=30).collect()
    }
    assert got[0][0] == "kept"                      # min doc_id keeps
    assert all(v == ("dup_exact", "0") for k, v in got.items() if k > 0)

    chrome_only = spark.createDataFrame(
        [(i, "<nav><a href='/'>Home</a></nav><footer>c</footer>")
         for i in range(10)],
        "doc_id long, html string",
    )
    got2 = {
        r.doc_id: r.decision
        for r in crawl_curate(chrome_only, empty_bench).collect()
    }
    assert set(got2.values()) == {"thin"}


def test_stream_warc_ingest_multi_microbatch(spark, tmp_path):
    """The streaming-equals-batch guarantee must hold under REAL
    micro-batch boundaries, not just a single-batch drain: with
    maxFilesPerTrigger=1 each shard becomes its own micro-batch and
    the appended union must still equal the batch read exactly."""
    from bb_bigdata_log_tools_spark.sources.warc import (
        parse_warc_files,
        read_warc,
        write_warc,
    )
    from pyspark.sql import types as T

    pages = spark.createDataFrame(
        [(i, f"<p>page {i}</p>", f"u{i}", "d") for i in range(24)],
        "doc_id long, html string, target_uri string, warc_date string",
    )
    out = str(tmp_path / "store")
    write_warc(pages, out, n_shards=4).collect()

    bin_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    files = (
        spark.readStream.format("binaryFile").schema(bin_schema)
        .option("pathGlobFilter", "*.warc.gz")
        .option("maxFilesPerTrigger", 1)   # force 4 micro-batches
        .load(out)
    )
    q = (
        parse_warc_files(files)
        .selectExpr("record_id", "md5(payload) AS m")
        .writeStream.format("memory").queryName("warc_mb_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None
    got = {(r.record_id, r.m) for r in spark.table("warc_mb_sink").collect()}
    want = {
        (r.record_id, r.m)
        for r in read_warc(spark, out + "/*.warc.gz")
        .selectExpr("record_id", "md5(payload) AS m").collect()
    }
    assert got == want and len(got) == 24


def test_dhash_untagged_unchanged():
    """Images with no EXIF keep their pre-round-9 hash (orientation 1
    path untouched) — BMP master equals itself through the normalizer."""
    rows = _pattern()
    bmp = make_bmp(36, 24, rows)
    jpg = make_jpeg(36, 24, rows)
    assert parse_exif_orientation(bmp) == 1
    assert image_dhash_value(bmp) is not None
    assert image_dhash_value(add_exif_orientation(jpg, 1)) == \
        image_dhash_value(jpg)


# ---------------------------------------------------------------------------
# Round-9 continuation: EXIF orientation surfaced in extract_features
# + orientation-aware media_resize (display-raster resize, swapped
# in_width/in_height for transposing orientations).
# ---------------------------------------------------------------------------


def test_extract_features_surfaces_orientation(spark):
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        extract_features,
        make_wav,
    )

    rows = _pattern(20, 14)
    jpg = make_jpeg(20, 14, rows)
    media = spark.createDataFrame(
        [
            (0, jpg, "image"),
            (1, add_exif_orientation(jpg, 6), "image"),
            (2, add_exif_orientation(jpg, 3), "image"),
            (3, make_bmp(8, 5, _pattern(8, 5)), "image"),
            (4, make_wav(8000, 1, 800), "audio"),
            (5, b"junkjunkjunk", "image"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    got = {r.doc_id: r for r in extract_features(media).collect()}
    assert [got[i].orientation for i in range(6)] == [1, 6, 3, 1, 1, 1]
    # width/height stay the STORED header dims even when tagged
    assert (got[1].width, got[1].height) == (20, 14)
    assert got[1].decoded and got[2].decoded


@pytest.mark.parametrize("orientation", range(1, 9))
def test_bmp_resize_is_orientation_normalized(orientation):
    """bmp_resize must resize the DISPLAY raster: for every EXIF value,
    the output equals an independent rotate-then-sample reference built
    from the decoded stored raster (pure numpy index arithmetic here,
    not the operator's helper)."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        bmp_resize,
        image_parse_pixels_np,
    )

    w, h, ow, oh = 18, 12, 7, 5
    stored = make_jpeg(w, h, _pattern(w, h))
    tagged = add_exif_orientation(stored, orientation)
    got = bmp_resize(tagged, ow, oh)
    # independent reference: decode the UNTAGGED bytes, rotate with the
    # test's own (transposes mirror _apply_exif_orientation semantics),
    # nearest-neighbor sample with explicit loops, re-encode
    dw, dh, arr = image_parse_pixels_np(stored)
    a = np.asarray(arr)
    up = {
        1: a, 2: a[:, ::-1], 3: a[::-1, ::-1], 4: a[::-1],
        5: a.transpose(1, 0, 2), 6: a.transpose(1, 0, 2)[:, ::-1],
        7: a.transpose(1, 0, 2)[::-1, ::-1], 8: a.transpose(1, 0, 2)[::-1],
    }[orientation]
    uh, uw = up.shape[0], up.shape[1]
    ref_rows = [
        [tuple(int(c) for c in up[(y * uh) // oh][(x * uw) // ow])
         for x in range(ow)]
        for y in range(oh)
    ]
    assert got == make_bmp(ow, oh, ref_rows)


def test_media_resize_record_display_dims():
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        media_resize_record,
    )

    jpg = make_jpeg(16, 10, _pattern(16, 10))
    # untagged: stored == display
    assert media_resize_record(jpg, 4, 4)[:2] == (16, 10)
    # orientation 6 (90° rotation): display dims swap
    rec6 = media_resize_record(add_exif_orientation(jpg, 6), 4, 4)
    assert rec6[:2] == (10, 16) and rec6[6] is True
    # orientation 3 (180°): no swap, but pixels rotate -> different md5
    rec3 = media_resize_record(add_exif_orientation(jpg, 3), 4, 4)
    assert rec3[:2] == (16, 10)
    assert rec3[5] != media_resize_record(jpg, 4, 4)[5]
    # non-image: flagged stub
    assert media_resize_record(b"nope", 4, 4) == (0, 0, 0, 0, 0, "", False)


def test_media_resize_operator_matches_record(spark):
    """End-to-end Spark operator rows equal the pure per-row helper —
    the lockstep contract the driver oracle is built on."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        media_resize,
        media_resize_record,
    )

    jpg = make_jpeg(16, 10, _pattern(16, 10))
    payloads = [jpg, add_exif_orientation(jpg, 6), b"junk"]
    media = spark.createDataFrame(
        [(i, p, "image") for i, p in enumerate(payloads)],
        "doc_id long, payload binary, media_type string",
    )
    got = {r.doc_id: r for r in media_resize(media, 5, 3).collect()}
    for i, p in enumerate(payloads):
        want = media_resize_record(p, 5, 3)
        r = got[i]
        assert (r.in_width, r.in_height, r.out_width, r.out_height,
                r.out_bytes, r.out_md5, r.decoded) == want


# ---------------------------------------------------------------------------
# robots_filter: RFC 9309 politeness gate — semantics pinned by a
# pure-Python reference (independent of BOTH engines), engine parity
# by the registry oracle + the seeded differential below.
# ---------------------------------------------------------------------------


def _robots_allowed_ref(robots_txt: str, agent: str, path: str):
    """Independent RFC 9309 reference: regex-free parse + re-module
    matching. Returns (allowed, matched_rule)."""
    import re

    toks = []
    for raw in robots_txt.replace("\r", "").split("\n"):
        ln = re.sub(r"#.*$", "", raw).strip("\t ")  # RFC WS: space/tab
        m = re.match(
            r"(?i)^(user-agent|allow|disallow|crawl-delay)[\t ]*:[\t ]*(.*)$",
            ln,
        )
        if m:
            # crawl-delay is a GROUP line: it ends a user-agent run
            # (engine parity) but contributes no path rule
            toks.append((m.group(1).lower(), m.group(2).strip("\t ")))
    groups, i = [], 0
    while i < len(toks):
        if toks[i][0] == "user-agent":
            agents = set()
            while i < len(toks) and toks[i][0] == "user-agent":
                agents.add(toks[i][1].lower())
                i += 1
            rules = []
            while i < len(toks) and toks[i][0] != "user-agent":
                if toks[i][1] and toks[i][0] in ("allow", "disallow"):
                    rules.append((toks[i][0] == "allow", toks[i][1]))
                i += 1
            groups.append((agents, rules))
        else:
            i += 1  # orphan rule before any group: ignored
    exact = [g for g in groups if agent.lower() in g[0]]
    chosen = exact if exact else [g for g in groups if "*" in g[0]]
    best = None
    for _agents, rules in chosen:
        for is_allow, rule in rules:
            ends = rule.endswith("$")
            body = rule[:-1] if ends else rule
            pat = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if ends else "")
            if re.search(pat, path):
                key = (len(rule), is_allow, rule)
                if best is None or key > best:
                    best = key
    if best is None:
        return True, ""
    return best[1], best[2]


_ROBOTS_TEST_FIXTURE = [
    ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"),
    ("b.com", "# policy\r\nUser-agent: bbbot\nDisallow: /*.pdf$\n"
              "Allow: /docs\n\nUser-agent: *\nDisallow: /\n"),
    ("c.com", "User-agent: other\nDisallow: /\n"),
    ("d.com", "User-agent: x\nUser-agent: *\nDisallow: /tmp\nAllow:\nDisallow:\n"),
    ("e.com", "Disallow: /orphan\nUser-agent: *\nDisallow: /q?x=*&y\n"),
    # RFC whitespace is space OR tab: tab-indented lines, tab before/
    # after the colon, trailing tabs — all must parse.
    ("f.com", "\tUser-agent\t:\t*\t\nDisallow:\t/tabbed\t\n"),
]


def test_robots_filter_pinned_semantics(spark):
    """Hand-derived RFC 9309 outcomes over the adversarial fixture —
    allow-override, $-anchor, exact-group shadowing '*', multi-UA
    group, no-op empty rules, orphan rules, regex metachars, missing
    robots.txt, bare-host path defaulting."""
    from bb_bigdata_log_tools_spark.operators.curation import robots_filter

    want = {
        "https://a.com/private/ok/file": (True, "/private/ok"),
        "https://a.com/private/secret": (False, "/private/"),
        "https://a.com/public": (True, ""),
        "https://b.com/x/doc.pdf": (False, "/*.pdf$"),
        "https://b.com/x/doc.pdfx": (True, ""),       # $ anchor holds
        "https://b.com/docs/doc.pdf": (False, "/*.pdf$"),  # longest wins
        "https://b.com/other": (True, ""),   # '*' group shadowed by exact
        "https://c.com/anything": (True, ""),  # no applicable group
        "https://d.com/tmp/file": (False, "/tmp"),
        "https://d.com/ok": (True, ""),
        "https://e.com/orphan": (True, ""),   # orphan rule ignored
        "https://e.com/q?x=1&y": (False, "/q?x=*&y"),  # ? escaped, * wild
        "https://E.COM": (True, ""),          # bare host -> path '/'
        "https://unknown.com/zzz": (True, ""),  # no robots.txt
        "https://f.com/tabbed/x": (False, "/tabbed"),  # tab whitespace
        "https://f.com/ok": (True, ""),
    }
    robots = spark.createDataFrame(
        _ROBOTS_TEST_FIXTURE, "host string, robots_txt string"
    )
    urls = spark.createDataFrame([(u,) for u in want], "url string")
    got = {
        r.url: (r.allowed, r.matched_rule)
        for r in robots_filter(urls, robots, agent="bbbot").collect()
    }
    assert got == want
    # the independent reference agrees on every pinned row
    by_host = dict(_ROBOTS_TEST_FIXTURE)
    for url, (allowed, rule) in want.items():
        import re as _re

        host = _re.match(r"https?://([^/?#]+)", url).group(1).lower()
        path = _re.sub(r"^https?://[^/?#]+", "", url) or "/"
        if host in by_host:
            assert _robots_allowed_ref(by_host[host], "bbbot", path) == (
                allowed, rule,
            ), url


@pytest.mark.slow
def test_robots_sql_vs_python_reference_fuzz():
    """Seeded differential: random robots.txt texts and paths from an
    adversarial atom set — the DuckDB rendering of the shared algebra
    must agree with the independent pure-Python RFC reference on every
    (host, url) decision."""
    import random

    import duckdb

    from bb_bigdata_log_tools_spark.operators.curation import (
        robots_filter_sql,
    )

    rng = random.Random(47806)
    path_atoms = ["/a", "/b/c", "/doc.pdf", "/q?x=1", "/.hid", "/(p)",
                  "/x+y", "/$lit", "/very/deep/path", "/a*b",
                  "/café", "/日本語/page", "/%C3%A9"]
    rule_atoms = ["/a", "/b/*", "*.pdf$", "/q?x=*", "/.hid", "/(p)",
                  "/x+y", "/$lit", "/very", "/", "/a*b$", "*",
                  "/café", "/日本*", "/%C3%A9$"]
    agents = ["bbbot", "other", "*", "BBBot", "third"]
    for trial in range(25):
        def pad(s):
            # random RFC whitespace dressing: tabs/spaces at either
            # end (tabs are legal WS per RFC 9309 — the bug class the
            # round-9 review fixed)
            return rng.choice(["", "\t", " ", "\t "]) + s + \
                rng.choice(["", "\t", " "])

        hosts = []
        for h in range(3):
            lines = []
            for g in range(rng.randint(1, 3)):
                for _ in range(rng.randint(1, 2)):
                    sep = rng.choice([": ", ":", ":\t", "\t: "])
                    lines.append(pad(f"User-agent{sep}{rng.choice(agents)}"))
                    if rng.random() < 0.15:
                        # the divergence-prone shape: a delay BETWEEN
                        # UA lines splits the run into two groups
                        lines.append(f"Crawl-delay: {rng.randint(1, 5)}")
                for _ in range(rng.randint(0, 3)):
                    kind = rng.choice(["Allow", "Disallow"])
                    val = rng.choice(rule_atoms + [""])
                    sep = rng.choice([": ", ":", ":\t"])
                    lines.append(pad(f"{kind}{sep}{val}"))
                if rng.random() < 0.25:
                    # crawl-delay: a GROUP line (ends a UA run) with no
                    # path rule — both engines and the reference must
                    # split groups identically around it
                    lines.append(pad(f"Crawl-delay: {rng.randint(0, 9)}"))
                if rng.random() < 0.2:
                    lines.append("Sitemap: https://s.test/map.xml")
                if rng.random() < 0.3:
                    lines.append("# comment")
                if rng.random() < 0.3:
                    lines.append("")
            hosts.append((f"h{h}.test", "\n".join(lines) + "\n"))
        urls = [
            f"https://h{rng.randint(0, 3)}.test{rng.choice(path_atoms)}"
            for _ in range(12)
        ]
        vals = ", ".join(
            "('%s', '%s')"
            % (h, t.replace("'", "''").replace("\n", "' || chr(10) || '"))
            for h, t in hosts
        )
        urls_sql = "SELECT * FROM (VALUES %s) t(url)" % ", ".join(
            "('%s')" % u for u in urls
        )
        sql = robots_filter_sql(
            urls_sql, f"SELECT * FROM (VALUES {vals}) t(host, robots_txt)",
            agent="bbbot",
        )
        got = {
            r[0]: (bool(r[2]), r[3])
            for r in duckdb.connect().execute(sql).fetchall()
        }
        by_host = dict(hosts)
        import re as _re

        for url in set(urls):
            host = _re.match(r"https?://([^/?#]+)", url).group(1).lower()
            path = _re.sub(r"^https?://[^/?#]+", "", url) or "/"
            want = (
                _robots_allowed_ref(by_host[host], "bbbot", path)
                if host in by_host
                else (True, "")
            )
            assert got[url] == want, (trial, url, got[url], want,
                                      by_host.get(host))


def test_invalid_param_guards_raise_loudly(spark):
    """The salts=0 bug class (round-8 ADVICE): an invalid numeric
    parameter must raise, never silently return an empty or
    everything-matches relation."""
    from bb_bigdata_log_tools_spark.operators.curation import pack_sequences
    from bb_bigdata_log_tools_spark.operators.dedup import (
        winnowing_fingerprints,
        word_shingles,
    )
    from bb_bigdata_log_tools_spark.operators.similarity import (
        ann_topk_lsh,
        ivf_assign,
    )
    from bb_bigdata_log_tools_spark.operators.textprep import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        word_shingles("text", n=0)
    with pytest.raises(ValueError):
        winnowing_fingerprints(docs, k=0)
    with pytest.raises(ValueError):
        winnowing_fingerprints(docs, window=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=0, overlap=-1)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=8, overlap=-1)
    with pytest.raises(ValueError):
        pack_sequences(docs, window_tokens=0)
    with pytest.raises(ValueError):
        ivf_assign(emb, n_probe=0, dim=2)
    with pytest.raises(ValueError):
        ann_topk_lsh(emb, n_planes=0, dim=2)


def test_robots_filter_null_and_degenerate_inputs(spark):
    """NULL robots.txt, NULL/empty/non-http URLs: both engines must
    agree (all allowed, no crash) — the null-divergence bug class."""
    import duckdb

    from bb_bigdata_log_tools_spark.operators.curation import (
        robots_filter,
        robots_filter_sql,
    )

    rdf = spark.createDataFrame(
        [("a.com", None), ("b.com", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    udf_ = spark.createDataFrame(
        [(u,) for u in [None, "https://a.com/x", "https://b.com/x",
                        "ftp://weird", ""]],
        "url string",
    )
    got = sorted(
        (str(r.url), str(r.host), r.allowed, r.matched_rule)
        for r in robots_filter(udf_, rdf).collect()
    )
    robots_sql = (
        "SELECT * FROM (VALUES ('a.com', NULL), ('b.com',"
        " 'User-agent: *' || chr(10) || 'Disallow: /x' || chr(10)))"
        " t(host, robots_txt)"
    )
    urls_sql = (
        "SELECT * FROM (VALUES (NULL), ('https://a.com/x'),"
        " ('https://b.com/x'), ('ftp://weird'), ('')) t(url)"
    )
    want = sorted(
        (str(r[0]), str(r[1]), bool(r[2]), r[3])
        for r in duckdb.connect()
        .execute(robots_filter_sql(urls_sql, robots_sql))
        .fetchall()
    )
    assert got == want
    assert all(allowed for (_u, h, allowed, _r) in got if h != "b.com")


def test_robots_crawl_delay_and_sitemaps(spark):
    from bb_bigdata_log_tools_spark.operators.curation import (
        robots_crawl_delay,
        robots_sitemaps,
    )

    robots = spark.createDataFrame(
        [
            # exact group (delay 7) shadows '*' group (delay 1)
            ("a.com", "User-agent: bbbot\nCrawl-delay: 7\nDisallow: /x\n"
                      "\nUser-agent: *\nCrawl-delay: 1\n"
                      "Sitemap: https://a.com/SiteMap.xml\n"),
            # only '*' group applies; two applicable delays -> MAX
            ("b.com", "User-agent: *\nCrawl-delay: 2\n"
                      "User-agent: *\nCrawl-delay: 10\n"),
            # non-numeric delay ignored; no row
            ("c.com", "User-agent: *\nCrawl-delay: soon\n"),
            # delay in a non-applicable group only; no row
            ("d.com", "User-agent: other\nCrawl-delay: 9\n"
                      "Sitemap: https://d.com/a.xml\n"
                      "Sitemap: https://d.com/b.xml\n"
                      "Sitemap: https://d.com/a.xml\n"),  # dup collapses
        ],
        "host string, robots_txt string",
    )
    delays = {r.host: r.crawl_delay
              for r in robots_crawl_delay(robots, agent="bbbot").collect()}
    assert delays == {"a.com": 7.0, "b.com": 10.0}
    maps = sorted((r.host, r.sitemap_url)
                  for r in robots_sitemaps(robots).collect())
    assert maps == [
        ("a.com", "https://a.com/SiteMap.xml"),  # case preserved
        ("d.com", "https://d.com/a.xml"),
        ("d.com", "https://d.com/b.xml"),
    ]


def test_crawl_delay_line_splits_ua_run(spark):
    """`ua / Crawl-delay / ua` is TWO groups (the delay line ends the
    user-agent run) — so the second agent does NOT inherit the first
    group's rules. Engine and reference agree by construction; this
    pins the behavior explicitly."""
    from bb_bigdata_log_tools_spark.operators.curation import robots_filter

    robots = spark.createDataFrame(
        [("e.com", "User-agent: bbbot\nCrawl-delay: 3\n"
                   "User-agent: other\nDisallow: /only-other\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("https://e.com/only-other/x",)], "url string"
    )
    got = robots_filter(urls, robots, agent="bbbot").collect()[0]
    # the Disallow belongs to the SECOND group (agent 'other'), so
    # bbbot — whose group holds only the delay — is allowed
    assert got.allowed is True and got.matched_rule == ""
    ref = _robots_allowed_ref(
        "User-agent: bbbot\nCrawl-delay: 3\n"
        "User-agent: other\nDisallow: /only-other\n",
        "bbbot", "/only-other/x",
    )
    assert ref == (True, "")
