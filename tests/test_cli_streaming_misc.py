"""CLI end-to-end (against the reference's own test tree + goldens),
streaming operators, multimodal plumbing, and hfind."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

from pyspark.sql import functions as F

# heavy tier: excluded from the fast dev gate (pytest -m 'not slow');
# the FULL suite (no filter) is still the round/judge gate
pytestmark = __import__('pytest').mark.slow


REF = "/root/reference/testcases/logsearch"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def golden(name: str) -> list[str]:
    with open(f"{REF}/reference-files/{name}", encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f if line.strip()]


@pytest.fixture(scope="module")
def service_root(tmp_path_factory):
    """Reference layout: <root>/<dc>/<svc>/<type>/<date>/<hour>/<comp>/data."""
    root = tmp_path_factory.mktemp("service")
    src = f"{REF}/logsearch-testservice/logs"
    dst = root / "99" / "logsearch-testservice" / "logs"
    shutil.copytree(src, dst)
    return str(root)


def run_tool(tool: str, *args: str) -> str:
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bb_bigdata_log_tools_spark/cli.py"), tool, *args],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout


#: In-subprocess driver for run_tools_batch: every invocation still
#: goes end-to-end through cli.main's arg parsing + tool dispatch,
#: with PER-INVOCATION stdout/stderr captured (the CLI's markers and
#: usage output are Python-side sys.stderr writes, so redirect_stderr
#: sees them).
_BATCH_DRIVER = """\
import io, json, sys
from contextlib import redirect_stderr, redirect_stdout
from bb_bigdata_log_tools_spark.cli import main

results = []
for args in json.loads(sys.stdin.read()):
    so, se = io.StringIO(), io.StringIO()
    code = 0
    try:
        with redirect_stdout(so), redirect_stderr(se):
            sys.argv = ["cli.py"] + args
            main()
    except SystemExit as exc:
        code = exc.code if isinstance(exc.code, int) else 1
    except BaseException as exc:  # a failing tool exits the process non-zero
        code = 1
        se.write(f"{type(exc).__name__}: {exc}")
    results.append({"out": so.getvalue(), "err": se.getvalue(), "code": code})
print(json.dumps(results))
"""


def run_tools_batch(invocations: list[list[str]]) -> list[dict]:
    """Run several CLI invocations in ONE subprocess (one JVM/session
    via getOrCreate). JVM + session startup was >80% of each CLI
    test's wall time (~20 s per invocation, ×11 invocations); one
    canonical test (test_cli_logcat_matches_reference_golden) keeps
    the true process-per-invocation entry path, the variants ride
    this batch."""
    import json as _json

    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [sys.executable, "-c", _BATCH_DRIVER],
        input=_json.dumps([list(a) for a in invocations]),
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert res.returncode == 0, (res.stderr[-2000:], res.stdout[-500:])
    return _json.loads(res.stdout.strip().splitlines()[-1])


BASE_ARGS = [
    "-dc=99",
    "-svc=logsearch-testservice",
    "-comp=logsearch-test",
    "-start=Feb 28, 2012 10:00",
    "-end=Feb 28, 2012 11:00",
]


@pytest.fixture(scope="module")
def cli_batch(service_root, tmp_path_factory):
    """All golden-variant CLI invocations, one subprocess, keyed dict
    of {out, err, code} per invocation."""
    out_dir = str(tmp_path_factory.mktemp("cli_out") / "results")
    inv = {
        "local_sort": ["logcat", *BASE_ARGS, f"-root={service_root}", "--l"],
        "remote_sort": ["logcat", *BASE_ARGS, f"-root={service_root}", "--r"],
        "search_ci": [
            "logsearch", "-string=ЧЕЛовЕК", "--i", *BASE_ARGS,
            f"-root={service_root}",
        ],
        "out_dir": [
            "logcat", *BASE_ARGS, f"-root={service_root}",
            f"--out={out_dir}", "--dateFormat=RFC3164",
        ],
        "raw_sep": [
            "logcat", *BASE_ARGS, f"-root={service_root}", "--raw",
            "--fieldSeparator=|",
        ],
        "silent": ["logcat", *BASE_ARGS, f"-root={service_root}", "--silent"],
        "ms_or": [
            "logmultisearch",
            f"-strings={REF}/logmultisearch-strings-OR.txt",
            *BASE_ARGS, f"-root={service_root}",
        ],
        "ms_or_i": [
            "logmultisearch", "--i",
            f"-strings={REF}/logmultisearch-strings-OR.txt",
            *BASE_ARGS, f"-root={service_root}",
        ],
        "ms_and": [
            "logmultisearch", "--a",
            f"-strings={REF}/logmultisearch-strings-AND.txt",
            *BASE_ARGS, f"-root={service_root}",
        ],
        "ms_and_i": [
            "logmultisearch", "--a", "--i",
            f"-strings={REF}/logmultisearch-strings-AND.txt",
            *BASE_ARGS, f"-root={service_root}",
        ],
    }
    keys = list(inv)
    results = run_tools_batch([inv[k] for k in keys])
    out = {k: r for k, r in zip(keys, results)}
    out["_out_dir"] = out_dir
    return out


def test_cli_logcat_matches_reference_golden(service_root):
    out = run_tool("logcat", *BASE_ARGS, f"-root={service_root}")
    assert out.splitlines() == golden("logcat-reference.txt")


def test_cli_logcat_golden_forced_local_sort(cli_batch):
    """--l (LogTools' client-local sort path) must produce the exact
    same total order as the default auto pick."""
    assert cli_batch["local_sort"]["code"] == 0
    assert (
        cli_batch["local_sort"]["out"].splitlines()
        == golden("logcat-reference.txt")
    )


def test_cli_logcat_golden_forced_remote_sort(cli_batch):
    """--r (the distributed range-sort path) must also match — same
    answer either way, LogTools picks only for speed."""
    assert cli_batch["remote_sort"]["code"] == 0
    assert (
        cli_batch["remote_sort"]["out"].splitlines()
        == golden("logcat-reference.txt")
    )


def test_cli_logsearch_case_insensitive(cli_batch):
    assert cli_batch["search_ci"]["code"] == 0
    lines = cli_batch["search_ci"]["out"].splitlines()
    assert len(lines) == 2 and all("человек" in line.lower() for line in lines)


def test_cli_missing_args_usage_error(service_root):
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bb_bigdata_log_tools_spark/cli.py"), "logsearch", "-dc=99"],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
    )
    assert res.returncode == 1
    assert "NOT ENOUGH ARGUMENTS" in res.stderr


def test_stream_grep_and_hourly_stats(spark, tmp_path):
    from bb_bigdata_log_tools_spark.streaming import stream_grep, stream_hourly_stats

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text(
        "2024-01-01T00:10:00 error disk full\n"
        "2024-01-01T00:20:00 info ok\n"
        "2024-01-01T01:05:00 error net down\n"
    )
    lines = (
        spark.readStream.format("text")
        .option("path", str(src))
        .load()
        .withColumn("message", F.col("value"))
        .withColumn(
            "event_time", F.to_timestamp(F.substring("value", 1, 19))
        )
        .withColumn("component", F.split("value", " ").getItem(1))
    )

    q1 = (
        stream_grep(lines, "^.*error", case_insensitive=True)
        .writeStream.format("memory")
        .queryName("grepped")
        .outputMode("append")
        .start()
    )
    q1.processAllAvailable()
    grepped = spark.sql("SELECT * FROM grepped").collect()
    q1.stop()
    assert len(grepped) == 2

    q2 = (
        stream_hourly_stats(lines, watermark="10 minutes", key_col="component")
        .writeStream.format("memory")
        .queryName("hourly")
        .outputMode("complete")
        .start()
    )
    q2.processAllAvailable()
    hourly = {
        (r["window_start"].hour, r["component"]): r["line_count"]
        for r in spark.sql("SELECT * FROM hourly").collect()
    }
    q2.stop()
    assert hourly[(0, "error")] == 1
    assert hourly[(0, "info")] == 1
    assert hourly[(1, "error")] == 1


def test_multimodal_plumbing(spark, sf_dir):
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        attach_media,
        extract_features,
        media_metadata,
    )
    from bb_bigdata_log_tools_spark.session import table

    docs = table(spark, sf_dir, "documents").limit(50)
    media = attach_media(docs)
    meta = media_metadata(media).collect()
    assert len(meta) == 50
    assert all(r["n_bytes"] > 0 and len(r["content_md5"]) == 32 for r in meta)
    assert {r["media_type"] for r in meta} == {"image", "audio", "video"}

    feats = extract_features(media).collect()
    assert len(feats) == 50
    by_id = {r["doc_id"]: r for r in feats}
    # deterministic stub: re-run must produce identical features
    feats2 = extract_features(media).collect()
    assert {r["doc_id"]: tuple(r) for r in feats2} == {
        r["doc_id"]: tuple(r) for r in feats
    }
    for r in feats:
        if r["media_type"] == "image":
            # text payloads are not parseable images -> flagged stub
            assert r["width"] >= 64 and r["n_frames"] == 1 and not r["decoded"]
        elif r["media_type"] == "audio":
            assert r["width"] == 0 and r["n_frames"] >= 1 and not r["decoded"]


def test_image_dimension_parsers():
    """Header parsers recover true dimensions from real format bytes
    (PNG round-trips through a full spec-valid encode incl. pixel data)."""
    import zlib

    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_bmp_header,
        make_gif_header,
        make_jpeg_header,
        make_png,
        parse_image_dimensions,
    )

    png = make_png(321, 123)
    assert parse_image_dimensions(png) == ("png", 321, 123)
    # the PNG is genuinely decodable: IDAT inflates to the scanline bytes
    idat_start = png.index(b"IDAT") + 4
    idat_len = int.from_bytes(png[png.index(b"IDAT") - 4 : png.index(b"IDAT")], "big")
    raw = zlib.decompress(png[idat_start : idat_start + idat_len])
    assert len(raw) == 123 * (1 + 3 * 321)

    assert parse_image_dimensions(make_jpeg_header(65535, 1)) == ("jpeg", 65535, 1)
    assert parse_image_dimensions(make_gif_header(7, 9)) == ("gif", 7, 9)
    assert parse_image_dimensions(make_bmp_header(1920, 1080)) == ("bmp", 1920, 1080)
    # top-down BMP stores negative height
    import struct

    bmp = bytearray(make_bmp_header(10, 20))
    bmp[22:26] = struct.pack("<i", -20)
    assert parse_image_dimensions(bytes(bmp)) == ("bmp", 10, 20)

    assert parse_image_dimensions(b"not an image at all") is None
    assert parse_image_dimensions(b"\xff\xd8\x00\x00garbage") is None
    assert parse_image_dimensions(b"") is None


def test_wav_meta_parser():
    import struct

    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_wav,
        parse_wav_meta,
    )

    wav = make_wav(44100, channels=2, n_samples=4410, bits=16)
    assert parse_wav_meta(wav) == (44100, 2, 4410)
    # 8-bit mono: block align 1
    assert parse_wav_meta(make_wav(8000, 1, 123, bits=8)) == (8000, 1, 123)
    # an extra chunk before fmt (e.g. LIST) must be skipped, odd size padded
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    patched = wav[:12] + extra + wav[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert parse_wav_meta(patched) == (44100, 2, 4410)
    assert parse_wav_meta(b"RIFFxxxxNOPE") is None
    assert parse_wav_meta(b"not audio") is None


def test_extract_features_real_decode(spark):
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        extract_features,
        make_jpeg_header,
        make_png,
        make_wav,
    )

    media = spark.createDataFrame(
        [
            (1, make_png(640, 480), "image"),
            (2, make_jpeg_header(1024, 768), "image"),
            (3, b"\x00\x01broken", "image"),
            (4, make_wav(16000, 1, 16000), "audio"),
            (5, b"\x00mp3-ish-garbage", "audio"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["decoded"]) == (640, 480, True)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["decoded"]) == (1024, 768, True)
    assert rows[3]["decoded"] is False
    # WAV audio: width=sample_rate, height=channels, n_frames=samples
    assert (rows[4]["width"], rows[4]["height"], rows[4]["n_frames"], rows[4]["decoded"]) == (
        16000, 1, 16000, True,
    )
    assert rows[5]["decoded"] is False and rows[5]["n_frames"] >= 1


def test_hfind(spark, tmp_path):
    from bb_bigdata_log_tools_spark.sources.hfind import hfind

    (tmp_path / "sub").mkdir()
    (tmp_path / "a.log").write_text("x" * 100)
    (tmp_path / "b.txt").write_text("y" * 10)
    (tmp_path / "sub" / "c.log").write_text("z" * 1000)

    logs = hfind(spark, str(tmp_path), name_glob="*.log", file_type="f").collect()
    assert sorted(r["name"] for r in logs) == ["a.log", "c.log"]
    big = hfind(spark, str(tmp_path), min_size=500, file_type="f").collect()
    assert [r["name"] for r in big] == ["c.log"]
    dirs = hfind(spark, str(tmp_path), file_type="d").collect()
    assert [r["name"] for r in dirs] == ["sub"]
    shallow = hfind(spark, str(tmp_path), max_depth=1, file_type="f").collect()
    assert sorted(r["name"] for r in shallow) == ["a.log", "b.txt"]


def test_hfind_glob_anchored_and_symlink_safe(spark, tmp_path):
    """Full-name glob semantics (find(1) -name): 'a.log' must not match
    'xa.log'; and a symlink cycle back to an ancestor must not recurse
    forever (lstat, symlinks not followed)."""
    from bb_bigdata_log_tools_spark.sources.hfind import hfind

    (tmp_path / "a.log").write_text("x")
    (tmp_path / "xa.log").write_text("y")
    (tmp_path / "sub").mkdir()
    os.symlink(str(tmp_path), str(tmp_path / "sub" / "cycle"))

    exact = hfind(spark, str(tmp_path), name_glob="a.log").collect()
    assert [r["name"] for r in exact] == ["a.log"]
    prefix = hfind(spark, str(tmp_path), name_glob="a*", file_type="f").collect()
    assert [r["name"] for r in prefix] == ["a.log"]
    # the symlink is listed (as a non-dir entry) but never descended into
    all_entries = hfind(spark, str(tmp_path)).collect()
    assert sum(1 for r in all_entries if r["name"] == "cycle") == 1
    assert all(r["depth"] <= 2 for r in all_entries)


def test_stream_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionizer: sessions close when a later
    event arrives past the gap (append-mode emission)."""
    from bb_bigdata_log_tools_spark.streaming.ops import stream_sessionize

    src = tmp_path / "sess"
    src.mkdir()
    # user 7: two events 5 min apart (one session), then an event 2h
    # later -> closes session 1; user 8: single event then one 3h later.
    (src / "a.txt").write_text(
        "2024-01-01T00:00:00 7\n"
        "2024-01-01T00:05:00 7\n"
        "2024-01-01T02:00:00 7\n"
        "2024-01-01T00:10:00 8\n"
        "2024-01-01T03:10:00 8\n"
    )
    lines = (
        spark.readStream.format("text")
        .option("path", str(src))
        .load()
        .withColumn("event_time", F.to_timestamp(F.substring("value", 1, 19)))
        .withColumn("user_id", F.split("value", " ").getItem(1).cast("long"))
    )
    q = (
        stream_sessionize(lines, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    rows = {
        (r["user_id"], r["n_events"]) for r in spark.sql("SELECT * FROM sessions").collect()
    }
    q.stop()
    # within one batch: user 7's first session (2 events) closed by the
    # 02:00 event; user 8's first session (1 event) closed by 03:10.
    assert (7, 2) in rows
    assert (8, 1) in rows


def test_cli_out_dir_and_dateformat(cli_batch):
    """--out writes results to a file instead of stdout; --dateFormat
    switches the line timestamp rendering (RFC3164 zero-padded day)."""
    assert cli_batch["out_dir"]["code"] == 0
    assert cli_batch["out_dir"]["out"].strip() == ""  # data went to the file
    import glob as _glob

    lines = []
    for part in sorted(
        _glob.glob(os.path.join(cli_batch["_out_dir"], "part-*"))
    ):
        with open(part, encoding="utf-8") as f:
            lines.extend(line.rstrip("\n") for line in f)
    assert len(lines) == len(golden("logcat-reference.txt"))
    assert lines[0].startswith("Feb 28 10:00:01 ")


def test_cli_raw_field_separator(cli_batch):
    """--raw emits the reference's intermediate separator-joined fields;
    --fieldSeparator overrides the default U+001F."""
    assert cli_batch["raw_sep"]["code"] == 0
    lines = [line for line in cli_batch["raw_sep"]["out"].splitlines() if line]
    assert len(lines) == len(golden("logcat-reference.txt"))
    first = sorted(lines)[0].split("|")
    assert len(first) == 6
    int(first[0])  # ts
    int(first[4])  # block_no


def test_cli_silent_suppresses_markers(cli_batch):
    assert cli_batch["silent"]["code"] == 0
    assert "DATA MARKER" not in cli_batch["silent"]["err"]
    assert len(cli_batch["silent"]["out"].splitlines()) == len(
        golden("logcat-reference.txt")
    )


def test_write_boom_tree_roundtrip_via_cli(spark, tmp_path):
    """events → hourly .bm tree (BoomHourlyStoreFunc role) → read back
    through the CLI's path resolution + boom reader."""
    from bb_bigdata_log_tools_spark.cli import resolve_paths
    from bb_bigdata_log_tools_spark.session import table
    from bb_bigdata_log_tools_spark.sources.boom import read_boom, write_boom_tree
    from bb_bigdata_log_tools_spark.sources.logs import events_as_logs

    logs = events_as_logs(table(spark, "/root/testdata/sf0.001", "events"))
    root = str(tmp_path / "service")
    n = write_boom_tree(logs, root, "dc1", "svc1", "logs", "comp1")
    assert n == logs.count()

    start, end = 1704412800000, 1704499200000  # one day window
    paths = resolve_paths(root, "dc1", "svc1", "comp1", start, end)
    assert paths, "hourly dirs must resolve"
    df = read_boom(spark, paths[0])
    for p in paths[1:]:
        df = df.unionByName(read_boom(spark, p))
    got = {(r["ts"], r["message"]) for r in df.collect()}
    expect = {
        (r["ts"], r["message"])
        for r in logs.filter((logs.ts >= start) & (logs.ts < end)).collect()
    }
    assert got == expect


def test_cli_logmultisearch_with_reference_files(cli_batch):
    """logmultisearch end-to-end with the reference's own strings files
    (OR and AND + --i), matching the golden concatenation."""
    out = ""
    for k in ("ms_or", "ms_or_i", "ms_and", "ms_and_i"):
        assert cli_batch[k]["code"] == 0
        out += cli_batch[k]["out"]
    assert out.splitlines() == golden("logmultisearch-reference.txt")


def test_mp3_mp4_header_roundtrip():
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_mp3,
        make_mp4,
        parse_mp3_meta,
        parse_mp4_meta,
    )

    assert parse_mp3_meta(make_mp3(44100, 1, 5)) == (44100, 1, 5 * 1152)
    assert parse_mp3_meta(make_mp3(48000, 2, 7, bitrate_kbps=192)) == (
        48000, 2, 7 * 1152,
    )
    # ID3v2 tag (syncsafe size) is skipped before the first frame
    tagged = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 + make_mp3(32000, 2, 3)
    assert parse_mp3_meta(tagged) == (32000, 2, 3 * 1152)
    assert parse_mp4_meta(make_mp4(320, 180, 24)) == (320, 180, 24)
    # malformed payloads are rejected, not crashed on
    for junk in (b"", b"garbage", b"\xff\xfb", b"ID3", make_mp4(320, 180, 24)[:20]):
        assert parse_mp3_meta(junk) is None
        assert parse_mp4_meta(junk) is None
    # an MP4 without a video handler yields None (audio-only container)
    mp4 = make_mp4(320, 180, 24).replace(b"vide", b"soun")
    assert parse_mp4_meta(mp4) is None


def test_bmp_resize_roundtrip_and_rejects():
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        _bmp_parse_pixels,
        bmp_resize,
        make_bmp,
        make_png,
        parse_image_dimensions,
    )

    rows = [
        [((x * 3 + y) % 256, (x * 5) % 256, (y * 7) % 256) for x in range(9)]
        for y in range(5)
    ]
    b = make_bmp(9, 5, rows)
    assert parse_image_dimensions(b) == ("bmp", 9, 5)
    assert _bmp_parse_pixels(b)[2] == rows
    r = bmp_resize(b, 3, 10)  # down in x, up in y
    w, h, back = _bmp_parse_pixels(r)
    assert (w, h) == (3, 10)
    expected = [[rows[(y * 5) // 10][(x * 9) // 3] for x in range(3)] for y in range(10)]
    assert back == expected
    # undecodable payloads and degenerate sizes are rejected, not
    # crashed on (PNG now DECODES — see test_png_decode_*)
    from bb_bigdata_log_tools_spark.operators.multimodal import make_wav

    assert bmp_resize(make_wav(8000, 1, 4), 2, 2) is None
    assert bmp_resize(b, 0, 2) is None
    assert bmp_resize(b"BM" + b"\x00" * 10, 2, 2) is None
    assert bmp_resize(make_png(4, 4), 2, 2) is not None


def test_png_decode_all_filters_roundtrip():
    """The spec decoder must invert the spec encoder for every scanline
    filter type (None/Sub/Up/Average/Paeth) on a gradient image whose
    rows exercise each predictor."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_png_rows,
        png_parse_pixels,
    )

    rows = [
        [((x * 3 + y) % 256, (x * 5 + 2 * y) % 256, (x ^ y) % 256) for x in range(11)]
        for y in range(7)
    ]
    for ft in range(5):
        png = make_png_rows(11, 7, rows, filter_type=ft)
        parsed = png_parse_pixels(png)
        assert parsed is not None, ft
        w, h, back = parsed
        assert (w, h) == (11, 7) and back == rows, ft


def test_png_decode_profiles_and_rejects():
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_png,
        png_parse_pixels,
    )

    # single-color writer round-trips (RGB stored → (b,g,r) convention)
    w, h, rows = png_parse_pixels(make_png(6, 3, b"\x10\x20\x30"))
    assert (w, h) == (6, 3)
    assert rows[0][0] == (0x30, 0x20, 0x10)
    # corrupt profiles flow to the stub path, never crash: a 16-bit
    # IHDR over 8-bit data is short by half its stride, and a palette
    # color type without a PLTE chunk has no colors to index (REAL
    # 16-bit / palette / interlaced PNGs decode — test_png_profiles)
    deep = bytearray(make_png(4, 4))
    deep[24] = 16  # 16-bit depth claimed, 8-bit data present
    assert png_parse_pixels(bytes(deep)) is None
    pal = bytearray(make_png(4, 4))
    pal[25] = 3  # palette color type, no PLTE chunk
    assert png_parse_pixels(bytes(pal)) is None
    assert png_parse_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) is None
    assert png_parse_pixels(b"not a png") is None


def test_png_and_bmp_same_pixels_same_resized_output():
    """A PNG and a BMP carrying IDENTICAL pixel content must resize to
    byte-identical canonical BMP output — the codec seam is lossless."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        bmp_resize,
        make_bmp,
        make_png_rows,
    )

    rows = [
        [((x * 7) % 256, (y * 11) % 256, (x + y) % 256) for x in range(10)]
        for y in range(6)
    ]
    out_b = bmp_resize(make_bmp(10, 6, rows), 4, 4)
    out_p = bmp_resize(make_png_rows(10, 6, rows, filter_type=4), 4, 4)
    assert out_b is not None and out_b == out_p


def test_media_frame_sample_edges(spark):
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_mp4,
        make_png,
        media_frame_sample,
    )
    import pytest as _pytest

    media = spark.createDataFrame(
        [
            (0, make_mp4(64, 36, 7), "video"),   # 7 frames, every 3 -> 0,3,6
            (1, make_png(4, 4), "image"),        # 1 frame -> just 0
            (2, b"junk", "video"),               # stub fallback still has n_frames>0
        ],
        "doc_id long, payload binary, media_type string",
    )
    got = media_frame_sample(media, 3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert sorted(by_doc[0]) == [0, 3, 6]
    assert by_doc[1] == [0]
    assert 0 in by_doc[2]
    with _pytest.raises(ValueError):
        media_frame_sample(media, 0)


def test_mp4_64bit_size_and_v1_tkhd():
    import struct

    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_mp4,
        parse_mp4_meta,
    )

    base = make_mp4(320, 180, 24)
    # rewrite the top-level moov box to use a 64-bit largesize header
    ftyp_len = struct.unpack_from(">I", base, 0)[0]
    moov_len = struct.unpack_from(">I", base, ftyp_len)[0]
    moov_body = base[ftyp_len + 8 : ftyp_len + moov_len]
    moov64 = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov_body)) + moov_body
    assert parse_mp4_meta(base[:ftyp_len] + moov64) == (320, 180, 24)

    # rewrite tkhd to version 1 (64-bit ctime/mtime/duration)
    i = base.find(b"tkhd")
    start, hdr_len = i - 4, struct.unpack_from(">I", base, i - 4)[0]
    body = base[i + 4 : start + hdr_len]
    v1 = bytes([1]) + body[1:4] + b"\x00" * 16 + body[12:20] + b"\x00" * 8 + body[24:]
    tkhd_v1 = struct.pack(">I", len(v1) + 8) + b"tkhd" + v1
    patched = base[:start] + tkhd_v1 + base[start + hdr_len:]
    # fix enclosing trak/moov sizes (+12 bytes)
    for name in (b"trak", b"moov"):
        j = patched.find(name)
        patched = (
            patched[: j - 4]
            + struct.pack(">I", struct.unpack_from(">I", patched, j - 4)[0] + 12)
            + patched[j:]
        )
    assert parse_mp4_meta(patched) == (320, 180, 24)


def test_write_first_item_text_drops_trailing_fields(spark, tmp_path):
    """FirstItemOnlyStoreFunc parity (pig/FirstItemOnlyStoreFunc.java):
    only the first (or named) column lands in the text output; every
    other field of the tuple is dropped."""
    from bb_bigdata_log_tools_spark.sources.logs import write_first_item_text

    df = spark.createDataFrame(
        [("line a", 1, "keyA"), ("line b", 2, "keyB")],
        "line string, sortkey int, other string",
    )
    out = str(tmp_path / "first_item")
    write_first_item_text(df, out)
    back = {r.value for r in spark.read.text(out).collect()}
    assert back == {"line a", "line b"}

    write_first_item_text(df, out, col="other")
    back = {r.value for r in spark.read.text(out).collect()}
    assert back == {"keyA", "keyB"}


def test_logdriver_dispatcher():
    """bin/logdriver dispatches to tools, prints usage, rejects unknown
    tools (the reference's uber-entrypoint minus cluster bootstrap)."""
    import subprocess

    base = os.path.join(os.path.dirname(__file__), "..", "bin", "logdriver")
    out = subprocess.run([base, "help"], capture_output=True, text=True)
    assert out.returncode == 0 and "logcat" in out.stdout
    bad = subprocess.run([base, "nosuch"], capture_output=True, text=True)
    assert bad.returncode == 2
    ver = subprocess.run([base, "version"], capture_output=True, text=True)
    assert ver.returncode == 0 and ver.stdout.strip()


def test_stream_to_boom_tree_ingest(spark, sf_dir, tmp_path):
    """Bounded stream drain into the hourly .bm tree: every input line
    lands exactly once, the tree layout matches the reference
    convention, and the result reads back through read_boom."""
    import glob
    import os

    import bb_bigdata_log_tools_spark.registry_streaming as rs
    from bb_bigdata_log_tools_spark.sources.boom import read_boom
    from bb_bigdata_log_tools_spark.sources.logs import events_as_logs
    from bb_bigdata_log_tools_spark.streaming.ops import stream_to_boom_tree

    root = str(tmp_path / "tree")
    lines = events_as_logs(rs._stream_events(spark, sf_dir))
    q = stream_to_boom_tree(
        lines, root, "dc1", "svc", "applog", "comp",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    from bb_bigdata_log_tools_spark.session import table

    files = glob.glob(os.path.join(root, "dc1/svc/applog/*/*/comp/data/*.bm"))
    assert files, "no .bm files written"
    # batch-tagged names (idempotent recovery re-run contract)
    assert all("b0" in os.path.basename(f) for f in files)
    back = read_boom(spark, os.path.join(root, "dc1/svc/applog/*/*/comp/data"))
    batch = events_as_logs(table(spark, sf_dir, "events"))
    assert back.count() == batch.count()
    # content fidelity: identical ts sum and message-length sum
    got = back.selectExpr("sum(ts) AS s", "sum(length(message)) AS m").collect()[0]
    want = batch.selectExpr("sum(ts) AS s", "sum(length(message)) AS m").collect()[0]
    assert (got.s, got.m) == (want.s, want.m)


def test_wav_resample_roundtrip_properties():
    """Resampling preserves duration (±1 sample), identity rate is a
    near-no-op, and a pure decimation of a periodic signal keeps
    RMS/peak — then the resampled bytes decode right back."""
    import math

    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_wav,
        parse_wav_meta,
        wav_pcm_stats,
        wav_resample,
    )

    s = [int(16384 * math.sin(2 * math.pi * 440 * i / 8000)) for i in range(800)]
    w = make_wav(8000, 1, samples=s)
    down = wav_resample(w, 2000)
    assert parse_wav_meta(down) == (2000, 1, 200)
    d_stats = wav_pcm_stats(down)
    assert d_stats[0] == 100  # duration preserved
    assert abs(d_stats[2] - 0.5) < 0.01  # peak survives 4x decimation of a sine
    same = wav_resample(w, 8000)
    assert parse_wav_meta(same) == (8000, 1, 800)
    assert wav_pcm_stats(same) == wav_pcm_stats(w)
    up = wav_resample(w, 24000)
    assert parse_wav_meta(up) == (24000, 1, 2400)
    # stereo interleave preserved
    st = [v for i in range(100) for v in (i * 100, -i * 100)]
    r = wav_resample(make_wav(8000, 2, samples=st), 4000)
    assert parse_wav_meta(r) == (4000, 2, 50)
    assert wav_resample(b"junk", 8000) is None


def test_png_profiles():
    """Every standard PNG profile decodes: gray 1/2/4/8/16, palette
    1/2/4/8, RGB(A) 8/16, sequential and Adam7 — round-trips through
    the spec-grade writers are exact (with the documented 16-bit high
    byte and sub-byte gray scaling)."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_png_gray,
        make_png_palette,
        make_png_rows,
        png_parse_pixels,
    )

    W, H = 19, 11
    rows = [
        [((x * 13) % 256, (y * 29) % 256, (x * 7 + y * 3) % 256) for x in range(W)]
        for y in range(H)
    ]
    for ft in range(5):
        seq = png_parse_pixels(make_png_rows(W, H, rows, filter_type=ft))
        il = png_parse_pixels(
            make_png_rows(W, H, rows, filter_type=ft, interlace=True)
        )
        assert seq == (W, H, rows) and il == seq, ft
    # Adam7 at sizes below / at / above the pass-1 stride
    for w, h in [(1, 1), (2, 2), (3, 5), (8, 8), (9, 9)]:
        rr = [
            [((x * 11) % 256, (y * 17) % 256, (x + y) % 256) for x in range(w)]
            for y in range(h)
        ]
        assert png_parse_pixels(make_png_rows(w, h, rr, interlace=True)) == (
            w, h, rr,
        ), (w, h)
    pal_colors = [((i * 37) % 256, (i * 91) % 256, (i * 13) % 256) for i in range(256)]
    for d in (1, 2, 4, 8):
        nc = 1 << d
        small = [[pal_colors[(x + y * 3) % nc] for x in range(W)] for y in range(H)]
        assert png_parse_pixels(make_png_palette(W, H, small, bit_depth=d)) == (
            W, H, small,
        ), d
    for d in (1, 2, 4, 8, 16):
        maxv = (1 << d) - 1
        vals = [[(x * y + x) % (maxv + 1) for x in range(W)] for y in range(H)]
        out = png_parse_pixels(make_png_gray(W, H, vals, bit_depth=d))
        assert out is not None
        for y in range(H):
            for x in range(W):
                v = vals[y][x]
                exp = (v >> 8) if d == 16 else v * 255 // maxv
                assert out[2][y][x] == (exp, exp, exp), (d, x, y)
    # truncated interlaced stream rejects
    p = make_png_rows(W, H, rows, interlace=True)
    assert png_parse_pixels(p[: len(p) // 2]) is None


def test_wav_wide_profiles():
    """24/32-bit PCM, IEEE float32 and WAVE_FORMAT_EXTENSIBLE all
    yield the SAME normalized stats as the 16-bit rendering of the
    same waveform, floats clip at |x| >= 1.0, and resampling any
    profile produces canonical 16-bit output (bit-identical across
    integer widths carrying the same waveform)."""
    import math
    import struct as _s

    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_mp3,
        make_wav,
        parse_wav_meta,
        wav_pcm_stats,
        wav_resample,
    )

    sine16 = [
        int(16384 * math.sin(2 * math.pi * 440 * i / 8000)) for i in range(800)
    ]
    base = wav_pcm_stats(make_wav(8000, 1, samples=sine16))
    assert base is not None and base[1] > 0.3
    s24 = [v << 8 for v in sine16]
    s32 = [v << 16 for v in sine16]
    assert wav_pcm_stats(make_wav(8000, 1, samples=s24, bits=24)) == base
    assert wav_pcm_stats(make_wav(8000, 1, samples=s32, bits=32)) == base
    assert wav_pcm_stats(make_wav(8000, 1, samples=sine16, extensible=True)) == base
    stf = wav_pcm_stats(
        make_wav(8000, 1, samples=[v / 32768.0 for v in sine16], float_fmt=True)
    )
    assert stf[0] == base[0] and abs(stf[1] - base[1]) <= 2e-4
    clipf = wav_pcm_stats(
        make_wav(8000, 1, samples=[1.5, -2.0, 0.5, 0.0], float_fmt=True)
    )
    assert clipf[3] == 0.5 and clipf[2] == 2.0  # peak may exceed 1.0
    # resample: wider integer widths are sample-exact vs the 16-bit path
    r16 = wav_resample(make_wav(8000, 1, samples=sine16), 4000)
    assert r16 == wav_resample(make_wav(8000, 1, samples=s24, bits=24), 4000)
    assert r16 == wav_resample(make_wav(8000, 1, samples=s32, bits=32), 4000)
    r8 = wav_resample(
        make_wav(8000, 1, samples=[128 + (100 if i % 2 else -100)
                                   for i in range(100)], bits=8),
        4000,
    )
    assert r8 is not None and parse_wav_meta(r8)[0] == 4000
    rf = wav_resample(
        make_wav(8000, 1, samples=[v / 32768.0 for v in sine16],
                 float_fmt=True),
        4000,
    )
    a = _s.unpack(f"<{(len(r16) - 44) // 2}h", r16[44:])
    b = _s.unpack(f"<{(len(rf) - 44) // 2}h", rf[44:])
    assert len(a) == len(b) and max(abs(u - v) for u, v in zip(a, b)) <= 1
    assert wav_pcm_stats(make_mp3(44100, 1, 2)) is None  # compressed stub


def test_bmp_profiles():
    """BMP crawl profiles decode: palette 1/4/8-bit (uncompressed and
    RLE8), 32bpp with alpha dropped, 16bpp XRGB1555 with 5-bit
    scaling — exact round-trips through the spec writers."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        _bmp_parse_pixels,
        make_bmp,
        make_bmp_palette,
        make_bmp_wide,
    )

    W, H = 17, 9
    pal_colors = [((i * 53) % 256, (i * 29) % 256, (i * 11) % 256) for i in range(256)]
    for bpp in (1, 4, 8):
        nc = 1 << bpp
        rows = [[pal_colors[(x + 2 * y) % nc] for x in range(W)] for y in range(H)]
        assert _bmp_parse_pixels(make_bmp_palette(W, H, rows, bpp=bpp)) == (
            W, H, rows,
        ), bpp
    rows8 = [[pal_colors[(x // 3 + y) % 7] for x in range(W)] for y in range(H)]
    rle = make_bmp_palette(W, H, rows8, bpp=8, rle=True)
    assert _bmp_parse_pixels(rle) == (W, H, rows8)
    assert _bmp_parse_pixels(rle[:30]) is None
    rows = [
        [((x * 13) % 256, (y * 7) % 256, (x + y) % 256) for x in range(W)]
        for y in range(H)
    ]
    assert _bmp_parse_pixels(make_bmp_wide(W, H, rows, bpp=32)) == (W, H, rows)
    out = _bmp_parse_pixels(make_bmp_wide(W, H, rows, bpp=16))
    assert out is not None
    for y in range(H):
        for x in range(W):
            for got, orig in zip(out[2][y][x], rows[y][x]):
                assert got == (orig >> 3) * 255 // 31
    assert _bmp_parse_pixels(make_bmp(W, H, rows)) == (W, H, rows)


def test_png_truncated_plte_rejected():
    """A palette PNG cut off inside its PLTE chunk must return None,
    not raise (the chunk-length field survives while the body is
    short — review/fuzz-found crash)."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        make_png_palette,
        png_parse_pixels,
    )

    rows = [[((x % 4) * 37, (y % 4) * 53, 0) for x in range(13)]
            for y in range(8)]
    p = make_png_palette(13, 8, rows, bit_depth=4)
    i = p.index(b"PLTE")
    plte_len = int.from_bytes(p[i - 4 : i], "big")
    for cut in (i + 6, i + 11, i + 4 + plte_len - 1):
        assert png_parse_pixels(p[:cut]) is None, cut


def test_bmp_rle4():
    """RLE4 (compression=2) decodes: encoded runs carry two
    alternating nibbles, absolute runs pack nibbles MSB-first with
    word padding — round-trip through the RLE4 fixture writer plus a
    hand-built absolute-run stream."""
    import struct

    from bb_bigdata_log_tools_spark.operators.multimodal import (
        _bmp_parse_pixels,
        make_bmp_palette,
    )

    W, H = 17, 9
    pal = [((i * 53) % 256, (i * 29) % 256, (i * 11) % 256) for i in range(16)]
    rows = [[pal[(x // 3 + y) % 13] for x in range(W)] for y in range(H)]
    p4 = make_bmp_palette(W, H, rows, bpp=4, rle=True)
    assert _bmp_parse_pixels(p4) == (W, H, rows)
    assert _bmp_parse_pixels(p4[:40]) is None  # truncation rejects
    # absolute-run escape (0, n >= 3): 5 nibbles, word-padded
    i_pix = int.from_bytes(p4[10:14], "little")
    hdr = bytearray(p4[:i_pix])
    hdr[18:26] = struct.pack("<ii", 5, 1)
    stream = bytes([0, 5, 0x12, 0x34, 0x50, 0x00, 0, 0, 0, 1])
    out = _bmp_parse_pixels(bytes(hdr) + stream)
    assert out is not None and (out[0], out[1]) == (5, 1)
    file_pal = [
        (hdr[i_pix - 64 + 4 * i], hdr[i_pix - 64 + 4 * i + 1],
         hdr[i_pix - 64 + 4 * i + 2])
        for i in range(16)
    ]
    assert out[2][0] == [file_pal[i] for i in (1, 2, 3, 4, 5)]


def test_bmp_bitfields_565():
    """BI_BITFIELDS (compression=3) decodes via the explicit channel
    masks — 5-6-5 round-trips with per-channel truncate-and-scale,
    and a zero mask (corrupt) rejects."""
    import struct

    from bb_bigdata_log_tools_spark.operators.multimodal import (
        _bmp_parse_pixels,
        make_bmp_wide,
    )

    W, H = 17, 9
    rows = [
        [((x * 13) % 256, (y * 7) % 256, (x + y) % 256) for x in range(W)]
        for y in range(H)
    ]
    out = _bmp_parse_pixels(make_bmp_wide(W, H, rows, bpp=16, rgb565=True))
    assert out is not None and (out[0], out[1]) == (W, H)
    for y in range(H):
        for x in range(W):
            b, g, r = rows[y][x]
            exp = (
                (b >> 3) * 255 // 31,
                (g >> 2) * 255 // 63,
                (r >> 3) * 255 // 31,
            )
            assert out[2][y][x] == exp
    p = bytearray(make_bmp_wide(W, H, rows, bpp=16, rgb565=True))
    p[54:58] = struct.pack("<I", 0)
    assert _bmp_parse_pixels(bytes(p)) is None
