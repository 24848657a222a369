"""Round-trip and reassembly tests for the WebDataset tar-shard source."""

from __future__ import annotations

from bb_bigdata_log_tools_spark.sources.webdataset import (
    read_webdataset,
    samples_from_members,
    write_webdataset_local,
)


def _fixture_rows(n: int):
    rows = []
    for i in range(n):
        key = f"{i:06d}"
        rows.append((key, "txt", f"caption {i}".encode()))
        rows.append((key, "jpg", b"\xff\xd8\xff" + bytes([i % 256]) * 10))
        if i % 3 == 0:
            rows.append((key, "seg.png", b"\x89PNG" + bytes([i % 256])))
    return rows


def test_webdataset_roundtrip(spark, tmp_path):
    rows = _fixture_rows(25)
    paths = write_webdataset_local(rows, str(tmp_path / "wds"), shard_size=10)
    assert len(paths) == 3  # 25 samples / 10 per shard

    members = read_webdataset(spark, str(tmp_path / "wds" / "*.tar"))
    got = members.collect()
    assert len(got) == len(rows)
    # double-extension split rule: x.seg.png -> key x, ext seg.png
    exts = {r.ext for r in got}
    assert exts == {"txt", "jpg", "seg.png"}
    # payloads byte-identical
    want = {(k, e): p for k, e, p in rows}
    for r in got:
        assert bytes(r.payload) == want[(r.sample_key, r.ext)]
        assert r.n_bytes == len(want[(r.sample_key, r.ext)])


def test_webdataset_sample_reassembly(spark, tmp_path):
    rows = _fixture_rows(9)
    write_webdataset_local(rows, str(tmp_path / "wds"), shard_size=5)
    members = read_webdataset(spark, str(tmp_path / "wds" / "*.tar"))
    samples = samples_from_members(members).collect()
    assert len(samples) == 9
    for s in samples:
        i = int(s.sample_key)
        expect = ["jpg", "seg.png", "txt"] if i % 3 == 0 else ["jpg", "txt"]
        assert s.exts == expect
        assert bytes(s.payloads["txt"]) == f"caption {i}".encode()


def test_webdataset_feeds_multimodal_ops(spark, tmp_path):
    """The reader's (media_type, payload) projection must plug straight
    into the existing multimodal feature extraction."""
    from pyspark.sql import functions as F

    from bb_bigdata_log_tools_spark.operators.multimodal import extract_features

    rows = _fixture_rows(6)
    write_webdataset_local(rows, str(tmp_path / "wds"))
    members = read_webdataset(spark, str(tmp_path / "wds" / "*.tar"))
    media = members.filter(F.col("ext") == "jpg").select(
        F.col("sample_key").cast("long").alias("doc_id"),
        F.lit("image").alias("media_type"),
        "payload",
    )
    out = extract_features(media).collect()
    assert len(out) == 6
    # truncated JPEG headers fall back to the flagged stub
    assert all(r.decoded is False for r in out)
