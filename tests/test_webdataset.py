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


def test_distributed_writer_roundtrip_and_byte_determinism(spark, tmp_path):
    """write_webdataset → read_webdataset must round-trip every member,
    all members of a sample share a shard, and writing the same input
    twice produces byte-identical shards."""
    import hashlib
    import os

    from bb_bigdata_log_tools_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    rows = [
        (f"{i:05d}", ext, (f"{i}-{ext}-" + "x" * (i % 7)).encode())
        for i in range(40)
        for ext in ("txt", "json", "meta.json")
    ]
    df = spark.createDataFrame(
        rows, "sample_key string, ext string, payload binary"
    )

    def digest(d):
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
            if f.endswith(".tar")
        }

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_webdataset(df, d1, n_shards=4).collect()
    m2 = write_webdataset(df, d2, n_shards=4).collect()
    assert sorted(os.path.basename(r.path) for r in m1) == sorted(digest(d1))
    assert list(digest(d1).values()) == list(digest(d2).values())  # determinism
    assert sum(r.n_members for r in m1) == len(rows)
    assert sum(r.n_samples for r in m1) == 40

    back = read_webdataset(spark, d1 + "/*.tar")
    got = sorted(
        (r.sample_key, r.ext, bytes(r.payload)) for r in back.collect()
    )
    assert got == sorted(rows)
    # sample-shard cohesion: each key appears in exactly one shard
    import pyspark.sql.functions as F

    per_key = back.groupBy("sample_key").agg(
        F.countDistinct("shard").alias("n")
    )
    assert per_key.filter("n > 1").count() == 0
