"""Generic Avro container source: round-trip decode, block scan without
decode, and raw-block merge (AvroBlockInputFormat / AvroBlockWriterMapper
parity — see sources/avro_generic.py docstring)."""

from __future__ import annotations

import json
import os

import pytest

from bb_bigdata_log_tools_spark.sources import avro_generic as ag
from bb_bigdata_log_tools_spark.sources.boom import read_container

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "flag", "type": "boolean"},
            {"name": "note", "type": ["null", "string"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
        ],
    }
)


def _rows(n, start=0):
    return [
        {
            "id": start + i,
            "name": f"doc-{start + i}",
            "score": (start + i) * 1.5,
            "flag": (start + i) % 2 == 0,
            "note": None if (start + i) % 3 == 0 else f"n{start + i}",
            "tags": [f"t{j}" for j in range((start + i) % 3)],
            "attrs": {"len": start + i, "neg": -(start + i)},
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_roundtrip_local(tmp_path, codec):
    rows = _rows(7)
    p = str(tmp_path / "a.avro")
    ag.write_avro_local(p, SCHEMA, rows, codec=codec, records_per_block=3)
    with open(p, "rb") as f:
        got = list(read_container(f.read()))
    assert got == rows


def test_block_scan_no_decode(tmp_path, spark):
    p = str(tmp_path / "a.avro")
    ag.write_avro_local(p, SCHEMA, _rows(7), records_per_block=3)
    out = ag.avro_block_scan(spark, str(tmp_path)).orderBy("block_idx").collect()
    assert [(r.block_idx, r.record_count, r.codec) for r in out] == [
        (0, 3, "deflate"),
        (1, 3, "deflate"),
        (2, 1, "deflate"),
    ]
    # byte_size is the compressed payload size exactly as on disk
    with open(p, "rb") as f:
        raw = f.read()
    assert [r.byte_size for r in out] == [sz for _i, _n, sz, _p in ag.scan_blocks(raw)]


def test_read_avro_typed(tmp_path, spark):
    ag.write_avro_local(str(tmp_path / "a.avro"), SCHEMA, _rows(5))
    df = ag.read_avro(spark, str(tmp_path))
    assert dict(df.dtypes)["tags"] == "array<string>"
    assert dict(df.dtypes)["attrs"] == "map<string,bigint>"
    got = {r.id: r for r in df.collect()}
    assert got[1].note == "n1" and got[3].note is None
    assert got[2].tags == ["t0", "t1"] and got[2].attrs == {"len": 2, "neg": -2}


def test_merge_raw_blocks(tmp_path, spark):
    a, b, merged = (str(tmp_path / n) for n in ("a.avro", "b.avro", "m.avro"))
    ag.write_avro_local(a, SCHEMA, _rows(5), sync=b"\x11" * 16, records_per_block=2)
    ag.write_avro_local(b, SCHEMA, _rows(4, start=100), sync=b"\x22" * 16)
    n = ag.merge_avro_files(spark, [a, b], merged)
    assert n == 9
    with open(merged, "rb") as f:
        data = f.read()
    _schema, _codec, sync, _pos = ag.read_header(data)
    assert sync == ag.MERGE_SYNC  # one header, markers rewritten
    got = list(read_container(data))
    assert got == _rows(5) + _rows(4, start=100)
    # raw payload bytes are copied verbatim from the inputs
    with open(a, "rb") as f:
        src_payloads = [raw for _i, _n, _sz, raw in ag.scan_blocks(f.read())]
    merged_payloads = [raw for _i, _n, _sz, raw in ag.scan_blocks(data)]
    assert merged_payloads[: len(src_payloads)] == src_payloads


def test_merge_rejects_mismatched_schema(tmp_path, spark):
    other = json.dumps(
        {"type": "record", "name": "x", "fields": [{"name": "id", "type": "long"}]}
    )
    a, b = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    ag.write_avro_local(a, SCHEMA, _rows(2))
    ag.write_avro_local(b, other, [{"id": 1}])
    with pytest.raises(ValueError, match="mismatch"):
        ag.merge_avro_files(spark, [a, b], str(tmp_path / "m.avro"))


def test_nested_record_struct(tmp_path, spark):
    nested = json.dumps(
        {
            "type": "record",
            "name": "outer",
            "fields": [
                {"name": "id", "type": "long"},
                {
                    "name": "pos",
                    "type": {
                        "type": "record",
                        "name": "pt",
                        "fields": [
                            {"name": "x", "type": "double"},
                            {"name": "y", "type": "double"},
                        ],
                    },
                },
            ],
        }
    )
    rows = [{"id": i, "pos": {"x": i * 1.0, "y": -i * 1.0}} for i in range(3)]
    ag.write_avro_local(str(tmp_path / "n.avro"), nested, rows)
    df = ag.read_avro(spark, str(tmp_path), glob="n.avro")
    assert dict(df.dtypes)["pos"] == "struct<x:double,y:double>"
    assert df.filter("pos.x = 2.0").count() == 1
