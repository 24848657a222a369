"""Generic Avro object-container source: block-level scan, raw-block
merge, and schema-driven decode to a DataFrame.

Parity targets (re-derived from the PUBLIC Avro 1.x container spec):

- ``mapreduce/avro/AvroBlockInputFormat.java`` +
  ``AvroBlockRecordReader.java``: read whole container blocks WITHOUT
  decompressing or deserializing them — used for block-level filtering
  and for merging files cheaply (``avro_block_scan`` here).
- ``mapreduce/avro/AvroBlockWriterMapper.java`` + BinaryOutputFormat:
  merge multiple same-schema/same-codec containers into one by keeping
  a single header and rewriting every block's sync marker to the
  output's marker (``merge_avro_files`` here). Payloads are copied
  verbatim — no decompress/decode on the merge path.
- ``avro/AvroFileHeader.java`` / ``avro/AvroUtils.java``: header
  parse/serialize (``read_header`` / ``container_header_bytes``).

Spark integration mirrors the boom source: ``binaryFile`` +
``mapInPandas`` so every file is processed Arrow-batched on an
executor; the merge writes through one ordered partition with a
streaming writer (bounded memory), the same shape as
``compact_boom_dir``. Schema translation maps the embedded writer
schema to Spark types so arbitrary-schema containers (not just boom's
logBlock) decode to typed DataFrames.
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from bb_bigdata_log_tools_spark.sources.boom import MAGIC, _Decoder, _zigzag


# ---------------------------------------------------------------------------
# header / block-level access (no decode)
# ---------------------------------------------------------------------------


def read_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """Parse just the container header: returns (schema, codec, sync,
    header_end_offset). Never touches block payloads."""
    dec = _Decoder(data)
    if dec.read_fixed(4) != MAGIC:
        raise ValueError("not an Avro container file (bad magic)")
    meta = dec.read_map_of_bytes()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = dec.read_fixed(16)
    return schema, codec, sync, dec.pos


def scan_blocks(data: bytes) -> Iterator[tuple[int, int, int, bytes]]:
    """Yield (block_idx, record_count, byte_size, raw_payload) for each
    block — the payload stays compressed; nothing is deserialized.
    This is the AvroBlockRecordReader role."""
    _schema, _codec, sync, pos = read_header(data)
    dec = _Decoder(data)
    dec.pos = pos
    idx = 0
    while dec.pos < len(dec.buf):
        count = dec.read_long()
        size = dec.read_long()
        payload = dec.read_fixed(size)
        if dec.read_fixed(16) != sync:
            raise ValueError("sync marker mismatch — corrupt container")
        yield idx, count, size, payload
        idx += 1


def avro_block_scan(spark: SparkSession, path: str, glob: str = "*.avro") -> DataFrame:
    """Block-level DataFrame over a container tree: one row per block,
    (file, block_idx, record_count, byte_size, codec) — blocks are
    walked but never decompressed. Supports the reference's low-level
    use case (decide which blocks to process without deserializing)."""
    import pandas as pd

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                _schema, codec, _sync, _pos = read_header(data)
                rows = [
                    (os.path.basename(str(p)), i, n, sz)
                    for i, n, sz, _raw in scan_blocks(data)
                ]
                yield pd.DataFrame(
                    [(f, i, n, sz, codec) for f, i, n, sz in rows],
                    columns=["file", "block_idx", "record_count", "byte_size", "codec"],
                )

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return binary.mapInPandas(
        scan,
        schema="file string, block_idx long, record_count long, "
        "byte_size long, codec string",
    )


# ---------------------------------------------------------------------------
# generic encoder + container writer (fixtures, merge output, tests)
# ---------------------------------------------------------------------------


class _Encoder:
    """Schema-driven Avro binary encoder — the write-side mirror of
    ``boom._Decoder.decode`` (same type coverage)."""

    def __init__(self) -> None:
        self.out = bytearray()

    def write_long(self, n: int) -> None:
        self.out += _zigzag(n)

    write_int = write_long

    def write_bytes(self, b: bytes) -> None:
        self.write_long(len(b))
        self.out += b

    def encode(self, schema, value) -> None:
        if isinstance(schema, str):
            kind = schema
        elif isinstance(schema, list):  # union: pick first matching branch
            idx = _union_index(schema, value)
            self.write_long(idx)
            return self.encode(schema[idx], value)
        else:
            kind = schema["type"]
        if kind == "record":
            for f in schema["fields"]:
                self.encode(f["type"], value[f["name"]])
        elif kind == "array":
            items = list(value)
            if items:
                self.write_long(len(items))
                for it in items:
                    self.encode(schema["items"], it)
            self.write_long(0)
        elif kind == "map":
            entries = list(value.items())
            if entries:
                self.write_long(len(entries))
                for k, v in entries:
                    self.write_bytes(k.encode("utf-8"))
                    self.encode(schema["values"], v)
            self.write_long(0)
        elif kind in ("long", "int"):
            self.write_long(int(value))
        elif kind == "string":
            self.write_bytes(str(value).encode("utf-8"))
        elif kind == "bytes":
            self.write_bytes(bytes(value))
        elif kind == "boolean":
            self.out.append(1 if value else 0)
        elif kind == "float":
            self.out += struct.pack("<f", float(value))
        elif kind == "double":
            self.out += struct.pack("<d", float(value))
        elif kind == "null":
            pass
        else:
            raise ValueError(f"unsupported avro type: {schema!r}")


def _union_index(branches: list, value) -> int:
    if value is None:
        for i, b in enumerate(branches):
            if b == "null":
                return i
        raise ValueError("None value but union has no null branch")
    for i, b in enumerate(branches):
        if b != "null":
            return i
    raise ValueError("union has only null branches")


def container_header_bytes(schema_json: str, codec: str, sync: bytes) -> bytes:
    """Serialize a container header (AvroFileHeader.toBytes role)."""
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    out += _zigzag(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    out += _zigzag(0)
    out += sync
    return bytes(out)


def block_bytes(
    schema, rows: list, codec: str, sync: bytes
) -> bytes:
    """Encode one container block (count, size, payload, sync)."""
    enc = _Encoder()
    for row in rows:
        enc.encode(schema, row)
    payload = bytes(enc.out)
    if codec == "deflate":
        payload = zlib.compress(payload, 6)[2:-4]
    elif codec != "null":
        raise ValueError(f"unsupported codec: {codec}")
    return _zigzag(len(rows)) + _zigzag(len(payload)) + payload + sync


def write_avro_local(
    path: str,
    schema_json: str,
    rows: list[dict],
    codec: str = "deflate",
    sync: bytes = b"\x01" * 16,
    records_per_block: int = 1000,
) -> None:
    """Write rows (dicts keyed by field name) to one container file."""
    schema = json.loads(schema_json)
    with open(path, "wb") as f:
        f.write(container_header_bytes(schema_json, codec, sync))
        for i in range(0, len(rows), records_per_block):
            f.write(block_bytes(schema, rows[i : i + records_per_block], codec, sync))


# ---------------------------------------------------------------------------
# raw-block merge (AvroBlockWriterMapper + BinaryOutputFormat role)
# ---------------------------------------------------------------------------

MERGE_SYNC = b"\x5c" * 16  # fixed output marker, deterministic merges


def merge_avro_files(spark: SparkSession, paths: list[str], out_path: str) -> int:
    """Merge same-schema/same-codec containers into ONE container by
    raw block copy: single header, every block re-synced to the output
    marker, payloads byte-identical (never decompressed).

    Distributed shape: each input file's blocks are extracted on an
    executor (binaryFile scan); the ordered segments flow through one
    sorted partition into a streaming writer, so driver memory stays
    O(1) and executor memory O(largest single block) — the same pattern
    as ``compact_boom_dir``. Returns the merged record count.

    Parity: ``mapreduce/avro/AvroBlockWriterMapper.java`` (keep one
    header, clean up sync markers) over BinaryOutputFormat.
    """
    import pandas as pd

    if not paths:
        raise ValueError("no input files")
    headers = []
    for p in paths:
        with open(p, "rb") as f:
            headers.append(read_header(f.read(1 << 20)))
    schema0, codec0 = headers[0][0], headers[0][1]
    for p, (schema, codec, _s, _e) in zip(paths[1:], headers[1:]):
        if schema != schema0 or codec != codec0:
            raise ValueError(f"schema/codec mismatch in merge input: {p}")

    order = {os.path.realpath(p): i for i, p in enumerate(paths)}

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                local = os.path.realpath(str(p).removeprefix("file:"))
                data = bytes(content)
                segs = [
                    (
                        order[local],
                        i,
                        n,
                        _zigzag(n) + _zigzag(sz) + raw + MERGE_SYNC,
                    )
                    for i, n, sz, raw in scan_blocks(data)
                ]
                yield pd.DataFrame(
                    segs, columns=["file_order", "block_idx", "record_count", "seg"]
                )

    binary = spark.read.format("binaryFile").load(paths).select("path", "content")
    segs = binary.mapInPandas(
        extract,
        schema="file_order int, block_idx long, record_count long, seg binary",
    )

    header = container_header_bytes(
        json.dumps(schema0, separators=(",", ":")), codec0, MERGE_SYNC
    )
    tmp_out = out_path + ".inprogress"

    def write_part(rows) -> Iterator[tuple[int]]:
        n = 0
        with open(tmp_out, "wb") as f:
            f.write(header)
            for row in rows:
                f.write(bytes(row.seg))
                n += int(row.record_count)
        yield (n,)

    counts = (
        segs.repartition(1)
        .sortWithinPartitions("file_order", "block_idx")
        .rdd.mapPartitions(write_part)
        .collect()
    )
    os.replace(tmp_out, out_path)
    return counts[0][0] if counts else 0


# ---------------------------------------------------------------------------
# schema-driven decode to DataFrame
# ---------------------------------------------------------------------------


def avro_to_spark_type(schema) -> str:
    """Map an Avro schema to a Spark DDL type string."""
    if isinstance(schema, list):
        non_null = [b for b in schema if b != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only unions of null + one type supported: {schema!r}")
        return avro_to_spark_type(non_null[0])
    if isinstance(schema, str):
        kind = schema
    else:
        kind = schema["type"]
    simple = {
        "long": "bigint",
        "int": "int",
        "string": "string",
        "bytes": "binary",
        "boolean": "boolean",
        "float": "float",
        "double": "double",
    }
    if kind in simple:
        return simple[kind]
    if kind == "array":
        return f"array<{avro_to_spark_type(schema['items'])}>"
    if kind == "map":
        return f"map<string,{avro_to_spark_type(schema['values'])}>"
    if kind == "record":
        fields = ", ".join(
            f"`{f['name']}`: {avro_to_spark_type(f['type'])}" for f in schema["fields"]
        )
        return f"struct<{fields}>"
    raise ValueError(f"unsupported avro type: {schema!r}")


def record_ddl(schema) -> str:
    """Top-level record schema → DataFrame DDL (one column per field)."""
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("top-level avro schema must be a record")
    return ", ".join(
        f"`{f['name']}` {avro_to_spark_type(f['type'])}" for f in schema["fields"]
    )


def read_avro(spark: SparkSession, path: str, glob: str = "*.avro") -> DataFrame:
    """Decode an arbitrary-schema Avro container tree to a typed
    DataFrame. The writer schema is taken from the first file's header
    (all files must agree — standard single-schema layout); decode runs
    Arrow-batched on executors via ``mapInPandas``."""
    import pandas as pd

    from bb_bigdata_log_tools_spark.sources.boom import read_container

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )
    first = binary.limit(1).collect()
    if not first:
        raise ValueError(f"no avro files under {path}")
    schema, _codec, _sync, _pos = read_header(bytes(first[0][0]))
    ddl = record_ddl(schema)
    names = [f["name"] for f in schema["fields"]]

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                recs = list(read_container(bytes(content)))
                yield pd.DataFrame(
                    [[r[n] for n in names] for r in recs], columns=names
                )

    return binary.mapInPandas(decode, schema=ddl)
