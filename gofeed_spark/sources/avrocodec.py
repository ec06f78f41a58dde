"""Apache Avro object-container codec, pure Python from the public spec
(avro.apache.org/docs — binary encoding + object container files).  The
sandbox carries no avro library; Iceberg's manifest and manifest-list
files are Avro containers, so table interop (sources/iceberg.py) needs
exactly this: a GENERIC schema-driven binary decoder (reads any
container via the ``avro.schema`` JSON embedded in its header — so
manifests written by real Iceberg writers parse with no generated
classes) and a generic encoder for the schemas this engine writes.

Scope: the full binary type system — null, boolean, int, long, float,
double, bytes, string, record, enum, array, map, union, fixed; logical
types pass through (the underlying physical type is what's encoded).
Codecs: ``null`` and ``deflate`` (raw zlib, per spec).  Metadata-sized
payloads only (manifests, manifest lists) — decoded driver-side; the
data plane stays parquet.

Error contract (the engine's codec rule): every malformed-input failure
raises :class:`AvroError` — callers catch exactly that, and a leaked
struct/KeyError would crash a Spark task.

Determinism: the container sync marker derives from the schema + an
engine tag (no clocks, no randomness), so identical writes are
byte-identical.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


class AvroError(ValueError):
    """Malformed Avro input (or a value that does not fit its schema)."""


# --- schema handling ----------------------------------------------------------


def parse_schema(schema, names: dict | None = None):
    """Normalize a schema (JSON string or parsed value) and register named
    types (record/enum/fixed) in ``names`` so later string references
    resolve.  Returns the normalized schema; raises AvroError on junk."""
    if names is None:
        names = {}
    if isinstance(schema, (bytes, str)):
        s = schema.decode() if isinstance(schema, bytes) else schema
        stripped = s.strip()
        if stripped.startswith(("{", "[", '"')):
            try:
                schema = json.loads(stripped)
            except json.JSONDecodeError as exc:
                raise AvroError(f"unparseable schema JSON: {exc}") from exc
        else:
            schema = stripped
    return _norm(schema, names, namespace="")


def _fullname(name: str, namespace: str) -> str:
    return name if "." in name or not namespace else f"{namespace}.{name}"


def _norm(schema, names: dict, namespace: str):
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        full = _fullname(schema, namespace)
        if full in names:
            return names[full]
        if schema in names:
            return names[schema]
        raise AvroError(f"unknown type reference {schema!r}")
    if isinstance(schema, list):
        return [_norm(b, names, namespace) for b in schema]
    if not isinstance(schema, dict) or "type" not in schema:
        raise AvroError(f"malformed schema node: {schema!r}")
    t = schema["type"]
    if t in _PRIMITIVES and len(schema) <= 2:  # {"type":"long","logicalType":..}
        return t
    if t == "array":
        return {"type": "array", "items": _norm(schema.get("items"), names, namespace)}
    if t == "map":
        return {"type": "map", "values": _norm(schema.get("values"), names, namespace)}
    if t in ("record", "enum", "fixed"):
        ns = schema.get("namespace", namespace)
        try:
            name = schema["name"]
        except KeyError as exc:
            raise AvroError(f"named type without name: {schema!r}") from exc
        out = {"type": t, "name": name}
        # register BEFORE fields normalize: recursive references resolve
        names[_fullname(name, ns)] = out
        names.setdefault(name, out)
        if t == "record":
            fields = []
            for f in schema.get("fields", []):
                try:
                    fields.append(
                        {
                            "name": f["name"],
                            "type": _norm(f["type"], names, ns),
                            **({"default": f["default"]} if "default" in f else {}),
                        }
                    )
                except (KeyError, TypeError) as exc:
                    raise AvroError(f"malformed record field: {f!r}") from exc
            out["fields"] = fields
        elif t == "enum":
            out["symbols"] = list(schema.get("symbols", []))
        else:
            try:
                out["size"] = int(schema["size"])
            except (KeyError, TypeError, ValueError) as exc:
                raise AvroError(f"fixed without size: {schema!r}") from exc
        return out
    if t in _PRIMITIVES:
        return t
    # {"type": {"type": "array", ...}} nesting is legal JSON-schema form
    if isinstance(t, (dict, list)):
        return _norm(t, names, namespace)
    raise AvroError(f"unsupported schema type {t!r}")


# --- binary decode ------------------------------------------------------------


class _Cursor:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def take(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.data):
            raise AvroError(
                f"truncated input: need {n} bytes at {self.pos}/{len(self.data)}"
            )
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def eof(self) -> bool:
        return self.pos >= len(self.data)


def _read_long(c: _Cursor) -> int:
    acc = 0
    shift = 0
    while True:
        b = c.u8()
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise AvroError("varint longer than 10 bytes")
    return (acc >> 1) ^ -(acc & 1)


def _read_blocks(c: _Cursor, read_item):
    """array/map share the block encoding: count (negative => byte size
    follows), items, terminated by a 0 count."""
    out = []
    while True:
        n = _read_long(c)
        if n == 0:
            return out
        if n < 0:
            n = -n
            _read_long(c)  # block byte size — unused, we decode sequentially
        for _ in range(n):
            out.append(read_item())


def decode_value(schema, c: _Cursor):
    """One datum per ``schema`` off the cursor."""
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            v = c.u8()
            if v not in (0, 1):
                raise AvroError(f"bad boolean byte {v}")
            return bool(v)
        if schema in ("int", "long"):
            return _read_long(c)
        if schema == "float":
            return struct.unpack("<f", c.take(4))[0]
        if schema == "double":
            return struct.unpack("<d", c.take(8))[0]
        if schema == "bytes":
            n = _read_long(c)
            if n < 0:
                raise AvroError(f"negative bytes length {n}")
            return c.take(n)
        if schema == "string":
            n = _read_long(c)
            if n < 0:
                raise AvroError(f"negative string length {n}")
            try:
                return c.take(n).decode("utf-8")
            except UnicodeDecodeError as exc:
                raise AvroError(f"invalid utf-8 string: {exc}") from exc
        raise AvroError(f"unsupported primitive {schema!r}")
    if isinstance(schema, list):  # union
        idx = _read_long(c)
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range {len(schema)}")
        return decode_value(schema[idx], c)
    t = schema["type"]
    if t == "record":
        return {f["name"]: decode_value(f["type"], c) for f in schema["fields"]}
    if t == "array":
        return _read_blocks(c, lambda: decode_value(schema["items"], c))
    if t == "map":
        out = {}

        def read_pair():
            k = decode_value("string", c)
            out[k] = decode_value(schema["values"], c)

        _read_blocks(c, read_pair)
        return out
    if t == "enum":
        idx = _read_long(c)
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise AvroError(f"enum index {idx} out of range {len(symbols)}")
        return symbols[idx]
    if t == "fixed":
        return c.take(schema["size"])
    raise AvroError(f"unsupported schema node {t!r}")


# --- binary encode ------------------------------------------------------------


def _write_long(out: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63) if n >= -(1 << 63) else None
    if z is None or n >= 1 << 63:
        raise AvroError(f"long out of 64-bit range: {n}")
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def encode_value(schema, value, out: bytearray) -> None:
    if isinstance(schema, str):
        if schema == "null":
            if value is not None:
                raise AvroError(f"non-null {value!r} for null schema")
            return
        if schema == "boolean":
            out.append(1 if value else 0)
            return
        if schema in ("int", "long"):
            if not isinstance(value, int) or isinstance(value, bool):
                raise AvroError(f"non-int {value!r} for {schema}")
            _write_long(out, value)
            return
        if schema == "float":
            out += struct.pack("<f", float(value))
            return
        if schema == "double":
            out += struct.pack("<d", float(value))
            return
        if schema == "bytes":
            b = bytes(value)
            _write_long(out, len(b))
            out += b
            return
        if schema == "string":
            b = str(value).encode("utf-8")
            _write_long(out, len(b))
            out += b
            return
        raise AvroError(f"unsupported primitive {schema!r}")
    if isinstance(schema, list):  # union — null-branch selection only
        for i, branch in enumerate(schema):
            if (branch == "null") == (value is None):
                _write_long(out, i)
                encode_value(branch, value, out)
                return
        raise AvroError(f"no union branch for {value!r} in {schema!r}")
    t = schema["type"]
    if t == "record":
        if not isinstance(value, dict):
            raise AvroError(f"non-dict {value!r} for record {schema.get('name')}")
        for f in schema["fields"]:
            if f["name"] in value:
                v = value[f["name"]]
            elif "default" in f:
                v = f["default"]
            elif isinstance(f["type"], list) and "null" in f["type"]:
                v = None
            else:
                raise AvroError(
                    f"record {schema.get('name')} missing field {f['name']!r}"
                )
            encode_value(f["type"], v, out)
        return
    if t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for item in items:
                encode_value(schema["items"], item, out)
        _write_long(out, 0)
        return
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                encode_value("string", k, out)
                encode_value(schema["values"], v, out)
        _write_long(out, 0)
        return
    if t == "enum":
        try:
            _write_long(out, schema["symbols"].index(value))
        except ValueError as exc:
            raise AvroError(f"{value!r} not in enum {schema['symbols']}") from exc
        return
    if t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise AvroError(f"fixed size {len(b)} != {schema['size']}")
        out += b
        return
    raise AvroError(f"unsupported schema node {t!r}")


# --- object container files ---------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_container(
    schema,
    records: list,
    codec: str = "deflate",
    meta: dict[str, bytes] | None = None,
) -> bytes:
    """Records → one Avro object-container file (single block).  ``schema``
    may be a JSON string or parsed value; extra header ``meta`` entries
    (Iceberg stamps schema/partition-spec/format-version there) ride
    alongside the standard ``avro.schema``/``avro.codec`` keys."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    schema_json = schema if isinstance(schema, str) else json.dumps(schema)
    names: dict = {}
    parsed = parse_schema(schema_json, names)
    body = bytearray()
    for rec in records:
        encode_value(parsed, rec, body)
    payload = bytes(body)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
    header_meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    for k, v in (meta or {}).items():
        header_meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    sync = hashlib.md5(
        b"gofeed-avro-sync:" + schema_json.encode("utf-8")
    ).digest()
    out = bytearray(MAGIC)
    encode_value(_META_SCHEMA, header_meta, out)
    out += sync
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out += payload
    out += sync
    return bytes(out)


def read_container(data: bytes) -> tuple[dict | list | str, dict[str, bytes], list]:
    """Container bytes → (parsed schema, header metadata, records).  The
    embedded ``avro.schema`` drives decoding — files from ANY writer parse
    (within the supported type system)."""
    c = _Cursor(data)
    if c.take(4) != MAGIC:
        raise AvroError("not an Avro container (bad magic)")
    meta = decode_value(_META_SCHEMA, c)
    sync = c.take(16)
    try:
        schema_json = meta["avro.schema"].decode("utf-8")
    except (KeyError, UnicodeDecodeError) as exc:
        raise AvroError("container missing avro.schema") from exc
    codec = meta.get("avro.codec", b"null").decode("utf-8", "replace")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    names: dict = {}
    schema = parse_schema(schema_json, names)
    records: list = []
    while not c.eof():
        n = _read_long(c)
        size = _read_long(c)
        if n < 0 or size < 0:
            raise AvroError(f"bad block header (count {n}, size {size})")
        block = c.take(size)
        if codec == "deflate":
            try:
                block = zlib.decompress(block, wbits=-zlib.MAX_WBITS)
            except zlib.error as exc:
                raise AvroError(f"corrupt deflate block: {exc}") from exc
        bc = _Cursor(block)
        for _ in range(n):
            records.append(decode_value(schema, bc))
        if not bc.eof():
            raise AvroError(f"{len(block) - bc.pos} undecoded bytes in block")
        if c.take(16) != sync:
            raise AvroError("sync marker mismatch (torn container)")
    return schema, meta, records
