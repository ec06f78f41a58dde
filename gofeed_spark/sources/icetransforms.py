"""Iceberg partition TRANSFORMS from the public spec (iceberg.apache.org/
spec §Partition Transforms + Appendix B "32-bit Hash Requirements").

Real Iceberg tables are overwhelmingly partitioned by ``day(ts)`` or
``bucket(N, id)``, not identity — this module makes those tables readable
and writable: for each transform it provides

- ``transform_value(transform, ice_type, value)`` — the DRIVER-side pure
  function (manifest partition values, pruning probes, tests against the
  spec's published examples), and
- ``transform_column(transform, column, ice_type)`` — the SPARK-side twin
  producing the same values per row for staged writes.  Everything except
  ``bucket`` is pure codegen; bucket needs murmur3_x86_32 over the spec's
  single-value serialization (seed 0, little-endian longs), which Spark's
  built-in ``hash()`` is NOT (seed 42, internal-format input), so bucket
  goes through an Arrow-vectorized pandas UDF (numpy does the two-block
  murmur3 rounds; per-row Python only for strings).

Transform semantics (spec table):

- ``bucket[N]``  — ``(murmur3_x86_32(serialized) & Int.MAX) % N`` → int
- ``truncate[W]``— int/long: ``v - (((v % W) + W) % W)`` (floored, works
  for negatives); string: first W code points → source type
- ``year/month/day/hour`` — date/timestamp → whole units SINCE EPOCH
  (1970-01-01 00:00:00 UTC) as int; floored for pre-epoch values
- ``identity``  — unchanged
- ``void``      — always null

Serialization for bucket hashing (Appendix B): int/long/date/time/
timestamp(tz) widen to LONG and hash their 8-byte little-endian form
(dates as days, timestamps as MICROseconds from epoch); strings hash
their UTF-8 bytes.  The spec's worked examples are pinned in
tests/test_iceberg.py.
"""

from __future__ import annotations

import datetime as _dt
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


class IcebergTransformError(RuntimeError):
    """Unknown transform or transform/type combination."""


# --- murmur3_x86_32 (the spec's required hash; public algorithm) --------------

_C1, _C2, _M32 = 0xCC9E2D51, 0x1B873593, 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 over ``data``; returns the SIGNED 32-bit result
    (the form the spec's examples quote)."""
    h = seed & _M32
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _mmh3_long_numpy(vals):
    """Vectorized murmur3_x86_32 over the 8-byte little-endian form of
    int64 values — exactly two block rounds + empty tail, so the whole
    hash unrolls into numpy uint32 arithmetic (wrapping multiplies)."""
    import numpy as np

    v = vals.astype(np.uint64)
    h = np.zeros(len(v), dtype=np.uint32)
    for block in ((v & 0xFFFFFFFF), (v >> np.uint64(32))):
        k = block.astype(np.uint32)
        k = k * np.uint32(_C1)
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * np.uint32(_C2)
        h ^= k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(8)  # len(data)
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h  # unsigned uint32; callers mask with 0x7FFFFFFF anyway


# --- transform parsing --------------------------------------------------------

_SPEC_RE = re.compile(r"^(bucket|truncate)\[(\d+)\]$")
_CALL_RE = re.compile(
    r"^\s*(identity|void|year|month|day|hour|bucket|truncate)\s*\(\s*([^)]*)\)\s*$"
)

#: transform kinds that need no parameter
_PLAIN = ("identity", "void", "year", "month", "day", "hour")


def parse_transform(transform: str) -> tuple[str, int | None]:
    """Spec-JSON transform string → (kind, param).  ``identity`` /
    ``day`` / ``bucket[16]`` / ``truncate[4]`` forms."""
    if transform in _PLAIN:
        return transform, None
    m = _SPEC_RE.match(transform)
    if m:
        n = int(m.group(2))
        if n <= 0:
            raise IcebergTransformError(f"{m.group(1)} needs a positive width")
        return m.group(1), n
    raise IcebergTransformError(f"unsupported partition transform {transform!r}")


def parse_partition_field(spec_str: str) -> tuple[str, int | None, str]:
    """User-facing ``partition_by`` entry → (kind, param, source column).
    Accepts a bare column name (identity), ``day(ts)``, ``bucket(16, id)``,
    ``truncate(4, name)``."""
    m = _CALL_RE.match(spec_str)
    if not m:
        return "identity", None, spec_str.strip()
    kind, args = m.group(1), [a.strip() for a in m.group(2).split(",")]
    if kind in _PLAIN:
        if len(args) != 1 or not args[0]:
            raise IcebergTransformError(f"{kind}() takes one column: {spec_str!r}")
        return kind, None, args[0]
    if len(args) != 2:
        raise IcebergTransformError(
            f"{kind}() takes (width, column): {spec_str!r}"
        )
    return kind, int(args[0]), args[1]


def transform_spec_string(kind: str, param: int | None) -> str:
    return kind if param is None else f"{kind}[{param}]"


def field_name(kind: str, param: int | None, col: str) -> str:
    """Conventional spec-field name (what real writers generate)."""
    return col if kind == "identity" else f"{col}_{kind}"


def result_ice_type(kind: str, src_ice_type: str) -> str:
    """Iceberg type of the transform RESULT (the manifest partition-value
    carrier type)."""
    if kind == "identity":
        return src_ice_type
    if kind == "bucket":
        _require(src_ice_type, ("int", "long", "date", "timestamptz", "string"), kind)
        return "int"
    if kind == "truncate":
        _require(src_ice_type, ("int", "long", "string"), kind)
        return src_ice_type
    if kind in ("year", "month", "day"):
        _require(src_ice_type, ("date", "timestamptz"), kind)
        return "int"
    if kind == "hour":
        _require(src_ice_type, ("timestamptz",), kind)
        return "int"
    if kind == "void":
        return src_ice_type
    raise IcebergTransformError(f"unsupported transform {kind!r}")


def _require(src: str, allowed: tuple, kind: str) -> None:
    if src not in allowed:
        raise IcebergTransformError(f"{kind} transform on type {src!r}")


# --- driver-side values -------------------------------------------------------


def _as_epoch_long(ice_type: str, value) -> int:
    if ice_type in ("int", "long"):
        return int(value)
    if ice_type == "date":
        if isinstance(value, _dt.date):
            return (value - _EPOCH_DATE).days
        return int(value)  # already days-from-epoch
    if ice_type == "timestamptz":
        if isinstance(value, _dt.datetime):
            if value.tzinfo is None:
                value = value.replace(tzinfo=_dt.timezone.utc)
            delta = value - _EPOCH_TS
            return (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds
        return int(value)  # already micros-from-epoch
    raise IcebergTransformError(f"no long form for type {ice_type!r}")


def transform_value(transform: str, ice_type: str, value):
    """Apply a spec transform to one value driver-side (None → None).
    ``transform`` is the spec string (``day``, ``bucket[16]``, ...);
    dates/timestamps accept Python date/datetime (naive = UTC) or their
    already-widened long form."""
    kind, param = parse_transform(transform)
    if value is None or kind == "void":
        return None
    if kind == "identity":
        return value
    if kind == "bucket":
        if ice_type == "string":
            h = murmur3_32(str(value).encode("utf-8"))
        else:
            lv = _as_epoch_long(ice_type, value)
            h = murmur3_32((lv & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))
        return (h & 0x7FFFFFFF) % param
    if kind == "truncate":
        if ice_type == "string":
            return str(value)[:param]
        v = int(value)
        return v - (((v % param) + param) % param)
    # time transforms: whole units since epoch, floored
    if ice_type == "date":
        days = _as_epoch_long("date", value)
        d = _EPOCH_DATE + _dt.timedelta(days=days)
        if kind == "day":
            return days
        if kind == "month":
            return (d.year - 1970) * 12 + d.month - 1
        if kind == "year":
            return d.year - 1970
        raise IcebergTransformError("hour transform on date")
    micros = _as_epoch_long("timestamptz", value)
    if kind == "hour":
        return micros // 3_600_000_000
    if kind == "day":
        return micros // 86_400_000_000
    ts = _EPOCH_TS + _dt.timedelta(microseconds=micros)
    if kind == "month":
        return (ts.year - 1970) * 12 + ts.month - 1
    return ts.year - 1970  # year


# --- Spark-side columns -------------------------------------------------------


def _bucket_udf(n: int, ice_type: str):
    from pyspark.sql.functions import pandas_udf

    if ice_type == "string":

        @pandas_udf("int")
        def bucket(v: pd.Series) -> pd.Series:
            return v.map(
                lambda s: None
                if s is None
                else (murmur3_32(s.encode("utf-8")) & 0x7FFFFFFF) % n
            ).astype("Int32")

        return bucket

    # int/long/date/timestamptz all widen to LONG micros/days/value
    @pandas_udf("int")
    def bucket(v: pd.Series) -> pd.Series:
        mask = v.isna()
        arr = v.fillna(0).to_numpy(dtype="int64")
        h = _mmh3_long_numpy(arr)
        out = pd.Series((h & 0x7FFFFFFF) % n, dtype="Int64").astype("Int32")
        out[mask.to_numpy()] = None
        return out

    return bucket


def transform_column(transform: str, col: str, ice_type: str) -> Column:
    """Spark Column computing the SAME values as :func:`transform_value`
    per row — the staged-write twin.  Pure codegen except bucket (Arrow
    pandas UDF; write-path only).  Assumes the session timezone is UTC
    (the engine pins it), so timestamp epoch math is tz-stable."""
    kind, param = parse_transform(transform)
    c = F.col(col)
    if kind == "identity":
        return c
    if kind == "void":
        return F.lit(None).cast(ice_type if ice_type != "timestamptz" else "timestamp")
    if kind == "truncate":
        if ice_type == "string":
            return F.substring(c, 1, param)
        return (c - F.pmod(c, F.lit(param))).cast(ice_type.replace("long", "bigint"))
    if kind == "bucket":
        if ice_type == "date":
            widened = F.datediff(c, F.lit("1970-01-01").cast("date")).cast("long")
        elif ice_type == "timestamptz":
            # EXACT integer micros: the old double multiply rounded ~1.2%
            # of microsecond values off by one (wrong murmur3 → wrong
            # bucket, silently dropped by transform pruning; r16 advice)
            widened = F.unix_micros(c)
        elif ice_type in ("int", "long"):
            widened = c.cast("long")
        else:
            widened = c
        return _bucket_udf(param, "string" if ice_type == "string" else "long")(
            widened
        )
    # time transforms
    if ice_type == "date":
        if kind == "day":
            return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("int")
        if kind == "month":
            return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("int")
        if kind == "year":
            return (F.year(c) - 1970).cast("int")
        raise IcebergTransformError("hour transform on date")
    # floored integer division over EXACT micros (pmod is floored, so the
    # subtraction is divisible and the long→double quotient is exact)
    micros = F.unix_micros(c)
    if kind == "hour":
        unit = F.lit(3_600_000_000)
        return ((micros - F.pmod(micros, unit)) / unit).cast("int")
    if kind == "day":
        unit = F.lit(86_400_000_000)
        return ((micros - F.pmod(micros, unit)) / unit).cast("int")
    if kind == "month":
        return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("int")
    return (F.year(c) - 1970).cast("int")  # year
