"""Roaring bitmap + deletion-vector codec (sources/roaring.py): format
vectors from the public specs, round trips across container kinds, the
codec error contract."""

from __future__ import annotations

import random
import struct

import pytest

from gofeed_spark.sources import roaring as R


def test_z85_spec_vector():
    # the worked example from the ZeroMQ Z85 RFC
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert R.z85_encode(data) == "HelloWorld"
    assert R.z85_decode("HelloWorld") == data
    with pytest.raises(R.RoaringError):
        R.z85_encode(b"abc")  # not a multiple of 4
    with pytest.raises(R.RoaringError):
        R.z85_decode("~~~~~")  # bad alphabet


def test_bitmap32_round_trips_all_container_kinds():
    rnd = random.Random(7)
    cases = [
        set(),
        {0},
        {65535, 65536},                      # container boundary
        set(range(5000)),                    # bitmap container (card>4096)
        {rnd.randrange(1 << 32) for _ in range(10000)},  # many containers
        set(range(0, 1 << 20, 3)),
    ]
    for vals in cases:
        enc = R.encode_bitmap32(vals)
        dec, pos = R.decode_bitmap32(enc)
        assert dec == vals and pos == len(enc)


def test_bitmap32_decodes_run_containers():
    # hand-built RUN-cookie stream: {5,6,7,8,20} as two runs
    blob = struct.pack("<I", R.SERIAL_COOKIE_RUN | (0 << 16))
    blob += bytes([1])                   # run bitset: container 0 is a run
    blob += struct.pack("<HH", 0, 4)     # key 0, cardinality-1
    blob += struct.pack("<H", 2)         # numRuns
    blob += struct.pack("<HH", 5, 3) + struct.pack("<HH", 20, 0)
    vals, pos = R.decode_bitmap32(blob)
    assert vals == {5, 6, 7, 8, 20} and pos == len(blob)


def test_bitmap64_and_dv_framing():
    big = {0, 1, (1 << 32) + 5, (3 << 32) + 7, 1 << 40}
    assert R.decode_bitmap64(R.encode_bitmap64(big))[0] == big
    p1, p2 = R.dv_payload({1, 5, 9}), R.dv_payload(set(range(100_000)))
    blob, offs = R.dv_file_bytes([p1, p2])
    assert blob[0] == 1  # version byte
    assert R.dv_read_at(blob, offs[0]) == {1, 5, 9}
    assert R.dv_read_at(blob, offs[1], size_hint=len(p2)) == set(range(100_000))


def test_error_contract():
    p = R.dv_payload({1, 2})
    blob, offs = R.dv_file_bytes([p])
    bad = bytearray(blob)
    bad[offs[0] + 6] ^= 0xFF
    with pytest.raises(R.RoaringError):          # checksum
        R.dv_read_at(bytes(bad), offs[0])
    with pytest.raises(R.RoaringError):          # size-hint mismatch
        R.dv_read_at(blob, offs[0], size_hint=len(p) + 1)
    with pytest.raises(R.RoaringError):          # bad version byte
        R.dv_read_at(b"\x02" + blob[1:], offs[0])
    with pytest.raises(R.RoaringError):          # bad magic
        R.dv_decode_payload(b"\x00\x00\x00\x00")
    with pytest.raises(R.RoaringError):          # bad cookie
        R.decode_bitmap32(b"\x00\x00\x00\x00")
    with pytest.raises(R.RoaringError):          # truncated
        R.decode_bitmap32(R.encode_bitmap32({1, 2, 3})[:-2])
    with pytest.raises(R.RoaringError):          # out of range
        R.encode_bitmap32({-1})


def test_storage_type_u_round_trip():
    u = R.dv_pack_u("00112233-4455-6677-8899-aabbccddeeff", "ab^")
    assert R.dv_unpack_u(u) == ("ab^", "00112233-4455-6677-8899-aabbccddeeff")
    assert R.dv_file_name("x", "p1") == "p1/deletion_vector_x.bin"
    with pytest.raises(R.RoaringError):
        R.dv_unpack_u("short")
