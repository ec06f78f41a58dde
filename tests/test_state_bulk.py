"""Unit tests for the TWS MapState bulk-load primitive: the hand-rolled
proto frames must be byte-identical to the stock builder's (the runtime
self-check depends on it), and the fallback path must engage when the
client internals don't match."""

from __future__ import annotations

from gofeed_spark.streaming.state_bulk import (
    _build_frame_factory,
    _fallback,
    _varint,
    bulk_map_update,
)


def test_varint_encoding():
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(127) == b"\x7f"
    assert _varint(128) == b"\x80\x01"
    assert _varint(300) == b"\xac\x02"


def test_frame_builder_matches_stock_proto():
    from gofeed_spark.vendor import shim

    shim.ensure_protobuf()
    build, reference = _build_frame_factory("items")
    for kb, vb in [
        (b"", b""),
        (b"k", b"v"),
        (b"x" * 127, b"y" * 128),
        (b"\x00\xff" * 200, b"z" * 5000),
    ]:
        assert build(kb, vb) == reference(kb, vb)


class _FakeMapState:
    """Quacks like MapState for the fallback path only: no
    _mapStateClient attribute, so bulk_map_update must degrade to the
    per-key updateValue loop."""

    def __init__(self):
        self.calls = []

    def updateValue(self, key, value):
        self.calls.append((key, value))


def test_bulk_map_update_falls_back_without_client_internals():
    ms = _FakeMapState()
    entries = [(("a",), (1, 2)), (("b",), (3, 4))]
    assert bulk_map_update(ms, iter(entries)) == 2
    assert ms.calls == entries


def test_fallback_counts():
    ms = _FakeMapState()
    assert _fallback(ms, iter([(("k",), (0,))])) == 1
    assert ms.calls == [(("k",), (0,))]
