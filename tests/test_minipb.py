"""Unit tests for the vendored minimal protobuf runtime
(gofeed_spark/vendor/minipb) — wire-format round-trips against the exact
generated module PySpark's typed-state protocol uses
(pyspark/sql/streaming/proto/StateMessage_pb2).  No Spark session needed;
the end-to-end proof is tests/test_streaming.py running gate_stream_tws.
"""

from __future__ import annotations

import pytest

from gofeed_spark.vendor import shim


@pytest.fixture(scope="module")
def sm():
    shim.ensure_protobuf()  # real protobuf or minipb — tests hold for both
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def _roundtrip(msg, cls):
    out = cls()
    out.ParseFromString(msg.SerializeToString())
    return out


def test_nested_request_roundtrip(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "head"
    cmd.schema = '{"type":"struct","fields":[]}'
    cmd.ttl.durationMs = 86_400_000
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    back = _roundtrip(req, sm.StateRequest)
    assert back.WhichOneof("method") == "statefulProcessorCall"
    got = back.statefulProcessorCall.getValueState
    assert got.stateName == "head"
    assert got.schema == cmd.schema
    assert got.ttl.durationMs == 86_400_000


def test_empty_message_sets_oneof_case(sm):
    # RemoveImplicitKey serializes to zero payload bytes but MUST still
    # set the oneof case on the wire (tag + len=0)
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    back = _roundtrip(req, sm.StateRequest)
    assert back.implicitGroupingKeyRequest.WhichOneof("method") == "removeImplicitKey"


def test_oneof_last_write_wins(sm):
    call = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand())
    call.deleteIfExists = sm.StateCallCommand()
    assert call.WhichOneof("method") == "deleteIfExists"
    back = _roundtrip(call, sm.StatefulProcessorCall)
    assert back.WhichOneof("method") == "deleteIfExists"


def test_negative_and_large_ints(sm):
    for v in (-1, -2**31, 2**31 - 1, -2**62, 2**62, 0):
        m = sm.StateResponseWithLongTypeVal(statusCode=-7, value=v)
        back = _roundtrip(m, sm.StateResponseWithLongTypeVal)
        assert back.value == v, v
        assert back.statusCode == -7


def test_repeated_bytes_and_bool(sm):
    m = sm.StateResponseWithListGet(
        statusCode=0, value=[b"", b"\x00\xff", b"abc"], requireNextFetch=True
    )
    back = _roundtrip(m, sm.StateResponseWithListGet)
    assert list(back.value) == [b"", b"\x00\xff", b"abc"]
    assert back.requireNextFetch is True
    # default bool round-trips to default
    m2 = sm.StateResponseWithListGet(statusCode=0)
    assert _roundtrip(m2, sm.StateResponseWithListGet).requireNextFetch is False


def test_repeated_message_kv_pairs(sm):
    pairs = [(b"k1", b"v1"), (b"k2", b""), (b"", b"v3")]
    m = sm.StateResponseWithMapIterator(
        kvPair=[sm.KeyAndValuePair(key=k, value=v) for k, v in pairs],
        requireNextFetch=False,
    )
    back = _roundtrip(m, sm.StateResponseWithMapIterator)
    assert [(x.key, x.value) for x in back.kvPair] == pairs


def test_enum_constants_and_handle_state(sm):
    # the api client references module-level enum value constants
    assert sm.PRE_INIT == 0
    assert sm.CLOSED == 5
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        )
    )
    back = _roundtrip(m, sm.StateRequest)
    assert back.statefulProcessorCall.setHandleState.state == sm.DATA_PROCESSED


def test_unknown_fields_skipped(sm):
    # bytes of a message with extra unknown fields parse cleanly: encode a
    # TimerInfo (key=1 bytes, timestampMs=2 int64) into KeyAndValuePair
    # (key=1 bytes, value=2 bytes): field 2 wire types differ -> craft by hand
    from gofeed_spark.vendor.minipb.google.protobuf import _wire

    payload = (
        _wire.encode_tag(1, 2) + b"\x02ab"  # key = b"ab"
        + _wire.encode_tag(99, 0) + _wire.encode_varint(7)  # unknown varint
        + _wire.encode_tag(98, 2) + b"\x03xyz"  # unknown length-delimited
    )
    m = sm.KeyAndValuePair()
    m.ParseFromString(payload)
    assert m.key == b"ab" and m.value == b""


def test_utils_request_parse_string_schema(sm):
    req = sm.StateRequest(
        utilsRequest=sm.UtilsRequest(
            parseStringSchema=sm.ParseStringSchema(schema="a int, b string")
        )
    )
    back = _roundtrip(req, sm.StateRequest)
    assert back.utilsRequest.parseStringSchema.schema == "a int, b string"
