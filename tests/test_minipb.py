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


def test_oneof_read_is_side_effect_free(sm):
    # reading one oneof member while a sibling is set must not clear the
    # sibling or flip WhichOneof (upstream reads are side-effect-free)
    call = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand(stateName="v"))
    _ = call.deleteIfExists.stateName  # pure read of an unset sibling
    assert call.WhichOneof("method") == "getValueState"
    assert call.getValueState.stateName == "v"
    assert not call.HasField("deleteIfExists")
    back = _roundtrip(call, sm.StatefulProcessorCall)
    assert back.WhichOneof("method") == "getValueState"
    # first MUTATION through the vivified member installs it (and only then
    # clears the sibling) — including down a chained vivify
    call.deleteIfExists.stateName = "d"
    assert call.WhichOneof("method") == "deleteIfExists"
    req = sm.StateRequest()
    req.statefulProcessorCall.getValueState.stateName = "chained"
    assert req.WhichOneof("method") == "statefulProcessorCall"
    assert (
        _roundtrip(req, sm.StateRequest).statefulProcessorCall.getValueState.stateName
        == "chained"
    )


def test_repeated_vivify_append_installs_chain(sm):
    # appending to a repeated field of a READ-vivified sub-message must
    # install the whole chain into the parent (upstream's repeated
    # containers mark presence on first mutation) — the vivify-append
    # idiom, the repeated twin of test_oneof_read_is_side_effect_free
    req = sm.StateRequest()
    req.stateVariableRequest.listStateCall.listStatePut.value.append(b"x1")
    req.stateVariableRequest.listStateCall.listStatePut.value.extend([b"x2"])
    assert req.WhichOneof("method") == "stateVariableRequest"
    back = _roundtrip(req, sm.StateRequest)
    assert list(back.stateVariableRequest.listStateCall.listStatePut.value) == [
        b"x1",
        b"x2",
    ]
    # a PURE read of a repeated leaf stays side-effect-free: nothing
    # installs, nothing serializes
    req2 = sm.StateRequest()
    _ = list(req2.stateVariableRequest.listStateCall.listStatePut.value)
    assert req2.WhichOneof("method") is None
    assert req2.SerializeToString() == b""


def test_message_with_repeated_field_pickles(sm):
    # pickling a message holding a repeated field must round-trip: list
    # subclasses restore under protocol 2 by appending items BEFORE
    # __init__/state runs, so the container's mutation hook cannot assume
    # its owner slot is already bound (ADVICE r11 — previously raised
    # AttributeError on loads)
    import pickle

    req = sm.StateRequest()
    req.stateVariableRequest.listStateCall.listStatePut.value.append(b"x1")
    req.stateVariableRequest.listStateCall.listStatePut.value.append(b"x2")
    back = pickle.loads(pickle.dumps(req))
    assert list(back.stateVariableRequest.listStateCall.listStatePut.value) == [
        b"x1",
        b"x2",
    ]
    assert back.SerializeToString() == req.SerializeToString()
    # the restored container still installs presence on mutation
    back.stateVariableRequest.listStateCall.listStatePut.value.append(b"x3")
    assert len(_roundtrip(back, sm.StateRequest)
               .stateVariableRequest.listStateCall.listStatePut.value) == 3


def test_truncated_length_delimited_raises(sm):
    from google.protobuf.message import DecodeError

    good = sm.StateCallCommand(stateName="abcdefgh").SerializeToString()
    with pytest.raises(DecodeError):
        sm.StateCallCommand().ParseFromString(good[:-3])  # torn string field
    nested = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(stateName="abcdefgh")
        )
    ).SerializeToString()
    with pytest.raises(DecodeError):
        sm.StateRequest().ParseFromString(nested[:-3])  # torn sub-message


def test_vendored_google_is_namespace_portion(tmp_path):
    # minipb's google/ must coexist with OTHER google.* namespace portions
    # (google.cloud etc.): a regular package would win `import google` and
    # hide every other portion.  Simulate in a subprocess.
    import os
    import subprocess
    import sys

    other = tmp_path / "other" / "google" / "cloudish"
    other.mkdir(parents=True)
    (other / "__init__.py").write_text("MARKER = 'cloudish-ok'\n")
    minipb_dir = os.path.join(
        os.path.dirname(os.path.abspath(shim.__file__)), "minipb"
    )
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(tmp_path / 'other')!r})\n"
        f"sys.path.insert(0, {minipb_dir!r})\n"
        "from google.protobuf import descriptor\n"
        "from google.cloudish import MARKER\n"
        "print(MARKER)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60
    )
    assert out.returncode == 0, out.stderr
    assert "cloudish-ok" in out.stdout


@pytest.mark.skipif(
    not shim._real_protobuf_importable(),
    reason="native protobuf not installed (minipb goldens cover the wire format)",
)
def test_minipb_native_parity(sm, tmp_path):
    # when the REAL protobuf runtime is available, the vendored runtime
    # must produce byte-identical encodings for the state protocol's
    # message shapes.  Native leg runs here; minipb leg in a subprocess
    # with sys.path preferring the vendored runtime.
    import os
    import subprocess
    import sys

    minipb_dir = os.path.join(
        os.path.dirname(os.path.abspath(shim.__file__)), "minipb"
    )
    builder = (
        "import pyspark.sql.streaming.proto.StateMessage_pb2 as sm\n"
        "msgs = [\n"
        "  sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall(\n"
        "      getValueState=sm.StateCallCommand(stateName='head',\n"
        "          schema='gate int, status int'))),\n"
        "  sm.StateRequest(implicitGroupingKeyRequest=\n"
        "      sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())),\n"
        "  sm.StateResponseWithLongTypeVal(statusCode=-7, value=-2**62),\n"
        "  sm.StateResponseWithMapIterator(\n"
        "      kvPair=[sm.KeyAndValuePair(key=b'k', value=b'\\x00v')],\n"
        "      requireNextFetch=True),\n"
        "  sm.StateRequest(utilsRequest=sm.UtilsRequest(\n"
        "      parseStringSchema=sm.ParseStringSchema(schema='a int'))),\n"
        "]\n"
        "print('\\n'.join(m.SerializeToString().hex() for m in msgs))\n"
    )
    native = subprocess.run(
        [sys.executable, "-c", builder], capture_output=True, text=True, timeout=120
    )
    assert native.returncode == 0, native.stderr
    vendored = subprocess.run(
        [sys.executable, "-c", f"import sys\nsys.path.insert(0, {minipb_dir!r})\n" + builder],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "PYTHONNOUSERSITE": "1"},
    )
    assert vendored.returncode == 0, vendored.stderr
    assert native.stdout.strip().splitlines() == vendored.stdout.strip().splitlines()


def test_stale_pending_handle_cannot_clobber_parsed_state(sm):
    """A read-vivified sub-message handle taken BEFORE ParseFromString or
    Clear is detached by them: mutating it later must not install stale
    state over the new contents (upstream protobuf disconnects such
    handles the same way)."""
    req = sm.StateRequest()
    stale = req.statefulProcessorCall  # pure read → pending handle
    fresh = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    ).SerializeToString()
    req.ParseFromString(fresh)
    stale.getValueState.stateName = "x"  # mutation through the stale handle
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert not req.HasField("statefulProcessorCall")
    # Clear() detaches too
    req2 = sm.StateRequest()
    stale2 = req2.utilsRequest
    req2.Clear()
    stale2.parseStringSchema.schema = "a int"
    assert req2.WhichOneof("method") is None
