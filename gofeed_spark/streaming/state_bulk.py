"""Bulk-load primitive for transformWithStateInPandas MapState.

``MapState.updateValue`` is one synchronous proto round-trip per key on
the state-server socket (~140 µs/key measured with the pure-Python
protobuf shim — BENCH_SCALE.md round 10), which makes loading a large
standing item map through ``handleInputRows`` the dominant cost of
starting a typed-state query against existing state (142 s for 1M keys).

``bulk_map_update`` removes the two per-key stalls without changing the
wire protocol:

- **Pipelining**: requests are written in windows of ``window`` messages
  per socket flush, and the ``window`` responses are drained afterwards —
  the JVM state server handles requests strictly in order and flushes
  each response, so responses can never outrun requests and the in-flight
  byte volume (window × ~70 B requests, window × ~6 B responses) stays
  far below the socket buffers.  This trades the per-key round-trip wait
  for one wait per window.
- **Lean serialization**: the stock client spends ~17 µs/key normalizing
  values and building ``Row`` objects before pickling; keys produced by a
  pandas ``tolist()`` fold are already plain Python scalars, so the bulk
  path pickles ``schema.toInternal(tuple)`` directly (~1 µs) — the
  identical wire bytes, verified per call on the first entry against the
  stock proto builder.

The proto frames are assembled from the generated descriptors (field
numbers read at import from ``StateMessage_pb2``), so a protocol revision
fails the first-entry byte-equality check loudly instead of corrupting
state — and on ANY setup failure the function falls back to the plain
per-key ``updateValue`` loop, which is always correct.
"""

from __future__ import annotations

from typing import Iterable


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field_number: int) -> bytes:
    # wire type 2 (length-delimited) — every field on this path is a
    # message, string, or bytes
    return _varint((field_number << 3) | 2)


def _ld(field_tag: bytes, payload: bytes) -> bytes:
    return field_tag + _varint(len(payload)) + payload


def _build_frame_factory(state_name: str):
    """Returns build(key_bytes, value_bytes) -> StateRequest wire bytes,
    with field numbers taken from the generated proto module (works for
    real protobuf and the vendored minipb shim alike)."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    t_userkey = _tag(sm.UpdateValue.DESCRIPTOR.fields_by_name["userKey"].number)
    t_value = _tag(sm.UpdateValue.DESCRIPTOR.fields_by_name["value"].number)
    t_statename = _tag(sm.MapStateCall.DESCRIPTOR.fields_by_name["stateName"].number)
    t_update = _tag(sm.MapStateCall.DESCRIPTOR.fields_by_name["updateValue"].number)
    t_mapcall = _tag(
        sm.StateVariableRequest.DESCRIPTOR.fields_by_name["mapStateCall"].number
    )
    t_svr = _tag(
        sm.StateRequest.DESCRIPTOR.fields_by_name["stateVariableRequest"].number
    )
    name_part = _ld(t_statename, state_name.encode("utf-8"))

    def build(key_bytes: bytes, value_bytes: bytes) -> bytes:
        # proto3 canonical form: empty scalar fields are OMITTED (pickled
        # rows are never empty, but the first-entry byte-equality check
        # demands exact parity with the stock builder)
        uv = b""
        if key_bytes:
            uv += _ld(t_userkey, key_bytes)
        if value_bytes:
            uv += _ld(t_value, value_bytes)
        msc = name_part + _ld(t_update, uv)
        return _ld(t_svr, _ld(t_mapcall, msc))

    def reference(key_bytes: bytes, value_bytes: bytes) -> bytes:
        # the stock builder — the correctness oracle for `build`
        uv = sm.UpdateValue(userKey=key_bytes, value=value_bytes)
        msc = sm.MapStateCall(stateName=state_name, updateValue=uv)
        svr = sm.StateVariableRequest(mapStateCall=msc)
        return sm.StateRequest(stateVariableRequest=svr).SerializeToString()

    return build, reference


def bulk_map_update(map_state, entries: Iterable[tuple[tuple, tuple]],
                    window: int = 256) -> int:
    """Write ``(key_tuple, value_tuple)`` entries into a TWS MapState,
    fully pipelined: the calling thread streams requests (flushing every
    ``window``) while a READER THREAD concurrently drains and validates
    responses — the writer never stalls on a round trip, and because the
    reader keeps the response stream empty the JVM never blocks on its
    send buffer, so there is no in-flight window to size against socket
    buffers.  Returns the number of entries written.  Falls back to the
    per-key ``updateValue`` loop if the client internals don't match
    (a pyspark upgrade) or the first frame fails the byte-equality
    self-check."""
    import threading

    try:
        client = map_state._mapStateClient
        api = client._stateful_processor_api_client
        key_schema, value_schema = client.user_key_schema, client.value_schema
        state_name = map_state._stateName
        sockfile = api.sockfile
        dumps = api.pickleSer.dumps
        key_internal = key_schema.toInternal
        value_internal = value_schema.toInternal
        build, reference = _build_frame_factory(state_name)
        from pyspark.serializers import read_int, write_int
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
    except (AttributeError, ImportError):
        return _fallback(map_state, entries)

    def drain(n: int, errors: list) -> None:
        try:
            for _ in range(n):
                length = read_int(sockfile)
                if length == 0:
                    continue  # all-defaults StateResponse = statusCode 0
                payload = sockfile.read(length)
                resp = sm.StateResponse()
                resp.ParseFromString(payload)
                if resp.statusCode != 0:
                    errors.append(
                        RuntimeError(
                            f"bulk_map_update: state server error "
                            f"{resp.statusCode}: {resp.errorMessage}"
                        )
                    )
                    return  # stop reading; writer aborts on next check
        except Exception as e:  # noqa: BLE001 - surfaced to the writer
            errors.append(e)

    # -- first entry: synchronous, with the byte-equality self-check -------
    it = iter(entries)
    try:
        first = next(it)
    except StopIteration:
        return 0
    kb = dumps(key_internal(first[0]))
    vb = dumps(value_internal(first[1]))
    frame = build(kb, vb)
    if frame != reference(kb, vb):
        # protocol drift: this entry + the rest through the stock path
        map_state.updateValue(first[0], first[1])
        return 1 + _fallback(map_state, it)
    write_int(0, sockfile)  # message version, mirrors the stock client
    write_int(len(frame), sockfile)
    sockfile.write(frame)
    sockfile.flush()
    errors: list = []
    drain(1, errors)
    if errors:
        raise errors[0]

    # -- the rest: writer streams, reader thread drains concurrently -------
    sent = 0
    done_writing = threading.Event()

    def reader() -> None:
        # drain exactly as many responses as were ultimately written;
        # `sent` only grows, and after done_writing is set it is final
        got = 0
        while True:
            target = sent
            while got < target:
                drain(1, errors)
                if errors:
                    return
                got += 1
            if done_writing.is_set() and got == sent:
                return
            done_writing.wait(0.001)  # writer ahead of us: brief idle

    t = threading.Thread(target=reader, name="bulk_map_drain", daemon=True)
    t.start()
    total = 1
    try:
        for key, value in it:
            if errors:
                break
            kb = dumps(key_internal(key))
            vb = dumps(value_internal(value))
            frame = build(kb, vb)
            write_int(0, sockfile)
            write_int(len(frame), sockfile)
            sockfile.write(frame)
            sent += 1
            total += 1
            if sent % window == 0:
                sockfile.flush()
        sockfile.flush()
    finally:
        done_writing.set()
        t.join(timeout=600)
    if errors:
        raise errors[0]
    if t.is_alive():
        raise RuntimeError("bulk_map_update: response drain timed out")
    return total


def _fallback(map_state, entries: Iterable[tuple[tuple, tuple]]) -> int:
    n = 0
    for key, value in entries:
        map_state.updateValue(key, value)
        n += 1
    return n
