"""Unit tests for the vendored minimal protobuf runtime
(vendor/google/protobuf): wire-format round-trips, proto3 emission
rules, presence/oneof semantics, and the generated-module contract —
all against PySpark's real generated StateMessage_pb2, so the
descriptor decoding path is exercised on production gencode.  The
end-to-end cross-validation against protobuf-java lives in
tests/test_streaming.py::test_tws_running_totals_converges_to_batch_q04
(the JVM parses every request this runtime serializes)."""

from __future__ import annotations

import pytest

from multi_threaded_mapreduce_framework_spark.streaming.protoshim import (
    ensure_protobuf,
)

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")

from google.protobuf.internal import pshim  # noqa: E402


# ------------------------------------------------------------- varints
def test_varint_roundtrip_including_negatives():
    for v in (0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1, -1, -5, -(2**63)):
        buf = pshim.encode_varint(v)
        got, pos = pshim.decode_varint(buf, 0)
        assert pos == len(buf)
        assert pshim._to_signed(got) == v
    # canonical known encodings from the public spec
    assert pshim.encode_varint(1) == b"\x01"
    assert pshim.encode_varint(300) == b"\xac\x02"
    assert pshim.encode_varint(-1) == b"\xff" * 9 + b"\x01"  # 10 bytes


def test_zigzag():
    for raw, enc in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4)]:
        assert pshim._zigzag_encode(raw) == enc
        assert pshim._zigzag_decode(enc) == raw


# -------------------------------------------- descriptor decode sanity
def test_descriptor_decoded_from_real_gencode():
    d = sm.StateRequest.DESCRIPTOR
    assert d.name == "StateRequest"
    byname = d.fields_by_name
    assert byname["version"].number == 1
    assert byname["statefulProcessorCall"].type == pshim.TYPE_MESSAGE
    # the 'method' oneof holds every request variant
    assert "method" in d.oneofs
    members = d.real_oneof_members[d.oneofs.index("method")]
    assert byname["statefulProcessorCall"].number in members
    assert byname["timerRequest"].number in members
    # enum with proto3 C++-scoping module constants
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Value("INITIALIZED") == sm.INITIALIZED
    assert sm.HandleState.Name(sm.DATA_PROCESSED) == "DATA_PROCESSED"
    # TimerInfo.key is proto3-optional: synthetic oneof, not a real one
    ti = sm.TimerInfo.DESCRIPTOR
    assert ti.fields_by_name["key"].proto3_optional
    assert all(
        ti.fields_by_name["key"].number not in m
        for m in ti.real_oneof_members.values()
    )


# ----------------------------------------------------- emission rules
def test_proto3_scalar_default_not_emitted():
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    # non-default scalars emit tag+varint
    assert sm.SetHandleState(state=sm.CREATED).SerializeToString() == b"\x08\x01"


def test_empty_submessage_in_oneof_is_emitted():
    """ListStateCall(exists=Exists()) must wire a zero-length field —
    presence is the whole signal the JVM dispatches on."""
    msg = sm.ListStateCall(stateName="s", exists=sm.Exists())
    data = msg.SerializeToString()
    # field 1 'stateName' = "s", field 2 'exists' = empty message
    assert data == b"\x0a\x01s\x12\x00"
    back = sm.ListStateCall()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "exists"


def test_autovivified_submessage_write_through_presence():
    cmd = sm.StateCallCommand()
    cmd.stateName = "totals"
    # before any write, ttl is absent
    assert not cmd.HasField("ttl")
    cmd.ttl.durationMs = 5000
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 5000 and back.stateName == "totals"
    # reading alone must NOT create presence
    probe = sm.StateCallCommand()
    _ = probe.ttl.durationMs
    assert not probe.HasField("ttl")
    assert probe.SerializeToString() == b""


def test_oneof_assignment_clears_siblings():
    call = sm.StatefulProcessorCall(setHandleState=sm.SetHandleState())
    assert call.WhichOneof("method") == "setHandleState"
    call.getValueState.stateName = "v"  # write-through switches the oneof
    assert call.WhichOneof("method") == "getValueState"
    back = sm.StatefulProcessorCall()
    back.ParseFromString(call.SerializeToString())
    assert back.WhichOneof("method") == "getValueState"
    assert back.getValueState.stateName == "v"


def test_repeated_bytes_and_bool_roundtrip():
    src = sm.StateResponseWithListGet(
        statusCode=7, value=[b"a", b"", b"xyz"], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(src.SerializeToString())
    assert list(back.value) == [b"a", b"", b"xyz"]
    assert back.requireNextFetch is True
    assert back.statusCode == 7
    assert back.errorMessage == ""


def test_repeated_message_add_and_parse():
    src = sm.StateResponseWithMapIterator()
    src.kvPair.add(key=b"k1", value=b"v1")
    src.kvPair.add(key=b"k2", value=b"v2")
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(src.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_negative_int64_roundtrip():
    src = sm.RegisterTimer(expiryTimestampMs=-123456789)
    back = sm.RegisterTimer()
    back.ParseFromString(src.SerializeToString())
    assert back.expiryTimestampMs == -123456789


def test_proto3_optional_bytes_presence():
    t = sm.TimerInfo(timestampMs=9)
    assert not t.HasField("key")
    back = sm.TimerInfo()
    back.ParseFromString(t.SerializeToString())
    assert not back.HasField("key") and back.timestampMs == 9
    t2 = sm.TimerInfo(key=b"", timestampMs=9)  # EXPLICIT empty key
    back2 = sm.TimerInfo()
    back2.ParseFromString(t2.SerializeToString())
    assert back2.HasField("key") and back2.key == b""


def test_unknown_fields_skipped():
    """Forward compatibility: bytes holding a field this descriptor
    lacks parse cleanly (skipped by wire type)."""
    # StateResponse has fields 1..3; append field 99 varint + field 98 len
    extra = (
        sm.StateResponse(statusCode=1).SerializeToString()
        + pshim.encode_varint(99 << 3 | 0)
        + pshim.encode_varint(7)
        + pshim.encode_varint(98 << 3 | 2)
        + pshim.encode_varint(3)
        + b"abc"
    )
    msg = sm.StateResponse()
    msg.ParseFromString(extra)
    assert msg.statusCode == 1


def test_nested_request_matches_handwritten_wire_bytes():
    """The exact SetHandleState(INITIALIZED) request the API client
    sends at init, byte-for-byte against the public spec."""
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    # field 2 LEN(4) { field 1 LEN(2) { field 1 varint 2 } }
    assert m.SerializeToString() == bytes.fromhex("12040a020802")


def test_real_protobuf_wins_when_available():
    """ensure_protobuf reports the shim only when no real protobuf is
    importable; with the vendor path active, repeated calls are
    idempotent."""
    assert ensure_protobuf() in (True, False)
    import os

    from multi_threaded_mapreduce_framework_spark.streaming.protoshim import VENDOR_DIR

    if ensure_protobuf():
        assert VENDOR_DIR in os.environ.get("PYTHONPATH", "")


# ---------------------------------------------------------- fuzzing
def test_fuzz_roundtrip_random_messages():
    """Property fuzz: random field assignments over the real generated
    message types must round-trip bit-exactly through the vendored wire
    format (serialize -> parse -> serialize is a fixpoint, values
    preserved)."""
    from hypothesis import given, settings, strategies as st

    scalar_msgs = {
        "StateResponse": {
            "statusCode": st.integers(-(2**31), 2**31 - 1),
            "errorMessage": st.text(max_size=40),
            "value": st.binary(max_size=64),
        },
        "StateResponseWithLongTypeVal": {
            "statusCode": st.integers(-(2**31), 2**31 - 1),
            "errorMessage": st.text(max_size=40),
            "value": st.integers(-(2**63), 2**63 - 1),
        },
        "ExpiryTimerRequest": {
            "iteratorId": st.text(max_size=40),
            "expiryTimestampMs": st.integers(-(2**63), 2**63 - 1),
        },
        "StateCallCommand": {
            "stateName": st.text(max_size=40),
            "schema": st.text(max_size=40),
            "mapStateValueSchema": st.text(max_size=40),
        },
    }

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def run(data):
        name = data.draw(st.sampled_from(sorted(scalar_msgs)))
        cls = getattr(sm, name)
        kwargs = {
            f: data.draw(strat, label=f) for f, strat in scalar_msgs[name].items()
        }
        msg = cls(**kwargs)
        wire = msg.SerializeToString()
        back = cls()
        back.ParseFromString(wire)
        for f, v in kwargs.items():
            assert getattr(back, f) == v, (name, f)
        assert back.SerializeToString() == wire  # serialize is a fixpoint

    run()


def test_fuzz_repeated_bytes_roundtrip():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.binary(max_size=32), max_size=16), st.booleans())
    def run(values, fetch):
        src = sm.StateResponseWithListGet(value=values, requireNextFetch=fetch)
        back = sm.StateResponseWithListGet()
        back.ParseFromString(src.SerializeToString())
        assert list(back.value) == values
        assert back.requireNextFetch == fetch

    run()


def test_fuzz_varint_roundtrip_u64():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(-(2**63), 2**64 - 1))
    def run(v):
        buf = pshim.encode_varint(v)
        got, pos = pshim.decode_varint(buf, 0)
        assert pos == len(buf)
        assert got == v & (2**64 - 1)

    run()
