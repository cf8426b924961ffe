"""The pure-Python protobuf runtime subset (compat/purepb) — wire
format pinned against PUBLIC protobuf documentation vectors, the
FileDescriptorProto bootstrap parser, presence semantics, and the
generated StateMessage_pb2 surface the TWS state client uses. The
LIVE foreign validation is tests/test_streaming.py::
test_transform_with_state_live_via_shim — the JVM's Java protobuf
parses every byte the shim writes.
"""

from __future__ import annotations

import pytest

from real_time_big_data_analytics_spark.compat import enable_protobuf_shim

if not enable_protobuf_shim():  # pragma: no cover
    pytest.skip("protobuf shim could not activate", allow_module_level=True)

from google.protobuf import _shim_core as core  # noqa: E402


def test_varint_documented_vectors():
    """The protobuf docs' own examples: 1 -> 01, 150 -> 9601;
    negative int32/int64 use the 10-byte two's complement."""
    buf = bytearray()
    core._enc_varint(buf, 1)
    assert bytes(buf) == b"\x01"
    buf = bytearray()
    core._enc_varint(buf, 150)
    assert bytes(buf) == b"\x96\x01"
    buf = bytearray()
    core._enc_field_varint(buf, -1, core.T_INT64)
    assert bytes(buf) == b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    raw, pos = core._dec_varint(bytes(buf), 0)
    assert core._dec_field_varint(raw, core.T_INT64) == -1
    assert core._dec_field_varint(raw, core.T_INT32) == -1
    # zigzag (sint): 0->0, -1->1, 1->2, -2->3
    for v, zz in ((0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)):
        buf = bytearray()
        core._enc_field_varint(buf, v, core.T_SINT64)
        raw, _ = core._dec_varint(bytes(buf), 0)
        assert raw == zz
        assert core._dec_field_varint(raw, core.T_SINT64) == v


def test_message_wire_matches_documented_example():
    """docs 'Test1' example: field 1 (int32) = 150 -> 08 96 01; and a
    length-delimited string field 2 = 'testing' -> 12 07 74..67."""
    fd = {
        "name": "t.proto", "package": "", "enums": [],
        "messages": [
            {"name": "Test1", "oneofs": [], "enums": [], "nested": [],
             "fields": [
                 {"name": "a", "number": 1, "label": 1, "type": core.T_INT32,
                  "type_name": "", "oneof_index": None, "proto3_optional": False},
                 {"name": "b", "number": 2, "label": 1, "type": core.T_STRING,
                  "type_name": "", "oneof_index": None, "proto3_optional": False},
             ]},
        ],
    }
    g = {}
    core.build_messages(core.FileDescriptorShim(fd, b""), g)
    m = g["Test1"](a=150, b="testing")
    assert m.SerializeToString() == b"\x08\x96\x01\x12\x07testing"
    r = g["Test1"]()
    r.ParseFromString(b"\x08\x96\x01\x12\x07testing")
    assert r.a == 150 and r.b == "testing"
    # proto3 implicit presence: defaults serialize to NOTHING
    assert g["Test1"](a=0, b="").SerializeToString() == b""
    # packed repeated varints decode (wire type 2)
    fd["messages"][0]["fields"][0]["label"] = core.LABEL_REPEATED
    g2 = {}
    core.build_messages(core.FileDescriptorShim(fd, b""), g2)
    r = g2["Test1"]()
    r.ParseFromString(b"\x0a\x03\x01\x96\x01")  # packed [1, 150]
    assert list(r.a) == [1, 150]
    r2 = g2["Test1"]()
    r2.ParseFromString(g2["Test1"](a=[1, 150]).SerializeToString())
    assert list(r2.a) == [1, 150]


def test_state_message_pb2_loads_and_roundtrips():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    m = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(
                stateName="agg", valueStateUpdate=sm.ValueStateUpdate(value=b"\x00\x01")
            )
        )
    )
    r = sm.StateRequest()
    r.ParseFromString(m.SerializeToString())
    call = r.stateVariableRequest.valueStateCall
    assert call.stateName == "agg"
    assert call.HasField("valueStateUpdate")
    assert call.valueStateUpdate.value == b"\x00\x01"
    assert not call.HasField("exists")
    # oneof members serialize even at default values (explicit presence)
    empty_exists = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    r2 = sm.ValueStateCall()
    r2.ParseFromString(empty_exists.SerializeToString())
    assert r2.HasField("exists")
    # response shape the client reads
    resp = sm.StateResponse(statusCode=3, errorMessage="boom", value=b"v")
    r3 = sm.StateResponse()
    r3.ParseFromString(resp.SerializeToString())
    assert (r3.statusCode, r3.errorMessage, r3.value) == (3, "boom", b"v")
    # enum constants injected at module scope + wrapper lookups
    assert sm.TIMER_PROCESSED == 4
    assert sm.HandleState.Name(sm.CREATED) == "CREATED"
    assert sm.HandleState.Value("CREATED") == sm.CREATED


def test_unknown_kwarg_and_unknown_wire_fields():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    with pytest.raises(ValueError, match="no .*nope.* field"):
        sm.StateResponse(nope=1)
    # unknown field numbers on the wire are skipped, not fatal
    r = sm.StateResponse()
    r.ParseFromString(b"\xf8\x7f\x01" + sm.StateResponse(statusCode=7).SerializeToString())
    assert r.statusCode == 7


def test_shim_never_shadows_real_protobuf(monkeypatch):
    """enable_protobuf_shim returns True without touching sys.path
    when google.protobuf already imports (here: the active shim
    itself plays that role — the path must not be double-inserted)."""
    import sys

    from real_time_big_data_analytics_spark.compat import PUREPB_DIR

    n_before = sys.path.count(PUREPB_DIR)
    assert enable_protobuf_shim()
    assert sys.path.count(PUREPB_DIR) == n_before
