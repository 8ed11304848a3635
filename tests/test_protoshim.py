"""Unit tests for the vendored minimal protobuf runtime
(``vendor/protoshim``) — golden wire bytes computed BY HAND from the
public encoding spec (https://protobuf.dev/programming-guides/encoding/),
so a shim bug cannot hide behind shim-vs-shim roundtripping. The
integration conformance test is the transformWithState replay itself
(the JVM state server parses these bytes with real protobuf-java)."""

import pytest

from web_analytics_visits_re_processing_spark.vendor.protoshim_loader import (
    SHIM_ROOT,
    ensure_driver_protobuf,
    protoshim_zip,
)

ensure_driver_protobuf()

from google.protobuf import _mini  # noqa: E402


def _field(name, number, ftype, label=_mini.LABEL_OPTIONAL, oneof=None):
    return {
        "name": name,
        "number": number,
        "label": label,
        "type": ftype,
        "type_name": "",
        "oneof_index": oneof,
        "proto3_optional": False,
    }


def _make(name, fields, oneofs=(), registry=None):
    registry = registry if registry is not None else {}
    fds = [
        _mini.FieldDescriptor(
            f["name"],
            f["number"],
            f["label"],
            f["type"],
            f["type_name"],
            f["oneof_index"],
            f["proto3_optional"],
        )
        for f in fields
    ]
    oos = [_mini.OneofDescriptor(n, i) for i, n in enumerate(oneofs)]
    desc = _mini.Descriptor(name, name, fds, [], [], oos)
    registry[name] = desc
    return _mini.make_message_class(desc, "test")


# --- varint primitives -------------------------------------------------------


def test_varint_golden():
    # spec examples: 1 -> 01, 150 -> 96 01, 300 -> AC 02
    assert _mini.enc_varint(1) == b"\x01"
    assert _mini.enc_varint(150) == b"\x96\x01"
    assert _mini.enc_varint(300) == b"\xac\x02"
    assert _mini.dec_varint(b"\x96\x01", 0) == (150, 2)


def test_negative_int_ten_bytes():
    # int32/int64 negatives: 64-bit two's complement, always 10 bytes
    enc = _mini.enc_signed_varint(-2)
    assert enc == b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    v, _ = _mini.dec_varint(enc, 0)
    assert _mini._to_signed64(v) == -2


def test_zigzag_golden():
    # spec: 0->0, -1->1, 1->2, -2->3
    assert _mini.enc_zigzag(0, 32) == b"\x00"
    assert _mini.enc_zigzag(-1, 32) == b"\x01"
    assert _mini.enc_zigzag(1, 32) == b"\x02"
    assert _mini.enc_zigzag(-2, 32) == b"\x03"
    assert _mini._from_zigzag(3) == -2


# --- message wire format ------------------------------------------------------


def test_scalar_message_golden_bytes():
    # Test1 { int32 a = 1; } with a=150 -> 08 96 01 (the spec's own example)
    Test1 = _make("Test1", [_field("a", 1, _mini.TYPE_INT32)])
    assert Test1(a=150).SerializeToString() == b"\x08\x96\x01"
    m = Test1()
    m.ParseFromString(b"\x08\x96\x01")
    assert m.a == 150


def test_string_golden_bytes():
    # Test2 { string b = 2; } with b="testing" -> 12 07 "testing"
    Test2 = _make("Test2", [_field("b", 2, _mini.TYPE_STRING)])
    assert Test2(b="testing").SerializeToString() == b"\x12\x07testing"


def test_proto3_default_not_serialized():
    M = _make(
        "M",
        [
            _field("i", 1, _mini.TYPE_INT32),
            _field("s", 2, _mini.TYPE_STRING),
            _field("by", 3, _mini.TYPE_BYTES),
            _field("bo", 4, _mini.TYPE_BOOL),
        ],
    )
    assert M(i=0, s="", by=b"", bo=False).SerializeToString() == b""
    assert M(bo=True).SerializeToString() == b"\x20\x01"


def test_oneof_empty_message_presence():
    # an empty message in a oneof must still serialize (tag + len 0)
    reg = {}
    _make("Empty", [], registry=reg)
    cls_fields = [_field("e", 3, _mini.TYPE_MESSAGE, oneof=0)]
    cls_fields[0]["type_name"] = ".Empty"
    Holder = _make("Holder", cls_fields, oneofs=("method",), registry=reg)
    # resolve the reference by hand (build_file_descriptor does this for files)
    Holder.DESCRIPTOR.fields[0].message_type = reg["Empty"]
    wire = Holder(e=reg["Empty"]._concrete_class()).SerializeToString()
    assert wire == b"\x1a\x00"
    back = Holder()
    back.ParseFromString(wire)
    assert back.WhichOneof("method") == "e"


def test_oneof_set_clears_sibling():
    M = _make(
        "OO",
        [
            _field("x", 1, _mini.TYPE_INT32, oneof=0),
            _field("y", 2, _mini.TYPE_STRING, oneof=0),
        ],
        oneofs=("which",),
    )
    m = M(x=5)
    assert m.WhichOneof("which") == "x"
    m.y = "hi"
    assert m.WhichOneof("which") == "y"
    # oneof scalar at default value still serializes (explicit presence)
    assert M(x=0).SerializeToString() == b"\x08\x00"


def test_repeated_bytes_unpacked_and_bool():
    M = _make(
        "R",
        [
            _field("v", 3, _mini.TYPE_BYTES, label=_mini.LABEL_REPEATED),
            _field("f", 4, _mini.TYPE_BOOL),
        ],
    )
    wire = M(v=[b"a", b"bb"], f=True).SerializeToString()
    assert wire == b"\x1a\x01a\x1a\x02bb\x20\x01"
    m = M()
    m.ParseFromString(wire)
    assert m.v == [b"a", b"bb"] and m.f is True


def test_repeated_int_packed_roundtrip_and_unpacked_parse():
    M = _make("P", [_field("xs", 1, _mini.TYPE_INT64, label=_mini.LABEL_REPEATED)])
    wire = M(xs=[1, 150, -1]).SerializeToString()
    # packed: tag 0A, len, payload 01 9601 + 10-byte -1
    assert wire[:1] == b"\x0a"
    back = M()
    back.ParseFromString(wire)
    assert back.xs == [1, 150, -1]
    # unpacked form of the same field must also parse
    unpacked = b"\x08\x01\x08\x96\x01"
    back2 = M()
    back2.ParseFromString(unpacked)
    assert back2.xs == [1, 150]


def test_unknown_fields_skipped():
    M = _make("U", [_field("a", 1, _mini.TYPE_INT32)])
    # field 9 varint, field 8 length-delimited, field 7 fixed64, field 6 fixed32
    extra = b"\x48\x05" + b"\x42\x02hi" + b"\x39" + b"\x00" * 8 + b"\x35" + b"\x00" * 4
    m = M()
    m.ParseFromString(b"\x08\x07" + extra)
    assert m.a == 7


def test_truncated_input_raises():
    M = _make("T", [_field("a", 1, _mini.TYPE_STRING)])
    with pytest.raises(_mini.DecodeError):
        M().ParseFromString(b"\x0a\x05ab")  # declares 5 bytes, has 2


# --- the real generated module ------------------------------------------------


def test_statemessage_pb2_builds_and_roundtrips():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    # enum constants at module scope (the exact names the client uses)
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED, sm.DATA_PROCESSED) == (0, 1, 2, 3)
    assert sm.HandleState.Name(5) == "CLOSED"

    # the exact nesting the value-state client builds
    req = sm.StateRequest(
        version=2,
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(
                stateName="agg",
                valueStateUpdate=sm.ValueStateUpdate(value=b"\x00\x01\x02"),
            )
        ),
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.version == 2
    assert back.WhichOneof("method") == "stateVariableRequest"
    assert back.stateVariableRequest.valueStateCall.stateName == "agg"
    assert back.stateVariableRequest.valueStateCall.valueStateUpdate.value == b"\x00\x01\x02"

    # response-side: repeated message with a proto3_optional member
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[sm.TimerInfo(key=b"k", timestampMs=12), sm.TimerInfo(timestampMs=-1)],
        requireNextFetch=True,
    )
    got = sm.StateResponseWithTimer()
    got.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in got.timer] == [(b"k", 12), (b"", -1)]
    assert got.requireNextFetch is True


def test_filedescriptor_registry_complete():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    # every message class the pyspark state clients reference exists
    for name in [
        "StateRequest",
        "StateResponse",
        "StateResponseWithLongTypeVal",
        "StateResponseWithStringTypeVal",
        "StateResponseWithListGet",
        "StateResponseWithMapKeysOrValues",
        "StateResponseWithMapIterator",
        "StateResponseWithTimer",
        "KeyAndValuePair",
        "TimerInfo",
        "StatefulProcessorCall",
        "StateVariableRequest",
        "ImplicitGroupingKeyRequest",
        "TimerRequest",
        "UtilsRequest",
        "ParseStringSchema",
        "StateCallCommand",
        "TimerStateCallCommand",
        "ValueStateCall",
        "ListStateCall",
        "MapStateCall",
        "SetImplicitKey",
        "RemoveImplicitKey",
        "Exists",
        "Get",
        "RegisterTimer",
        "DeleteTimer",
        "ListTimers",
        "ValueStateUpdate",
        "Clear",
        "ListStateGet",
        "ListStatePut",
        "AppendValue",
        "AppendList",
        "GetValue",
        "ContainsKey",
        "UpdateValue",
        "Iterator",
        "Keys",
        "Values",
        "RemoveKey",
        "SetHandleState",
        "TTLConfig",
    ]:
        cls = getattr(sm, name)
        assert cls.DESCRIPTOR.name == name
        cls()  # constructible


def test_loader_never_shadows_real_protobuf():
    """The zip stages deterministically and the loader's real-package
    probe keys off the spec origin, not import success."""
    import google.protobuf

    assert google.protobuf.__file__.startswith(SHIM_ROOT)
    z1 = protoshim_zip()
    z2 = protoshim_zip()
    assert z1 == z2
    import zipfile

    with zipfile.ZipFile(z1) as zf:
        names = set(zf.namelist())
    assert "google/protobuf/_mini.py" in names
    assert "google/protobuf/internal/builder.py" in names


# --- property tests (hypothesis): serialize/parse symmetry --------------------


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @settings(max_examples=200, deadline=None)
    @given(
        version=st.integers(min_value=-(2**31), max_value=2**31 - 1),
        name=st.text(max_size=40),
        blob=st.binary(max_size=64),
    )
    def test_prop_statecallcommand_roundtrip(version, name, blob):
        """Arbitrary field values survive serialize→parse byte-exactly
        through the generated StateMessage classes (covers negative
        int32 10-byte varints, non-ASCII UTF-8, empty vs non-empty
        length-delimited fields)."""
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        req = sm.StateRequest(
            version=version,
            statefulProcessorCall=sm.StatefulProcessorCall(
                getValueState=sm.StateCallCommand(stateName=name, schema=name)
            ),
        )
        back = sm.StateRequest()
        back.ParseFromString(req.SerializeToString())
        assert back.version == version
        assert back.statefulProcessorCall.getValueState.stateName == name
        upd = sm.ValueStateUpdate(value=blob)
        b2 = sm.ValueStateUpdate()
        b2.ParseFromString(upd.SerializeToString())
        assert b2.value == blob

    @settings(max_examples=200, deadline=None)
    @given(
        status=st.integers(min_value=-(2**31), max_value=2**31 - 1),
        vals=st.lists(st.binary(max_size=32), max_size=12),
        more=st.booleans(),
        ts=st.lists(
            st.tuples(st.binary(max_size=8), st.integers(-(2**63), 2**63 - 1)),
            max_size=6,
        ),
    )
    def test_prop_response_roundtrip(status, vals, more, ts):
        """Response-shaped messages (repeated bytes, bool, repeated
        nested message with proto3_optional member, int64 extremes)
        roundtrip exactly — the direction the JVM serializes and the
        shim must parse."""
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        r = sm.StateResponseWithListGet(
            statusCode=status, value=vals, requireNextFetch=more
        )
        back = sm.StateResponseWithListGet()
        back.ParseFromString(r.SerializeToString())
        assert back.statusCode == status
        assert list(back.value) == vals
        assert back.requireNextFetch is more

        t = sm.StateResponseWithTimer(
            statusCode=status,
            timer=[sm.TimerInfo(key=k, timestampMs=ms) for k, ms in ts],
        )
        back2 = sm.StateResponseWithTimer()
        back2.ParseFromString(t.SerializeToString())
        assert [(x.key, x.timestampMs) for x in back2.timer] == ts
