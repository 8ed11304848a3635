"""Property tests (SURVEY §5.2.3) for the sessionizer on random event
streams: gap invariants, min/max ordering, count preservation, and
equivalence of the two formulations (session_window groupBy vs
lag/running-sum window functions)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.sessionize import (
    sessionize_visits,
    with_session_columns,
)

GAP = 1800


def _random_events(seed: int, n_users: int = 8, n_events: int = 400):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    t = {u: 0 for u in range(n_users)}
    for i in range(n_events):
        u = rng.randrange(n_users)
        # mix of intra-session steps, exact-gap edges, and big jumps
        step = rng.choice([1, 10, 600, 1799, 1800, 1801, 5000, 90000])
        t[u] += step
        rows.append((i, base + dt.timedelta(seconds=t[u]), u, rng.random()))
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_session_invariants(spark, seed):
    df = spark.createDataFrame(
        _random_events(seed), "event_id long, ts timestamp, user_id long, value double"
    )
    visits = sessionize_visits(df, gap_seconds=GAP).collect()
    hits = with_session_columns(df, gap_seconds=GAP).collect()

    # count preservation: every input event lands in exactly one session
    assert len(hits) == df.count()
    assert sum(v["n_hits"] for v in visits) == len(hits)
    assert len({v["visit_key"] for v in visits}) == len(visits)

    # per-visit: start = min ts <= max ts = end
    for v in visits:
        assert v["visit_start"] <= v["visit_end"]

    # the two formulations agree exactly
    from_hits = {}
    for h in hits:
        k = h["visit_key"]
        s = from_hits.setdefault(k, [h["visit_start"], h["visit_end"], 0])
        s[2] += 1
    assert {v["visit_key"]: [v["visit_start"], v["visit_end"], v["n_hits"]] for v in visits} == from_hits

    # gap semantics per user: consecutive hits within a session differ
    # by <= GAP; consecutive sessions are separated by > GAP
    by_user: dict[int, list] = {}
    for h in sorted(hits, key=lambda r: (r["user_id"], r["ts"])):
        by_user.setdefault(h["user_id"], []).append(h)
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            delta = (b["ts"] - a["ts"]).total_seconds()
            if b["visit_key"] == a["visit_key"]:
                assert delta <= GAP
            else:
                assert delta > GAP


def test_salt_sessions_on_both_ts_types(spark):
    """The skew escape hatch must work on epoch-seconds longs (the
    hit-log path) as well as timestamps, and the salted key must be
    consumable by the sessionizer."""
    import datetime as dt

    from web_analytics_visits_re_processing_spark.operators.sessionize import (
        salt_sessions,
        sessionize_visits,
    )

    day0, day1 = 1700000000, 1700000000 + 86_400
    longs = spark.createDataFrame(
        [("bot", day0), ("bot", day0 + 60), ("bot", day1)],
        "user_id string, ts long",
    )
    salted = salt_sessions(longs, "user_id", "ts")
    keys = {r["_salted_user"] for r in salted.collect()}
    assert len(keys) == 2  # day boundary splits the hot key

    stamps = spark.createDataFrame(
        [("bot", dt.datetime(2024, 1, 1, 12)), ("bot", dt.datetime(2024, 1, 2, 12))],
        "user_id string, ts timestamp",
    )
    visits = sessionize_visits(
        salt_sessions(stamps, "user_id", "ts"), user_col="_salted_user"
    )
    assert visits.count() == 2


def test_hot_key_sessionization_completes_and_is_correct(spark):
    """Power-law reality check: one bot user with 30k hits among
    normal users — the window formulation must spill/sort through it
    and produce exactly the sessions the gap rule implies."""
    import datetime as dt

    base = dt.datetime(2024, 5, 1)
    rows = []
    # bot: 30k hits, one every 2s → ONE giant session
    for i in range(30_000):
        rows.append((i, base + dt.timedelta(seconds=2 * i), 0, 1.0))
    # normal users: 3 hits each, two sessions
    for u in range(1, 20):
        rows.append((100_000 + u * 10, base, u, 1.0))
        rows.append((100_000 + u * 10 + 1, base + dt.timedelta(seconds=60), u, 1.0))
        rows.append((100_000 + u * 10 + 2, base + dt.timedelta(hours=3), u, 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    visits = sessionize_visits(df).collect()
    by_user = {}
    for v in visits:
        by_user.setdefault(v["user_id"], []).append(v)
    assert len(by_user[0]) == 1 and by_user[0][0]["n_hits"] == 30_000
    for u in range(1, 20):
        assert sorted(v["n_hits"] for v in by_user[u]) == [1, 2]
