"""Equivalence property: the lag/running-sum sessionization (oracle
bridge) must match native session_window on adversarial inputs."""

from __future__ import annotations




def test_lag_formulation_equals_session_window_fuzz(spark):
    """Property: the lag/running-sum sessionization (the DuckDB-oracle
    bridge, with_session_columns) and Spark's native session_window
    aggregate produce IDENTICAL visit sets on adversarial inputs —
    including events landing exactly at prev_ts + gap (merge, not
    split) and duplicate timestamps."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.operators.sessionize import (
        sessionize_visits,
        with_session_columns,
    )

    base = dt.datetime(2024, 1, 1)
    gap = 60  # seconds, small so fuzz offsets straddle it
    # offsets in ticks of gap/2 → exact-boundary collisions are LIKELY
    events = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)),
        min_size=1,
        max_size=25,
    )

    @given(events)
    @settings(max_examples=15, deadline=None)
    def check(evs):
        rows = [
            (u, base + dt.timedelta(seconds=t * gap / 2), 1.0)
            for u, t in evs
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        native = {
            (r["user_id"], r["visit_start"], r["visit_end"], r["n_hits"])
            for r in sessionize_visits(df, gap_seconds=gap).collect()
        }
        lagged = {
            tuple(r)
            for r in with_session_columns(df, gap_seconds=gap)
            .groupBy("user_id", "session_seq")
            .agg(
                F.min("ts").alias("s"),
                F.max("ts").alias("e"),
                F.count(F.lit(1)).alias("n"),
            )
            .select("user_id", "s", "e", "n")
            .collect()
        }
        assert native == lagged

    check()


def test_dynamic_gap_running_end_merges_past_short_gap(spark):
    """A long-gap event holds the session open across later short-gap
    events: with view(gap 30m)@t0, click(gap 5m)@t400s, click@t900s the
    lag-only rule would split at t900 (500s > click's 300s gap), but
    the session window end is still t0+30m — Spark merges all three.
    Pins the running-max semantics the dynamic-gap oracle replays."""
    from pyspark.sql import functions as F

    events = spark.createDataFrame(
        [
            (1, "view", 0),
            (2, "click", 400),
            (3, "click", 900),
        ],
        "event_id long, event_type string, t long",
    ).select("event_id", "event_type", F.timestamp_seconds("t").alias("ts"),
             F.lit(7).alias("user_id"))
    gap = (
        F.when(F.col("event_type") == "click", F.lit("300 seconds"))
        .otherwise(F.lit("1800 seconds"))
    )
    got = (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(got) == 1 and got[0]["n"] == 3, got
