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
