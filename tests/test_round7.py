"""Planted-case tests for the round-7 analytics-depth queries:
Shapley axioms (efficiency + unanimity-game split), SRM flag
directions, declarative session capping, and censored churn-hazard
accounting. Each test drives the REGISTERED query callable — the
same code path the driver gates — never a reimplementation."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, minutes_after_t0, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [
            (eid, T0 + dt.timedelta(minutes=m), uid, et, val, "{}")
            for (eid, m, uid, et, val) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_shapley_unanimity_split_and_efficiency(spark, tmp_path):
    """Two conversions: one touched only by view (all credit → view),
    one touched by {click, view} (a unanimity game — Shapley splits
    it 50/50). Expected φ: view 1.5, click 0.5, others 0; and
    efficiency Σφ·24 = 24·v(full) exactly."""
    rows = [
        (1, 0, 1, "view", 0.0), (2, 1, 1, "purchase", 9.0),
        (3, 0, 2, "click", 0.0), (4, 2, 2, "view", 0.0),
        (5, 4, 2, "purchase", 9.0),
        (6, 0, 3, "click", 0.0),  # touched, never converts
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["channel"]: (r["phi_x24"], r["phi_milli"])
        for r in QUERIES["shapley_attribution"](spark, sf).collect()
    }
    assert got == {
        "click": (12, 500),
        "error": (0, 0),
        "signup": (0, 0),
        "view": (36, 1500),
    }
    assert sum(v[0] for v in got.values()) == 24 * 2  # efficiency: v(full)=2


def test_srm_flags_both_directions(spark, sf_dir):
    """On the driver fixture: the honest hash split must NOT flag; the
    planted half-of-arm-B telemetry loss MUST flag."""
    got = {
        r["scenario"]: (r["n_a"], r["n_b"], r["srm_flag"])
        for r in QUERIES["srm_check"](spark, sf_dir).collect()
    }
    assert set(got) == {"hash_split", "planted_loss"}
    assert got["hash_split"][2] == 0
    assert got["planted_loss"][2] == 1
    # the planted bug drops ~half of arm B
    n_a, n_b, _ = got["planted_loss"]
    assert n_b < n_a * 2 // 3


def test_capped_session_splits_buckets(spark, tmp_path):
    """One 40-minute session (gaps < 30 min) crosses three 15-min
    buckets → 3 sub-sessions; a singleton session stays 1."""
    rows = [
        (1, 0, 1, "view", 0.0), (2, 10, 1, "view", 0.0),
        (3, 20, 1, "view", 0.0), (4, 40, 1, "view", 0.0),
        (5, 0, 2, "view", 0.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["n_subsessions"]: (r["n_sessions"], r["n_capped_sessions"])
        for r in QUERIES["capped_session_splits"](spark, sf).collect()
    }
    assert got == {1: (1, 1), 3: (1, 3)}


def test_churn_hazard_censoring_accounting(spark, tmp_path):
    """max date = day 12 → cutoff = day 5. u1 churns at tenure 0, u2
    churns at tenure 2, u3 (active on day 12) is CENSORED at tenure 5
    — still at risk through t=5, never counted as a churn; rows end
    at the largest observed tenure."""
    day = 1440
    rows = [
        (1, 0, 1, "view", 0.0),                       # u1: day 0 only
        (2, 0, 2, "view", 0.0), (3, 2 * day, 2, "view", 0.0),  # u2: d0..d2
        (4, 0, 3, "view", 0.0), (5, 12 * day, 3, "view", 0.0),  # u3: censored
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["t"]: (r["n_at_risk"], r["n_churned"], r["hazard_ppm"])
        for r in QUERIES["churn_hazard_curve"](spark, sf).collect()
    }
    assert got == {
        0: (3, 1, 333333),
        1: (2, 0, 0),
        2: (2, 1, 500000),
        3: (1, 0, 0),
        4: (1, 0, 0),
        5: (1, 0, 0),
    }
