"""Planted-case tests for the round-6 analytics-depth queries:
windowFunnel chain semantics, U-shaped credit conservation, 3σ
integer anomaly rule, bot heuristics, retention ordering, rolling
7-day distinct actives. Each test writes a tiny events.parquet and
drives the REGISTERED query callable — the same code path the driver
gates — not a reimplementation."""

from __future__ import annotations

import datetime as dt

import pytest

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


def test_window_funnel_depths(spark, tmp_path):
    # A: view -> click(+30m) -> purchase(+50m): all within 1h of the view -> 3
    # B: view -> click(+120m): click outside the 1h window -> depth 1
    # C: view -> click(+30m) -> purchase(+90m): purchase > anchor+1h -> 2
    # D: click -> view: click precedes any view -> depth 1
    rows = [
        (1, 0, 1, "view", 0.0), (2, 30, 1, "click", 0.0), (3, 50, 1, "purchase", 9.0),
        (4, 0, 2, "view", 0.0), (5, 120, 2, "click", 0.0),
        (6, 0, 3, "view", 0.0), (7, 30, 3, "click", 0.0), (8, 90, 3, "purchase", 9.0),
        (9, 0, 4, "click", 0.0), (10, 5, 4, "view", 0.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["depth"]: r["n_users"]
        for r in QUERIES["window_funnel_depths"](spark, sf).collect()
    }
    assert got == {3: 1, 2: 1, 1: 2}


def test_position_attribution_credit_conservation(spark, tmp_path):
    # User 1 path: view, click, view, purchase  (n=3: 4000/2000/4000)
    # User 2 path: click, purchase              (n=1: 10000)
    # User 3: view with NO following purchase -> zero credit rows
    rows = [
        (1, 0, 1, "view", 0.0), (2, 1, 1, "click", 0.0),
        (3, 2, 1, "view", 0.0), (4, 3, 1, "purchase", 5.0),
        (5, 0, 2, "click", 0.0), (6, 1, 2, "purchase", 5.0),
        (7, 0, 3, "view", 0.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["touch_type"]: (r["total_credit_bp"], r["n_touches"])
        for r in QUERIES["position_based_attribution"](spark, sf).collect()
    }
    # views: first (4000) + last (4000) of user 1; clicks: middle of
    # user 1 (2000) + solo touch of user 2 (10000).
    assert got == {"view": (8000, 2), "click": (12000, 2)}
    assert sum(bp for bp, _ in got.values()) == 20000  # 10000 per conversion


def test_position_attribution_remainder_to_first(spark, tmp_path):
    # n=5 touches: mids get 2000//3 = 666 each, remainder 2 -> first.
    rows = [(i, i, 1, "view", 0.0) for i in range(5)] + [(9, 9, 1, "purchase", 1.0)]
    sf = _write_events(spark, tmp_path, rows)
    (row,) = QUERIES["position_based_attribution"](spark, sf).collect()
    assert row["total_credit_bp"] == 10000 and row["n_touches"] == 5


def test_anomaly_daily_revenue_spike(spark, tmp_path):
    # 10 quiet days at $1.00, one spike day at $100.00 -> only the
    # spike satisfies (n*x - S)^2 > 9*(n*Q - S^2).
    rows = [(d, d * 24 * 60, 1, "purchase", 1.0) for d in range(10)]
    rows.append((99, 10 * 24 * 60, 2, "purchase", 100.0))
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["anomaly_daily_revenue"](spark, sf).collect()
    flagged = {r["day"] for r in out if r["is_anomaly"] == 1}
    assert flagged == {"2024-01-11"}
    assert len(out) == 11


def test_bot_detection_flags(spark, tmp_path):
    # User 1: 6 events inside one minute -> burst. User 2: 3 errors of
    # 4 events -> error bot. User 3: 2 spread-out views -> clean.
    rows = [(i, 0, 1, "view", 0.0) for i in range(6)]
    rows += [(10, 0, 2, "error", 0.0), (11, 5, 2, "error", 0.0),
             (12, 10, 2, "error", 0.0), (13, 15, 2, "view", 0.0)]
    rows += [(20, 0, 3, "view", 0.0), (21, 60, 3, "view", 0.0)]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["user_id"]: r for r in QUERIES["bot_detection_flags"](spark, sf).collect()}
    assert (got[1]["is_burst"], got[1]["is_error_bot"]) == (1, 0)
    assert got[1]["max_per_minute"] == 6 and got[1]["epm_ppm"] == 6_000_000
    assert (got[2]["is_burst"], got[2]["is_error_bot"]) == (0, 1)
    assert (got[3]["is_burst"], got[3]["is_error_bot"]) == (0, 0)


def test_retention_orders_after_first_signup(spark, tmp_path):
    # User 1: click BEFORE signup only -> signup counted, click not.
    # User 2: signup then click then purchase -> all three.
    # User 3: purchase, never signed up -> nothing.
    rows = [
        (1, 0, 1, "click", 0.0), (2, 10, 1, "signup", 0.0),
        (3, 0, 2, "signup", 0.0), (4, 5, 2, "click", 0.0), (5, 9, 2, "purchase", 1.0),
        (6, 0, 3, "purchase", 1.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    (row,) = QUERIES["retention_cond_counts"](spark, sf).collect()
    assert row["n_signup"] == 2
    assert row["n_signup_then_click"] == 1
    assert row["n_signup_then_purchase"] == 1


def test_rolling_7day_active_users(spark, tmp_path):
    # Users 1,2 active on Jan 1; user 1 again Jan 5; user 3 on Jan 9.
    # Jan 5 window [Dec 30..Jan 5] sees {1,2}; Jan 9 window
    # [Jan 3..Jan 9] sees {1,3}.
    day = 24 * 60
    rows = [
        (1, 0, 1, "view", 0.0), (2, 1, 2, "view", 0.0),
        (3, 4 * day, 1, "view", 0.0), (4, 8 * day, 3, "view", 0.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["day"]: (r["dau"], r["wau"])
        for r in QUERIES["rolling_7day_active_users"](spark, sf).collect()
    }
    assert got == {
        "2024-01-01": (2, 2),
        "2024-01-05": (1, 2),
        "2024-01-09": (1, 2),
    }



def test_new_vs_returning_daily(spark, tmp_path):
    day = 24 * 60
    rows = [
        (1, 0, 1, "view", 0.0), (2, 1, 2, "view", 0.0),   # day 1: both new
        (3, day, 1, "view", 0.0),                          # day 2: 1 returns
        (4, 2 * day, 3, "view", 0.0), (5, 2 * day, 1, "view", 0.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["day"]: (r["new_users"], r["returning_users"]) for r in
           QUERIES["new_vs_returning_daily"](spark, sf).collect()}
    assert got == {
        "2024-01-01": (2, 0),
        "2024-01-02": (0, 1),
        "2024-01-03": (1, 1),
    }


def test_power_users_pareto_shares(spark, tmp_path):
    # 10 users: user u spends $u -> decile 1 = the $10 user with
    # 10/55 of revenue = 181818 ppm; shares sum to ~1e6 (truncation).
    rows = [(u, 0, u, "purchase", float(u)) for u in range(1, 11)]
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["power_users_pareto"](spark, sf).collect()
    shares = {r["decile"]: r["revenue_share_ppm"] for r in out}
    assert len(shares) == 10
    assert shares[1] == 10 * 100 * 1_000_000 // 5500
    assert shares[10] == 1 * 100 * 1_000_000 // 5500
    assert 999_990 <= sum(shares.values()) <= 1_000_000


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
