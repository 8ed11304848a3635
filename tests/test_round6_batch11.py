"""Planted-case tests: sweep-line concurrency peaks, nearest-purchase
tie/window rules, log2 bucket edges."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))


def test_peak_concurrency_sweep_line(spark, tmp_path):
    # u1 session 10:00–10:30, u2 10:10–10:40, u3 one hit at 11:00.
    # Concurrency hits 2 at 10:10; 3 sessions total that day.
    d = dt.datetime(2024, 1, 10)

    def at(h, m):
        return d + dt.timedelta(hours=h, minutes=m)

    rows = [
        (1, at(10, 0), 1, "view", 0.0, "{}"),
        (2, at(10, 30), 1, "view", 0.0, "{}"),   # 30 min = merge (strict >)
        (3, at(10, 10), 2, "view", 0.0, "{}"),
        (4, at(10, 40), 2, "view", 0.0, "{}"),
        (5, at(11, 0), 3, "view", 0.0, "{}"),
    ]
    _write(spark, tmp_path, rows)
    (r,) = QUERIES["peak_concurrent_sessions_daily"](
        spark, str(tmp_path)
    ).collect()
    epoch_min_1010 = int(at(10, 10).timestamp()) // 60
    assert (r["day"], r["n_sessions"], r["peak_concurrent"]) == (
        "2024-01-10", 3, 2,
    )
    assert r["peak_minute"] == epoch_min_1010


def test_nearest_purchase_window_and_ties(spark, tmp_path):
    t = dt.datetime(2024, 1, 10, 12)
    rows = [
        # signup 100: purchases at −30 min (winner) and +2 h.
        (100, t, 1, "signup", 0.0, "{}"),
        (101, t - dt.timedelta(minutes=30), 1, "purchase", 0.0, "{}"),
        (102, t + dt.timedelta(hours=2), 1, "purchase", 0.0, "{}"),
        # signup 200: only purchase is 2 days away → no row.
        (200, t, 2, "signup", 0.0, "{}"),
        (201, t + dt.timedelta(days=2), 2, "purchase", 0.0, "{}"),
        # signup 300: ±10 min tie → earlier purchase wins.
        (300, t, 3, "signup", 0.0, "{}"),
        (301, t - dt.timedelta(minutes=10), 3, "purchase", 0.0, "{}"),
        (302, t + dt.timedelta(minutes=10), 3, "purchase", 0.0, "{}"),
    ]
    _write(spark, tmp_path, rows)
    got = {
        r["signup_id"]: (r["purchase_id"], r["abs_dt_us"])
        for r in QUERIES["nearest_purchase_to_signup"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        100: (101, 30 * 60 * 1_000_000),
        300: (301, 10 * 60 * 1_000_000),
    }


def test_log_histogram_bucket_edges(spark, tmp_path):
    t = dt.datetime(2024, 1, 10)
    # cents 0 and 1 share bucket 1 (lo 0); 5 → bucket 3 (lo 4);
    # 100 → bucket 7 (lo 64).
    rows = [
        (1, t, 1, "view", 0.00, "{}"),
        (2, t, 1, "view", 0.01, "{}"),
        (3, t, 1, "view", 0.05, "{}"),
        (4, t, 1, "view", 1.00, "{}"),
    ]
    _write(spark, tmp_path, rows)
    got = {
        r["bucket"]: (r["lo_cents"], r["n"], r["min_cents"], r["max_cents"])
        for r in QUERIES["log_value_histogram"](spark, str(tmp_path)).collect()
    }
    assert got == {1: (0, 2, 0, 1), 3: (4, 1, 5, 5), 7: (64, 1, 100, 100)}
