"""Planted-case tests for the dwell/Markov/changepoint/aging batch:
dwell gap cutoffs, transition-probability normalization, the CUSUM
scan peaking at a planted level shift, and aging band edges."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def test_dwell_gap_cutoff(spark, tmp_path):
    rows = [
        (1, T0, 1, "view", 0.0, "{}"),                              # 10 s dwell
        (2, T0 + dt.timedelta(seconds=10), 1, "view", 0.0, "{}"),   # 2 h gap → none
        (3, T0 + dt.timedelta(hours=2), 1, "view", 0.0, "{}"),      # last → none
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["dwell_time_by_type"](spark, str(tmp_path)).collect()
    assert (r["n_hits"], r["n_dwells"], r["dwell_us_sum"]) == (3, 1, 10_000_000)
    assert r["mean_dwell_ms"] == 10_000


def test_markov_row_normalization(spark, tmp_path):
    # view→click→view→purchase within one session:
    # P(view→click)=P(view→purchase)=0.5, P(click→view)=1.
    seq = ["view", "click", "view", "purchase"]
    rows = [
        (i, T0 + dt.timedelta(minutes=i), 1, t, 0.0, "{}")
        for i, t in enumerate(seq)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r["cur_type"], r["next_type"]): (r["n"], r["p_ppm"])
        for r in QUERIES["markov_next_event_probs"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        ("view", "click"): (1, 500_000),
        ("view", "purchase"): (1, 500_000),
        ("click", "view"): (1, 1_000_000),
    }


def test_changepoint_peaks_at_level_shift(spark, tmp_path):
    # 1.00/day for 4 days then 3.00/day for 4: D_t peaks on day 4,
    # the last day of the old level (D = |8*cum_t - t*1600| cents).
    rows = []
    for d in range(8):
        cents = 100 if d < 4 else 300
        rows.append(
            (d, dt.datetime(2024, 1, 1 + d, 9), 1, "purchase",
             cents / 100.0, "{}")
        )
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r["day"]: (r["cum_cents"], r["d_stat"], r["is_peak"])
        for r in QUERIES["changepoint_scan_daily"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["2024-01-04"] == (400, 3200, 1)
    assert out["2024-01-08"] == (1600, 0, 0)
    assert sum(v[2] for v in out.values()) == 1


def test_open_order_aging_bands(spark, tmp_path):
    t0 = dt.datetime(2024, 6, 1)
    orders = [
        # anchor = max orderdate = 2024-06-01 (the closed order).
        (1, 1, "F", 100.0, t0, "1-URGENT"),
        (2, 1, "O", 100.0, t0 - dt.timedelta(days=10), "1-URGENT"),
        (3, 1, "O", 100.0, t0 - dt.timedelta(days=60), "1-URGENT"),
        (4, 1, "O", 100.0, t0 - dt.timedelta(days=200), "2-HIGH"),
    ]
    _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {
        (r["o_orderpriority"], r["bucket"]): (r["n_orders"], r["oldest_days"])
        for r in QUERIES["open_order_aging_buckets"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        ("1-URGENT", "0-30"): (1, 10),
        ("1-URGENT", "31-90"): (1, 60),
        ("2-HIGH", "180+"): (1, 200),
    }
