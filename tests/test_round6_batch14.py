"""Planted-case tests: Dn retention censoring + LTV curve
carry-forward and censoring."""

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


def _d(day, uid, eid, et="view", v=0.0):
    return (eid, dt.datetime(2024, 1, day, 12), uid, et, v, "{}")


def test_dn_retention_censoring(spark, tmp_path):
    rows = [
        _d(1, 1, 1), _d(2, 1, 2), _d(8, 1, 3), _d(15, 1, 4),  # r1,r7,r14
        _d(1, 2, 5),                                          # never returns
        _d(10, 3, 6), _d(11, 3, 7),                           # r1; obs=6
        _d(16, 1, 8),                                         # horizon → Jan 16
    ]
    _write(spark, tmp_path, rows)
    (r,) = QUERIES["dn_retention_summary"](spark, str(tmp_path)).collect()
    assert (r["n_users"], r["n_obs_1"], r["n_obs_7"], r["n_obs_14"]) == (
        3, 3, 2, 2,
    )
    # D1: u1 and u3 of 3 eligible → 666666; D7/D14: u1 of {u1,u2} → 500000.
    assert (r["d1_ppm"], r["d7_ppm"], r["d14_ppm"]) == (
        666_666, 500_000, 500_000,
    )


def test_ltv_curve_carry_forward(spark, tmp_path):
    rows = [
        _d(1, 1, 1, "purchase", 1.00),   # age 0: 100c
        _d(3, 1, 2, "purchase", 2.00),   # age 2: +200c
        _d(1, 2, 3),                     # u2: no purchases, same cohort
    ]
    _write(spark, tmp_path, rows)
    got = {
        r["age"]: (r["n_users"], r["total_cum_cents"], r["mean_cum_cents"])
        for r in QUERIES["ltv_curve_by_age"](spark, str(tmp_path)).collect()
    }
    # horizon Jan 3 → ages 0..2 observable for both users.
    # age 1 carries u1's day-0 revenue forward (no day-1 purchase).
    assert got[0] == (2, 100, 50)
    assert got[1] == (2, 100, 50)
    assert got[2] == (2, 300, 150)
    assert set(got) == {0, 1, 2}
