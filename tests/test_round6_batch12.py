"""Planted-case tests: OLS slope arithmetic, skip-bigram ordering and
collapse-before-join semantics."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def test_part_demand_slope_arithmetic(spark, tmp_path):
    # Part 1 ships 10/20/30 over weeks 0/1/2 → slope exactly
    # 10 qty/week = 10,000,000 ppm. Part 2 flat 10/10 → slope 0.
    w0 = dt.datetime(2024, 1, 1)

    def wk(i):
        return w0 + dt.timedelta(weeks=i)

    rows = [
        (1, 1, 1, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", wk(0)),
        (2, 1, 1, 2, 20.0, 1.0, 0.0, 0.0, "N", "O", wk(1)),
        (3, 1, 1, 3, 30.0, 1.0, 0.0, 0.0, "N", "O", wk(2)),
        (4, 2, 1, 4, 10.0, 1.0, 0.0, 0.0, "N", "O", wk(0)),
        (5, 2, 1, 5, 10.0, 1.0, 0.0, 0.0, "N", "O", wk(1)),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = QUERIES["part_demand_trend_top20"](spark, str(tmp_path)).collect()
    got = {r["l_partkey"]: (r["n_weeks"], r["total_qty"], r["slope_ppm"]) for r in out}
    assert got[1] == (3, 60, 10_000_000)
    assert got[2] == (2, 20, 0)
    assert out[0]["l_partkey"] == 1  # riser ranks first


def test_skip_bigram_orders_and_dedups(spark, tmp_path):
    # u1: view→click→view→purchase (one session): firsts view/click/
    # purchase → pairs (view,click) (view,purchase) (click,purchase),
    # each support 1 — the repeated 'view' does NOT double-count.
    # u2: click-only session → no pairs; 2 sessions → ppm 500000.
    t = dt.datetime(2024, 1, 10, 12)

    def ev(eid, uid, minute, et):
        return (eid, t + dt.timedelta(minutes=minute), uid, et, 0.0, "{}")

    rows = [
        ev(1, 1, 0, "view"), ev(2, 1, 1, "click"),
        ev(3, 1, 2, "view"), ev(4, 1, 3, "purchase"),
        ev(5, 2, 0, "click"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r["first_type"], r["then_type"]): (r["support"], r["support_ppm"])
        for r in QUERIES["skip_bigram_type_pairs"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        ("view", "click"): (1, 500_000),
        ("view", "purchase"): (1, 500_000),
        ("click", "purchase"): (1, 500_000),
    }
