"""Planted-case tests: cohort revenue expansion, new-revenue share,
seasonal 3-sigma flags (incl. the max-z=(n-1)/sqrt(n) constraint that
makes small groups unflaggable by construction)."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
O_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def test_cohort_revenue_expansion(spark, tmp_path):
    jan, feb = dt.datetime(2024, 1, 15), dt.datetime(2024, 2, 15)
    orders = [
        (1, 1, "O", 1.00, jan, "1-URGENT"),   # cohort Jan, offset 0: 100c
        (2, 1, "O", 1.50, feb, "1-URGENT"),   # offset 1: 150c → 1.5e6 ppm
        (3, 2, "O", 2.00, feb, "1-URGENT"),   # cohort Feb, offset 0
    ]
    _write(spark, tmp_path, "orders", orders, O_SCHEMA)
    got = {
        (r["cohort_month"], r["offset_m"]): (r["cents"], r["retention_ppm"])
        for r in QUERIES["cohort_revenue_matrix"](
            spark, str(tmp_path)
        ).collect()
    }
    m_jan = 2024 * 12 + 1
    assert got[(m_jan, 0)] == (100, 1_000_000)
    assert got[(m_jan, 1)] == (150, 1_500_000)   # NRR 150%
    assert got[(m_jan + 1, 0)] == (200, 1_000_000)


def test_new_revenue_share(spark, tmp_path):
    jan, feb = dt.datetime(2024, 1, 15), dt.datetime(2024, 2, 15)
    orders = [
        (1, 1, "O", 1.00, jan, "1-URGENT"),
        (2, 1, "O", 1.50, feb, "1-URGENT"),   # existing in Feb
        (3, 2, "O", 2.00, feb, "1-URGENT"),   # new in Feb
    ]
    _write(spark, tmp_path, "orders", orders, O_SCHEMA)
    got = {
        r["month_idx"]: (r["new_cents"], r["existing_cents"], r["new_share_ppm"])
        for r in QUERIES["new_customer_revenue_share_monthly"](
            spark, str(tmp_path)
        ).collect()
    }
    m_jan = 2024 * 12 + 1
    assert got[m_jan] == (100, 0, 1_000_000)
    assert got[m_jan + 1] == (200, 150, 571_428)


def test_seasonal_anomaly_within_weekday(spark, tmp_path):
    # 12 Mondays: 11 at 100c, one at 200c → the 200c Monday is >3σ of
    # the MONDAY group (dev²=1.21e6 > 9·var=990000). Two flat
    # Tuesdays: var 0 → never flagged.
    mon0 = dt.datetime(2024, 1, 1, 10)   # Monday
    rows = []
    for i in range(12):
        cents = 200 if i == 5 else 100
        rows.append(
            (i, mon0 + dt.timedelta(weeks=i), 1, "purchase",
             cents / 100.0, "{}")
        )
    tue0 = dt.datetime(2024, 1, 2, 10)
    rows += [
        (100, tue0, 1, "purchase", 1.0, "{}"),
        (101, tue0 + dt.timedelta(weeks=1), 1, "purchase", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = QUERIES["seasonal_adjusted_anomalies"](
        spark, str(tmp_path)
    ).collect()
    flagged = {r["day"] for r in out if r["is_anomaly"] == 1}
    spike_day = (mon0 + dt.timedelta(weeks=5)).strftime("%Y-%m-%d")
    assert flagged == {spike_day}
