"""Planted-case tests for the advanced-statistics tier
(plans/advstats.py): Spearman extremes, Gini arithmetic, weekday
seasonality shares, and the KMV estimator's small-regime exactness +
large-regime error bound."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.plans import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def test_spearman_perfect_and_reversed(spark, tmp_path):
    t = dt.datetime(2024, 1, 10)
    rows = [  # 'up': value increases with time → rho = +1.
        (i, t + dt.timedelta(minutes=i), 1, "up", float(i), "{}")
        for i in range(4)
    ] + [  # 'down': value decreases with time → rho = -1 exactly
        #  (d2_sum = n(n^2-1)/3 = 20 for n=4; 60000*20//60 = 20000).
        (10 + i, t + dt.timedelta(minutes=i), 1, "down", float(9 - i), "{}")
        for i in range(4)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["event_type"]: (r["n"], r["d2_sum"], r["rho_bp"])
        for r in QUERIES["spearman_value_time_by_type"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["up"] == (4, 0, 10000)
    assert got["down"] == (4, 20, -10000)


def test_gini_equal_and_two_customer(spark, tmp_path):
    t = dt.datetime(2024, 1, 10)
    orders = [  # nation EQ: three customers, 200 dollars each → G = 0.
        (1, 101, "O", 200.0, t, "1-URGENT"),
        (2, 102, "O", 200.0, t, "1-URGENT"),
        (3, 103, "O", 200.0, t, "1-URGENT"),
        # nation SKEW: 100 vs 300 → G = 0.25 exactly (see below).
        (4, 201, "O", 100.0, t, "1-URGENT"),
        (5, 202, "O", 300.0, t, "1-URGENT"),
    ]
    _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark, tmp_path, "customer",
        [(101, "a", 0, 0.0, "S"), (102, "b", 0, 0.0, "S"),
         (103, "c", 0, 0.0, "S"), (201, "d", 1, 0.0, "S"),
         (202, "e", 1, 0.0, "S")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    _write(
        spark, tmp_path, "nation",
        [(0, "EQ", 0, ""), (1, "SKEW", 0, "")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    )
    got = {
        r["nation"]: (r["n_customers"], r["revenue_dollars"], r["gini_ppm"])
        for r in QUERIES["gini_revenue_by_nation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["EQ"] == (3, 600, 0)
    # [100, 300]: Sixi = 1*100 + 2*300 = 700;
    # (2*700 - 3*400) * 1e6 // (2*400) = 250000 ppm = G 0.25.
    assert got["SKEW"] == (2, 400, 250_000)


def test_dow_seasonality_shares(spark, tmp_path):
    mon = dt.datetime(2024, 1, 8, 12)   # Monday  → dow 0
    tue = dt.datetime(2024, 1, 9, 12)   # Tuesday → dow 1
    rows = [
        (1, mon, 1, "view", 3.0, "{}"),
        (2, tue, 1, "view", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["dow"]: (r["cents"], r["index_ppm"])
        for r in QUERIES["dow_seasonality_index"](
            spark, str(tmp_path)
        ).collect()
    }
    # total 400 cents: Monday 300*7e6//400, Tuesday 100*7e6//400.
    assert got == {0: (300, 5_250_000), 1: (100, 1_750_000)}


def test_kmv_small_regime_near_exact(spark, tmp_path):
    # 40 distinct users < k=256 → k_eff = 40; the kth hash is the MAX,
    # so the estimate collapses to ~n (39/max_frac) — within ±15%.
    t = dt.datetime(2024, 1, 10)
    rows = [(i, t, i % 40, "view", 1.0, "{}") for i in range(120)]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["kmv_distinct_users"](spark, str(tmp_path)).collect()
    assert r["k"] == 40
    assert r["n_exact"] == 40
    assert abs(r["kmv_estimate"] - 40) <= 6


def test_kmv_error_bound_sf(spark, sf_dir):
    # sf0.001 has 15 distinct users (< k): degenerate-exact regime.
    (r,) = QUERIES["kmv_distinct_users"](spark, sf_dir).collect()
    assert r["k"] == min(256, r["n_exact"])
    rel = abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"]
    assert rel < 0.35  # 15 draws is noisy; bound is 3/sqrt(k_eff-2)+slack


def test_spearman_matches_scipy_free_reference(spark, tmp_path):
    # Hand-computable mixed case: values [5, 1, 4, 2, 3] over times
    # t0..t4 → rx over value = [5,1,4,2,3], ry = [1,2,3,4,5];
    # d2 = 16+1+1+4+4 = 26; rho_bp = 10000 - 60000*26//120 = -3000.
    t = dt.datetime(2024, 1, 10)
    vals = [5.0, 1.0, 4.0, 2.0, 3.0]
    rows = [
        (i, t + dt.timedelta(minutes=i), 1, "mix", vals[i], "{}")
        for i in range(5)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["spearman_value_time_by_type"](
        spark, str(tmp_path)
    ).collect()
    assert (r["n"], r["d2_sum"], r["rho_bp"]) == (5, 26, -3000)


def test_kmv_merge_theorem_exact(spark, sf_dir):
    (r,) = QUERIES["kmv_merge_groups"](spark, sf_dir).collect()
    # k-smallest-of-union-of-per-group-k-smallest ≡ global k-smallest:
    # the sets must agree element for element.
    assert r["k_merged"] == r["k_direct"]
    assert r["kth_merged"] == r["kth_direct"]
    assert r["n_common"] == r["k_merged"]


def test_ks_identical_and_shifted(spark, tmp_path):
    # Identical halves → D = 0, not significant. Disjoint supports
    # (all 1c in half 1, all 2c in half 2, n=20 each) → D_scaled =
    # n1·n2 = 400 (maximal), significant at 0.05
    # (1e6·400² = 1.6e11 > 1844164·40·400 = 2.95e10).
    t1 = dt.datetime(2024, 1, 5, 12)
    t2 = dt.datetime(2024, 1, 20, 12)
    rows = []
    for i in range(20):
        rows.append((i, t1, 1, "same", 0.05, "{}"))
        rows.append((100 + i, t2, 1, "same", 0.05, "{}"))
    for i in range(20):
        rows.append((200 + i, t1, 1, "shift", 0.01, "{}"))
        rows.append((300 + i, t2, 1, "shift", 0.02, "{}"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["event_type"]: (r["n1"], r["n2"], r["d_scaled"], r["significant_05"])
        for r in QUERIES["ks_two_sample_by_type"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["same"] == (20, 20, 0, 0)
    assert got["shift"] == (20, 20, 400, 1)


def test_kpi_correlation_coupled(spark, tmp_path):
    # 5 days where revenue and DAU rise together → rho = +10000.
    rows = []
    eid = 0
    for d in range(5):
        day = dt.datetime(2024, 1, 1 + d, 9)
        for u in range(d + 1):           # DAU rises 1..5
            rows.append((eid, day, u, "purchase", (d + 1) * 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["kpi_correlation_daily"](spark, str(tmp_path)).collect()
    assert (r["n_days"], r["d2_sum"], r["rho_bp"]) == (5, 0, 10_000)


def test_mann_whitney_shift_and_null(spark, tmp_path):
    t1 = dt.datetime(2024, 1, 5, 12)
    t2 = dt.datetime(2024, 1, 20, 12)
    rows = []
    # 'shift': half1 all 1c, half2 all 2c → doubled midranks 11/31;
    # d2 = 110 − 110 − 100 = −100; 100² = 10000 > 3·10·10·21 = 6300.
    for i in range(10):
        rows.append((i, t1, 1, "shift", 0.01, "{}"))
        rows.append((100 + i, t2, 1, "shift", 0.02, "{}"))
    # 'same': identical halves → d2 = 0, not significant.
    for i in range(10):
        rows.append((200 + i, t1, 1, "same", 0.05, "{}"))
        rows.append((300 + i, t2, 1, "same", 0.05, "{}"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["event_type"]: (r["n1"], r["n2"], r["d2"], r["significant_3sigma"])
        for r in QUERIES["mann_whitney_shift_by_type"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["shift"] == (10, 10, -100, 1)
    assert got["same"] == (10, 10, 0, 0)


def test_two_proportion_ztest(spark, tmp_path):
    t1 = dt.datetime(2024, 1, 5, 12)
    t2 = dt.datetime(2024, 1, 20, 12)
    rows, eid = [], 0
    # Half 1: 10/100 convert; half 2: 40/100 → z² ≈ 25.7 > 9:
    # (k1n2−k2n1)²N = (1000−4000)²·200 = 1.8e9;
    # 9·n1n2·K(N−K) = 9·1e4·50·150 = 6.75e8 → significant.
    for i in range(100):
        rows.append((eid, t1, 1, "purchase" if i < 10 else "view",
                     0.0, "{}")); eid += 1
    for i in range(100):
        rows.append((eid, t2, 1, "purchase" if i < 40 else "view",
                     0.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["two_proportion_ztest"](spark, str(tmp_path)).collect()
    assert (r["n1"], r["k1"], r["n2"], r["k2"]) == (100, 10, 100, 40)
    assert (r["cvr1_ppm"], r["cvr2_ppm"]) == (100_000, 400_000)
    assert r["significant_3sigma"] == 1

    # Identical halves → not significant.
    rows2 = []
    eid = 0
    for tt in (t1, t2):
        for i in range(100):
            rows2.append((eid, tt, 1, "purchase" if i < 10 else "view",
                          0.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows2, EV_SCHEMA)
    (r2,) = QUERIES["two_proportion_ztest"](spark, str(tmp_path)).collect()
    assert r2["significant_3sigma"] == 0


def test_cuped_perfect_and_zero_correlation(spark, tmp_path):
    t1 = dt.datetime(2024, 1, 5, 12)
    t2 = dt.datetime(2024, 1, 20, 12)
    # y = 100·x exactly (perfect covariate): r² = 1e6, θ = 100e6 ppm.
    rows, eid = [], 0
    for u in range(1, 5):
        for _ in range(u):                  # x = u pre-period events
            rows.append((eid, t1, u, "view", 0.0, "{}")); eid += 1
        rows.append((eid, t2, u, "purchase", u * 1.0, "{}")); eid += 1
        # (purchase event itself adds nothing to x; y = 100·u cents)
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["cuped_variance_reduction"](spark, str(tmp_path)).collect()
    assert r["n"] == 4
    assert r["theta_ppm"] == 100_000_000
    assert r["r2_ppm"] == 1_000_000
