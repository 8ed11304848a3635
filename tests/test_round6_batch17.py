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


def test_embedding_drift_zero_and_shift(spark, tmp_path):
    # Label 0: even and odd batches identical → drift 0. Label 1:
    # batches at (1,0) vs (0,1) → drift = 2e12 micro².
    rows = [
        (0, [0.5, 0.5], 0), (2, [0.5, 0.5], 0),   # even batch
        (1, [0.5, 0.5], 0), (3, [0.5, 0.5], 0),   # odd batch
        (10, [1.0, 0.0], 1),                      # even
        (11, [0.0, 1.0], 1),                      # odd
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {
        r["label"]: (r["n_ref"], r["n_cand"], r["drift2_micro"])
        for r in QUERIES["embedding_drift_by_label"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0] == (2, 2, 0)
    assert got[1] == (1, 1, 2_000_000_000_000)


def test_session_length_percentiles(spark, tmp_path):
    t = dt.datetime(2024, 1, 10, 12)
    rows = []
    eid = 0
    # 10 sessions: five 1-hit, four 2-hit, one 10-hit.
    for u in range(5):
        rows.append((eid, t, u, "view", 0.0, "{}")); eid += 1
    for u in range(5, 9):
        for j in range(2):
            rows.append(
                (eid, t + dt.timedelta(minutes=j), u, "view", 0.0, "{}")
            ); eid += 1
    for j in range(10):
        rows.append(
            (eid, t + dt.timedelta(minutes=j), 9, "view", 0.0, "{}")
        ); eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["session_length_percentiles"](
        spark, str(tmp_path)
    ).collect()
    assert (r["n_sessions"], r["n_single_hit"], r["single_hit_ppm"]) == (
        10, 5, 500_000,
    )
    # cum: len1→5, len2→9, len10→10: p50=1, p90=2, p99=10.
    assert (r["p50_len"], r["p90_len"], r["p99_len"]) == (1, 2, 10)


def test_exit_rate_semantics(spark, tmp_path):
    t = dt.datetime(2024, 1, 10, 12)
    rows = [
        # view → purchase (same session): view not exit, purchase exit.
        (1, t, 1, "view", 0.0, "{}"),
        (2, t + dt.timedelta(minutes=1), 1, "purchase", 0.0, "{}"),
        # view then 2 h gap then view: BOTH views exit their sessions.
        (3, t, 2, "view", 0.0, "{}"),
        (4, t + dt.timedelta(hours=2), 2, "view", 0.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["event_type"]: (r["n_hits"], r["n_exits"], r["exit_rate_ppm"])
        for r in QUERIES["exit_rate_by_type"](spark, str(tmp_path)).collect()
    }
    assert got["view"] == (3, 2, 666_666)
    assert got["purchase"] == (1, 1, 1_000_000)


def test_dow_forecast_backtest_arithmetic(spark, tmp_path):
    # Three Mondays at 100/120 cents (train) then a holdout week with
    # one Monday at 140: pred = (100+120)//2 = 110, err = 30. A
    # holdout Tuesday at 80 with train Tuesdays 80/80 → err 0.
    # MAE = (30+0)//2 = 15.
    mon0 = dt.datetime(2024, 1, 1, 10)   # Monday
    tue0 = dt.datetime(2024, 1, 2, 10)
    rows = [
        (1, mon0, 1, "purchase", 1.00, "{}"),
        (2, mon0 + dt.timedelta(weeks=1), 1, "purchase", 1.20, "{}"),
        (3, tue0, 1, "purchase", 0.80, "{}"),
        (4, tue0 + dt.timedelta(weeks=1), 1, "purchase", 0.80, "{}"),
        # holdout week (last 7 days ending at the max date):
        (5, mon0 + dt.timedelta(weeks=2), 1, "purchase", 1.40, "{}"),
        (6, tue0 + dt.timedelta(weeks=2), 1, "purchase", 0.80, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["dow"]: (r["actual_cents"], r["pred_cents"], r["abs_err_cents"], r["mae_cents"])
        for r in QUERIES["dow_naive_forecast_backtest"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0] == (140, 110, 30, 15)
    assert got[1] == (80, 80, 0, 15)


def test_return_rate_value_divergence(spark, tmp_path):
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    t = dt.datetime(2024, 1, 1)
    # Brand X: 1 of 2 lines returned (500000 line-rate), but the
    # returned line carries 900 of 1000 cents → value rate 900000.
    li = [
        (1, 1, 1, 1, 1.0, 9.00, 0.0, 0.0, "R", "O", t),
        (2, 1, 1, 2, 1.0, 1.00, 0.0, 0.0, "N", "O", t),
    ]
    _write(spark, tmp_path, "lineitem", li, li_schema)
    _write(
        spark, tmp_path, "part",
        [(1, "p1", "BrandX", "TYPE", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    (r,) = QUERIES["return_rate_by_brand"](spark, str(tmp_path)).collect()
    assert (r["n_lines"], r["n_returned"]) == (2, 1)
    assert (r["return_rate_ppm"], r["returned_value_ppm"]) == (
        500_000, 900_000,
    )


def test_conversion_path_lengths(spark, tmp_path):
    t = dt.datetime(2024, 1, 10, 12)
    rows = [
        # u1: v v purchase (2 touches), then purchase again (0 touches).
        (1, t, 1, "view", 0.0, "{}"),
        (2, t + dt.timedelta(minutes=1), 1, "view", 0.0, "{}"),
        (3, t + dt.timedelta(minutes=2), 1, "purchase", 0.0, "{}"),
        (4, t + dt.timedelta(minutes=3), 1, "purchase", 0.0, "{}"),
        # u2: views only → no conversion path.
        (5, t, 2, "view", 0.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["n_touches"]: (r["n_conversions"], r["share_ppm"])
        for r in QUERIES["conversion_path_length_histogram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {2: (1, 500_000), 0: (1, 500_000)}


LI_SCHEMA2 = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)
P_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string, "
    "p_size int, p_retailprice double"
)


def test_discount_quantity_spearman_extremes(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    # Brand UP: quantity rises with discount → +10000 bp.
    # Brand DOWN: n=3 reversed → d²(single)=8, doubled ×4=32,
    # rho = 10000 − 15000·32//24 = −10000.
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.00, 0.0, "N", "O", t),
        (2, 1, 1, 2, 2.0, 1.0, 0.10, 0.0, "N", "O", t),
        (3, 1, 1, 3, 3.0, 1.0, 0.20, 0.0, "N", "O", t),
        (4, 2, 1, 4, 3.0, 1.0, 0.00, 0.0, "N", "O", t),
        (5, 2, 1, 5, 2.0, 1.0, 0.10, 0.0, "N", "O", t),
        (6, 2, 1, 6, 1.0, 1.0, 0.20, 0.0, "N", "O", t),
    ]
    _write(spark, tmp_path, "lineitem", li, LI_SCHEMA2)
    _write(spark, tmp_path, "part",
           [(1, "a", "UP", "T", 1, 1.0), (2, "b", "DOWN", "T", 1, 1.0)],
           P_SCHEMA)
    got = {
        r["p_brand"]: (r["n"], r["d2x4_sum"], r["rho_bp"])
        for r in QUERIES["discount_quantity_spearman"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["UP"] == (3, 0, 10_000)
    assert got["DOWN"] == (3, 32, -10_000)


def test_anova_variance_fully_between(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    orders = [
        (1, 1, "O", 10.0, t, "1-URGENT"),
        (2, 1, "O", 10.0, t, "1-URGENT"),
        (3, 1, "O", 30.0, t, "2-HIGH"),
        (4, 1, "O", 30.0, t, "2-HIGH"),
    ]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    (r,) = QUERIES["priority_anova_eta2"](spark, str(tmp_path)).collect()
    # a = 200+1800 = 2000; ssb = 2000 − 1600 = 400; ssw = 0;
    # eta² = 400e6 // 400 = 1e6 (all variance between groups).
    assert (r["k"], r["n"], r["ssb_d2"], r["ssw_d2"]) == (2, 4, 400, 0)
    assert r["eta2_ppm"] == 1_000_000


def test_chi2_perfect_association(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    # Segment A only places URGENT orders, B only LOW: 2x2 with
    # perfect association → chi2_scaled ≈ N (= 4, the chi² of a
    # perfectly dependent 2×2), dof = 1.
    orders = [
        (1, 1, "O", 1.0, t, "1-URGENT"),
        (2, 1, "O", 1.0, t, "1-URGENT"),
        (3, 2, "O", 1.0, t, "5-LOW"),
        (4, 2, "O", 1.0, t, "5-LOW"),
    ]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    _write(spark, tmp_path, "customer",
           [(1, "a", 0, 0.0, "SEGA"), (2, "b", 0, 0.0, "SEGB")],
           "c_custkey long, c_name string, c_nationkey long, "
           "c_acctbal double, c_mktsegment string")
    (r,) = QUERIES["segment_priority_chi2"](spark, str(tmp_path)).collect()
    assert (r["n_cells"], r["n"], r["dof"]) == (2, 4, 1)
    # only the 2 observed cells contribute: each (2·4−2·2)²//(2·2·4)=1
    # → scaled statistic 2 (the zero cells never enter the rollup —
    # documented: the screen under-counts by the missing-cell terms).
    assert r["chi2_scaled"] == 2


def test_benford_missing_digit_emits(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    # All totals start with 1 → digit 1 at 1e6 ppm, digits 2-9 at 0
    # with their full Benford deviation — and PRESENT in the output.
    orders = [(i, 1, "O", 100.0 + i, t, "1-URGENT") for i in range(5)]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    got = {
        r["digit"]: (r["n"], r["obs_ppm"], r["sq_dev"])
        for r in QUERIES["benford_first_digit_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == set(range(1, 10))
    assert got[1] == (5, 1_000_000, (1_000_000 - 301_030) ** 2)
    assert got[9] == (0, 0, 45_757 ** 2)


def test_mann_kendall_monotone_and_flat(spark, tmp_path):
    # 12 strictly rising days: S = 66 = n(n-1)/2, significant
    # (2·66² = 8712 > 12·11·29 = 3828). Flat series: S = 0.
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 9), 1, "purchase",
         (100 + i) / 100.0, "{}")
        for i in range(12)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["mann_kendall_trend"](spark, str(tmp_path)).collect()
    assert (r["n_days"], r["s"], r["significant_3sigma"]) == (12, 66, 1)

    flat = [
        (i, dt.datetime(2024, 1, 1 + i, 9), 1, "purchase", 1.0, "{}")
        for i in range(12)
    ]
    _write(spark, tmp_path, "events", flat, EV_SCHEMA)
    (r2,) = QUERIES["mann_kendall_trend"](spark, str(tmp_path)).collect()
    assert (r2["s"], r2["significant_3sigma"]) == (0, 0)


def test_skyline_window_equals_definition(spark, tmp_path):
    # Points (price, size): (100,5) and (200,9) on the frontier;
    # (150,4) dominated by (100,5); (200,9) duplicate collapses;
    # (250,9) dominated by (200,9); (90,1) cheapest → frontier.
    parts = [
        (1, "a", "B", "T", 5, 1.00),
        (2, "b", "B", "T", 4, 1.50),
        (3, "c", "B", "T", 9, 2.00),
        (4, "d", "B", "T", 9, 2.00),
        (5, "e", "B", "T", 9, 2.50),
        (6, "f", "B", "T", 1, 0.90),
    ]
    _write(spark, tmp_path, "part", parts, P_SCHEMA)
    got = {
        (r["price_cents"], r["size"]): (r["example_partkey"], r["n_parts"])
        for r in QUERIES["skyline_parts_price_size"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        (90, 1): (6, 1),
        (100, 5): (1, 1),
        (200, 9): (3, 2),
    }


def test_lorenz_deciles(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    orders = [(i, i, "O", float(i), t, "1-URGENT") for i in range(1, 11)]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    got = {
        r["decile"]: (r["n_customers"], r["dollars"], r["cum_share_ppm"])
        for r in QUERIES["lorenz_curve_deciles"](spark, str(tmp_path)).collect()
    }
    # revenues 1..10 (total 55): decile k holds k dollars;
    # cum share at k = k(k+1)/2 · 1e6 // 55.
    assert got[4] == (1, 4, 10 * 1_000_000 // 55)
    assert got[10] == (1, 10, 1_000_000)
    assert len(got) == 10


def test_duplicate_order_flags(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 9)
    orders = [
        (1, 7, "O", 99.99, t, "1-URGENT"),
        (2, 7, "O", 99.99, t + dt.timedelta(hours=2), "1-URGENT"),  # same day
        (3, 7, "O", 50.00, t, "1-URGENT"),
    ]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    rows = QUERIES["duplicate_order_flags"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r["o_custkey"], r["cents"], r["n_orders"], r["first_orderkey"]) == (
        7, 9999, 2, 1,
    )


def test_bpr_negative_deterministic(spark, tmp_path):
    import hashlib

    t = dt.datetime(2024, 1, 1)
    _write(spark, tmp_path, "orders",
           [(1, 5, "O", 1.0, t, "1-URGENT")],
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    _write(spark, tmp_path, "lineitem",
           [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t)], li_schema)
    _write(spark, tmp_path, "part",
           [(3, "p", "B", "T", 1, 1.0)],
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    expected_neg = int(hashlib.md5(b"5#1").hexdigest()[:15], 16) % 3 + 1
    (r,) = QUERIES["bpr_negative_samples"](spark, str(tmp_path)).collect()
    assert r["n_pairs"] == 1
    assert r["neg_checksum"] == expected_neg
    assert r["n_collisions"] == (1 if expected_neg == 1 else 0)


def test_mutual_best_match(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    # parts 1-2: each other's only partner (mutual). part 3 pairs
    # with 1 (one-directional: 1's best is 2).
    li, ln = [], 1
    for o, parts in [(10, [1, 2]), (11, [1, 2]), (12, [1, 2]),
                     (13, [1, 3]), (14, [1, 3])]:
        for p in parts:
            li.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", t))
            ln += 1
    _write(spark, tmp_path, "lineitem", li, LI_SCHEMA2)
    rows = QUERIES["mutual_best_match_parts"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    (r,) = rows
    # cos²(1,2) = 9·1e6/(5·3) = 600000 both directions.
    assert (r["part_a"], r["part_b"]) == (1, 2)
    assert r["cos2_ab_ppm"] == r["cos2_ba_ppm"] == 600_000


def test_daily_overdispersion_extremes(spark, tmp_path):
    rows = []
    eid = 0
    # 'flat': 2/day for 4 days → var 0 → dispersion 0.
    for d in range(4):
        for _ in range(2):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 9), 1,
                         "flat", 0.0, "{}")); eid += 1
    # 'burst': days 8,0... only days WITH events appear: counts 6,2
    # over 2 observed days: n=2,S=8,Q=40 → (80−64)·1e6//16 = 1000000.
    for c, d in [(6, 10), (2, 11)]:
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 1, d, 9), 1,
                         "burst", 0.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["event_type"]: (r["n_days"], r["n_events"], r["dispersion_ppm"])
        for r in QUERIES["daily_arrival_overdispersion"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["flat"] == (4, 8, 0)
    assert got["burst"] == (2, 8, 1_000_000)


def test_max_drawdown(spark, tmp_path):
    # Daily cents 100, 300, 150, 120, 200: peak 300 → trough 120:
    # drawdown 180 cents = 6000 bp of the peak, on day 4.
    cents = [100, 300, 150, 120, 200]
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 9), 1, "purchase", c / 100.0, "{}")
        for i, c in enumerate(cents)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["max_drawdown_daily"](spark, str(tmp_path)).collect()
    assert (r["trough_day"], r["trough_cents"], r["peak_cents"]) == (
        "2024-01-04", 120, 300,
    )
    assert (r["drawdown_cents"], r["drawdown_bp"]) == (180, 6000)


def test_local_extrema(spark, tmp_path):
    # 100, 300, 120, 200, 150: day2 PEAK (prom 180), day3 TROUGH
    # (prom 80), day4 PEAK (prom 50); endpoints excluded.
    cents = [100, 300, 120, 200, 150]
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 9), 1, "purchase", c / 100.0, "{}")
        for i, c in enumerate(cents)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["day"]: (r["kind"], r["prominence"])
        for r in QUERIES["local_extrema_days"](spark, str(tmp_path)).collect()
    }
    assert got == {
        "2024-01-02": ("PEAK", 180),
        "2024-01-03": ("TROUGH", 80),
        "2024-01-04": ("PEAK", 50),
    }


def test_abc_classes(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    # Revenues 80/15/3/2 cents (total 100): part1 cum 80 → A;
    # part2 cum 95 → B; parts 3,4 → C.
    li = [
        (1, 1, 1, 1, 1.0, 0.80, 0.0, 0.0, "N", "O", t),
        (2, 2, 1, 2, 1.0, 0.15, 0.0, 0.0, "N", "O", t),
        (3, 3, 1, 3, 1.0, 0.03, 0.0, 0.0, "N", "O", t),
        (4, 4, 1, 4, 1.0, 0.02, 0.0, 0.0, "N", "O", t),
    ]
    _write(spark, tmp_path, "lineitem", li, LI_SCHEMA2)
    got = {
        r["abc_class"]: (r["n_parts"], r["revenue_cents"], r["revenue_share_ppm"])
        for r in QUERIES["abc_classification_parts"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        "A": (1, 80, 800_000),
        "B": (1, 15, 150_000),
        "C": (2, 5, 50_000),
    }


def test_daily_vwap(spark, tmp_path):
    t = dt.datetime(2024, 1, 5)
    # 10 units @ 100c + 30 units @ 200c → VWAP (1000+6000)//40 = 175.
    li = [
        (1, 1, 1, 1, 10.0, 1.00, 0.0, 0.0, "N", "O", t),
        (2, 2, 1, 2, 30.0, 2.00, 0.0, 0.0, "N", "O", t),
    ]
    _write(spark, tmp_path, "lineitem", li, LI_SCHEMA2)
    (r,) = QUERIES["daily_vwap_shipments"](spark, str(tmp_path)).collect()
    assert (r["units"], r["value_units"], r["vwap_cents"]) == (40, 7000, 175)


def test_loo_cvr_influence(spark, tmp_path):
    # Day1: 10 events 1 purchase; day2: 10 events 1 purchase;
    # day3 (whale): 10 events 8 purchases. Overall 10/30 = 333333.
    # LOO day3: 2/20 = 100000 (influence 233333 — the whale);
    # LOO day1 or day2: 9/20 = 450000.
    rows, eid = [], 0
    for d, k in [(1, 1), (2, 1), (3, 8)]:
        for i in range(10):
            et = "purchase" if i < k else "view"
            rows.append((eid, dt.datetime(2024, 1, d, 9), 1, et, 0.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["loo_cvr_sensitivity"](spark, str(tmp_path)).collect()
    assert r["cvr_ppm"] == 333_333
    assert (r["loo_min_ppm"], r["loo_max_ppm"]) == (100_000, 450_000)
    assert r["most_influential_day"] == "2024-01-03"
    assert r["max_influence_ppm"] == 233_333


def test_capture_recapture(spark, tmp_path):
    # n1=4 marked, n2=2 recaptured, overlap m=1 → N̂ = 8 > observed 5.
    h1 = dt.datetime(2024, 1, 5, 9)
    h2 = dt.datetime(2024, 1, 20, 9)
    rows = [(i, h1, u, "view", 0.0, "{}") for i, u in enumerate([1, 2, 3, 4])]
    rows += [(10, h2, 1, "view", 0.0, "{}"), (11, h2, 9, "view", 0.0, "{}")]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["capture_recapture_users"](spark, str(tmp_path)).collect()
    assert (r["n1"], r["n2"], r["n_both"], r["n_observed"]) == (4, 2, 1, 5)
    assert r["lincoln_petersen_estimate"] == 8


def test_split_half_reliability(spark, tmp_path):
    t = dt.datetime(2024, 1, 10, 12)
    rows, eid = [], 0
    # Even users: 1 purchase of 4 events (250000); odd: 2 of 4
    # (500000) → gap 250000, relative 333333.
    for u, k in [(2, 1), (1, 2)]:
        for i in range(4):
            et = "purchase" if i < k else "view"
            rows.append((eid, t, u, et, 0.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["split_half_reliability"](spark, str(tmp_path)).collect()
    assert (r["cvr_even_ppm"], r["cvr_odd_ppm"]) == (250_000, 500_000)
    assert (r["gap_ppm"], r["relative_gap_ppm"]) == (250_000, 333_333)


def _seg_events(spark, tmp_path, spec):
    """spec: list of (user_id, half, n_events, n_purchases)."""
    rows, eid = [], 0
    for u, half, n, k in spec:
        day = 5 if half == 1 else 20
        for i in range(n):
            et = "purchase" if i < k else "view"
            rows.append((eid, dt.datetime(2024, 1, day, 9), u, et, 0.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    _write(spark, tmp_path, "customer",
           [(1, "a", 0, 0.0, "SEGA"), (2, "b", 0, 0.0, "SEGB")],
           "c_custkey long, c_name string, c_nationkey long, "
           "c_acctbal double, c_mktsegment string")


def test_simpsons_paradox_fires(spark, tmp_path):
    # A: 80% → 70% (down); B: 5% → 0% (down); pooled 11.8% → 63.6%
    # (UP) because traffic migrated into the high-rate segment — the
    # textbook paradox, and the flag must fire.
    _seg_events(spark, tmp_path, [
        (1, 1, 10, 8), (1, 2, 100, 70),
        (2, 1, 100, 5), (2, 2, 10, 0),
    ])
    (r,) = QUERIES["simpsons_paradox_check"](spark, str(tmp_path)).collect()
    assert (r["n_segments"], r["n_up"], r["n_down"]) == (2, 0, 2)
    assert (r["pooled_direction"], r["paradox_flag"]) == (1, 1)


def test_mix_vs_rate_pure_mix_shift(spark, tmp_path):
    # Rates constant (A 50%, B 0%); mix shifts 50/50 → 75/25:
    # delta = +125000 ppm, within = 0, mix = +125000, residual 0.
    _seg_events(spark, tmp_path, [
        (1, 1, 100, 50), (1, 2, 150, 75),
        (2, 1, 100, 0), (2, 2, 50, 0),
    ])
    (r,) = QUERIES["mix_vs_rate_decomposition"](
        spark, str(tmp_path)
    ).collect()
    assert (r["delta_ppm"], r["within_ppm"], r["mix_ppm"], r["residual_ppm"]) == (
        125_000, 0, 125_000, 0,
    )


def test_session_duration_by_outcome(spark, tmp_path):
    t = dt.datetime(2024, 1, 10, 12)
    rows, eid = [], 0
    # Converted sessions last 100/200/300 s (p50 200); abandoned
    # last 10/20/30 s (p50 20) — the fast-abandon signature.
    for u, dur, conv in [(1, 100, True), (2, 200, True), (3, 300, True),
                         (4, 10, False), (5, 20, False), (6, 30, False)]:
        rows.append((eid, t, u, "view", 0.0, "{}")); eid += 1
        last = "purchase" if conv else "view"
        rows.append((eid, t + dt.timedelta(seconds=dur), u, last,
                     0.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["converted"]: (r["n_sessions"], r["p50_dur_s"], r["p90_dur_s"])
        for r in QUERIES["session_duration_by_outcome"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1] == (3, 200, 300)
    assert got[0] == (3, 20, 30)
