"""Planted-case tests: time-decay weight/share arithmetic, streak
islands, association-rule confidence/lift/support-floor, FK audit
orphan counts."""

from __future__ import annotations

import datetime as dt

import pytest

from web_analytics_visits_re_processing_spark.plans import QUERIES

T0 = dt.datetime(2024, 1, 1)


def _write(spark, tmp_path, name, rows, schema):
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))


def test_time_decay_weights(spark, tmp_path):
    # view 2 h before conversion (weight 2^22), click 30 min before
    # (age_h = 0 -> weight 2^24): shares 1/5 and 4/5 exactly.
    rows = [
        (1, T0, 1, "view", 0.0, "{}"),
        (2, T0 + dt.timedelta(minutes=90), 1, "click", 0.0, "{}"),
        (3, T0 + dt.timedelta(minutes=120), 1, "purchase", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    got = {
        r["touch_type"]: r["total_credit_ppm"]
        for r in QUERIES["time_decay_attribution"](spark, str(tmp_path)).collect()
    }
    assert got == {"view": 200_000, "click": 800_000}


def test_longest_daily_streaks(spark, tmp_path):
    day = dt.timedelta(days=1)
    active = [0, 1, 2, 6, 7]  # runs of 3 and 2
    rows = [(i, T0 + d * day, 1, "view", 0.0, "{}") for i, d in enumerate(active)]
    rows.append((99, T0, 2, "view", 0.0, "{}"))
    _write(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    got = {
        r["user_id"]: (r["n_active_days"], r["longest_streak"])
        for r in QUERIES["longest_daily_streaks"](spark, str(tmp_path)).collect()
    }
    assert got == {1: (5, 3), 2: (1, 1)}


def test_association_rules_confidence_and_floor(spark, tmp_path):
    # Orders 1-3 contain parts {1,2}; order 4 contains {1,3}.
    # Pair (1,2): support 3 (kept). Pair (1,3): support 1 (dropped).
    rows = [(o, p) for o in (1, 2, 3) for p in (1, 2)] + [(4, 1), (4, 3)]
    _write(spark, tmp_path, "lineitem",
           [(o, p, 1.0, 1.0) for o, p in rows],
           "l_orderkey long, l_partkey long, l_quantity double, "
           "l_extendedprice double")
    out = QUERIES["association_rules_pairs"](spark, str(tmp_path)).collect()
    rules = {(r["antecedent"], r["consequent"]): r for r in out}
    assert set(rules) == {(1, 2), (2, 1)}
    # s_1 = 4 orders, s_2 = 3, N = 4.
    assert rules[(1, 2)]["confidence_ppm"] == 750_000  # 3/4
    assert rules[(2, 1)]["confidence_ppm"] == 1_000_000  # 3/3
    assert rules[(1, 2)]["lift_x1e6"] == 1_000_000  # 3*4/(4*3)


def test_referential_integrity_orphans(spark, tmp_path):
    _write(spark, tmp_path, "region", [(0, "R")], "r_regionkey int, r_name string")
    _write(spark, tmp_path, "nation", [(0, "N", 0), (1, "M", 9)],
           "n_nationkey int, n_name string, n_regionkey int")
    _write(spark, tmp_path, "customer", [(1, "c", 0, 0.0, "S")],
           "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
           "c_mktsegment string")
    _write(spark, tmp_path, "supplier", [(1, "s", 7)],
           "s_suppkey long, s_name string, s_nationkey int")
    _write(spark, tmp_path, "orders",
           [(10, 1, "O", 1.0, T0, "P"), (11, 99, "O", 1.0, T0, "P")],
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    _write(spark, tmp_path, "lineitem", [(10, 1, 1.0, 1.0), (55, 1, 1.0, 1.0)],
           "l_orderkey long, l_partkey long, l_quantity double, "
           "l_extendedprice double")
    got = {
        r["chk"]: r["n_violations"]
        for r in QUERIES["referential_integrity_audit"](spark, str(tmp_path)).collect()
    }
    assert got == {
        "lineitem_orphan_orders": 1,      # orderkey 55
        "orders_orphan_customers": 1,     # custkey 99
        "customer_orphan_nations": 0,
        "supplier_orphan_nations": 1,     # nationkey 7
        "nation_orphan_regions": 1,       # regionkey 9
        "orders_without_lineitems": 1,    # order 11
    }



def test_also_bought_top3_ranking(spark, tmp_path):
    # part 1 shares 3 orders with 2, 2 orders with 3, 2 orders with 4,
    # 1 order with 5 (below support floor).
    rows = []
    for o in (1, 2, 3):
        rows += [(o, 1), (o, 2)]
    for o in (4, 5):
        rows += [(o, 1), (o, 3)]
    for o in (6, 7):
        rows += [(o, 1), (o, 4)]
    rows += [(8, 1), (8, 5)]
    _write(spark, tmp_path, "lineitem",
           [(o, p, 1.0, 1.0) for o, p in rows],
           "l_orderkey long, l_partkey long, l_quantity double, "
           "l_extendedprice double")
    out = QUERIES["also_bought_top3"](spark, str(tmp_path)).collect()
    part1 = sorted(
        [(r["rk"], r["also_bought"], r["n_shared_orders"]) for r in out
         if r["part"] == 1]
    )
    # rank 1 = part 2 (3 orders); ranks 2,3 = parts 3,4 (2 each,
    # id tiebreak); part 5 (1 order) below the floor.
    assert part1 == [(1, 2, 3), (2, 3, 2), (3, 4, 2)]
    assert all(r["part"] != 5 for r in out)


def test_ab_readout_per_user_unit(spark, tmp_path):
    # Variant 0: users 2 (converted, 3 purchases!) and 4 (not).
    # Variant 1: user 1 (converted once).
    # Per-USER conversion: v0 = 1/2 -> 500000 ppm, v1 = 1/1.
    rows = [
        (1, T0, 2, "purchase", 1.0, "{}"),
        (2, T0, 2, "purchase", 1.0, "{}"),
        (3, T0, 2, "purchase", 1.0, "{}"),
        (4, T0, 4, "view", 0.0, "{}"),
        (5, T0, 1, "purchase", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    got = {r["variant"]: r for r in
           QUERIES["ab_test_readout"](spark, str(tmp_path)).collect()}
    assert got[0]["n_users"] == 2 and got[0]["n_converters"] == 1
    assert got[0]["conv_ppm"] == 500_000  # NOT 3/4 of events
    assert got[1]["conv_ppm"] == 1_000_000


def test_product_communities_lift_filter(spark, tmp_path):
    # Cluster A = {1,2} (3 shared orders), cluster B = {10,11} (3
    # shared orders). Part 99 appears in EVERY order (the bestseller):
    # its pairs have lift <= 1 and must NOT weld A and B together.
    rows = []
    for o in (1, 2, 3):
        rows += [(o, 1), (o, 2), (o, 99)]
    for o in (4, 5, 6):
        rows += [(o, 10), (o, 11), (o, 99)]
    _write(spark, tmp_path, "lineitem",
           [(o, p, 1.0, 1.0) for o, p in rows],
           "l_orderkey long, l_partkey long, l_quantity double, "
           "l_extendedprice double")
    out = QUERIES["product_communities"](spark, str(tmp_path)).collect()
    comm = {r["part"]: r["community"] for r in out}
    assert comm[1] == comm[2] == 1
    assert comm[10] == comm[11] == 10
    assert 99 not in comm  # bestseller: no positive-lift edge survives
    sizes = {r["part"]: r["community_size"] for r in out}
    assert sizes[1] == 2 and sizes[10] == 2


def test_equal_freq_bins_deciles(spark, tmp_path):
    rows = [(i, T0, 1, "view", i / 100.0, "{}") for i in range(1, 21)]
    _write(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    out = QUERIES["equal_freq_feature_bins"](spark, str(tmp_path)).collect()
    per = {r["decile"]: (r["n"], r["lo_cents"], r["hi_cents"]) for r in out}
    assert len(per) == 10 and all(n == 2 for n, _, _ in per.values())
    assert per[1] == (2, 1, 2) and per[10] == (2, 19, 20)


def test_weighted_sample_extremes(spark, tmp_path):
    # max-price order has w_ppm = 1e6 -> always kept; zero-price order
    # has w_ppm = 0 -> never kept.
    _write(spark, tmp_path, "orders",
           [(1, 1, "O", 100.0, T0, "MAX"), (2, 1, "O", 0.0, T0, "ZERO")],
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    got = {r["o_orderpriority"]: (r["n_kept"], r["kept_value_cents"])
           for r in QUERIES["weighted_sample_orders"](spark, str(tmp_path)).collect()}
    assert got["MAX"] == (1, 10000)
    assert got["ZERO"] == (0, 0)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
