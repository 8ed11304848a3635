"""Planted-case tests for Markov removal-effect attribution and the
co-purchase degree distribution: hand-computed absorption
probabilities, the no-renormalization removal convention, and
histogram/CCDF arithmetic."""

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


def test_markov_removal_hand_computed(spark, tmp_path):
    # u1: a→purchase; u2: a→b→purchase; u3: b (no purchase).
    # T(ppm): START→a 666666, START→b 333333; a→CONV 500000,
    # a→b 500000; b→CONV 500000, b→NULL 500000.
    # p(b)=500000; p(a)=750000; p(START)=666666 (converges round 3,
    # integer-exact thereafter).
    # remove a (edges dropped, NOT renormalized): p=333333·0.5=166666
    #   → effect = 1e6 − 166666e6//666666 = 1e6 − 249999 = 750001.
    # remove b: p = 666666·0.5 = 333333 → effect = 500000 exactly.
    def ev(eid, uid, minute, etype):
        return (eid, T0 + dt.timedelta(minutes=minute), uid, etype, 0.0, "{}")

    rows = [
        ev(1, 1, 0, "a"), ev(2, 1, 1, "purchase"),
        ev(3, 2, 0, "a"), ev(4, 2, 1, "b"), ev(5, 2, 2, "purchase"),
        ev(6, 3, 0, "b"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["scenario"]: (r["p_conv_ppm"], r["removal_effect_ppm"])
        for r in QUERIES["markov_removal_attribution"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["FULL"] == (666_666, 0)
    assert got["a"] == (166_666, 750_001)
    assert got["b"] == (333_333, 500_000)


def test_markov_post_purchase_events_dropped(spark, tmp_path):
    # A same-session event AFTER the purchase must not create
    # transitions (the path is truncated at first conversion):
    # u1: a → purchase → b  ⇒ only START→a, a→CONV exist; channel b
    # never appears as a scenario.
    def ev(eid, uid, minute, etype):
        return (eid, T0 + dt.timedelta(minutes=minute), uid, etype, 0.0, "{}")

    rows = [ev(1, 1, 0, "a"), ev(2, 1, 1, "purchase"), ev(3, 1, 2, "b")]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["scenario"]: (r["p_conv_ppm"], r["removal_effect_ppm"])
        for r in QUERIES["markov_removal_attribution"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {"FULL", "a"}
    assert got["FULL"] == (1_000_000, 0)
    assert got["a"] == (0, 1_000_000)


def test_degree_distribution_support_filter(spark, tmp_path):
    # parts 1-2 share orders 10,11 (edge); 1-3 share 12,13 (edge);
    # 2-3 share only 14 (below support 2 → no edge).
    # degrees: part1=2, part2=1, part3=1 →
    # histogram {1: 2 nodes, 2: 1 node}; CCDF: ≥2 → 1, ≥1 → 3.
    t = dt.datetime(2024, 1, 1)
    li = []
    ln = 1
    for o, parts in [
        (10, [1, 2]), (11, [1, 2]), (12, [1, 3]), (13, [1, 3]),
        (14, [2, 3]),
    ]:
        for p in parts:
            li.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", t))
            ln += 1
    _write(
        spark, tmp_path, "lineitem", li,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    got = {
        r["degree"]: (r["n_nodes"], r["n_nodes_at_least"])
        for r in QUERIES["degree_distribution_copurchase"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {2: (1, 1), 1: (2, 3)}


def test_weighted_sssp_prefers_strong_ties(spark, tmp_path):
    # Graph: 1-2 support 5 (w=200), 2-3 support 5 (w=200),
    # 1-3 support 2 (w=500): the two-hop strong path (400) beats the
    # direct weak edge (500) — weighted distance must be 400.
    t = dt.datetime(2024, 1, 1)
    li, ln = [], 1
    orders = []
    oid = 1
    for _ in range(5):
        orders.append((oid, [1, 2])); oid += 1
        orders.append((oid, [2, 3])); oid += 1
    for _ in range(2):
        orders.append((oid, [1, 3])); oid += 1
    for o, parts in orders:
        for p in parts:
            li.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", t))
            ln += 1
    _write(
        spark, tmp_path, "lineitem", li,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    got = {
        r["node"]: r["dist"]
        for r in QUERIES["copurchase_weighted_distances"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1: 0, 2: 200, 3: 400}


def test_edge_density_thresholds(spark, tmp_path):
    # supports: (1,2)=3, (1,3)=1 → thresholds 1:2 edges, 2:1, 3:1,
    # 4: no rows (empty groups don't emit).
    t = dt.datetime(2024, 1, 1)
    li, ln = [], 1
    basket_orders = [(1, [1, 2]), (2, [1, 2]), (3, [1, 2]), (4, [1, 3])]
    for o, parts in basket_orders:
        for p in parts:
            li.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", t))
            ln += 1
    _write(
        spark, tmp_path, "lineitem", li,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    got = {
        r["support_threshold"]: (r["n_edges"], r["edge_share_ppm"])
        for r in QUERIES["edge_density_by_support_threshold"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1: (2, 1_000_000), 2: (1, 500_000), 3: (1, 500_000)}
