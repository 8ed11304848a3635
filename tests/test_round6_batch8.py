"""Planted-case tests: item-cosine bestseller demotion, entry-type
conversion rates, event-mix impurity arithmetic, Morton interleave
bit-exactness + bucket locality."""

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
T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def _li(orders_parts):
    t, rows, ln = dt.datetime(2024, 1, 1), [], 1
    for o, parts in orders_parts:
        for p in parts:
            rows.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", t))
            ln += 1
    return rows


def test_item_cosine_demotes_bestseller(spark, tmp_path):
    # Part 1 (anchor, 10 orders). Niche part 2: 2 orders, both with
    # part 1 → cos² = 2²·1e6/(10·2) = 200000. Bestseller part 3: 10
    # orders, 2 shared with part 1 → cos² = 2²·1e6/(10·10) = 40000.
    # Raw co-occurrence ties them (2 vs 2); cosine ranks niche first.
    orders = [(o, [1, 2, 3]) for o in range(2)]        # shared basket
    orders += [(o, [1]) for o in range(2, 10)]          # part 1 → c=10
    orders += [(o, [3]) for o in range(10, 18)]         # part 3 → c=10
    _write(spark, tmp_path, "lineitem", _li(orders), LI_SCHEMA)
    rows = QUERIES["item_cosine_similarity_top3"](
        spark, str(tmp_path)
    ).collect()
    got = {
        (r["item"], r["other"]): (r["cos2_ppm"], r["rnk"]) for r in rows
    }
    assert got[(1, 2)] == (200_000, 1)
    assert got[(1, 3)][1] == 2
    assert got[(1, 3)][0] < 200_000


def test_session_conversion_by_entry(spark, tmp_path):
    # u1 session entry=view → purchase (converted); u2 entry=view, no
    # purchase; u3 entry=click → purchase. view: 1/2 = 500000 ppm.
    def ev(eid, uid, minute, etype):
        return (eid, T0 + dt.timedelta(minutes=minute), uid, etype, 0.0, "{}")

    rows = [
        ev(1, 1, 0, "view"), ev(2, 1, 1, "purchase"),
        ev(3, 2, 0, "view"), ev(4, 2, 1, "click"),
        ev(5, 3, 0, "click"), ev(6, 3, 1, "purchase"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["entry_type"]: (r["n_sessions"], r["n_converted"], r["cvr_ppm"])
        for r in QUERIES["session_conversion_by_entry"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"view": (2, 1, 500_000), "click": (1, 1, 1_000_000)}


def test_user_event_mix_impurity_extremes(spark, tmp_path):
    def ev(eid, uid, etype):
        return (eid, T0, uid, etype, 0.0, "{}")

    rows = [ev(1, 1, "view"), ev(2, 1, "view"),           # pure → 0
            ev(3, 2, "view"), ev(4, 2, "view"),
            ev(5, 2, "click"), ev(6, 2, "click")]         # 50/50 → 500000
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["user_id"]: (r["n_events"], r["n_types"], r["impurity_ppm"])
        for r in QUERIES["user_event_mix_impurity"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1] == (2, 1, 0)
    assert got[2] == (4, 2, 500_000)


def _morton(x, y):
    z = 0
    for b in range(16):
        z += ((x >> b) & 1) << (2 * b)
        z += ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_interleave_and_bucket_locality(spark, tmp_path):
    # Two clusters far apart in custkey: all of cluster A (custkey
    # 0..3) shares no z-bucket with cluster B (custkey 40000..40003);
    # within a bucket the x-span stays within the cluster.
    t0 = dt.datetime(1970, 1, 3)  # epoch day 2
    orders = []
    for i, ck in enumerate([0, 1, 2, 3, 40000, 40001, 40002, 40003]):
        orders.append((i, ck, "O", 1.0, t0, "1-URGENT"))
    _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    rows = QUERIES["zorder_locality_stats"](spark, str(tmp_path)).collect()
    by_bucket = {r["z_bucket"]: r for r in rows}
    expected_buckets = {_morton(ck, 2) // (1 << 26) for ck in [0, 40000]}
    assert set(by_bucket) == expected_buckets
    for r in rows:
        assert r["max_x"] - r["min_x"] <= 3  # cluster-tight zone maps
        assert r["min_y"] == r["max_y"] == 2
    assert sum(r["n_orders"] for r in rows) == 8
