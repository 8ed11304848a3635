"""Planted-case tests: winsorized clamp arithmetic, growth-streak
islands, asymmetric containment."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def test_winsorized_clamp(spark, tmp_path):
    # cents 1..10: lo = p10 boundary 1, hi = p90 boundary 9; the 10
    # clamps to 9 → sum 54 → mean 5,400,000 ppm.
    t = dt.datetime(2024, 1, 10)
    rows = [
        (i, t, 1, "view", (i + 1) / 100.0, "{}") for i in range(10)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["winsorized_mean_by_type"](spark, str(tmp_path)).collect()
    assert (r["n"], r["lo_cents"], r["hi_cents"]) == (10, 1, 9)
    assert r["winsorized_mean_ppm"] == 5_400_000


def test_growth_streak_islands(spark, tmp_path):
    # Weekly revenue 10,20,30,25,30,40,50 → up-runs of 2 then 3:
    # longest 3, spanning weeks 5..7 (1-indexed).
    w0 = dt.datetime(2024, 1, 1, 12)
    cents = [10, 20, 30, 25, 30, 40, 50]
    rows = [
        (i, w0 + dt.timedelta(weeks=i), 1, "purchase", c / 100.0, "{}")
        for i, c in enumerate(cents)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["longest_growth_streak_weeks"](
        spark, str(tmp_path)
    ).collect()

    def wk(i):
        ts = w0 + dt.timedelta(weeks=i)
        return int(ts.timestamp() * 1_000_000) // 604_800_000_000

    assert r["longest_streak"] == 3
    assert (r["streak_from_week"], r["streak_to_week"]) == (wk(4), wk(6))
    assert r["n_weeks"] == 7


def test_growth_streak_all_declining(spark, tmp_path):
    w0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        (i, w0 + dt.timedelta(weeks=i), 1, "purchase", (30 - i) / 100.0, "{}")
        for i in range(3)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["longest_growth_streak_weeks"](
        spark, str(tmp_path)
    ).collect()
    assert r["longest_streak"] == 0
    assert r["streak_from_week"] is None
    assert r["n_weeks"] == 3


def test_containment_asymmetry(spark, tmp_path):
    # A (3 grams) fully inside B (5 grams): A→B = 1e6, B→A = 600000;
    # C unrelated contributes nothing.
    docs = [
        (1, "a b c d e f g", "en", "s", 1),
        (2, "a b c d e f g h i", "en", "s", 1),
        (3, "q r s t u v w x y", "en", "s", 1),
    ]
    _write(spark, tmp_path, "documents", docs, DOC_SCHEMA)
    got = {
        (r["doc_id"], r["container_id"]): (
            r["n_grams"], r["shared"], r["containment_ppm"],
        )
        for r in QUERIES["ngram_containment_pairs"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        (1, 2): (3, 3, 1_000_000),
        (2, 1): (5, 3, 600_000),
    }


def test_fulfillment_sla_negative_and_median(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    _write(
        spark, tmp_path, "orders",
        [(1, 1, "O", 1.0, t0, "1-URGENT"),
         (2, 1, "O", 1.0, t0, "1-URGENT"),
         (3, 1, "O", 1.0, t0, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    # order 1: ships day 10 (first of 10/40); order 2: day 50 (miss);
    # order 3: day −5 (data-quality negative). median latency = 10.
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0 + dt.timedelta(days=10)),
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", t0 + dt.timedelta(days=40)),
        (2, 1, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", t0 + dt.timedelta(days=50)),
        (3, 1, 1, 4, 1.0, 1.0, 0.0, 0.0, "N", "O", t0 - dt.timedelta(days=5)),
    ]
    _write(spark, tmp_path, "lineitem", li, li_schema)
    (r,) = QUERIES["fulfillment_latency_sla"](spark, str(tmp_path)).collect()
    assert (r["n_orders"], r["n_negative"], r["n_within_30d"]) == (3, 1, 1)
    assert r["sla_ppm"] == 333_333
    assert r["p50_latency_days"] == 10


def test_post_signup_none_bucket(spark, tmp_path):
    t = dt.datetime(2024, 1, 10, 12)
    rows = [
        # signup → view 1 min later (counts as 'view')
        (1, t, 1, "signup", 0.0, "{}"),
        (2, t + dt.timedelta(minutes=1), 1, "view", 0.0, "{}"),
        # signup then nothing for 2 h → NONE
        (3, t, 2, "signup", 0.0, "{}"),
        (4, t + dt.timedelta(hours=2), 2, "view", 0.0, "{}"),
        # signup as the user's last event ever → NONE
        (5, t, 3, "signup", 0.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["next_type"]: (r["n"], r["share_ppm"])
        for r in QUERIES["post_signup_next_actions"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"view": (1, 333_333), "NONE": (2, 666_666)}


def test_join_fanout_hot_key(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    # customer->orders: cust 1 has 8 orders, custs 2..4 have 1 each
    # (mean 11/4 → hot rule: c·4 > 2·11 ⇒ c > 5.5 ⇒ only cust 1).
    orders = [(i, 1, "O", 1.0, t0, "1-URGENT") for i in range(8)]
    orders += [(10 + j, 1 + j, "O", 1.0, t0, "1-URGENT") for j in range(1, 4)]
    _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    _write(
        spark, tmp_path, "lineitem",
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
         (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", t0)],
        li_schema,
    )
    got = {
        r["edge"]: (r["n_keys"], r["n_rows"], r["max_fanout"], r["n_hot_keys"])
        for r in QUERIES["join_fanout_audit"](spark, str(tmp_path)).collect()
    }
    assert got["customer->orders"] == (4, 11, 8, 1)
    assert got["orders->lineitem"] == (1, 2, 2, 0)


def test_signup_purchase_latency_rules(spark, tmp_path):
    t = dt.datetime(2024, 1, 10, 12)
    rows = [
        # u1: signup, purchase 10 min later.
        (1, t, 1, "signup", 0.0, "{}"),
        (2, t + dt.timedelta(minutes=10), 1, "purchase", 0.0, "{}"),
        # u2: purchase BEFORE signup only → not converted.
        (3, t, 2, "signup", 0.0, "{}"),
        (4, t - dt.timedelta(minutes=5), 2, "purchase", 0.0, "{}"),
        # u3: signup, purchase 30 min later.
        (5, t, 3, "signup", 0.0, "{}"),
        (6, t + dt.timedelta(minutes=30), 3, "purchase", 0.0, "{}"),
        # u4: signup only.
        (7, t, 4, "signup", 0.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["signup_to_purchase_latency"](
        spark, str(tmp_path)
    ).collect()
    assert (r["n_signup_users"], r["n_converted"], r["n_not_converted"]) == (
        4, 2, 2,
    )
    assert (r["p50_min"], r["p90_min"]) == (10, 30)
