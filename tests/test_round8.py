"""Planted-case tests for the round-8 additions: the Kaplan–Meier
integer recursion (hand-computed survival through a censored cohort)
and Apriori-pruned GSP (a fixture where the (a,c) prune removes
candidates the bare F2⋈F2 join would have scanned). Each test drives
the REGISTERED query callable — the same code path the driver gates."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, minutes_after_t0, user_id, event_type, value,
    props)"""
    df = spark.createDataFrame(
        [
            (eid, T0 + dt.timedelta(minutes=m), uid, et, val, props)
            for (eid, m, uid, et, val, props) in rows
        ],
        EV_SCHEMA,
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_km_survival_hand_computed(spark, tmp_path):
    """Same cohort as the churn-hazard test (u1 churns at t=0, u2 at
    t=2, u3 censored at t=5): S(0) = 1e6 − 333333 = 666667;
    S(1) = 666667 (h=0); S(2) = 666667·500000 div 1e6 = 333333 (the
    truncating step — a float product would carry .5); S(3..5) stay
    333333."""
    day = 1440
    rows = [
        (1, 0, 1, "view", 0.0, "{}"),
        (2, 0, 2, "view", 0.0, "{}"), (3, 2 * day, 2, "view", 0.0, "{}"),
        (4, 0, 3, "view", 0.0, "{}"), (5, 12 * day, 3, "view", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["t"]: (r["n_at_risk"], r["hazard_ppm"], r["survival_ppm"])
        for r in QUERIES["km_survival_curve"](spark, sf).collect()
    }
    assert got == {
        0: (3, 333333, 666667),
        1: (2, 0, 666667),
        2: (2, 500000, 333333),
        3: (1, 0, 333333),
        4: (1, 0, 333333),
        5: (1, 0, 333333),
    }


def test_km_monotone_and_consistent_with_hazard(spark, sf_dir):
    """On the driver fixture: S is non-increasing, bounded by
    (0, 1e6], and each step equals the integer product rule applied
    to the gated hazard table — the recursion and the hazard gate can
    never drift apart."""
    rows = sorted(
        QUERIES["km_survival_curve"](spark, sf_dir).collect(),
        key=lambda r: r["t"],
    )
    assert rows, "empty survival curve"
    prev = 1_000_000
    for r in rows:
        expected = (prev * (1_000_000 - r["hazard_ppm"])) // 1_000_000
        assert r["survival_ppm"] == expected, r
        assert 0 < r["survival_ppm"] <= prev
        prev = r["survival_ppm"]


def _gsp_fixture(spark, tmp_path):
    """4 users, each with symbol sequence [b, c, a, b] where
    b=view:0 (k<25), c=click:1 (25≤k<50), a=purchase:2 (50≤k<75).
    min support 85% of 4 users → a pattern must hit ALL 4."""
    rows, eid = [], 0
    for u in range(1, 5):
        for m, (et, k) in enumerate(
            [("view", 3), ("click", 30), ("purchase", 60), ("view", 9)]
        ):
            rows.append((eid, m, u, et, 0.0, '{"k": %d}' % k))
            eid += 1
    return _write_events(spark, tmp_path, rows)


def test_gsp_apriori_prunes_and_counts_exactly(spark, tmp_path):
    """Hand-enumerated lattice for [b,c,a,b]: F1 = 3 symbols,
    F2 = 6 of 9 ordered pairs, the GSP join (F2⋈F2 on the middle
    symbol) yields 13 candidates of which the Apriori (a,c)-prune
    removes 3 — e.g. (a,b)+(b,c) dies because (a,c) is infrequent —
    so n_c3 = 10; of those exactly 4 are frequent: (b,a,b), (b,c,a),
    (b,c,b), (c,a,b), each in all 4 sequences."""
    sf = _gsp_fixture(spark, tmp_path)
    rows = QUERIES["gsp_apriori_sequences"](spark, sf).collect()
    assert all(
        (r["n_f1"], r["n_f2"], r["n_c3"]) == (3, 6, 10) for r in rows
    ), rows
    got = {
        (r["a"], r["b"], r["c"]): (r["support"], r["support_ppm"])
        for r in rows
    }
    b, c, a = "view:0", "click:1", "purchase:2"
    assert got == {
        (b, a, b): (4, 1_000_000),
        (b, c, a): (4, 1_000_000),
        (b, c, b): (4, 1_000_000),
        (c, a, b): (4, 1_000_000),
    }


def test_gsp_fixture_pruning_is_selective(spark, sf_dir):
    """Non-degeneracy at the smallest fixture: F2 must be a STRICT
    subset of F1×F1 (the 85% threshold actually cuts) and C3 a strict
    subset of F1³ — an all-or-none threshold would make the Apriori
    machinery decorative."""
    rows = QUERIES["gsp_apriori_sequences"](spark, sf_dir).collect()
    assert rows, "no frequent 3-sequences at sf0.001"
    n_f1, n_f2, n_c3 = rows[0]["n_f1"], rows[0]["n_f2"], rows[0]["n_c3"]
    assert 0 < n_f2 < n_f1 * n_f1, (n_f1, n_f2)
    assert 0 < n_c3 < n_f1 ** 3, (n_f1, n_c3)
    assert len(rows) <= n_c3
