"""Planted-case tests for the ML-evaluation tier: AUC extremes, the
hand-computed 0.75 case, midrank tie handling, and gains/lift
arithmetic."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
T0 = dt.datetime(2024, 1, 10, 12)


def _write_users(spark, tmp_path, users):
    """users: list of (user_id, n_clicks, purchased)."""
    rows, eid = [], 0
    for uid, clicks, purchased in users:
        for _ in range(clicks):
            rows.append((eid, T0, uid, "click", 0.0, "{}")); eid += 1
        if purchased:
            rows.append((eid, T0, uid, "purchase", 0.0, "{}")); eid += 1
        rows.append((eid, T0, uid, "view", 0.0, "{}")); eid += 1  # anchor
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))


def _auc(spark, tmp_path):
    (r,) = QUERIES["auc_mann_whitney"](spark, str(tmp_path)).collect()
    return r


def test_auc_perfect_separation(spark, tmp_path):
    _write_users(spark, tmp_path, [
        (1, 5, True), (2, 5, True), (3, 0, False), (4, 0, False),
    ])
    r = _auc(spark, tmp_path)
    assert (r["npos"], r["nneg"], r["auc_ppm"]) == (2, 2, 1_000_000)


def test_auc_hand_computed_075(spark, tmp_path):
    # pos scores {3,1}, neg {2,0}: 3 of 4 pairs ordered → 0.75.
    _write_users(spark, tmp_path, [
        (1, 3, True), (2, 1, True), (3, 2, False), (4, 0, False),
    ])
    assert _auc(spark, tmp_path)["auc_ppm"] == 750_000


def test_auc_all_tied_is_half(spark, tmp_path):
    # Identical scores → midranks make AUC exactly 0.5.
    _write_users(spark, tmp_path, [
        (1, 2, True), (2, 2, False), (3, 2, True), (4, 2, False),
    ])
    assert _auc(spark, tmp_path)["auc_ppm"] == 500_000


def test_gains_capture_and_lift(spark, tmp_path):
    # 10 users, scores 10..1, converters = the two top scorers:
    # decile 1 captures 50%, decile 2 cumulates to 100%;
    # decile-1 lift = (1·10·1e6)//(1·2) = 5e6; zero decile lift = 0.
    users = [(u, 11 - u, u <= 2) for u in range(1, 11)]
    _write_users(spark, tmp_path, users)
    got = {
        r["decile"]: (r["n_users"], r["n_pos"], r["cum_capture_ppm"], r["lift_ppm"])
        for r in QUERIES["score_decile_gains"](spark, str(tmp_path)).collect()
    }
    assert got[1] == (1, 1, 500_000, 5_000_000)
    assert got[2] == (1, 1, 1_000_000, 5_000_000)
    assert got[10] == (1, 0, 1_000_000, 0)
    assert len(got) == 10


def test_ann_recall_invariants(spark, sf_dir):
    rows = QUERIES["ann_recall_at_5"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_hit"] <= 5
        assert r["recall_ppm"] == r["n_hit"] * 1_000_000 // 5
