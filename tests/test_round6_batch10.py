"""Planted-case tests: centroid distances (exact micro-unit
arithmetic + leaked-label detection), daily percentile rank rule,
heatmap shares."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def test_label_centroids_leak_detection(spark, tmp_path):
    # Labels 0 and 2 have IDENTICAL centroids ([1,0]) → d2 = 0, rank 1
    # (the leaked-label signal); label 1 sits at [0,1] → d2 = 2e12
    # micro² against both.
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 1),
        (4, [1.0, 0.0], 2),
    ]
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        (r["label_a"], r["label_b"]): (r["d2_micro"], r["closeness_rank"])
        for r in QUERIES["label_centroid_distances"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[(0, 2)] == (0, 1)
    assert got[(0, 1)] == (2_000_000_000_000, 2)
    assert got[(1, 2)] == (2_000_000_000_000, 3)


def test_daily_percentile_rank_rule(spark, tmp_path):
    # One day, values 0.01..1.00 (cents 1..100): p50 = 50, p90 = 90.
    t = dt.datetime(2024, 1, 10, 9)
    rows = [
        (i, t + dt.timedelta(seconds=i), 1, "view", (i + 1) / 100.0, "{}")
        for i in range(100)
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["daily_percentile_bands"](spark, str(tmp_path)).collect()
    assert (r["n"], r["p50_cents"], r["p90_cents"]) == (100, 50, 90)


def test_activity_heatmap_shares(spark, tmp_path):
    mon = dt.datetime(2024, 1, 8, 12, 30)   # Monday → dow 0
    tue = dt.datetime(2024, 1, 9, 8, 15)    # Tuesday → dow 1
    rows = [(i, mon, 1, "view", 0.0, "{}") for i in range(3)]
    rows.append((9, tue, 1, "view", 0.0, "{}"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r["dow"], r["hour"]): (r["n_events"], r["share_ppm"])
        for r in QUERIES["activity_heatmap_dow_hour"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {(0, 12): (3, 750_000), (1, 8): (1, 250_000)}
