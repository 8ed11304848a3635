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
