"""Planted-case tests for the round-7 analytics-depth queries:
Shapley axioms (efficiency + unanimity-game split), SRM flag
directions, declarative session capping, and censored churn-hazard
accounting. Each test drives the REGISTERED query callable — the
same code path the driver gates — never a reimplementation."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, minutes_after_t0, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [
            (eid, T0 + dt.timedelta(minutes=m), uid, et, val, "{}")
            for (eid, m, uid, et, val) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_shapley_unanimity_split_and_efficiency(spark, tmp_path):
    """Two conversions: one touched only by view (all credit → view),
    one touched by {click, view} (a unanimity game — Shapley splits
    it 50/50). Expected φ: view 1.5, click 0.5, others 0; and
    efficiency Σφ·24 = 24·v(full) exactly."""
    rows = [
        (1, 0, 1, "view", 0.0), (2, 1, 1, "purchase", 9.0),
        (3, 0, 2, "click", 0.0), (4, 2, 2, "view", 0.0),
        (5, 4, 2, "purchase", 9.0),
        (6, 0, 3, "click", 0.0),  # touched, never converts
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["channel"]: (r["phi_x24"], r["phi_milli"])
        for r in QUERIES["shapley_attribution"](spark, sf).collect()
    }
    assert got == {
        "click": (12, 500),
        "error": (0, 0),
        "signup": (0, 0),
        "view": (36, 1500),
    }
    assert sum(v[0] for v in got.values()) == 24 * 2  # efficiency: v(full)=2


def test_srm_flags_both_directions(spark, sf_dir):
    """On the driver fixture: the honest hash split must NOT flag; the
    planted half-of-arm-B telemetry loss MUST flag."""
    got = {
        r["scenario"]: (r["n_a"], r["n_b"], r["srm_flag"])
        for r in QUERIES["srm_check"](spark, sf_dir).collect()
    }
    assert set(got) == {"hash_split", "planted_loss"}
    assert got["hash_split"][2] == 0
    assert got["planted_loss"][2] == 1
    # the planted bug drops ~half of arm B
    n_a, n_b, _ = got["planted_loss"]
    assert n_b < n_a * 2 // 3


def test_capped_session_splits_buckets(spark, tmp_path):
    """One 40-minute session (gaps < 30 min) crosses three 15-min
    buckets → 3 sub-sessions; a singleton session stays 1."""
    rows = [
        (1, 0, 1, "view", 0.0), (2, 10, 1, "view", 0.0),
        (3, 20, 1, "view", 0.0), (4, 40, 1, "view", 0.0),
        (5, 0, 2, "view", 0.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["n_subsessions"]: (r["n_sessions"], r["n_capped_sessions"])
        for r in QUERIES["capped_session_splits"](spark, sf).collect()
    }
    assert got == {1: (1, 1), 3: (1, 3)}


def test_churn_hazard_censoring_accounting(spark, tmp_path):
    """max date = day 12 → cutoff = day 5. u1 churns at tenure 0, u2
    churns at tenure 2, u3 (active on day 12) is CENSORED at tenure 5
    — still at risk through t=5, never counted as a churn; rows end
    at the largest observed tenure."""
    day = 1440
    rows = [
        (1, 0, 1, "view", 0.0),                       # u1: day 0 only
        (2, 0, 2, "view", 0.0), (3, 2 * day, 2, "view", 0.0),  # u2: d0..d2
        (4, 0, 3, "view", 0.0), (5, 12 * day, 3, "view", 0.0),  # u3: censored
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["t"]: (r["n_at_risk"], r["n_churned"], r["hazard_ppm"])
        for r in QUERIES["churn_hazard_curve"](spark, sf).collect()
    }
    assert got == {
        0: (3, 1, 333333),
        1: (2, 0, 0),
        2: (2, 1, 500000),
        3: (1, 0, 0),
        4: (1, 0, 0),
        5: (1, 0, 0),
    }


def test_hits_mutual_reinforcement_beats_degree(spark, tmp_path):
    """Part A has the HIGHEST degree (3 one-off buyers) but parts
    B/C/D are bought by the two strong hubs — HITS ranks them above
    A. Exact integer scores hand-computed through both rounds."""
    orders = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3), (40, 4), (50, 5)],
        "o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        [(10, p) for p in (2, 3, 4)]
        + [(20, p) for p in (2, 3, 4)]
        + [(30, 1), (40, 1), (50, 1)],
        "l_orderkey long, l_partkey long",
    )
    orders.coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    lineitem.coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = [
        (r["part"], r["authority_e6"], r["rnk"])
        for r in QUERIES["hits_copurchase_authorities"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [
        (2, 1_000_000, 1),
        (3, 1_000_000, 2),
        (4, 1_000_000, 3),
        (1, 750_000, 4),
    ]


def test_ewma_integer_recursion(spark, tmp_path):
    """Three purchase days, α=0.2 in integer tenths:
    1000 → (2·2000+8·1000)//10 = 1200 → (2·500+8·1200)//10 = 1060."""
    day = 1440
    rows = [
        (1, 0, 1, "purchase", 10.0),
        (2, day, 1, "purchase", 20.0),
        (3, 2 * day, 1, "purchase", 5.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = [
        (r["day_n"], r["revenue_cents"], r["ewma_cents"])
        for r in QUERIES["ewma_daily_revenue"](spark, sf).collect()
    ]
    assert got == [(1, 1000, 1000), (2, 2000, 1200), (3, 500, 1060)]


def test_acf_alternating_series(spark, tmp_path):
    """Alternating 100/0-cent days: lag-1 autocorrelation is exactly
    −1 (acf2 −1 000 000 ppm), lag-2 exactly +1."""
    day = 1440
    rows = [
        (i + 1, i * day, 1, "purchase", 1.0 if i % 2 == 0 else 0.001)
        for i in range(8)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["lag"]: (r["n_pairs"], r["acf2_signed_ppm"])
        for r in QUERIES["acf_daily_revenue"](spark, sf).collect()
    }
    assert got[1] == (7, -1_000_000)
    assert got[2] == (6, 1_000_000)


def test_audio_rms_known_samples(spark, tmp_path):
    """'ABCD' → two LE int16 samples (16961, 17475), one 64-sample
    window; 'ABC' drops the trailing odd byte → one sample."""
    docs = spark.createDataFrame(
        [(1, "ABCD", "en", "s", 4), (2, "ABC", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (
            r["n_samples"],
            r["n_windows"],
            r["peak_energy"],
            r["peak_window"],
            r["mean_energy"],
        )
        for r in QUERIES["audio_rms_windows"](spark, str(tmp_path)).collect()
    }
    e1 = 16961 * 16961 + 17475 * 17475
    e2 = 16961 * 16961
    assert got == {1: (2, 1, e1, 0, e1), 2: (1, 1, e2, 0, e2)}


def test_audio_rms_sampleless_docs_excluded(spark, tmp_path):
    """Degenerate-payload contract: an empty-text and a 1-byte-text
    doc both have ns = 0 (no complete int16 sample) — the oracle's
    unnest(range(0)) drops them, and the Spark side must drop them
    too, not emit a (0, 0, 0, -1, 0) row."""
    docs = spark.createDataFrame(
        [(1, "", "en", "s", 0), (2, "A", "en", "s", 1),
         (3, "AB", "en", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_samples"], r["n_windows"])
        for r in QUERIES["audio_rms_windows"](spark, str(tmp_path)).collect()
    }
    assert got == {3: (1, 1)}, got


def test_lsh_recall_high_at_matched_threshold(spark, sf_dir):
    """16 bands × 4 rows puts the S-curve midpoint at ≈ 0.5 — recall
    against the J ≥ 0.5 ground truth must be high (≥ 90%) and truth
    must be non-empty (the fixture plants near-dups)."""
    row = QUERIES["lsh_recall_vs_truth"](spark, sf_dir).collect()[0]
    assert row["n_truth"] > 0
    assert row["n_hits"] <= min(row["n_truth"], row["n_candidates"])
    assert row["recall_ppm"] >= 900_000, row


def test_xml_roundtrip_lossless(spark, tmp_path):
    """to_xml → from_xml preserves key, priority and price exactly:
    the parsed-side aggregate equals the direct one, zero parse
    failures."""
    orders = spark.createDataFrame(
        [(1, "1-URGENT", 123.45), (2, "1-URGENT", 0.07), (3, "5-LOW", 99.99)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    orders.coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["o_orderpriority"]: (
            r["n_orders"],
            r["total_cents"],
            r["n_parse_failures"],
        )
        for r in QUERIES["xml_parse_roundtrip"](spark, str(tmp_path)).collect()
    }
    assert got == {"1-URGENT": (2, 12352, 0), "5-LOW": (1, 9999, 0)}


def test_theil_sen_ignores_outlier_day(spark, tmp_path):
    """Four days on a clean 1000-cents/day trend plus one 400 000-cent
    blowout: 6 of 10 pairwise slopes are exactly 1e6 milli-cents/day,
    so the median is untouched by the outlier (OLS would not be)."""
    day = 1440
    vals = [0.001, 10.0, 20.0, 30.0, 4000.0]
    rows = [
        (i + 1, i * day, 1, "purchase", v) for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["theil_sen_daily_trend"](spark, sf).collect()[0]
    assert (row["n_pairs"], row["slope_milli_p50"]) == (10, 1_000_000)


def test_holt_negative_trend_truncation(spark, tmp_path):
    """Decreasing series drives the trend NEGATIVE: day-3 trend is
    (-1644) div 10 = -164 under truncate-toward-zero — floor-division
    semantics would give -165, so this pins the exact integer-division
    contract the oracle relies on, plus the carried one-step
    forecasts."""
    day = 1440
    rows = [
        (1, 0, 1, "purchase", 30.0),
        (2, day, 1, "purchase", 20.0),
        (3, 2 * day, 1, "purchase", 10.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = [
        (
            r["day_n"],
            r["level_cents"],
            r["trend_cents"],
            r["forecast_cents"],
            r["abs_err_cents"],
        )
        for r in QUERIES["holt_linear_backtest"](spark, sf).collect()
    ]
    assert got == [
        (1, 3000, 0, None, None),
        (2, 2800, -60, 3000, 1000),
        (3, 2392, -164, 2740, 1740),
    ]


def test_bpe_merge_rounds_learns_expected_merges(spark, tmp_path):
    """Corpus 'aaab aaab ab': round 1 learns (a,a)→aa (4 pairs —
    overlaps count, leftmost-non-overlap merge turns 'aaab' into
    [aa,a,b] not [a,aa,b]); round 2 (a,b)→ab (3); round 3 the full
    word (aa,ab)→aaab (2)."""
    docs = spark.createDataFrame(
        [(1, "aaab aaab ab", "en", "s", 12)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = [
        (r["merge_rank"], r["pair_a"], r["pair_b"], r["token"], r["pair_count"])
        for r in QUERIES["bpe_merge_rounds"](spark, str(tmp_path)).collect()
    ]
    assert got == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 2),
    ]


def test_lsh_recall_truth_df_cap_excludes_hot_gram(spark, tmp_path):
    """Plant one trigram shared by 66 docs (df = 66 > 64): the truth
    side must drop it from the gram universe (n_hot_grams = 1), so
    the only truth pair is the identical-doc pair that shares COLD
    grams — a stopword-like gram alone must never manufacture truth
    pairs (nor explode the enumeration join at scale)."""
    rows = [
        (i, f"hot gram shared u{i} f{i} x{i}", "en", "s", 30)
        for i in range(1, 67)
    ] + [
        (100, "alpha beta gamma delta", "en", "s", 22),
        (101, "alpha beta gamma delta", "en", "s", 22),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    r = QUERIES["lsh_recall_vs_truth"](spark, str(tmp_path)).collect()[0]
    assert r["n_hot_grams"] == 1, r
    assert r["n_truth"] == 1, r
    assert r["n_hits"] == 1, r
    assert r["recall_ppm"] == 1_000_000, r
