"""Planted-case tests for the round-9 additions. Each test drives the
REGISTERED query callable — the same code path the driver gates —
against a hand-built fixture whose expected output is pinned by hand,
plus direct decoder tests for behavior the fixture generation rule
can never exercise."""

from __future__ import annotations

from web_analytics_visits_re_processing_spark.plans import QUERIES

# --- stereo channel profile (header-honoring demux) --------------------------


def test_audio_stereo_known_samples(spark, tmp_path):
    """Hand-decoded docs through the full with_wav_blob → demux path.
    'ABCD' (4 bytes → channels 1): mono samples 'AB' = 0x4241 =
    +16961 and 'CD' = 0x4443 = +17475 → dual-mono, nf = 2, dc = 34436
    both sides, eq_ppm = 1e6. 'ABCDE' (5 bytes → channels 2): one
    (L, R) frame = (16961, 17475), dangling 'E' dropped at the FRAME
    boundary, eq = 0. 'ABABX' (5 bytes → stereo): L = R = 16961 →
    the fake-stereo detector reads eq_ppm = 1e6 on a genuinely
    2-channel doc. 'ABC' (3 bytes → stereo): ns = 1 sample but ZERO
    full 4-byte frames → excluded (sample-level truncation alone
    would wrongly keep it); 'A' likewise."""
    docs = spark.createDataFrame(
        [(1, "ABCD", "en", "s", 4), (2, "ABCDE", "en", "s", 5),
         (3, "ABABX", "en", "s", 5), (4, "ABC", "en", "s", 3),
         (5, "A", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["channels"], r["n_frames"], r["dc_l"], r["dc_r"],
                      r["peak_l"], r["peak_r"], r["eq_frames"], r["eq_ppm"])
        for r in QUERIES["audio_stereo_channel_profile"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        1: (1, 2, 34_436, 34_436, 17_475, 17_475, 2, 1_000_000),
        2: (2, 1, 16_961, 17_475, 16_961, 17_475, 0, 0),
        3: (2, 1, 16_961, 16_961, 16_961, 16_961, 1, 1_000_000),
    }


def test_audio_stereo_reads_header_not_length_rule(spark):
    """The decoder must read the fmt-chunk channel FIELD, not replay
    the generation rule — pinned with a header/length combination
    with_wav_blob never writes: a STEREO header over an even-length
    payload with negative samples. Payload 01 00 FF FF = samples
    (+1, −1): stereo header → one frame L=+1, R=−1 (dc_r negative,
    eq 0); mono header over the same bytes → dual-mono (+1, −1),
    eq_ppm 1e6. Same payload, different header, different answer —
    the field drives the demux."""
    import struct

    from web_analytics_visits_re_processing_spark.operators.multimodal import (
        decode_audio_stereo,
    )

    def wav(channels: int, payload: bytes) -> bytes:
        n = len(payload)
        return (
            b"RIFF" + struct.pack("<I", n + 36) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                    8000, 8000 * channels * 2,
                                    channels * 2, 16)
            + b"data" + struct.pack("<I", n) + payload
        )

    payload = b"\x01\x00\xff\xff"
    docs = spark.createDataFrame(
        [(1, wav(2, payload)), (2, wav(1, payload))],
        "doc_id long, audio binary",
    )
    got = {
        r["doc_id"]: (r["channels"], r["n_frames"], r["dc_l"], r["dc_r"],
                      r["peak_l"], r["peak_r"], r["eq_frames"], r["eq_ppm"])
        for r in decode_audio_stereo(docs).collect()
    }
    assert got == {
        1: (2, 1, 1, -1, 1, 1, 0, 0),
        2: (1, 2, 0, 0, 1, 1, 2, 1_000_000),
    }


def test_audio_stereo_fixture_invariants(spark, sf_dir):
    """Shipped fixtures: both channel classes occur; every mono doc
    is exact dual-mono (dc_l = dc_r, peak_l = peak_r, eq_ppm = 1e6);
    ASCII corpus keeps every peak in the positive int16 range; ppm
    shares bounded."""
    rows = QUERIES["audio_stereo_channel_profile"](spark, sf_dir).collect()
    assert rows
    seen = {r["channels"] for r in rows}
    assert seen == {1, 2}
    for r in rows:
        assert r["n_frames"] >= 1
        assert 0 <= r["eq_ppm"] <= 1_000_000
        assert 0 <= r["peak_l"] <= 32_767 and 0 <= r["peak_r"] <= 32_767
        if r["channels"] == 1:
            assert r["dc_l"] == r["dc_r"]
            assert r["peak_l"] == r["peak_r"]
            assert r["eq_ppm"] == 1_000_000


# --- distributed global ranks -------------------------------------------------


def test_global_row_number_matches_window(spark):
    """The two-pass rank must equal the single-partition window rank
    on a total order — checked on a shuffled frame with duplicate
    order values (tiebreak column makes the order total) across
    partition-count regimes bracketing the data (more partitions than
    rows, and 1 partition)."""
    from pyspark.sql import Window

    from web_analytics_visits_re_processing_spark.operators.ranks import (
        global_row_number,
    )
    from pyspark.sql import functions as F

    df = spark.range(137).select(
        (F.col("id") % 13).alias("v"), F.col("id").alias("tb")
    )
    expect = {
        (r["v"], r["tb"]): r["rn"]
        for r in df.select(
            "v", "tb",
            F.row_number().over(Window.orderBy("v", "tb")).alias("rn"),
        ).collect()
    }
    for nparts in (1, 7, 200):
        got = {
            (r["v"], r["tb"]): r["rn"]
            for r in global_row_number(
                df, ["v", "tb"], num_partitions=nparts
            ).collect()
        }
        assert got == expect, nparts


def test_global_ntile_matches_spark_ntile(spark):
    """The derived bucket formula must equal F.ntile(n) exactly,
    INCLUDING the branches round-number fixtures never exercise:
    N % n != 0 (unequal buckets) and N < n (one row per bucket,
    q = 0 guard). Also descending order."""
    from pyspark.sql import Window

    from web_analytics_visits_re_processing_spark.operators.ranks import (
        global_ntile,
    )
    from pyspark.sql import functions as F

    for n_rows, n_buckets in ((7, 10), (23, 10), (150, 10), (40, 7)):
        df = spark.range(n_rows).select(
            (F.col("id") * 37 % 97).alias("v"), F.col("id").alias("tb")
        )
        order = [F.col("v").desc(), F.col("tb")]
        expect = {
            (r["v"], r["tb"]): r["nt"]
            for r in df.select(
                "v", "tb",
                F.ntile(n_buckets).over(Window.orderBy(*order)).alias("nt"),
            ).collect()
        }
        got = {
            (r["v"], r["tb"]): r["ntile"]
            for r in global_ntile(df, order, n_buckets).collect()
        }
        assert got == expect, (n_rows, n_buckets)


def test_global_running_sum_matches_window(spark):
    """The two-pass cumulative sum must equal the single-partition
    ROWS UNBOUNDED PRECEDING window on a total order — shuffled
    frame, duplicate order values with a tiebreak, negative values
    (so a wrong prefix CAN'T hide behind monotonicity), partition
    counts bracketing the data (1, 7, and more partitions than
    rows)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.operators.ranks import (
        global_running_sum,
    )

    df = spark.range(137).select(
        (F.col("id") % 13).alias("v"),
        F.col("id").alias("tb"),
        (F.col("id") * 7 % 29 - 14).alias("x"),
    )
    expect = {
        (r["v"], r["tb"]): r["cum"]
        for r in df.select(
            "v", "tb",
            F.sum("x").over(
                Window.orderBy("v", "tb").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ).alias("cum"),
        ).collect()
    }
    for nparts in (1, 7, 200):
        got = {
            (r["v"], r["tb"]): r["cum"]
            for r in global_running_sum(
                df, ["v", "tb"], "x", "cum", num_partitions=nparts
            ).collect()
        }
        assert got == expect, nparts


def test_global_running_max_matches_window(spark):
    """The two-pass strictly-preceding running max must equal the
    single-partition ROWS ... AND 1 PRECEDING window max, INCLUDING
    the NULL on the global first row and the partition-boundary
    first rows (where the answer comes ONLY from the broadcast
    prefix-partition max — the branch a single-partition run never
    exercises)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.operators.ranks import (
        global_running_max,
    )

    # non-monotone value sequence so the running max plateaus and
    # drops below current values in places
    df = spark.range(100).select(
        (F.col("id") % 10).alias("v"),
        F.col("id").alias("tb"),
        (F.col("id") * 13 % 41).alias("x"),
    )
    rows = df.select(
        "v", "tb",
        F.max("x").over(
            Window.orderBy("v", "tb").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ).alias("pm"),
    ).collect()
    expect = {(r["v"], r["tb"]): r["pm"] for r in rows}
    assert None in expect.values()  # the global first row
    for nparts in (1, 7, 200):
        got = {
            (r["v"], r["tb"]): r["pm"]
            for r in global_running_max(
                df, ["v", "tb"], "x", "pm", num_partitions=nparts
            ).collect()
        }
        assert got == expect, nparts


# --- int64-overflow widening (the probe-class lesson, regression-pinned) -----


def _write_big_value_events(spark, tmp_path, value, n=10):
    """n purchase events of the given dollar value — values chosen so
    corpus-level cent sums push the PRE-widening ×1e6 intermediates
    past int64 while every RESULT stays in range. Under the ANSI
    session these tests THREW ARITHMETIC_OVERFLOW before the
    decimal(38,0) widening."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, t0 + dt.timedelta(minutes=i), i, "purchase", value, "")
            for i in range(n)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_trimmed_mean_survives_big_cents(spark, tmp_path):
    """10 events of $2e10 → cents 2e12 each; the middle-80% trim
    keeps 8 rows, so the share numerator is 1.6e13·1e6 = 1.6e19 —
    past int64, inside decimal(38,0). Result: mean 2e12 cents →
    2e18 ppm exactly."""
    sf = _write_big_value_events(spark, tmp_path, 2e10)
    rows = QUERIES["trimmed_mean_by_type"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_kept"] == 8
    assert r["kept_cents"] == 16_000_000_000_000
    assert r["trimmed_mean_ppm"] == 2_000_000_000_000_000_000


def test_winsorized_mean_survives_big_cents(spark, tmp_path):
    """Same corpus: all values equal so lo = hi = 2e12 and the
    winsorized sum is 2e13 → ×1e6 = 2e19 pre-widening overflow;
    result 2e18 ppm."""
    sf = _write_big_value_events(spark, tmp_path, 2e10)
    r = QUERIES["winsorized_mean_by_type"](spark, sf).collect()[0]
    assert r["n"] == 10
    assert r["lo_cents"] == r["hi_cents"] == 2_000_000_000_000
    assert r["winsorized_mean_ppm"] == 2_000_000_000_000_000_000


def test_power_users_pareto_survives_big_cents(spark, tmp_path):
    """10 users × one $1e11 purchase → 1e13 cents per user; each
    decile holds one user and its share numerator is 1e13·1e6 =
    1e19 — pre-widening overflow. Every decile reads exactly
    100000 ppm of the 1e14 total."""
    sf = _write_big_value_events(spark, tmp_path, 1e11)
    rows = QUERIES["power_users_pareto"](spark, sf).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_users"] == 1
        assert r["revenue_cents"] == 10_000_000_000_000
        assert r["revenue_share_ppm"] == 100_000


# --- JPEG marker walk ---------------------------------------------------------


def test_jpeg_walk_hand_computed(spark, tmp_path):
    """Through the full generator → walk path. 'AB' (n=2): k = 2 COM
    segments of m = 3 bytes → sof_offset = 20 + 2·7 = 34, 3 segments
    hopped, h = 2%480+8 = 10, w = 2%640+8 = 10. 'ABCDE' (n=5):
    k = 2, m = 1 → offset 20 + 2·5 = 30, h = 13, w = 13. 'ABC'
    (n=3): k = 0 → SOF directly after APP0 at offset 20, 1 segment
    hopped, h = w = 11."""
    docs = spark.createDataFrame(
        [(1, "AB", "en", "s", 2), (2, "ABCDE", "en", "s", 5),
         (3, "ABC", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["width"], r["height"], r["sof_offset"],
                      r["n_segments_before_sof"], r["format"])
        for r in QUERIES["jpeg_dimension_parse"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        1: (10, 10, 34, 3, "baseline"),
        2: (13, 13, 30, 3, "baseline"),
        3: (11, 11, 20, 1, "baseline"),
    }


def test_jpeg_walk_cases_the_generator_never_writes(spark):
    """Direct decoder cases outside the generation rule: progressive
    SOF2 (format flag), missing SOI (unknown, -1s), SOS reached
    before any SOF (corrupt — dimensions unavailable without the
    frame header), and a blob that dies mid-walk (non-FF where a
    marker must start)."""
    from web_analytics_visits_re_processing_spark.operators.multimodal import (
        decode_jpeg_dimensions,
    )

    progressive = (
        b"\xff\xd8"
        + b"\xff\xc2\x00\x0b\x08\x00\x20\x00\x40\x01\x01\x11\x00"
    )
    no_soi = b"\x00\x01\x02\x03"
    sos_first = b"\xff\xd8" + b"\xff\xda\x00\x04\x01\x00" + b"payload"
    broken = b"\xff\xd8" + b"\x00\xc0\x00\x0b"
    docs = spark.createDataFrame(
        [(1, progressive), (2, no_soi), (3, sos_first), (4, broken)],
        "doc_id long, jpeg binary",
    )
    got = {
        r["doc_id"]: (r["width"], r["height"], r["sof_offset"],
                      r["n_segments_before_sof"], r["format"])
        for r in decode_jpeg_dimensions(docs).collect()
    }
    assert got == {
        1: (64, 32, 2, 0, "progressive"),
        2: (-1, -1, -1, -1, "unknown"),
        3: (-1, -1, -1, -1, "corrupt"),
        4: (-1, -1, -1, -1, "corrupt"),
    }


def test_jpeg_fixture_structural_invariants(spark, sf_dir):
    """Shipped fixtures: every doc parses baseline with the offset
    arithmetic 20 + k·(m+4) consistent with the hop count (k = hops
    − 1), and dimensions inside the generator's ranges."""
    rows = QUERIES["jpeg_dimension_parse"](spark, sf_dir).collect()
    assert rows
    assert {r["format"] for r in rows} == {"baseline"}
    assert {r["n_segments_before_sof"] for r in rows} <= {1, 2, 3}
    for r in rows:
        assert 8 <= r["width"] <= 647 and 8 <= r["height"] <= 487
        k = r["n_segments_before_sof"] - 1
        if k == 0:
            assert r["sof_offset"] == 20
        else:
            assert 20 + k * 5 <= r["sof_offset"] <= 20 + k * 9


# --- int64-overflow widening, second pass: squared-term statistics -----------


def _write_daily_purchases(spark, tmp_path, day_values):
    """One purchase event per (date, dollar value) pair — values chosen
    so the PRE-widening squared intermediates (cents², S², (n·x−S)²)
    exceed int64 under the ANSI session while the 0/1 flag output is
    trivially in range. These tests THREW ARITHMETIC_OVERFLOW before
    the decimal(38,0) widening."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            (i, dt.datetime(d.year, d.month, d.day, 12), i, "purchase", v, "")
            for i, (d, v) in enumerate(day_values)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_anomaly_daily_revenue_survives_big_cents(spark, tmp_path):
    """11 days: ten at $1e10 (1e12 cents/day) and one spike at $1e11
    (1e13 cents). cents² = 1e24 per day — past int64 BEFORE the sum
    even starts. Hand arithmetic: n=11, S=2e13, Q=1.1e26; the spike's
    (n·x−S)² = (9e13)² = 8.1e27 > 9(n·Q−S²) = 7.29e27 → flagged; every
    plain day reads (−9e12)² = 8.1e25 ≪ 7.29e27 → clean."""
    import datetime as dt

    days = [
        (dt.date(2024, 1, 1 + i), 1e10) for i in range(10)
    ] + [(dt.date(2024, 1, 11), 1e11)]
    sf = _write_daily_purchases(spark, tmp_path, days)
    rows = QUERIES["anomaly_daily_revenue"](spark, sf).collect()
    assert len(rows) == 11
    flags = {r["day"]: r["is_anomaly"] for r in rows}
    assert flags["2024-01-11"] == 1
    assert sum(flags.values()) == 1
    cents = {r["day"]: r["revenue_cents"] for r in rows}
    assert cents["2024-01-11"] == 10_000_000_000_000


def test_seasonal_anomalies_survives_big_cents(spark, tmp_path):
    """Same arithmetic confined to ONE weekday group: 11 consecutive
    Mondays (2024-01-01 is a Monday), ten at $1e10 and the last at
    $1e11 — per-dow n=11 so the spike's z² = 81/11·… trips the same
    8.1e27 > 7.29e27 comparison inside the dow=0 stratum."""
    import datetime as dt

    days = [
        (dt.date(2024, 1, 1) + dt.timedelta(weeks=i), 1e10)
        for i in range(10)
    ] + [(dt.date(2024, 1, 1) + dt.timedelta(weeks=10), 1e11)]
    sf = _write_daily_purchases(spark, tmp_path, days)
    rows = QUERIES["seasonal_adjusted_anomalies"](spark, sf).collect()
    assert len(rows) == 11
    assert {r["dow"] for r in rows} == {0}
    flags = {r["day"]: r["is_anomaly"] for r in rows}
    assert flags["2024-03-11"] == 1
    assert sum(flags.values()) == 1


def test_part_demand_trend_survives_whale_part(spark, tmp_path):
    """One whale SKU over four weeks with y = (0,0,0,5e12) units:
    num = n·Σxy − Σx·Σy = 4·1.5e13 − 6·5e12 = 3e13, so the ppm
    numerator 3e13·1e6 = 3e19 exceeds int64 pre-widening while
    slope_ppm = 3e19 div 20 = 1.5e18 is comfortably in range."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    qtys = [0.0, 0.0, 0.0, 5e12]
    spark.createDataFrame(
        [
            (1, 1, base + dt.timedelta(weeks=i), q)
            for i, q in enumerate(qtys)
        ],
        "l_orderkey long, l_partkey long, l_shipdate timestamp,"
        " l_quantity double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = QUERIES["part_demand_trend_top20"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["l_partkey"] == 1
    assert r["n_weeks"] == 4
    assert r["total_qty"] == 5_000_000_000_000
    assert r["slope_ppm"] == 1_500_000_000_000_000_000


# --- chunked streaming replay (horizon-bounded state) -------------------------


def test_chunked_replay_equals_single_batch_with_smaller_peak(spark, sf_dir):
    """The scale probe's chunked replay (time-contiguous files +
    maxFilesPerTrigger=1) must produce EXACTLY the single-batch
    replay's sessions while its peak state stays a fraction of the
    key universe — the measured horizon-bounded-state property
    (BASELINE.md). Pinned at sf0.001 with 4 chunks: out_rows equals
    the registered streaming gate's count, peak < 60% of total
    sessions (a 4-chunk horizon holds ~1/4 plus watermark lag), and
    eviction leaves at most the sentinel's own session."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "scale_probe",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "scale_probe.py",
        ),
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    single = QUERIES["streaming_sessionize_visits"](spark, sf_dir).count()
    res = sp.chunked_sessionize_probe(spark, sf_dir, 4, "pytest_c4")
    assert res["out_rows"] == single
    assert res["numRowsTotal"] <= 1
    assert res["numRowsRemoved"] >= single
    assert 0 < res["numRowsTotalMax"] < 0.6 * single


# --- SemDeDup adaptive k (the paper's k ∝ N protocol) -------------------------


def test_semdedup_scales_k_with_corpus(spark, tmp_path):
    """The registered query derives k = max(10, N div 600) so mean
    cluster size stays ~600 as the corpus grows (fixed k made the
    within-cluster pair join quadratic — 41× wall at 25× data in the
    r9 two-point probe). Pinned by direct-operator equality: 6,600
    synthetic vectors must produce EXACTLY semdedup_verdicts(k=11),
    and differ from the old fixed k=10 clustering."""
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.operators.semdedup import (
        semdedup_verdicts,
    )

    n = 6600
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda d: (
                ((F.col("id") * 37 + d * 101) % 1000) / 1000.0
            ).cast("float"),
        ).alias("embedding"),
        (F.col("id") % 3).cast("int").alias("label"),
    )
    emb.coalesce(2).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {
        tuple(r)
        for r in QUERIES["semdedup_semantic_dups"](
            spark, str(tmp_path)
        ).collect()
    }
    loaded = spark.read.parquet(str(tmp_path / "embeddings.parquet"))
    want = {
        tuple(r)
        for r in semdedup_verdicts(
            loaded, k=11, n_updates=1, tau=0.35
        ).collect()
    }
    assert got == want and len(got) == n
    # cluster id 10 occupied ⇒ the 11th centroid existed ⇒ k was 11,
    # not the old fixed 10 (one centroid may legitimately end empty
    # after the Lloyd update, so the distinct COUNT is not pinned).
    clusters = {r[1] for r in got}
    assert max(clusters) == 10


# --- corpus-banded LSH plane count (the SemDeDup fixed-k class) ---------------


def test_lsh_planes_band_boundaries():
    """The banding rule at its exact edges: 2^16 stays in the 8-plane
    arm, one past it jumps to 16; likewise 2^24 → 24."""
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        lsh_planes_for,
    )

    assert lsh_planes_for(1) == 8
    assert lsh_planes_for(65536) == 8
    assert lsh_planes_for(65537) == 16
    assert lsh_planes_for(16777216) == 16
    assert lsh_planes_for(16777217) == 24


def test_lsh_bucket_arms_match_duckdb(spark):
    """The oracle's 16- and 24-plane CASE arms are never exercised at
    any fixture SF, so their unrolled plane literals are pinned here
    directly: Spark's lsh_bucket and DuckDB's _lsh_bucket_sql must
    assign IDENTICAL bucket ids for every plane count over 60
    deterministic centered vectors."""
    import duckdb

    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.operators.similarity import (
        lsh_bucket,
    )
    from web_analytics_visits_re_processing_spark.plans.llmdata import (
        _lsh_bucket_sql,
    )

    vecs = [
        (i, [(((i * 37 + d * 101) % 1000) - 500) / 1000.0 for d in range(64)])
        for i in range(60)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {v!r}::DOUBLE[])" for i, v in vecs
        )
        + ") t(vec_id, embedding)"
    )
    for planes in (8, 16, 24):
        got = {
            r["vec_id"]: r["bk"]
            for r in df.select(
                "vec_id",
                lsh_bucket(
                    F.col("embedding"), dim=64, n_planes=planes
                ).alias("bk"),
            ).collect()
        }
        want = dict(
            con.execute(
                f"SELECT vec_id, {_lsh_bucket_sql('embedding', n_planes=planes)}"
                " FROM embeddings"
            ).fetchall()
        )
        assert got == want, planes
