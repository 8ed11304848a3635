"""Planted-case tests for the round-8 close-out tier: the isotonic
(PAVA) calibration fit, the local clustering coefficient, the
second-order Markov memory gain and the functional-dependency audit.
Each test drives the REGISTERED query callable — the same code path
the driver gates — against a hand-built fixture whose expected output
is pinned by hand."""

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
    spark.createDataFrame(
        [
            (eid, T0 + dt.timedelta(minutes=m), uid, et, val, props)
            for (eid, m, uid, et, val, props) in rows
        ],
        EV_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _write_lineitem(spark, tmp_path, lineitems):
    spark.createDataFrame(
        lineitems, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    return str(tmp_path)


# --- isotonic calibration (PAVA via the minimax identity) ------------------


def _band_users(rows, eid, base, nclick, k_train, k_test):
    """20 users (evens train, odds test) with `nclick` clicks each;
    the first k of each parity's rank order convert (day-17 purchase,
    non-converters purchase day 20 — outside the activation window)."""
    for u in range(base, base + 20):
        rank = (u - base) // 2
        converts = rank < (k_train if u % 2 == 0 else k_test)
        for d in range(1, nclick + 1):
            rows.append((eid, d * 1440 + (u % 60), u, "click", 0.0, "{}"))
            eid += 1
        rows.append(
            (eid, (16 if converts else 19) * 1440, u, "purchase", 1.0, "{}")
        )
        eid += 1
    return eid


def test_isotonic_pools_the_planted_violator(spark, tmp_path):
    """Train rates [200000, 400000, 300000, 500000] violate
    monotonicity at bands 1→2; PAVA pools them to (4+3)/20 = 350000.
    Hand minimax check (i=1): max(min(300000, 300000, 350000),
    min(400000, 350000, 400000)) = 350000. Held-out obs
    [300000, 300000, 400000, 600000] → ece_raw = 4·10·100000/40 =
    100000, ece_iso = (100000+50000+50000+100000)·10/40 = 75000 —
    the isotonic map measurably beats the raw map on the holdout."""
    rows, eid = [], 0
    eid = _band_users(rows, eid, 100, 5, 2, 3)    # band 0-11
    eid = _band_users(rows, eid, 200, 12, 4, 3)   # band 12-13
    eid = _band_users(rows, eid, 300, 14, 3, 4)   # band 14-15
    eid = _band_users(rows, eid, 400, 20, 5, 6)   # band 16+
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["band_ord"]: (
            r["band"], r["n_train"], r["k_train"], r["raw_ppm"],
            r["iso_ppm"], r["n_test"], r["k_test"], r["obs_ppm"],
            r["ece_raw_ppm"], r["ece_iso_ppm"],
        )
        for r in QUERIES["isotonic_calibration_pava"](spark, sf).collect()
    }
    assert got == {
        0: ("0-11", 10, 2, 200_000, 200_000, 10, 3, 300_000,
            100_000, 75_000),
        1: ("12-13", 10, 4, 400_000, 350_000, 10, 3, 300_000,
            100_000, 75_000),
        2: ("14-15", 10, 3, 300_000, 350_000, 10, 4, 400_000,
            100_000, 75_000),
        3: ("16+", 10, 5, 500_000, 500_000, 10, 6, 600_000,
            100_000, 75_000),
    }


def test_isotonic_fixture_monotone_and_bounded(spark, sf_dir):
    """Shipped fixtures: the fit is monotone non-decreasing in
    band_ord (structural, any data), stays inside [min raw, max raw]
    over populated bands, and >=2 bands are populated on both
    splits."""
    rows = sorted(
        QUERIES["isotonic_calibration_pava"](spark, sf_dir).collect(),
        key=lambda r: r["band_ord"],
    )
    assert len(rows) == 4
    iso = [r["iso_ppm"] for r in rows]
    assert iso == sorted(iso), iso
    pop = [r for r in rows if r["n_train"] > 0]
    lo = min(r["raw_ppm"] for r in pop)
    hi = max(r["raw_ppm"] for r in pop)
    assert all(lo <= r["iso_ppm"] <= hi for r in pop), rows
    assert sum(1 for r in rows if r["n_train"] > 0 and r["n_test"] > 0) >= 2


# --- local clustering coefficient ------------------------------------------


def test_clustering_coefficient_clique_and_bridge(spark, tmp_path):
    """One 4-clique order {1,2,3,4} plus a path 5–6–7 (orders {5,6}
    and {6,7}): clique nodes read cc = 1000000 exactly (deg 3, tri 3),
    the bridge node 6 reads cc = 0 (deg 2, open wedge), deg-1 leaves
    5 and 7 are excluded, and transitivity = 2·12·1e6 // 26 =
    923076 on every row."""
    li = [(1, 1), (1, 2), (1, 3), (1, 4), (2, 5), (2, 6), (3, 6), (3, 7)]
    sf = _write_lineitem(spark, tmp_path, li)
    got = {
        r["l_partkey"]: (
            r["degree"], r["n_triangles"], r["cc_ppm"],
            r["transitivity_ppm"],
        )
        for r in QUERIES["clustering_coefficient_parts"](spark, sf).collect()
    }
    assert got == {
        1: (3, 3, 1_000_000, 923_076),
        2: (3, 3, 1_000_000, 923_076),
        3: (3, 3, 1_000_000, 923_076),
        4: (3, 3, 1_000_000, 923_076),
        6: (2, 0, 0, 923_076),
    }


def test_clustering_coefficient_fixture_invariants(spark, sf_dir):
    """Shipped fixtures: every cc in [0, 1e6]; Σ per-node triangle
    participation divides by 3 (each 3-clique is counted at exactly
    its 3 corners); transitivity within [0, 1e6] and shared by every
    row."""
    rows = QUERIES["clustering_coefficient_parts"](spark, sf_dir).collect()
    assert len(rows) >= 1
    assert all(0 <= r["cc_ppm"] <= 1_000_000 for r in rows)
    assert sum(r["n_triangles"] for r in rows) % 3 == 0
    ts = {r["transitivity_ppm"] for r in rows}
    assert len(ts) == 1 and 0 <= ts.pop() <= 1_000_000


# --- order-2 Markov memory gain --------------------------------------------


def test_order2_gain_hand_computed_alternation(spark, tmp_path):
    """One user path x a y a x a y a x (1-minute gaps): from cur=a
    the order-1 model sees next split 2/2 between x and y
    (H1 = ln 2), but prev fully disambiguates — after x→a comes y,
    after y→a comes x (H2 = 0), so gain(a) = ln 2 = 0.693147. cur=y
    and cur=x are deterministic at both orders (gain 0). Total gain
    = 4·ln2/7 = 0.396084 over the 7 triples."""
    path = ["x", "a", "y", "a", "x", "a", "y", "a", "x"]
    rows = [
        (i, i, 1, et, 0.0, "{}") for i, et in enumerate(path)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["cur_type"]: (
            r["n_ctx"], r["n_prev_ctx"], r["h1_nats"], r["h2_nats"],
            r["gain_nats"], r["total_gain_nats"],
        )
        for r in QUERIES["markov_order2_gain"](spark, sf).collect()
    }
    assert got == {
        "a": (4, 2, 0.693147, 0.0, 0.693147, 0.396084),
        "y": (2, 1, 0.0, 0.0, 0.0, 0.396084),
        "x": (1, 1, 0.0, 0.0, 0.0, 0.396084),
    }


def test_order2_gain_fixture_nonneg(spark, sf_dir):
    """Shipped fixtures: gain >= 0 on every row (structural — both
    entropies share one triple table), h2 <= h1, and at least one
    state observes >= 2 distinct prev contexts."""
    rows = QUERIES["markov_order2_gain"](spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["gain_nats"] >= 0.0, r
        assert r["h2_nats"] <= r["h1_nats"] + 1e-6, r
    assert any(r["n_prev_ctx"] >= 2 for r in rows)


# --- functional-dependency audit -------------------------------------------


def test_fd_audit_hand_computed_verdicts(spark, tmp_path):
    """Hand-built 3-table fixture: both key FDs hold exactly (g3 0);
    o_custkey→o_orderpriority breaks at cust 10 (2 priorities over 2
    orders → g3 = (3−2)/3 = 333333); l_partkey→l_suppkey breaks at
    part 5 (supps {100,100,200} → keep the majority 2 of 3 rows, g3 =
    (4−3)/4 = 250000); user_id→event_type breaks at user 1 (click×2 +
    view → g3 = 250000)."""
    spark.createDataFrame(
        [(1, 10, "HIGH"), (2, 10, "LOW"), (3, 11, "HIGH")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(
        [(1, 5, 100), (1, 5, 100), (2, 5, 200), (2, 6, 300)],
        "l_orderkey long, l_partkey long, l_suppkey long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    _write_events(
        spark,
        tmp_path,
        [
            (1, 0, 1, "click", 0.0, "{}"),
            (2, 1, 1, "click", 0.0, "{}"),
            (3, 2, 1, "view", 0.0, "{}"),
            (4, 3, 2, "purchase", 0.0, "{}"),
        ],
    )
    got = {
        r["fd"]: (r["n_rows"], r["n_lhs"], r["n_viol_keys"], r["g3_ppm"],
                  r["holds"])
        for r in QUERIES["functional_dependency_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        "orders: o_orderkey->o_custkey": (3, 3, 0, 0, 1),
        "orders: o_custkey->o_orderpriority": (3, 2, 1, 333_333, 0),
        "lineitem: l_partkey->l_suppkey": (4, 2, 1, 250_000, 0),
        "events: event_id->event_type": (4, 4, 0, 0, 1),
        "events: user_id->event_type": (4, 2, 1, 250_000, 0),
    }


def test_fd_audit_fixture_key_fds_hold(spark, sf_dir):
    """Shipped fixtures: the two key→attribute FDs hold exactly
    (these are structural in the generator), the three expected
    violations fire, and g3 is always in [0, 1e6) and 0 iff holds."""
    rows = QUERIES["functional_dependency_audit"](spark, sf_dir).collect()
    assert len(rows) == 5
    by = {r["fd"]: r for r in rows}
    assert by["orders: o_orderkey->o_custkey"]["holds"] == 1
    assert by["events: event_id->event_type"]["holds"] == 1
    for fd in ("orders: o_custkey->o_orderpriority",
               "lineitem: l_partkey->l_suppkey",
               "events: user_id->event_type"):
        assert by[fd]["holds"] == 0, by[fd]
    for r in rows:
        assert 0 <= r["g3_ppm"] < 1_000_000
        assert (r["g3_ppm"] == 0) == (r["holds"] == 1)


# --- Adamic–Adar link prediction -------------------------------------------


def test_adamic_adar_reverses_raw_neighbor_count(spark, tmp_path):
    """The classic AA story: pair (1,2) shares ONE selective neighbor
    (part 100, kept-degree 2 → weight round(1e6/ln2) = 1442695); pair
    (3,4) shares TWO promiscuous neighbors (parts 200/300, kept-
    degree 6 each → 2·558111 = 1116222). Common-neighbors ranks (3,4)
    first; Adamic–Adar correctly puts (1,2) on top. Scaffolding: ten
    disjoint 4-cliques raise the median degree to 3 (hub cut at
    2·3 = 6 keeps the deg-6 centers) while contributing no candidate
    pairs (all clique pairs are adjacent); the 200–300 order makes
    those two adjacent so their shared-leaf wedges anti-join out; and
    part 400's 15 spokes make it a genuine hub (15 > 6) whose spokes
    must predict nothing through it."""
    li, o = [], 0
    for p in (1, 2):
        o += 1; li += [(o, 100), (o, p)]
    for p in (3, 4, 5, 6, 7):
        o += 1; li += [(o, 200), (o, p)]
    for p in (3, 4, 8, 9, 10):
        o += 1; li += [(o, 300), (o, p)]
    o += 1; li += [(o, 200), (o, 300)]
    for c in range(10):                      # ten disjoint 4-cliques
        o += 1
        li += [(o, 1000 + 4 * c + j) for j in range(4)]
    for j in range(15):                      # genuine hub, deg 15 > 6
        o += 1; li += [(o, 400), (o, 500 + j)]
    sf = _write_lineitem(spark, tmp_path, li)
    rows = QUERIES["adamic_adar_link_prediction"](spark, sf).collect()
    top = rows[0]
    assert (top["pa"], top["pb"]) == (1, 2)
    assert (top["common_neighbors"], top["aa_e6"]) == (1, 1_442_695)
    r34 = next(r for r in rows
               if (r["pa"], r["pb"]) == (3, 4))
    assert (r34["common_neighbors"], r34["aa_e6"]) == (2, 1_116_222)
    assert max(r["common_neighbors"] for r in rows) == 2  # CN favors (3,4)
    assert not any(r["pa"] >= 400 or r["pb"] >= 400 for r in rows)


def test_adamic_adar_fixture_ranking_invariants(spark):
    """At sf0.01 (the driver-gate scale): NON-EMPTY (the round-8
    point of the scale-relative hub rule — the old absolute cap gated
    empty output here), <=20 rows, aa_e6 non-increasing, every score
    positive and bounded by cn·round(1e6/ln 2) (the max per-neighbor
    weight)."""
    rows = QUERIES["adamic_adar_link_prediction"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert 1 <= len(rows) <= 20
    scores = [r["aa_e6"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 < r["aa_e6"] <= r["common_neighbors"] * 1_442_695, r


def test_link_prediction_cn_fixture_nonempty(spark):
    """The common-neighbors gate must also be non-vacuous at the
    driver scale under the shared rule — before round 8 it hash-gated
    on EMPTY output at every SF."""
    rows = QUERIES["link_prediction_common_neighbors"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert 1 <= len(rows) <= 20
    for r in rows:
        assert r["common_neighbors"] >= 1
        assert 0 < r["jaccard_ppm"] <= 1_000_000


# --- simplified silhouette -------------------------------------------------


def _write_embeddings(spark, tmp_path, rows):
    """rows: (vec_id, [dim0, dim1], label) — padded to 64 float dims
    with zeros; values must be float32-exact (powers of two)."""
    spark.createDataFrame(
        [(v, [float(a), float(b)] + [0.0] * 62, lab)
         for (v, a, b, lab) in rows],
        "vec_id long, embedding array<float>, label string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_silhouette_pins_the_misplaced_point(spark, tmp_path):
    """A = {(0,0), (0,0), (0.5,0)}, B = {(0.5,0), (0.5,0)} — the third
    A point sits EXACTLY on B's centroid. Micro-units: A centroid
    (166666, 0) by truncated division, B (500000, 0). Hand-replayed
    integers: clean A points s = (250000000000 − 27777555556)·1e6
    div 250000000000 = 888889; the misplaced point reads the floor
    −1000000 exactly (b2 = 0 → s = −a2·1e6 div a2); B points read
    +1000000 exactly (a2 = 0). Label rollups: A mean 777778 div 3 =
    259259, well 666666; B mean 1000000; overall 2777778 div 5 =
    555555."""
    sf = _write_embeddings(
        spark, tmp_path,
        [(1, 0.0, 0.0, "A"), (2, 0.0, 0.0, "A"), (3, 0.5, 0.0, "A"),
         (4, 0.5, 0.0, "B"), (5, 0.5, 0.0, "B")],
    )
    got = {
        r["label"]: (r["n_points"], r["mean_sil_ppm"], r["well_ppm"],
                     r["overall_sil_ppm"])
        for r in QUERIES["silhouette_by_label"](spark, sf).collect()
    }
    assert got == {
        "A": (3, 259_259, 666_666, 555_555),
        "B": (2, 1_000_000, 1_000_000, 555_555),
    }


def test_silhouette_fixture_bounds_and_total(spark, sf_dir):
    """Shipped fixtures: 10 labels covering all 500 vectors, every
    statistic inside its ppm bounds, and the constant overall column
    consistent with the per-label means (within the div-truncation
    slack of one rollup level)."""
    rows = QUERIES["silhouette_by_label"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert sum(r["n_points"] for r in rows) == 500
    for r in rows:
        assert -1_000_000 <= r["mean_sil_ppm"] <= 1_000_000
        assert 0 <= r["well_ppm"] <= 1_000_000
    ov = {r["overall_sil_ppm"] for r in rows}
    assert len(ov) == 1
    ov = ov.pop()
    lo = min(r["mean_sil_ppm"] for r in rows)
    hi = max(r["mean_sil_ppm"] for r in rows)
    assert lo - 1 <= ov <= hi + 1, (lo, ov, hi)


# --- sorted-neighborhood dedup ---------------------------------------------


def _write_documents(spark, tmp_path, docs):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for (i, t) in docs],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_snm_catches_suffix_edit_and_misses_prefix_edit(spark, tmp_path):
    """The structural SNM story, both directions. CATCH: docs 1/2
    differ only in the LAST word — identical 16-char prefix key, so
    they sort adjacent and verify at 3-gram Jaccard 5/7 = 0.7143.
    MISS: docs 3/7 differ only in the FIRST word (same 0.7143
    Jaccard!) but the edit is IN the prefix key, three spacer docs
    sort between them, and the w=3 window never pairs them — the
    blocking blind spot LSH banding does not have. Window budget:
    7 ranked docs × next-3 = 15 candidate pairs exactly."""
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "kappa lambda mu nu xi omicron pi rho"),
        (4, "mmm qqq www eee rrr"),
        (5, "nnn ttt yyy uuu iii"),
        (6, "ooo ppp aaa sss ddd"),
        (7, "zzz lambda mu nu xi omicron pi rho"),
    ]
    sf = _write_documents(spark, tmp_path, docs)
    rows = QUERIES["sorted_neighborhood_dup_pairs"](spark, sf).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"], r["n_window_pairs"])
            for r in rows] == [(1, 2, 0.7143, 15)]


def test_snm_fixture_nonempty_and_budget(spark):
    """At sf0.01 (the driver-gate scale): the corpus's template
    duplication puts near-dups behind shared prefixes, so SNM finds
    real pairs; the candidate budget is exactly the linear 3n − 6
    window pairs (n ranked docs, tail clipped)."""
    import duckdb

    rows = QUERIES["sorted_neighborhood_dup_pairs"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) >= 1
    n_docs = duckdb.sql(
        "SELECT COUNT(*) FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchone()[0]
    budget = {r["n_window_pairs"] for r in rows}
    assert budget == {3 * n_docs - 6}
    assert all(r["jaccard"] >= 0.2 and r["id_a"] < r["id_b"] for r in rows)


# --- matched-pairs treatment lift -------------------------------------------


def test_psm_hand_computed_att(spark, tmp_path):
    """Controls (even ids): two at activity level x=2 (one converts →
    level rate 500000), two at x=10 (none). Treated (odd): one at
    x=2 (converts, exact match), one at x=3 (nearest level is 2 —
    distance 1 vs 7 — matched rate 500000), one at x=10 (converts,
    exact, matched rate 0). ATT = (2·1e6 − 1000000) div 3 = 333333
    while the naive lift reads 666666 − 250000 = 416666 — matching
    strips the engagement confound; exact_match_ppm = 2·1e6 div 3 =
    666666."""
    rows, eid = [], 0

    def user(uid, x, converts):
        nonlocal eid
        for d in range(1, x + 1):
            rows.append((eid, d * 1440, uid, "view", 0.0, "{}")); eid += 1
        rows.append((eid, (16 if converts else 19) * 1440, uid,
                     "purchase", 1.0, "{}")); eid += 1

    user(100, 2, True); user(102, 2, False)        # controls x=2
    user(104, 10, False); user(106, 10, False)     # controls x=10
    user(101, 2, True); user(103, 3, False); user(105, 10, True)
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["psm_matched_lift"](spark, sf).collect()
    assert (r["n_treated"], r["n_control"]) == (3, 4)
    assert (r["naive_treated_ppm"], r["naive_control_ppm"],
            r["naive_lift_ppm"]) == (666_666, 250_000, 416_666)
    assert r["att_ppm"] == 333_333
    assert r["exact_match_ppm"] == 666_666


def test_psm_equidistant_tie_breaks_to_smaller_level(spark, tmp_path):
    """One treated user at x=6 between control levels 2 (rate 1e6)
    and 10 (rate 0), both at distance 4: the (|Δx|, x_c) rule matches
    DOWN to level 2, so a non-converting treated user reads
    ATT = (0 − 1000000) div 1 = −1000000 exactly."""
    rows, eid = [], 0

    def user(uid, x, converts):
        nonlocal eid
        for d in range(1, x + 1):
            rows.append((eid, d * 1440, uid, "view", 0.0, "{}")); eid += 1
        rows.append((eid, (16 if converts else 19) * 1440, uid,
                     "purchase", 1.0, "{}")); eid += 1

    user(100, 2, True)      # control level 2, rate 1e6
    user(102, 10, False)    # control level 10, rate 0
    user(101, 6, False)     # treated, equidistant
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["psm_matched_lift"](spark, sf).collect()
    assert r["att_ppm"] == -1_000_000
    assert r["exact_match_ppm"] == 0


def test_psm_fixture_nondegenerate(spark, sf_dir):
    """Shipped fixtures: both arms populated, every ppm in bounds,
    and the match quality readout is a real fraction (even the
    15-user sf0.001 grain yields some distance-zero matches — 3/7
    when this was pinned)."""
    [r] = QUERIES["psm_matched_lift"](spark, sf_dir).collect()
    assert r["n_treated"] > 0 and r["n_control"] > 0
    for c in ("naive_treated_ppm", "naive_control_ppm",
              "exact_match_ppm"):
        assert 0 <= r[c] <= 1_000_000, r
    assert -1_000_000 <= r["att_ppm"] <= 1_000_000
    assert r["exact_match_ppm"] > 0, r


# --- "fightin' words" distinctive terms --------------------------------------


def test_log_odds_replays_the_formula_exactly(spark, tmp_path):
    """Two 8-token sources: 'a' = apple×6 banana×2, 'b' = banana×6
    cherry×2. Only apple (in a) and banana (in b) clear the y >= 5
    floor. Expected z_e4 replayed with the IDENTICAL add-one
    log-odds expression in plain Python (V = 3, n_s = 8, N = 16) —
    the engines and the replay evaluate one scalar IEEE expression
    tree over the same integers, so the e4 floors must agree
    exactly."""
    import math

    docs = [
        (1, " ".join(["apple"] * 6 + ["banana"] * 2)),
        (2, " ".join(["banana"] * 6 + ["cherry"] * 2)),
    ]
    spark.createDataFrame(
        [(i, t, "en", "src_a" if i == 1 else "src_b", len(t))
         for (i, t) in docs],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    def z_e4(y, y_tot, n_s, n_tot=16, v=3):
        y_rest = y_tot - y
        delta = (
            math.log((y + 1.0) / (n_s + v - y - 1.0))
            - math.log((y_rest + 1.0) / (n_tot - n_s + v - y_rest - 1.0))
        )
        z = delta / math.sqrt(1.0 / (y + 1.0) + 1.0 / (y_rest + 1.0))
        return math.floor(z * 10000)

    rows = QUERIES["log_odds_distinctive_terms"](
        spark, str(tmp_path)
    ).collect()
    got = {(r["source"], r["term"]): (r["y"], r["y_rest"], r["z_e4"],
                                      r["rnk"]) for r in rows}
    assert got == {
        ("src_a", "apple"): (6, 0, z_e4(6, 6, 8), 1),
        ("src_b", "banana"): (6, 2, z_e4(6, 8, 8), 1),
    }
    assert got[("src_a", "apple")][2] > got[("src_b", "banana")][2] > 0


def test_log_odds_fixture_top10_and_signs(spark, sf_dir):
    """Shipped fixtures: <=10 rows per source, ranks contiguous from
    1, z non-increasing within each source, and every surfaced term
    is genuinely over-represented (z > 0 — the top-10 of a real
    corpus never dips into under-representation)."""
    rows = QUERIES["log_odds_distinctive_terms"](spark, sf_dir).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        zs = [r["z_e4"] for r in rs]
        assert zs == sorted(zs, reverse=True)
        assert all(z > 0 for z in zs), (src, zs)


# --- demand diversity (effective catalog size) -------------------------------


def test_demand_diversity_replays_entropy_and_topshare(spark, tmp_path):
    """Four parts with line counts [5, 3, 1, 1]: H and exp(H)
    replayed with the identical algebraic form in Python; top 1% of
    4 parts = ceil(4/100) = 1 part, the count-5 bestseller → share
    exactly 500000 ppm."""
    import math

    li = ([(i, 1) for i in range(5)] + [(10 + i, 2) for i in range(3)]
          + [(20, 3), (21, 4)])
    sf = _write_lineitem(spark, tmp_path, li)
    [r] = QUERIES["demand_diversity_parts"](spark, sf).collect()
    s_c = 5 * math.log(5) + 3 * math.log(3)
    h = round(math.log(10) - s_c / 10, 6)
    assert (r["n_parts"], r["n_lines"]) == (4, 10)
    assert r["entropy_nats"] == h
    assert r["effective_parts"] == round(
        math.exp(math.log(10) - s_c / 10), 2
    )
    assert (r["top1pct_parts"], r["top1pct_share_ppm"]) == (1, 500_000)


def test_demand_diversity_fixture_bounds(spark, sf_dir):
    """Shipped fixtures: effective size in (1, n_parts]; the top-1%
    share is at least the uniform share k/n (concentration can only
    raise it) and at most 1e6."""
    [r] = QUERIES["demand_diversity_parts"](spark, sf_dir).collect()
    assert 1.0 < r["effective_parts"] <= r["n_parts"]
    uniform_ppm = r["top1pct_parts"] * 1_000_000 // r["n_parts"]
    assert uniform_ppm <= r["top1pct_share_ppm"] <= 1_000_000
    assert 0.0 < r["entropy_nats"]


# --- Rocchio pseudo-relevance feedback ---------------------------------------


def test_prf_expansion_retrieves_doc_with_no_query_terms(spark, tmp_path):
    """The PRF recall story, pinned end to end. Docs 1–3 are the only
    query-term matches, so they ARE the pseudo-relevant set; their
    non-query terms score feedback: tf_rel 8 × idf 1e6 = 8e6 over
    zebra: 1 × 5e6 = 5e6, so the expansion is exactly (feedback,
    zebra). Doc 4 shares NO original query term yet re-ranks into the
    results through 'feedback' — the recall move that motivates PRF —
    while the four junk docs stay out. BM25's length normalization
    ranks the shorter doc 2 above the longer doc 1 (correct k1/b
    behavior); the expansion-only doc 4 must rank below every
    query-term match under the 2:1 weights."""
    docs = [
        (1, "dup merge window feedback feedback feedback feedback"),
        (2, "dup merge feedback feedback zebra"),
        (3, "window feedback feedback"),
        (4, "feedback feedback feedback banana"),
        (5, "cat dog mouse"), (6, "fish bird owl"),
        (7, "sun moon star"), (8, "rock paper scissors"),
    ]
    sf = _write_documents(spark, tmp_path, docs)
    rows = QUERIES["rocchio_prf_expansion"](spark, sf).collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3, 4}
    assert all((r["exp_term_1"], r["exp_term_2"]) == ("feedback", "zebra")
               for r in rows)
    assert rows[-1]["doc_id"] == 4  # expansion-only: in, but last
    d4 = rows[-1]
    assert d4["n_matched_terms"] == 1  # retrieved via expansion alone


def test_prf_fixture_consistency(spark, sf_dir):
    """Shipped fixtures: <=10 rows, deterministic non-increasing
    scores, the two expansion columns constant and disjoint from the
    original query, and every row matches >=1 of the 5 weighted
    terms."""
    rows = QUERIES["rocchio_prf_expansion"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    scores = [r["score_scaled"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    e1 = {r["exp_term_1"] for r in rows}
    e2 = {r["exp_term_2"] for r in rows}
    assert len(e1) == 1 and len(e2) == 1
    assert not ({e1.pop(), e2.pop()} & {"dup", "merge", "window"})
    assert all(1 <= r["n_matched_terms"] <= 5 for r in rows)


# --- G-test / MI / Cramér's V association trio -------------------------------


def _write_orders_customers(spark, tmp_path, orders, custs):
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(
        custs, "c_custkey long, c_mktsegment string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    return str(tmp_path)


def test_association_perfect_dependence_reads_v_one(spark, tmp_path):
    """A 2×2 table where segment fully determines priority (10/0,
    0/10): χ²_scaled = N = 20 exactly (the cross-multiplied form of
    the textbook χ² = N for perfect 2×2 dependence), Cramér's V =
    floor(sqrt(20/20)·1e6) = 1000000, and MI replays as ln 2 — one
    bit of shared information, the maximum a 2-level split can
    carry. G/MI are replayed with the identical Σ O·ln form in
    Python."""
    import math

    custs = [(1, "A"), (2, "A"), (3, "B"), (4, "B")]
    orders = (
        [(i, 1 + (i % 2), "HIGH") for i in range(0, 10)]
        + [(i, 3 + (i % 2), "LOW") for i in range(10, 20)]
    )
    sf = _write_orders_customers(spark, tmp_path, orders, custs)
    [r] = QUERIES["segment_priority_association"](spark, sf).collect()
    assert (r["n_cells"], r["n"], r["r"], r["c"]) == (4, 20, 2, 2)
    g_half = sum(
        o * (math.log(o) + math.log(20) - math.log(10) - math.log(10))
        for o in (10, 10)
    )
    assert r["g_stat"] == round(2 * g_half, 6)
    assert r["mi_nats"] == round(g_half / 20, 6)
    assert r["mi_nats"] == round(math.log(2), 6)
    assert r["chi2_scaled"] == 20
    assert r["cramers_v_e6"] == 1_000_000


def test_association_independence_reads_zero(spark, tmp_path):
    """A perfectly independent 2×2 (every cell 5): every O·N = rs·cs,
    so G, MI, χ² and V are all EXACTLY zero — the trio agrees with
    the chi2 screen on the null."""
    custs = [(1, "A"), (3, "B")]
    orders = ([(i, 1, "HIGH") for i in range(5)]
              + [(i, 1, "LOW") for i in range(5, 10)]
              + [(i, 3, "HIGH") for i in range(10, 15)]
              + [(i, 3, "LOW") for i in range(15, 20)])
    sf = _write_orders_customers(spark, tmp_path, orders, custs)
    [r] = QUERIES["segment_priority_association"](spark, sf).collect()
    assert (r["g_stat"], r["mi_nats"]) == (0.0, 0.0)
    assert (r["chi2_scaled"], r["cramers_v_e6"]) == (0, 0)


def test_association_fixture_bounds(spark, sf_dir):
    """Shipped fixtures: MI >= 0, V in [0, 1e6], G ~ χ² (the two
    statistics agree to first order on smooth tables — within a
    factor of 2 either way on any real contingency), and the
    near-independent TPC-H-ish assignment keeps V small (< 0.2)."""
    [r] = QUERIES["segment_priority_association"](spark, sf_dir).collect()
    assert r["mi_nats"] >= 0.0
    assert 0 <= r["cramers_v_e6"] <= 1_000_000
    if r["chi2_scaled"] > 0:
        assert r["g_stat"] <= 2 * r["chi2_scaled"] + 1
        assert r["g_stat"] >= r["chi2_scaled"] / 2 - 1
    assert r["cramers_v_e6"] < 200_000


# --- audio zero-crossing profile ---------------------------------------------


def test_audio_zcr_known_samples(spark, tmp_path):
    """'ABéAB' → UTF-8 bytes 41 42 C3 A9 41 42 → samples (+16961,
    −22077, +16961): 2 sign flips over 2 transitions → zcr exactly
    1000000, peak |−22077| = 22077. 'ABCD' → (+16961, +17475): no
    flip, zcr 0. A 1-byte doc has ns = 0 and is excluded (the
    audio_rms degenerate contract)."""
    docs = spark.createDataFrame(
        [(1, "ABéAB", "en", "s", 5), (2, "ABCD", "en", "s", 4),
         (3, "A", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_samples"], r["n_sign_flips"], r["zcr_ppm"],
                      r["peak_abs"], r["silence_ppm"])
        for r in QUERIES["audio_zcr_profile"](spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (3, 2, 1_000_000, 22_077, 0),
        2: (2, 0, 0, 17_475, 0),
    }


def test_audio_zcr_fixture_bounds(spark, sf_dir):
    """Shipped fixtures: every rate in [0, 1e6]; ASCII-only corpus
    text makes every sample's high byte < 0x80, so flips = 0 and the
    peak stays within the positive int16 range — the structural
    consequence the gate relies on."""
    rows = QUERIES["audio_zcr_profile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["zcr_ppm"] <= 1_000_000
        assert 0 <= r["silence_ppm"] <= 1_000_000
        assert 0 <= r["peak_abs"] <= 32_767
        assert r["n_samples"] >= 1


# --- skewness / kurtosis moment profiling ------------------------------------


def test_moments_textbook_values(spark, tmp_path):
    """Hand-derivable shapes. Type 'sym' = cents [1,2,3]: perfectly
    symmetric → g1 = 0 exactly; 3-point uniform → g2 = −1.5 exactly
    (M2 = 6, M3 = 0, M4 = 54: 54/36 − 3). Type 'asym' = cents
    [0,0,3]: M2 = 18, M3 = 54, M4 = 486 → g1 = 54/18^1.5 = 0.707107,
    g2 = 486/324 − 3 = −1.5. Type 'flat' = constant cents → M2 = 0 →
    both NULL."""
    rows = [
        (0, 0, 1, "sym", 0.01, "{}"), (1, 1, 1, "sym", 0.02, "{}"),
        (2, 2, 1, "sym", 0.03, "{}"),
        (3, 3, 2, "asym", 0.0, "{}"), (4, 4, 2, "asym", 0.0, "{}"),
        (5, 5, 2, "asym", 0.03, "{}"),
        (6, 6, 3, "flat", 0.05, "{}"), (7, 7, 3, "flat", 0.05, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: (r["n"], r["sum_cents"], r["var_floor_cents2"],
                          r["skew_g1"], r["kurt_excess"])
        for r in QUERIES["moment_stats_by_type"](spark, sf).collect()
    }
    assert got["sym"] == (3, 6, 0, 0.0, -1.5)
    assert got["asym"] == (3, 3, 2, 0.707107, -1.5)
    assert got["flat"] == (2, 10, 0, None, None)


def test_moments_fixture_bounds(spark, sf_dir):
    """Shipped fixtures: kurtosis respects the universal lower bound
    g2 >= g1² − 2 (Pearson's inequality) on every type with
    variance, and a nonnegative-valued column can't be extremely
    left-skewed (g1 > -10 sanity)."""
    rows = QUERIES["moment_stats_by_type"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["skew_g1"] is not None:
            assert r["kurt_excess"] >= r["skew_g1"] ** 2 - 2 - 1e-4, r
            assert r["skew_g1"] > -10, r
