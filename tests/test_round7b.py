"""Planted-case tests for the round-7 continuation tier: causal
inference (DiD), experiment power (MDE gate) and the lead-lag CCF —
each case hand-computed so the assertion pins the exact integer the
formula must produce."""

from __future__ import annotations

import datetime as dt

from web_analytics_visits_re_processing_spark.plans import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long, "
    "c_acctbal double, c_mktsegment string"
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def test_did_isolates_treatment_from_shared_trend(spark, tmp_path):
    """Control (even ids) flat 10%→10%; treated (odd ids) 10%→20% —
    DiD = (200000−100000) − 0 = exactly +100000 ppm. Then a placebo
    where BOTH arms jump 10%→30%: the naive post-pre delta reads
    +200000 in each arm but DiD reads exactly 0 — the estimator's
    defining cancellation."""
    pre = dt.datetime(2024, 1, 5, 12)
    post = dt.datetime(2024, 1, 20, 12)
    rows, eid = [], 0
    for t, treat_k in ((pre, 10), (post, 20)):
        for i in range(100):  # control: even user 2; always 10/100
            rows.append((eid, t, 2, "purchase" if i < 10 else "view",
                         0.0, "{}")); eid += 1
        k = 10 if t is pre else treat_k
        for i in range(100):  # treated: odd user 3
            rows.append((eid, t, 3, "purchase" if i < k else "view",
                         0.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["did_conversion_lift"](spark, str(tmp_path)).collect()
    assert (r["cvr_ctrl_pre_ppm"], r["cvr_ctrl_post_ppm"]) == (
        100_000, 100_000)
    assert (r["cvr_treat_pre_ppm"], r["cvr_treat_post_ppm"]) == (
        100_000, 200_000)
    assert (r["delta_treat_ppm"], r["delta_ctrl_ppm"], r["did_ppm"]) == (
        100_000, 0, 100_000)

    rows2, eid = [], 0  # placebo: both arms 10% pre → 30% post
    for t, k in ((pre, 10), (post, 30)):
        for uid in (2, 3):
            for i in range(100):
                rows2.append((eid, t, uid,
                              "purchase" if i < k else "view",
                              0.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows2, EV_SCHEMA)
    (r2,) = QUERIES["did_conversion_lift"](spark, str(tmp_path)).collect()
    assert r2["delta_treat_ppm"] == 200_000
    assert r2["delta_ctrl_ppm"] == 200_000
    assert r2["did_ppm"] == 0


def test_mde_gate_thresholds_hand_checked(spark, tmp_path):
    """Segment 'BIG': 1000 users, 500 convert (p=0.5). Required per-arm
    n for a 20% lift (δ=0.1) is 2·7.849·0.25/0.01 ≈ 392 ≤ 500 →
    detectable; for 10% (δ=0.05) it's ≈1570 > 500 → not. Integer
    gate: n·k·L² = 1000·500·4e10 = 2e16 ≥ 31396e9·500 ≈ 1.57e16 ✓
    and 5e15 < 1.57e16 ✗. Segment 'TINY': 10 users, 5 convert —
    nothing detectable."""
    t = dt.datetime(2024, 1, 10, 12)
    rows, custs, eid = [], [], 0
    for u in range(1, 1001):
        custs.append((u, f"c{u}", 0, 0.0, "BIG"))
        rows.append((eid, t, u,
                     "purchase" if u <= 500 else "view", 0.0, "{}"))
        eid += 1
    for u in range(2001, 2011):
        custs.append((u, f"c{u}", 0, 0.0, "TINY"))
        rows.append((eid, t, u,
                     "purchase" if u <= 2005 else "view", 0.0, "{}"))
        eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    _write(spark, tmp_path, "customer", custs, CUST_SCHEMA)
    got = {
        r["seg"]: (r["n_users"], r["k_conv"], r["cvr_ppm"],
                   r["det_lift_5pct"], r["det_lift_10pct"],
                   r["det_lift_20pct"])
        for r in QUERIES["mde_detectable_lifts"](
            spark, str(tmp_path)).collect()
    }
    assert got["BIG"] == (1000, 500, 500_000, 0, 0, 1)
    assert got["TINY"] == (10, 5, 500_000, 0, 0, 0)


def test_ccf_peaks_at_the_planted_lag(spark, tmp_path):
    """dau over days 0..5 is the non-monotone [1,3,2,5,4,6]; revenue
    on day d (d≥1) is 10·dau(d−1) cents, booked by a user already
    counted in that day's dau — a perfect one-day lead. Lag 1 aligns
    the series exactly (5 pairs, rho = +10000). Lag 0 has 6 pairs
    with cents [0,10,30,20,50,40]: rx [1,3,2,5,4,6] vs ry
    [1,2,4,3,6,5] → d² = 14, rho = 10000 − 60000·14 div (6·35)
    = 6000. Lag 5 leaves a single pair → rho is NULL (a 1-pair
    correlation is not a number); lags 6-7 have no pairs and emit no
    row."""
    d0 = dt.datetime(2024, 1, 1, 12)
    dau_series = [1, 3, 2, 5, 4, 6]
    rows, eid = [], 0
    for day, dau in enumerate(dau_series):
        t = d0 + dt.timedelta(days=day)
        for u in range(dau):  # distinct users = dau, all views
            rows.append((eid, t, 1000 + u, "view", 0.0, "{}")); eid += 1
        if day >= 1:  # purchase by user 1000 (already in dau today)
            rows.append((eid, t, 1000, "purchase",
                         dau_series[day - 1] * 0.10, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["lag"]: (r["n_pairs"], r["d2_sum"], r["rho_bp"])
        for r in QUERIES["ccf_lead_lag_daily"](
            spark, str(tmp_path)).collect()
    }
    assert got[1] == (5, 0, 10_000)     # perfect at the planted lag
    assert got[0] == (6, 14, 6_000)     # hand-computed with day-0 zero
    assert got[5][0] == 1 and got[5][2] is None   # 1 pair → no rho
    assert 6 not in got and 7 not in got          # no pairs → no row


LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, "
    "l_linenumber int, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double, l_returnflag string, "
    "l_linestatus string, l_shipdate timestamp"
)


def _li_rows(baskets):
    t = dt.datetime(2024, 1, 10)
    rows, ln = [], 0
    for o, parts in baskets:
        for p in parts:
            rows.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", t))
            ln += 1
    return rows


def test_link_prediction_wedges_and_hub_guard(spark, tmp_path):
    """Edges (1-2),(1-3),(2-4),(3-4): the two open wedge pairs (1,4)
    and (2,3) each have TWO common neighbors and Jaccard exactly 1e6
    (cn=2, union=2+2−2=2). A planted 51-partner hub is excluded, so
    its spokes predict nothing through it. (Round 8 made the hub rule
    scale-relative — deg > 2×median; here the spoke-dominated median
    is 1, cutoff 2, so the deg-51 hub is pruned exactly as the old
    absolute deg>50 rule did and every pinned value is unchanged.)"""
    baskets = [(1, [1, 2]), (2, [1, 3]), (3, [2, 4]), (4, [3, 4])]
    # hub 100 co-bought with 51 distinct parts → deg 51 > 2·median → pruned
    baskets += [(10_000 + i, [100, 200 + i]) for i in range(51)]
    _write(spark, tmp_path, "lineitem", _li_rows(baskets), LI_SCHEMA)
    rows = QUERIES["link_prediction_common_neighbors"](
        spark, str(tmp_path)).collect()
    got = [(r["pa"], r["pb"], r["common_neighbors"], r["jaccard_ppm"])
           for r in rows]
    assert got == [(1, 4, 2, 1_000_000), (2, 3, 2, 1_000_000)]


def test_heaps_levels_are_nested_and_exact(spark, tmp_path):
    """Expected counts computed with the same md5-bucket rule the
    engines share; the last level must see the whole corpus and
    every level must be a superset of the previous one."""
    import hashlib

    def bucket(doc_id):
        return int(
            hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16
        ) % 100

    docs = [(i, f"tok{i} common", "en", "s", 10) for i in range(1, 21)]
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    levels = [1, 2, 5, 10, 20, 50, 100]
    exp = {}
    for p in levels:
        ids = [i for i in range(1, 21) if bucket(i) < p]
        vocab = set()
        for i in ids:
            vocab |= {f"tok{i}", "common"}
        exp[p] = (len(ids), 2 * len(ids), len(vocab))
    got = {
        r["p"]: (r["n_docs"], r["n_token_instances"], r["vocab_size"])
        for r in QUERIES["heaps_vocab_growth"](
            spark, str(tmp_path)).collect()
    }
    assert got == exp
    assert got[100] == (20, 40, 21)
    for lo, hi in zip(levels, levels[1:]):
        assert got[lo][0] <= got[hi][0] and got[lo][2] <= got[hi][2]


def test_l_diversity_flags_homogeneous_class(spark, tmp_path):
    """Class A (3 members, all 'mid') → l=1, both flags; class B
    (debt+mid) → l=2, low-diversity only; class C pins the exact
    band boundaries (−5→debt, 0→mid, 5000→high) → l=3, clean."""
    custs = [
        (1, "a", 0, 100.0, "A"), (2, "b", 0, 200.0, "A"),
        (3, "c", 0, 4999.0, "A"),
        (4, "d", 0, -50.0, "B"), (5, "e", 0, 100.0, "B"),
        (6, "f", 0, -5.0, "C"), (7, "g", 0, 0.0, "C"),
        (8, "h", 0, 5000.0, "C"),
    ]
    _write(spark, tmp_path, "customer", custs, CUST_SCHEMA)
    got = {
        r["c_mktsegment"]: (r["n"], r["l_distinct"],
                            r["at_risk_homogeneous"],
                            r["at_risk_low_diversity"])
        for r in QUERIES["l_diversity_audit"](
            spark, str(tmp_path)).collect()
    }
    assert got["A"] == (3, 1, 1, 1)
    assert got["B"] == (2, 2, 0, 1)
    assert got["C"] == (3, 3, 0, 0)


def test_poisson_bootstrap_ci_replicates_exactly(spark, tmp_path):
    """Degenerate corners pin for free (all convert → the band
    collapses to [1e6, 1e6]); the mixed 4-of-10 case is replayed
    with a Python replica of the pinned hash→Poisson-weight rule, so
    lo/hi are asserted as exact integers, not ranges."""
    import hashlib

    T = [367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989]

    def weight(uid, rep):
        u = int(
            hashlib.md5(f"{uid}:{rep}".encode()).hexdigest()[:15], 16
        ) % 1_000_000
        return sum(1 for t in T if u >= t)

    t0 = dt.datetime(2024, 1, 10, 12)
    rows = [(i, t0, i, "purchase", 1.0, "{}") for i in range(10)]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    (r,) = QUERIES["poisson_bootstrap_ci"](spark, str(tmp_path)).collect()
    assert (r["n_users"], r["point_ppm"]) == (10, 1_000_000)
    assert (r["boot_lo_ppm"], r["boot_hi_ppm"]) == (1_000_000, 1_000_000)

    rows2 = [(i, t0, i, "purchase" if i < 4 else "view", 0.0, "{}")
             for i in range(10)]
    _write(spark, tmp_path, "events", rows2, EV_SCHEMA)
    ests = []
    for rep in range(100):
        num = sum(weight(u, rep) for u in range(4)) * 1_000_000
        den = max(sum(weight(u, rep) for u in range(10)), 1)
        ests.append(num // den)
    ests.sort()
    exp_lo, exp_hi = ests[2], ests[97]      # 3rd / 98th order stat
    (r2,) = QUERIES["poisson_bootstrap_ci"](
        spark, str(tmp_path)).collect()
    assert r2["point_ppm"] == 400_000
    assert (r2["boot_lo_ppm"], r2["boot_hi_ppm"]) == (exp_lo, exp_hi)
    assert r2["boot_lo_ppm"] < 400_000 < r2["boot_hi_ppm"]


def test_frequent_sequences_greedy_and_gapped(spark, tmp_path):
    """Three single-session users: [v,c,p], [c,v,c,p] (the greedy
    trap — a click BEFORE the first view must not block the
    view→click→purchase match), [v,v,p] (repeated-symbol pattern).
    Exactly five patterns have support; (v,c,p) is supported by both
    the clean and the noisy session."""
    t0 = dt.datetime(2024, 1, 10, 12)
    seqs = {1: ["view", "click", "purchase"],
            2: ["click", "view", "click", "purchase"],
            3: ["view", "view", "purchase"]}
    rows, eid = [], 0
    for uid, types in seqs.items():
        for i, ty in enumerate(types):
            rows.append((eid, t0 + dt.timedelta(minutes=i), uid, ty,
                         0.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r["a"], r["b"], r["c"]): (r["support"], r["support_ppm"])
        for r in QUERIES["frequent_event_sequences"](
            spark, str(tmp_path)).collect()
    }
    assert got == {
        ("view", "click", "purchase"): (2, 666_666),
        ("click", "view", "click"): (1, 333_333),
        ("click", "view", "purchase"): (1, 333_333),
        ("click", "click", "purchase"): (1, 333_333),
        ("view", "view", "purchase"): (1, 333_333),
    }


def test_uplift_stratum_separation(spark, tmp_path):
    """Dormant stratum ('0' pre-events): treated converts 30/100 vs
    control 10/100 → uplift exactly +200000 ppm. Engaged stratum
    ('1-30'): both arms 20/100 → uplift exactly 0. The average would
    blur the two; the strata must not. Conversions land INSIDE the
    day-16..18 activation window (the r8 sharpening)."""
    pre = dt.datetime(2024, 1, 5, 12)
    post = dt.datetime(2024, 1, 17, 12)
    rows, eid = [], 0
    # dormant: users 1000..1199 have NO pre events; odd = treated
    for u in range(1000, 1200):
        treated = u % 2 == 1
        conv_rank = (u - 1000) // 2          # 0..99 per arm
        k = 30 if treated else 10
        rows.append((eid, post, u,
                     "purchase" if conv_rank < k else "view",
                     0.0, "{}")); eid += 1
    # engaged: users 2000..2199 have 1 pre event; both arms 20/100
    for u in range(2000, 2200):
        conv_rank = (u - 2000) // 2
        rows.append((eid, pre, u, "view", 0.0, "{}")); eid += 1
        rows.append((eid, post, u,
                     "purchase" if conv_rank < 20 else "view",
                     0.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["stratum"]: (r["n_treat"], r["k_treat"], r["n_ctrl"],
                       r["k_ctrl"], r["uplift_ppm"])
        for r in QUERIES["uplift_by_engagement_stratum"](
            spark, str(tmp_path)).collect()
    }
    assert got["0"] == (100, 30, 100, 10, 200_000)
    assert got["1-30"] == (100, 20, 100, 20, 0)
    assert set(got) == {"0", "1-30"}


def test_uplift_conversion_window_excludes_late_purchase(spark, tmp_path):
    """The activation window is days 16-18: a purchase on day 17
    converts, an identical purchase on day 20 must NOT — the
    unwindowed form saturates on fixtures where everyone eventually
    buys and reads uplift ≡ 0 everywhere."""
    rows = [
        (0, dt.datetime(2024, 1, 17, 9), 1, "purchase", 5.0, "{}"),
        (1, dt.datetime(2024, 1, 20, 9), 2, "purchase", 5.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r["stratum"]: (r["n_treat"], r["k_treat"], r["n_ctrl"], r["k_ctrl"])
        for r in QUERIES["uplift_by_engagement_stratum"](
            spark, str(tmp_path)).collect()
    }
    # user 1 (odd → treated) converted; user 2 (even → control) did not
    assert got == {"0": (1, 1, 1, 0)}


def test_uplift_fixture_nondegenerate(spark, sf_dir):
    """The r7 verdict's fixture-degeneracy concern, pinned: at the
    smallest fixture the strata must not collapse to one band, and
    conversion must not saturate in every populated cell (both were
    true of the pre-r8 form: one '6+' stratum, cvr 100% both arms,
    uplift ≡ 0 — a trivially-green gate)."""
    rows = QUERIES["uplift_by_engagement_stratum"](spark, sf_dir).collect()
    populated = [r for r in rows if r["n_treat"] + r["n_ctrl"] > 0]
    assert len(populated) >= 2, rows
    # at least one cell with a real (non-0%, non-100%) conversion rate
    assert any(
        0 < r["k_treat"] < r["n_treat"] or 0 < r["k_ctrl"] < r["n_ctrl"]
        for r in populated
    ), rows


def test_l_diversity_fixture_nondegenerate(spark, sf_dir):
    """At the smallest fixture the QI classes must exercise BOTH
    flags in BOTH directions: some class with l = 1 (homogeneous —
    the disclosure k-anonymity misses), some with l = 2 (low
    diversity only), and some with l = 3 (clean) — otherwise the
    driver gate is trivially green on a constant flag column."""
    rows = QUERIES["l_diversity_audit"](spark, sf_dir).collect()
    ls = {r["l_distinct"] for r in rows}
    assert {1, 2, 3} <= ls, sorted(ls)
    assert any(r["at_risk_homogeneous"] == 1 for r in rows)
    assert any(r["at_risk_homogeneous"] == 0 for r in rows)
    assert any(r["at_risk_low_diversity"] == 0 for r in rows)
