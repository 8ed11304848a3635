"""Planted-case tests for the round-6 retrieval/diagnostics queries:
kNN vote majority + tie rule, BM25 tf saturation and length
normalization, trigram fuzzy-match threshold, skew profiler whale
math, table profiler null/distinct counts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.plans import QUERIES


def test_knn_majority_and_tie(spark):
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        knn_classify,
    )

    # Anchor 0 at origin-ish; 3 close label-1 vectors, 2 close label-9
    # vectors -> majority 1. Anchor 100 sees a 2-2 split -> smaller
    # label wins.
    base = [1.0, 0.0, 0.0, 0.0]
    mk = lambda vid, vec, lab: (vid, [float(x) for x in vec], lab)  # noqa: E731
    corpus = [
        mk(1, [1.0, 0.01, 0, 0], 1),
        mk(2, [1.0, 0.02, 0, 0], 1),
        mk(3, [1.0, 0.03, 0, 0], 1),
        mk(4, [1.0, 0.04, 0, 0], 9),
        mk(5, [1.0, 0.05, 0, 0], 9),
        mk(101, [0, 1.0, 0.01, 0], 7),
        mk(102, [0, 1.0, 0.02, 0], 7),
        mk(103, [0, 1.0, 0.03, 0], 3),
        mk(104, [0, 1.0, 0.04, 0], 3),
    ]
    emb = spark.createDataFrame(
        corpus + [mk(0, base, 0), mk(100, [0.0, 1.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    # k=5: anchor 0 sees its 3+2 cluster; anchor 100 sees 2+2 + one far
    out = knn_classify(emb, emb.where(F.col("vec_id").isin(0, 100)), k=5)
    got = {r["query_id"]: (r["pred_label"], r["n_votes"]) for r in out.collect()}
    assert got[0] == (1, 3)
    # anchor 100: labels 7,7,3,3 among nearest 4, 5th neighbor is far
    # (label 1 or 9 from the other cluster); the 2-2 tie among the top
    # votes resolves to label 3 unless the 5th vote breaks it -- pin
    # only the deterministic winner property:
    assert got[100][0] in (3, 7)


def test_bm25_saturation_and_length_norm(spark, tmp_path):
    # Three docs: A has the query term twice in 4 tokens, B once in 4,
    # C once in 40 (padded) -> score(A) > score(B) > score(C).
    pad = " ".join(["filler"] * 39)
    rows = [
        (1, "dup x dup y", "en", "s", 1),
        (2, "dup a b c", "en", "s", 1),
        (3, "dup " + pad, "en", "s", 1),
        (4, "nothing here", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["bm25_doc_ranking"](spark, str(tmp_path)).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[:3] == [1, 2, 3]
    scores = {r["doc_id"]: r["score_scaled"] for r in out}
    assert scores[1] > scores[2] > scores[3] > 0
    assert 4 not in scores


def test_fuzzy_trigram_match_and_threshold(spark, tmp_path):
    rows = [(1, "blue anvil", "x", 1.0), (2, "red widget", "x", 1.0),
            (3, "zq", "x", 1.0)]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_retailprice double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = QUERIES["fuzzy_trigram_part_match"](spark, str(tmp_path)).collect()
    got = {r["probe"]: r["matched_name"] for r in out}
    # "bue anvil" -> "blue anvil"; "rd widget" -> "red widget".
    assert got.get("bue anvil") == "blue anvil"
    assert got.get("rd widget") == "red widget"
    # the 2-char name produces zero trigrams -> no probe row survives
    assert "z" not in got and len(got) == 2


def test_key_skew_profile_whale_math(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 42, "view", 0.0, "{}") for i in range(90)]
    rows += [(100 + i, t0, i, "click", 0.0, "{}") for i in range(10)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["key_skew_profile"](spark, str(tmp_path)).collect()
    rows_u = {r["key"]: r for r in out if r["col"] == "user_id"}
    # whale: 90 of 100 rows over 11 distinct keys -> share 900000 ppm,
    # skew = 90*100*11//100 = 990 (9.9x the mean key load).
    assert rows_u["42"]["cnt"] == 90
    assert rows_u["42"]["share_ppm"] == 900_000
    assert rows_u["42"]["skew_x100"] == 990
    types = {r["key"] for r in out if r["col"] == "event_type"}
    assert types == {"view", "click"}


def test_table_profile_nulls_and_distincts(spark, tmp_path):
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, 10, "O", 1.5, t0, "1-URGENT"),
        (2, 10, None, 2.5, t0, "1-URGENT"),
        (3, 20, "F", None, t0 + dt.timedelta(days=1), None),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r["col"]: r for r in QUERIES["table_profile_stats"](spark, str(tmp_path)).collect()}
    assert out["o_orderstatus"]["n_nulls"] == 1
    assert out["o_orderstatus"]["n_distinct"] == 2
    assert out["o_orderstatus"]["min_num"] is None
    assert out["o_totalprice"]["n_nulls"] == 1
    assert out["o_totalprice"]["min_num"] == 150.0  # cents
    assert out["o_totalprice"]["max_num"] == 250.0
    assert out["o_orderdate"]["n_distinct"] == 2
    assert out["o_orderkey"]["n_distinct"] == 3 and out["o_orderkey"]["n_nulls"] == 0



def test_hll_merge_equals_direct(spark, sf_dir):
    """Mergeability at the operator level: per-group registers merged
    by MAX must equal registers computed globally in one pass."""
    from web_analytics_visits_re_processing_spark.operators.sketch import (
        hll_registers,
    )
    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    merged = (
        hll_registers(ev, "user_id", ("event_type",))
        .groupBy("r_idx")
        .agg(F.max("r_rho").alias("r_rho"))
    )
    direct = hll_registers(ev, "user_id", ())
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_rfm_scores_extremes(spark, tmp_path):
    base = dt.datetime(2024, 1, 31)
    rows = []
    # user u: u purchases of $u each, last purchase (5-u) days before
    # the anchor -> user 5 is best on all three axes, user 1 worst.
    eid = 0
    for u in range(1, 6):
        for k in range(u):
            rows.append((eid, base - dt.timedelta(days=5 - u, hours=k + 1),
                         u, "purchase", float(u), "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r for r in
           QUERIES["rfm_segments"](spark, str(tmp_path)).collect()}
    assert got[5]["segment"] == "R5F5M5"
    assert got[1]["segment"] == "R1F1M1"
    assert got[1]["recency_days"] == 4 and got[5]["recency_days"] == 0
    assert got[3]["frequency"] == 3 and got[3]["monetary_cents"] == 900


def test_k_anonymity_flags_small_classes(spark, tmp_path):
    rows = [(i, f"c{i}", 0, 0.0, "BIG") for i in range(6)]
    rows += [(10, "x", 1, 0.0, "TINY"), (11, "y", 1, 0.0, "TINY")]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    got = {(r["c_nationkey"], r["c_mktsegment"]): (r["n"], r["at_risk"])
           for r in QUERIES["k_anonymity_audit"](spark, str(tmp_path)).collect()}
    assert got[(0, "BIG")] == (6, 0)
    assert got[(1, "TINY")] == (2, 1)


def test_gdpr_cascade_counts(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    # customers 0 (deleted: 0 % 97 == 0) and 1; orders: 2 for cust 0,
    # 1 for cust 1; lineitems: 3 under cust 0's orders, 1 under cust 1.
    spark.createDataFrame(
        [(0, "a", 0, 0.0, "S"), (1, "b", 0, 0.0, "S")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(10, 0, "O", 1.0, t0, "P"), (11, 0, "O", 1.0, t0, "P"),
         (12, 1, "O", 1.0, t0, "P")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, 1, 1.0, 1.0), (10, 2, 1.0, 1.0), (11, 1, 1.0, 1.0),
         (12, 3, 1.0, 1.0)],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {r["tbl"]: (r["n_deleted"], r["n_remaining"]) for r in
           QUERIES["gdpr_delete_cascade"](spark, str(tmp_path)).collect()}
    assert got == {"customer": (1, 1), "orders": (2, 1), "lineitem": (3, 1)}


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
