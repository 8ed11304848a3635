"""Planted-duplicate / planted-cluster tests for the operators whose
driver check is rows-only (no SQL oracle): MinHash-LSH near-dup,
SimHash grouping, LSH ANN recall, approx_count_distinct accuracy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.dedup import (
    dedup_exact,
    exact_dup_groups,
    minhash_lsh_near_dups,
    simhash_dup_groups,
)
from web_analytics_visits_re_processing_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on a warm windowsill and the birds sing in the old oak tree near "
    "the river bank under a clear blue summer sky every single morning"
)


@pytest.fixture(scope="module")
def planted_docs(spark):
    near = BASE.replace("summer", "winter")  # 1-token change → high jaccard
    far = "completely different content about database engines and query planners " * 3
    rows = [
        (0, BASE, "src0"),
        (1, BASE, "src0"),       # exact dup of 0
        (2, near, "src0"),       # near dup of 0
        (3, far.strip(), "src1"),
        (4, "tiny doc", "src1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup_planted(planted_docs):
    groups = {r["keep_id"]: r["n_docs"] for r in exact_dup_groups(planted_docs).collect()}
    assert groups[0] == 2  # docs 0,1 identical
    kept = sorted(r["doc_id"] for r in dedup_exact(planted_docs).collect())
    assert kept == [0, 2, 3, 4]  # dup doc 1 dropped, min id kept


def test_minhash_lsh_finds_planted_near_dups(planted_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_near_dups(planted_docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.8  # near dup
    assert not any(3 in p or 4 in p for p in pairs)  # unrelated stays out


def test_simhash_groups_exact_dups(planted_docs):
    groups = [r for r in simhash_dup_groups(planted_docs).collect() if r["n_docs"] > 1]
    assert len(groups) >= 1
    # docs 0,1 (and likely 2 — simhash is token-set based) share a signature
    assert any(g["keep_id"] == 0 and g["n_docs"] >= 2 for g in groups)


@pytest.fixture(scope="module")
def planted_clusters(spark):
    rng = np.random.RandomState(7)
    centers = rng.randn(20, 64)
    rows = []
    for cid in range(20):
        for j in range(10):
            v = centers[cid] + 0.01 * rng.randn(64)
            rows.append((cid * 10 + j, (v / np.linalg.norm(v)).astype(float).tolist(), cid))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_lsh_ann_recall_on_planted_clusters(planted_clusters):
    emb = planted_clusters
    queries = emb.where(F.col("vec_id") % 10 == 0)  # one per cluster
    exact = cosine_topk_bruteforce(emb, queries, k=3)
    approx = cosine_topk_lsh(emb, queries, k=3, dim=64, n_planes=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # tight clusters land in the same hyperplane bucket: recall is high
    assert recall >= 0.8, f"LSH recall {recall:.2f}"
    # exact ranks by cosine: every query's top-3 are its own cluster
    for q, v in e:
        assert q // 10 == v // 10


def test_approx_count_distinct_accuracy(spark, sf_dir):
    from web_analytics_visits_re_processing_spark.plans import QUERIES
    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    exact = e.select(F.countDistinct("user_id")).collect()[0][0]
    approx = QUERIES["approx_count_distinct_users"](spark, sf_dir).collect()[0]["approx_users"]
    assert abs(approx - exact) / exact < 0.05
