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


def test_jl_rerank_recall_on_planted_clusters(planted_clusters):
    """Two-stage JL rerank: the 16-dim integer sketch cut keeps the
    true neighbors on tight planted clusters (candidates 20 ≫ k=3),
    and the reranked scores are the exact cosines — top-3 recall vs
    brute force stays high and in-cluster."""
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        cosine_topk_jl_rerank,
    )

    emb = planted_clusters
    queries = emb.where(F.col("vec_id") % 10 == 0)
    exact = cosine_topk_bruteforce(emb, queries, k=3)
    approx = cosine_topk_jl_rerank(emb, queries, k=3, n_candidates=20)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]): r["cos"] for r in approx.collect()}
    recall = len(e & set(a)) / len(e)
    assert recall >= 0.9, f"JL rerank recall {recall:.2f}"
    # stage-2 scores are EXACT cosines, so overlapping pairs agree
    ex = {(r["query_id"], r["vec_id"]): r["cos"] for r in exact.collect()}
    for pair in e & set(a):
        assert a[pair] == ex[pair]


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """Independent raw-sketch check (<5% relative error vs the exact
    count) PLUS the gate's own 3%-inequality flags — the query now
    emits the error-bound inequality itself (r12 verdict item 2), so
    this pytest also pins that the flag it hashes is the flag this
    direct computation would produce."""
    from web_analytics_visits_re_processing_spark.plans import QUERIES
    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    exact = e.select(F.countDistinct("user_id")).collect()[0][0]
    approx = e.select(
        F.approx_count_distinct("user_id", rsd=0.01)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05
    row = QUERIES["approx_count_distinct_users"](spark, sf_dir).collect()[0]
    assert row["n_exact"] == exact
    assert row["within_3pct"] == int(abs(approx - exact) * 100 <= exact * 3) == 1


def test_multiprobe_lsh_beats_single_probe_recall(planted_clusters):
    """probe_hamming=1 probes all buckets one bit-flip away; at a plane
    count where single-probe loses neighbors across bucket boundaries,
    multi-probe recovers them (>= 0.9 recall, and never worse)."""
    emb = planted_clusters
    queries = emb.where(F.col("vec_id") % 10 == 0)
    exact = cosine_topk_bruteforce(emb, queries, k=3)
    single = cosine_topk_lsh(emb, queries, k=3, dim=64, n_planes=8)
    multi = cosine_topk_lsh(emb, queries, k=3, dim=64, n_planes=8, probe_hamming=1)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    rs = len(e & {(r["query_id"], r["vec_id"]) for r in single.collect()}) / len(e)
    rm = len(e & {(r["query_id"], r["vec_id"]) for r in multi.collect()}) / len(e)
    assert rm >= 0.9, f"multi-probe recall {rm:.2f}"
    assert rm >= rs, f"multi-probe {rm:.2f} worse than single-probe {rs:.2f}"


def test_simhash_near_dup_pairs_pigeonhole_exact(spark):
    """The pigeonhole block join is lossless: a planted near-identical
    pair is found at exactly its true hamming distance, and missed the
    moment max_hamming drops below it."""
    from web_analytics_visits_re_processing_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures_df,
    )

    base = " ".join(f"w{i}" for i in range(60))
    # 3 of 60 tokens replaced → signature hamming 3 (deterministic:
    # portable md5 hashes, fixed texts)
    drifted = " ".join(f"x{i}" if i < 3 else f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, drifted),
            (2, " ".join(f"z{i}" for i in range(60))),  # unrelated
        ],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures_df(docs).collect()}
    true_h = bin(sigs[0] ^ sigs[1]).count("1")
    assert 0 < true_h < 16  # drift is small but nonzero

    found = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, max_hamming=true_h).collect()
    }
    assert found.get((0, 1)) == true_h
    assert not any(2 in p for p in found)  # unrelated doc stays out

    below = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup_pairs(docs, max_hamming=true_h - 1).collect()
    }
    assert (0, 1) not in below


def test_cosine_scores_pandas_matches_native(spark, sf_dir):
    """The Arrow/BLAS scorer (high-dim fallback) agrees with the
    native zip_with/aggregate cosine to float tolerance."""
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        cosine,
        cosine_scores_pandas,
    )
    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    native = {
        r["vec_id"]: r["cos"]
        for r in emb.select(
            "vec_id",
            cosine(F.array(*[F.lit(float(x)) for x in qvec]), F.col("embedding")).alias("cos"),
        ).collect()
    }
    arrow = {r["vec_id"]: r["cos"] for r in cosine_scores_pandas(emb, list(qvec)).collect()}
    assert set(native) == set(arrow)
    for k in native:
        assert abs(native[k] - arrow[k]) < 1e-9


def test_ivf_ann_recall_on_planted_clusters(planted_clusters):
    """IVF with sampled centroids and 2-probe search keeps high recall
    on tight clusters (cluster members quantize to the same cell)."""
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        cosine_topk_ivf,
    )

    emb = planted_clusters
    queries = emb.where(F.col("vec_id") % 10 == 0)
    exact = cosine_topk_bruteforce(emb, queries, k=3)
    # 20 hash-sampled centroids over 20 tight clusters: whichever rows
    # the hash picks, a cluster's members quantize to the SAME cell
    # (near-identical vectors), so neighbors stay co-probed.
    approx = cosine_topk_ivf(emb, queries, k=3, n_centroids=20, n_probe=2)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"IVF recall {recall:.2f}"


def test_rep_collapse_shrinks_pair_stream_and_expands_losslessly(spark):
    """On a dup-heavy corpus the collapsed pair search emits far fewer
    rows than the direct one, while expand_rep_pairs rebuilds the
    EXACT direct pair set (signatures are pure functions of text, so
    collapsing exact classes loses nothing)."""
    from web_analytics_visits_re_processing_spark.operators.dedup import (
        collapse_exact_reps,
        expand_rep_pairs,
        simhash_near_dup_pairs,
        simhash_near_dup_pairs_collapsed,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = base.replace("river", "creek")
    rows = (
        [(i, base) for i in range(8)]  # exact class of 8
        + [(10 + i, near) for i in range(5)]  # exact class of 5, near-dup of base
        + [(20, " ".join(f"tok{j}" for j in range(12)))]  # unrelated singleton
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    direct = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    collapsed = simhash_near_dup_pairs_collapsed(docs, max_hamming=3).collect()
    _, mapping = collapse_exact_reps(docs)
    rep_pairs = simhash_near_dup_pairs_collapsed(docs, max_hamming=3)
    expanded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in expand_rep_pairs(rep_pairs, mapping).collect()
    }
    assert expanded == direct and len(direct) > 0
    # 8+5 mutual near-dups → direct emits C(13,2)=78 pairs (plus none
    # for the singleton); collapsed emits ONE rep-level pair.
    assert len(direct) == 78
    assert len(collapsed) == 1
    assert collapsed[0]["n_docs_a"] * collapsed[0]["n_docs_b"] == collapsed[0][
        "n_expanded_pairs"
    ]

    # minhash twin: same collapse, jaccard scores (intra-class = 1.0)
    from web_analytics_visits_re_processing_spark.operators.dedup import (
        minhash_lsh_near_dups,
        minhash_near_dups_collapsed,
    )

    direct_mh = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_near_dups(docs, threshold=0.5).collect()
    }
    rep_mh = minhash_near_dups_collapsed(docs, threshold=0.5)
    expanded_mh = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in expand_rep_pairs(
            rep_mh, mapping, score_cols=("jaccard",), intra_values=(1.0,)
        ).collect()
    }
    assert expanded_mh == direct_mh and len(direct_mh) > 0
    assert rep_mh.count() < len(direct_mh)


def test_ivf_join_assignment_equals_literal_path(planted_clusters):
    """The broadcast-join max_by assignment (no collect, no literal
    tree) must be bit-identical to the literal-projection path — same
    hash-sampled centroids, same 8-dp rounding and smaller-cid
    tie-break, so identical cells, neighbors, and scores."""
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        cosine_topk_ivf,
        cosine_topk_ivf_join,
    )

    emb = planted_clusters
    queries = emb.where(F.col("vec_id") % 10 == 0)
    lit_path = {
        tuple(r)
        for r in cosine_topk_ivf(emb, queries, k=3, n_centroids=20, n_probe=2).collect()
    }
    join_path = {
        tuple(r)
        for r in cosine_topk_ivf_join(
            emb, queries, k=3, n_centroids=20, n_probe=2
        ).collect()
    }
    assert lit_path == join_path and len(lit_path) > 0


def test_ivf_centroid_budget_is_fixed_and_oracle_replayable(spark):
    """The centroid sample is O(n_centroids) regardless of corpus size
    (the round-2 scale-killer was an O(n/stride) collect), and the
    ranking hash is pure integer arithmetic that DuckDB replays
    bit-for-bit — the property the SQL oracle's ORDER BY/LIMIT rests
    on."""
    import duckdb

    from web_analytics_visits_re_processing_spark.operators.similarity import (
        centroid_rank_hash,
    )

    ids = spark.range(0, 5000).select(F.col("id").alias("vec_id"))
    picked = [
        r["vec_id"]
        for r in ids.orderBy(
            centroid_rank_hash(F.col("vec_id")).asc(), F.col("vec_id").asc()
        )
        .limit(16)
        .collect()
    ]
    assert len(picked) == 16
    duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT r AS vec_id FROM range(5000) t(r) "
            "ORDER BY ((r % 2147483648) * 1103515245 + 12345) % 2147483648, r "
            "LIMIT 16"
        ).fetchall()
    ]
    assert picked == duck


def test_dup_ngram_fraction_short_docs_have_zero_trigrams(spark, tmp_path):
    """A document under 3 tokens has NO trigrams (n_grams = 0), matching
    the oracle's empty-list branch — word_ngrams' clamp-to-one-short-gram
    convention (right for minhash shingles) must not leak into this
    query. The sf fixtures carry no <3-token docs, so this pins the
    guard on a fixture that does."""
    from web_analytics_visits_re_processing_spark.plans import ORACLES, QUERIES

    from tests.oracle_utils import assert_matches_oracle

    spark.createDataFrame(
        [
            (0, "one", "s"),
            (1, "two tokens", "s"),
            (2, "a a a a b", "s"),
        ],
        "doc_id long, text string, source string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["dup_ngram_fraction"](spark, str(tmp_path))
    got = {r["doc_id"]: r["n_grams"] for r in out.collect()}
    assert got[0] == 0 and got[1] == 0 and got[2] == 3
    assert_matches_oracle(out, ORACLES["dup_ngram_fraction"], str(tmp_path))


def test_winnowing_shared_substring_shares_fingerprint(spark):
    """Winnowing guarantee: documents sharing a long-enough substring
    (>= window+ngram-1 = 6 tokens here) share at least one
    fingerprint; fully unrelated docs share none."""
    from web_analytics_visits_re_processing_spark.functions.text import (
        winnowing_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (0, "intro words here " + shared + " tail one two"),
            (1, "completely different lead " + shared),
            (2, " ".join(f"q{i}" for i in range(30))),  # unrelated
        ],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in docs.select(
            "doc_id", winnowing_fingerprints("text", 3, 4).alias("fps")
        ).collect()
    }
    assert fps[0] & fps[1], "shared substring must share a fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])


def test_duplicated_ngram_spans_planted(spark):
    """Two docs share an exact 6-token run (planted); a third doc is
    all-unique tokens. The shared run must come back as ONE merged
    span covering exactly those 6 tokens in both docs (the three
    overlapping duplicated 4-grams merge), and the unique doc must
    not appear."""
    from web_analytics_visits_re_processing_spark.operators.dedup import (
        duplicated_ngram_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"u1 u2 u3 {shared} u4 u5"),
            (2, f"v1 {shared} v2 v3 v4 v5"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_ngram_spans(docs, n=4).collect()
    }
    assert set(out) == {1, 2}
    # doc 1: tokens 4..9 are the shared run; doc 2: tokens 2..7
    assert out[1]["n_spans"] == 1 and out[1]["dup_tokens"] == 6
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 6
    assert out[1]["dup_frac_e4"] == 6 * 10000 // 11


def test_duplicated_ngram_spans_internal_repetition(spark):
    """A single doc repeating its own 4-gram counts (corpus count ≥ 2
    within one document — the Lee et al. semantics), and disjoint
    duplicated regions stay separate spans."""
    from web_analytics_visits_re_processing_spark.operators.dedup import (
        duplicated_ngram_spans,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d x1 x2 x3 x4 x5 a b c d")],
        "doc_id long, text string",
    )
    rows = duplicated_ngram_spans(docs, n=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_spans"] == 2 and r["dup_tokens"] == 8


def test_kmeans_recovers_planted_clusters(spark):
    """Three tight, well-separated planted clusters; ids are laid out
    so the deterministic LCG init (ids 0, 37, 74 are the 3 smallest
    hashes in 0..89) seeds one centroid in each planted cluster —
    after one Lloyd round the planted partition is recovered exactly.
    (The fixture embeddings table's `label` column is NOT geometric —
    1-NN label accuracy there is chance level — so recovery is pinned
    on planted data instead.)"""
    from web_analytics_visits_re_processing_spark.operators.kmeans import (
        kmeans_assign,
    )

    centers = {0: (10.0, 0.0, 0.0), 1: (0.0, 10.0, 0.0), 2: (0.0, 0.0, 10.0)}
    # ids 0..29 -> planted 0, 30..59 -> planted 1, 60..89 -> planted 2
    # except we place the init ids 0/37/74 in distinct planted clusters
    # (they already are: 0->0, 37->1, 74->2).
    rows = []
    for i in range(90):
        planted = i // 30
        cx, cy, cz = centers[planted]
        j = (i % 7) * 0.01  # small deterministic jitter
        rows.append((i, [cx + j, cy - j, cz + 2 * j], planted))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    assigned = kmeans_assign(emb, k=3, n_updates=1).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    # every kmeans cluster maps 1:1 onto a planted cluster
    per = assigned.groupBy("cluster", "label").count().collect()
    assert len(per) == 3, per
    assert all(r["count"] == 30 for r in per), per


def test_minhash_params_deterministic_bounded_and_frozen_prefix():
    """Generated permutation params: first 8 are the frozen oracle
    constants; all A < 2^30 (the no-overflow contract for both
    engines); regeneration is bit-stable."""
    from web_analytics_visits_re_processing_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        minhash_params,
    )

    a, b = minhash_params(64)
    assert a[:8] == MINHASH_A and b[:8] == MINHASH_B
    assert len(a) == len(b) == 64
    assert all(1 <= x < (1 << 30) for x in a)
    assert all(1 <= x for x in b)
    assert minhash_params(64) == (a, b)
    assert minhash_params(16) == (a[:16], b[:16])


def test_minhash_realistic_catches_planted_near_dups(spark):
    """64-hash/16-band LSH at the 0.5 S-curve midpoint: planted
    high-Jaccard pairs (one word changed in 40) are found; unrelated
    docs are not paired."""
    from web_analytics_visits_re_processing_spark.operators.dedup import (
        minhash_lsh_near_dups,
    )

    base = " ".join(f"tok{(i * 17) % 97}x{i}" for i in range(40))
    variant = base.replace("tok0x0", "changedword")  # jaccard ≈ 37/43
    rows = [(1, base), (2, variant)]
    # unrelated fillers with disjoint vocabulary
    for i in range(3, 23):
        rows.append((i, " ".join(f"u{i}w{j}" for j in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_near_dups(
            docs, num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.8


def test_kmeans_join_variant_bit_identical_to_literal(spark):
    """The broadcast-join assignment escalation (>1k centroids) must
    agree with the literal-HOF path assignment-for-assignment — same
    exact int64 distances, same (d, cid) tie ordering."""
    from web_analytics_visits_re_processing_spark.operators.kmeans import (
        kmeans_assign,
    )

    rows = []
    for i in range(60):
        # deterministic mildly-clustered layout with boundary points
        rows.append((i, [float((i * 7) % 13) / 3, float((i * 5) % 11) / 4]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lit = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, k=5, n_updates=2, assign_via="literal").collect()
    }
    join = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, k=5, n_updates=2, assign_via="join").collect()
    }
    assert lit == join


def test_kmeans_identical_points_collapse_to_one_cluster(spark):
    """All-identical inputs: every init centroid coincides, ties all
    break to cid 0, the update drops the empty clusters, and the
    final assignment is a single surviving cluster."""
    from web_analytics_visits_re_processing_spark.operators.kmeans import (
        kmeans_assign,
    )

    emb = spark.createDataFrame(
        [(i, [0.25, -0.5, 0.125]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    rows = kmeans_assign(emb, k=3, n_updates=1).collect()
    assert {r["cluster"] for r in rows} == {0}


def test_pq_adc_retrieves_within_planted_cluster(spark):
    """PQ's contract on clustered data: with well-separated planted
    clusters, every ADC top-k neighbor of a query comes from the
    query's own cluster (cross-cluster ADC distance dwarfs the
    quantization error inside one)."""
    from web_analytics_visits_re_processing_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks,
    )

    centers = {0: (10.0, 0.0, 0.0, -5.0), 1: (0.0, 10.0, -5.0, 0.0),
               2: (-5.0, 0.0, 10.0, 5.0)}
    rows = []
    for i in range(90):
        planted = i // 30
        c = centers[planted]
        j = (i % 7) * 0.01
        vec = [c[d % 4] + j * ((d % 3) - 1) for d in range(64)]
        rows.append((i, vec, planted))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = emb.where(F.col("vec_id").isin(0, 30, 60))
    books = pq_codebooks(emb)
    got = pq_adc_topk(emb, queries, books, k=5).join(
        emb.select(F.col("vec_id"), F.col("label").alias("n_label")), "vec_id"
    )
    bad = got.where((F.col("query_id") / 30).cast("int") != F.col("n_label"))
    assert bad.count() == 0, bad.collect()


def test_pq_encode_zero_shuffle(spark, sf_dir):
    """Encode is a pure projection against codebook literals."""
    import re

    from web_analytics_visits_re_processing_spark.plans import QUERIES

    plan = (
        QUERIES["pq_encode_codes"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.findall(r"Exchange (?:hash|range|Single)", plan), plan


def test_incremental_minhash_dedup_cross_run(spark, tmp_path):
    """A new shard deduped against a frozen corpus via a PERSISTED band
    table: the planted cross-run dup is matched, the clean new doc is
    not, and the corpus is only consulted through the on-disk index +
    candidate verify join."""
    from web_analytics_visits_re_processing_spark.operators.dedup import (
        incremental_minhash_matches,
        minhash_band_table,
    )

    corpus = spark.createDataFrame(
        [
            (100, BASE),
            (101, "completely different content about database engines " * 3),
        ],
        "doc_id long, text string",
    )
    # "Run 1" freezes the corpus index to disk; "run 2" reads it back.
    idx_path = str(tmp_path / "band_index")
    minhash_band_table(corpus).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    new = spark.createDataFrame(
        [
            (200, BASE.replace("summer", "winter")),  # near-dup of corpus 100
            (201, "an entirely unrelated document about orbital mechanics " * 3),
        ],
        "doc_id long, text string",
    )
    got = {
        r["new_id"]: r
        for r in incremental_minhash_matches(
            new, corpus, index, threshold=0.5
        ).collect()
    }
    assert set(got) == {200, 201}
    assert got[200]["is_dup"] and got[200]["matched_corpus_id"] == 100
    assert got[200]["jaccard"] >= 0.8
    assert not got[201]["is_dup"]
    assert got[201]["matched_corpus_id"] is None and got[201]["jaccard"] is None


def test_pii_redaction_planted(spark):
    from web_analytics_visits_re_processing_spark.plans.llmdata import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.co.uk host 192.168.0.1 call +4915512345678 done")],
        "doc_id long, text string",
    )
    got = df.select(redact_pii(F.col("text")).alias("t")).first()["t"]
    assert got == "mail <EMAIL> host <IP> call <PHONE> done", got


def test_leakage_safe_split_keeps_clusters_together(planted_docs):
    """Docs 0/1/2 form one near-dup cluster — they must all land on
    the SAME side of the split, whatever side that is."""
    from web_analytics_visits_re_processing_spark.functions.text import hash64
    from web_analytics_visits_re_processing_spark.operators.dedup import (
        minhash_lsh_near_dups,
    )
    from web_analytics_visits_re_processing_spark.operators.graph import (
        dedup_components,
    )

    docs = planted_docs
    pairs = minhash_lsh_near_dups(docs, threshold=0.5).select("id_a", "id_b")
    comp = dedup_components(docs, pairs).select("doc_id", "component")
    side = hash64(F.col("component").cast("string")) % 10
    rows = {
        r["doc_id"]: (r["component"], r["split"])
        for r in comp.select(
            "doc_id",
            "component",
            F.when(side < 8, "train").otherwise("val").alias("split"),
        ).collect()
    }
    assert rows[0][0] == rows[1][0] == rows[2][0] == 0  # one cluster
    assert rows[0][1] == rows[1][1] == rows[2][1]       # one side
    assert {rows[3][0], rows[4][0]} == {3, 4}           # singletons intact


def test_curation_stages_compose(spark):
    """Each rejection reason fires independently and the kept bit is
    their conjunction: a good doc survives, its exact copy is dropped
    as a dup, a doc sharing a 5-gram with the eval split is dropped as
    contaminated, and a tiny doc fails quality."""
    from web_analytics_visits_re_processing_spark.functions.text import (
        exact_fingerprint,
    )
    from web_analytics_visits_re_processing_spark.operators.corpus import (
        contamination_flags,
    )

    good = ("the data " + "value table row scan key " * 8).strip()  # 42 toks
    eval_text = "benchmark secret answer sequence here plus context"
    leaky = good + " benchmark secret answer sequence here"
    train = spark.createDataFrame(
        [(1, good), (2, good), (3, leaky), (4, "tiny doc")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(970, eval_text)], "doc_id long, text string")

    from pyspark.sql import Window

    wfp = Window.partitionBy(exact_fingerprint("text"))
    dup = train.select(
        "doc_id", (F.col("doc_id") != F.min("doc_id").over(wfp)).alias("is_dup")
    )
    contam = contamination_flags(train, ev, n=5, min_overlap=1).select(
        "doc_id", "contaminated"
    )
    got = {
        r["doc_id"]: r
        for r in dup.join(contam, "doc_id").collect()
    }
    assert not got[1]["is_dup"] and got[2]["is_dup"]
    assert got[3]["contaminated"] and not got[1]["contaminated"]


def test_semdedup_planted_dup_and_cluster_blindness(spark):
    """SemDeDup semantics on planted geometry: two near-identical
    vectors in the same k-means cluster -> the HIGHER id is flagged
    and the lower survives as the representative; a third vector that
    is similar to one of them but lands in a DIFFERENT cluster is NOT
    flagged (cluster-blindness is the paper's documented recall
    trade-off - pair search never crosses cluster boundaries)."""
    from web_analytics_visits_re_processing_spark.operators.semdedup import (
        semdedup_verdicts,
    )

    centers = {0: (10.0, 0.0, 0.0), 1: (0.0, 10.0, 0.0), 2: (0.0, 0.0, 10.0)}
    rows = []
    for i in range(90):
        planted = i // 30
        cx, cy, cz = centers[planted]
        j = (i % 7) * 0.01
        rows.append((i, [float(cx + j), float(cy - j), float(cz + 2 * j)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["is_semantic_dup"]
        for r in semdedup_verdicts(emb, k=3, n_updates=1, tau=0.999).collect()
    }
    # ids 0 and 7 share jitter j=0 -> identical vectors, same cluster:
    # higher id flagged, lower (the representative) not.
    assert got[7] is True and got[0] is False
    # every within-cluster jittered vector is cosine>=0.999 to its
    # cluster-mates here, so only the min id of each planted cluster
    # survives; cross-cluster vectors (e.g. 30 vs 0) are orthogonal
    # and cluster-separated -> min ids of OTHER clusters not flagged.
    assert got[30] is False and got[60] is False
    assert sum(1 for v in got.values() if not v) == 3


def test_semdedup_arrow_scorer_matches_fold(spark, sf_dir):
    """r14: the NumPy per-cluster scorer (``scorer='arrow'``) and the
    exact interpreted-fold path (``scorer='fold'``) return IDENTICAL
    verdicts on the real fixture — the gate the Arrow adoption rides
    on (its docstring's decision-equivalence argument, checked)."""
    from web_analytics_visits_re_processing_spark.operators.semdedup import (
        semdedup_verdicts,
    )
    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    arrow = {
        (r["vec_id"], r["cluster"], r["is_semantic_dup"])
        for r in semdedup_verdicts(emb, k=10, n_updates=1, tau=0.35).collect()
    }
    fold = {
        (r["vec_id"], r["cluster"], r["is_semantic_dup"])
        for r in semdedup_verdicts(
            emb, k=10, n_updates=1, tau=0.35, scorer="fold"
        ).collect()
    }
    assert arrow == fold and len(arrow) > 0


def test_semdedup_hit_threshold_replicates_spark_round(spark):
    """``_hit_threshold``'s claim: ``round(v,4) >= tau ⇔ v >= v*`` for
    every double — probed against Spark's own ROUND on the doubles
    adjacent to the boundary and a grid around it."""
    import math

    from web_analytics_visits_re_processing_spark.operators.semdedup import (
        _hit_threshold,
    )

    v_star = _hit_threshold(0.35)
    probes = [v_star, math.nextafter(v_star, -math.inf),
              math.nextafter(v_star, math.inf)]
    probes += [0.34990 + i * 1e-5 for i in range(11)]  # 0.3499..0.3500
    df = spark.createDataFrame([(v,) for v in probes], "v double")
    rows = df.select(
        "v",
        (F.round("v", 4) >= 0.35).alias("spark_hit"),
        (F.col("v") >= F.lit(v_star)).alias("fast_hit"),
    ).collect()
    for r in rows:
        assert r["spark_hit"] == r["fast_hit"], r["v"]


def test_semdedup_fixture_margin_vs_boundary(spark, sf_dir):
    """BLAS-vs-fold summation noise (~1e-15 relative) can only flip a
    verdict if a pair's cosine sits within that distance of v* — pin
    that the fixture keeps every within-cluster pair ≫ 1e-9 away."""
    import numpy as np

    from web_analytics_visits_re_processing_spark.operators.kmeans import (
        kmeans_assign,
    )
    from web_analytics_visits_re_processing_spark.operators.semdedup import (
        _hit_threshold,
    )
    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(
        emb, k=10, n_updates=1, keep_cols=("embedding",)
    ).collect()
    v_star = _hit_threshold(0.35)
    by_cluster: dict = {}
    for r in assigned:
        by_cluster.setdefault(r["cluster"], []).append(r["embedding"])
    min_margin = math_inf = float("inf")
    for vecs in by_cluster.values():
        if len(vecs) < 2:
            continue
        x = np.asarray(vecs, dtype=np.float64)
        nrm = np.sqrt((x * x).sum(axis=1))
        cos = (x @ x.T) / np.outer(nrm, nrm)
        iu = np.triu_indices(len(vecs), k=1)
        min_margin = min(min_margin, float(np.abs(cos[iu] - v_star).min()))
    assert min_margin != math_inf
    assert min_margin > 1e-9, min_margin


def test_inverted_index_truncates_postings_at_20(spark):
    """A term present in 25 docs keeps df/tf_total over the FULL
    corpus but its posting head stops at the 20 smallest doc ids; a
    rare term keeps its complete (short) list."""
    import __spark_entry__ as e

    rows = [(i, "common common filler") for i in range(25)]
    rows += [(100, "rare filler"), (101, "rare thing")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # drive the registered query body against a temp view-free path:
    # rebuild the same plan via the module under test
    from pyspark.sql import Window, functions as F

    td = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    rn = Window.partitionBy("term").orderBy("doc_id")
    out = (
        td.withColumn("_rn", F.row_number().over(rn))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("tf_total"),
            F.array_join(
                F.sort_array(
                    F.collect_list(F.when(F.col("_rn") <= 20, F.col("doc_id")))
                ),
                ",",
            ).alias("postings_head_csv"),
        )
    )
    got = {r["term"]: r for r in out.collect()}
    assert got["common"]["df"] == 25 and got["common"]["tf_total"] == 50
    assert got["common"]["postings_head_csv"] == ",".join(map(str, range(20)))
    assert got["rare"]["df"] == 2
    assert got["rare"]["postings_head_csv"] == "100,101"


def test_pmi_ranks_planted_collocation_first(spark):
    """'aa bb' always adjacent (perfect collocation) must out-score
    'xx yy', where xx and yy are equally frequent but co-occur only
    sometimes — PMI rewards co-occurrence beyond chance, raw bigram
    count alone would tie them."""
    from pyspark.sql import functions as F

    # aa bb: 6 adjacent occurrences, aa/bb appear ONLY together.
    # xx yy: 6 adjacent too, but xx and yy each appear 30 more times
    # scattered alone -> far lower PMI at equal c_xy.
    rows = [(i, "aa bb " + " ".join(["xx pad yy qq"] * 5)) for i in range(6)]
    rows += [(10 + i, "xx yy pad pad") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = docs.select(F.split("text", " ").alias("t"))
    uni = toks.select(F.explode("t").alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = uni.agg(F.sum("c").alias("n_uni"))
    bi = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.array_join(F.slice(F.col("t"), i, 2), " "),
                )
            ).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= 5)
    )
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c_y"))
    scored = (
        bi.select(
            F.split("gram", " ")[0].alias("w1"),
            F.split("gram", " ")[1].alias("w2"),
            "c_xy",
        )
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1", "w2",
            F.expr("((c_xy * n_uni) div c_x) * 1000000 div c_y").alias("s"),
        )
        .collect()
    )
    s = {(r["w1"], r["w2"]): r["s"] for r in scored}
    assert s[("aa", "bb")] > s[("xx", "yy")]


def test_hard_negatives_exclude_same_label(spark):
    """Planted geometry: the nearest vector overall shares the
    anchor's label and must be SKIPPED; the top hard negative is the
    nearest different-label vector; ranks are dense over negatives
    only."""
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        hard_negatives,
    )

    rows = [
        (0, [1.0, 0.0, 0.0], 7),   # anchor
        (1, [0.99, 0.14, 0.0], 7), # same label, most similar -> excluded
        (2, [0.9, 0.43, 0.0], 3),  # best hard negative
        (3, [0.0, 1.0, 0.0], 3),
        (4, [0.0, 0.0, 1.0], 5),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negatives(
        emb, emb.where("vec_id = 0"), k=3
    ).orderBy("rk").collect()
    assert [r["vec_id"] for r in got] == [2, 3, 4]
    assert got[0]["rk"] == 1 and 1 not in {r["vec_id"] for r in got}
