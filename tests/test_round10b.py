"""Round-10 operator pins: label propagation (planted two-community
graph), the Gopher top-n-gram repetition gates (hand-computed char
fractions + degenerate docs), the bucketed co-located join (plan
shape: SortMergeJoin, ONE shuffle exchange total, no re-sort, one
file per bucket), and IVF+PQ composition (ADC distances must equal
the flat-ADC kernel restricted to the IVF candidate set)."""

from __future__ import annotations

import glob
import os
import re
import tempfile

from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str, sf_dir: str = SF_DIR) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# --- label propagation ----------------------------------------------------------

def test_label_propagation_splits_bridged_triangles(spark):
    """Two triangles joined by one bridge edge: connected components
    would merge them into ONE cluster; 4-round deterministic LPA must
    find TWO (the whole point of having a second community detector).
    Expected labels hand-computed round by round."""
    from web_analytics_visits_re_processing_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "id_a long, id_b long",
    )
    nodes = (
        edges.select(F.col("id_a").alias("node"))
        .union(edges.select("id_b"))
        .distinct()
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(nodes, edges, node_col="node").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_label_propagation_isolated_node_keeps_label(spark):
    """A node present in `nodes` but with no incident edge must keep
    its own label through every round (the coalesce branch). The
    connected pair exhibits the classic synchronous-LPA bipartite
    oscillation (labels swap every round), so after an EVEN round
    count each keeps its own label — pinned here as the documented
    deterministic behavior, not a bug."""
    from web_analytics_visits_re_processing_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(1,), (2,), (9,)], "node long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(nodes, edges, node_col="node").collect()
    }
    assert got == {1: 1, 2: 2, 9: 9}


# --- Gopher top-n-gram repetition -----------------------------------------------

def test_gopher_ngram_repetition_hand_computed(spark, tmp_path):
    """'a b a b a b c': top bigram 'a b'×3 (2 token chars each → 6 of
    tc=7), top trigram ('a b a' or 'b a b')×2 (3 chars → 6 of 7) —
    both gates fail. Single-token and empty-ish docs have no n-grams:
    0 chars, gates pass."""
    spark.createDataFrame(
        [
            (1, "a b a b a b c"),
            (2, "hello"),
            (3, "x y z w"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in QUERIES["gopher_ngram_repetition"](
            spark, str(tmp_path)
        ).collect()
    }
    r1 = rows[1]
    assert r1["n_tokens"] == 7
    assert r1["top_bigram_chars"] == 6  # 3 × ('a b' → 2 chars)
    assert r1["top_trigram_chars"] == 6  # 2 × ('a b a' → 3 chars)
    assert not r1["bigram_ok"] and not r1["trigram_ok"] and not r1["keep"]
    r2 = rows[2]
    assert (r2["top_bigram_chars"], r2["top_trigram_chars"]) == (0, 0)
    assert r2["keep"]
    # 'x y z w': every bigram unique → top is 1×2 chars of tc=4;
    # 2·5 > 4 so even one occurrence fails the 20% gate on a tiny doc
    # (faithful to Gopher — the word-count gate owns short docs).
    r3 = rows[3]
    assert r3["top_bigram_chars"] == 2 and not r3["bigram_ok"]


def test_gopher_ngram_zero_shuffle_projection(spark):
    """The whole signal is array-side per document — no exchange, no
    Python, single scan."""
    plan = _plan(spark, "gopher_ngram_repetition")
    assert len(re.findall(r"Exchange (?:hash|range|Single)", plan)) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("FileScan parquet") == 1, plan


# --- bucketed co-located join ---------------------------------------------------

def test_bucketed_join_no_shuffle(spark):
    """Both sides bucketed on the join key: the SortMergeJoin must
    consume the co-located buckets directly — the ONLY shuffle
    exchange in the whole plan is the final priority rollup. (The
    per-bucket in-memory Sort remains under default conf — Spark ≥3
    doesn't report bucket sort order unless the legacy flag is on;
    see the elision test below.)"""
    plan = _plan(spark, "bucketed_join_roundtrip")
    assert "SortMergeJoin" in plan, plan
    assert len(re.findall(r"Exchange (?:hash|range|Single)", plan)) == 1, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_bucketed_join_sort_elided_with_output_ordering(spark):
    """With exactly one file per bucket the legacy
    ``bucketedTableScan.outputOrdering`` flag is safe and elides the
    per-bucket Sort as well — the join becomes a pure zip of
    pre-sorted co-located streams. Set/restore guarded: the flag is
    session state and can claim a FALSE order with >1 file/bucket."""
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    old = spark.conf.get(key, "false")
    try:
        spark.conf.set(key, "true")
        plan = _plan(spark, "bucketed_join_roundtrip")
        assert "SortMergeJoin" in plan, plan
        assert "Sort [" not in plan, plan
        assert len(re.findall(r"Exchange (?:hash|range|Single)", plan)) == 1, plan
    finally:
        spark.conf.set(key, old)


def test_bucketed_write_one_file_per_bucket(spark):
    """repartition(8, key) before bucketBy(8, key) uses the same
    murmur3 pmod — each task holds exactly one bucket, so each table
    lands as exactly 8 data files (the precondition for sorted
    bucket reads). Locations come from the catalog (via the staged
    table names `_ensure_bucketed` returns) — never a re-derived
    copy of the layout module's tag format."""
    from web_analytics_visits_re_processing_spark.plans.round10 import (
        _ensure_bucketed,
    )

    for fq in _ensure_bucketed(spark, SF_DIR):
        loc_rows = [
            r.data_type
            for r in spark.sql(f"DESCRIBE FORMATTED {fq}").collect()
            if r.col_name == "Location"
        ]
        assert len(loc_rows) == 1, fq
        loc = loc_rows[0].removeprefix("file:")
        files = [
            f
            for f in glob.glob(os.path.join(loc, "part-*"))
            if not f.endswith(".crc")
        ]
        assert len(files) == 8, (fq, files)


# --- IVF + PQ composition --------------------------------------------------------

def test_ivf_pq_distances_equal_flat_adc(spark):
    """The composed kernel must change WHICH candidates are scored
    (IVF cells) but never HOW: joining its output against the flat
    pq_adc_topk ranking with k ≥ corpus size, every (query, neighbor)
    pair's integer ADC distance must match exactly."""
    from web_analytics_visits_re_processing_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks,
        pq_ivf_adc_topk,
    )
    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    queries = emb.where(F.col("vec_id") < 5)
    books = pq_codebooks(emb)
    composed = pq_ivf_adc_topk(emb, queries, books, k=5)
    flat = pq_adc_topk(emb, queries, books, k=n).select(
        "query_id", "vec_id", F.col("adc_dist").alias("flat_dist")
    )
    rows = composed.join(flat, ["query_id", "vec_id"], "left").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["flat_dist"] is not None
        assert r["adc_dist"] == r["flat_dist"], r


def test_ivf_pq_neighbors_come_from_probed_cells(spark):
    """Every returned neighbor must live in one of its query's
    n_probe probed cells — the candidate-bounding contract."""
    from web_analytics_visits_re_processing_spark.operators.pq import (
        pq_codebooks,
        pq_ivf_adc_topk,
    )
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        ivf_assign_literal,
    )
    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    books = pq_codebooks(emb)
    out = pq_ivf_adc_topk(emb, queries, books, k=5)
    corpus_cells, probes = ivf_assign_literal(emb, queries)
    probed = {
        (r["query_id"], r["_cell"])
        for r in probes.select("query_id", "_cell").collect()
    }
    cell_of = {
        r["vec_id"]: r["_cell"]
        for r in corpus_cells.select("vec_id", "_cell").collect()
    }
    for r in out.collect():
        assert (r["query_id"], cell_of[r["vec_id"]]) in probed, r


# --- golden record survivorship ---------------------------------------------------

def test_golden_record_survivorship_planted(spark, tmp_path):
    """Users {0,1,3,6} stitch into visitor 0 (ck_0 welds {0,1}, em_0
    welds {0,3,6}); {8,9} into visitor 8 (ck_4). Recency rule: the
    latest (ts, event_id) event's type survives per cluster."""
    import datetime as dt

    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, dt.datetime(2024, 1, 1, 10), 0, "view", 1.00),
        (2, dt.datetime(2024, 1, 2, 10), 1, "click", 2.00),
        (3, dt.datetime(2024, 1, 3, 10), 3, "view", 3.00),
        (4, dt.datetime(2024, 1, 4, 10), 6, "purchase", 4.00),  # latest
        (5, dt.datetime(2024, 1, 1, 9), 8, "view", 10.00),
        (6, dt.datetime(2024, 1, 1, 9), 9, "signup", 20.00),  # tie ts → id 6
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["visitor"]: r
        for r in QUERIES["golden_record_survivorship"](
            spark, str(tmp_path)
        ).collect()
    }
    v0 = got[0]
    assert v0["n_devices"] == 4 and v0["n_events"] == 4
    assert v0["last_event_type"] == "purchase"
    assert v0["total_value_cents"] == 1000
    v8 = got[8]
    assert v8["n_devices"] == 2 and v8["n_events"] == 2
    assert v8["last_event_type"] == "signup"  # equal ts, larger event_id


def test_golden_record_no_per_visitor_window_sort(spark):
    """The recency rule must ride the aggregation (max_by), not a
    per-visitor row_number window over the events join."""
    plan = _plan(spark, "golden_record_survivorship")
    assert "max_by" in plan, plan
    assert "row_number" not in plan, plan


# --- incremental rollup merge -----------------------------------------------------

def test_incremental_rollup_merge_not_avg_of_avgs(spark, tmp_path):
    """Planted group where the merged average differs from the
    average-of-averages: base batch 3×100 cents, late batch (event_id
    % 10 == 0) 1×500 cents → merged avg 200 cents (2e8 ppm), while
    avg-of-avgs would claim 300. Both sides contribute to the SAME
    (type, day) group — the merge is real, not partition-disjoint."""
    import datetime as dt

    day = dt.datetime(2024, 3, 1, 12)
    rows = [
        (1, day, 1, "c", 1.00),
        (2, day, 1, "c", 1.00),
        (3, day, 1, "c", 1.00),
        (10, day, 2, "c", 5.00),  # late batch
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    [r] = QUERIES["incremental_rollup_merge"](spark, str(tmp_path)).collect()
    assert r["n"] == 4
    assert r["sum_cents"] == 800
    assert (r["min_cents"], r["max_cents"]) == (100, 500)
    assert r["avg_cents_ppm"] == 200_000_000  # NOT 300_000_000


def test_bucketed_agg_no_exchange_for_fact_grain(spark):
    """groupBy on the bucket key: the fact-sized per-order aggregate
    must ride the bucketed scan's distribution with NO exchange; the
    only shuffle is the tiny order-size histogram rollup."""
    plan = _plan(spark, "bucketed_agg_order_sizes")
    assert len(re.findall(r"Exchange (?:hash|range|Single)", plan)) == 1, plan
    # the one exchange must be on the HISTOGRAM key, not the fact key
    m = re.search(r"Exchange hashpartitioning\((\w+)", plan)
    assert m and m.group(1).startswith("n_items"), plan


# --- cross-device sessionization ---------------------------------------------------

def test_cross_device_sessionize_planted(spark, tmp_path):
    """Device hop inside the gap = ONE stitched session with
    n_devices=2 (users 0,1 weld via ck_0); a 90-min gap on the {8,9}
    cluster splits into two sessions."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 0, "view", 1.0),
        (2, dt.datetime(2024, 1, 1, 10, 10), 1, "click", 2.0),
        (3, dt.datetime(2024, 1, 1, 10, 20), 0, "purchase", 3.0),
        (4, dt.datetime(2024, 1, 1, 10, 0), 8, "view", 1.0),
        (5, dt.datetime(2024, 1, 1, 11, 30), 9, "view", 1.0),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["cross_device_sessionize"](spark, str(tmp_path)).collect()
    by_visitor = {}
    for r in out:
        by_visitor.setdefault(r["visitor"], []).append(r)
    # visitor 0 = {0,1,3,6} but only 0,1 have events: one 3-event session
    [s0] = by_visitor[0]
    assert s0["n_events"] == 3 and s0["n_devices"] == 2
    # visitor 8 = {8,9}: 90-min gap > 30-min window → two 1-event sessions
    assert len(by_visitor[8]) == 2
    assert all(s["n_events"] == 1 and s["n_devices"] == 1 for s in by_visitor[8])


# --- LSH edit-distance verify -------------------------------------------------------

def test_lsh_edit_verified_planted(spark, tmp_path):
    """A doc pair differing by one 3-char word must surface as an LSH
    candidate with lev == 3 and edit_ok; a structurally different doc
    must not pair with either."""
    base = " ".join(f"tok{i}" for i in range(30))
    near = base.replace("tok7", "zzz7")  # one word, 3 substituted chars
    other = " ".join(f"w{i}x" for i in range(40, 80))
    spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    # fresh staging per tmp fixture dir (sf key includes the path)
    out = QUERIES["lsh_edit_verified_pairs"](spark, str(tmp_path)).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in out}
    assert (1, 2) in pairs, pairs
    r = pairs[(1, 2)]
    assert r["lev"] == 3 and r["edit_ok"], r
    assert all(3 not in k for k in pairs), pairs


def test_lsh_edit_reads_staged_candidates(spark):
    """The verify must consume the once-per-corpus staged candidate
    table, not re-run the banding pipeline."""
    plan = _plan(spark, "lsh_edit_verified_pairs")
    assert "wavrp_stage_" in plan and "/lsh_cand_64_16" in plan, plan


# --- URL canonicalization -----------------------------------------------------------

def test_parse_url_canonicalization_recipe(spark):
    """The parse_url recipe must collapse case/tracking/fragment
    variants of one logical page to a single canonical form."""
    variants = [
        "https://Shop-1.Example.COM/p/7?utm_source=mail&pid=7&sess=3#top",
        "https://shop-1.example.com/p/7?pid=7&utm_source=ad&sess=6#mid",
        "https://SHOP-1.EXAMPLE.com/p/7?sess=0&pid=7",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "raw_url string")
    out = df.select(
        F.concat(
            F.lit("https://"),
            F.lower(F.parse_url("raw_url", F.lit("HOST"))),
            F.parse_url("raw_url", F.lit("PATH")),
            F.lit("?pid="),
            F.parse_url("raw_url", F.lit("QUERY"), F.lit("pid")),
        ).alias("canonical_url")
    ).collect()
    assert {r["canonical_url"] for r in out} == {
        "https://shop-1.example.com/p/7?pid=7"
    }


# --- best-quality survivor ----------------------------------------------------------

def test_best_quality_survivor_beats_canonical_id(spark, tmp_path):
    """A 2-doc near-dup cluster where the HIGHER-quality member has
    the LARGER id: keep-smallest-id would delete the cleaner copy;
    the survivor rule must keep doc 2 (stopwords raise its
    quality_score)."""
    base = " ".join(f"tok{i}" for i in range(30))
    better = base.replace("tok5", "the").replace("tok20", "of")
    spark.createDataFrame(
        [(1, base), (2, better), (7, "solo " + " ".join(f"z{i}" for i in range(15)))],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["component"]: r
        for r in QUERIES["dedup_best_quality_survivor"](
            spark, str(tmp_path)
        ).collect()
    }
    cluster = rows[1]  # component label = min doc_id
    assert cluster["cluster_size"] == 2
    assert cluster["survivor_doc_id"] == 2  # NOT the canonical min-id
    assert rows[7]["cluster_size"] == 1 and rows[7]["survivor_doc_id"] == 7


# --- extra edge pins (test-only; no registry/artifact impact) -----------------------

def test_label_propagation_clique_converges_to_min(spark):
    """On a clique every node sees all other labels each round; by
    round 2 everyone holds the minimum — and stays there (absorbing
    state despite synchronous updates)."""
    from itertools import combinations

    from web_analytics_visits_re_processing_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(a, b) for a, b in combinations([3, 5, 8, 11], 2)],
        "id_a long, id_b long",
    )
    nodes = edges.select(F.col("id_a").alias("node")).union(
        edges.select("id_b")
    ).distinct()
    got = {
        r["node"]: r["label"]
        for r in label_propagation(nodes, edges, node_col="node").collect()
    }
    assert got == {3: 3, 5: 3, 8: 3, 11: 3}


def test_gopher_two_token_doc_has_bigram_no_trigram(spark, tmp_path):
    """Exactly one bigram, zero trigrams: the trigram branch must
    yield 0 chars and pass its gate while the bigram branch counts."""
    spark.createDataFrame(
        [(1, "aa bb")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    [r] = QUERIES["gopher_ngram_repetition"](spark, str(tmp_path)).collect()
    assert r["n_tokens"] == 2
    assert r["top_bigram_chars"] == 4  # 1 × ('aa bb' → 4 token chars)
    assert r["top_trigram_chars"] == 0 and r["trigram_ok"]


def test_incremental_merge_late_only_group_survives(spark, tmp_path):
    """A (type, day) group fed ONLY by the late batch must still
    appear in the merged rollup (union, not join, semantics)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 3, 1, 9), 1, "base_only", 1.00),
        (10, dt.datetime(2024, 3, 2, 9), 1, "late_only", 2.00),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r["event_type"], r["day"]): r
        for r in QUERIES["incremental_rollup_merge"](spark, str(tmp_path)).collect()
    }
    assert got[("base_only", "2024-03-01")]["n"] == 1
    assert got[("late_only", "2024-03-02")]["n"] == 1
    assert got[("late_only", "2024-03-02")]["sum_cents"] == 200
