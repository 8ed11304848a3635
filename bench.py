"""Benchmark harness: runs the headline query inventory at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": <sf>}

Each query is FULLY MATERIALIZED with a noop-format write: every
expression is executed for every row. (``count()`` alone is wrong for
projection-only queries — Catalyst prunes the computed columns under
``count(1)`` and you time a bare scan.) Quadratic-oracle demos are
excluded; every headline query is a scale-shaped plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # reference surface
    "sessionize_visits",
    "sessionize_hits",
    "streaming_sessionize_visits",
    "hitlog_parse_flags",
    "hitlog_sessionize",
    # relational
    "q1_pricing_summary",
    "join_revenue_by_region",
    "join_left_customer_order_counts",
    "range_join_lineitem_ship_window",
    "agg_rollup_orders",
    "count_distinct_nations_per_segment",
    "window_rank_top3_parts_per_brand",
    "topk_orders_by_price",
    "json_props_per_event_type",
    # llm-data extensions
    "doc_token_stats",
    "dedup_exact_groups",
    "minhash_signatures",
    "simhash_near_dup_pairs",
    "embedding_cosine_topk",
    "embedding_cosine_topk_lsh_multiprobe",
    "multimodal_image_meta",
    "multimodal_png_meta",
    # round-3 additions
    "dedup_connected_components",
    "tfidf_top_terms",
    "token_entropy",
    "doc_chunks_overlap",
    "multimodal_resize_pixels",
    "funnel_stage_counts",
    "session_path_3grams",
    "argmax_event_per_user",
    "gap_fill_hourly_counts",
    "cdc_merge_latest_state",
    # round-4 additions (driver round r03)
    "sql_q5_regional_supplier_volume",
    "bloom_pruned_join_urgent_items",
    "hll_distinct_users_estimate",
    "dup_ngram_spans",
    "quality_filter_flags",
    "kmeans_embedding_clusters",
    "pagerank_prop_transitions",
    "pq_adc_topk_neighbors",
    # round-5 additions
    "minhash_realistic_near_dup_pairs",
    "kmeans_embedding_clusters_join",
    "decontaminate_train_docs",
    "pack_training_sequences",
    "embedding_cosine_topk_jl_rerank",
    "dsir_importance_scores",
    "interpolate_hourly_value_series",
    "sql_q8_national_market_share",
    "sql_q21_waiting_suppliers",
    "arrow_byte_stats",
]


def materialize(df) -> None:
    """Execute the full plan for every row (noop write sink)."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from web_analytics_visits_re_processing_spark.plans import QUERIES
    from web_analytics_visits_re_processing_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    # warm the JVM/codegen paths once with a trivial action
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_inventory_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
