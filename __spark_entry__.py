"""Driver contract facade (see repo docstring history for the spec).

``entry(spark)`` — flagship sessionization at sf0.001.
``queries()`` / ``oracle_sql()`` — the declared operator inventory,
populated from ``web_analytics_visits_re_processing_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter the driver's cwd.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from web_analytics_visits_re_processing_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: sessionize the sf0.001 events stream into visits."""
    return QUERIES["sessionize_visits"](spark, "/root/testdata/sf0.001")


def _sampling_history() -> tuple[set[str], set[str]]:
    """From the committed CORRECTNESS_r*.json artifacts: (queries ever
    sampled by a driver round, queries NOT fully passing in the LATEST
    round — errors/mismatches that need a fresh hard signal)."""
    import glob
    import json
    import re

    seen: set[str] = set()
    latest_bad: set[str] = set()
    paths = sorted(
        glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    for i, path in enumerate(paths):
        try:
            with open(path) as f:
                payload = json.load(f)
        except (OSError, ValueError):
            continue
        rows = payload.get("queries", payload) if isinstance(payload, dict) else {}
        if not isinstance(rows, dict):
            continue
        seen.update(rows.keys())
        if i == len(paths) - 1:
            for name, rec in rows.items():
                # record shape: {err, rows_match, schema_match,
                # hash_match, spark_rows, oracle_rows}; None = not
                # applicable (e.g. rows-only gates), False = failed.
                ok = (
                    isinstance(rec, dict)
                    and not rec.get("err")
                    and rec.get("rows_match") is not False
                    and rec.get("schema_match") is not False
                    and rec.get("hash_match") is not False
                )
                if not ok:
                    latest_bad.add(name)
    return seen, latest_bad


# Round-5 pinned tier: (a) the r04 LOCAL-sweep-red queries outside the
# driver's r04 sample (whole-tier proof that the TIMESTAMP_NTZ fix
# landed — streaming replays + the timestamp-consuming webanalytics
# trio), (b) this round's new operators (first-ever hard signal).
_PINNED = frozenset(
    {
        "streaming_sessionize_visits",
        "streaming_tumbling_counts",
        "streaming_sliding_counts",
        "streaming_abandoned_sessions",
        "streaming_dedup_events",
        "streaming_interval_join",
        "streaming_interval_join_left",
        "streaming_interval_join_full",
        "streaming_foreach_batch_upsert",
        "streaming_cms_event_counts",
        "streaming_hll_registers",
        "attribution_last_touch",
        "session_path_3grams",
        "bounce_rate_weekly",
        "minhash_realistic_near_dup_pairs",
        "kmeans_embedding_clusters_join",
        "decontaminate_train_docs",
        "pack_training_sequences",
        "temperature_sample_langs",
        "embedding_cosine_topk_jl_rerank",
        "arrow_byte_stats",
        "interpolate_hourly_value_series",
        "dsir_importance_scores",
        "conversion_latency_histogram",
        "session_entry_exit_matrix",
        "repeat_purchase_intervals",
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered for the driver's 50-query-prefix sample:
    (1) queries that errored/mismatched in the LATEST driver round —
    a regression fix needs a fresh hard signal the round after;
    (2) the pinned tier above;
    (3) queries never sampled by any round — steadily converts
    local-only signals into driver-verified ones;
    (4) everything else, registry order. Self-maintaining: any future
    regression automatically re-enters the next round's sample."""
    seen, latest_bad = _sampling_history()

    def prio(name: str) -> int:
        if name in latest_bad:
            return 0
        if name in _PINNED:
            return 1
        return 2 if name not in seen else 3

    ordered = sorted(QUERIES, key=lambda name: (prio(name),))
    return {name: QUERIES[name] for name in ordered}


def oracle_sql() -> dict[str, str]:
    order = {name: i for i, name in enumerate(queries())}
    return dict(sorted(ORACLES.items(), key=lambda kv: order[kv[0]]))
