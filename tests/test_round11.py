"""Round-11 pins: staged IVF corpus-cell assignment (both literal-path
ANN consumers must bottom out at the SAME ``ivf_cells_64`` parquet
leaf — the r10 verdict's restaging fix), count-banded at-scale
downgrade arms (profile distinct → HLL, ntile → histogram cuts), and
the bucketed-layout referential-integrity consumer."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str, sf_dir: str = SF_DIR) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# --- staged IVF corpus cells -------------------------------------------------


def test_ivf_literal_consumers_read_staged_cells(spark):
    """`embedding_cosine_topk_ivf` and `embedding_topk_ivf_pq` both
    recomputed the interpreted 64-cosine HOF assignment per
    invocation (8.0 s — the heaviest headline query at r10); both
    must now scan the staged `ivf_cells_64` parquet leaf instead.
    The join-path variant keeps its own broadcast/max_by assignment —
    its identity is gating the >1k-centroid escalation arm."""
    for name in ("embedding_cosine_topk_ivf", "embedding_topk_ivf_pq"):
        plan = _plan(spark, name)
        assert "ivf_cells_64" in plan, (name, plan[:2000])
    assert "ivf_cells_64" not in _plan(spark, "embedding_cosine_topk_ivf_join")


def test_staged_cells_match_inline_assignment(spark):
    """The staged table must be bit-identical to a fresh inline
    assignment — parquet round-trip of the embedding vector and the
    LCG centroid sample included."""
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        ivf_centroids,
        ivf_corpus_cells,
    )
    from web_analytics_visits_re_processing_spark.plans.llmdata import (
        _ivf_cells_64,
    )
    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = ivf_centroids(emb, 64)
    inline = {
        (r["vec_id"]): r["_cell"]
        for r in ivf_corpus_cells(emb, cents).collect()
    }
    staged = {
        (r["vec_id"]): r["_cell"] for r in _ivf_cells_64(spark, SF_DIR).collect()
    }
    assert inline == staged
    assert len(inline) > 0


# --- bucketed layout serves a pre-existing consumer ---------------------------


def test_ref_integrity_fact_legs_zero_join_exchange(spark):
    """The two fact-fact anti-join legs of referential_integrity_audit
    now read the session-staged bucketed tables: SortMergeJoin
    LeftAnti over co-located buckets, ZERO hash exchange anywhere in
    the plan (the only exchanges left are the per-leg single-row
    aggregates). The four dimension legs stay broadcast."""
    plan = _plan(spark, "referential_integrity_audit")
    assert "Exchange hashpartitioning" not in plan, plan
    assert len(re.findall(r"SortMergeJoin.*LeftAnti", plan)) == 2, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan, plan
    assert len(re.findall(r"BroadcastHashJoin.*LeftAnti", plan)) == 4, plan
