"""Planted-case tests: pre-filter ANN semantics and exact RRF
arithmetic."""

from __future__ import annotations

from web_analytics_visits_re_processing_spark.plans import QUERIES

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, EMB_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))


def test_filtered_ann_excludes_other_labels(spark, tmp_path):
    # Globally nearest to query 0 is vec 20 (label 1) — the label
    # filter must skip it and pick vec 21 (label 0).
    rows = [
        (0, [1.0, 0.0], 0),
        (20, [0.99, 0.1], 1),   # nearest overall, wrong label
        (21, [0.8, 0.6], 0),    # nearest same-label
        (22, [0.0, 1.0], 0),
    ]
    _write(spark, tmp_path, rows)
    got = [
        (r["vec_id"], r["label"], r["rk"])
        for r in QUERIES["ann_label_filtered_topk"](spark, str(tmp_path))
        .where("query_id = 0")
        .orderBy("rk")
        .collect()
    ]
    assert got[0] == (21, 0, 1)
    assert all(label == 0 for _, label, _ in got)
    assert 20 not in [v for v, _, _ in got]


def test_rrf_exact_votes(spark, tmp_path):
    # q0=(1,0), q1=(0,1); v2 consensus-2nd in both lists, v3/v4 first
    # in one + third in the other. Votes: 1e6//61=16393, //62=16129,
    # //63=15873, //64=15625 → v3=v4=32266 edge out v2=32258;
    # tie breaks by id.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),
        (2, [0.7, 0.7], 0),
        (3, [0.9, 0.1], 0),
        (4, [0.1, 0.9], 0),
    ]
    _write(spark, tmp_path, rows)
    got = [
        (r["vec_id"], r["n_lists"], r["rrf_e6"], r["fused_rank"])
        for r in QUERIES["rrf_multi_query_fusion"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got[0] == (3, 2, 32_266, 1)
    assert got[1] == (4, 2, 32_266, 2)
    assert got[2] == (2, 2, 32_258, 3)
    assert got[3] == (0, 1, 15_625, 4)
    assert got[4] == (1, 1, 15_625, 5)
