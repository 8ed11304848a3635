"""Bloom filter contracts: no false negatives ever, false positives
appear under saturation (and are exactly reproducible via the
portable hash), and the packed-literal join prefilter passes a
superset of true matches with zero extra shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.bloom import (
    bloom_build,
    bloom_member_expr,
    bloom_probe,
    bloom_words,
)


def test_bloom_no_false_negatives(spark):
    build = spark.range(200).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k")
    probed = bloom_probe(bloom, build, "k")
    assert probed.where(~F.col("maybe_present")).count() == 0


def test_bloom_bounded_size_and_false_positives_under_saturation(spark):
    """Tiny m with many keys: the filter stays ≤ m rows and unseen
    keys must collide (FP rate → 1 as the filter saturates)."""
    build = spark.range(500).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", k=3, m=256)
    assert bloom.count() <= 256
    unseen = spark.range(500, 600).select(F.col("id").alias("k"))
    probed = bloom_probe(bloom, unseen, "k", k=3, m=256)
    assert probed.where(F.col("maybe_present")).count() > 0


def test_bloom_words_expr_agrees_with_probe(spark):
    """The packed-literal predicate and the relational probe are the
    same filter — bit-for-bit agreement on every probe key."""
    build = spark.range(300).select(F.col("id").alias("k"))
    words = bloom_words(build, "k")
    probes = spark.range(1000).select(F.col("id").alias("k"))
    via_expr = probes.select(
        "k", bloom_member_expr(words, F.col("k")).alias("m")
    )
    via_join = bloom_probe(bloom_build(build, "k"), probes, "k").withColumnRenamed(
        "maybe_present", "m"
    )
    assert via_expr.exceptAll(via_join).count() == 0
    assert via_join.exceptAll(via_expr).count() == 0


def test_bloom_pruned_join_plan_filters_before_join(spark, sf_dir):
    """The membership predicate must run as a plain Filter on the big
    side (projection-time, pre-exchange) — not as a join."""
    from web_analytics_visits_re_processing_spark.plans import QUERIES

    plan = (
        QUERIES["bloom_pruned_join_urgent_items"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "shiftright" in plan, plan
    assert "CartesianProduct" not in plan
