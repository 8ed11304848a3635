"""Physical-layout plan guarantees: bucketed joins plan WITHOUT a
shuffle exchange; partitioned layouts prune partitions at the scan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.sources.layout import (
    read_table,
    write_bucketed,
    write_partitioned,
)
from web_analytics_visits_re_processing_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """customer ⋈ orders on custkey over co-bucketed tables: zero
    shuffle exchanges — the 100 TB fact×fact join pattern."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            load_table(spark, sf_dir, "customer"), "bt_customer", "c_custkey"
        )
        write_bucketed(
            load_table(spark, sf_dir, "orders").withColumnRenamed(
                "o_custkey", "c_custkey"
            ),
            "bt_orders",
            "c_custkey",
        )
        joined = read_table(spark, "bt_customer").join(
            read_table(spark, "bt_orders"), "c_custkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert not re.search(r"Exchange hash", plan), plan
        # results still correct vs the plain join
        plain = load_table(spark, sf_dir, "customer").join(
            load_table(spark, sf_dir, "orders").withColumnRenamed(
                "o_custkey", "c_custkey"
            ),
            "c_custkey",
        )
        assert joined.count() == plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bt_customer")
        spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    """A predicate on the partition column reaches the scan as a
    PartitionFilter and the plan reads only matching partitions."""
    p = str(tmp_path / "events_by_type")
    write_partitioned(
        load_table(spark, sf_dir, "events"), p, ["event_type"]
    )
    back = spark.read.parquet(p).where(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan, plan
    n_purchase = back.count()
    n_all = spark.read.parquet(p).count()
    assert 0 < n_purchase < n_all
