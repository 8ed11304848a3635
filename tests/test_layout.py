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


def test_dynamic_partition_overwrite_preserves_others(spark, tmp_path):
    """The idempotent-backfill contract: rewriting ONE partition's
    data under dynamic partitionOverwriteMode replaces only that
    partition; static overwrite would truncate the table."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id long, p string, v long"
    )
    df.write.mode("overwrite").partitionBy("p").parquet(base)
    # backfill partition a with corrected values
    fix = spark.createDataFrame([(1, "a", 11)], "id long, p string, v long")
    (
        fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("p")
        .parquet(base)
    )
    got = {(r["p"], r["id"]): r["v"] for r in spark.read.parquet(base).collect()}
    assert got == {("a", 1): 11, ("b", 3): 30}  # b untouched, a replaced

    plan = (
        spark.read.parquet(base)
        .where(F.col("p") == "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(p" in plan, plan


def test_small_file_compaction_preserves_rows(spark, tmp_path):
    """Compaction: 32 tiny files → ≤4 right-sized files via
    repartition + maxRecordsPerFile, rows byte-identical."""
    import glob

    src = str(tmp_path / "small")
    out = str(tmp_path / "compact")
    spark.range(0, 1000).repartition(32).write.mode("overwrite").parquet(src)
    n_small = len(glob.glob(src + "/part-*.parquet"))
    assert n_small == 32
    df = spark.read.parquet(src)
    (
        df.repartition(2)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 500)
        .parquet(out)
    )
    n_big = len(glob.glob(out + "/part-*.parquet"))
    assert n_big <= 4
    a = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert a == list(range(1000))


def test_partitioned_write_repartition_size_gate(spark, sf_dir, monkeypatch):
    """The r14 size-gated pre-write repartition in
    ``partitioned_write_roundtrip``: above the byte threshold the
    write shuffles by the partition columns, so every hive partition
    directory holds exactly ONE data file (the 100 TB commit shape);
    below it the exchange is skipped and the query result is
    IDENTICAL either way (the gate changes file layout, never rows)."""
    import glob
    import os
    import tempfile

    from web_analytics_visits_re_processing_spark.plans.extended import (
        q_partitioned_write,
    )

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_part_write",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
    )

    # scale arm: threshold 1 byte → repartition fires
    monkeypatch.setenv("SPARK_GRAFT_PARTWRITE_REPART_MIN_BYTES", "1")
    big = sorted(map(tuple, q_partitioned_write(spark, sf_dir).collect()))
    part_dirs = glob.glob(os.path.join(base, "event_type=*", "day=*"))
    assert part_dirs, "partitioned write produced no partition dirs"
    for d in part_dirs:
        files = [
            f
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        assert len(files) == 1, f"{d}: expected 1 file/partition, got {len(files)}"

    # local arm: huge threshold → no pre-write exchange, same rows
    monkeypatch.setenv(
        "SPARK_GRAFT_PARTWRITE_REPART_MIN_BYTES", str(1 << 60)
    )
    small = sorted(map(tuple, q_partitioned_write(spark, sf_dir).collect()))
    assert small == big
