"""Physical-layout helpers: bucketing (co-located joins) and
partitioned writes (partition pruning).

At 100 TB the shuffle for a fact×fact join dominates; pre-bucketing
both sides on the join key at write time removes it entirely — Spark
reads co-located buckets and plans SortMergeJoin with NO exchange.
Likewise a date/key-partitioned layout turns time-range predicates
into directory pruning (``PartitionFilters`` in the scan, zero IO for
excluded partitions). Both are write-once/read-many trades, the right
default for fact tables a fleet of queries will join or slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    ``sortBy`` on the bucket key lets SortMergeJoin skip its sort as
    well — the join becomes a pure zip of co-located streams.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Directory-partitioned parquet layout (hive-style ``col=value``
    paths); predicates on partition columns prune at planning time."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
