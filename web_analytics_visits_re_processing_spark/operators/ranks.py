"""Distributed global ranking — the scalable replacement for the
``Window.orderBy(...)`` (no partition) pattern, which moves the ENTIRE
input to one task (Spark's own WindowExec warning). Fine for a 30-row
daily spine; a 100 TB failure mode the moment the ranked frame is
user-, customer-, node- or vocabulary-grain, because those grow with
the data no matter how many executors exist.

The classic two-pass construction instead (same trick RDD
zipWithIndex uses, expressed in DataFrame ops so Catalyst/AQE stay in
charge): range-partition on the order key, rank LOCALLY per
partition, then add broadcast per-partition cumulative offsets — the
only single-partition work left is a window over the
≤ num_partitions-row offset table. Results are invariant to partition
boundaries (including AQE coalescing, which merges only CONTIGUOUS
range partitions) provided the order is TOTAL — callers must include
a tiebreak column, exactly as they must for the single-partition
window to be deterministic in the first place.

First applied to sorted_neighborhood_dup_pairs (r9); this module
generalizes it for the other data-scale global ranks (AUC ranks,
revenue deciles, Zipf/vocabulary ranks, degree medians).

Reference scope note: the reference pipeline (main.py:22-240) has no
ranking at all; this is scale infrastructure for the extension
surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _resolve_partitions(df: DataFrame, num_partitions) -> int:
    """Default the range-partition width to the session's shuffle
    parallelism instead of a constant: on a 1000-executor cluster the
    two-pass rank should fan out as wide as every other shuffle (the
    offsets table stays ≤ that many rows — still broadcast-trivial).
    Explicit values win; non-integer conf values (e.g. under future
    auto modes) fall back to 200, Spark's own default."""
    if num_partitions is not None:
        return int(num_partitions)
    try:
        return int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except (TypeError, ValueError):
        return 200



def global_row_number(
    df: DataFrame,
    order_cols,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global row number over a TOTAL order without a
    single-partition window. ``order_cols`` is a list of column names
    or Column sort expressions (``F.col("c").desc()`` works — the
    same expressions feed repartitionByRange and the local window, so
    the two sorts can never disagree)."""
    num_partitions = _resolve_partitions(df, num_partitions)
    local = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_grk_pid", F.spark_partition_id())
        .withColumn(
            "_grk_lrn",
            F.row_number().over(
                Window.partitionBy("_grk_pid").orderBy(*order_cols)
            ),
        )
    )
    offsets = (
        local.groupBy("_grk_pid")
        .agg(F.count(F.lit(1)).alias("_grk_c"))
        .select(
            "_grk_pid",
            F.coalesce(
                F.sum("_grk_c").over(
                    Window.orderBy("_grk_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_grk_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_grk_pid")
        .withColumn(out_col, F.col("_grk_lrn") + F.col("_grk_off"))
        .drop("_grk_pid", "_grk_lrn", "_grk_off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols,
    val_col: str,
    out_col: str = "run_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Cumulative sum of ``val_col`` over a TOTAL order, current row
    included (``ROWS UNBOUNDED PRECEDING``) — the Pareto/ABC walk —
    without a single-partition window: range-partition on the order
    key, running-sum LOCALLY, then add the broadcast prefix totals of
    the earlier partitions. The only single-partition window left is
    over the ≤ num_partitions-row per-partition-total table."""
    num_partitions = _resolve_partitions(df, num_partitions)
    local = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_grk_pid", F.spark_partition_id())
        .withColumn(
            "_grk_ls",
            F.sum(val_col).over(
                Window.partitionBy("_grk_pid")
                .orderBy(*order_cols)
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    offsets = (
        local.groupBy("_grk_pid")
        .agg(F.sum(val_col).alias("_grk_t"))
        .select(
            "_grk_pid",
            F.coalesce(
                F.sum("_grk_t").over(
                    Window.orderBy("_grk_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_grk_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_grk_pid")
        .withColumn(out_col, F.col("_grk_ls") + F.col("_grk_off"))
        .drop("_grk_pid", "_grk_ls", "_grk_off")
    )


def global_running_max(
    df: DataFrame,
    order_cols,
    val_col: str,
    out_col: str = "run_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running max of ``val_col`` over the STRICTLY PRECEDING rows of
    a TOTAL order (``ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING``) — the 2-D skyline sweep convention, where the first
    row reads NULL because nothing precedes it. Distributed the same
    two-pass way: local strictly-preceding running max per range
    partition, combined via ``greatest`` (null-skipping) with the
    broadcast prefix max of the earlier partitions."""
    num_partitions = _resolve_partitions(df, num_partitions)
    local = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_grk_pid", F.spark_partition_id())
        .withColumn(
            "_grk_lm",
            F.max(val_col).over(
                Window.partitionBy("_grk_pid")
                .orderBy(*order_cols)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
    )
    offsets = (
        local.groupBy("_grk_pid")
        .agg(F.max(val_col).alias("_grk_m"))
        .select(
            "_grk_pid",
            F.max("_grk_m")
            .over(
                Window.orderBy("_grk_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("_grk_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_grk_pid")
        .withColumn(out_col, F.greatest("_grk_lm", "_grk_off"))
        .drop("_grk_pid", "_grk_lm", "_grk_off")
    )


def global_ntile(
    df: DataFrame,
    order_cols,
    n: int,
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ``ntile(n)`` over a TOTAL order: with N rows,
    q = N div n and r = N mod n, the first r buckets hold q+1 rows
    and the rest hold q — the SQL-standard definition Spark's NTile
    implements, rebuilt from the distributed row number plus the
    1-row broadcast count (pinned against F.ntile itself by pytest,
    including the N < n and N % n != 0 branches the round-number
    fixtures never exercise)."""
    ranked = global_row_number(df, order_cols, "_grk_rn", num_partitions)
    total = ranked.agg(F.count(F.lit(1)).alias("_grk_n"))
    bucket = F.expr(
        f"CASE WHEN _grk_rn <= (_grk_n % {n}) * (_grk_n div {n} + 1)"
        f" THEN (_grk_rn - 1) div (_grk_n div {n} + 1) + 1"
        f" ELSE (_grk_n % {n})"
        f"  + (_grk_rn - (_grk_n % {n}) * (_grk_n div {n} + 1) - 1)"
        f"    div greatest(_grk_n div {n}, 1) + 1 END"
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, bucket.cast("int"))
        .drop("_grk_rn", "_grk_n")
    )


# --- count-banded ntile downgrade (the lsh_planes_for precedent) -------------

# Above this ranked-frame size the exact ntile (a total order over a
# frame that GROWS with the data — users, events) gives way to
# histogram cut points: integer-value histogram → cumulative counts →
# cut i = smallest value whose running count reaches ceil(i·n/k) →
# k-1 cuts broadcast as a one-row (or per-group) lookup, assignment a
# pure projection. Same static, oracle-mirrorable CASE rule as
# similarity.lsh_planes_for / dedup.simhash_bits_for: the DuckDB side
# selects the arm from the same COUNT(*), and every fixture SF
# resolves to the exact arm so gate values never move. The trade is
# tie handling: the histogram arm bins by VALUE (ties share a bucket),
# the exact arm splits ties by the tiebreak column — the documented
# approximation at 100 TB, where the per-bucket populations differ by
# at most the largest tie group.
NTILE_EXACT_MAX = 1 << 24  # 16,777,216 ranked rows


def ntile_mode(n_ranked_rows: int) -> str:
    """'exact' (distributed two-pass ntile) or 'histogram'
    (cut-point broadcast) — banded on the ranked-frame row count."""
    return "exact" if n_ranked_rows <= NTILE_EXACT_MAX else "histogram"


def hist_ntile_cuts(
    df: DataFrame,
    val_col: str,
    k: int,
    group_cols: tuple = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """The k-1 equal-frequency cut points per group:
    ``c_i = MIN(val WHERE cum·k ≥ n·i)`` over the integer-value
    histogram's cumulative counts (cross-multiplied integers — the
    histogram_quantiles_by_type rule, no float ranks). Grouped form
    uses a per-group window over the VALUE-grain histogram (domain-
    bounded, not data-grain); global form rides the two-pass
    ``global_running_sum`` so no unpartitioned window appears."""
    hist = df.groupBy(*group_cols, val_col).agg(
        F.count(F.lit(1)).alias("_hn_c")
    )
    if group_cols:
        wc = Window.partitionBy(*group_cols).orderBy(val_col)
        wn = Window.partitionBy(*group_cols)
        cum = hist.select(
            *group_cols,
            val_col,
            F.sum("_hn_c").over(wc).alias("_hn_cum"),
            F.sum("_hn_c").over(wn).alias("_hn_n"),
        )
    else:
        cum = global_running_sum(
            hist, [val_col], "_hn_c", "_hn_cum", num_partitions
        ).crossJoin(F.broadcast(hist.agg(F.sum("_hn_c").alias("_hn_n"))))
    aggs = [
        F.min(
            F.when(
                F.col("_hn_cum") * k >= F.col("_hn_n") * i, F.col(val_col)
            )
        ).alias(f"c{i}")
        for i in range(1, k)
    ]
    return cum.groupBy(*group_cols).agg(*aggs)


def hist_ntile_score(
    df: DataFrame,
    cuts: DataFrame,
    val_col: str,
    k: int,
    out_col: str,
    group_cols: tuple = (),
) -> DataFrame:
    """Assign the histogram-ntile bucket: ``1 + Σ 1[val > c_i]`` —
    a pure projection after the (tiny, ≤ one row per group) cut table
    broadcasts. Output typed INT to match the exact arm's ntile."""
    if group_cols:
        j = df.join(F.broadcast(cuts), list(group_cols))
    else:
        j = df.crossJoin(F.broadcast(cuts))
    score = F.lit(1)
    for i in range(1, k):
        score = score + F.when(F.col(val_col) > F.col(f"c{i}"), 1).otherwise(0)
    return j.withColumn(out_col, score.cast("int")).drop(
        *[f"c{i}" for i in range(1, k)]
    )
