"""Event-time sessionization ("visits"), the reference's core computation.

Reference semantics (``/root/reference/main.py:207-234``): hits are
keyed by ``user_id``, windowed into 30-minute-gap sessions
(``beam.WindowInto(window.Sessions(1800))``, ``main.py:217``), grouped
(``main.py:218``), then each group yields
``visit_start = min(ts)``/``visit_end = max(ts)`` and a synthesized
``visit_key = user_id + '_' + visit_start``
(``main.py:113-146``), with the key stamped back on every hit.

Two Spark-first formulations, both here:

1. ``sessionize_visits`` — ``groupBy(user, session_window(ts, gap))``.
   Idiomatic, streaming-compatible (the same expression runs under
   ``readStream`` + ``withWatermark``), benefits from partial
   aggregation. One hash shuffle on the user key.

2. ``with_session_columns`` — the window-function formulation
   (``lag``-gap detection + running-sum session ids + per-session
   min/max over the same partitioning). This is how hits keep their
   ``visit_key`` WITHOUT the reference's collect-the-group-then-explode
   round-trip (``main.py:115-146``, which materializes each session in
   one worker's memory — its mega-session OOM risk). Here every step
   is a window function over the same ``user_id`` exchange: **one
   shuffle, one sort, zero Python**, and Tungsten spills if a session
   doesn't fit.

Divergences from the reference, both deliberate (SURVEY §4.3):

- min/max computed on the numeric timestamp, not lexicographically on
  strings (``main.py:120-121``); identical results for fixed-width
  epoch-seconds strings, correct for everything else.
- Rows with null/unparseable timestamps are dropped uniformly
  (counted, not crashed — ``main.py:93`` would raise on non-numeric).

Scale notes (100 TB): the only shuffle is on the user key. Web-scale
user keys are power-law skewed (bots); AQE skew-join/agg splitting is
on by default in our session, and ``gap_seconds`` sessions bound state
in streaming. For a pathological single hot key, pre-split with
``salt_sessions`` (see its doc) before aggregating.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_GAP_SECONDS = 1800  # 30 min, /root/reference/main.py:207


def _gap_str(gap_seconds: int) -> str:
    return f"{int(gap_seconds)} seconds"


def visit_key_col(user_col: Column, visit_start_col: Column) -> Column:
    """``visit_key = user_id || '_' || epoch_micros(visit_start)``.

    The reference concatenates the raw epoch-seconds string
    (``main.py:122``); we use epoch *micros* so sub-second data cannot
    collide, and cast through bigint so the key is deterministic and
    DuckDB-reproducible (``user_id || '_' || epoch_us(visit_start)``).
    """
    return F.concat_ws("_", user_col.cast("string"), F.unix_micros(visit_start_col))


def sessionize_visits(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """One row per (user, session): the reference's ``visits`` output.

    ``groupBy(user, session_window)`` — works identically in batch and
    Structured Streaming (add ``withWatermark`` upstream for the
    latter). Events start a new session only when the gap between
    consecutive timestamps STRICTLY exceeds ``gap_seconds`` (verified
    empirically: Spark merges an event landing exactly at the previous
    window's end; Beam's end-exclusive ``Sessions`` would split there —
    a documented exactly-at-gap edge-case divergence).
    """
    aggs = [
        F.min(ts_col).alias("visit_start"),
        F.max(ts_col).alias("visit_end"),
        F.count(F.lit(1)).alias("n_hits"),
    ]
    if extra_aggs:
        aggs.extend(extra_aggs)
    out = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), _gap_str(gap_seconds)))
        .agg(*aggs)
    )
    return out.select(
        visit_key_col(F.col(user_col), F.col("visit_start")).alias("visit_key"),
        F.col(user_col),
        "visit_start",
        "visit_end",
        "n_hits",
        *[c for c in out.columns if c not in (user_col, "session_window", "visit_start", "visit_end", "n_hits")],
    )


def with_session_columns(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Stamp ``session_seq`` / ``visit_start`` / ``visit_end`` /
    ``visit_key`` onto every hit (the reference's R7+R10 without
    collect/explode).

    Window-function formulation: ``lag`` finds gap boundaries, a
    running sum numbers sessions, and per-session min/max run over the
    *same* ``user_id`` partitioning, so Spark plans ONE exchange — the
    ``(user, session_seq)`` windows are satisfied by the ``user`` hash
    partitioning (ClusteredDistribution on a superset of keys).

    This lag/running-sum construction is also the exact ANSI-SQL
    equivalent used by the DuckDB oracle (DuckDB has no
    ``session_window``), so it doubles as the correctness bridge.

    ``order_cols`` breaks timestamp ties deterministically (defaults to
    none — min/max/key results are tie-insensitive anyway).
    """
    ts = F.col(ts_col)
    w_user = Window.partitionBy(user_col).orderBy(ts_col, *(order_cols or []))
    # Strict > matches Spark's session_window merge rule (an event at
    # exactly prev_ts + gap still merges) — the DuckDB oracle must use
    # the same strict comparison.
    is_new = (
        ts.cast("double") - F.lag(ts.cast("double"), 1).over(w_user)
        > F.lit(float(gap_seconds))
    )
    df = df.where(ts.isNotNull()).withColumn(
        "session_seq",
        F.sum(F.when(is_new, 1).otherwise(0)).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_sess = Window.partitionBy(user_col, "session_seq")
    df = df.withColumn("visit_start", F.min(ts_col).over(w_sess)).withColumn(
        "visit_end", F.max(ts_col).over(w_sess)
    )
    # Timestamp inputs key on epoch-micros; integer epoch-seconds inputs
    # (the raw hit log) keep the reference's exact `user_id_<seconds>`
    # key format (main.py:122).
    if isinstance(df.schema[ts_col].dataType, T.TimestampType):
        key = visit_key_col(F.col(user_col), F.col("visit_start"))
    else:
        key = F.concat_ws(
            "_", F.col(user_col).cast("string"), F.col("visit_start").cast("string")
        )
    return df.withColumn("visit_key", key)


def visits_from_hits(
    hits_with_keys: DataFrame,
    user_col: str = "user_id",
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Reduce a ``with_session_columns`` result to one row per visit.

    Grouping on ``(user, visit_key)`` reuses the user-key exchange the
    window functions already created (hash on ``user`` clusters every
    finer key), so the whole visits+hits fan-out costs one shuffle —
    persist the ``with_session_columns`` result when writing both.
    """
    aggs = [
        F.min("visit_start").alias("visit_start"),
        F.max("visit_end").alias("visit_end"),
        F.count(F.lit(1)).alias("n_hits"),
    ]
    if extra_aggs:
        aggs.extend(extra_aggs)
    return hits_with_keys.groupBy("visit_key", user_col).agg(*aggs)


def salt_sessions(df: DataFrame, user_col: str, ts_col: str = "ts") -> DataFrame:
    """Optional skew guard: append a coarse time-bucket (UTC day) to
    the grouping key before sessionizing a pathologically hot user
    (e.g. a bot with 10^8 hits). Sessions never span a day boundary
    for such keys — an explicit, documented approximation for the skew
    escape hatch.

    Works on both timestamp columns (the events fixture) and raw
    epoch-seconds longs (the hit-log path, where a direct
    ``to_date(bigint)`` would fail analysis).
    """
    ts = F.col(ts_col)
    if not isinstance(df.schema[ts_col].dataType, T.TimestampType):
        ts = F.timestamp_seconds(ts)
    return df.withColumn(
        "_salted_user",
        F.concat_ws("#", F.col(user_col).cast("string"), F.to_date(ts).cast("string")),
    )
