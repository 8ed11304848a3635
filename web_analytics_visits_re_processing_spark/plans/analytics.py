"""Core web-analytics queries: the reference's sessionization surface
re-expressed on the driver's ``events`` fixture.

The DuckDB oracle for sessionization uses the lag/running-sum rewrite
(SURVEY §4.3.2) — DuckDB has no ``session_window``; the construction is
provably equivalent for a fixed gap, with the strict ``>`` comparison
matching Spark's merge rule (an event exactly at the previous window's
end merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.sessionize import (
    sessionize_visits,
    with_session_columns,
)
from web_analytics_visits_re_processing_spark.plans.registry import query
from web_analytics_visits_re_processing_spark.sources.tables import load_table

GAP_US = 1800 * 1_000_000

# Shared CTE: lag-based sessionizer, the ANSI-SQL equivalent of
# session_window(ts, '30 minutes') for DuckDB.
_SESSION_CTE = f"""
WITH seq AS (
    SELECT user_id, ts, event_type, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts) > {GAP_US}
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WHERE ts IS NOT NULL
), sess AS (
    SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM seq
)
"""


@query(
    "sessionize_visits",
    oracle=_SESSION_CTE
    + """
SELECT CAST(user_id AS VARCHAR) || '_' || CAST(epoch_us(MIN(ts)) AS VARCHAR)
           AS visit_key,
       user_id,
       epoch_us(MIN(ts)) AS visit_start_us,
       epoch_us(MAX(ts)) AS visit_end_us,
       COUNT(*) AS n_hits,
       ROUND(SUM(value), 2) AS total_value
FROM sess
GROUP BY user_id, session_seq
""",
)
def q_sessionize_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4-R8+R12: event-time 30-min-gap sessions over the events stream
    (reference ``main.py:217-232``), via ``session_window``."""
    events = load_table(spark, sf_dir, "events")
    visits = sessionize_visits(
        events,
        user_col="user_id",
        ts_col="ts",
        gap_seconds=1800,
        extra_aggs=[F.round(F.sum("value"), 2).alias("total_value")],
    )
    return visits.select(
        "visit_key",
        "user_id",
        F.unix_micros("visit_start").alias("visit_start_us"),
        F.unix_micros("visit_end").alias("visit_end_us"),
        "n_hits",
        "total_value",
    )


@query(
    "sessionize_hits",
    oracle=_SESSION_CTE
    + """
SELECT CAST(user_id AS VARCHAR) || '_' ||
           CAST(epoch_us(MIN(ts) OVER w) AS VARCHAR) AS visit_key,
       user_id,
       epoch_us(ts) AS ts_us,
       event_type,
       value
FROM sess
WINDOW w AS (PARTITION BY user_id, session_seq)
""",
)
def q_sessionize_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7+R10 without collect/explode: every hit carries its visit_key
    via the single-shuffle window-function formulation."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    hits = with_session_columns(events, "user_id", "ts", 1800)
    return hits.select(
        "visit_key",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "value",
    )
