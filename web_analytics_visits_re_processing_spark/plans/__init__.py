"""Declared query inventory + DuckDB oracle SQL (driver correctness gate)."""

from web_analytics_visits_re_processing_spark.plans.registry import (
    ORACLES,
    QUERIES,
    query,
)

# Importing the modules below populates the registry.
from web_analytics_visits_re_processing_spark.plans import (  # noqa: E402,F401
    advstats,
    analytics,
    extended,
    hitlog_queries,
    llmdata,
    relational,
    round10,
    round11,
    round12,
    round13,
    sqlbattery,
    streaming_queries,
    webanalytics,
    webanalytics_r7,
    webanalytics_r8,
)

__all__ = ["QUERIES", "ORACLES", "query"]
