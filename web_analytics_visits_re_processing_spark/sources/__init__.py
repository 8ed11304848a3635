"""Input connectors: parquet table catalog, hit-log TSV, csv/json."""

from web_analytics_visits_re_processing_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
)

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
