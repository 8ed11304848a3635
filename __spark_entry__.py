"""Driver contract facade (see repo docstring history for the spec).

``entry(spark)`` — flagship sessionization at sf0.001.
``queries()`` / ``oracle_sql()`` — the declared operator inventory,
populated from ``web_analytics_visits_re_processing_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter the driver's cwd.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from web_analytics_visits_re_processing_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: sessionize the sf0.001 events stream into visits."""
    return QUERIES["sessionize_visits"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
