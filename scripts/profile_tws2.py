"""Experiment: tws replay cost vs state-partition count (warm runs).

Usage: python scripts/profile_tws2.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

sf = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)

from web_analytics_visits_re_processing_spark.streaming import (  # noqa: E402
    sessionize_stream as ss,
    tws,
)

# warm-up (JIT, staging, addPyFile)
tws.user_lifetime_replay(spark, sf).count()

for parts in ("8", "4", "2", "16"):
    ss.REPLAY_SHUFFLE_PARTITIONS = parts
    t0 = time.time()
    n1 = tws.user_lifetime_replay(spark, sf).count()
    t1 = time.time()
    n2 = tws.user_type_rollup_replay(spark, sf).count()
    t2 = time.time()
    print(
        f"parts={parts}: lifetime {t1 - t0:.2f}s ({n1}) "
        f"rollup {t2 - t1:.2f}s ({n2})",
        flush=True,
    )

spark.stop()
