"""One-off profiling harness for the transformWithState family (r12
verdict item 3): times each replay at sf0.1 and prints phase
breakdowns so the fixed cost (query startup + RocksDB machinery) can
be separated from per-key state-server chatter.

Usage: python scripts/profile_tws.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)

from web_analytics_visits_re_processing_spark.streaming import tws  # noqa: E402

t0 = time.time()
n = tws.user_lifetime_replay(spark, sf).count()
t1 = time.time()
print(f"lifetime cold: {t1 - t0:.2f}s rows={n}", flush=True)

t0 = time.time()
n = tws.user_lifetime_replay(spark, sf).count()
t1 = time.time()
print(f"lifetime warm: {t1 - t0:.2f}s rows={n}", flush=True)

t0 = time.time()
n = tws.user_type_rollup_replay(spark, sf).count()
t1 = time.time()
print(f"rollup cold:   {t1 - t0:.2f}s rows={n}", flush=True)

t0 = time.time()
n = tws.user_type_rollup_replay(spark, sf).count()
t1 = time.time()
print(f"rollup warm:   {t1 - t0:.2f}s rows={n}", flush=True)

spark.stop()
