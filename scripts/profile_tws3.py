"""Experiment: RocksDB conf knobs for the tws replays (warm runs)."""

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

tws.user_lifetime_replay(spark, sf).count()  # warm-up

CONFS = [
    ("baseline-8", "8", {}),
    (
        "chlog-16",
        "16",
        {
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        },
    ),
    (
        "chlog-16-nosnap",
        "16",
        {
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
            "spark.sql.streaming.stateStore.minDeltasForSnapshot": "1000",
            "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
        },
    ),
    (
        "chlog-32-nosnap",
        "32",
        {
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
            "spark.sql.streaming.stateStore.minDeltasForSnapshot": "1000",
            "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
        },
    ),
    (
        "nochlog-16-nosnap",
        "16",
        {
            "spark.sql.streaming.stateStore.minDeltasForSnapshot": "1000",
            "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
        },
    ),
]

for label, parts, confs in CONFS:
    ss.REPLAY_SHUFFLE_PARTITIONS = parts
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        t0 = time.time()
        n1 = tws.user_lifetime_replay(spark, sf).count()
        t1 = time.time()
        n2 = tws.user_type_rollup_replay(spark, sf).count()
        t2 = time.time()
        print(
            f"{label}: lifetime {t1 - t0:.2f}s ({n1}) "
            f"rollup {t2 - t1:.2f}s ({n2})",
            flush=True,
        )
    finally:
        for k in confs:
            spark.conf.unset(k)

spark.stop()
