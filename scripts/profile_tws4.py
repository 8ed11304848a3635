"""Where does tws replay time go? Dump per-batch durationMs."""

import json
import os
import shutil
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
from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (  # noqa: E402
    _TMP_ROOT,
    _prepare_replay_input,
    _read_replay_stream,
)
from web_analytics_visits_re_processing_spark.vendor.protoshim_loader import (  # noqa: E402
    ensure_worker_protobuf,
)

tws.user_lifetime_replay(spark, sf).count()  # warm

ensure_worker_protobuf(spark)
spark.conf.set(
    "spark.sql.streaming.stateStore.providerClass", tws.ROCKSDB_PROVIDER
)
spark.conf.set("spark.sql.shuffle.partitions", "16")

workdir = os.path.join(_TMP_ROOT, "prof_tws4", "sf")
t0 = time.time()
input_dir = _prepare_replay_input(spark, sf, workdir)
shutil.rmtree(os.path.join(workdir, "ckpt"), ignore_errors=True)
events = _read_replay_stream(spark, input_dir, 4)
result = tws.user_type_rollup_stream(events)
t1 = time.time()
q = (
    result.writeStream.format("parquet")
    .option("path", os.path.join(workdir, "out"))
    .option("checkpointLocation", os.path.join(workdir, "ckpt"))
    .outputMode("append")
    .trigger(availableNow=True)
    .start()
)
t2 = time.time()
q.awaitTermination(300)
t3 = time.time()
prog = list(q.recentProgress)
q.stop()
t4 = time.time()
print(f"plan={t1-t0:.2f}s start={t2-t1:.2f}s run={t3-t2:.2f}s stop={t4-t3:.2f}s")
for p in prog:
    print(
        "batch", p["batchId"], "rows", p.get("numInputRows"),
        json.dumps(p.get("durationMs", {})),
    )
    for op in p.get("stateOperators", []):
        print(
            "   state: commit", op.get("allUpdatesTimeMs"),
            "removal", op.get("allRemovalsTimeMs"),
            "commitTime", op.get("commitTimeMs"),
            "rowsTotal", op.get("numRowsTotal"),
        )
spark.stop()
