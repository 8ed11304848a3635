"""Worker-side cProfile of the tws rollup replay.

Subclasses TypeRollupProcessor to enable cProfile in init() and dump
per-partition stats in close() — the worker's MAIN thread runs the
whole grouped-iteration loop between those two calls, so the dump
covers pyspark's serializer machinery and the state-client socket
round-trips, not just our processor body.
"""

import glob
import os
import pstats
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

sf = "/root/testdata/sf0.1"
PROF_DIR = "/tmp/tws_prof"
shutil.rmtree(PROF_DIR, ignore_errors=True)
os.makedirs(PROF_DIR, exist_ok=True)

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)

from web_analytics_visits_re_processing_spark.streaming import tws  # noqa: E402


class ProfiledRollup(tws.TypeRollupProcessor):
    def init(self, handle):
        import cProfile

        self._prof = cProfile.Profile()
        self._prof.enable()
        super().init(handle)

    def close(self):
        self._prof.disable()
        self._prof.dump_stats(
            os.path.join(PROF_DIR, f"rollup_{os.getpid()}_{id(self)}.prof")
        )
        super().close()


def profiled_stream(events):
    from pyspark.sql import functions as F

    return (
        events.where(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_type", "value")
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .transformWithStateInPandas(
            ProfiledRollup(86_400),
            tws.TYPE_ROLLUP_SCHEMA,
            "append",
            "EventTime",
        )
    )


import time  # noqa: E402

t0 = time.perf_counter()
df = tws._tws_replay(spark, sf, "stream_tws_prof", profiled_stream, 4)
n = df.count()
print(f"rows={n} wall={time.perf_counter() - t0:.2f}s")

files = sorted(glob.glob(os.path.join(PROF_DIR, "*.prof")))
print(f"{len(files)} profile dumps")
if files:
    st = pstats.Stats(files[0])
    for f in files[1:]:
        st.add(f)
    st.sort_stats("cumulative")
    st.print_stats(40)
