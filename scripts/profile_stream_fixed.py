"""r14: attribute the non-tws streaming replays' fixed cost (VERDICT
item 2). For each gate, runs the full bench-shaped call (2 reps; rep 2
is the steady state the bench medians) and splits the wall time into:

  build    = plan construction before the stream runs (staging probe,
             static-side batch work)
  stream   = _run_append_to_files wall (start .. stop), with the
             per-batch StreamingQueryProgress durationMs breakdown
             captured via a StreamingQueryListener:
             queryPlanning / addBatch / walCommit / commitOffsets /
             latestOffset / getBatch / triggerExecution
  readback = the post-stream batch read + filters (noop-materialized)

Usage: python scripts/profile_stream_fixed.py [gate ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from web_analytics_visits_re_processing_spark.plans import QUERIES  # noqa: E402
from web_analytics_visits_re_processing_spark.session import get_spark  # noqa: E402
from web_analytics_visits_re_processing_spark.streaming import (  # noqa: E402
    sessionize_stream as ss,
)

GATES = [
    "streaming_sessionize_visits",
    "streaming_static_enrich",
    "streaming_histogram_quantiles",
    "streaming_topk_user_leaderboard",
    "streaming_activity_heatmap",
    "streaming_benford_digits",
    "streaming_count_min_sketch",
    "streaming_obf_monitor",
    "streaming_dynamic_gap_sessions",
    "streaming_cross_device_sessionize",
]

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(
    app_name="profile_stream_fixed",
    master=f"local[{cpus}]",
    shuffle_partitions=max(cpus, 32),
)
spark.range(1000).count()

import bench  # noqa: E402

print(f"# anchor: {bench.anchor(spark)}s", flush=True)

PROGRESS: list[dict] = []


class _Cap(StreamingQueryListener):
    def onQueryStarted(self, event):
        PROGRESS.append({"event": "started", "t": time.perf_counter()})

    def onQueryProgress(self, event):
        p = event.progress
        PROGRESS.append(
            {
                "event": "progress",
                "t": time.perf_counter(),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs),
            }
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        PROGRESS.append({"event": "terminated", "t": time.perf_counter()})


spark.streams.addListener(_Cap())

_orig = ss._run_append_to_files
CAP = {}


def _patched(result, workdir, timeout_s=300, shuffle_partitions=None):
    t0 = time.perf_counter()
    out, stats = _orig(result, workdir, timeout_s, shuffle_partitions)
    CAP["stream_wall"] = CAP.get("stream_wall", 0.0) + (time.perf_counter() - t0)
    return out, stats


ss._run_append_to_files = _patched

from web_analytics_visits_re_processing_spark.streaming import (  # noqa: E402
    upsert_sink,
)

_orig_upsert = upsert_sink.run_upsert_stream


def _patched_upsert(*a, **kw):
    t0 = time.perf_counter()
    r = _orig_upsert(*a, **kw)
    CAP["stream_wall"] = CAP.get("stream_wall", 0.0) + (time.perf_counter() - t0)
    return r


upsert_sink.run_upsert_stream = _patched_upsert
# the gate modules import run_upsert_stream by name — patch their refs too
import importlib  # noqa: E402

for _mod in list(sys.modules.values()):
    if getattr(_mod, "run_upsert_stream", None) is _orig_upsert:
        _mod.run_upsert_stream = _patched_upsert
    if getattr(_mod, "_run_append_to_files", None) is _orig:
        _mod._run_append_to_files = _patched

names = sys.argv[1:] or GATES
for name in names:
    fn = QUERIES[name]
    for rep in range(2):
        CAP.clear()
        PROGRESS.clear()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        time.sleep(0.3)  # let async listener events drain
        stream_wall = CAP.get("stream_wall")
        batches = [
            {
                "batchId": p["batchId"],
                "rows": p["numInputRows"],
                "ms": {
                    k: v
                    for k, v in p["durationMs"].items()
                    if k
                    in (
                        "triggerExecution",
                        "queryPlanning",
                        "addBatch",
                        "walCommit",
                        "commitOffsets",
                        "latestOffset",
                        "getBatch",
                    )
                },
            }
            for p in PROGRESS
            if p["event"] == "progress"
        ]
        trig_sum = sum(b["ms"].get("triggerExecution", 0) for b in batches) / 1000.0
        rec = {
            "query": name,
            "rep": rep,
            "total": round(t2 - t0, 3),
            "build_only": round((t1 - t0) - stream_wall, 3) if stream_wall else None,
            "stream_wall": round(stream_wall, 3) if stream_wall else None,
            "trigger_sum": round(trig_sum, 3),
            "stream_overhead": round(stream_wall - trig_sum, 3)
            if stream_wall
            else None,
            "readback_noop": round(t2 - t1, 3),
            "batches": batches,
        }
        print(json.dumps(rec), flush=True)

spark.stop()
