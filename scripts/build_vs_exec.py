"""Split each headline query's time into plan-BUILD (fn call: py4j
chatter, literal shipping, driver-side analysis triggers) vs EXECUTE
(noop materialize of the built DataFrame).

The bench times build+execute together (that is the query's honest
cost and stays the bench contract); this probe attributes the split so
driver-side build hotspots (guide §7.3: planning is single-threaded
driver work) can be found and fixed.

Usage: python scripts/build_vs_exec.py [name ...]   (default: all headline)
Prints per-query build/exec medians sorted by build share, and a
summary of total build vs exec seconds.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_analytics_visits_re_processing_spark.plans import QUERIES  # noqa: E402
from web_analytics_visits_re_processing_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

spark = get_spark(
    app_name="build_vs_exec",
    master=f"local[{cpus}]",
    shuffle_partitions=max(cpus, 32),
)
spark.range(1000).count()
a = bench.anchor(spark)
print(f"# anchor: {a}s", flush=True)

names = sys.argv[1:] or bench.HEADLINE
rows = []
for name in names:
    fn = QUERIES[name]
    builds, execs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        bench.materialize(df)
        t2 = time.perf_counter()
        builds.append(t1 - t0)
        execs.append(t2 - t1)
    b = statistics.median(builds)
    e = statistics.median(execs)
    rows.append((name, b, e))
    print(f"# {name}: build {b:.3f}s exec {e:.3f}s", flush=True)

rows.sort(key=lambda r: -r[1])
print("\n== worst plan-build offenders ==")
for name, b, e in rows[:30]:
    print(f"{b:7.3f}  {e:7.3f}  {name}")
tb = sum(r[1] for r in rows)
te = sum(r[2] for r in rows)
print(f"\nTOTAL build {tb:.1f}s exec {te:.1f}s ({len(rows)} queries)")
