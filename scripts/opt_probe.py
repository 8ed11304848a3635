"""r13/r14 optimization probe: time named queries (noop sink, median of
reps) and capture ``.explain("formatted")`` to plans/$SPARK_GRAFT_PLANDIR (default r14)/.

Usage:
    python scripts/opt_probe.py [--reps N] [--tag before|after] q1 q2 ...

Writes plans/<dir>/<query>_<tag>.txt and prints per-query medians.
Methodology matches bench.py: local[$SPARK_GRAFT_CPUS], noop write,
median of reps, anchor probe first so numbers are host-comparable.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

reps = 3
tag = None
args = sys.argv[1:]
if "--reps" in args:
    i = args.index("--reps")
    reps = int(args[i + 1])
    del args[i : i + 2]
if "--tag" in args:
    i = args.index("--tag")
    tag = args[i + 1]
    del args[i : i + 2]

from web_analytics_visits_re_processing_spark.plans import QUERIES  # noqa: E402
from web_analytics_visits_re_processing_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(
    app_name="opt_probe",
    master=f"local[{cpus}]",
    shuffle_partitions=max(cpus, 32),
)
spark.range(1000).count()

import bench  # noqa: E402

a = bench.anchor(spark)
print(f"# anchor: {a}s", flush=True)

plandir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANDIR", "r14"))
os.makedirs(plandir, exist_ok=True)

for name in args:
    fn = QUERIES[name]
    df = fn(spark, sf_dir)
    if tag:
        with open(os.path.join(plandir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    samples = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        t0 = time.perf_counter()
        bench.materialize(fn(spark, sf_dir))
        samples.append(time.perf_counter() - t0)
    med = round(statistics.median(samples), 3)
    print(f"{name}: median {med}s cold {round(samples[0],3)}s all={[round(s,2) for s in samples]}", flush=True)
