"""A/B the tws replay's remaining knobs on a quiet box.

Axes (each measured as 2 warm reps per gate, min reported):
  - state partitions: 8 (committed) vs 4 vs 16
  - RocksDB changelog checkpointing: true (committed) vs false

Context: worker-side cProfile (profile_tws5.py) shows ~72% of worker
time blocked in recv_into waiting for the JVM state server — the cost
is per-round-trip JVM service + framework round-trips (~17/user), not
Python-side proto work (shim microbench: ~30 us/call ≈ 1%). So the
only local levers left are store lifecycle fixed cost (partitions,
changelog) — this script measures exactly those.
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

from web_analytics_visits_re_processing_spark.streaming import tws  # noqa: E402

tws.user_lifetime_replay(spark, sf).count()  # warm

CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def run_once(gate, parts, changelog):
    tws.TWS_REPLAY_SHUFFLE_PARTITIONS = parts
    tws._TWS_CONFS[CHANGELOG_KEY] = changelog
    t0 = time.perf_counter()
    if gate == "lifetime":
        n = tws.user_lifetime_replay(spark, sf).count()
    else:
        n = tws.user_type_rollup_replay(spark, sf).count()
    return time.perf_counter() - t0, n


# interleave variants within each rep so host-contention windows hit
# every variant roughly equally (box shows intermittent 2-4x windows)
VARIANTS = [
    ("8", "true"),
    ("4", "true"),
    ("16", "true"),
    ("8", "false"),
    ("4", "false"),
]
acc = {}
for rep in range(3):
    for parts, changelog in VARIANTS:
        for gate in ("rollup", "lifetime"):
            dt, n = run_once(gate, parts, changelog)
            acc.setdefault((parts, changelog, gate), []).append(dt)
            print(
                f"rep{rep} parts={parts} changelog={changelog} {gate}: "
                f"{dt:.2f}s rows={n}",
                flush=True,
            )

print("\n== minima ==")
for (parts, changelog, gate), xs in sorted(acc.items()):
    print(
        f"parts={parts} changelog={changelog} {gate}: "
        f"min {min(xs):.2f}s all={[round(x, 2) for x in xs]}"
    )
