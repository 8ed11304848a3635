"""r14 interleaved A/B probe (the r13 noise protocol: variants
alternate WITHIN each rep so contention windows hit all arms; report
per-arm minima + the anchor series).

Arms:
  semdedup   : fold scorer vs arrow scorer (semdedup_verdicts kwarg)
  partwrite  : pre-write repartition on vs off (env threshold toggle)
  jonckheere : r13 single 5-partition window vs r14 two-level
               bucketed cumulative (old shape inlined here)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from web_analytics_visits_re_processing_spark.plans import QUERIES  # noqa: E402
from web_analytics_visits_re_processing_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(
    app_name="ab_r14", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 32)
)
spark.range(1000).count()

import bench  # noqa: E402

print(f"# anchor: {bench.anchor(spark)}s", flush=True)


def semdedup_variant(scorer):
    def run():
        from web_analytics_visits_re_processing_spark.operators.semdedup import (
            semdedup_verdicts,
        )
        from web_analytics_visits_re_processing_spark.plans.llmdata import (
            _count_cached,
            _emb,
        )

        emb = _emb(spark, sf_dir)
        k = max(10, _count_cached("emb_n", spark, sf_dir, emb.count) // 600)
        return semdedup_verdicts(emb, k=k, n_updates=1, tau=0.35, scorer=scorer)

    return run


def partwrite_variant(thresh):
    def run():
        os.environ["SPARK_GRAFT_PARTWRITE_REPART_MIN_BYTES"] = thresh
        try:
            return QUERIES["partitioned_write_roundtrip"](spark, sf_dir)
        finally:
            os.environ.pop("SPARK_GRAFT_PARTWRITE_REPART_MIN_BYTES", None)

    return run


def jonckheere_old():
    """The r13 shape: grid cumulative as ONE window partitioned by g."""
    from pyspark.sql import Window

    from web_analytics_visits_re_processing_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    gv = (
        t.groupBy("g", "cents")
        .agg(F.count(F.lit(1)).alias("cg"))
        .localCheckpoint(eager=True)
    )
    vals = gv.select("cents").distinct()
    grps = gv.select("g").distinct()
    grid = (
        grps.crossJoin(vals)
        .join(gv, ["g", "cents"], "left")
        .select("g", "cents", F.coalesce("cg", F.lit(0)).alias("cg0"))
    )
    from pyspark.sql import Window

    wcum = Window.partitionBy("g").orderBy("cents")
    cum = grid.select(
        "g", "cents", "cg0",
        (F.sum("cg0").over(wcum) - F.col("cg0")).alias("cum_lt"),
    )
    pairs = (
        cum.alias("i")
        .join(
            gv.alias("j"),
            (F.col("j.cents") == F.col("i.cents")) & (F.col("i.g") < F.col("j.g")),
        )
        .groupBy(F.col("i.g").alias("gi"), F.col("j.g").alias("gj"))
        .agg(
            F.sum(F.col("j.cg") * (2 * F.col("i.cum_lt") + F.col("i.cg0"))).alias(
                "u2"
            )
        )
    )
    ns = gv.groupBy("g").agg(F.sum("cg").alias("n"))
    joined = (
        pairs.join(
            F.broadcast(ns.select(F.col("g").alias("gi"), F.col("n").alias("n_i"))),
            "gi",
        ).join(
            F.broadcast(ns.select(F.col("g").alias("gj"), F.col("n").alias("n_j"))),
            "gj",
        )
    )
    tot = joined.agg(
        F.sum("u2").alias("jt2"), F.sum(F.col("n_i") * F.col("n_j")).alias("ejt2")
    )
    return joined.crossJoin(F.broadcast(tot)).select(
        "gi", "gj", "n_i", "n_j", F.col("u2").cast("long"), "jt2", "ejt2"
    )


ARMS = {
    "semdedup:fold": semdedup_variant("fold"),
    "semdedup:arrow": semdedup_variant("arrow"),
    "partwrite:repart": partwrite_variant("1"),
    "partwrite:norepart": partwrite_variant(str(1 << 60)),
    "jonckheere:old": jonckheere_old,
    "jonckheere:new": lambda: QUERIES["jonckheere_trend_priority"](spark, sf_dir),
}

only = sys.argv[1:]
arms = {k: v for k, v in ARMS.items() if not only or any(k.startswith(o) for o in only)}
times: dict = {k: [] for k in arms}
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
for rep in range(REPS):
    for name, build in arms.items():
        spark.sparkContext.setJobDescription(f"ab:{name}")
        t0 = time.perf_counter()
        bench.materialize(build())
        dt = time.perf_counter() - t0
        times[name].append(dt)
        print(f"# rep{rep} {name}: {dt:.3f}s", flush=True)
    print(f"# anchor@rep{rep}: {bench.anchor(spark)}s", flush=True)

for name, ts in times.items():
    print(
        f"{name}: min {min(ts):.3f}s median {statistics.median(ts):.3f}s"
        f" all={[round(t, 2) for t in ts]}",
        flush=True,
    )
spark.stop()
