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


def gsp_int():
    """Not-yet item 1: int-indexed position ARRAY instead of the
    string-keyed map. F1 (≤ alphabet = 20 symbols) is collected once
    to the driver (bounded, like a codebook); the staged per-sequence
    structure becomes array<array<int>> indexed by symbol id, so every
    candidate lookup is O(1) positional element_at instead of an
    O(|distinct syms|) string-compare map probe. Same greedy
    first-occurrence algebra; ids map back to strings only in the
    output projection."""
    from web_analytics_visits_re_processing_spark.plans import (
        webanalytics_r8 as r8,
    )

    def build_s2():
        ev = r8._events(spark, sf_dir)
        sym = F.concat_ws(
            ":",
            F.col("event_type"),
            F.expr(
                "cast(cast(get_json_object(props, '$.k') as bigint) div 25"
                " as string)"
            ),
        )
        return (
            ev.select("user_id", "ts", "event_id", sym.alias("sym"))
            .groupBy("user_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(ts, event_id,"
                    " sym))), x -> x.sym)"
                ).alias("syms")
            )
            .select("syms")
        )

    s2 = r8._persisted("gsp_s2", spark, sf_dir, build_s2)
    nu = s2.agg(F.count(F.lit(1)).alias("n"))
    f1 = (
        s2.select(F.explode(F.array_distinct("syms")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("sup"))
        .crossJoin(F.broadcast(nu))
        .where(F.col("sup") * 100 >= F.col("n") * r8._GSP_MINSUP_PCT)
        .select("t")
    )
    syms = sorted(r.t for r in f1.collect())
    n1 = len(syms)
    lits = ",".join("'" + s.replace("'", "''") + "'" for s in syms)
    s2a = r8._persisted(
        "gsp_s2a",
        spark,
        sf_dir,
        lambda: s2.select(
            F.expr(
                f"transform(array({lits}), s -> filter(sequence(1,"
                " size(syms)), i -> element_at(syms, i) = s))"
            ).alias("ma")
        ),
    )
    c2 = spark.createDataFrame(
        [(i, j) for i in range(1, n1 + 1) for j in range(1, n1 + 1)],
        "ai int, bi int",
    )
    scan2 = (
        s2a.crossJoin(F.broadcast(c2))
        .select(
            "ai",
            "bi",
            F.expr("element_at(ma, ai)").alias("_pa"),
            F.expr("element_at(ma, bi)").alias("_pb"),
        )
        .select(
            "ai",
            "bi",
            F.expr(
                "cast(size(_pa) > 0 and size(_pb) > 0"
                " and element_at(_pb, -1) > element_at(_pa, 1) as long)"
            ).alias("hit"),
        )
    )
    f2 = r8._persisted(
        "gsp_f2a",
        spark,
        sf_dir,
        lambda: (
            scan2.groupBy("ai", "bi")
            .agg(F.sum("hit").alias("sup"))
            .crossJoin(F.broadcast(nu))
            .where(F.col("sup") * 100 >= F.col("n") * r8._GSP_MINSUP_PCT)
            .select("ai", "bi")
        ),
    )
    c3 = (
        f2.join(
            f2.select(F.col("ai").alias("bi"), F.col("bi").alias("ci")),
            "bi",
        )
        .join(
            f2.select(F.col("ai").alias("ai"), F.col("bi").alias("ci")),
            ["ai", "ci"],
        )
        .select("ai", "bi", "ci")
    )
    scan3 = (
        s2a.crossJoin(F.broadcast(c3))
        .select(
            "ai",
            "bi",
            "ci",
            F.expr("element_at(ma, ai)").alias("_pa"),
            F.expr("element_at(ma, bi)").alias("_pb"),
            F.expr("element_at(ma, ci)").alias("_pc"),
        )
        .select(
            "ai",
            "bi",
            "ci",
            "_pa",
            "_pc",
            F.expr(
                "case when size(_pa) > 0 and size(_pb) > 0 then"
                " filter(_pb, p -> p > element_at(_pa, 1))"
                " end"
            ).alias("_pba"),
        )
        .select(
            "ai",
            "bi",
            "ci",
            F.expr(
                "case when size(_pa) > 0 and _pba is not null"
                " and size(_pc) > 0 and size(_pba) > 0"
                " then cast(element_at(_pc, -1) > element_at(_pba, 1)"
                " as long) else 0 end"
            ).alias("hit"),
        )
    )
    aud = (
        nu.select(F.lit(n1).cast("long").alias("n_f1"))
        .crossJoin(F.broadcast(f2.agg(F.count(F.lit(1)).alias("n_f2"))))
        .crossJoin(F.broadcast(c3.agg(F.count(F.lit(1)).alias("n_c3"))))
    )
    dict_arr = F.expr(f"array({lits})")
    mined = (
        scan3.groupBy("ai", "bi", "ci")
        .agg(F.sum("hit").alias("support"))
        .crossJoin(F.broadcast(nu))
        .where(F.col("support") * 100 >= F.col("n") * r8._GSP_MINSUP_PCT)
        .crossJoin(F.broadcast(aud))
        .select(
            dict_arr.getItem(F.col("ai") - 1).alias("a"),
            dict_arr.getItem(F.col("bi") - 1).alias("b"),
            dict_arr.getItem(F.col("ci") - 1).alias("c"),
            "support",
            F.expr("(support * 1000000) div n").alias("support_ppm"),
            "n_f1",
            "n_f2",
            "n_c3",
        )
    )
    audit_row = aud.select(
        F.lit("(levels)").alias("a"),
        F.lit("(levels)").alias("b"),
        F.lit("(levels)").alias("c"),
        F.lit(0).cast("long").alias("support"),
        F.lit(0).cast("long").alias("support_ppm"),
        "n_f1",
        "n_f2",
        "n_c3",
    )
    return mined.unionAll(audit_row)


ARMS = {
    "semdedup:fold": semdedup_variant("fold"),
    "semdedup:arrow": semdedup_variant("arrow"),
    "partwrite:repart": partwrite_variant("1"),
    "partwrite:norepart": partwrite_variant(str(1 << 60)),
    "jonckheere:old": jonckheere_old,
    "jonckheere:new": lambda: QUERIES["jonckheere_trend_priority"](spark, sf_dir),
    # NOTE: the gsp A/B (and --gsp-identity) was run while QUERIES
    # held the wave-3 string-keyed-map form; the int form has since
    # been LANDED in webanalytics_r8.py, so "gsp:map" now measures
    # the committed int form too (the arms should read ~equal after
    # landing — re-run against git history for the original A/B).
    "gsp:map": lambda: QUERIES["gsp_apriori_sequences"](spark, sf_dir),
    "gsp:int": gsp_int,
}

if "--gsp-identity" in sys.argv:
    a = QUERIES["gsp_apriori_sequences"](spark, sf_dir).toPandas()
    b = gsp_int().toPandas()
    key = ["a", "b", "c"]
    a = a.sort_values(key).reset_index(drop=True)[sorted(a.columns)]
    b = b.sort_values(key).reset_index(drop=True)[sorted(b.columns)]
    assert a.equals(b), (a, b)
    print(f"# gsp identity OK: {len(a)} rows identical", flush=True)
    spark.stop()
    sys.exit(0)

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
