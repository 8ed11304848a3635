"""Distributed k-means (Lloyd) over embedding columns — INTEGER-EXACT
so every iteration is bit-reproducible across engines and runs.

The float hazard in distributed k-means is that centroid means are
float sums whose value depends on reduction order, so two runs (or
two engines) can flip a boundary assignment and diverge. This
implementation removes floats from the state entirely:

- vectors are quantized once to int64 micro-units
  (``floor(x · 1e6)`` — exact on IEEE doubles in any engine);
- distances are exact int64 sums of squared component diffs
  (≤ 64 · (2·10^6)^2 ≈ 2.6e14, well inside int64);
- centroid updates are ``floor(sum / count)`` with the division done
  on exact-in-double integers (component sums stay < 2^53 up to
  ~10^9 rows per cluster; past that, split the mean hierarchically);
- ties break toward the smaller centroid id (struct ordering).

Scale shape per iteration: assignment is a pure projection against
k·dim centroid literals (the same bounded-model-parameter contract as
the IVF centroids — no shuffle, no join), and the update is
posexplode → groupBy(cluster, pos) whose map-side partial aggregation
means the shuffle carries ≤ k·dim rows per partition — constant in
corpus size. The driver holds exactly k·dim ints between iterations.

Init is the fixed-budget LCG-hash sample shared with the IVF operator
(``similarity.centroid_rank_hash``): deterministic, O(k·dim) driver
state, replayed verbatim in the SQL oracle. Empty clusters are
DROPPED at the update (the surviving centroid set is the means of
non-empty cells), which the oracle mirrors naturally.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.similarity import (
    centroid_rank_hash,
)

QUANT_SCALE = 1_000_000.0


def quantize_vec(vec: Column) -> Column:
    """float array → exact int64 micro-units (floor, not round: floor
    of an IEEE double is unambiguous in every engine)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(QUANT_SCALE)).cast("long")
    )


def _assign(pts: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest centroid per row — pure projection, zero shuffle.
    struct(d, cid) under array_min ⇒ min distance, tie → smaller cid.

    Built as ONE HOF expression over the centroid set as a single
    constant array literal: per-centroid Python Column arithmetic
    costs a py4j round-trip per node (seconds of driver time), and
    flat generated arithmetic at this width risks janino-OOM on a
    default-memory driver — the interpreted HOF fold has neither
    problem (see operators/pq.py for the full three-form history)."""
    cents_sql = "array(" + ", ".join(
        f"named_struct('cid', {int(cid)}L, 'c', array("
        + ", ".join(f"{int(v)}L" for v in c)
        + "))"
        for cid, c in cents
    ) + ")"
    expr = f"""
    array_min(transform({cents_sql}, e ->
      named_struct(
        'd', aggregate(zip_with(q, e.c, (a, b) -> (a - b) * (a - b)),
                       0L, (acc, x) -> acc + x),
        'cid', e.cid))).cid
    """
    return pts.withColumn("cluster", F.expr(expr))


def _assign_join(pts: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """BROADCAST-PACKED nearest-centroid assignment — the escalation
    path for centroid sets past the literal expression tree's comfort
    zone (~1k): the whole centroid set rides ONE broadcast row as an
    ``array<struct<cid, c>>`` column, and the identical HOF argmin
    fold as ``_assign`` runs against that column instead of a plan
    literal. Plan size is constant in k (the data moves in the
    broadcast, not the expression tree), the crossJoin with a 1-row
    side is a broadcast nested-loop that degenerates to a projection,
    and assignment stays ZERO-shuffle — strictly better than the
    row-per-centroid broadcast-join + ``min_by`` groupBy form, which
    pays a corpus-wide argmin shuffle with the vector riding every
    row. Distances and tie order are bit-identical to ``_assign``
    (same expression, different operand source), so both variants
    share one oracle."""
    spark = pts.sparkSession
    cents_df = spark.createDataFrame(
        [([(int(cid), [int(v) for v in c]) for cid, c in cents],)],
        "_cents array<struct<cid: bigint, c: array<bigint>>>",
    )
    expr = """
    array_min(transform(_cents, e ->
      named_struct(
        'd', aggregate(zip_with(q, e.c, (a, b) -> (a - b) * (a - b)),
                       0L, (acc, x) -> acc + x),
        'cid', e.cid))).cid
    """
    return (
        pts.crossJoin(F.broadcast(cents_df))
        .withColumn("cluster", F.expr(expr))
        .drop("_cents")
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 10,
    n_updates: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_via: str = "auto",
    keep_cols: tuple = (),
) -> DataFrame:
    """Lloyd's algorithm, ``n_updates`` update rounds, returning the
    final assignment ``(id, *keep_cols, cluster)`` under the last
    centroid set.

    ``assign_via``: ``"literal"`` (zero-shuffle HOF projection),
    ``"join"`` (broadcast-join argmin — constant plan size, the >1k-
    centroid path), or ``"auto"`` (literal up to 1000 centroids, join
    beyond). Both produce bit-identical assignments.

    ``keep_cols`` rides extra input columns through to the output so a
    consumer that needs the vector next to its cluster (SemDeDup's
    within-cluster pair scan) avoids a corpus-wide re-join against the
    narrow assignment — the pass-through costs nothing because
    assignment is a projection."""
    if assign_via == "auto":
        assign_via = "literal" if k <= 1000 else "join"
    assign = _assign if assign_via == "literal" else _assign_join
    pts = emb.select(
        id_col, *keep_cols, quantize_vec(F.col(vec_col)).alias("q")
    )
    init_rows = (
        pts.orderBy(centroid_rank_hash(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    # cid 0..k-1 in id order of the sampled rows (matches the oracle's
    # row_number() OVER (ORDER BY vec_id) - 1); clusters KEEP their cid
    # across updates (an empty cluster drops out without renumbering
    # the survivors).
    cents = [
        (cid, list(r["q"]))
        for cid, r in enumerate(sorted(init_rows, key=lambda r: r[id_col]))
    ]
    for _ in range(n_updates):
        assigned = assign(pts, cents)
        rows = (
            assigned.select("cluster", F.posexplode("q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        sizes: dict[int, int] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["s"]
            sizes[r["cluster"]] = r["n"]
        # floor(sum / count) on exact-in-double integers — identical to
        # the oracle's FLOOR(SUM(v)::DOUBLE / COUNT(*)); empty clusters
        # simply have no rows and drop out.
        cents = [
            (cid, [int(math.floor(comp[p] / sizes[cid])) for p in sorted(comp)])
            for cid, comp in sorted(by_cluster.items())
        ]
    return assign(pts, cents).select(id_col, *keep_cols, "cluster")
