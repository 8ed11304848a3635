"""Distributed connected components — the dedup *clustering* step.

Near-dup detection (MinHash-LSH / SimHash, ``operators/dedup.py``)
emits PAIRS; a training-data pipeline needs transitive CLUSTERS so
each duplicate group keeps exactly one canonical document (``A~B`` and
``B~C`` must put A, B, C in one group even though ``A~C`` was never
emitted as a pair). The reference stops at per-event processing and
has no graph step — this fills that §2.2 gap with the standard
min-label-propagation algorithm.

Scale design (the 100 TB question):
- Each iteration is ONE shuffle over the symmetrized edge list joined
  to the current labels, plus a map-side-combinable ``min`` aggregate.
  Near-dup graphs are overwhelmingly tiny clusters (pairs ∝ duplicate
  docs, not docs²), so the edge list is far smaller than the corpus
  and the loop converges in O(cluster diameter) iterations — single
  digits in practice for dedup workloads.
- Lineage is truncated every iteration with an eager
  ``localCheckpoint`` — without it the plan doubles per iteration and
  the driver dies on plan explosion long before data size matters.
  (On a real cluster, ``spark.cleaner`` reclaims the shuffle files of
  superseded iterations; checkpointed partitions are executor-local.)
- The driver-side loop runs one tiny ``isEmpty``-style convergence
  action per iteration (a count of changed labels) — this is control
  flow, not data movement; the label table itself never leaves the
  executors. This is the same driver-loop shape GraphX/MLlib use for
  iterative algorithms.
- For graphs with giant components / long chains, the large-star /
  small-star variant (alternating min over neighbors-plus-self)
  halves diameter per round; the hook below keeps the simple variant
  because dedup clusters are shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable from it.

    Returns ``(node_col, component)`` — one row per node; singletons
    (no incident edge) are their own component. Raises ``RuntimeError``
    if ``max_iterations`` passes without convergence (a diameter that
    big means the input is not a dedup graph — fail loudly rather
    than return wrong clusters).
    """
    sym = (
        edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("nbr"))
        .union(edges.select(F.col(dst_col).alias("node"), F.col(src_col).alias("nbr")))
        .distinct()
    )
    # Edge lists are small relative to the corpus; keep them hot
    # across iterations instead of re-deriving the LSH pipeline.
    sym.persist()
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint(eager=True)

    try:
        for _ in range(max_iterations):
            nbr_min = (
                sym.join(labels, on="node")
                .groupBy(F.col("nbr").alias("node"))
                .agg(F.min("component").alias("nbr_component"))
            )
            new_labels = (
                labels.join(nbr_min, on="node", how="left")
                .select(
                    "node",
                    F.least(
                        "component", F.coalesce("nbr_component", "component")
                    ).alias("component"),
                    (F.col("nbr_component") < F.col("component")).alias("_changed"),
                )
                .localCheckpoint(eager=True)
            )
            converged = new_labels.where(F.col("_changed")).isEmpty()
            labels = new_labels.drop("_changed")
            if converged:
                return labels.select(F.col("node").alias(node_col), "component")
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def dedup_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 25,
) -> DataFrame:
    """Near-dup pairs → transitive dedup clusters: ``(doc_id,
    component, is_canonical)`` where ``component`` is the minimum
    doc_id of the cluster and ``is_canonical`` marks the single
    document a keep-one dedup pass retains."""
    comp = connected_components(
        docs.select(id_col), pairs, node_col=id_col, max_iterations=max_iterations
    )
    return comp.select(
        id_col,
        "component",
        (F.col(id_col) == F.col("component")).alias("is_canonical"),
    )


def pagerank_scaled(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Weighted PageRank with INTEGER-EXACT arithmetic — the iterative
    companion to ``connected_components``.

    Float PageRank sums contributions in shuffle order, so two runs
    (let alone two engines) disagree in the last ulps and ranking ties
    flip. This variant keeps ranks as int64 millionths: each node
    starts at 10^6; a node u with rank R and out-strength W_u sends
    ``(R · 85 · w) div (100 · W_u)`` along each out-edge of weight w
    (d = 0.85 as the exact ratio 85/100), and every node holds a base
    of 150 000 (= (1-d)·10^6). Truncating integer division drops sub-
    millionth mass instead of redistributing it — a deterministic,
    engine-portable PageRank variant whose iterations replay verbatim
    in SQL (the gate no float PageRank could pass). Dangling-node mass
    is dropped, the usual simplification.

    Scale shape per iteration: one shuffle — ranks equi-join the edge
    list on src (ranks table is |V|, edge list |E|; AQE broadcasts the
    rank side when tiny), then a map-side-combinable SUM groupBy dst.
    Lineage is localCheckpoint-truncated each round like the
    connected-components loop; the driver never sees the rank table.

    Overflow bound: R < |V|·10^6, so R·85·w needs |V|·w < 10^11 —
    beyond that, lower the rank scale.
    """
    src, dst, w = F.col(src_col), F.col(dst_col), F.col(weight_col)
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
    )
    outw = edges.groupBy(src_col).agg(F.sum(weight_col).alias("wout"))
    e = edges.join(outw, src_col).select(
        src.alias("c_src"), dst.alias("c_dst"), w.alias("c_w"), "wout"
    )
    ranks = nodes.withColumn("r", F.lit(1_000_000).cast("long"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.c_src == ranks.node)
            .select(
                F.col("c_dst").alias("node"),
                F.expr("r * 85 * c_w div (100 * wout)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(150_000).cast("long") + F.coalesce("s", F.lit(0))).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_e6"))
