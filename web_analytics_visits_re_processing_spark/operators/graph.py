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
