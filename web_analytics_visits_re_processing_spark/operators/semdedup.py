"""SemDeDup — semantic deduplication via embedding clusters
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

The published recipe: k-means the corpus embeddings, then look for
near-duplicate pairs ONLY within each cluster (cosine above
``1 - eps``) and keep one representative per duplicate relation.
Clustering is what makes the quadratic step tractable at web scale —
pair search never crosses cluster boundaries, so the cost is
``Σ |cluster|²`` instead of ``N²``, and k grows with the corpus to
keep clusters bounded (the paper uses k = 11k for LAION-440M; cluster
count, not cluster size, absorbs corpus growth).

This implementation composes two existing pieces:

- ``operators/kmeans.py::kmeans_assign`` — the INTEGER-EXACT Lloyd
  pass (bit-reproducible across engines), with ``keep_cols`` riding
  the raw vector through assignment so no re-join is needed;
- the 4-dp-rounded double cosine from ``operators/similarity.py`` —
  the same engine-portable score the ANN/near-dup family gates on.

Determinism of the keep rule: the paper keeps a random / farthest-
from-centroid representative per duplicate group; we use the standard
deterministic proxy — a vector is a semantic duplicate iff some
SAME-CLUSTER partner with a SMALLER id sits within the cosine
threshold, so the minimum id of every duplicate chain survives as the
representative. That rule replays verbatim in SQL (EXISTS over the
pair set), which is what makes the whole operator hash-gateable.

Scale shape: assignment is the zero-shuffle kmeans projection; the
pair scan is ONE equi-join on the cluster id (never all-pairs); the
dup-flag stamp is a left semi-ish join on the id. Cluster-key skew is
governed by k: the operator inherits the paper's contract that k is
sized to the corpus (bounded cluster cardinality), and the kmeans
``assign_via="join"`` escalation already covers k past the literal
expression tree's comfort zone.

Reference parity note: the reference pipeline (Beam, main.py) has no
dedup of any kind — this operator belongs to the LLM-training-data
extension tier (SURVEY.md §2.2 / BASELINE.json north_star), rounding
out the dedup ladder: exact → MinHash/Jaccard → SimHash → embedding
LSH → semantic (cluster-scoped) dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.kmeans import kmeans_assign


def _pairs_from_assigned(
    assigned: DataFrame,
    tau: float,
    id_col: str,
    vec_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Within-cluster near-dup pair scan over an existing
    ``(id, vec, cluster)`` assignment — ONE equi-join on the cluster
    id, never all-pairs.

    The cluster key is SALTED ``n_salt`` ways (b-side bucket =
    ``id % n_salt``, a-side replicated across buckets): a demo-scale
    k (10 here) leaves only k join keys, capping parallelism at k
    reducers however many cores exist; salting raises the key count
    to k·n_salt with identical output (the pair SET is key-layout-
    independent). The replication cost is a-side × n_salt, which is
    the narrow (id, vec, cluster) projection — cheap next to the
    cosine work it spreads out. Production-scale SemDeDup (k ~ 10⁴⁺)
    can set n_salt=1; the paper's k already provides the keys.

    Per-vector L2 norms are precomputed ONCE on the assignment (one
    HOF fold per vector) so each of the O(sum |cluster|^2) pair
    evaluations runs a single interpreted HOF (the dot) instead of
    three -- HOF lambdas never enter codegen, so the pair scan's cost
    is literally the interpreted-fold count (whole-query warm wall at
    sf0.1: 8.6 -> 4.1 s). ``dot/(na*nb)`` with separately-rooted norms is the exact
    expression shape of the shared ``cosine()`` helper, value-
    identical to the oracle's list_cosine_similarity."""
    with_norm = assigned.withColumn(
        "_v", F.col(vec_col).cast("array<double>")
    ).withColumn(
        "_nrm",
        F.sqrt(F.aggregate("_v", F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    a = with_norm.withColumn(
        "_sb", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).alias("a")
    b = with_norm.withColumn(
        "_sb", (F.col(id_col) % n_salt).cast("int")
    ).alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a._v"), F.col("b._v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("a._nrm") * F.col("b._nrm")), 4)
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a._sb") == F.col("b._sb"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(cos >= F.lit(tau))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.cluster").alias("cluster"),
            cos.alias("cos"),
        )
    )


def semdedup_pairs(
    emb: DataFrame,
    k: int = 10,
    n_updates: int = 1,
    tau: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_via: str = "auto",
) -> DataFrame:
    """Within-cluster near-duplicate pairs → ``(id_a, id_b, cluster,
    cos)`` with ``id_a < id_b`` and 4-dp cosine ≥ ``tau``.

    ``tau`` is the paper's ``1 - eps`` knob; the default 0.35 is tuned
    to the synthetic test embeddings (near-orthogonal random vectors —
    real corpora run this at 0.95+).

    Scale note: the N² is confined WITHIN clusters, so the knob that
    keeps it bounded as the corpus grows is ``k`` — scale k ∝ corpus
    size (SemDeDup's own protocol: ~N/1000 clusters) so mean cluster
    size, and with it the per-cluster pair volume, stays constant. A
    fixed k at 10× data means 10× clusters sizes and ~100×/k pair
    candidates — the 10× probe (BASELINE.md) shows the onset of
    exactly that curve."""
    assigned = kmeans_assign(
        emb,
        k=k,
        n_updates=n_updates,
        id_col=id_col,
        vec_col=vec_col,
        assign_via=assign_via,
        keep_cols=(vec_col,),
    ).localCheckpoint(eager=True)
    return _pairs_from_assigned(assigned, tau, id_col, vec_col)


def semdedup_verdicts(
    emb: DataFrame,
    k: int = 10,
    n_updates: int = 1,
    tau: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_via: str = "auto",
) -> DataFrame:
    """Per-vector SemDeDup verdict → ``(id, cluster,
    is_semantic_dup)``: True iff a same-cluster partner with a smaller
    id is within the cosine threshold (the min-id representative of
    every duplicate chain survives with False).

    Runs ONE Lloyd pass; the materialized assignment is shared
    between both sides of the pair self-join AND the verdict stamp
    (localCheckpoint — without it each of the three consumers replays
    the full scan + quantize + argmin lineage, measured 3.4× slower
    at sf0.1)."""
    assigned = kmeans_assign(
        emb,
        k=k,
        n_updates=n_updates,
        id_col=id_col,
        vec_col=vec_col,
        assign_via=assign_via,
        keep_cols=(vec_col,),
    ).localCheckpoint(eager=True)
    dup_ids = (
        _pairs_from_assigned(assigned, tau, id_col, vec_col)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.join(dup_ids, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_semantic_dup"),
        )
    )
