"""Similarity search over embedding columns (``array<float>``).

Two paths, same contract:

- ``cosine_topk_bruteforce`` — exact: broadcast the (small) query set
  against the corpus, score with a NATIVE dot-product expression
  (``zip_with`` + ``aggregate`` — JVM codegen, no Python), rank with a
  per-query window. At 100 TB the corpus side stays partitioned and
  the query side is a broadcast — no shuffle of the big side at all;
  cost is one scan × |queries| fused multiply-adds.
- ``cosine_topk_lsh`` — approximate: random-hyperplane LSH buckets
  (hyperplanes are deterministic seed-generated literals baked into
  the plan), equi-join query↔corpus on bucket id, then exact scoring
  within buckets. Turns the scan×queries product into a hash join on
  a small key; recall is tested against the brute-force baseline.

A vectorized Pandas-UDF scorer (numpy matmul over Arrow batches) is
provided as ``cosine_scores_pandas`` for very high dimensional data
where per-element codegen loses to BLAS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ in double precision (left-fold in array order — the same
    deterministic order DuckDB's list functions use, so results are
    oracle-comparable).

    r13 measurement note: an explicit 64-term unrolled sum (bit-equal
    left-association, size-guarded fallback) was tried and REVERTED —
    the hot cosines here live inside aggregate expressions and join
    conditions, which Spark evaluates interpreted, and 64 discrete
    expression nodes evaluate SLOWER there than ArrayAggregate's
    tight fold loop (probe: ivf_join 2.8→11.8 s, mmr 3.7→6.7 s with
    the unroll; bit-equality itself verified, 0 mismatches/320k)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query → (query_id, vec_id, cos).

    Ranking uses the 4-decimal-rounded score with the neighbor id as
    tiebreak, making the result deterministic and engine-portable.
    """
    # r13 norm hoist (guide §1.2): every corpus row pairs with every
    # query, so the row's norm fold re-ran |queries|× (and each
    # query's |corpus|×) inside ``cosine()``. One fold per row per
    # side; the pair expression dot/(_vnorm·_qnorm) is bit-identical
    # to ``cosine()``'s tree.
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qnorm"),
    )
    scored = (
        corpus.withColumn("_vnorm", l2_norm(F.col(vec_col)))
        .crossJoin(F.broadcast(q))
        .where(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("_qvec"), F.col(vec_col))
                / (F.col("_qnorm") * F.col("_vnorm")),
                4,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_planes_for(n: int) -> int:
    """Corpus-banded hyperplane count for PAIR-emitting bucket joins:
    a fixed plane count fixes the bucket universe (2^planes), so
    bucket occupancy — and with it the self-join candidate volume
    n²/2^planes — grows quadratically with the corpus (the SemDeDup
    fixed-k lesson applied to hyperplane LSH). Banding keeps expected
    occupancy ≲ 256 through ~4×10⁹ vectors (comfortably past a
    100 TB embedding table) while staying a STATIC, oracle-mirrorable
    rule: the DuckDB side selects the same arm from COUNT(*), and
    every fixture SF resolves to the original 8 planes so gate values
    never move. Search-style bucket probes (top-k) keep their fixed
    planes — their cost is occupancy-linear, a constant-factor knob,
    not a quadratic join."""
    if n <= 1 << 16:
        return 8
    if n <= 1 << 24:
        return 16
    return 24


def lsh_bucket(vec_col: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane bucket id: bit i = sign(v·hᵢ). The planes are
    literal arrays in the plan — deterministic across runs/executors.
    The plane matrix ships as ONE parsed SQL literal and the bit fold
    is a single zip_with/aggregate pair (per-value ``F.lit`` built
    n_planes×dim py4j Columns and dominated invocation time — the
    jl_project/PQ lesson; CAST('<repr>' AS DOUBLE) round-trips
    exactly, and shiftleft takes a column amount in SQL)."""
    planes = _hyperplanes(dim, n_planes, seed)
    mat_sql = ", ".join(
        "array(" + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in p) + ")"
        for p in planes
    )
    bits = F.zip_with(
        F.expr(f"array({mat_sql})"),
        F.expr(f"sequence(0, {int(n_planes) - 1}, 1)"),
        lambda p, i: F.call_function(
            "shiftleft", (dot(vec_col, p) > 0).cast("long"), i
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    probe_hamming: int = 0,
) -> DataFrame:
    """ANN top-k: candidates = same LSH bucket, then exact rescoring.

    With b planes the corpus splits into 2^b buckets; expected
    candidates per query = n/2^b. Recall tuning: more planes → faster
    + lower recall.

    ``probe_hamming=1`` enables MULTI-PROBE: each query also probes
    every bucket one bit-flip away (the planes whose side the query
    sits closest to are the likeliest to disagree for true neighbors),
    so candidates = corpus vectors whose bucket is within hamming 1 of
    the query's. The corpus side is untouched — the query side explodes
    to ``n_planes + 1`` probe rows, still a broadcast, and the join
    stays an equi-join on the bucket id. Raises recall from ~0.6-0.8 to
    ≳0.9 at the same plane count for ~(p+1)× the candidate volume —
    the standard multi-probe LSH trade (Lv et al., VLDB'07).
    """
    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming supports 0 (exact bucket) or 1")
    c = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
    qb = lsh_bucket(F.col(vec_col), dim, n_planes)
    # r13 norm hoist, QUERY side only: a query's norm fold re-ran per
    # candidate inside ``cosine()``; hoisting it costs |queries| folds
    # and saves one per pair. The CORPUS norm stays per-pair — most
    # corpus rows match no probe (n/2^b bucket selectivity), so a
    # corpus-wide norm column would cost n folds to save fewer.
    if probe_hamming == 0:
        probe = qb.alias("_bucket")
        q = queries.select(
            F.col(id_col).alias(query_id_col),
            F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qnorm"),
            probe,
        )
    else:
        probes = F.array(qb, *[qb.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)])
        q = queries.select(
            F.col(id_col).alias(query_id_col),
            F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qnorm"),
            F.explode(probes).alias("_bucket"),
        )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .where(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("_qvec"), F.col(vec_col))
                / (F.col("_qnorm") * l2_norm(F.col(vec_col))),
                4,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos", "rk")
    )


def cosine_scores_pandas(
    corpus: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-vectorized scorer: one numpy matmul per batch. The scale
    path when dim is large enough that BLAS beats codegen.

    NB: ``pd`` must be module-level — under ``from __future__ import
    annotations`` PySpark resolves the UDF's string type hints against
    the function's globals, so a function-local import makes the UDF
    unresolvable (caught by test_cosine_scores_pandas_matches_native).
    """
    from pyspark.sql.functions import pandas_udf

    qv = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(qv)

    @pandas_udf("double")
    def _score(vecs: pd.Series) -> pd.Series:
        # float64 up front: accumulating dot/norm in the storage dtype
        # (float32 embeddings) loses ~1e-7 per component, visibly off
        # the native double-precision fold.
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        sims = (m @ qv) / (np.linalg.norm(m, axis=1) * qn)
        return pd.Series(sims)

    return corpus.select(id_col, _score(F.col(vec_col)).alias("cos"))


#: LCG constants (Numerical Recipes): the centroid-ranking hash must be
#: pure integer arithmetic so Spark and the DuckDB oracle compute the
#: exact same sample. The pre-mod keeps the product < 2^63 (no overflow,
#: which Spark-ANSI and DuckDB would both reject rather than wrap).
_CENT_HASH_MULT = 1103515245
_CENT_HASH_ADD = 12345
_CENT_HASH_MOD = 2147483648


def centroid_rank_hash(id_col: Column) -> Column:
    """Deterministic pseudo-random rank for centroid sampling; identical
    arithmetic is replayed in the SQL oracle."""
    return (
        (id_col % _CENT_HASH_MOD) * _CENT_HASH_MULT + _CENT_HASH_ADD
    ) % _CENT_HASH_MOD


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    *,
    cents: list | None = None,
    corpus_cells: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize into cells around sampled
    centroids, probe the ``n_probe`` nearest cells per query, exact
    rescoring inside probed cells.

    Centroids are a FIXED-BUDGET deterministic sample: the
    ``n_centroids`` corpus rows with the smallest LCG hash of their id
    (IVF without the Lloyd iterations — centroid choice only affects
    recall, never correctness, and the integer-arithmetic hash is what
    makes the sample oracle-replayable). The top-k-by-hash runs as
    TakeOrderedAndProject (per-partition heap of ``n_centroids``, no
    full sort), so the driver collects O(n_centroids·dim) — independent
    of corpus size, unlike a stride sample whose centroid count grows
    with n and eventually OOMs the driver / blows up the expression
    tree. Collected once as MODEL PARAMETERS (like the LSH
    hyperplanes) and baked into the plan as literals, cell assignment
    is a PURE PROJECTION over the corpus scan: n_centroids fused dot
    products, no shuffle, no join for the assignment — the classic IVF
    trade of k·dim flops per row for a candidate set of
    ~n/n_centroids·n_probe. Past ~1k centroids the literal expression
    tree itself gets large; at that point switch assignment to a
    broadcast-join + min_by aggregation instead of literals.

    Assignment ties break toward the smaller centroid id on the
    8-decimal-rounded similarity (cross-engine determinism).
    """
    corpus_cells, probes = ivf_assign_literal(
        corpus,
        queries,
        n_centroids,
        n_probe,
        id_col,
        vec_col,
        query_id_col,
        cents=cents,
        corpus_cells=corpus_cells,
    )
    return _probe_rescore_topk(corpus_cells, probes, k, id_col, query_id_col, vec_col)


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """The fixed-budget deterministic centroid sample (see
    ``cosine_topk_ivf``) as collected MODEL PARAMETERS — a bounded
    ``n_centroids``-row TakeOrdered collect, shared by every IVF
    variant so callers that stage the corpus assignment can still
    build probe-side literals without recomputing the corpus scan."""
    return sorted(
        (r[0], list(r[1]))
        for r in corpus.select(id_col, vec_col)
        .orderBy(
            centroid_rank_hash(F.col(id_col)).asc(), F.col(id_col).asc()
        )
        .limit(n_centroids)
        .collect()
    )


def _py_l2_norm(vec: list) -> float:
    """The EXACT left-fold-then-sqrt of ``l2_norm`` computed driver-
    side on the collected centroid doubles: ``acc + x·x`` in IEEE
    double array order, then a correctly-rounded sqrt — bit-identical
    to the JVM fold, so the value can ship as a plan literal."""
    import math

    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _ivf_cell_structs(cents: list) -> "callable":
    """(sim, -cid) struct-array builder over the centroid literals.

    The literal array ships as ONE parsed SQL expression (the
    PQ codebook / jl_project lesson): the per-value
    ``F.lit(float(x))`` formulation issued n_centroids×dim py4j
    calls per call site (~10k for the default 64×64, twice) and cost
    11.9 s of every invocation in pure DataFrame BUILD time
    (measured; CAST('<repr>' AS DOUBLE) round-trips exactly).

    r13 norm hoist: callers pass the row's norm as a column computed
    ONCE per row, and each centroid's norm rides the literal struct
    (``_py_l2_norm`` — bit-equal to the JVM fold), so the per-
    centroid lambda runs ONE interpreted fold (the dot) instead of
    three."""
    cells_sql = ", ".join(
        "named_struct('cvec', array("
        + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in cvec)
        + f"), 'neg_cid', {-cid}L, 'cnorm', CAST('{_py_l2_norm(cvec)!r}' AS DOUBLE))"
        for cid, cvec in cents
    )

    def cell_structs(vec: Column, vnorm: Column) -> Column:
        # struct ordering compares fields in order: (sim, -cid) under
        # array_max → highest sim, then smallest cid.
        return F.transform(
            F.expr(f"array({cells_sql})"),
            lambda c: F.struct(
                F.round(
                    dot(vec, c["cvec"]) / (vnorm * c["cnorm"]), 8
                ).alias("sim"),
                c["neg_cid"].alias("neg_cid"),
            ),
        )

    return cell_structs


def ivf_corpus_cells(
    corpus: DataFrame,
    cents: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus-side IVF assignment as a pure projection —
    ``(id_col, vec_col, _cell)``, one nearest cell per corpus row.
    THE stage-once intermediate of the IVF family: the interpreted
    64-cosine HOF per row is the family's dominant cost, and every
    literal-path consumer (exact-rescore IVF, IVF+PQ) needs the
    bit-identical assignment — materialize it per (session, sf)
    instead of recomputing per query (the r10 stitched-visitor-map
    precedent)."""
    cell_structs = _ivf_cell_structs(cents)
    return corpus.withColumn("_vnorm", l2_norm(F.col(vec_col))).select(
        id_col,
        vec_col,
        (
            -F.array_max(cell_structs(F.col(vec_col), F.col("_vnorm")))[
                "neg_cid"
            ]
        ).alias("_cell"),
    )


def ivf_query_probes(
    queries: DataFrame,
    cents: list,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Query-side IVF probe assignment —
    ``(query_id_col, _qvec, _cell)``, the ``n_probe`` nearest cells
    per query row. Query sets are small (top-k search), so this side
    is never worth staging."""
    cell_structs = _ivf_cell_structs(cents)
    return (
        queries.withColumn("_qnorm", l2_norm(F.col(vec_col)))
        .select(
            F.col(id_col).alias(query_id_col),
            F.col(vec_col).alias("_qvec"),
            "_qnorm",
            F.explode(
                F.slice(
                    F.sort_array(
                        cell_structs(F.col(vec_col), F.col("_qnorm")),
                        asc=False,
                    ),
                    1,
                    n_probe,
                )
            ).alias("_probe"),
        )
        .select(
            query_id_col,
            "_qvec",
            "_qnorm",
            (-F.col("_probe.neg_cid")).alias("_cell"),
        )
    )


def ivf_assign_literal(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 64,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    *,
    cents: list | None = None,
    corpus_cells: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The literal-projection IVF assignment ``cosine_topk_ivf``
    documents, shared so compositions (e.g. IVF+PQ in
    ``operators/pq.py``) get bit-identical cells: returns
    ``(corpus_cells, probes)``. Pass ``corpus_cells`` (e.g. a staged
    parquet leaf from a previous invocation) to skip the corpus-side
    reassignment, and ``cents`` to skip the centroid collect; the
    contract is that both came from the SAME deterministic sample —
    which ``ivf_centroids`` guarantees for a given (corpus,
    n_centroids). See ``cosine_topk_ivf`` for the centroid-sample and
    tie-break contract."""
    if cents is None:
        cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    if corpus_cells is None:
        corpus_cells = ivf_corpus_cells(corpus, cents, id_col, vec_col)
    probes = ivf_query_probes(
        queries, cents, n_probe, id_col, vec_col, query_id_col
    )
    return corpus_cells, probes


def cosine_topk_ivf_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN with JOIN-based cell assignment — the escalation path
    ``cosine_topk_ivf`` names for centroid counts past the literal
    expression tree's comfort zone (~1k): centroids NEVER leave the
    executors. Same deterministic LCG-hash sample, kept as a DataFrame;
    assignment is corpus × broadcast(centroids) → ``max_by`` over the
    (8-dp sim, smaller-cid) preference — bit-identical cells to the
    literal path, so both variants share one oracle.

    The trade: the pure-projection literal path assigns with zero
    shuffle; this path pays one corpus-sized shuffle for the
    ``groupBy(id)`` reduction (map-side combine makes it one row per
    corpus row) but scales in n_centroids without touching the driver
    or the plan size. Scoring uses the interpreted HOF cosine per
    (row × centroid) pair — at very high dim swap the assignment
    scorer for the Arrow/BLAS ``cosine_scores_pandas`` shape."""
    # r13 norm hoist (guide §1.2 per-task work): ``cosine()`` is THREE
    # interpreted HOF folds (dot + both norms); under the centroid
    # cross join each corpus row's norm re-ran n_centroids× and each
    # centroid's norm |corpus|×. Precompute the norms ONCE per row on
    # each side — the pair expression ``dot/(_vnorm·_cnorm)`` is the
    # exact float expression tree of ``cosine()`` (dot, product,
    # divide — bit-identical), but the assignment stage now runs ONE
    # fold per (row × centroid) instead of three.
    cents = (
        corpus.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"))
        .orderBy(centroid_rank_hash(F.col("_cid")).asc(), F.col("_cid").asc())
        .limit(n_centroids)
        .withColumn("_cnorm", l2_norm(F.col("_cvec")))
    )
    pref = F.struct(
        F.round(
            dot(F.col(vec_col), F.col("_cvec"))
            / (F.col("_vnorm") * F.col("_cnorm")),
            8,
        ).alias("sim"),
        (-F.col("_cid")).cast("long").alias("neg_cid"),
    )
    corpus_cells = (
        corpus.withColumn("_vnorm", l2_norm(F.col(vec_col)))
        .crossJoin(F.broadcast(cents))
        .groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.max_by(F.col("_cid"), pref).alias("_cell"),
        )
    )
    qscored = (
        queries.select(
            F.col(id_col).alias(query_id_col),
            F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qnorm"),
        )
        .crossJoin(F.broadcast(cents))
        .select(
            query_id_col,
            "_qvec",
            "_cid",
            F.round(
                dot(F.col("_qvec"), F.col("_cvec"))
                / (F.col("_qnorm") * F.col("_cnorm")),
                8,
            ).alias("_sim"),
        )
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_sim").desc(), F.col("_cid").asc()
    )
    probes = (
        qscored.withColumn("_rk", F.row_number().over(wq))
        .where(F.col("_rk") <= n_probe)
        .select(
            query_id_col,
            "_qvec",
            l2_norm(F.col("_qvec")).alias("_qnorm"),
            F.col("_cid").alias("_cell"),
        )
    )
    return _probe_rescore_topk(corpus_cells, probes, k, id_col, query_id_col, vec_col)


def _probe_rescore_topk(
    corpus_cells: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str,
    query_id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared IVF tail: candidates from the cell equi-join (probe side
    broadcast), exact rescoring, per-query top-k window.

    r13 norm hoist, probe side only: every probe row carries its
    ``_qnorm`` (one fold per probe, computed by the producer), saving
    one interpreted fold per candidate pair; the corpus norm stays
    per-pair because most corpus rows match no probe."""
    scored = (
        corpus_cells.join(F.broadcast(probes), "_cell")
        .where(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("_qvec"), F.col(vec_col))
                / (F.col("_qnorm") * l2_norm(F.col(vec_col))),
                4,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos", "rk")
    )


# --- JL dim-reduce → candidate → exact rerank ---------------------------------

def jl_signs(in_dim: int = 64, out_dim: int = 16, seed: int = 9_157) -> list[list[int]]:
    """±1 sign matrix for the signed (Achlioptas-style) Johnson-
    Lindenstrauss projection — out_dim rows of in_dim signs from the
    same MINSTD LCG recipe as the PQ/IVF codebooks: deterministic,
    O(out_dim·in_dim) bounded model-parameter state, replayed as
    literals in the SQL oracle."""
    x, rows = seed, []
    for _ in range(out_dim):
        row = []
        for _ in range(in_dim):
            x = (48271 * x) % 2147483647
            row.append(1 if (x & 1) else -1)
        rows.append(row)
    return rows


def jl_project(vec_q: Column, signs: list[list[int]]) -> Column:
    """Project the int64 micro-quantized vector ``vec_q`` through the
    ±1 sign matrix: out_j = Σᵢ s_ji·qᵢ — INTEGER-EXACT (sums of ±q
    components stay far inside int64), a pure zero-shuffle projection,
    and engine-portable so both the sketch and everything ranked on it
    replay verbatim in SQL.

    The sign matrix ships as ONE parsed SQL array-of-arrays literal
    (the PQ codebook lesson, ``operators/pq.py:_books_sql``): the
    previous ``F.array(*[F.lit(s).cast("long") ...])`` formulation
    issued ~2×out_dim×in_dim py4j calls per projection and cost
    ~3.9 s of every invocation in pure DataFrame BUILD time at
    out_dim=16/in_dim=64 (measured; execution itself is 0.6 s). One
    ``F.expr`` string is one py4j call; same values, same plan."""
    rows_sql = ", ".join(
        "array(" + ", ".join(f"{int(s)}L" for s in row) + ")" for row in signs
    )
    mat = F.expr(f"array({rows_sql})")
    return F.transform(
        mat,
        lambda row: F.aggregate(
            F.zip_with(vec_q, row, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def cosine_topk_jl_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    in_dim: int = 64,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage ANN — the third classic billion-scale shape next to
    IVF (partition pruning) and PQ (compressed-domain ranking):
    DIM-REDUCE → CANDIDATE → EXACT RERANK.

    Stage 1 scores every (query, corpus) pair in the 16-dim INTEGER
    sketch space — ¼ the multiply-adds of the full 64-dim float
    cosine, integer-exact so the candidate cut is deterministic and
    SQL-replayable (float sketch scores would tie-break on ulps).
    Candidates = per-query top ``n_candidates`` by (sketch dot desc,
    id). Stage 2 reranks ONLY the candidates with the exact 64-dim
    cosine. The corpus side never shuffles: sketches are a zero-
    shuffle projection, stage 1 is corpus × broadcast(query sketches),
    and both window cuts partition by query id over the tiny candidate
    stream.

    Like all sketch-space cuts this trades recall for compute — the
    planted-cluster pytest pins what survives; widen ``n_candidates``
    or ``out_dim`` for tighter guarantees.
    """
    signs = jl_signs(in_dim, out_dim)
    quant = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(1_000_000.0)).cast("long")
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col), jl_project(quant, signs).alias("_sk")
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        jl_project(quant, signs).alias("_qsk"),
    )
    sk_dot = F.aggregate(
        F.zip_with("_sk", "_qsk", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_skdot").desc(), F.col(id_col).asc()
    )
    cand = (
        c.crossJoin(F.broadcast(q))
        .where(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, vec_col, "_qvec", sk_dot.alias("_skdot"))
        .withColumn("_crk", F.row_number().over(wq))
        .where(F.col("_crk") <= n_candidates)
    )
    wr = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        cand.select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("_qvec"), F.col(vec_col)), 4).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos", "rk")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-k most-similar corpus vectors with a DIFFERENT label →
    (query_id, vec_id, cos, rk). "Hard" = maximally confusable — the
    negatives that actually move a contrastive loss, vs the
    uninformative random negatives in-batch sampling yields.

    Same scale shape as ``cosine_topk_bruteforce``: the anchor set
    broadcasts, the corpus never shuffles except the per-anchor top-k
    window, and the label-mismatch predicate rides the broadcast join
    (at production scale swap the crossJoin for the IVF/LSH candidate
    path exactly as the ANN family escalates — the mining rule is
    unchanged, only candidate generation narrows)."""
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qnorm"),
        F.col(label_col).alias("_qlabel"),
    )
    # r13 norm hoist (cross join: every corpus row meets every anchor)
    scored = (
        corpus.withColumn("_vnorm", l2_norm(F.col(vec_col)))
        .crossJoin(F.broadcast(q))
        .where(
            (F.col(query_id_col) != F.col(id_col))
            & (F.col(label_col) != F.col("_qlabel"))
        )
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("_qvec"), F.col(vec_col))
                / (F.col("_qnorm") * F.col("_vnorm")),
                4,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos", "rk")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """k-nearest-neighbor label vote → (query_id, pred_label,
    n_votes): majority label among the k exact nearest corpus vectors
    (4-dp portable cosine, neighbor-id tiebreak), prediction ties
    broken toward the SMALLER label — every step deterministic and
    SQL-replayable.

    Scale shape: the neighbor search is ``cosine_topk_bruteforce``
    (anchor set broadcast, corpus scan shuffle-free, per-anchor top-k
    window); the vote then touches only |queries|·k rows, which
    BROADCAST back onto the corpus for the label stamp — the corpus
    is never shuffled for the join. At production scale the IVF/LSH
    candidate paths swap in under the unchanged vote rule."""
    topk = cosine_topk_bruteforce(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )
    labeled = corpus.select(id_col, label_col).join(
        F.broadcast(topk.select(query_id_col, id_col)), on=id_col
    )
    votes = labeled.groupBy(query_id_col, label_col).agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("n_votes").desc(), F.col(label_col)
    )
    return (
        votes.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(query_id_col, F.col(label_col).alias("pred_label"), "n_votes")
    )
