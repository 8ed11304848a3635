"""Product quantization (Jégou et al. 2011) — embedding compression
for ANN at memory scales where full vectors can't be held.

A d-dim vector is split into ``m`` subvectors; each subspace gets a
small codebook (``n_codes`` entries) and a vector is stored as m
small codes (here 8 bytes total vs 256 for float32×64 — a 32×
compression). Query scoring is ADC (asymmetric distance computation):
the query precomputes an m×n_codes distance table once, and each
candidate's distance is m table lookups + adds instead of a d-dim dot
product.

Integer-exact like ``operators/kmeans``: subvectors are the same
int64 micro-unit quantization, codebooks are the fixed-budget LCG
sample (deterministic, O(n_codes·d) driver state — model parameters,
never data-proportional), distances are exact int64 sums. That makes
ENCODE and the full ADC top-k replayable in SQL — the gate no
float-codebook PQ could pass.

Expression-shape lessons (this operator went through three forms):
1. m·n_codes separate ``aggregate(zip_with(...))`` Column objects —
   ~1000 py4j round-trips cost ~9 s of DRIVER time per plan build.
2. Flat multiply-add arithmetic generated as SQL strings — builds in
   1 s, but whole-stage codegen emits a source file so large that
   janino compilation OOMs a default-memory (1 g) driver session.
3. (current) ONE higher-order-function expression folding over the
   codebook as a single constant array-of-arrays literal: HOFs are
   interpreted, so the generated codegen source stays tiny (no janino
   hazard), and the whole expression is one SQL parse (no py4j storm).
   Interpretation costs ~1 ms/row — fine for a projection that
   parallelizes per-partition with zero shuffle.

Scale shape:
- ``pq_encode`` is a ZERO-SHUFFLE projection: per subspace, argmin
  over n_codes codebook entries (struct-ordering ties to the smaller
  code). The output row is (id, m small ints) — the compressed corpus.
- ``pq_adc_topk`` broadcasts the (tiny) query side carrying its
  precomputed m×n_codes table as an array column; candidate scoring
  is ``m`` array lookups per row; the only exchange is the per-query
  top-k window over scored rows (WindowGroupLimit prunes to k per
  partition before the shuffle) — identical shape to the exact
  brute-force scorer, but each row costs m lookups instead of d
  multiplies and the corpus state read is the 8-byte code row, not
  the 256-byte vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.kmeans import quantize_vec
from web_analytics_visits_re_processing_spark.operators.similarity import (
    centroid_rank_hash,
)

PQ_M = 8  # subspaces
PQ_DSUB = 8  # dims per subspace (m · dsub = 64)
PQ_CODES = 16  # codebook entries per subspace


def pq_codebooks(
    emb: DataFrame,
    n_codes: int = PQ_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """``books[s][c]`` = quantized subvector ``c`` of subspace ``s`` —
    the n_codes LCG-hash-sampled rows (code order = id order), split
    into m contiguous slices. Bounded driver state: n_codes·dim ints."""
    pts = emb.select(id_col, quantize_vec(F.col(vec_col)).alias("q"))
    rows = (
        pts.orderBy(centroid_rank_hash(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(n_codes)
        .collect()
    )
    full = [list(r["q"]) for r in sorted(rows, key=lambda r: r[id_col])]
    return [
        [v[s * PQ_DSUB : (s + 1) * PQ_DSUB] for v in full] for s in range(PQ_M)
    ]


def _books_sql(books: list[list[list[int]]]) -> str:
    """The whole codebook as one constant array<array<array<bigint>>>
    literal — constant-folded once, referenced everywhere."""
    return (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{int(v)}L" for v in cb) + ")"
                for cb in books[s]
            )
            + ")"
            for s in range(PQ_M)
        )
        + ")"
    )


_QUANT_SQL = (
    "transform({vec}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
)

# r13 optimization: the previous shape re-evaluated ``slice(_q, ...)``
# and the codebook row lookup INSIDE the n_codes inner loop (16
# redundant slice allocations + literal traversals per subspace per
# row — HOFs run interpreted, nothing hoists them). Binding each
# once per subspace via the 1-element-array "let" idiom
# (``transform(array(x), v -> body)[0]``) measured 3.1× faster on
# the sf0.1 encode projection (1.195 → 0.383 s median noop) with 0
# value mismatches. ``body`` sees ``bs`` (the subspace's codebook,
# array<array<bigint>>) and ``sub`` (the row's subspace slice).
_SUBDIST_HOISTED = (
    "aggregate(zip_with(sub, element_at(bs, c + 1),"
    " (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
)


def _per_subspace(body: str, books: list[list[list[int]]]) -> str:
    """``transform(sequence(0, m-1), s -> body)`` with ``bs`` bound to
    the subspace's codebook and ``sub`` to the row's ``_q`` slice —
    each evaluated ONCE per (row, subspace), not once per code."""
    return (
        f"transform(sequence(0, {PQ_M - 1}), s -> "
        f"transform(array(element_at({_books_sql(books)}, s + 1)), bs -> "
        f"transform(array(slice(_q, s * {PQ_DSUB} + 1, {PQ_DSUB})), sub -> "
        f"{body})[0])[0])"
    )


def _quantized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.selectExpr(id_col, _QUANT_SQL.format(vec=vec_col) + " AS _q")


def pq_encode(
    emb: DataFrame,
    books: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress: ``(id, codes array<int>)`` — nearest sub-centroid per
    subspace, ties to the smaller code. Pure projection, no shuffle."""
    codes = _per_subspace(
        f"array_min(transform(sequence(0, {PQ_CODES - 1}), c -> "
        f"named_struct('d', {_SUBDIST_HOISTED}, 'code', CAST(c AS INT)))).code",
        books,
    )
    return _quantized(emb, id_col, vec_col).selectExpr(
        id_col, f"({codes}) AS codes"
    )


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    books: list[list[list[int]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: per-query m×n_codes squared-distance table built as
    a projection on the (broadcast) query side; candidates pay m
    array lookups each. Output ``(query_id, neighbor, adc_dist,
    rank)``."""
    codes = pq_encode(emb, books, id_col, vec_col)
    dtab = _per_subspace(
        f"transform(sequence(0, {PQ_CODES - 1}), c -> {_SUBDIST_HOISTED})",
        books,
    )
    qside = _quantized(
        queries.select(F.col(id_col).alias(query_id_col), vec_col),
        query_id_col,
        vec_col,
    ).selectExpr(query_id_col, f"({dtab}) AS dtab")
    scored = codes.join(F.broadcast(qside)).select(
        query_id_col,
        id_col,
        F.aggregate(
            F.zip_with(
                F.col("dtab"),
                F.col("codes"),
                lambda row, c: F.get(row, c),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy("adc_dist", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_ivf_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[int]]],
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
    """IVF-PQ (Jégou et al. 2011 §V): coarse IVF cells bound the
    candidate set, PQ-ADC scores the candidates — the composition
    production billion-vector indexes (FAISS IVFPQ) actually run,
    where neither half alone suffices: flat ADC still touches every
    code row (compute-bound), and IVF with exact rescoring still
    reads full vectors (memory-bound). Composed, a query reads
    ~n/n_centroids·n_probe code rows of 8 bytes each.

    Cells come from ``similarity.ivf_assign_literal`` — bit-identical
    to ``cosine_topk_ivf`` — and scoring is the integer-exact ADC of
    ``pq_adc_topk``, so the full composition replays in SQL. Output
    ``(query_id, id, adc_dist, rank)``: per-query top-k by SMALLEST
    ADC squared distance, ties to the smaller id.

    Scale shape: cell assignment is a zero-shuffle projection; the
    candidate join equi-joins on the cell id with the (tiny) probe
    side broadcast carrying each query's precomputed 8×16 distance
    table; the only exchange is the per-query top-k window, pruned to
    k per partition by WindowGroupLimit."""
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        ivf_assign_literal,
    )

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
    codes = _per_subspace(
        f"array_min(transform(sequence(0, {PQ_CODES - 1}), c -> "
        f"named_struct('d', {_SUBDIST_HOISTED}, 'code', CAST(c AS INT)))).code",
        books,
    )
    enc = corpus_cells.selectExpr(
        id_col, "_cell", _QUANT_SQL.format(vec=vec_col) + " AS _q"
    ).selectExpr(id_col, "_cell", f"({codes}) AS codes")
    dtab = _per_subspace(
        f"transform(sequence(0, {PQ_CODES - 1}), c -> {_SUBDIST_HOISTED})",
        books,
    )
    qside = probes.selectExpr(
        query_id_col, "_cell", _QUANT_SQL.format(vec="_qvec") + " AS _q"
    ).selectExpr(query_id_col, "_cell", f"({dtab}) AS dtab")
    scored = (
        enc.join(F.broadcast(qside), "_cell")
        .where(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                F.zip_with(
                    F.col("dtab"),
                    F.col("codes"),
                    lambda row, c: F.get(row, c),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy("adc_dist", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_quantization_error(
    emb: DataFrame,
    books: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector reconstruction error ``(id, qerr)`` — the exact
    int64 Σ over subspaces of the MINIMUM squared distance to any
    codebook entry (i.e. the distance the encoder's argmin realizes).
    The index-quality metric a production ANN deployment monitors per
    ingest batch: rising quantization error on a new data slice means
    the codebooks no longer fit the distribution and recall is
    silently degrading (Jégou et al. 2011 §IV ties ADC error bounds
    to exactly this quantity). Pure zero-shuffle projection, same
    single-HOF expression shape as ``pq_encode``."""
    per_sub = _per_subspace(
        f"array_min(transform(sequence(0, {PQ_CODES - 1}), c -> "
        f"{_SUBDIST_HOISTED}))",
        books,
    )
    err = f"aggregate({per_sub}, 0L, (acc, x) -> acc + x)"
    return _quantized(emb, id_col, vec_col).selectExpr(
        id_col, f"({err}) AS qerr"
    )
