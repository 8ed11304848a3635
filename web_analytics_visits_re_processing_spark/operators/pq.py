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

Scale shape:
- ``pq_encode`` is a ZERO-SHUFFLE projection: per subspace, argmin
  over n_codes literal sub-centroids (struct-ordering ties to the
  smaller code). The output row is (id, m small ints) — the
  compressed corpus.
- ``pq_adc_topk`` broadcasts the (tiny) query side carrying its
  precomputed m×n_codes table as an array literal column; candidate
  scoring is ``m`` array lookups per row (zip_with + aggregate, all
  codegen); the only exchange is the per-query top-k window over
  scored rows — identical shape to the exact brute-force scorer, but
  each row costs m lookups instead of d multiplies and the corpus
  state read is the 8-byte code row, not the 256-byte vector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def _sub(q: Column, s: int) -> Column:
    return F.slice(q, s * PQ_DSUB + 1, PQ_DSUB)


def _subdist(sub: Column, cb: list[int]) -> Column:
    c = F.array(*[F.lit(int(v)).cast("long") for v in cb])
    return F.aggregate(
        F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_encode(
    emb: DataFrame,
    books: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress: ``(id, codes array<int>)`` — nearest sub-centroid per
    subspace, ties to the smaller code. Pure projection, no shuffle."""
    pts = emb.select(id_col, quantize_vec(F.col(vec_col)).alias("q"))
    codes = F.array(
        *[
            F.array_min(
                F.array(
                    *[
                        F.struct(
                            _subdist(_sub(F.col("q"), s), cb).alias("d"),
                            F.lit(c).cast("int").alias("code"),
                        )
                        for c, cb in enumerate(books[s])
                    ]
                )
            )["code"]
            for s in range(PQ_M)
        ]
    )
    return pts.select(id_col, codes.alias("codes"))


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    books: list[list[list[int]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: per-query m×n_codes distance table built as a
    projection on the (broadcast) query side; candidates pay m array
    lookups each. Output ``(query_id, neighbor id, adc_dist, rank)``."""
    codes = pq_encode(emb, books, id_col, vec_col)
    dtab = F.array(
        *[
            F.array(
                *[
                    _subdist(_sub(F.col("q"), s), books[s][c])
                    for c in range(PQ_CODES)
                ]
            )
            for s in range(PQ_M)
        ]
    )
    qside = queries.select(
        F.col(id_col).alias(query_id_col),
        quantize_vec(F.col(vec_col)).alias("q"),
    ).select(query_id_col, dtab.alias("dtab"))
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
