"""Bloom filter as a DataFrame composition — set membership with no
false negatives, for join pruning and cheap existence probes.

Classic Bloom (1970) with Kirsch–Mitzenmacher double hashing: key →
k positions ``(h1 + i·h2) mod m``; the filter is the SET of positions
(≤ m rows), built with one distinct over an explode — map-side
partial dedup keeps the shuffle ≤ m rows per partition, so like the
CMS/HLL sketches the state is CONSTANT in input size.

Two consumption shapes:

- ``bloom_probe``: relational membership — probe keys re-derive their
  positions and broadcast-join the position set; ``maybe_present``
  iff all k positions hit. No false negatives ever; false positives
  at the standard ``(1 - e^{-kn/m})^k`` rate. Fully portable-hash
  SQL-replayable, so even the FP count is hash-gated.

- ``bloom_words`` → ``bloom_member_expr``: the JOIN-PRUNING shape.
  The position set is packed into m/64 int64 words (a ≤ m/64-row
  aggregate — the one driver collect here is of this CONSTANT-size
  packed filter, ~1 KB, independent of data volume) and inlined as a
  literal array, so the big-side membership test is a pure
  projection-time filter: zero extra shuffle, pushed to the scan,
  exactly the shape of Spark's own runtime bloom pruning
  (spark.sql.optimizer.runtimeFilter.*) but available to explicit
  pipelines. FPs pass the prefilter and are removed by the exact
  join that follows, so pruned-join ≡ plain join (pinned in pytest
  and by the SQL oracle being the PLAIN join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.functions.text import hash64

DEFAULT_M = 4096  # bits
DEFAULT_K = 3  # hash functions

# MINSTD-style constants for the pure-integer double hash. The md5
# portable hash costs ~3.5 µs/row (conv hex→dec dominates, not md5) —
# per-row noise for sketches probed once per key, but the bloom
# prefilter runs on EVERY big-side row of a join, where integer
# multiply-mod is ~free and equally replayable in any SQL engine.
_MERS31 = 2147483647  # 2^31 - 1 (prime)
_A1, _A2 = 48271, 69621


def bloom_positions(key: Column, k: int = DEFAULT_K, m: int = DEFAULT_M) -> list[Column]:
    """k bit positions for an INTEGRAL key — Kirsch–Mitzenmacher
    double hashing from two multiply-mod-prime mixes (h2 odd-ified so
    it never degenerates). String keys: pre-hash with
    ``functions.text.hash64`` and pass the int. ``(key % p)·A`` and
    ``h1 + (k-1)·h2`` stay far inside int64 (no ANSI overflow)."""
    kk = F.pmod(key.cast("long"), F.lit(_MERS31))
    h1 = F.pmod(kk * _A1, F.lit(_MERS31))
    h2 = F.pmod(kk * _A2, F.lit(_MERS31)) * 2 + 1
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def bloom_build(
    df: DataFrame, key_col: str, k: int = DEFAULT_K, m: int = DEFAULT_M
) -> DataFrame:
    """The filter itself: distinct set positions, ≤ m rows."""
    key = F.col(key_col)
    return (
        df.select(F.explode(F.array(*bloom_positions(key, k, m))).alias("pos"))
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
) -> DataFrame:
    """Membership for ``keys``: ``maybe_present`` iff all k positions
    are set. Bloom side broadcasts (≤ m rows by construction)."""
    key = F.col(key_col)
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*bloom_positions(key, k, m))).alias("pos"),
    )
    hit = bloom.withColumn("hit", F.lit(1))
    return (
        probes.join(F.broadcast(hit), "pos", "left")
        .groupBy(key_col)
        .agg((F.count("hit") == F.lit(k)).alias("maybe_present"))
    )


def bloom_words(
    df: DataFrame, key_col: str, k: int = DEFAULT_K, m: int = DEFAULT_M
) -> list[int]:
    """Pack the filter into m/64 int64 words driver-side. The collect
    is of the ≤ m/64-row packed aggregate — constant size by design
    (the same bounded-model-parameter contract as the IVF centroid
    budget), never proportional to the data."""
    packed = (
        bloom_build(df, key_col, k, m)
        .groupBy(F.shiftright("pos", 6).alias("w"))
        .agg(
            F.bit_or(
                # variable-amount shift: the Python shiftleft binding only
                # takes int literals, but the SQL function takes expressions
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), F.col("pos").bitwiseAND(63)
                )
            ).alias("word")
        )
        .collect()
    )
    words = [0] * (m // 64)
    for r in packed:
        words[r["w"]] = r["word"]
    return words


def bloom_member_expr(
    words: list[int], key: Column, k: int = DEFAULT_K, m: int = DEFAULT_M
) -> Column:
    """Projection-time membership predicate over the literal packed
    filter — no join, no shuffle; Catalyst pushes it to the scan."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for pos in bloom_positions(key, k, m):
        word = F.element_at(arr, (F.call_function("shiftright", pos, F.lit(6)) + 1).cast("int"))
        bit = F.call_function("shiftright", word, pos.bitwiseAND(63)).bitwiseAND(1)
        cond = cond & (bit == 1)
    return cond
