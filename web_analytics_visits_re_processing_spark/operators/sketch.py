"""Count-min sketch as a DataFrame composition — frequency estimation
for heavy-hitter queries over keys too numerous to count exactly.

The classic streaming sketch (Cormode & Muthukrishnan 2005) maps each
key through ``depth`` independent hash rows of ``width`` buckets;
point estimates take the MINIMUM bucket count across rows, which
upper-bounds the true count (collisions only ever inflate).

Spark-first shape — no UDF, no driver-side sketch object:
- BUILD: one narrow explode (``depth`` (row, bucket) pairs per input
  row) into a hash aggregate. Partial aggregation combines map-side,
  so the shuffle carries at most ``depth × width`` rows per partition
  — the sketch table (e.g. 4×64 = 256 rows) IS the operator state,
  and it stays this size no matter how many input rows stream
  through. That is the whole point at 100 TB: exact per-key counting
  shuffles every distinct key; the sketch shuffles a constant.
- ESTIMATE: probe keys re-derive their buckets with the same portable
  hash and broadcast-join the tiny sketch table; ``min`` over rows.

The portable md5-based hash (``functions.text.hash64``) makes every
bucket assignment bit-identical in SQL, so build AND estimate are
fully oracle-replayable — unusual for a sketch, and exactly why this
one is hash-gated rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.functions.text import hash64

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 64


def _bucket(key: Column, j: int, width: int) -> Column:
    """Row-j bucket for a key: portable_hash('j|key') % width."""
    return F.pmod(hash64(F.concat_ws("|", F.lit(str(j)), key)), F.lit(width))


def count_min_table(
    df: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: ``(j, bucket, c)`` with ≤ depth×width rows."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    _bucket(F.col(key_col), j, width).alias("bucket"),
                )
                for j in range(depth)
            ]
        )
    )
    return (
        df.select(pairs.alias("p"))
        .select("p.j", "p.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point estimates for ``keys``: min bucket count across rows.
    The sketch side is broadcast (≤ depth×width rows by construction);
    the probe side explodes ``depth`` rows per key."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.j", "p.bucket")
    # LEFT join + coalesce-to-0: a canonical CMS estimate is the min
    # over ALL depth counters including empty buckets (count 0). An
    # inner join would silently drop the empty rows, inflating the
    # estimate for unseen keys (min over non-empty buckets only) or
    # losing the key entirely when every bucket is empty.
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_estimate"))
    )
