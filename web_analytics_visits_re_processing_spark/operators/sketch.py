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


# --- HyperLogLog --------------------------------------------------------------
#
# Flajolet et al. 2007: distinct counting from a fixed m-register
# table of max leading-zero ranks. Same Spark-first contract as the
# CMS above — no UDF, no driver-side sketch object, and the portable
# hash makes BOTH the register table and the estimate replayable in
# SQL (registers are pure integer arithmetic; the estimate's only
# float steps are built from exact integers in a fixed expression
# order, then floor-scaled).
#
# Scale shape: one explode-free narrow projection into a hash
# aggregate keyed on (group, register). Map-side partial MAX combines
# before the shuffle, so the exchange carries ≤ m rows per group per
# partition and the final state is ≤ m rows per group — distinct
# counting whose shuffle is constant in the number of input rows AND
# in the number of distinct keys. Register tables from disjoint
# slices merge by register-wise MAX (pinned in pytest), which is what
# makes the sketch reaggregatable across days/partitions at 100 TB.

HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
# hash64 yields 60 portable bits; P index bits leave 54 for the rank,
# so rho ∈ [1, 55] with 55 = "remainder all zeros".
HLL_MAX_RHO = 55
# alpha_64 is a published constant (not derived in floats at runtime).
HLL_ALPHA_M = 0.709


def hll_registers(
    df: DataFrame, key_col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The register table: ``(group..., r_idx, r_rho)`` with ≤ m rows
    per group. r_rho = rank of the leftmost 1-bit of the hash
    remainder (bit-identical in any engine with md5 + bin)."""
    h = hash64(F.col(key_col).cast("string"))
    rem = F.shiftright(h, HLL_P)
    rho = (
        F.when(rem == 0, F.lit(HLL_MAX_RHO))
        .otherwise(F.lit(HLL_MAX_RHO) - F.length(F.bin(rem)))
        .cast("long")
    )
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(HLL_M - 1)).alias("r_idx"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "r_idx")
        .agg(F.max("rho").alias("r_rho"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Cardinality estimate from a register table.

    Float hazard note: the harmonic-mean denominator is accumulated
    as the EXACT integer ``sum(2^(55 - rho))`` (≤ 2^61, fits int64) —
    summation order cannot perturb it, unlike summing ``2^-rho``
    doubles. The remaining float steps (one divide, optionally one
    ln for the small-range linear-counting branch) use literals
    written identically in the SQL oracle, and the output ships
    floor-scaled ×1e4."""
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_set"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_MAX_RHO} - r_rho)")).alias(
            "s_present"
        ),
    )
    v_empty = (F.lit(HLL_M) - F.col("n_set")).cast("long")
    s_scaled = (
        F.col("s_present") + v_empty * F.lit(1 << HLL_MAX_RHO).cast("long")
    ).cast("long")
    raw = (
        F.lit(HLL_ALPHA_M * HLL_M * HLL_M)
        * F.lit(float(1 << HLL_MAX_RHO))
        / s_scaled.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v_empty > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_empty.cast("double")),
    ).otherwise(raw)
    return per.select(
        *group_cols,
        v_empty.alias("v_empty"),
        s_scaled.alias("s_scaled"),
        F.floor(est * 10000).cast("long").alias("hll_estimate_e4"),
    )


# --- count-banded profile distinct (the lsh_planes_for precedent) ------------

# A whole-table profile's EXACT per-column distinct counts plan as one
# EXPAND whose aggregation state is every distinct value of every
# column — at 100 TB that state is the table. Above this band the
# profile downgrades its distinct counts to the portable md5 HLL
# (registers above: ≤ 64 rows of shuffle state per column, the
# mergeable sketch the hll_merge_groups gate machine-checks), keeping
# null/min/max exact. Static, oracle-mirrorable rule: the SQL side
# selects the same arm from the same COUNT(*), and every fixture SF
# resolves to the exact arm so gate values never move.
PROFILE_EXACT_DISTINCT_MAX = 1 << 26  # 67,108,864 rows


def profile_distinct_mode(n_rows: int) -> str:
    """'exact' (count_distinct via EXPAND) or 'hll' (portable md5
    HLL registers) — banded on the profiled table's row count."""
    return "exact" if n_rows <= PROFILE_EXACT_DISTINCT_MAX else "hll"
