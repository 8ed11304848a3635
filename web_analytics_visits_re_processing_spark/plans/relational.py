"""Relational query inventory over the TPC-H-ish fixtures (SURVEY §2.2).

The reference has ZERO joins, one aggregate, and no sorts/set-ops —
these queries are the capability gap our engine fills, each one an
idiomatic single DataFrame expression that Catalyst plans (broadcast
joins for dims, partial aggregation, pushdown — see bench notes).

Oracle conventions: every computed column aliased identically both
sides; money sums ``ROUND(_, 2)``; dates exchanged as ``yyyy-MM-dd``
strings; timestamps as epoch micros (bigint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.plans.registry import query
from web_analytics_visits_re_processing_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- aggregation -----------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_extendedprice), 2) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1(spark, sf_dir):
    """TPC-H Q1 shape: scan+filter+hash agg; partial aggregation and
    parquet pushdown do the heavy lifting (sum/avg/count in one pass)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_rollup_orders",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
""",
)
def agg_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "agg_cube_lineitem",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
)
def agg_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


@query(
    "count_distinct_nations_per_segment",
    oracle="""
SELECT c_mktsegment AS segment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       ROUND(AVG(c_acctbal), 2) AS avg_acctbal,
       ROUND(MIN(c_acctbal), 2) AS min_acctbal,
       ROUND(MAX(c_acctbal), 2) AS max_acctbal
FROM customer
GROUP BY c_mktsegment
""",
)
def count_distinct_segment(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
    )


@query(
    "approx_count_distinct_users",
    # The sketch's ESTIMATE is implementation-specific (Spark's
    # HLL++ vs anything DuckDB runs), so the estimate itself can
    # never hash across engines — but its ERROR-BOUND INEQUALITY
    # can: the oracle states the contract (|est − exact| ≤ 3%·exact,
    # i.e. 3σ at rsd=0.01) as the constant it must evaluate to.
    oracle="""
SELECT COUNT(DISTINCT user_id)::BIGINT AS n_exact,
       1::BIGINT AS within_3pct
FROM events
""",
)
def approx_users(spark, sf_dir):
    """HLL++ distinct-user estimate, gated by its error bound — the
    eval-gate pattern (same contract as ``lsh_recall_vs_truth``): the
    query co-computes the exact COUNT(DISTINCT) as its own referee
    and emits the cross-multiplied integer inequality
    ``|approx − exact|·100 ≤ exact·3`` (3σ at rsd=0.01), which IS
    hash-gateable even though the sketch internals are not. At
    100 TB production drops the referee and keeps the single-pass
    fixed-memory sketch; the exact arm exists here because the gate's
    JOB is to measure the sketch against truth. The independent
    error-bound pytest (<5% relative error) still runs alongside."""
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("apx"),
    ).select(
        "n_exact",
        (F.abs(F.col("apx") - F.col("n_exact")) * 100 <= F.col("n_exact") * 3)
        .cast("long")
        .alias("within_3pct"),
    )


# --- joins -----------------------------------------------------------------

@query(
    "join_revenue_by_region",
    oracle="""
SELECT r_name AS region, n_name AS nation,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def join_revenue(spark, sf_dir):
    """orders⋈customer⋈nation⋈region: the dims are broadcast (nation/
    region always; customer under AQE at small SF), so the fact table
    never shuffles until the final two-column aggregate."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    n, r = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "join_left_customer_order_counts",
    oracle="""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spend
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
)
def join_left(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "join_semi_customers_with_open_orders",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
""",
)
def join_semi(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return c.join(
        o.where(F.col("o_orderstatus") == "O"),
        c.c_custkey == o.o_custkey,
        "left_semi",
    ).select("c_custkey", "c_mktsegment")


@query(
    "join_anti_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "range_join_lineitem_ship_window",
    oracle="""
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_lineitems,
       ROUND(SUM(l_extendedprice), 2) AS price_sum
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
           AND l_shipdate >= o_orderdate
           AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
""",
)
def range_join(spark, sf_dir):
    """Equi-key + range predicate: Catalyst plans the equi-join and
    applies the range as a post-join filter — no cross product."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
        )
    )


# --- window functions ------------------------------------------------------

@query(
    "window_rank_top3_parts_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rk
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           ROW_NUMBER() OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS rk
    FROM part
) WHERE rk <= 3
""",
)
def window_rank(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


@query(
    "topk_orders_by_price",
    oracle="""
SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def topk_orders(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + single driver merge, no full sort at scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .limit(10)
    )


# --- set operations --------------------------------------------------------

@query(
    "set_union_nation_keys",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_union(spark, sf_dir):
    c, s = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "set_intersect_nation_keys",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark, sf_dir):
    c, s = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_except_nation_keys",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except(spark, sf_dir):
    c, s = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    # subtract == EXCEPT DISTINCT (exceptAll would keep keys whose
    # occurrence count exceeds the right side's — not set semantics)
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


# --- scalar function surface -------------------------------------------------

@query(
    "scalar_functions_showcase",
    oracle="""
SELECT o_orderkey,
       UPPER(o_orderstatus) AS status_upper,
       SUBSTRING(o_orderpriority, 1, 1) AS priority_digit,
       string_split(o_orderpriority, '-')[2] AS priority_word,
       len(string_split(o_orderpriority, '-')) AS priority_parts,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
       ABS(o_totalprice - 100000) AS price_dist,
       o_orderkey % 7 AS key_mod
FROM orders
WHERE o_totalprice > 150000
""",
)
def scalar_showcase(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_totalprice") > 150000).select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("priority_digit"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(2)).alias("priority_word"),
        F.size(F.split("o_orderpriority", "-")).alias("priority_parts"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        # NB: deliberately tie-free — ROUND(x*1.1, 2) on 2-decimal money
        # hits exact .xx5 halves where Spark (BigDecimal HALF_UP) and
        # other engines (scaled std::round) legitimately disagree.
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
        F.abs(F.col("o_totalprice") - 100000).alias("price_dist"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@query(
    "join_right_orders_customer",
    oracle="""
SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders
FROM orders
RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
""",
)
def join_right(spark, sf_dir):
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer_nation_coverage",
    oracle="""
SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
       COALESCE(cn.n_cust, 0) AS n_cust,
       COALESCE(sn.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
      FROM customer GROUP BY c_nationkey) cn
FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
                 FROM supplier GROUP BY s_nationkey) sn
  ON cn.nationkey = sn.nationkey
""",
)
def join_full(spark, sf_dir):
    c, s = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        cn.join(sn, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "grouping_sets_orders",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
""",
)
def grouping_sets(spark, sf_dir):
    """GROUPING SETS via the engine's SQL entry point (the DataFrame
    API covers rollup/cube; sets compose through spark.sql)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n_orders
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


@query(
    "set_ops_all_variants",
    # Bag-semantics set ops: ALL variants keep multiplicities
    # (INTERSECT ALL = min(count), EXCEPT ALL = count difference) —
    # the half of the set-op surface the distinct variants above
    # don't touch. Aggregated to (nationkey, op, n) so the result is
    # deterministic and hash-comparable.
    oracle="""
WITH u AS (
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
),
i AS (
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
),
e AS (
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
)
SELECT nationkey, op, COUNT(*) AS n FROM (
    SELECT nationkey, 'union_all' AS op FROM u
    UNION ALL
    SELECT nationkey, 'intersect_all' AS op FROM i
    UNION ALL
    SELECT nationkey, 'except_all' AS op FROM e
) GROUP BY nationkey, op
""",
)
def set_ops_all_variants(spark, sf_dir):
    """UNION ALL / INTERSECT ALL / EXCEPT ALL (bag semantics — kept
    multiplicities are what the distinct set-op trio above can't
    express), collapsed to per-key counts for a deterministic gate."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    tagged = (
        c.unionAll(s).withColumn("op", F.lit("union_all"))
        .unionByName(c.intersectAll(s).withColumn("op", F.lit("intersect_all")))
        .unionByName(c.exceptAll(s).withColumn("op", F.lit("except_all")))
    )
    return tagged.groupBy("nationkey", "op").agg(F.count(F.lit(1)).alias("n"))


@query(
    "null_semantics_battery",
    # SQL null semantics in one gate: null-safe equality (<=> / IS NOT
    # DISTINCT FROM), NULLS FIRST/LAST window ordering, NULLIF/NVL2,
    # and count(col) vs count(*) asymmetry. The fixture has no null
    # cells, so nulls are INJECTED deterministically (orderkey ends in
    # 1 → null priority) identically in both engines.
    oracle="""
WITH base AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 1 THEN NULL ELSE o_orderpriority END AS pr,
           o_custkey
    FROM orders
)
SELECT o_custkey,
       COUNT(*) AS n_rows,
       COUNT(pr) AS n_nonnull,
       SUM(CASE WHEN pr IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_nullsafe_null,
       SUM(CASE WHEN NULLIF(COALESCE(pr, 'X'), 'X') IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_roundtrip_null,
       MIN(pr) AS min_pr,
       FIRST(pr ORDER BY pr ASC NULLS FIRST, o_orderkey ASC) AS first_nulls_first
FROM base
GROUP BY o_custkey
HAVING COUNT(*) >= 2
""",
)
def null_semantics_battery(spark, sf_dir):
    """Null-handling surface in one query: injected nulls, null-safe
    equality (``eqNullSafe`` ≡ IS NOT DISTINCT FROM), NULLIF/COALESCE
    round-trip, count(col)-skips-nulls asymmetry, and NULLS FIRST
    window ordering (min_by over an explicit null-ordered struct would
    hide it; ``first`` over the sorted window pins it)."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 1, F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ).alias("pr"),
        "o_custkey",
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("pr").asc_nulls_first(), F.col("o_orderkey").asc()
    )
    stamped = base.withColumn("_first", F.first("pr", ignorenulls=False).over(w))
    return (
        stamped.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("pr").alias("n_nonnull"),
            F.sum(
                F.when(F.col("pr").eqNullSafe(F.lit(None)), 1).otherwise(0)
            ).alias("n_nullsafe_null"),
            F.sum(
                F.when(
                    F.nullif(F.coalesce(F.col("pr"), F.lit("X")), F.lit("X")).isNull(),
                    1,
                ).otherwise(0)
            ).alias("n_roundtrip_null"),
            F.min("pr").alias("min_pr"),
            F.first("_first").alias("first_nulls_first"),
        )
        .where(F.col("n_rows") >= 2)
    )
