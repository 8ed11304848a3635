"""TPC-H-shaped SQL-text battery — the parser-path counterpart of the
DataFrame surface in ``relational.py``.

The reference has no SQL layer at all (its whole query capability is
the Beam DoFn chain, ``/root/reference/main.py:209-234``), so this
module is pure §2.2 gap-fill: classic decision-support shapes —
multi-way star joins, join-to-aggregate subqueries, outer-join
distributions, anti-join + scalar subquery — run through
``spark.sql`` so Catalyst's parser/analyzer path is exercised, not
just the DataFrame builders.

Shapes are adapted to the fixture schema (a cut-down TPC-H: no
partsupp, no comment/phone/address columns, synthetic ``NATION_N``
names). Every money aggregate is floor-scaled to integer cents PER
ROW before summing, so the group sums are exact integer arithmetic in
both engines — no float-summation-order hazard (the ``ROUND(SUM())``
fragility VERDICT r02 flagged on older oracles).

Scale notes (100 TB):
- Q5/Q7/Q10: nation/region/supplier/customer dims are broadcast by
  AQE (small side under the threshold); the only large-large join is
  orders⋈lineitem on the order key, one shuffle each side.
- Q18's HAVING subquery is a self-contained lineitem aggregation
  whose output (order keys over the quantity threshold) is tiny →
  Spark plans the IN as a broadcast semi-join.
- Q22's scalar subquery is a single-row broadcast; NOT EXISTS is a
  left-anti join against a date-pruned orders slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from web_analytics_visits_re_processing_spark.plans.registry import query
from web_analytics_visits_re_processing_spark.sources.tables import load_table


def _views(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# Per-row exact integer cents: FLOOR of an IEEE double product is
# bit-identical across engines; the subsequent SUM is pure int64.
_REV_CENTS = "CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)"


@query(
    "sql_q5_regional_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       CAST(SUM({_REV_CENTS}) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate <  DATE '1999-01-01'
GROUP BY n.n_name
ORDER BY revenue_cents DESC
""",
)
def q_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table star join (region→nation→supplier
    local to the customer nation), date-windowed, revenue per nation.
    The dims broadcast; orders⋈lineitem is the only shuffled join."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region"))
    return spark.sql(f"""
        SELECT n.n_name,
               CAST(SUM({_REV_CENTS}) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_items
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= DATE '1996-01-01'
          AND o.o_orderdate <  DATE '1999-01-01'
        GROUP BY n.n_name
        ORDER BY revenue_cents DESC
    """)


@query(
    "sql_q7_nation_trade_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
       CAST(SUM({_REV_CENTS}) AS BIGINT) AS volume_cents
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
  AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
GROUP BY n1.n_name, n2.n_name, CAST(YEAR(o.o_orderdate) AS INT)
ORDER BY supp_nation, cust_nation, order_year
""",
)
def q_sql_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional two-nation trade volume by year —
    the same dim table (nation) joined twice under different aliases,
    with a disjunctive cross-alias predicate the optimizer cannot
    push into either join alone."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation"))
    return spark.sql(f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
               CAST(SUM({_REV_CENTS}) AS BIGINT) AS volume_cents
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
          AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
        GROUP BY n1.n_name, n2.n_name, CAST(YEAR(o.o_orderdate) AS INT)
        ORDER BY supp_nation, cust_nation, order_year
    """)


@query(
    "sql_q10_returned_item_customers",
    oracle=f"""
SELECT c.c_custkey,
       c.c_name,
       n.n_name,
       CAST(SUM({_REV_CENTS}) AS BIGINT) AS lost_revenue_cents
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '1997-01-01'
  AND o.o_orderdate <  DATE '1997-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue_cents DESC, c.c_custkey
LIMIT 20
""",
)
def q_sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking, top 20 — join
    fact to two dims, filter on the fact, aggregate per customer,
    TakeOrdered top-k (no global sort materialization)."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(f"""
        SELECT c.c_custkey,
               c.c_name,
               n.n_name,
               CAST(SUM({_REV_CENTS}) AS BIGINT) AS lost_revenue_cents
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= DATE '1997-01-01'
          AND o.o_orderdate <  DATE '1997-07-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY lost_revenue_cents DESC, c.c_custkey
        LIMIT 20
    """)


@query(
    "sql_q13_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q_sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT
    OUTER join with an extra join-condition filter (kept customers
    with zero matches land in the c_count=0 bucket), double
    aggregation."""
    _views(spark, sf_dir, ("customer", "orders"))
    return spark.sql("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        ) per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """)


@query(
    "sql_q18_large_volume_orders",
    oracle="""
SELECT c.c_name,
       c.c_custkey,
       o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 300
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY total_cents DESC, o.o_orderkey
""",
)
def q_sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — IN over a grouped
    HAVING subquery. The subquery output (order keys whose quantity
    sum clears the threshold) is tiny, so the IN plans as a broadcast
    semi-join rather than a shuffled one. l_quantity is integral in
    the fixture; cast-to-bigint summation keeps the oracle HUGEINT-free."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql("""
        SELECT c.c_name,
               c.c_custkey,
               o.o_orderkey,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
               CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS total_cents,
               SUM(CAST(l.l_quantity AS BIGINT)) AS sum_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY total_cents DESC, o.o_orderkey
    """)


@query(
    "sql_q22_idle_high_balance_customers",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(FLOOR(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= DATE '2000-08-01'
  )
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def q_sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers gone idle — an
    uncorrelated scalar subquery (single-row broadcast) plus a
    correlated NOT EXISTS that Catalyst rewrites into a left-anti
    join against the date-pruned orders slice."""
    _views(spark, sf_dir, ("customer", "orders"))
    return spark.sql("""
        SELECT c.c_mktsegment,
               COUNT(*) AS n_custs,
               SUM(CAST(FLOOR(c.c_acctbal * 100) AS BIGINT)) AS bal_cents
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= DATE '2000-08-01'
          )
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """)
