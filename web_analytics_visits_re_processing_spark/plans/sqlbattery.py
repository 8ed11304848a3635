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
WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
  AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
GROUP BY n1.n_name, n2.n_name, CAST(YEAR(o.o_orderdate) AS INT)
ORDER BY supp_nation, cust_nation, order_year
""",
)
def q_sql_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional two-nation trade volume by year —
    the same dim table (nation) joined twice under different aliases,
    with a disjunctive cross-alias predicate the optimizer cannot
    push into either join alone. The nation pair is (13, 19) — chosen
    (r11) because it trades at EVERY fixture SF (48/108/1023 joined
    rows at sf0.001/0.01/0.1); the original (2, 7) had zero sf0.001
    trades, a vacuous entry-scale gate."""
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
        WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
            OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
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


# --- round-5: the rest of the classic TPC-H battery ---------------------------
# Q2/Q11 need partsupp — since round 7 both run against a DERIVED
# partsupp (per-(part,supplier) min observed unit price from
# lineitem; see sql_q2/sql_q11 at the bottom of this file) — and
# Q4/Q12/Q20/Q21's commit/receipt-date or shipmode columns don't
# exist in the cut-down fixture; those shapes are adapted (noted per
# query) — every other query is the classic form. All 12 below share ONE SQL text between the Spark run and the
# DuckDB oracle (no date-string emission, so zero dialect drift);
# money stays exact integer cents per the module convention.

def _dual(name: str, doc: str, sql: str, tables: tuple[str, ...]):
    """Register a query whose Spark SQL and DuckDB oracle are the SAME
    text — the strongest possible parser-path parity check."""

    @query(name, oracle=sql)
    def _q(spark: SparkSession, sf_dir: str, _sql=sql, _tables=tables) -> DataFrame:
        _views(spark, sf_dir, _tables)
        return spark.sql(_sql)

    _q.__doc__ = doc
    return _q


_dual(
    "sql_q4_order_priority_check",
    """TPC-H Q4 shape (adapted: no commit/receipt dates in the fixture
    — 'late' means a lineitem shipped after the order date): priority
    counts over an EXISTS semi-join, one quarter window.""",
    """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    ("orders", "lineitem"),
)

_dual(
    "sql_q6_forecast_revenue",
    """TPC-H Q6: single-table predicate scan with the classic
    discount-band + quantity filter — the pure pushdown/codegen
    benchmark; revenue as exact per-row floored cents.""",
    """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    ("lineitem",),
)

_dual(
    "sql_q8_national_market_share",
    """TPC-H Q8: market share of one supplier nation inside a region's
    PROMO-part market, per order year — 8-table join tree; the share
    ratio is a single correctly-rounded division of two exact integer
    sums, emitted alongside both operands.""",
    """
SELECT order_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol_cents ELSE 0 END) AS BIGINT)
           AS nation_cents,
       CAST(SUM(vol_cents) AS BIGINT) AS total_cents,
       ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN vol_cents ELSE 0 END)
             / CAST(SUM(vol_cents) AS DOUBLE), 6) AS mkt_share
FROM (
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
           n2.n_name AS nation,
           CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
               AS vol_cents
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1998-01-01'
) volumes
GROUP BY order_year
ORDER BY order_year
""",
    ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
)

_dual(
    "sql_q9_product_type_profit",
    """TPC-H Q9 shape (adapted: no partsupp supply cost — profit is
    discounted revenue): per supplier-nation per year over parts whose
    name contains 'red', LIKE-filtered mid-join-tree.""",
    """
SELECT n.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS profit_cents
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
ORDER BY nation, o_year DESC
""",
    ("part", "lineitem", "supplier", "orders", "nation"),
)

_dual(
    "sql_q12_shipping_priority_classes",
    """TPC-H Q12 shape (adapted: no shipmode column — lines classed by
    l_linestatus): orders⋈lineitem with the classic two-bucket CASE
    aggregation on order priority.""",
    """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
    ("orders", "lineitem"),
)

_dual(
    "sql_q14_promo_revenue_share",
    """TPC-H Q14: PROMO-part share of one month's revenue — CASE-gated
    numerator and total emitted as exact cents with the ratio as one
    rounded division.""",
    """
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS total_cents,
       ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                      ELSE 0 END)
             / CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                    AS DOUBLE), 6) AS promo_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1997-09-01' AND l.l_shipdate < DATE '1997-10-01'
""",
    ("lineitem", "part"),
)

_dual(
    "sql_q15_top_supplier",
    """TPC-H Q15: top revenue supplier(s) for a quarter — grouped
    revenue CTE consumed twice (join + scalar-subquery MAX), ties kept
    like the spec.""",
    """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue)
ORDER BY s.s_suppkey
""",
    ("supplier", "lineitem"),
)

_dual(
    "sql_q16_part_supplier_counts",
    """TPC-H Q16 shape (adapted: lineitem is the part↔supplier bridge
    — the fixture has no partsupp): distinct supplier counts per
    (brand, type, size) with a NOT IN exclusion subquery (negative-
    balance suppliers).""",
    """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 9, 17, 25, 33, 41, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    ("part", "lineitem", "supplier"),
)

_dual(
    "sql_q17_small_quantity_revenue",
    """TPC-H Q17: revenue locked in small-quantity orders of one brand
    — correlated scalar subquery (20% of the part's average quantity)
    that Catalyst rewrites to an aggregate-join.""",
    """
SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#2'
  AND l.l_quantity < (
      SELECT CAST(0.2 AS DOUBLE) * AVG(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
""",
    ("lineitem", "part"),
)

_dual(
    "sql_q19_discounted_revenue",
    """TPC-H Q19 shape (adapted: no container column — brand × size ×
    quantity bands): the classic disjunction-of-conjunctions predicate
    that exercises join-filter factoring.""",
    """
SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    ("lineitem", "part"),
)

_dual(
    "sql_q20_promotion_part_suppliers",
    """TPC-H Q20 shape (adapted: threshold on the supplier's shipped
    quantity of 'red' parts in the year, no partsupp availability):
    IN over a grouped HAVING subquery → broadcast semi-join.""",
    """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY l.l_suppkey
    HAVING SUM(l.l_quantity) > 50
)
ORDER BY s.s_suppkey
""",
    ("supplier", "lineitem", "part"),
)

_dual(
    "sql_q21_waiting_suppliers",
    """TPC-H Q21 shape (adapted: 'the one who kept the order waiting'
    = sole latest shipper in a multi-supplier finished order, via
    shipdate instead of the missing commit/receipt dates): EXISTS +
    NOT EXISTS double correlation on the same fact table.""",
    """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
    ("supplier", "lineitem", "orders"),
)


_dual(
    "sql_recursive_month_spine",
    """WITH RECURSIVE (Spark 4 recursive CTE support): generate the
    1995-2001 monthly calendar spine by recursion — no table drives
    the month list — LEFT-join order counts onto it so empty months
    surface as explicit zero rows (the recursive form of the
    gap-fill pattern; same text runs in both engines).""",
    """
WITH RECURSIVE months(m) AS (
    SELECT CAST(DATE '1995-01-01' AS DATE)
    UNION ALL
    SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
    WHERE m < DATE '2001-07-01'
)
SELECT CAST(YEAR(m) * 100 + MONTH(m) AS INT) AS ym,
       COUNT(o.o_orderkey) AS n_orders
FROM months
LEFT JOIN orders o
  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m
GROUP BY CAST(YEAR(m) * 100 + MONTH(m) AS INT)
ORDER BY ym
""",
    ("orders",),
)


_dual(
    "sql_string_functions_battery",
    """Portable string-function battery (split_part / translate /
    repeat / reverse / lpad / rpad / ascii / chr / left / right /
    ANSI POSITION / levenshtein) — one projection, same text in both
    engines; the function surface a SQL user migrating off any
    warehouse expects to keep working.""",
    """
SELECT c_custkey,
       split_part(c_name, '#', 2)                    AS name_num,
       translate(c_mktsegment, 'AEIOU', 'aeiou')     AS seg_tr,
       repeat(CAST(c_custkey % 10 AS STRING), 3)     AS rep3,
       reverse(c_name)                               AS name_rev,
       lpad(CAST(c_custkey AS STRING), 8, '0')       AS key_pad,
       rpad(CAST(c_custkey AS STRING), 8, '_')       AS key_rpad,
       ascii(c_mktsegment)                           AS seg_ascii,
       chr(CAST(c_custkey % 26 + 65 AS INT))         AS key_chr,
       left(c_name, 8)                               AS name_l8,
       right(c_name, 4)                              AS name_r4,
       POSITION('#' IN c_name)                       AS hash_pos,
       levenshtein(c_mktsegment, 'BUILDING')         AS seg_lev
FROM customer
WHERE c_custkey < 100
ORDER BY c_custkey
""",
    ("customer",),
)

_dual(
    "sql_bitwise_agg_battery",
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) per
    market segment — XOR/AND/OR folds are commutative+associative, so
    shuffle order cannot perturb them: exact cross-engine agreement by
    construction.""",
    """
SELECT c_mktsegment,
       bit_and(c_custkey) AS key_and,
       bit_or(c_custkey)  AS key_or,
       bit_xor(c_custkey) AS key_xor,
       COUNT(*)           AS n_custs
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    ("customer",),
)


# --- round-7: Q2/Q11 over a DERIVED partsupp ----------------------------------
# The driver fixture ships no partsupp table (TESTDATA.md), which
# blocked the two remaining classic shapes through round 6. Both now
# run against a derived supply relation: supplier s supplies part p
# iff a lineitem links them, with supply cost = the MIN observed
# floored unit price in cents (price/quantity is one IEEE division +
# one multiply before FLOOR — bit-identical across engines). The
# derivation is stated in the SQL text itself, so the Spark run and
# the DuckDB oracle share one text like the rest of the battery.

_dual(
    "sql_q2_min_cost_supplier",
    """TPC-H Q2 shape (adapted: partsupp DERIVED from lineitem as the
    min observed unit price per (part, supplier)): for each ECONOMY
    size-10..20 part (band not point so the smallest fixture is
    non-degenerate), the EUROPE supplier(s) matching the region-wide
    minimum cost — the classic correlated-scalar-subquery-with-join
    shape Q2 uniquely exercises, with the acctbal-ranked LIMIT retained
    (deterministic: unique s_name tiebreak). Scale: the derived ps is
    one map-side-combined agg of lineitem; the correlated min is
    planned as an aggregate + re-join on p_partkey (one shuffle on the
    part key), never a per-row subquery execution; dims broadcast.""",
    """
WITH ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100) AS BIGINT))
               AS ps_supplycost_cents
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
       ps.ps_supplycost_cents
FROM part p
JOIN ps         ON p.p_partkey = ps.ps_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'ECONOMY'
  AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost_cents = (
      SELECT MIN(ps2.ps_supplycost_cents)
      FROM ps ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
      WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
""",
    ("lineitem", "part", "supplier", "nation", "region"),
)

_dual(
    "sql_q11_important_parts",
    """TPC-H Q11 shape (adapted: value = ASIA-region suppliers'
    discounted lineitem revenue per part, over the same derived supply
    relation — region not nation so the smallest fixture still has
    qualifying suppliers): parts whose share of the region's total
    exceeds 1/1000, the HAVING-against-global-scalar-subquery shape.
    The threshold compare is cross-multiplied integer
    (value*1000 > total) — no float share ever exists. Scale: one
    part-keyed agg; the global total is a single-row broadcast.""",
    """
WITH val AS (
    SELECT l.l_partkey,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS value_cents
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey, value_cents
FROM val
WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM val)
ORDER BY value_cents DESC, p_partkey
""",
    ("lineitem", "supplier", "nation", "region"),
)
