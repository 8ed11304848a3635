"""Plan-shape pins for the TPC-H-shaped SQL-text battery: the parser
path must land on the same physical strategies the DataFrame surface
is pinned to — broadcast dims, semi/anti rewrites for IN / NOT
EXISTS, no cartesian products anywhere."""

from __future__ import annotations

import re

from web_analytics_visits_re_processing_spark.plans import QUERIES


def _plan(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, "sql_q5_regional_supplier_volume", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan


def test_q18_in_subquery_plans_as_semi_join(spark, sf_dir):
    plan = _plan(spark, "sql_q18_large_volume_orders", sf_dir)
    assert re.search(r"LeftSemi", plan), plan
    assert "CartesianProduct" not in plan


def test_q22_not_exists_plans_as_anti_join(spark, sf_dir):
    plan = _plan(spark, "sql_q22_idle_high_balance_customers", sf_dir)
    assert re.search(r"LeftAnti", plan), plan
    assert "CartesianProduct" not in plan


def test_q7_dual_alias_nation_join_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "sql_q7_nation_trade_volume", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q10_topk_no_full_sort_materialization(spark, sf_dir):
    plan = _plan(spark, "sql_q10_returned_item_customers", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan


def test_q2_correlated_min_plans_as_join_not_per_row(spark, sf_dir):
    """The correlated scalar subquery (region-wide min cost per part)
    must decorrelate into an aggregate + equi-join on the part key —
    never a nested-loop / per-row subquery execution."""
    plan = _plan(spark, "sql_q2_min_cost_supplier", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3, plan  # dims broadcast


def test_q11_global_total_is_single_row_broadcast(spark, sf_dir):
    """Q11's HAVING-against-global-total runs the scalar subquery as a
    one-row reuse/broadcast, not a recompute per group, and the share
    compare stays integer (no float column in the output)."""
    from pyspark.sql.types import LongType

    df = QUERIES["sql_q11_important_parts"](spark, sf_dir)
    plan = _plan(spark, "sql_q11_important_parts", sf_dir)
    assert "CartesianProduct" not in plan
    assert all(isinstance(f.dataType, LongType) for f in df.schema.fields), df.schema
    rows = df.collect()
    assert len(rows) > 0
    # The HAVING is value·1000 > global_total; the global total is ≥
    # the sum over the RETURNED rows, so every returned row must clear
    # the returned-row total too — a necessary integer-exact bound
    # that actually exercises the cross-multiplied threshold.
    total = sum(r["value_cents"] for r in rows)
    assert all(r["value_cents"] * 1000 > total for r in rows), (total, rows[:3])
    # descending by construction
    vals = [r["value_cents"] for r in rows]
    assert vals == sorted(vals, reverse=True)
