"""Run every oracle-paired query in the inventory against DuckDB at
sf0.001 — a fast local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from web_analytics_visits_re_processing_spark.plans import ORACLES, QUERIES

from tests.oracle_utils import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
