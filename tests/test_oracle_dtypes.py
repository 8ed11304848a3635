"""Every registered oracle must be exact-hash-safe at the type level.

The external driver compares Spark and DuckDB results with an EXACT
value hash after a pandas round trip. DuckDB's SUM over integer inputs
returns HUGEINT (and some expressions return DECIMAL); pandas has no
128-bit integer, so those columns arrive as float64 while Spark emits
bigint — every value matches numerically, yet ``6.0`` hashes differently
from ``6``. The entire round-2 red set (csv/json/orc roundtrips, pivot,
corrupt-json policy) was this one class. This test types every oracle in
DuckDB without executing it (LIMIT-0 semantics: ``con.sql`` only binds)
and fails on any HUGEINT/DECIMAL output column, so the class is caught
locally before a driver round ever samples it.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tests.oracle_utils import duckdb_con

SF_DIR = "/root/testdata/sf0.01"


def _all_oracles():
    import __spark_entry__ as e

    return e.oracle_sql()


def test_no_hugeint_or_decimal_oracle_columns():
    oracles = _all_oracles()
    assert len(oracles) >= 100  # registry shrank unexpectedly?
    con = duckdb_con(SF_DIR)
    offenders = []
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
        except Exception as ex:  # binder failure is its own bug
            offenders.append((name, f"does not bind: {str(ex)[:120]}"))
            continue
        for c, t in zip(rel.columns, rel.types):
            ts = str(t).upper()
            if "HUGEINT" in ts or "DECIMAL" in ts:
                offenders.append((name, f"{c}: {ts} (cast ::BIGINT)"))
    assert not offenders, offenders


def test_dtype_mismatch_fails_locally():
    """The local comparator must reject int-vs-float dtype drift even
    when values agree — the exact failure mode the tolerance branch used
    to swallow."""
    import pandas as pd

    from tests.oracle_utils import assert_matches_oracle

    class _FakeSparkDF:
        def __init__(self, pdf):
            self._pdf = pdf

        def toPandas(self):
            return self._pdf

    # Spark-side bigint vs an oracle whose SUM(...) is deliberately left
    # un-cast (HUGEINT → float64 in pandas). Values are identical.
    fake = _FakeSparkDF(pd.DataFrame({"s": pd.array([3], dtype="int64")}))
    with pytest.raises(AssertionError, match="dtype mismatch"):
        assert_matches_oracle(
            fake, "SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)", SF_DIR
        )
