"""Driver-contract verification sweep: drive ``__spark_entry__`` with
a vanilla SparkSession exactly like the external driver and compare
every ``queries()`` entry against its ``oracle_sql()`` in DuckDB at
sf0.01 (columns sorted by name, rows sorted by all columns, floats
rtol 1e-9; rows-only queries just executed).

Usage:
    python scripts/verify_sweep.py              # full registry (~4 min)
    python scripts/verify_sweep.py q1 q2 ...    # only the named queries
    python scripts/verify_sweep.py --json PATH  # also write per-query
                                                # verdicts (SWEEP_rN.json
                                                # artifact - r12 verdict
                                                # item 5: the driver
                                                # samples 50/round, this
                                                # records all-registry
                                                # greenness directly)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

json_path = None
if "--json" in sys.argv:
    i = sys.argv.index("--json")
    json_path = sys.argv[i + 1]
    del sys.argv[i : i + 2]

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "16")
    .getOrCreate()
)
import __spark_entry__ as e  # noqa: E402

rows = e.entry(spark).collect()
assert len(rows) > 0
print("entry smoke OK:", len(rows), "rows", flush=True)
qs, osql = e.queries(), e.oracle_sql()
if len(sys.argv) > 1:
    qs = {n: qs[n] for n in sys.argv[1:]}

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


fails, done = [], 0
verdicts = {}
for name, fn in qs.items():
    try:
        mine = fn(spark, sf)
        if name not in osql:
            n = mine.count()
            assert n >= 0
            done += 1
            verdicts[name] = {"status": "rows_only", "rows": int(n)}
            print(f"rows-only {name}: {n}", flush=True)
            continue
        rel = con.sql(osql[name])
        # Driver-exactness guard: DuckDB HUGEINT/DECIMAL aggregates land
        # in pandas as float64 while Spark returns bigint, which passes
        # a tolerance compare but fails the driver's exact hash (the
        # entire r02 red set was this). Catch it at the type level,
        # before pandas erases the distinction.
        hug = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
        ]
        assert not hug, f"oracle emits HUGEINT/DECIMAL (cast ::BIGINT): {hug}"
        mine = norm(mine.toPandas())
        oracle = norm(rel.df())
        assert list(mine.columns) == list(oracle.columns), "columns"
        assert len(mine) == len(oracle), f"rows {len(mine)} vs {len(oracle)}"
        for c in mine.columns:
            a, b = mine[c], oracle[c]
            a_num = pd.api.types.is_integer_dtype(a) or pd.api.types.is_float_dtype(a)
            b_num = pd.api.types.is_integer_dtype(b) or pd.api.types.is_float_dtype(b)
            if a_num and b_num:
                # int-vs-float dtype drift hashes differently (6 vs 6.0)
                # even when values agree — fail it like the driver would.
                assert pd.api.types.is_float_dtype(a) == pd.api.types.is_float_dtype(
                    b
                ), f"col {c} dtype {a.dtype} vs {b.dtype}"
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                assert np.allclose(
                    a.astype(float), b.astype(float), rtol=1e-9, equal_nan=True
                ), f"col {c}"
            else:
                assert (a.astype(str) == b.astype(str)).all(), f"col {c}"
        done += 1
        verdicts[name] = {"status": "match", "rows": int(len(mine))}
        print(f"match {name}", flush=True)
    except Exception as ex:
        fails.append(name)
        verdicts[name] = {"status": "fail", "err": str(ex)[:200]}
        print(f"FAIL {name}: {str(ex)[:200]}", flush=True)
print(f"SWEEP DONE {done}/{len(qs)} OK; oracle-gated: {len(osql)}", flush=True)
if json_path:
    with open(json_path, "w") as f:
        json.dump(
            {
                "sf": 0.01,
                "n_queries": len(qs),
                "n_oracle_gated": len(osql),
                "n_ok": done,
                "fails": fails,
                "verdicts": verdicts,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {json_path}", flush=True)
sys.exit(1 if fails else 0)
