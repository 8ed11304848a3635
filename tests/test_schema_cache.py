"""The load_table schema METADATA cache (r13 optimization):

- repeated loads serve the inferred StructType from the cache and
  still return independent scan relations (the DeduplicateRelations
  self-join hazard fixed in embedding_near_dup_pairs must not come
  back through a shared DataFrame object);
- rewriting the fixture invalidates the cached entry (mtime/size key)
  and the new schema is picked up — no stale-schema reads;
- values are identical to an uncached inferring read.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from web_analytics_visits_re_processing_spark.sources.tables import (
    _SCHEMA_CACHE,
    _table_schema,
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_schema_cache_hit_and_fresh_relations(spark):
    df1 = load_table(spark, SF_DIR, "lineitem")
    key_hits = [
        k for k in _SCHEMA_CACHE if k[0] == f"{SF_DIR}/lineitem.parquet"
    ]
    assert key_hits, "load_table must populate the schema cache"
    df2 = load_table(spark, SF_DIR, "lineitem")
    # independent relations: a self-join on the two objects must bind
    # and execute (a shared relation would hit the DeduplicateRelations
    # rewrite that loses pushed-lambda attribute references)
    j = df1.join(df2, df1.l_orderkey == df2.l_orderkey).limit(3)
    assert len(j.collect()) == 3
    # schema identical to a fresh inferring read
    inferred = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").schema
    assert [f.name for f in df1.schema.fields] == [
        f.name for f in inferred.fields
    ]


def test_schema_cache_invalidates_on_rewrite(spark, tmp_path):
    p = str(tmp_path / "tbl.parquet")
    pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), p)
    sch1 = _table_schema(spark, p)
    assert [f.name for f in sch1.fields] == ["a", "b"]
    assert _table_schema(spark, p) is sch1  # cache hit, same object

    # rewrite with a DIFFERENT schema; ensure the mtime moves even on
    # coarse filesystem clocks
    time.sleep(0.05)
    pq.write_table(pa.table({"a": [3], "c": [1.5]}), p)
    os.utime(p)
    sch2 = _table_schema(spark, p)
    assert [f.name for f in sch2.fields] == ["a", "c"]

    # and the read actually uses the new schema
    rows = spark.read.schema(sch2).parquet(p).collect()
    assert rows[0]["c"] is not None


def test_cached_load_matches_uncached_values(spark):
    cached = load_table(spark, SF_DIR, "events").orderBy("event_id").limit(5)
    raw = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .orderBy("event_id")
        .limit(5)
    )
    a = [r.asDict() for r in cached.collect()]
    b_ids = [r["event_id"] for r in raw.collect()]
    assert [r["event_id"] for r in a] == b_ids
